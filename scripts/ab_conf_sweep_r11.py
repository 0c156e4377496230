"""Round-11 quiet-host conf sweep (VERDICT r10 item 9).

Conf-only arms over the pipeline's variant+annotate stages (the
engine's biggest single numbers), FRESH session per run so each conf
is actually in force, interleaved round-robin so host drift hits all
arms equally.  Per the round rules these are parameterised knobs for
the cluster-shape recommendation (SCALING.md) — never baked into
defaults off a local[32] reading.

Arms:
- base:        session defaults (lz4 shuffle codec, 128m splits)
- zstd:        spark.io.compression.codec=zstd
- mpb256:      spark.sql.files.maxPartitionBytes=256m
- zstd+mpb256: both
"""

from __future__ import annotations

import json
import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "scripts"))

ARMS = {
    "base": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "mpb256": {"spark.sql.files.maxPartitionBytes": "268435456"},
    "zstd+mpb256": {
        "spark.io.compression.codec": "zstd",
        "spark.sql.files.maxPartitionBytes": "268435456",
    },
}


def run_once(confs: dict) -> dict:
    from eggv_spark import pipeline as P
    from eggv_spark.session import get_session
    from gen_bench_data import ensure_bench_data

    cores = os.environ.get("AB_CORES", "32")
    spark = get_session(
        "conf-sweep", master=f"local[{cores}]",
        shuffle_partitions=int(cores),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g", **confs},
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(spark, os.path.join(repo, ".bench_cache"), 5.6)
    # one untimed warm pass (JIT + page cache) then one timed
    P.run_variant_processing(spark, layout, fmt="parquet")
    t0 = time.perf_counter()
    P.run_variant_processing(spark, layout, fmt="parquet")
    t1 = time.perf_counter()
    P.run_annotation(spark, layout, fmt="parquet")
    t2 = time.perf_counter()
    spark.stop()
    return {"variants_s": round(t1 - t0, 2), "annotate_s": round(t2 - t1, 2),
            "loadavg": round(os.getloadavg()[0], 1)}


def main() -> None:
    rounds = int(os.environ.get("AB_ROUNDS", "3"))
    results: dict[str, list] = {k: [] for k in ARMS}
    for r in range(rounds):
        for name, confs in ARMS.items():
            rec = run_once(confs)
            results[name].append(rec)
            print(f"r{r} {name}: {rec}", flush=True)
    summary = {
        name: {
            "variants_min": min(x["variants_s"] for x in runs),
            "annotate_min": min(x["annotate_s"] for x in runs),
        }
        for name, runs in results.items()
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
