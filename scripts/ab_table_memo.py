"""Interleaved A/B for the read_table session memo (guide §6: repeated
file listings of the same table are pure waste).

Runs each query with bench.py's exact methodology (one untimed
warm-up, then timed construct+execute rounds through the noop sink),
alternating EGGV_TABLE_MEMO=0/1 per round so host drift hits both arms
equally.  The memo holds lazy plans only — every timed run still scans
the parquet inputs.

Usage: python scripts/ab_table_memo.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eggv_spark.session import get_session

DEFAULT = [
    "olap_q5_local_supplier",
    "olap_q9_product_profit",
    "composite_shipping_priority",
    "join_asof",
    "agg_rollup",
    "flagship_token_pipeline",
    "sim_cosine_topk",
    "composite_training_mixture",
    "active_user_counts",
    "txt_token_count",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "ab-table-memo",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    registry = entrymod.queries()
    best: dict[str, dict[str, float]] = {n: {"off": float("inf"), "on": float("inf")} for n in names}
    for name in names:
        # one untimed warm-up per arm (JIT + page cache + memo fill)
        for memo in ("0", "1"):
            os.environ["EGGV_TABLE_MEMO"] = memo
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        for r in range(3):
            for memo, tag in (("0", "off"), ("1", "on")):
                os.environ["EGGV_TABLE_MEMO"] = memo
                t0 = time.perf_counter()
                registry[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best[name][tag] = min(best[name][tag], dt)
        a, b = best[name]["off"], best[name]["on"]
        print(
            f"{name:35s} off={a:.3f}s on={b:.3f}s delta={100 * (b - a) / a:+.1f}%",
            flush=True,
        )
    tot_off = sum(v["off"] for v in best.values())
    tot_on = sum(v["on"] for v in best.values())
    print(f"TOTAL off={tot_off:.2f}s on={tot_on:.2f}s delta={100 * (tot_on - tot_off) / tot_off:+.1f}%")
    print(json.dumps(best))
    spark.stop()


if __name__ == "__main__":
    main()
