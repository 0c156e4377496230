"""A/B validation for run_variant_processing(share_scan=True|False).

Runs the variant stage both ways at the bench's 5.6 GB scale, checks
the effects/metadata parquet outputs are identical (row count +
order-insensitive hash), and reports per-config timings (one untimed
warm run, then min of 3 timed).
"""

from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "scripts"))

from pyspark.sql import functions as F

from eggv_spark import pipeline as P
from eggv_spark.session import get_session
from gen_bench_data import ensure_bench_data


def fingerprint(spark, path):
    df = spark.read.parquet(path)
    cols = sorted(df.columns)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))
        ).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def main():
    spark = get_session(
        "ab-share-scan",
        master="local[32]",
        shuffle_partitions=32,
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(spark, os.path.join(repo, ".bench_cache"), 5.6)
    spark.read.text(layout.variant_gvf()).count()

    results = {}
    for flag in (False, True):
        spark.sparkContext.setJobDescription(f"variant stage share_scan={flag}")
        P.run_variant_processing(spark, layout, fmt="parquet", share_scan=flag)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            P.run_variant_processing(spark, layout, fmt="parquet", share_scan=flag)
            best = min(best, time.perf_counter() - t0)
        eff = fingerprint(spark, layout.variant_effects())
        meta = fingerprint(spark, layout.variant_meta())
        results[flag] = (best, eff, meta)
        print(f"share_scan={flag}: best={best:.2f}s effects={eff} meta={meta}",
              flush=True)

    f, t = results[False], results[True]
    assert f[1] == t[1], f"effects mismatch: {f[1]} vs {t[1]}"
    assert f[2] == t[2], f"meta mismatch: {f[2]} vs {t[2]}"
    print(f"IDENTICAL; two-scan {f[0]:.2f}s vs shared {t[0]:.2f}s "
          f"({(t[0]-f[0])/f[0]*100:+.1f}%)")


if __name__ == "__main__":
    main()
