"""Interleaved share_scan A/B for the variant stage at a LOW core
count (local[8]) — the driver's scaling leg.  The two-scan shape pays
the scan+split+regex pass twice; with fewer cores that CPU-bound work
serializes, so the one-scan shape should win exactly where the
local[32] measurement is neutral."""

from __future__ import annotations

import os
import sys
import time

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "scripts"))

from eggv_spark import pipeline as P
from eggv_spark.session import get_session
from gen_bench_data import ensure_bench_data


def main():
    cores = int(os.environ.get("AB_CORES", "8"))
    spark = get_session(
        f"ab-share-scan-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(spark, os.path.join(repo, ".bench_cache"), 5.6)
    spark.read.text(layout.variant_gvf()).count()

    mins = {False: float("inf"), True: float("inf")}
    for flag in (False, True):  # untimed warm per shape
        P.run_variant_processing(spark, layout, fmt="parquet", share_scan=flag)
    for flag in (False, True, False, True):
        t0 = time.perf_counter()
        P.run_variant_processing(spark, layout, fmt="parquet", share_scan=flag)
        dt = time.perf_counter() - t0
        mins[flag] = min(mins[flag], dt)
        print(f"cores={cores} share_scan={flag}: {dt:.2f}s", flush=True)
    print(f"MIN cores={cores}: two-scan {mins[False]:.2f}s vs "
          f"shared {mins[True]:.2f}s "
          f"({(mins[True]-mins[False])/mins[False]*100:+.1f}%)")


if __name__ == "__main__":
    main()
