"""Paired full-pipeline A/B for share_scan: run the bench's exact
genes -> variants -> annotate loop (one untimed warm, 3 timed) per
flag, in ONE session, reporting per-stage floors — checks the
variant-stage win survives the harness and that the checkpoint does
not tax the downstream annotate stage."""

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


def run(spark, layout, flag):
    floors = {"genes": float("inf"), "variants": float("inf"),
              "annotate": float("inf"), "total": float("inf")}
    P.run_gene_processing(spark, layout, fmt="parquet")
    P.run_variant_processing(spark, layout, fmt="parquet", share_scan=flag)
    P.run_annotation(spark, layout, fmt="parquet")
    for _ in range(3):
        t0 = time.perf_counter()
        P.run_gene_processing(spark, layout, fmt="parquet")
        t1 = time.perf_counter()
        P.run_variant_processing(spark, layout, fmt="parquet", share_scan=flag)
        t2 = time.perf_counter()
        P.run_annotation(spark, layout, fmt="parquet")
        t3 = time.perf_counter()
        floors["genes"] = min(floors["genes"], t1 - t0)
        floors["variants"] = min(floors["variants"], t2 - t1)
        floors["annotate"] = min(floors["annotate"], t3 - t2)
        floors["total"] = min(floors["total"], t3 - t0)
    return floors


def main():
    spark = get_session(
        "ab-pipeline-full", master="local[32]", shuffle_partitions=32,
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(spark, os.path.join(repo, ".bench_cache"), 5.6)
    spark.read.text(layout.variant_gvf()).count()
    spark.read.text(layout.gene_gtf()).count()
    order = [False, True, False, True]  # interleaved to cancel drift
    results = []
    for flag in order:
        f = run(spark, layout, flag)
        results.append((flag, f))
        print(f"share_scan={flag}: " +
              ", ".join(f"{k}={v:.2f}s" for k, v in f.items()), flush=True)
    for flag in (False, True):
        legs = [f for fl, f in results if fl == flag]
        print(f"MIN share_scan={flag}: " + ", ".join(
            f"{k}={min(l[k] for l in legs):.2f}s" for k in legs[0]))


if __name__ == "__main__":
    main()
