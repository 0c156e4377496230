"""Interleaved A/B for the annotate stage's two-sink shape.

A (current): persist=False — each sink re-runs the pruned
effects-parquet scan + broadcast gene join.
B (shared): join once, project to the 5-column union both sinks need,
eager localCheckpoint, derive both sinks from the checkpointed frame
(the variant-stage share_scan lesson applied to annotate).

Run with AB_CORES=8 for the low-core / cluster-shaped leg and
AB_CORES=32 for the saturated leg.  Outputs are checked
count+hash-identical once per arm before timing.
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
from eggv_spark.operators import annotate as A
from eggv_spark.schemas import GENES_SCHEMA, VARIANT_EFFECTS_SCHEMA
from eggv_spark.session import get_session
from eggv_spark.sources import writers
from gen_bench_data import ensure_bench_data


def _run_shared(spark, layout):
    effects = spark.read.schema(VARIANT_EFFECTS_SCHEMA).parquet(
        layout.variant_effects()
    )
    genes = spark.read.schema(GENES_SCHEMA).parquet(layout.gene_meta())
    ann = A.annotate_variants(effects, genes).select(
        "rsid", "variant_effect", "gene_id", "gene_name", "gene_biotype"
    )
    ann = ann.localCheckpoint(eager=True)
    intergenic = ann.filter(
        F.col("variant_effect").isin(*A.INTERGENIC_EFFECTS)
    ).select("rsid", "variant_effect")
    intragenic = (
        ann.filter(
            ~F.col("variant_effect").isin(*A.INTERGENIC_EFFECTS)
            & F.col("gene_id").isNotNull()
        )
        .dropDuplicates(["rsid", "variant_effect", "gene_id"])
    )
    P._save_concurrently(
        [
            (intergenic, layout.annotated_intergenic()),
            (intragenic, layout.annotated_intragenic()),
        ],
        False,
        "parquet",
    )


def _fingerprint(spark, path):
    df = spark.read.parquet(path)
    r = df.select(
        F.count("*").alias("n"), F.bit_xor(F.xxhash64(*df.columns)).alias("h")
    ).collect()[0]
    return (r.n, r.h)


def main():
    cores = int(os.environ.get("AB_CORES", "8"))
    spark = get_session(
        f"ab-annotate-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(spark, os.path.join(repo, ".bench_cache"), 5.6)
    # annotate needs its stage inputs on disk
    P.run_gene_processing(spark, layout, fmt="parquet")
    P.run_variant_processing(spark, layout, fmt="parquet")

    arms = {
        "A": lambda: P.run_annotation(spark, layout, fmt="parquet"),
        "B": lambda: _run_shared(spark, layout),
    }
    fps = {}
    for tag, fn in arms.items():  # untimed warm + output fingerprint
        fn()
        fps[tag] = (
            _fingerprint(spark, layout.annotated_intergenic()),
            _fingerprint(spark, layout.annotated_intragenic()),
        )
    print("outputs identical:", fps["A"] == fps["B"], fps["A"], flush=True)

    mins = {"A": float("inf"), "B": float("inf")}
    for r in range(3):
        for tag, fn in arms.items():
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            mins[tag] = min(mins[tag], dt)
            print(f"cores={cores} round {r} {tag}: {dt:.2f}s", flush=True)
    print(
        f"MIN cores={cores}: current {mins['A']:.2f}s vs shared {mins['B']:.2f}s "
        f"({(mins['B'] - mins['A']) / mins['A'] * 100:+.1f}%)"
    )


if __name__ == "__main__":
    main()
