"""Round-11 interleaved A/B/C for the annotate stage (end-to-end,
real parquet sinks — the stage as the pipeline runs it).

Arms:
- ``cur``     — the shipped shape: persist=False, each sink re-runs
  the pruned broadcast join (annotate.run_annotation).
- ``narrow``  — intragenic dedups only (rsid, variant_effect,
  gene_id) and re-attaches gene_name/gene_biotype from the broadcast
  gene table AFTER the dedup (gene_id -> name/biotype is functional,
  verified 0 violations in r10), so the dedup shuffle carries 3
  columns instead of 5.
- ``shared``  — join once, project to the 5-column union, materialize
  (localCheckpoint), derive both sinks from it (the variant-stage
  share_scan shape applied to annotate).

Outputs are checked count+hash-identical across arms once before
timing.  AB_CORES=8 gives the low-core / cluster-shaped leg.
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
from eggv_spark.materialize import materialize
from eggv_spark.operators import annotate as A
from eggv_spark.schemas import GENES_SCHEMA, VARIANT_EFFECTS_SCHEMA
from eggv_spark.session import get_session
from gen_bench_data import ensure_bench_data

OUT = "/tmp/ab_annotate_r11"


def _inputs(spark, layout):
    effects = spark.read.schema(VARIANT_EFFECTS_SCHEMA).parquet(
        layout.variant_effects()
    )
    genes = spark.read.schema(GENES_SCHEMA).parquet(layout.gene_meta())
    return effects, genes


def arm_cur(spark, layout, tag):
    effects, genes = _inputs(spark, layout)
    res = A.run_annotation(effects, genes, persist=False)
    P._save_concurrently(
        [(res["intergenic"], f"{OUT}/{tag}/inter"),
         (res["intragenic"], f"{OUT}/{tag}/intra")],
        False, "parquet",
    )


def arm_narrow(spark, layout, tag):
    effects, genes = _inputs(spark, layout)
    ann = A.annotate_variants(effects, genes)
    inter = A.isolate_intergenic_variants(ann)
    narrow = (
        ann.filter(
            ~F.col("variant_effect").isin(*A.INTERGENIC_EFFECTS)
            & F.col("gene_id").isNotNull()
        )
        .select("rsid", "variant_effect", "gene_id")
        .dropDuplicates(["rsid", "variant_effect", "gene_id"])
    )
    gene_attrs = F.broadcast(
        genes.select(
            "gene_id", "gene_name", F.col("biotype").alias("gene_biotype")
        ).dropDuplicates(["gene_id"])
    )
    intra = narrow.join(gene_attrs, "gene_id").select(
        "rsid", "variant_effect", "gene_id", "gene_name", "gene_biotype"
    )
    P._save_concurrently(
        [(inter, f"{OUT}/{tag}/inter"), (intra, f"{OUT}/{tag}/intra")],
        False, "parquet",
    )


def arm_shared(spark, layout, tag):
    effects, genes = _inputs(spark, layout)
    ann = A.annotate_variants(effects, genes).select(
        "rsid", "variant_effect", "gene_id", "gene_name", "gene_biotype"
    )
    ann = materialize(ann)
    inter = ann.filter(
        F.col("variant_effect").isin(*A.INTERGENIC_EFFECTS)
    ).select("rsid", "variant_effect")
    intra = (
        ann.filter(
            ~F.col("variant_effect").isin(*A.INTERGENIC_EFFECTS)
            & F.col("gene_id").isNotNull()
        )
        .dropDuplicates(["rsid", "variant_effect", "gene_id"])
    )
    P._save_concurrently(
        [(inter, f"{OUT}/{tag}/inter"), (intra, f"{OUT}/{tag}/intra")],
        False, "parquet",
    )


def _fingerprint(spark, path):
    df = spark.read.parquet(path)
    r = df.select(
        F.count("*").alias("n"),
        F.bit_xor(F.xxhash64(*sorted(df.columns))).alias("h"),
    ).collect()[0]
    return (sorted(df.columns), r.n, r.h)


def main():
    cores = int(os.environ.get("AB_CORES", "32"))
    spark = get_session(
        f"ab-annotate-r11-{cores}", master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(spark, os.path.join(repo, ".bench_cache"), 5.6)

    arms = {"cur": arm_cur, "narrow": arm_narrow, "shared": arm_shared}
    # warm-up + output-identity gate
    prints = {}
    for tag, fn in arms.items():
        fn(spark, layout, tag)
        prints[tag] = (
            _fingerprint(spark, f"{OUT}/{tag}/inter"),
            _fingerprint(spark, f"{OUT}/{tag}/intra"),
        )
    base = prints["cur"]
    for tag, p in prints.items():
        assert p == base, f"{tag} diverges: {p} vs {base}"
    print(f"outputs identical across arms: intra rows={base[1][1]}")

    best = {k: float("inf") for k in arms}
    for r in range(3):
        for tag, fn in arms.items():
            spark.sparkContext.setJobDescription(f"annotate {tag} r{r}")
            t0 = time.perf_counter()
            fn(spark, layout, tag)
            dt = time.perf_counter() - t0
            best[tag] = min(best[tag], dt)
            print(f"r{r} {tag}: {dt:.2f}s load={os.getloadavg()[0]:.1f}",
                  flush=True)
    print({k: round(v, 2) for k, v in best.items()})
    spark.stop()


if __name__ == "__main__":
    main()
