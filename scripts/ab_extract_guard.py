"""Interleaved A/B: staged regex extraction with vs without literal
``contains`` guards (guide §1.2 step 2 — per-task work).

Every attr pattern starts with a literal attribute prefix, so
``regexp_extract`` can only match when ``attr`` CONTAINS that literal;
guarding the regex behind ``F.contains`` short-circuits the regex
engine for absent attributes (memmem byte scan vs regex machinery).
Result-identical by construction: contains=false implies extract=''.

Usage: python scripts/ab_extract_guard.py [n_rounds]
Times the typed-extraction pass (noop sink) over the pipeline bench
corpus, alternating A (current) / B (guarded) within each round, and
checks row-identical outputs once.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from pyspark.sql import functions as F

from eggv_spark.session import get_session
from eggv_spark.sources import readers
from eggv_spark.operators import variants as V
from gen_bench_data import ensure_bench_data


def _extract_guarded(df, repartition_to=None):
    """Copy of variants._extract_typed with contains-guarded regexes."""
    df = df.select(
        F.concat(F.lit("chr"), F.col("seqid").cast("string")).alias("chromosome"),
        "start",
        "end",
        "attr",
    )
    if repartition_to:
        df = df.repartition(repartition_to)

    def g(lit, pat):
        return F.when(
            F.col("attr").contains(lit), F.regexp_extract("attr", pat, 1)
        ).otherwise(F.lit(""))

    df = df.select(
        "chromosome",
        "start",
        "end",
        g("Dbxref=dbSNP_", V._RSID_PATTERN).alias("_rsid_raw"),
        g("Variant_seq=", V._VAR_ALLELE_PATTERN).alias("_var_raw"),
        g("Reference_seq=", V._REF_ALLELE_PATTERN).alias("_ref_raw"),
        g("global_minor_allele_frequency=", V._MAF_PATTERN).alias("_maf_raw"),
        g("Variant_effect=", V._EFFECT_PATTERN).alias("_eff_raw"),
    )
    df = df.filter(F.col("_rsid_raw") != "")
    empty = F.lit("")
    return df.select(
        "chromosome",
        "start",
        "end",
        F.nullif(F.col("_rsid_raw"), empty).cast("long").alias("rsid"),
        F.concat_ws(
            ",",
            F.coalesce(F.nullif(F.col("_var_raw"), empty), F.lit("-")),
            F.coalesce(F.nullif(F.col("_ref_raw"), empty), F.lit("-")),
        ).alias("observed"),
        F.coalesce(
            F.nullif(F.col("_maf_raw"), empty).cast("float"), F.lit(0.0)
        ).cast("float").alias("maf"),
        F.coalesce(F.nullif(F.col("_eff_raw"), empty), F.lit("intergenic")).alias(
            "effect"
        ),
    )


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = get_session(
        "ab-extract-guard",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    layout = ensure_bench_data(
        spark, os.path.join(repo, ".bench_cache"),
        float(os.environ.get("SPARK_GRAFT_PIPELINE_GB", "5.6")),
    )
    raw = readers.read_gvf_split(spark, layout.variant_gvf())
    spark.read.text(layout.variant_gvf()).count()  # warm page cache

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    a_fn = lambda: V.extract_variant_fields(raw)  # noqa: E731
    b_fn = lambda: _extract_guarded(raw)  # noqa: E731

    # equivalence: order-insensitive hash + count
    def fingerprint(df):
        return df.select(
            F.count("*").alias("n"),
            F.bit_xor(F.xxhash64(*df.columns)).alias("h"),
        ).collect()[0]

    fa, fb = fingerprint(a_fn()), fingerprint(b_fn())
    print("rows A/B:", fa.n, fb.n, "hash match:", fa.h == fb.h, flush=True)

    run(a_fn())  # warm both shapes
    run(b_fn())
    best = {"A": float("inf"), "B": float("inf")}
    for r in range(rounds):
        for tag, fn in (("A", a_fn), ("B", b_fn)):
            t0 = time.perf_counter()
            run(fn())
            dt = time.perf_counter() - t0
            best[tag] = min(best[tag], dt)
            print(f"round {r} {tag}: {dt:.2f}s", flush=True)
    print(
        f"best A={best['A']:.2f}s B={best['B']:.2f}s "
        f"delta={100 * (best['B'] - best['A']) / best['A']:+.1f}%"
    )
    spark.stop()


if __name__ == "__main__":
    main()
