"""A/B harness for the round-11 one-pass attr parse experiment
(variants.py) — **experiment REJECTED and reverted**: the
pair-anchored locate/substring parse was proven bit-identical on a
5031-attr adversarial corpus but measured 2.5-4.5x SLOWER than the
five-full-regex shape (old 6.37 s vs new 16.25 s isolated extraction
pass at local[32]; per-expression bisect: 4 full-attr regexes ~1 s,
4 locates alone ~1.5 s, +instr ~5 s, +substr ~8 s, +small regexes
~21 s — Java regex literal-prefix search is optimized, Spark's
locate/instr are naive byte loops; additionally a multi-reference
rsid predicate pushed into the scan re-evaluates the line split per
reference and alone cost 4.5x).  The script is kept as the record:
`_extract_typed_old` below IS the live shape again, and the `new`
arm of `time` mode now measures the same thing twice.

Two modes:

- ``equiv`` (default): run the OLD five-full-regex extraction and the
  NEW pair-anchored parse over an adversarial attr corpus (every edge
  shape the round-10 tests pin, plus randomized compositions) and over
  the repo GVF fixture, asserting row-identical output.
- ``time``: isolated extraction-pass timing over the 5 GB bench
  corpus, interleaved A/B (old, new, old, new, ...) so host drift hits
  both arms equally, noop sink per guide §1.4.

The OLD form is reproduced here verbatim (same module patterns) so
the comparison is against the exact round-10 shape.
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from eggv_spark.operators.variants import (
    _EFFECT_PATTERN,
    _MAF_PATTERN,
    _REF_ALLELE_PATTERN,
    _RSID_PATTERN,
    _VAR_ALLELE_PATTERN,
    _extract_typed,
    explode_effects,
)


def _extract_typed_old(df: DataFrame) -> DataFrame:
    """The round-10 shape: five independent full-attr regex scans."""
    df = df.select(
        F.concat(F.lit("chr"), F.col("seqid").cast("string")).alias("chromosome"),
        "start",
        "end",
        "attr",
    )
    df = df.select(
        "chromosome",
        "start",
        "end",
        F.regexp_extract("attr", _RSID_PATTERN, 1).alias("_rsid_raw"),
        F.regexp_extract("attr", _VAR_ALLELE_PATTERN, 1).alias("_var_raw"),
        F.regexp_extract("attr", _REF_ALLELE_PATTERN, 1).alias("_ref_raw"),
        F.regexp_extract("attr", _MAF_PATTERN, 1).alias("_maf_raw"),
        F.regexp_extract("attr", _EFFECT_PATTERN, 1).alias("_eff_raw"),
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


#: Deterministic adversarial attr corpus: pair-anchored, mid-value,
#: empty-value, missing-trailing-';', duplicate keys, values with '='
#: and junk chars, keys as substrings of other keys.
ADVERSARIAL_ATTRS = [
    "",
    ";",
    ";;",
    "ID=1",
    "ID=1;Dbxref=dbSNP_150:rs7;Variant_seq=A;Reference_seq=C;evidence_values=x",
    "Dbxref=dbSNP_150:rs7;Variant_seq=A;Reference_seq=C;",
    "Dbxref=dbSNP_1:rs1",  # last pair, no trailing ';' (non-effect keys don't need it)
    "Variant_effect=missense 0 mRNA T1;",
    "a=b;Variant_effect=x;c=d;",
    "a=b;Variant_effect=x",  # trailing-';' quirk -> intergenic
    "Dbxref=dbSNP_1:rs2;Variant_effect=;;",  # empty value, lazy '.' eats ';'
    "Dbxref=dbSNP_1:rs2;Variant_effect=;x;",
    "Dbxref=dbSNP_1:rs2;Variant_effect=;x",
    "Dbxref=dbSNP_1:rs2;Variant_effect=",
    "Dbxref=dbSNP_1:rs2;Variant_effect=;",
    "Dbxref=dbSNP_1:rs2;Variant_effect=a;b;",
    "prefix Variant_effect=stop 1 mRNA T2;suffix;Dbxref=dbSNP_1:rs3;",
    # mid-value occurrences (the fallback path)
    "note=see Dbxref=dbSNP_9:rs99 here;Variant_seq=G;",
    "note=Variant_seq=TT;Reference_seq=A;Dbxref=dbSNP_1:rs4;",
    "x=global_minor_allele_frequency=1|0.5;Dbxref=dbSNP_1:rs5;",
    # proper MAF pair
    "Dbxref=dbSNP_1:rs6;global_minor_allele_frequency=1|0.25;",
    "Dbxref=dbSNP_1:rs6;global_minor_allele_frequency=1|0.25",
    "Dbxref=dbSNP_1:rs6;global_minor_allele_frequency=x|0.25;",
    # malformed values
    "Dbxref=dbSNP_1:rs7;Variant_seq=N;Reference_seq=NACGT;",
    "Dbxref=dbSNP_1:rs7;Variant_seq=;Reference_seq=C;",
    "Dbxref=dbSNP_1:rs7;Variant_seq=AN;",  # regex clips to prefix run
    "Dbxref=OMIM:1,dbSNP_150:rs8;",  # dbSNP not first xref: ref regex misses
    "Dbxref=OMIM:1;Dbxref=dbSNP_150:rs9;",  # duplicate key
    "XDbxref=dbSNP_1:rs10;",  # key as suffix of another key (mid-value hit)
    "Variant_seq=A=B;Dbxref=dbSNP_1:rs11;",  # '=' inside value
    "Dbxref=dbSNP_1:rs12;Variant_effect=eff 0 mRNA T1,e2 1 mRNA T2;z=1;",
]


def _random_attrs(n: int, seed: int = 11) -> list[str]:
    rng = random.Random(seed)
    keys = [
        "ID", "Dbxref", "Variant_seq", "Reference_seq",
        "global_minor_allele_frequency", "Variant_effect",
        "evidence_values", "note", "XVariant_seq",
    ]
    vals = [
        "", "A", "ACGT", "-", "N", "AN", "dbSNP_150:rs123",
        "dbSNP_1:rs5,dbSNP_2:rs6", "OMIM:1", "1|0.25", "2|.5", "x|1",
        "eff 0 mRNA T1", "eff 0 mRNA T1,e2 1 mRNA T2", "a=b",
        "see Dbxref=dbSNP_9:rs99", "Variant_seq=G",
    ]
    out = []
    for _ in range(n):
        pairs = [
            f"{rng.choice(keys)}={rng.choice(vals)}"
            for _ in range(rng.randint(0, 6))
        ]
        if rng.random() < 0.5:
            # guarantee a surviving rsid so the non-rsid columns are
            # exercised through the filter on most rows
            pairs.insert(
                rng.randint(0, len(pairs)),
                f"Dbxref=dbSNP_150:rs{rng.randint(1, 9999)}",
            )
        s = ";".join(pairs)
        if rng.random() < 0.5:
            s += ";"
        if rng.random() < 0.1:
            s = ";" + s
        out.append(s)
    return out


def equiv(spark) -> None:
    attrs = ADVERSARIAL_ATTRS + _random_attrs(5000)
    rows = [("7", "src", "SNV", str(i), str(i), ".", "+", ".", a)
            for i, a in enumerate(attrs)]
    df = spark.createDataFrame(
        rows,
        "seqid string, source string, type string, start string, end string,"
        " score string, strand string, phase string, attr string",
    )
    old = sorted(map(tuple, explode_effects(_extract_typed_old(df)).collect()))
    new = sorted(map(tuple, explode_effects(_extract_typed(df)).collect()))
    n_diff = sum(1 for a, b in zip(old, new) if a != b)
    assert len(old) == len(new), f"row count {len(old)} vs {len(new)}"
    if n_diff:
        for a, b in zip(old, new):
            if a != b:
                print("OLD", a)
                print("NEW", b)
    assert n_diff == 0, f"{n_diff} differing rows"
    print(f"equiv OK: {len(old)} rows identical over {len(attrs)} attrs")


def timing(spark, corpus: str, rounds: int = 3) -> None:
    # use the library reader so the scan matches the pipeline exactly
    from eggv_spark.sources.readers import read_gvf_split

    base = read_gvf_split(spark, corpus)
    arms = {
        "old": lambda: explode_effects(_extract_typed_old(base)),
        "new": lambda: explode_effects(_extract_typed(base)),
    }
    # untimed warm-up of both arms (JIT + page cache)
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()
    best: dict[str, float] = {k: float("inf") for k in arms}
    for r in range(rounds):
        for k, fn in arms.items():
            spark.sparkContext.setJobDescription(f"attr-parse {k} r{r}")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best[k] = min(best[k], dt)
            print(f"round {r} {k}: {dt:.2f}s (loadavg {os.getloadavg()[0]:.1f})")
    print({k: round(v, 2) for k, v in best.items()})
    print(f"speedup old/new: {best['old'] / best['new']:.3f}")


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "equiv"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8" if mode == "equiv" else "32")
    from eggv_spark.session import get_session

    spark = get_session(
        "ab-attr-parse",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_confs={"spark.ui.enabled": "false",
                     "spark.driver.memory": "24g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "equiv":
        equiv(spark)
    else:
        from gen_bench_data import ensure_bench_data

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        base = os.environ.get(
            "SPARK_GRAFT_PIPELINE_DIR", os.path.join(repo, ".bench_cache")
        )
        target_gb = float(os.environ.get("SPARK_GRAFT_PIPELINE_GB", "5.6"))
        layout = ensure_bench_data(spark, base, target_gb)
        timing(spark, layout.variant_gvf())
    spark.stop()


if __name__ == "__main__":
    main()
