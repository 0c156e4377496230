"""Variant (GVF) processing operators.

Spark-first re-expression of the reference's GVF chain
(``eggv/process.py:100-180``): projection -> rename -> regex field
extraction out of the semi-structured ``attr`` column -> null
handling -> effect explode -> per-effect token split.

Everything is a pure Column expression (whole-stage codegen; no
Python in the hot path).  Operator IDs refer to SURVEY §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eggv_spark.functions.extract import regexp_extract_null

#: attr grammars (reference: eggv/process.py:125,134-135,145,158).
#: The rsid digits are captured directly (the reference captures
#: 'rs\d+' then strips the prefix — same result, one step).
_RSID_PATTERN = r"Dbxref=dbSNP_\d+:rs(\d+)"
_VAR_ALLELE_PATTERN = r"Variant_seq=([-,ACGT]+)"
_REF_ALLELE_PATTERN = r"Reference_seq=([-,ACGT]+)"
_MAF_PATTERN = r"global_minor_allele_frequency=\d+\|([.0-9]+)"
#: Requires the trailing ';' — a last-attribute effect is missed.
#: Kept for parity with eggv/process.py:158 (SURVEY §7.5.6), covered
#: by test_effect_grammar_requires_trailing_semicolon.
_EFFECT_PATTERN = r"Variant_effect=(.+?);"


def process_gvf(df: DataFrame, repartition_to: int | None = None) -> DataFrame:
    """Raw GVF rows -> processed variants (one row per effect).

    Ops: PRJ-01/02, STR-01..06, NUL-01/02, CST-01, EXP-01
    (reference chain ``eggv/process.py:100-180``).

    ``repartition_to``: gzip text is NOT splittable, so a scan of N
    ``.gz`` files yields only N partitions — the regex chain would
    run N-wide no matter the cluster size (the reference sidesteps
    this by gunzipping to disk first and splitting at 150 MB,
    ``eggv/retrieve.py:49-75`` + ``eggv/process.py:60``).  Setting
    this redistributes rows AFTER the cheap 4-column projection and
    BEFORE the regex extraction, trading one narrow shuffle for
    full-width parallelism.  Leave None for splittable inputs
    (parquet, plain text).

    Output schema: PROCESSED_VARIANTS_SCHEMA — (chromosome, rsid,
    start, end, observed, maf, effect, transcript).
    """
    # PRJ-01 projection + PRJ-02 rename + STR-01 'chr' prefix.
    # Catalyst prunes the scan to these 4 columns automatically.
    df = df.select(
        F.concat(F.lit("chr"), F.col("seqid").cast("string")).alias("chromosome"),
        "start",
        "end",
        "attr",
    )
    if repartition_to:
        df = df.repartition(repartition_to)

    # STR-02/03: rsid extraction; NUL-02: rows without an rsid drop.
    df = df.withColumn(
        "rsid", regexp_extract_null("attr", _RSID_PATTERN).cast("long")
    ).na.drop(subset=["rsid"])

    # STR-02 + NUL-01: alleles, '-' when absent; STR-04: observed.
    df = df.withColumn(
        "observed",
        F.concat_ws(
            ",",
            F.coalesce(regexp_extract_null("attr", _VAR_ALLELE_PATTERN), F.lit("-")),
            F.coalesce(regexp_extract_null("attr", _REF_ALLELE_PATTERN), F.lit("-")),
        ),
    )

    # STR-02 + NUL-01 + CST-01: MAF, 0.0 when absent, float32.
    df = df.withColumn(
        "maf",
        F.coalesce(
            regexp_extract_null("attr", _MAF_PATTERN).cast("float"), F.lit(0.0)
        ).cast("float"),
    )

    # STR-02 + NUL-01: effect list string, 'intergenic' when absent.
    df = df.withColumn(
        "effect",
        F.coalesce(
            regexp_extract_null("attr", _EFFECT_PATTERN), F.lit("intergenic")
        ),
    )

    # EXP-01: one row per effect.  The column was just coalesced to a
    # non-null non-empty string, so plain explode never drops rows;
    # explode_outer is used anyway as a defensive invariant
    # (SURVEY §7.5.3).
    df = df.withColumn("effect", F.explode_outer(F.split("effect", ",")))

    # STR-05/06: effect grammar 'name idx feature_type transcript'.
    # F.get is null-on-out-of-bounds (ANSI-safe): short/malformed
    # entries yield null transcript -> '' (parity with pandas
    # str.get(3).fillna('')).
    tokens = F.split(F.coalesce(F.col("effect"), F.lit("intergenic")), " ")
    df = df.withColumn("transcript", F.coalesce(F.get(tokens, 3), F.lit("")))
    df = df.withColumn("effect", F.get(tokens, 0))

    return df.select(
        "chromosome", "rsid", "start", "end", "observed", "maf", "effect", "transcript"
    )


def isolate_variant_effects(df: DataFrame) -> DataFrame:
    """DDP-01: distinct (rsid, effect, transcript) triples.

    The reference deduplicates partition-locally to avoid a shuffle
    (``eggv/process.py:275-294`` — duplicates only arise within a
    partition there).  Spark's ``dropDuplicates`` plans a partial
    (map-side) aggregate before the shuffle, so the local-dedup
    benefit is captured automatically while guaranteeing global
    uniqueness — a strict superset of the reference's semantics.
    """
    return df.select("rsid", "effect", "transcript").dropDuplicates()


def isolate_variant_metadata(df: DataFrame) -> DataFrame:
    """DDP-02: one metadata row per rsid.

    Reference keeps an arbitrary first-per-partition row
    (``eggv/process.py:297-315``).  Since every exploded effect row
    of one variant carries identical metadata, any representative is
    correct; ``dropDuplicates(['rsid'])`` does a map-side partial
    dedup then a key shuffle.
    """
    return df.select(
        "chromosome", "start", "end", "rsid", "observed", "maf"
    ).dropDuplicates(["rsid"])
