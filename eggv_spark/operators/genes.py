"""Gene (GTF) processing operators.

Spark-first re-expression of the reference's GTF chain
(``eggv/process.py:183-233``): filter to transcript features, regex
extraction of gene/transcript identifiers from the ``attr`` column,
null handling, casts.  Pure Column expressions throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eggv_spark.functions.extract import regexp_extract_null

#: attr grammars (reference: eggv/process.py:202-212).  GTF attrs are
#: `key "value";` pairs.
_GENE_ID_PATTERN = r'gene_id "(ENS[A-Z]*\d+)"'
_TRANSCRIPT_ID_PATTERN = r'transcript_id "(ENS[A-Z]*\d+)"'
_BIOTYPE_PATTERN = r'biotype "(\w+)"'
_GENE_NAME_PATTERN = r'gene_name "(\w+)"'


def process_gtf(df: DataFrame) -> DataFrame:
    """Raw GTF rows -> transcript-level gene table.

    Ops: FLT-01, STR-02, NUL-01/02, PRJ-01/02, CST-01, STR-01
    (reference ``eggv/process.py:183-233``).

    Output schema: GENES_SCHEMA — (chromosome, start, end,
    transcript_id, gene_id, gene_name, biotype).

    FLT-01 sits directly over the scan so Catalyst pushes it into
    the source; at scale this prunes ~90% of GTF rows before any
    regex work.
    """
    df = df.filter(F.col("feature") == "transcript")

    return df.select(
        F.concat(F.lit("chr"), F.col("seqname").cast("string")).alias("chromosome"),
        F.col("start").cast("long").alias("start"),
        F.col("end").cast("long").alias("end"),
        regexp_extract_null("attr", _TRANSCRIPT_ID_PATTERN).alias("transcript_id"),
        regexp_extract_null("attr", _GENE_ID_PATTERN).alias("gene_id"),
        F.coalesce(
            regexp_extract_null("attr", _GENE_NAME_PATTERN), F.lit("NA")
        ).alias("gene_name"),
        F.coalesce(
            regexp_extract_null("attr", _BIOTYPE_PATTERN), F.lit("NA")
        ).alias("biotype"),
    ).na.drop(subset=["gene_id", "transcript_id"])


def dedupe_genes(df: DataFrame) -> DataFrame:
    """DDP-03: one row per gene_id (reference
    ``eggv/process.py:495-500,529-534``, dask ``split_out=20/150`` —
    here the shuffle width is AQE's job)."""
    return df.dropDuplicates(["gene_id"])
