"""Golden tests for the GTF gene chain."""

from __future__ import annotations

import pytest

from eggv_spark.operators.genes import dedupe_genes, process_gtf
from eggv_spark.sources.readers import read_gtf
from tests.fixtures import GTF_TEXT, write_fixture


@pytest.fixture(scope="module")
def genes(spark, tmp_path_factory):
    path = write_fixture(tmp_path_factory.mktemp("gtf"), "sample.gtf", GTF_TEXT)
    return process_gtf(read_gtf(spark, path)).cache()


def test_transcript_filter_and_shape(genes):
    # 6 GTF rows -> 4 transcript features (gene + exon rows dropped).
    assert genes.columns == [
        "chromosome", "start", "end",
        "transcript_id", "gene_id", "gene_name", "biotype",
    ]
    assert genes.count() == 4
    assert {r.transcript_id for r in genes.collect()} == {
        "ENST00000900001", "ENST00000900002",
        "ENST00000900003", "ENST00000900004",
    }


def test_attribute_extraction_and_na_fill(genes):
    rows = {r.transcript_id: r for r in genes.collect()}
    assert rows["ENST00000900001"].gene_id == "ENSG00000700001"
    assert rows["ENST00000900001"].gene_name == "AAAX"
    assert rows["ENST00000900001"].biotype == "protein_coding"
    assert rows["ENST00000900003"].biotype == "lincRNA"
    # transcript with no gene_name/biotype attrs -> 'NA' fill.
    assert rows["ENST00000900004"].gene_name == "NA"
    assert rows["ENST00000900004"].biotype == "NA"
    assert all(r.chromosome == "chr7" for r in rows.values())
    assert rows["ENST00000900002"].start == 90500


def test_dedupe_genes(genes):
    deduped = dedupe_genes(genes)
    assert deduped.count() == 2
    assert {r.gene_id for r in deduped.collect()} == {
        "ENSG00000700001", "ENSG00000700002",
    }
