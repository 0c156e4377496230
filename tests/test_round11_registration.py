"""Paired Spark-vs-DuckDB cross-checks for the ROUND-11 STAGED
registrations (__spark_entry__.R11_STAGED_QUERIES / r11_staged_oracles)
— the final QA gate that makes round-11 registration purely
mechanical (round-9 verdict item 3).

The oracle BODIES were already validated against pure-Python
references in tests/test_round10_staged_oracles.py; this module pins
the PAIRING: each staged fixture's Spark result must match its staged
oracle exactly at sf0.001, the same comparison the driver will run at
sf0.01 once the entries enter queries()/oracle_sql().
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("orders", "events", "documents", "embeddings"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def test_staged_sets_are_paired_and_unregistered():
    """Every staged query has a staged oracle, and NONE of them is in
    the live registry (the freeze holds at 445 through round 10)."""
    oracles = E.r11_staged_oracles()
    assert set(E.R11_STAGED_QUERIES) == set(oracles)
    live = E.queries()
    assert len(live) == 445
    assert not set(E.R11_STAGED_QUERIES) & set(live)
    assert not set(oracles) & set(E.oracle_sql())


@pytest.mark.parametrize("name", sorted([
    "ml_ridge_fit",
    "fe_quantile_binning",
    "evt_retention_matrix",
    "txt_winnowing",
    "ddp_winnow_neardup",
    "sim_rank_metrics",
    "evt_page_hinkley",
    "agg_cronbach_alpha",
    "tbl_txn_time_travel",
]))
def test_staged_fixture_matches_staged_oracle(spark, con, name):
    df = E.R11_STAGED_QUERIES[name](spark, SF_DIR)
    sql = E.r11_staged_oracles()[name]
    got = sorted(tuple(r) for r in df.collect())
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert [f.name for f in df.schema.fields] == [
        d[0] for d in con.execute(sql).description
    ], f"{name}: column names diverge"
    assert got == exp, (
        f"{name}: {len(got)} vs {len(exp)} rows"
        f"\ngot: {got[:4]}\nexp: {exp[:4]}"
    )
    assert got, f"{name}: empty result would be a vacuous driver row"
