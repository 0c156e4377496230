"""Unit tests for table-maintenance operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from eggv_spark.operators import tableops as TO


def test_unpivot_roundtrips_pivot(spark):
    df = spark.createDataFrame([(1, "a", "b")], ["id", "x", "y"])
    out = TO.unpivot(df, ["id"], ["x", "y"])
    rows = {(r.variable, r.value) for r in out.collect()}
    assert rows == {("x", "a"), ("y", "b")}


def test_merge_upsert_semantics(spark):
    current = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], ["k", "v"]
    )
    updates = spark.createDataFrame([(2, "new2"), (9, "new9")], ["k", "v"])
    out = {r.k: r.v for r in TO.merge_upsert(current, updates, ["k"]).collect()}
    assert out == {1: "old1", 2: "new2", 3: "old3", 9: "new9"}


def test_profile_single_pass(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (2, "y")], ["a", "b"]
    )
    prof = TO.profile_columns(df, ["a", "b"])
    rows = {r.col_name: r for r in prof.collect()}
    assert rows["a"].n_nulls == 0 and rows["a"].n_distinct == 2
    assert rows["b"].n_nulls == 1 and rows["b"].n_distinct == 2
    assert rows["a"].min_value == "1" and rows["a"].max_value == "2"
    # single aggregate: exactly one scan of the source in the plan
    # (multi-distinct handled via Expand/gid, not repeated scans)
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") <= 1


def test_key_distribution(spark):
    df = spark.createDataFrame(
        [(1,)] * 8 + [(2,)] * 2, ["k"]
    )
    rows = TO.key_distribution(df, ["k"], top_n=2).collect()
    assert (rows[0].k, rows[0].n_rows, rows[0].share) == (1, 8, 0.8)
    assert (rows[1].k, rows[1].n_rows, rows[1].share) == (2, 2, 0.2)
