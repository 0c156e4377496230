"""Tests for the training-pipeline text extensions (repetition
stats, decontamination, PII scrub, URL parsing) and the relational
completeness wave (outer/cross joins, sampling, approx sketches).

Hand-computed expectations on tiny frames; the sf0.01 value-hash
parity lives in the driver oracle gate (__spark_entry__)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eggv_spark.functions.scalars import redact_pii, url_parts
from eggv_spark.operators import aggregates as AG
from eggv_spark.operators import relational as R
from eggv_spark.operators.text_analysis import (
    decontaminate,
    with_repetition_stats,
)

SF_DIR = "/root/testdata/sf0.001"


def test_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # 4 words, 2 distinct, top word a×3, top bigram 'a a'×2 of 3
            (2, "x y z"),            # no repetition
            (3, "solo"),             # 1 word: no bigrams -> share 0
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in with_repetition_stats(df).collect()
    }
    assert rows[1]["n_words"] == 4
    assert rows[1]["dup_word_frac"] == 0.5
    assert rows[1]["max_word_share"] == 0.75
    assert rows[1]["top_bigram_share"] == round(2 / 3, 4)
    assert rows[2]["dup_word_frac"] == 0.0
    assert rows[2]["max_word_share"] == round(1 / 3, 4)
    assert rows[3]["top_bigram_share"] == 0.0


def test_decontaminate_drops_overlapping_docs(spark):
    train = spark.createDataFrame(
        [
            (1, "one two three four five six"),      # shares 5-gram with eval
            (2, "alpha beta gamma delta epsilon"),   # disjoint
        ],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame(
        [(100, "zero one two three four five")], ["doc_id", "text"]
    )
    kept = [r["doc_id"] for r in decontaminate(train, eval_set).collect()]
    assert kept == [2]


def test_redact_pii_all_patterns(spark):
    df = spark.createDataFrame(
        [("write a.b+c#d@sub.ex-1.io or 55-123-456-7890 from 192.168.0.1 ok",)],
        ["s"],
    )
    out = df.select(redact_pii("s").alias("r")).first()["r"]
    assert out == "write [EMAIL] or [PHONE] from [IP] ok"


def test_url_parts_components(spark):
    df = spark.createDataFrame(
        [("https://h.example.com/a/b?x=1",)], ["u"]
    )
    parts = url_parts("u")
    row = df.select(
        *[v.alias(k) for k, v in parts.items()]
    ).first()
    assert row["url_host"] == "h.example.com"
    assert row["url_path"] == "/a/b"
    assert row["url_proto"] == "https"


def test_systematic_sample_deterministic_and_pushed(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    s1 = R.systematic_sample(li, "l_orderkey", 10, 1)
    s2 = R.systematic_sample(li.repartition(7), "l_orderkey", 10, 1)
    # Same rows regardless of partitioning (df.sample would differ).
    assert s1.count() == s2.count()
    assert s1.exceptAll(s2).count() == 0
    # The modulus predicate is a scan-level filter, not a post-pass.
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan


def test_approx_aggregates_within_tolerance(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    approx = {
        r["l_returnflag"]: r
        for r in AG.approx_aggregates(li, ["l_returnflag"], "l_orderkey").collect()
    }
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_orderkey").alias("nd"),
            F.expr("percentile(l_orderkey, 0.5)").alias("p50"),
        )
        .collect()
    }
    for flag, e in exact.items():
        a = approx[flag]
        assert a["n_distinct_approx"] == pytest.approx(e["nd"], rel=0.05)
        assert a["p50_approx"] == pytest.approx(e["p50"], rel=0.05)


def test_full_outer_join_keeps_both_unmatched_sides(spark):
    left = spark.createDataFrame([(1, "l1"), (2, "l2")], ["k", "lv"])
    right = spark.createDataFrame([(2, "r2"), (3, "r3")], ["k", "rv"])
    out = R.full_outer_join(
        left, right, left["k"] == right["k"], coalesce_keys={"key": ("k", "k")}
    ).select("key", "lv", "rv")
    got = {r["key"]: (r["lv"], r["rv"]) for r in out.collect()}
    assert got == {1: ("l1", None), 2: ("l2", "r2"), 3: (None, "r3")}


def test_cross_join_cardinality(spark):
    a = spark.createDataFrame([(i,) for i in range(3)], ["x"])
    b = spark.createDataFrame([(i,) for i in range(4)], ["y"])
    assert R.cross_join(a, b).count() == 12


def test_string_agg_sorted_is_partition_invariant(spark):
    df = spark.createDataFrame(
        [(1, "c"), (1, "a"), (1, "b"), (2, "z")], ["k", "v"]
    )
    out1 = AG.string_agg_sorted(df, ["k"], "v").collect()
    out2 = AG.string_agg_sorted(df.repartition(5), ["k"], "v").collect()
    got1 = {r["k"]: r["agg_list"] for r in out1}
    assert got1 == {1: "a,b,c", 2: "z"}
    assert got1 == {r["k"]: r["agg_list"] for r in out2}
