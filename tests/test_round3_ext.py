"""Tests for the round-3 additions: triangle counting, rank-based ROC
AUC, Welch's t-test, class-balanced downsampling, and the vocabulary
coverage curve — each checked against a hand-computed or naive-Python
replay on small exact fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from eggv_spark.operators.aggregates import roc_auc, welch_ttest
from eggv_spark.operators.graph import triangle_count
from eggv_spark.operators.relational import balanced_downsample
from eggv_spark.operators.text_analysis import vocab_coverage


# ---------------------------------------------------------------------------
# triangle_count
# ---------------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def test_triangle_count_k4(spark):
    # K4: 6 edges, 4 triangles, every node degree 3 -> 4*3 = 12 wedges
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)])
    row = triangle_count(e).collect()[0]
    assert row["n_edges"] == 6
    assert row["n_wedges"] == 12
    assert row["n_triangles"] == 4
    assert row["clustering_coeff"] == 1.0


def test_triangle_count_path_has_none(spark):
    # a path 1-2-3-4: one wedge per interior node, zero triangles
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    row = triangle_count(e).collect()[0]
    assert row["n_edges"] == 3
    assert row["n_wedges"] == 2
    assert row["n_triangles"] == 0
    assert row["clustering_coeff"] == 0.0


def test_triangle_count_dedups_direction_and_loops(spark):
    # duplicate edges, reversed duplicates, and self-loops all collapse
    e = _edges(
        spark,
        [(1, 2), (2, 1), (1, 2), (2, 3), (1, 3), (3, 1), (2, 2)],
    )
    row = triangle_count(e).collect()[0]
    assert row["n_edges"] == 3
    assert row["n_triangles"] == 1


# ---------------------------------------------------------------------------
# roc_auc
# ---------------------------------------------------------------------------

def test_roc_auc_perfect_and_inverted(spark):
    # positives strictly above negatives -> AUC 1; reversed -> 0
    rows = [Row(g="hi", y=1, s=float(10 + i)) for i in range(3)]
    rows += [Row(g="hi", y=0, s=float(i)) for i in range(3)]
    rows += [Row(g="lo", y=0, s=float(10 + i)) for i in range(3)]
    rows += [Row(g="lo", y=1, s=float(i)) for i in range(3)]
    out = {
        r["g"]: r for r in roc_auc(
            spark.createDataFrame(rows), "y", "s", keys=["g"]
        ).collect()
    }
    assert out["hi"]["auc"] == 1.0 and out["lo"]["auc"] == 0.0
    assert out["hi"]["n_pos"] == 3 and out["hi"]["n_neg"] == 3


def test_roc_auc_ties_average_rank(spark):
    # all scores equal -> AUC exactly 0.5 regardless of labels
    rows = [Row(y=i % 2, s=1.0) for i in range(8)]
    out = roc_auc(spark.createDataFrame(rows), "y", "s").collect()[0]
    assert out["auc"] == 0.5


def test_roc_auc_matches_naive_pairs(spark):
    # AUC == P(score_pos > score_neg) + 0.5 P(tie), replayed in Python
    import itertools
    data = [(1, 3.0), (1, 1.0), (1, 2.0), (0, 2.0), (0, 0.5), (0, 2.5)]
    pos = [s for y, s in data if y == 1]
    neg = [s for y, s in data if y == 0]
    wins = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p, n in itertools.product(pos, neg)
    )
    expected = wins / (len(pos) * len(neg))
    out = roc_auc(
        spark.createDataFrame([Row(y=y, s=s) for y, s in data]), "y", "s"
    ).collect()[0]
    # the operator rounds to 6dp; compare at that precision
    assert out["auc"] == pytest.approx(expected, abs=5e-7)


def test_roc_auc_degenerate_group_null(spark):
    rows = [Row(y=1, s=1.0), Row(y=1, s=2.0)]
    out = roc_auc(spark.createDataFrame(rows), "y", "s").collect()[0]
    assert out["auc"] is None


def test_roc_auc_null_labels_excluded(spark):
    # an unlabeled row must not occupy a rank slot: with it ranked,
    # the top-scored positive's rank would inflate and bias the AUC
    base = [Row(y=1, s=3.0), Row(y=0, s=1.0), Row(y=0, s=2.0)]
    with_null = base + [Row(y=None, s=2.5)]
    a = roc_auc(spark.createDataFrame(base), "y", "s").collect()[0]
    b = roc_auc(
        spark.createDataFrame(with_null, schema="y int, s double"), "y", "s"
    ).collect()[0]
    assert (a["auc"], a["n_pos"], a["n_neg"]) == (
        b["auc"], b["n_pos"], b["n_neg"],
    )


# ---------------------------------------------------------------------------
# welch_ttest
# ---------------------------------------------------------------------------

def test_welch_ttest_matches_closed_form(spark):
    a = [1.0, 2.0, 3.0, 4.0]
    b = [2.0, 4.0, 6.0, 8.0, 10.0]
    rows = [Row(arm=0, v=x) for x in a] + [Row(arm=1, v=x) for x in b]
    out = welch_ttest(spark.createDataFrame(rows), "arm", "v").collect()[0]

    import statistics
    m0, m1 = statistics.fmean(a), statistics.fmean(b)
    v0, v1 = statistics.variance(a), statistics.variance(b)
    se0, se1 = v0 / len(a), v1 / len(b)
    t = (m0 - m1) / math.sqrt(se0 + se1)
    dof = (se0 + se1) ** 2 / (
        se0**2 / (len(a) - 1) + se1**2 / (len(b) - 1)
    )
    assert out["n0"] == 4 and out["n1"] == 5
    assert out["t_stat"] == pytest.approx(round(t, 4), abs=1e-9)
    assert out["welch_dof"] == pytest.approx(round(dof, 4), abs=1e-9)


def test_welch_ttest_identical_arms_t_zero(spark):
    rows = [Row(arm=i % 2, v=float(i // 2)) for i in range(20)]
    out = welch_ttest(spark.createDataFrame(rows), "arm", "v").collect()[0]
    assert out["t_stat"] == 0.0


# ---------------------------------------------------------------------------
# balanced_downsample
# ---------------------------------------------------------------------------

def test_balanced_downsample_equalizes_classes(spark):
    rows = [Row(k=i, lab="a") for i in range(20)]
    rows += [Row(k=100 + i, lab="b") for i in range(5)]
    rows += [Row(k=200 + i, lab="c") for i in range(11)]
    out = balanced_downsample(spark.createDataFrame(rows), "lab", "k")
    counts = {
        r["lab"]: r["n"]
        for r in out.groupBy("lab").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"a": 5, "b": 5, "c": 5}


def test_balanced_downsample_deterministic(spark):
    rows = [Row(k=i, lab=i % 3) for i in range(30)]
    df = spark.createDataFrame(rows)
    first = sorted(r["k"] for r in balanced_downsample(df, "lab", "k").collect())
    second = sorted(
        r["k"]
        for r in balanced_downsample(df.repartition(7), "lab", "k").collect()
    )
    assert first == second


# ---------------------------------------------------------------------------
# vocab_coverage
# ---------------------------------------------------------------------------

def test_vocab_coverage_exact_small_corpus(spark):
    # 10 x "a", 5 x "b", 4 x "c", 1 x "d"  (total 20)
    text = " ".join(["a"] * 10 + ["b"] * 5 + ["c"] * 4 + ["d"])
    df = spark.createDataFrame([Row(text=text)])
    out = {
        r["threshold"]: (r["vocab_size"], r["covered_tokens"])
        for r in vocab_coverage(df, thresholds=(0.5, 0.75, 0.95, 1.0)).collect()
    }
    assert out[0.5] == (1, 10)       # "a" alone covers 50%
    assert out[0.75] == (2, 15)      # a+b cover 75%
    assert out[0.95] == (3, 19)      # a+b+c cover 95%
    assert out[1.0] == (4, 20)       # everything


# ---------------------------------------------------------------------------
# semantic_dedupe / calibration_bins
# ---------------------------------------------------------------------------

def test_semantic_dedupe_drops_exact_copies(spark):
    from eggv_spark.operators.similarity import semantic_dedupe

    # distinct directions [1, i]: closest non-identical pair (i=10,11)
    # has cosine ~0.99983, safely below the 0.999999 threshold
    base = [
        Row(vec_id=i, embedding=[1.0, float(i)] + [0.0] * 6)
        for i in range(12)
    ]
    # re-add ids 0..3 as exact copies under shifted ids
    dups = [Row(vec_id=100 + r.vec_id, embedding=r.embedding)
            for r in base[:4]]
    df = spark.createDataFrame(base + dups)
    out = semantic_dedupe(df, threshold=0.999999, n_clusters=2, dim=8)
    ids = sorted(r["vec_id"] for r in out.collect())
    # exact copies (cosine 1.0) drop; every distinct direction survives
    assert ids == list(range(12))


def test_semantic_dedupe_keeps_distinct_vectors(spark):
    from eggv_spark.operators.similarity import semantic_dedupe

    # orthogonal-ish one-hot vectors: no pair is near-duplicate
    rows = [
        Row(vec_id=i, embedding=[1.0 if d == i else 0.0 for d in range(8)])
        for i in range(8)
    ]
    out = semantic_dedupe(
        spark.createDataFrame(rows), threshold=0.95, n_clusters=2, dim=8
    )
    assert out.count() == 8


def test_calibration_bins_exact(spark):
    from eggv_spark.operators.aggregates import calibration_bins

    # bin 0: preds 0.05 x2, outcomes 0,1 -> rate 0.5, gap 0.45
    # bin 9: pred 1.0 folds into last bin, outcome 1 -> gap 0
    rows = [
        Row(p=0.05, y=0), Row(p=0.05, y=1),
        Row(p=1.0, y=1),
        Row(p=0.55, y=0),
    ]
    out = {r["bin"]: r for r in calibration_bins(
        spark.createDataFrame(rows), "p", "y").collect()}
    assert out[0]["n"] == 2 and out[0]["outcome_rate"] == 0.5
    assert out[0]["abs_gap"] == pytest.approx(0.45, abs=1e-9)
    assert out[9]["n"] == 1 and out[9]["outcome_rate"] == 1.0
    assert out[5]["n"] == 1 and out[5]["outcome_rate"] == 0.0


def test_calibration_bins_clamps_out_of_range(spark):
    from eggv_spark.operators.aggregates import calibration_bins

    rows = [Row(p=-0.3, y=0), Row(p=1.7, y=1)]
    out = {r["bin"]: r["n"] for r in calibration_bins(
        spark.createDataFrame(rows), "p", "y").collect()}
    assert out == {0: 1, 9: 1}


def test_corpus_funnel_stages_monotonic(spark):
    """Funnel invariant on real testdata: every stage's survivors are
    a subset of the previous stage's (docs and tokens both
    non-increasing), and stage 0 counts raw + injected dups."""
    import __spark_entry__ as entry

    rows = {
        r["stage_idx"]: r
        for r in entry.queries()["composite_corpus_funnel"](
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    for i in (1, 2, 3):
        assert rows[i]["n_docs"] <= rows[i - 1]["n_docs"]
        assert rows[i]["n_tokens"] <= rows[i - 1]["n_tokens"]
    # the dedup stage must remove at least the injected exact copies
    assert rows[2]["n_docs"] < rows[1]["n_docs"]


def test_kfold_assign_partitions_everything_deterministically(spark):
    from eggv_spark.operators.relational import kfold_assign

    rows = [Row(k=i) for i in range(100)]
    df = spark.createDataFrame(rows)
    out = kfold_assign(df, "k", 4)
    folds = {r["k"]: r["fold"] for r in out.collect()}
    assert set(folds.values()) <= {0, 1, 2, 3}
    assert len(folds) == 100
    # same assignment regardless of partitioning
    again = {r["k"]: r["fold"]
             for r in kfold_assign(df.repartition(7), "k", 4).collect()}
    assert folds == again


def test_with_drawdown_exact_series(spark):
    from eggv_spark.operators.aggregates import with_drawdown

    # series +10 +5 -12 +3 -1: totals 10,15,3,6,5; peak 10,15,15,15,15
    # drawdowns 0,0,12,9,10
    rows = [
        Row(u=1, t=i, v=float(d))
        for i, d in enumerate([10, 5, -12, 3, -1])
    ]
    out = with_drawdown(
        spark.createDataFrame(rows), "u", "t", "v", order_col="t"
    ).orderBy("t").collect()
    assert [r["running_total"] for r in out] == [10, 15, 3, 6, 5]
    assert [r["running_peak"] for r in out] == [10, 15, 15, 15, 15]
    assert [r["drawdown"] for r in out] == [0, 0, 12, 9, 10]


def test_population_stability_identical_is_zero(spark):
    from eggv_spark.operators.aggregates import population_stability

    rows = [Row(v=float(i % 10)) for i in range(100)]
    df = spark.createDataFrame(rows)
    out = population_stability(df, df, "v", n_bins=5).collect()
    assert all(r["contrib"] == 0.0 for r in out)
    assert sum(r["n_a"] for r in out) == 100


def test_population_stability_detects_shift(spark):
    from eggv_spark.operators.aggregates import population_stability

    a = spark.createDataFrame([Row(v=float(i % 10)) for i in range(100)])
    # b concentrated in the upper range -> positive PSI
    b = spark.createDataFrame([Row(v=float(5 + i % 5)) for i in range(100)])
    out = population_stability(a, b, "v", n_bins=5).collect()
    psi = sum(r["contrib"] for r in out if r["contrib"] is not None)
    assert psi > 0.25  # "significant shift" band
    # bins with no b mass carry null contrib, not a crash
    assert any(r["contrib"] is None for r in out)


def test_roc_auc_ignores_null_scores(spark):
    # a NULL-score row must not shift anyone's rank or the counts
    rows = [Row(y=1, s=10.0), Row(y=1, s=9.0), Row(y=0, s=1.0),
            Row(y=0, s=2.0), Row(y=1, s=None)]
    out = roc_auc(spark.createDataFrame(rows), "y", "s").collect()[0]
    assert out["n_pos"] == 2 and out["n_neg"] == 2
    assert out["auc"] == 1.0


def test_poisson_bootstrap_deterministic_and_null_safe(spark):
    from eggv_spark.operators.aggregates import poisson_bootstrap_mean

    rows = [(i, float(i)) for i in range(100)] + [(100, None)]
    df = spark.createDataFrame(rows, "event_id long, value double")
    a = poisson_bootstrap_mean(df, "value", "event_id").collect()[0]
    b = poisson_bootstrap_mean(df, "value", "event_id").collect()[0]
    assert a == b  # md5-seeded draws: bit-for-bit repeatable
    assert a.n == 100  # the NULL value row is excluded
    assert abs(a.mean - 49.5) < 1e-9
    # percentile-bootstrap interval of near-symmetric data brackets
    # the mean and is non-degenerate
    assert a.ci_lo < a.mean < a.ci_hi
    assert a.ci_hi - a.ci_lo > 0.1


def test_poisson_bootstrap_diff_detects_shift(spark):
    from eggv_spark.operators.aggregates import poisson_bootstrap_diff

    # arm 1 shifted +10 vs arm 0: CI of (mean1 - mean0) must exclude 0
    rows = [(i, float(i % 7), 0) for i in range(200)] + [
        (1000 + i, float(i % 7) + 10.0, 1) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "event_id long, value double, arm int")
    r = poisson_bootstrap_diff(df, "value", "arm", "event_id").collect()[0]
    assert (r.n0, r.n1) == (200, 200)
    assert abs(r.diff - 10.0) < 0.5
    assert r.ci_lo > 5.0  # clearly separated from zero
    assert r.ci_lo < r.diff < r.ci_hi
    # deterministic: identical on re-run
    assert r == poisson_bootstrap_diff(df, "value", "arm", "event_id").collect()[0]


def test_poisson_bootstrap_diff_rejects_three_arms(spark):
    import pytest as _pytest

    from eggv_spark.operators.aggregates import poisson_bootstrap_diff

    rows = [(i, 1.0, i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, value double, arm int")
    with _pytest.raises(Exception, match="exactly two arms"):
        poisson_bootstrap_diff(df, "value", "arm", "event_id").collect()


def test_poisson_bootstrap_diff_rejects_one_arm(spark):
    # a lone arm must error loudly, not return diff=0 with n0==n1
    import pytest as _pytest

    from eggv_spark.operators.aggregates import poisson_bootstrap_diff

    rows = [(i, float(i), 1) for i in range(30)]
    df = spark.createDataFrame(rows, "event_id long, value double, arm int")
    with _pytest.raises(Exception, match="exactly two arms"):
        poisson_bootstrap_diff(df, "value", "arm", "event_id").collect()


def test_welch_ttest_null_values_not_counted(spark):
    # NULL metrics must not inflate the arm size (se = v/n)
    rows = [Row(arm=0, v=x) for x in (1.0, 2.0, 3.0, None, None)]
    rows += [Row(arm=1, v=x) for x in (4.0, 5.0, 6.0, None)]
    out = welch_ttest(spark.createDataFrame(rows), "arm", "v").collect()[0]
    assert out["n0"] == 3 and out["n1"] == 3


def test_neighbor_jaccard_exact_small_graph(spark):
    from eggv_spark.operators.graph import neighbor_jaccard

    # square 1-2-3-4-1: opposite corners share BOTH neighbors
    # (J = 2/(2+2-2) = 1.0); adjacent corners share none
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], ["src", "dst"]
    )
    out = {(r["na"], r["nb"]): r for r in
           neighbor_jaccard(e, min_common=1, k=10).collect()}
    assert set(out) == {(1, 3), (2, 4)}
    assert out[(1, 3)]["n_common"] == 2
    assert out[(1, 3)]["jaccard"] == 1.0


def test_bigram_logprob_exact_tiny_corpus(spark):
    import math

    from eggv_spark.operators.text_analysis import bigram_logprob

    # corpus: "a b a b" and "b a"  -> N=6, c(a)=3, c(b)=3
    # bigrams: d1: (a,b)x2, (b,a)x1 ; d2: (b,a)x1
    # c(a,b)=2, c(b,a)=2
    rows = [Row(doc_id=1, text="a b a b"), Row(doc_id=2, text="b a")]
    out = {r["doc_id"]: r for r in
           bigram_logprob(spark.createDataFrame(rows)).collect()}
    lam = 0.7
    p_ab = lam * (2 / 3) + (1 - lam) * (3 / 6)
    p_ba = lam * (2 / 3) + (1 - lam) * (3 / 6)
    d1 = (2 * math.log(p_ab) + math.log(p_ba)) / 3
    d2 = math.log(p_ba)
    assert out[1]["n_bigrams"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(round(d1, 4), abs=1e-9)
    assert out[2]["avg_logprob"] == pytest.approx(round(d2, 4), abs=1e-9)


def test_bigram_logprob_flags_scrambled_order(spark):
    from eggv_spark.operators.text_analysis import bigram_logprob

    # many docs share the same word order; one has the same VOCAB
    # but scrambled order -> lower bigram score, invisible to unigram
    normal = [Row(doc_id=i, text="the cat sat on the mat")
              for i in range(10)]
    scrambled = [Row(doc_id=99, text="mat the on sat cat the")]
    out = {r["doc_id"]: r["avg_logprob"] for r in bigram_logprob(
        spark.createDataFrame(normal + scrambled)).collect()}
    assert out[99] < out[0]


def test_bigram_logprob_short_docs_drop(spark):
    from eggv_spark.operators.text_analysis import bigram_logprob

    rows = [Row(doc_id=1, text="solo"), Row(doc_id=2, text="a b")]
    ids = {r["doc_id"] for r in bigram_logprob(
        spark.createDataFrame(rows)).collect()}
    assert ids == {2}


def test_theil_index_exact_two_groups(spark):
    import math

    from eggv_spark.operators.aggregates import theil_index

    # equal values -> T = 0; one-holder (x, eps->0 excluded via <=0)
    rows = [Row(g="eq", x=5.0) for _ in range(4)]
    rows += [Row(g="uneq", x=v) for v in (1.0, 1.0, 1.0, 9.0)]
    out = {r["g"]: r for r in theil_index(
        spark.createDataFrame(rows), ["g"], "x").collect()}
    assert out["eq"]["theil_t"] == 0.0
    mu = 3.0
    expected = sum((v / mu) * math.log(v / mu)
                   for v in (1.0, 1.0, 1.0, 9.0)) / 4
    assert out["uneq"]["theil_t"] == pytest.approx(
        round(expected, 6), abs=1e-9)
    assert out["uneq"]["n_pos"] == 4


def test_table_checksum_order_and_partition_invariant(spark):
    from eggv_spark.operators.tableops import table_checksum

    rows = [Row(a=i, b=f"s{i}") for i in range(50)]
    df = spark.createDataFrame(rows)
    base = table_checksum(df).collect()[0]
    shuffled = table_checksum(
        spark.createDataFrame(list(reversed(rows))).repartition(7)
    ).collect()[0]
    assert (base["n_rows"], base["checksum"]) == (
        shuffled["n_rows"], shuffled["checksum"])
    # any single-row change moves the sum
    changed = table_checksum(
        spark.createDataFrame(rows[:-1] + [Row(a=49, b="DIFFERENT")])
    ).collect()[0]
    assert changed["checksum"] != base["checksum"]


def test_table_checksum_null_distinct_from_literal(spark):
    from eggv_spark.operators.tableops import table_checksum

    a = spark.createDataFrame([Row(x="null")])
    b = spark.createDataFrame([(None,)], "x string")
    ca = table_checksum(a).collect()[0]["checksum"]
    cb = table_checksum(b).collect()[0]["checksum"]
    assert ca != cb


def test_power_analysis_scales_inverse_square_of_mde(spark):
    from eggv_spark.operators.aggregates import power_analysis_mean

    rows = [(i, float(i % 100)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, value double")
    out = {r.mde_pct: r for r in power_analysis_mean(df, "value").collect()}
    # halving the MDE quadruples the required n (n ~ 1/delta^2)
    assert out[1.0].n_per_arm == pytest.approx(4 * out[2.0].n_per_arm, rel=0.01)
    assert out[2.0].n_per_arm > out[5.0].n_per_arm > out[10.0].n_per_arm
    # sanity against the closed form for this exact data
    import statistics

    vals = [float(i % 100) for i in range(1000)]
    mu, var = statistics.fmean(vals), statistics.variance(vals)
    k2 = 2.0 * (1.959963984540054 + 0.8416212335729143) ** 2
    import math

    expect = math.ceil(k2 * var / (mu * 0.05) ** 2)
    assert out[5.0].n_per_arm == expect
