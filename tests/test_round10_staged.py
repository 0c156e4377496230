"""Staging tests for the round-10/11 operator wave — implemented and
hand-verified in round 9 but NOT registered (the round-8 verdict froze
the registry at 445 until the driver backlog clears; registration,
fixtures, and oracle SQL land with a later round's window):

- ``ml.ridge_fit`` — closed-form 2-feature ridge on exact DECIMAL
  moments;
- ``similarity.rank_metrics`` — MRR/recall/precision/hit-rate@k in
  one ordered-prefix-pooled row;
- ``relational.quantile_binning`` — type-1 integer-safe equal-
  frequency bins;
- ``text_analysis.winnowing_fingerprints`` — MOSS winnowing with the
  rightmost-tie rule.
"""

from __future__ import annotations

import hashlib

import pytest


# ---------------------------------------------------------------------------
# ridge_fit
# ---------------------------------------------------------------------------


def _ridge_expected(rows, lam):
    n = len(rows)
    s1 = sum(r[0] for r in rows)
    s2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    s12 = sum(r[0] * r[1] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows)
    s2y = sum(r[1] * r[2] for r in rows)
    syy = sum(r[2] * r[2] for r in rows)
    nf = float(n)
    mx1, mx2, my = s1 / nf, s2 / nf, sy / nf
    c11 = s11 - nf * mx1 * mx1
    c22 = s22 - nf * mx2 * mx2
    c12 = s12 - nf * mx1 * mx2
    c1y = s1y - nf * mx1 * my
    c2y = s2y - nf * mx2 * my
    cyy = syy - nf * my * my
    a11, a22 = c11 + lam, c22 + lam
    det = a11 * a22 - c12 * c12
    b1 = (c1y * a22 - c12 * c2y) / det
    b2 = (a11 * c2y - c12 * c1y) / det
    sse = (
        cyy - 2.0 * b1 * c1y - 2.0 * b2 * c2y
        + b1 * b1 * c11 + 2.0 * b1 * b2 * c12 + b2 * b2 * c22
    )
    return {
        "b1": round(b1, 6),
        "b2": round(b2, 6),
        "intercept": round(my - b1 * mx1 - b2 * mx2, 6),
        "mse": round(sse / nf, 6),
    }


def test_ridge_fit_matches_closed_form(spark):
    from eggv_spark.operators.ml import ridge_fit

    rows = [
        (1, 2, 5), (2, 1, 6), (3, 4, 13), (4, 3, 14),
        (5, 6, 21), (6, 5, 22), (7, 8, 29), (8, 7, 30),
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    got = ridge_fit(df, "x1", "x2", "y", lam=1.0).collect()[0]
    exp = _ridge_expected(rows, 1.0)
    assert got["n"] == 8
    assert got["b1"] == pytest.approx(exp["b1"], abs=2e-6)
    assert got["b2"] == pytest.approx(exp["b2"], abs=2e-6)
    assert got["intercept"] == pytest.approx(exp["intercept"], abs=2e-6)
    assert got["mse"] == pytest.approx(exp["mse"], abs=2e-6)
    assert got["lambda"] == 1.0


def test_ridge_fit_shrinks_toward_zero(spark):
    from eggv_spark.operators.ml import ridge_fit

    rows = [(i, 2 * i, 3 * i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    small = ridge_fit(df, "x1", "x2", "y", lam=0.001).collect()[0]
    big = ridge_fit(df, "x1", "x2", "y", lam=10000.0).collect()[0]
    # collinear features: ridge splits the signal, heavier lambda
    # shrinks both coefficients toward zero
    assert abs(big["b1"]) < abs(small["b1"])
    assert abs(big["b2"]) < abs(small["b2"])
    assert small["mse"] < big["mse"]


def test_ridge_fit_degenerate_inputs(spark):
    from eggv_spark.operators.ml import ridge_fit

    with pytest.raises(ValueError, match="lam must be > 0"):
        ridge_fit(
            spark.createDataFrame([(1, 1, 1)], "x1 long, x2 long, y long"),
            "x1", "x2", "y", lam=0.0,
        )
    empty = spark.createDataFrame([], "x1 long, x2 long, y long")
    r = ridge_fit(empty, "x1", "x2", "y", lam=1.0).collect()[0]
    assert r["n"] == 0 and r["b1"] is None and r["mse"] is None
    # constant features: centered moments all zero -> coefficients 0
    const = spark.createDataFrame(
        [(5, 7, 3), (5, 7, 9)], "x1 long, x2 long, y long"
    )
    r2 = ridge_fit(const, "x1", "x2", "y", lam=1.0).collect()[0]
    assert r2["b1"] == 0.0 and r2["b2"] == 0.0
    assert r2["intercept"] == 6.0  # mean(y)


# ---------------------------------------------------------------------------
# rank_metrics
# ---------------------------------------------------------------------------


def test_rank_metrics_hand_example(spark):
    from eggv_spark.operators.similarity import rank_metrics

    # q1: truth {a, b}; system returns a at rank 2, b at rank 5 (k=3
    #     keeps only a) -> rr=1/2, hits=1, recall=1/2, prec=1/3, hit=1
    # q2: truth {c};    system returns nothing relevant in top-3
    #     -> rr=0, recall=0, prec=0, hit=0
    # q3: truth {d};    system never ran the query (no ranked rows)
    #     -> still counted: all zeros
    ranked = spark.createDataFrame(
        [
            ("q1", "x", 1), ("q1", "a", 2), ("q1", "z", 3), ("q1", "b", 5),
            ("q2", "u", 1), ("q2", "v", 2), ("q2", "w", 3),
        ],
        "query_id string, neighbor_id string, rank long",
    )
    truth = spark.createDataFrame(
        [("q1", "a"), ("q1", "b"), ("q2", "c"), ("q3", "d")],
        "query_id string, neighbor_id string",
    )
    r = rank_metrics(ranked, truth, k=3).collect()[0]
    assert r["n_queries"] == 3
    assert r["mrr"] == round((0.5 + 0.0 + 0.0) / 3.0, 6)
    assert r["recall_at_k"] == round((0.5 + 0.0 + 0.0) / 3.0, 6)
    assert r["precision_at_k"] == round((1.0 / 3.0) / 3.0, 6)
    assert r["hit_rate"] == round(1.0 / 3.0, 6)
    assert r["k"] == 3


def test_rank_metrics_perfect_retrieval(spark):
    from eggv_spark.operators.similarity import rank_metrics

    ranked = spark.createDataFrame(
        [("q1", "a", 1), ("q2", "b", 1)],
        "query_id string, neighbor_id string, rank long",
    )
    truth = spark.createDataFrame(
        [("q1", "a"), ("q2", "b")],
        "query_id string, neighbor_id string",
    )
    r = rank_metrics(ranked, truth, k=1).collect()[0]
    assert r["mrr"] == 1.0 and r["recall_at_k"] == 1.0
    assert r["precision_at_k"] == 1.0 and r["hit_rate"] == 1.0


# ---------------------------------------------------------------------------
# quantile_binning
# ---------------------------------------------------------------------------


def test_quantile_binning_even_split(spark):
    from eggv_spark.operators.relational import quantile_binning

    df = spark.createDataFrame([(v,) for v in range(1, 9)], "v long")
    out = {r["bin"]: r for r in quantile_binning(df, "v", 4).collect()}
    assert [out[j]["upper_edge"] for j in (1, 2, 3, 4)] == [2, 4, 6, 8]
    assert all(out[j]["n_rows"] == 2 for j in (1, 2, 3, 4))


def test_quantile_binning_integer_safe_edges(spark):
    """n=25, n_bins=25: edge_7 must be rank ceil(7*25/25)=7 even
    though 0.28*25 floats to 7.000000000000001 (the qte hazard)."""
    from eggv_spark.operators.relational import quantile_binning

    df = spark.createDataFrame([(v,) for v in range(1, 26)], "v long")
    out = {r["bin"]: r for r in quantile_binning(df, "v", 25).collect()}
    assert out[7]["upper_edge"] == 7
    assert all(out[j]["n_rows"] == 1 for j in range(1, 26))


def test_quantile_binning_duplicate_collapse(spark):
    from eggv_spark.operators.relational import quantile_binning

    df = spark.createDataFrame([(5,)] * 10, "v long")
    out = {r["bin"]: r for r in quantile_binning(df, "v", 4).collect()}
    assert all(out[j]["upper_edge"] == 5 for j in (1, 2, 3, 4))
    assert out[1]["n_rows"] == 10
    assert out[2]["n_rows"] == out[3]["n_rows"] == out[4]["n_rows"] == 0


def test_quantile_binning_rejects_bad_bins(spark):
    from eggv_spark.operators.relational import quantile_binning

    df = spark.createDataFrame([(1,)], "v long")
    with pytest.raises(ValueError, match="n_bins"):
        quantile_binning(df, "v", 1)


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------


def _ref_base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ref_winnow(text: str, k: int, w: int):
    norm = "".join(c for c in text.lower() if c.isalnum())
    if len(norm) < k:
        return set()
    hashes = [
        (_ref_base_hash(norm[i:i + k]), i + 1)
        for i in range(len(norm) - k + 1)
    ]
    picks = set()
    for s in range(len(hashes) - w + 1):
        window = hashes[s:s + w]
        # min hash, rightmost position on ties
        best = min(window, key=lambda t: (t[0], -t[1]))
        picks.add((best[1], best[0]))
    return picks


def test_winnowing_matches_reference(spark):
    from eggv_spark.operators.text_analysis import winnowing_fingerprints

    texts = [
        (1, "A do run run run, a do run run"),
        (2, "the quick brown fox jumps over the lazy dog"),
        (3, "aaaaaaa"),  # all-tie degenerate case
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"], r["gram_hash"])
        for r in winnowing_fingerprints(df, k=3, w=4).collect()
    }
    exp = {
        (d, pos, h)
        for d, t in texts
        for (pos, h) in _ref_winnow(t, 3, 4)
    }
    assert got == exp


def test_winnowing_shared_substring_guarantee(spark):
    """The paper's guarantee: a shared substring of length >= w+k-1
    yields at least one common fingerprint HASH in both docs."""
    from eggv_spark.operators.text_analysis import winnowing_fingerprints

    shared = "xylophonequartz"  # length 15 >= 4+5-1
    df = spark.createDataFrame(
        [
            (1, "prefix junk " + shared + " more stuff"),
            (2, "completely different " + shared + " trailing"),
        ],
        "doc_id long, text string",
    )
    out = winnowing_fingerprints(df, k=5, w=4)
    h1 = {r["gram_hash"] for r in out.filter("doc_id = 1").collect()}
    h2 = {r["gram_hash"] for r in out.filter("doc_id = 2").collect()}
    assert h1 & h2


def test_winnowing_short_and_empty_docs(spark):
    from eggv_spark.operators.text_analysis import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, "ab"), (2, ""), (3, None)], "doc_id long, text string"
    )
    assert winnowing_fingerprints(df, k=5, w=4).count() == 0


# ---------------------------------------------------------------------------
# winnow_neardup_pairs
# ---------------------------------------------------------------------------


def test_winnow_neardup_detects_clone(spark):
    from eggv_spark.operators.text_analysis import winnow_neardup_pairs

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, "intro text " + shared + " outro one"),
            (2, "other start " + shared + " different end"),
            (3, "entirely unrelated content with zero overlap here"),
        ],
        "doc_id long, text string",
    )
    out = winnow_neardup_pairs(df, k=5, w=4, min_shared=2).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in out}
    assert (1, 2) in pairs
    assert all(3 not in p for p in pairs)
    r12 = [r for r in out if (r["doc_a"], r["doc_b"]) == (1, 2)][0]
    assert r12["shared"] >= 2
    assert 0.0 < r12["overlap"] <= 1.0
    assert r12["shared"] <= min(r12["fp_a"], r12["fp_b"])


def test_winnow_neardup_boilerplate_cap(spark):
    """A hash present in more docs than max_hash_docs must not
    generate pairs (the frequent-bucket quadratic guard)."""
    from eggv_spark.operators.text_analysis import winnow_neardup_pairs

    boiler = "standard license header text appears everywhere"
    df = spark.createDataFrame(
        [(i, boiler) for i in range(1, 7)], "doc_id long, text string"
    )
    # identical docs: with the cap above 6 they all pair...
    assert winnow_neardup_pairs(df, k=5, w=4, max_hash_docs=6).count() == 15
    # ...with the cap below 6 every shared hash is boilerplate-dropped
    assert winnow_neardup_pairs(df, k=5, w=4, max_hash_docs=5).count() == 0


# ---------------------------------------------------------------------------
# retention_matrix
# ---------------------------------------------------------------------------


def test_retention_matrix_hand_example(spark):
    import datetime as dt

    from eggv_spark.operators.events import retention_matrix

    day = lambda d: dt.datetime(1970, 1, 1) + dt.timedelta(days=d)
    # period_days=7: cohort period = floor(day/7)
    rows = [
        # u1, u2 first in period 0; u1 back in periods 1 and 2
        ("u1", day(1)), ("u2", day(2)),
        ("u1", day(8)), ("u1", day(15)),
        # u3 first in period 1, never again
        ("u3", day(9)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = {
        (r["cohort_period"], r["offset"]): r
        for r in retention_matrix(df, period_days=7).collect()
    }
    assert out[(0, 0)]["n_cohort"] == 2 and out[(0, 0)]["n_active"] == 2
    assert out[(0, 0)]["retention"] == 1.0
    assert out[(0, 1)]["n_active"] == 1 and out[(0, 1)]["retention"] == 0.5
    assert out[(0, 2)]["n_active"] == 1
    assert out[(1, 0)]["n_cohort"] == 1 and out[(1, 0)]["retention"] == 1.0
    assert (1, 1) not in out  # no zero-fill rows: absent means 0 active


def test_retention_matrix_multiple_events_one_period(spark):
    import datetime as dt

    from eggv_spark.operators.events import retention_matrix

    t0 = dt.datetime(1970, 1, 1)
    rows = [("u1", t0 + dt.timedelta(days=d, hours=h))
            for d in (0, 1, 2) for h in (1, 5, 9)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    out = retention_matrix(df, period_days=7).collect()
    # nine events, one user, one period -> exactly one matrix cell
    assert len(out) == 1
    assert out[0]["n_cohort"] == 1 and out[0]["n_active"] == 1


# ---------------------------------------------------------------------------
# page_hinkley
# ---------------------------------------------------------------------------


def _ph_reference(xs, delta):
    """Sequential Page-Hinkley over daily cents values."""
    out = []
    s = 0.0
    m = 0.0
    mmin = float("inf")
    for i, x in enumerate(xs, start=1):
        s += x
        mean = s / i
        m += x - mean - delta
        mmin = min(mmin, m)
        out.append(round(m - mmin, 6))
    return out


def test_page_hinkley_matches_sequential_reference(spark):
    import datetime as dt

    from eggv_spark.operators.events import page_hinkley

    # stable level 10.00 for 8 days, then a +3.00 shift
    vals = [10.0] * 8 + [13.0] * 6
    rows = [
        (dt.datetime(2024, 1, 1) + dt.timedelta(days=i), v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = sorted(
        page_hinkley(df, delta_cents=50, lambda_cents=400).collect(),
        key=lambda r: r["day"],
    )
    exp = _ph_reference([v * 100 for v in vals], 50)
    assert [r["ph"] for r in out] == exp
    # the shift must alarm eventually; the stable prefix must not
    assert not any(r["alarm"] for r in out[:8])
    assert any(r["alarm"] for r in out[8:])


def test_page_hinkley_keyed_series_are_independent(spark):
    import datetime as dt

    from eggv_spark.operators.events import page_hinkley

    rows = []
    for i in range(10):
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        rows.append(("steady", ts, 5.0))
        rows.append(("drift", ts, 5.0 + (3.0 if i >= 5 else 0.0)))
    df = spark.createDataFrame(rows, "src string, ts timestamp, value double")
    out = page_hinkley(
        df, delta_cents=20, lambda_cents=300, keys=["src"]
    ).collect()
    steady = [r for r in out if r["src"] == "steady"]
    drift = [r for r in out if r["src"] == "drift"]
    assert not any(r["alarm"] for r in steady)
    assert any(r["alarm"] for r in drift)


# ---------------------------------------------------------------------------
# cronbach_alpha
# ---------------------------------------------------------------------------


def test_cronbach_alpha_hand_example(spark):
    from eggv_spark.operators.aggregates import cronbach_alpha

    # 4 subjects x 3 items, hand-computed sample variances
    rows = [(2, 3, 3), (4, 4, 5), (6, 5, 6), (8, 8, 8)]
    df = spark.createDataFrame(rows, "i1 long, i2 long, i3 long")
    r = cronbach_alpha(df, ["i1", "i2", "i3"]).collect()[0]
    import statistics

    v1 = statistics.variance([2, 4, 6, 8])
    v2 = statistics.variance([3, 4, 5, 8])
    v3 = statistics.variance([3, 5, 6, 8])
    vt = statistics.variance([8, 13, 17, 24])
    exp = (3 / 2) * (1 - (v1 + v2 + v3) / vt)
    assert r["n_subjects"] == 4 and r["k_items"] == 3
    assert r["sum_item_var"] == pytest.approx(round(v1 + v2 + v3, 6), abs=1e-6)
    assert r["total_var"] == pytest.approx(round(vt, 6), abs=1e-6)
    assert r["alpha"] == pytest.approx(round(exp, 6), abs=1e-6)


def test_cronbach_alpha_perfectly_parallel_items(spark):
    from eggv_spark.operators.aggregates import cronbach_alpha

    # identical items: var_total = k^2 * var_item, alpha = 1 exactly
    rows = [(v, v) for v in (1, 3, 5, 9)]
    df = spark.createDataFrame(rows, "i1 long, i2 long")
    r = cronbach_alpha(df, ["i1", "i2"]).collect()[0]
    assert r["alpha"] == 1.0


def test_cronbach_alpha_degenerate_inputs(spark):
    from eggv_spark.operators.aggregates import cronbach_alpha

    with pytest.raises(ValueError, match=">= 2 item"):
        cronbach_alpha(
            spark.createDataFrame([(1,)], "i1 long"), ["i1"]
        )
    # single subject: variances undefined -> NULL alpha, no error
    one = spark.createDataFrame([(1, 2)], "i1 long, i2 long")
    r = cronbach_alpha(one, ["i1", "i2"]).collect()[0]
    assert r["n_subjects"] == 1 and r["alpha"] is None
    # zero total variance (constant totals): NULL via try_divide
    const = spark.createDataFrame(
        [(1, 4), (4, 1), (2, 3)], "i1 long, i2 long"
    )
    r2 = cronbach_alpha(const, ["i1", "i2"]).collect()[0]
    assert r2["total_var"] == 0.0 and r2["alpha"] is None
