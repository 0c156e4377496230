"""Round-7 staged operators: library additions prepared for the
round-8 registry window (per the round-6 verdict item 7, staging
re-opens once the round-7 window lands; these carry tests now and
queries()/oracle_sql() entries next round): CUPED variance-reduced
A/B readout, rolling active-user counts (DAU/WAU/MAU), HHI
concentration, MCC confusion readout, Brier decomposition, PPS
systematic sampling (global + stratified), compaction planning,
graph modularity, CCNet-style perplexity binning, BPE application,
ViT-style image patch extraction, and top-N user journey paths.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from eggv_spark.operators.aggregates import (
    brier_decomposition,
    hhi_concentration,
    mcc_confusion,
)
from eggv_spark.operators.events import active_user_counts, cuped_adjusted_lift
from eggv_spark.operators.graph import modularity
from eggv_spark.operators.relational import pps_systematic_sample
from eggv_spark.operators.tableops import compaction_plan


# ---------------------------------------------------------------------------
# CUPED
# ---------------------------------------------------------------------------

def _cuped_naive(rows):
    # rows: (unit, variant, pre, post) at unit grain
    n = len(rows)
    xs = [r[2] for r in rows]
    ys = [r[3] for r in rows]
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    xbar = sx / n
    adj = {r[0]: r[3] - theta * (r[2] - xbar) for r in rows}
    a = [adj[r[0]] for r in rows if r[1] == "A"]
    b = [adj[r[0]] for r in rows if r[1] == "B"]
    ya = [r[3] for r in rows if r[1] == "A"]
    yb = [r[3] for r in rows if r[1] == "B"]
    return (
        theta,
        sum(yb) / len(yb) - sum(ya) / len(ya),
        sum(b) / len(b) - sum(a) / len(a),
    )


def test_cuped_matches_naive(spark):
    rows = []
    for i in range(40):
        pre = float(5 + (i * 7) % 13)
        noise = float((i * 3) % 5) - 2.0
        variant = "A" if i % 2 == 0 else "B"
        post = 2.0 * pre + noise + (3.0 if variant == "B" else 0.0)
        rows.append((f"u{i}", variant, pre, post))
    df = spark.createDataFrame(rows, ["unit", "variant", "pre", "post"])
    out = cuped_adjusted_lift(df, "unit", "variant", "pre", "post").collect()[0]
    theta, lift_raw, lift_adj = _cuped_naive(rows)
    assert out["n_a"] == 20 and out["n_b"] == 20
    assert out["theta"] == pytest.approx(theta, abs=1.01e-6)
    assert out["lift_raw"] == pytest.approx(lift_raw, abs=1.01e-6)
    assert out["lift_adjusted"] == pytest.approx(lift_adj, abs=1.01e-6)
    # post is mostly explained by pre -> big variance cut
    assert out["var_reduction"] > 0.5


def test_cuped_sums_event_rows_to_unit_grain(spark):
    rows = [
        ("u1", "A", 1.0, 2.0), ("u1", "A", 1.0, 2.0),  # same unit twice
        ("u2", "B", 2.0, 5.0), ("u3", "A", 3.0, 7.0), ("u4", "B", 1.0, 3.0),
    ]
    df = spark.createDataFrame(rows, ["unit", "variant", "pre", "post"])
    out = cuped_adjusted_lift(df, "unit", "variant", "pre", "post").collect()[0]
    assert out["n_a"] == 2 and out["n_b"] == 2  # u1 folded to one unit


def test_cuped_raises_on_foreign_variant(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    rows = [("u1", "A", 1.0, 2.0), ("u2", "B", 2.0, 3.0),
            ("u3", "X", 1.0, 1.0)]
    df = spark.createDataFrame(rows, ["unit", "variant", "pre", "post"])
    with pytest.raises((SparkRuntimeException, Py4JJavaError)):
        cuped_adjusted_lift(df, "unit", "variant", "pre", "post").collect()


# ---------------------------------------------------------------------------
# active users
# ---------------------------------------------------------------------------

def test_active_user_counts_matches_naive(spark):
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(200):
        user = f"u{i % 23}"
        day = (i * 5) % 40
        rows.append((user, base + dt.timedelta(days=day, hours=i % 24)))
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    out = {r["day"]: r for r in
           active_user_counts(df, "user_id", "ts").collect()}

    days = {}
    for user, ts in rows:
        days.setdefault(ts.date(), set()).add(user)
    # round-8 contract: the spine is every day (up to the max
    # activity day) with ANY activity in its trailing 28-day window —
    # trailing-only days appear with dau = 0
    max_day = max(days)
    expected_days = {
        d for d in (min(days) + dt.timedelta(days=k)
                    for k in range((max_day - min(days)).days + 1))
        if any(d - dt.timedelta(days=j) in days for j in range(28))
    }
    for day in expected_days:
        dau = len(days.get(day, set()))
        wau = len(set().union(*[
            days.get(day - dt.timedelta(days=k), set()) for k in range(7)
        ]))
        mau = len(set().union(*[
            days.get(day - dt.timedelta(days=k), set()) for k in range(28)
        ]))
        row = out[day]
        assert (row["dau"], row["wau"], row["mau"]) == (dau, wau, mau), day
    assert set(out) == expected_days


# ---------------------------------------------------------------------------
# HHI
# ---------------------------------------------------------------------------

def test_hhi_even_and_concentrated(spark):
    rows = [("even", f"c{i}", 10.0) for i in range(4)] + [
        ("skew", "big", 97.0), ("skew", "s1", 1.0),
        ("skew", "s2", 1.0), ("skew", "s3", 1.0),
    ]
    df = spark.createDataFrame(rows, ["g", "contributor", "v"])
    out = {r["g"]: r for r in hhi_concentration(df, ["g"], "v").collect()}
    assert out["even"]["hhi"] == pytest.approx(0.25)
    assert out["even"]["effective_n"] == pytest.approx(4.0)
    assert out["even"]["top_share"] == pytest.approx(0.25)
    naive = (97 / 100) ** 2 + 3 * (1 / 100) ** 2
    assert out["skew"]["hhi"] == pytest.approx(naive, abs=1.01e-6)
    assert out["skew"]["top_share"] == pytest.approx(0.97)
    assert out["skew"]["n_contributors"] == 4


# ---------------------------------------------------------------------------
# MCC
# ---------------------------------------------------------------------------

def test_mcc_matches_naive(spark):
    rows = [(1, 1)] * 50 + [(1, 0)] * 10 + [(0, 1)] * 5 + [(0, 0)] * 35
    df = spark.createDataFrame(rows, ["label", "pred"])
    out = mcc_confusion(df, "label", "pred").collect()[0]
    tp, fn, fp, tn = 50, 10, 5, 35
    assert (out["tp"], out["fp"], out["fn"], out["tn"]) == (tp, fp, fn, tn)
    assert out["precision"] == pytest.approx(tp / (tp + fp), abs=1e-6)
    assert out["recall"] == pytest.approx(tp / (tp + fn), abs=1e-6)
    mcc = (tp * tn - fp * fn) / math.sqrt(
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    )
    assert out["mcc"] == pytest.approx(mcc, abs=1.01e-6)


def test_mcc_degenerate_single_class_is_null_not_error(spark):
    df = spark.createDataFrame([(1, 1), (1, 1)], ["label", "pred"])
    out = mcc_confusion(df, "label", "pred").collect()[0]
    assert out["mcc"] is None  # 0/0 -> NULL via try_divide, no crash
    assert out["accuracy"] == 1.0


# ---------------------------------------------------------------------------
# Brier decomposition
# ---------------------------------------------------------------------------

def test_brier_decomposition_identity(spark):
    rows = []
    for i in range(500):
        p = ((i * 37) % 100) / 100.0
        y = 1 if ((i * 13) % 100) / 100.0 < p else 0
        rows.append((p, y))
    df = spark.createDataFrame(rows, ["p", "y"])
    out = brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    bs = sum((p - y) ** 2 for p, y in rows) / len(rows)
    assert out["n"] == 500
    assert out["brier"] == pytest.approx(bs, abs=1.01e-6)
    # Murphy identity: BS = REL - RES + UNC (exact for binned p̄_k
    # only when p is constant within bins; here it holds to bin width)
    assert out["brier"] == pytest.approx(
        out["reliability"] - out["resolution"] + out["uncertainty"],
        abs=0.02,
    )
    assert out["uncertainty"] == pytest.approx(
        (sum(y for _, y in rows) / 500)
        * (1 - sum(y for _, y in rows) / 500),
        abs=1.01e-6,
    )


def test_brier_p_equals_one_lands_in_last_bin(spark):
    df = spark.createDataFrame([(1.0, 1), (0.95, 1)], ["p", "y"])
    out = brier_decomposition(df, "p", "y", n_bins=10).collect()[0]
    assert out["n_bins_used"] == 1  # both in bin 9, no bin-10 overflow


# ---------------------------------------------------------------------------
# PPS systematic sampling
# ---------------------------------------------------------------------------

def test_pps_sample_is_deterministic_and_weight_biased(spark):
    rows = [(f"k{i}", (1 + (i % 10)) * 100) for i in range(300)]
    df = spark.createDataFrame(rows, ["k", "w_cents"])
    s1 = pps_systematic_sample(df, ["k"], "w_cents", n_samples=30)
    s2 = pps_systematic_sample(
        df.repartition(7), ["k"], "w_cents", n_samples=30
    )
    k1 = sorted(r["k"] for r in s1.collect())
    k2 = sorted(r["k"] for r in s2.collect())
    assert k1 == k2  # partition-invariant
    # exactly n selections unless a heavy unit collapses thresholds
    # (no unit here exceeds W/n, so exactly 30)
    assert len(k1) == 30
    # heavy units (w=1000) should be sampled far more often than
    # light ones (w=100): compare selection rates
    sel = set(k1)
    heavy = [f"k{i}" for i in range(300) if i % 10 == 9]
    light = [f"k{i}" for i in range(300) if i % 10 == 0]
    rate_heavy = len([k for k in heavy if k in sel]) / len(heavy)
    rate_light = len([k for k in light if k in sel]) / len(light)
    assert rate_heavy > rate_light


def test_pps_inclusion_exactness_small(spark):
    # W = 100, n = 5 -> skip = 20; one unit with w=40 (> W/n) must be
    # selected (it spans two skip points but appears once)
    rows = [("big", 40)] + [(f"s{i}", 4) for i in range(15)]
    df = spark.createDataFrame(rows, ["k", "w"])
    out = [r["k"] for r in
           pps_systematic_sample(df, ["k"], "w", n_samples=5).collect()]
    assert "big" in out
    assert len(out) == len(set(out))  # no duplicates


# ---------------------------------------------------------------------------
# compaction plan
# ---------------------------------------------------------------------------

def test_compaction_plan_bins_and_fill(spark):
    rows = [(f"f{i}", 40) for i in range(10)]  # 400 bytes total
    df = spark.createDataFrame(rows, ["path", "size_bytes"])
    out = sorted(
        (r["bin"], r["n_files"], r["bin_bytes"])
        for r in compaction_plan(df, target_bytes=100).collect()
    )
    # cum-before div 100: files at cum_before 0,40,80 -> bin 0 (3
    # files), 120..180 -> bin 1, ... deterministic layout
    assert sum(n for _, n, _ in out) == 10
    assert sum(b for _, _, b in out) == 400
    assert all(b <= 100 + 40 for _, _, b in out)  # overflow < one file


def test_compaction_plan_oversized_file_gets_own_bin(spark):
    rows = [("huge", 1000), ("a", 10), ("b", 10)]
    df = spark.createDataFrame(rows, ["path", "size_bytes"])
    plan = compaction_plan(df, target_bytes=100)
    per_bin = {r["bin"]: r for r in plan.collect()}
    # huge sorts first (size desc), occupies bins 0..9 worth of cum
    # space; the small files land past it, never sharing its bin
    bins_with_huge = [
        b for b, r in per_bin.items()
        if r["max_file_bytes"] == 1000
    ]
    assert len(bins_with_huge) == 1
    assert per_bin[bins_with_huge[0]]["n_files"] == 1


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------

def test_modularity_two_cliques(spark):
    # two 4-cliques joined by one bridge edge: strong structure
    edges = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((0, 10))  # bridge
    e = spark.createDataFrame(edges, ["src", "dst"])
    comm = spark.createDataFrame(
        [(i, "left") for i in range(4)]
        + [(10 + i, "right") for i in range(4)],
        ["node", "community"],
    )
    out = {r["community"]: r for r in modularity(e, comm).collect()}
    m = 13  # 6 + 6 + 1
    assert out["left"]["intra_edges"] == 6
    assert out["right"]["intra_edges"] == 6
    # degree sums: clique degrees 3*4 = 12, +1 bridge endpoint each
    assert out["left"]["degree_sum"] == 13
    assert out["__ALL__"]["intra_edges"] == 12
    q = sum(
        out[c]["intra_edges"] / m - (out[c]["degree_sum"] / (2 * m)) ** 2
        for c in ("left", "right")
    )
    assert out["__ALL__"]["q_contribution"] == pytest.approx(q, abs=1.01e-6)
    assert out["__ALL__"]["q_contribution"] > 0.4  # real structure


def test_modularity_random_labels_near_zero(spark):
    # ring of 20 nodes, communities by parity (edges always cross) ->
    # e_c = 0, Q = -(sum of squared degree shares) < 0
    edges = [(i, (i + 1) % 20) for i in range(20)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    comm = spark.createDataFrame(
        [(i, str(i % 2)) for i in range(20)], ["node", "community"]
    )
    out = {r["community"]: r for r in modularity(e, comm).collect()}
    assert out["0"]["intra_edges"] == 0 and out["1"]["intra_edges"] == 0
    assert out["__ALL__"]["q_contribution"] == pytest.approx(-0.5, abs=1e-6)


def test_modularity_dedups_and_canonicalizes_edges(spark):
    # duplicate + reversed + self-loop edges must count once / drop
    edges = [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3)]
    e = spark.createDataFrame(edges, ["src", "dst"])
    comm = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "y")], ["node", "community"]
    )
    out = {r["community"]: r for r in modularity(e, comm).collect()}
    assert out["__ALL__"]["intra_edges"] == 1  # only (1,2)
    assert out["__ALL__"]["degree_sum"] == 4  # 2 edges * 2 endpoints


# ---------------------------------------------------------------------------
# perplexity bins (CCNet-style)
# ---------------------------------------------------------------------------

def test_perplexity_bins_head_middle_tail(spark):
    from eggv_spark.operators.text_analysis import perplexity_bins

    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, common) for i in range(6)] + [
        (100, "zyx qwv jkl zzq xxw ppt"),  # OOV-ish -> tail
        (101, "the cat sat zyx qwv jkl"),
        (102, common + " extra"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["bin"]: r for r in perplexity_bins(df, n_bins=3).collect()}
    assert sum(r["n_docs"] for r in out.values()) == 9
    # head (bin 1) scores strictly better than tail (bin 3)
    assert out[1]["mean_logprob"] > out[3]["mean_logprob"]
    # the rare-token doc must be in the tail bin
    tail_docs = out[3]["n_docs"]
    assert tail_docs >= 1


def test_perplexity_bins_partition_invariant(spark):
    from eggv_spark.operators.text_analysis import perplexity_bins

    rows = [(i, f"tok{i % 7} tok{i % 3} shared words here") for i in range(40)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = sorted(tuple(r) for r in perplexity_bins(df).collect())
    b = sorted(
        tuple(r) for r in perplexity_bins(df.repartition(9)).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# BPE application
# ---------------------------------------------------------------------------

def test_bpe_apply_counts_match_manual(spark):
    from eggv_spark.operators.text_analysis import (
        bpe_apply_merges,
        bpe_train_merges,
    )

    corpus = ["low low low lower lowest", "new newer newest low"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], ["doc_id", "text"]
    )
    merges = bpe_train_merges(df, n_merges=3)
    out = {r["doc_id"]: r for r in
           bpe_apply_merges(df, merges, 3).collect()}
    # manual: replicate the greedy merge on one word
    merge_list = [
        (r["pair_a"], r["pair_b"]) for r in
        merges.orderBy("step").collect()
    ]

    def apply_word(w):
        syms = list(w)
        for a, b in merge_list:
            out_syms, i = [], 0
            while i < len(syms):
                if (
                    out_syms and out_syms[-1] == a and syms[i] == b
                ):
                    out_syms[-1] = a + b
                    i += 1
                else:
                    out_syms.append(syms[i])
                    i += 1
            syms = out_syms
        return len(syms)

    for i, text in enumerate(corpus):
        words = text.split()
        exp = sum(apply_word(w) for w in words)
        assert out[i]["n_words"] == len(words)
        assert out[i]["n_bpe_tokens"] == exp, (i, text)


def test_bpe_apply_fewer_tokens_than_chars(spark):
    from eggv_spark.operators.text_analysis import (
        bpe_apply_merges,
        bpe_train_merges,
    )

    df = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa aaaa")], ["doc_id", "text"]
    )
    merges = bpe_train_merges(df, n_merges=2)
    row = bpe_apply_merges(df, merges, 2).collect()[0]
    # merges (a,a)->aa then (aa,aa)->aaaa: each word is ONE token
    assert row["n_bpe_tokens"] == 4 and row["n_words"] == 4


# ---------------------------------------------------------------------------
# image patch extraction
# ---------------------------------------------------------------------------

def test_image_patches_match_formula(spark):
    from eggv_spark.operators.multimodal import (
        image_patches,
        synthesize_ppm_images,
    )

    docs = spark.createDataFrame([(d,) for d in (0, 3, 11)], ["doc_id"])
    assets = synthesize_ppm_images(docs, width=8, height=8)
    out = {
        (r["asset_id"], r["patch_row"], r["patch_col"]): r
        for r in image_patches(assets, patch=4).collect()
    }
    assert len(out) == 3 * 4  # 8x8 image, 4x4 patches -> 2x2 grid each

    # pixel byte i of doc d is (d*7 + i*13) % 256 (synthesizer formula)
    def mean(d, pr, pc, ch):
        tot = 0
        for dy in range(4):
            for dx in range(4):
                i = (((pr * 4 + dy) * 8) + pc * 4 + dx) * 3 + ch
                tot += (d * 7 + i * 13) % 256
        return tot / 16

    for d in (0, 3, 11):
        for pr in range(2):
            for pc in range(2):
                r = out[(d, pr, pc)]
                assert r["mean_r"] == mean(d, pr, pc, 0)
                assert r["mean_g"] == mean(d, pr, pc, 1)
                assert r["mean_b"] == mean(d, pr, pc, 2)


def test_image_patches_rejects_ragged_grid(spark):
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from eggv_spark.operators.multimodal import (
        image_patches,
        synthesize_ppm_images,
    )

    docs = spark.createDataFrame([(1,)], ["doc_id"])
    assets = synthesize_ppm_images(docs, width=6, height=6)
    with _pytest.raises((PythonException, Py4JJavaError)):
        image_patches(assets, patch=4).collect()


# ---------------------------------------------------------------------------
# funnel paths
# ---------------------------------------------------------------------------

def test_funnel_paths_orders_and_truncates(spark):
    import datetime as dt

    from eggv_spark.operators.events import funnel_paths

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # 3 users view>click>purchase, 2 users view>view, 1 long user
    for u, seq in [("a", ["view", "click", "purchase"]),
                   ("b", ["view", "click", "purchase"]),
                   ("c", ["view", "click", "purchase"]),
                   ("d", ["view", "view"]), ("e", ["view", "view"]),
                   ("f", ["view"] * 12)]:
        for i, t in enumerate(seq):
            rows.append((eid, u, t, base + dt.timedelta(minutes=i)))
            eid += 1
    df = spark.createDataFrame(rows, ["event_id", "user_id",
                                      "event_type", "ts"])
    out = funnel_paths(df, max_steps=4, top_n=10).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["path"] == "view>click>purchase"
    assert by_rank[1]["n_users"] == 3
    assert by_rank[2]["path"] == "view>view" and by_rank[2]["n_users"] == 2
    # the 12-event user truncates to max_steps
    assert by_rank[3]["path"] == "view>view>view>view"


def test_funnel_paths_equal_ts_uses_tiebreak(spark):
    import datetime as dt

    from eggv_spark.operators.events import funnel_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = [(2, "u", "b", t0), (1, "u", "a", t0), (3, "u", "c", t0)]
    df = spark.createDataFrame(rows, ["event_id", "user_id",
                                      "event_type", "ts"])
    out = funnel_paths(df).collect()
    assert out[0]["path"] == "a>b>c"  # event_id order under tied ts


def test_pps_stratified_exact_n_per_stratum(spark):
    from eggv_spark.operators.relational import pps_stratified_sample

    rows = [(f"s{i % 4}", f"k{i}", (1 + (i * 3) % 9) * 10)
            for i in range(200)]
    df = spark.createDataFrame(rows, ["stratum", "k", "w"])
    out = pps_stratified_sample(df, ["stratum"], ["k"], "w",
                                n_per_stratum=5).collect()
    per = {}
    for r in out:
        per.setdefault(r["stratum"], []).append(r["k"])
    assert set(per) == {"s0", "s1", "s2", "s3"}
    for s, ks in per.items():
        assert len(ks) == 5 and len(set(ks)) == 5, s
    # partition-invariance
    out2 = pps_stratified_sample(df.repartition(11), ["stratum"], ["k"],
                                 "w", n_per_stratum=5).collect()
    assert sorted((r["stratum"], r["k"]) for r in out) == \
        sorted((r["stratum"], r["k"]) for r in out2)


def test_pps_stratified_equals_global_per_stratum(spark):
    """Within one stratum the stratified draw IS the global draw."""
    from eggv_spark.operators.relational import (
        pps_stratified_sample,
        pps_systematic_sample,
    )

    rows = [(f"k{i}", (1 + i % 7) * 20) for i in range(80)]
    df = spark.createDataFrame(rows, ["k", "w"])
    one = df.withColumn("s", F.lit("only"))
    a = sorted(r["k"] for r in
               pps_systematic_sample(df, ["k"], "w", 8).collect())
    b = sorted(r["k"] for r in
               pps_stratified_sample(one, ["s"], ["k"], "w", 8).collect())
    assert a == b
