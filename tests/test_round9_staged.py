"""Property tests for the round-9-staged operators (BM25, Kneser–Ney,
energy distance, channel histograms).  Ground truth is a pure-Python
replica of the identical published formula on deterministic fixtures.
"""

from __future__ import annotations

import math

import pytest


DOCS = [
    (0, "the cat sat on the mat", "src0"),
    (1, "the dog sat on the log and the dog barked", "src0"),
    (2, "cats and dogs and cats again", "src1"),
    (3, "completely unrelated words here now", "src0"),
    (4, "the cat and the dog met on the mat", "src1"),
    (5, "mat mat mat cat", "src0"),
]


def _py_bm25(docs, query, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t, _ in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfq = {
        q: sum(1 for t in toks.values() if q in t) for q in query
    }
    out = []
    for i, t in toks.items():
        s, hits = 0.0, 0
        for q in query:
            tf = t.count(q)
            if not tf:
                continue
            hits += 1
            idf = math.log(1 + (n - dfq[q] + 0.5) / (dfq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if hits:
            out.append((i, hits, round(s, 4)))
    out.sort(key=lambda r: (-r[2], r[0]))
    return out


def test_bm25_matches_python_replica(spark):
    from eggv_spark.operators.text_analysis import bm25_topk

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    query = ["cat", "mat", "dog"]
    got = [
        (r["doc_id"], r["n_terms_hit"], r["bm25"])
        for r in bm25_topk(df, query, k=3).collect()
    ]
    exp = _py_bm25(DOCS, query)[:3]
    assert sorted(got) == sorted(exp)
    # tf saturation: the doc hitting ALL THREE query terms must beat
    # the doc that spams one term (k1 caps per-term contributions —
    # exactly the keyword-stuffing resistance BM25 exists for)
    all_rows = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(df, query, k=10).collect()
    }
    assert all_rows[4] == max(all_rows.values())
    assert all_rows[5] < all_rows[4]


def _py_kn(docs, d=0.75):
    pairs = []
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for i, t, _ in docs:
        w = t.lower().split()
        ps = list(zip(w, w[1:]))
        per_doc[i] = ps
        pairs.extend(ps)
    from collections import Counter

    big = Counter(pairs)
    c1 = Counter(p[0] for p in pairs)
    n_after = Counter(a for a, b in big)
    n_before = Counter(b for a, b in big)
    tot_types = len(big)
    out = {}
    for i, ps in per_doc.items():
        if not ps:
            continue
        lp = [
            math.log(
                (big[p] - d) / c1[p[0]]
                + d * n_after[p[0]] / c1[p[0]]
                * (n_before[p[1]] / tot_types)
            )
            for p in ps
        ]
        out[i] = (len(ps), round(sum(lp) / len(lp), 4))
    return out


def test_kneser_ney_matches_python_replica(spark):
    from eggv_spark.operators.text_analysis import kneser_ney_logprob

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_kn_logprob"])
        for r in kneser_ney_logprob(df).collect()
    }
    assert got == _py_kn(DOCS)
    # the in-distribution doc must out-score the unrelated one
    assert got[0][1] > got[3][1]


def _py_energy(xs, ys):
    def mean_abs(a, b):
        return sum(abs(x - y) for x in a for y in b) / (len(a) * len(b))

    exy = mean_abs(xs, ys)
    exx = mean_abs(xs, xs)
    eyy = mean_abs(ys, ys)
    return (
        len(xs), len(ys),
        round(exy, 6), round(exx, 6), round(eyy, 6),
        round(2 * exy - exx - eyy, 6),
    )


def test_energy_distance_matches_bruteforce(spark):
    from eggv_spark.operators.aggregates import energy_distance

    xs = [100, 250, 250, 900, 1300, 40]
    ys = [90, 260, 800, 800, 2000]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, ["g", "cents"])
    got = tuple(energy_distance(df, "g", "cents", "a", "b").collect()[0])
    assert got == _py_energy(xs, ys)


def test_energy_distance_zero_on_identical_samples(spark):
    from eggv_spark.operators.aggregates import energy_distance

    vals = [10, 20, 20, 35, 50]
    rows = [("a", v) for v in vals] + [("b", v) for v in vals]
    df = spark.createDataFrame(rows, ["g", "cents"])
    r = energy_distance(df, "g", "cents", "a", "b").collect()[0]
    assert r["energy_distance_cents"] == 0.0


def test_image_channel_hist_matches_formula(spark):
    from eggv_spark.operators.multimodal import (
        image_channel_hist,
        synthesize_ppm_images,
    )

    docs = spark.createDataFrame(
        [(i, "x", "s") for i in range(4)], ["doc_id", "text", "source"]
    )
    assets = synthesize_ppm_images(docs, width=8, height=8)
    got = {
        (r["asset_id"], r["channel"], r["bin"]): r["n_px"]
        for r in image_channel_hist(assets, n_bins=4).collect()
    }
    # recompute from the synthesis formula: byte i of doc d is
    # (d*7 + i*13) % 256; channel = i % 3
    exp: dict[tuple, int] = {}
    for d in range(4):
        for ch, name in enumerate("rgb"):
            counts = [0] * 4
            for p in range(64):
                v = (d * 7 + (p * 3 + ch) * 13) % 256
                counts[v // 64] += 1
            for b, c in enumerate(counts):
                exp[(d, name, b)] = c
    assert got == exp
    # every channel's bins must sum to the pixel count
    for d in range(4):
        for name in "rgb":
            assert sum(got[(d, name, b)] for b in range(4)) == 64


def test_image_channel_hist_rejects_bad_bins(spark):
    from eggv_spark.operators.multimodal import image_channel_hist

    with pytest.raises(ValueError, match="divide 256"):
        image_channel_hist(None, n_bins=5)
