"""Property tests for the second round-9-staged wave (Naive Bayes,
Wasserstein-1D, token entropy, n-gram diversity, audio silence).
Ground truth is a pure-Python replica of the identical formula.
"""

from __future__ import annotations

import math

DOCS = [
    (0, "spark spark table scan join", "src0"),
    (1, "table scan join filter spark", "src0"),
    (2, "cat dog cat dog bird bird bird", "src1"),
    (3, "dog cat bird dog cat", "src1"),
    (4, "spark table cat", "src0"),
    (5, "one one one one", "src2"),
]


def test_naive_bayes_matches_python_replica(spark):
    from collections import Counter, defaultdict

    from eggv_spark.operators.ml import naive_bayes_fit

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    got = {r["label"]: (r["n_docs"], r["prior"], r["recall"])
           for r in naive_bayes_fit(df).collect()}

    toks = {i: t.split() for i, t, _ in DOCS}
    labels = {i: s for i, _, s in DOCS}
    ct: dict[str, Counter] = defaultdict(Counter)
    for i, ws in toks.items():
        ct[labels[i]].update(ws)
    vocab = {w for c in ct.values() for w in c}
    v = len(vocab)
    n = len(DOCS)
    nc = Counter(labels.values())
    correct = Counter()
    for i, ws in toks.items():
        best = None
        for c in sorted(nc):
            tot = sum(ct[c].values())
            s = math.log(nc[c] / n) + sum(
                math.log((ct[c][w] + 1) / (tot + v)) for w in ws
            )
            s = round(s, 6)
            # ties go to the LARGEST label (max-struct rule)
            if best is None or (s, c) > best:
                best = (s, c)
        if best[1] == labels[i]:
            correct[labels[i]] += 1
    for c in nc:
        assert got[c] == (
            nc[c], round(nc[c] / n, 4), round(correct[c] / nc[c], 4)
        )
    assert got["__ALL__"] == (
        n, 1.0, round(sum(correct.values()) / n, 4)
    )
    # the fully separable fixture must classify perfectly
    assert got["__ALL__"][2] == 1.0


def _py_w1(xs, ys):
    vs = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    w = 0.0
    for v0, v1 in zip(vs, vs[1:]):
        fa = sum(1 for x in xs if x <= v0) / na
        fb = sum(1 for y in ys if y <= v0) / nb
        w += abs(fa - fb) * (v1 - v0)
    return round(w, 6)


def test_wasserstein_matches_bruteforce(spark):
    from eggv_spark.operators.aggregates import wasserstein_1d

    xs = [100, 250, 250, 900, 1300, 40]
    ys = [90, 260, 800, 800, 2000]
    rows = [("a", v) for v in xs] + [("b", v) for v in ys]
    df = spark.createDataFrame(rows, ["g", "cents"])
    r = wasserstein_1d(df, "g", "cents", "a", "b").collect()[0]
    assert (r["n_a"], r["n_b"]) == (6, 5)
    assert r["wasserstein_cents"] == _py_w1(xs, ys)
    # identical samples -> zero transport
    rows2 = [("a", v) for v in xs] + [("b", v) for v in xs]
    df2 = spark.createDataFrame(rows2, ["g", "cents"])
    assert wasserstein_1d(df2, "g", "cents", "a", "b").collect()[0][
        "wasserstein_cents"
    ] == 0.0
    # a pure +100c shift of a point mass moves exactly 100c
    rows3 = [("a", 500)] * 4 + [("b", 600)] * 4
    df3 = spark.createDataFrame(rows3, ["g", "cents"])
    assert wasserstein_1d(df3, "g", "cents", "a", "b").collect()[0][
        "wasserstein_cents"
    ] == 100.0


def test_token_entropy_matches_python(spark):
    from collections import Counter

    from eggv_spark.operators.text_analysis import token_entropy

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    got = {r["doc_id"]: tuple(r)[1:] for r in token_entropy(df).collect()}
    for i, t, _ in DOCS:
        ws = t.split()
        c = Counter(ws)
        h = -sum((k / len(ws)) * math.log(k / len(ws)) for k in c.values())
        ev = round(h / math.log(len(c)), 4) if len(c) > 1 else 0.0
        assert got[i] == (len(ws), len(c), round(h, 4), ev)
    # the single-token doc has zero entropy and zero evenness
    assert got[5] == (4, 1, 0.0, 0.0)


def test_ngram_diversity_matches_python(spark):
    from collections import Counter

    from eggv_spark.operators.text_analysis import ngram_diversity

    df = spark.createDataFrame(DOCS, ["doc_id", "text", "source"])
    got = {
        (r["source"], r["ngram_size"]): (
            r["total_ngrams"], r["distinct_ngrams"], r["diversity"]
        )
        for r in ngram_diversity(df, "source", sizes=(1, 2)).collect()
    }
    for n in (1, 2):
        per_src: dict[str, Counter] = {}
        for _, t, s in DOCS:
            ws = t.split()
            grams = [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]
            per_src.setdefault(s, Counter()).update(grams)
        for s, c in per_src.items():
            tot = sum(c.values())
            assert got[(s, n)] == (tot, len(c), round(len(c) / tot, 6))
    # the repeated-token slice must be the least diverse at n=1
    assert got[("src2", 1)][2] == min(
        got[(s, 1)][2] for s in ("src0", "src1", "src2")
    )


def test_audio_silence_matches_formula(spark):
    from eggv_spark.operators.multimodal import (
        audio_silence_report,
        synthesize_wav_audio,
    )

    docs = spark.createDataFrame(
        [(i, "x", "s") for i in range(6)], ["doc_id", "text", "source"]
    )
    assets = synthesize_wav_audio(docs, n_samples=64)
    got = {r["asset_id"]: tuple(r)[1:]
           for r in audio_silence_report(assets, threshold=512).collect()}
    for d in range(6):
        vals = [((d * 31 + i * 17) % 4096) - 2048 for i in range(64)]
        silent = [abs(v) < 512 for v in vals]
        n_sil = sum(silent)
        lead = next((i for i, s in enumerate(silent) if not s), 64)
        trail = next(
            (i for i, s in enumerate(reversed(silent)) if not s), 64
        )
        import math as m
        ratio = m.floor(n_sil / 64 * 10000 + 0.5) / 10000
        assert got[d] == (64, n_sil, ratio, lead, trail)
