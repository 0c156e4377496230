"""Property-based tests for the round-9 STAGED operators: the
winnowing kernel must match its sequential reference on arbitrary
strings (the guarantee is combinatorial, not statistical), and
quantile binning must reproduce type-1 edges on arbitrary integer
multisets.

Deliberately small example counts: each example runs real Spark jobs.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings, strategies as st

_settings = settings(max_examples=10, deadline=None)


def _ref_base_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _ref_winnow(text: str, k: int, w: int):
    norm = "".join(c for c in text.lower() if c.isalnum())
    if len(norm) < k:
        return set()
    hs = [
        (_ref_base_hash(norm[i:i + k]), i + 1)
        for i in range(len(norm) - k + 1)
    ]
    picks = set()
    for s in range(len(hs) - w + 1):
        best = min(hs[s:s + w], key=lambda t: (t[0], -t[1]))
        picks.add((best[1], best[0]))
    return picks


texts_strategy = st.lists(
    st.text(
        alphabet="ab cd1!",  # tiny alphabet maximizes hash ties and
        min_size=0,          # punctuation stripping edge cases
        max_size=40,
    ),
    min_size=1,
    max_size=5,
)


@_settings
@given(texts=texts_strategy, k=st.integers(2, 4), w=st.integers(1, 5))
def test_winnowing_equals_sequential_reference(spark, texts, k, w):
    from eggv_spark.operators.text_analysis import winnowing_fingerprints

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["pos"], r["gram_hash"])
        for r in winnowing_fingerprints(df, k=k, w=w).collect()
    }
    exp = {
        (d, pos, h)
        for d, t in enumerate(texts)
        for (pos, h) in _ref_winnow(t, k, w)
    }
    assert got == exp


values_strategy = st.lists(st.integers(-100, 100), min_size=1, max_size=40)


@_settings
@given(values=values_strategy, nb=st.integers(2, 8))
def test_quantile_binning_edges_are_type1_exact(spark, values, nb):
    from eggv_spark.operators.relational import quantile_binning

    df = spark.createDataFrame([(v,) for v in values], "v long")
    out = sorted(
        quantile_binning(df, "v", nb).collect(), key=lambda r: r["bin"]
    )
    assert len(out) == nb
    vals = sorted(values)
    n = len(vals)
    for j, row in enumerate(out, start=1):
        rank = -((-j * n) // nb)  # integer-safe ceil(j*n/nb)
        assert row["upper_edge"] == vals[rank - 1]
    # every row lands in exactly one bin
    assert sum(r["n_rows"] for r in out) == n
    # bin assignment is the smallest j with edge >= v
    edges = [r["upper_edge"] for r in out]
    from collections import Counter

    exp_counts = Counter(
        next(j for j, e in enumerate(edges, start=1) if v <= e)
        for v in values
    )
    for j, row in enumerate(out, start=1):
        assert row["n_rows"] == exp_counts.get(j, 0)
