"""Property-based tests: the custom operators (range join, as-of
join, salted join) must match their brute-force/naive definitions on
arbitrary inputs — not just the hand-picked examples.

Deliberately small example counts: each example runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from eggv_spark.operators.rangejoin import asof_join, range_join
from eggv_spark.operators.relational import salted_join

_settings = settings(max_examples=10, deadline=None)

intervals_strategy = st.lists(
    st.tuples(st.integers(-50, 50), st.integers(0, 30)),  # (lo, length)
    min_size=1, max_size=8,
)
points_strategy = st.lists(st.integers(-60, 90), min_size=1, max_size=12)


@_settings
@given(intervals=intervals_strategy, points=points_strategy)
def test_range_join_equals_naive(spark, intervals, points):
    iv = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(intervals)],
        ["iv_id", "lo", "hi"],
    )
    pt = spark.createDataFrame(
        [(i, x) for i, x in enumerate(points)], ["pt_id", "x"]
    )
    got = {
        (r.pt_id, r.iv_id)
        for r in range_join(pt, iv, "x", "lo", "hi", bin_width=31).collect()
    }
    expected = {
        (pi, ii)
        for ii, (lo, ln) in enumerate(intervals)
        for pi, x in enumerate(points)
        if lo <= x <= lo + ln
    }
    assert got == expected


asof_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20)),
             min_size=1, max_size=10),  # left (key, t)
    st.lists(st.tuples(st.integers(0, 2), st.integers(0, 20),
                       st.integers(0, 100)),
             min_size=0, max_size=10),  # right (key, t, v)
)


@_settings
@given(data=asof_strategy)
def test_asof_join_equals_naive(spark, data):
    lrows, rrows = data
    # Deduplicate right on (key, t) with max v — ties at equal time
    # are otherwise ambiguous in ANY as-of definition.
    rbest: dict = {}
    for k, t, v in rrows:
        rbest[(k, t)] = max(rbest.get((k, t), -1), v)
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)], ["lid", "k", "t"]
    )
    right = spark.createDataFrame(
        [(k, t, v) for (k, t), v in rbest.items()] or [(99, 0, 0)],
        ["k", "t", "v"],
    )
    out = asof_join(left, right, ["k"], "t", ["v"], tiebreak_col="lid")
    got = {r.lid: r.asof_v for r in out.collect()}
    for i, (k, t) in enumerate(lrows):
        prior = [v for (kk, tt), v in rbest.items() if kk == k and tt <= t]
        latest_t = max((tt for (kk, tt) in rbest if kk == k and tt <= t),
                       default=None)
        expected = rbest[(k, latest_t)] if latest_t is not None else None
        if (99, 0) in rbest or right.count() == 0:
            pass  # placeholder row never matches real keys (k <= 2)
        assert got[i] == expected, (i, k, t, prior)


@_settings
@given(
    keys=st.lists(st.integers(0, 3), min_size=1, max_size=20),
    n_salts=st.integers(1, 5),
)
def test_salted_join_equals_plain(spark, keys, n_salts):
    left = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], ["lid", "k"]
    )
    right = spark.createDataFrame(
        [(k, k * 10) for k in range(3)], ["k", "v"]
    )
    plain = sorted(
        (r.lid, r.v) for r in left.join(right, "k").collect()
    )
    salted = sorted(
        (r.lid, r.v)
        for r in salted_join(left, right, "k", n_salts=n_salts).collect()
    )
    assert salted == plain


@_settings
@given(
    left=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)),
        min_size=1, max_size=10,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 30)),
        min_size=1, max_size=10,
    ),
    tolerance=st.sampled_from([None, 3, 10]),
)
def test_forward_asof_with_tolerance_matches_pandas(
    spark, left, right, tolerance
):
    """Forward as-of + tolerance must agree with pandas merge_asof —
    an independent reference implementation, on arbitrary inputs.
    Right times are deduped per (key, t) so the nearest match is
    unique and both engines pick the same row."""
    import pandas as pd

    rdedup = sorted(set(right))
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        "event_id long, k long, t long",
    )
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in rdedup], "k long, t long, val long"
    )
    got = {
        r.event_id: r.asof_val
        for r in asof_join(
            ldf, rdf, ["k"], "t", ["val"], tiebreak_col="event_id",
            direction="forward", tolerance=tolerance,
        ).collect()
    }

    lp = pd.DataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)],
        columns=["event_id", "k", "t"],
    ).sort_values("t", kind="mergesort")
    rp = pd.DataFrame(rdedup, columns=["k", "t"])
    rp["val"] = rp["k"] * 1000 + rp["t"]
    rp = rp.sort_values("t", kind="mergesort")
    merged = pd.merge_asof(
        lp, rp, on="t", by="k", direction="forward",
        tolerance=tolerance, suffixes=("", "_r"),
    )
    want = {
        int(r.event_id): (None if pd.isna(r.val) else int(r.val))
        for r in merged.itertuples()
    }
    assert got == want


@_settings
@given(
    lefts=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 25)),
        min_size=1, max_size=8,
    ),
    rights=st.lists(
        st.tuples(st.integers(-40, 40), st.integers(0, 25)),
        min_size=1, max_size=8,
    ),
)
def test_interval_overlap_join_equals_naive(spark, lefts, rights):
    from eggv_spark.operators.rangejoin import interval_overlap_join

    ldf = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(lefts)],
        "lid long, l_lo long, l_hi long",
    )
    rdf = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(rights)],
        "rid long, r_lo long, r_hi long",
    )
    got = sorted(
        (r.lid, r.rid)
        for r in interval_overlap_join(
            ldf, rdf, "l_lo", "l_hi", "r_lo", "r_hi", bin_width=26
        ).collect()
    )
    want = sorted(
        (li, ri)
        for li, (llo, lln) in enumerate(lefts)
        for ri, (rlo, rln) in enumerate(rights)
        if llo <= rlo + rln and rlo <= llo + lln
    )
    assert got == want
