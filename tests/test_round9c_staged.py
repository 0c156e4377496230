"""Property/replica tests for the round-9c staged wave: multi-step
k-means (Lloyd), isotonic calibration (PAV via minimax), daily-count
autocorrelation, image intensity entropy, and embedding coherence.

Staging lessons this wave encodes:

- kmeans_lloyd closes the ITERATIVE FEEDBACK loop (engine-computed
  centroids feed the next assignment), so the centroid update sums
  coordinates as DECIMAL(38,18) — exact, order-independent — and the
  assignment argmin runs on the 6dp-rounded distance.  The replica
  here reproduces the whole trajectory in plain Python.
- isotonic uses the minimax identity iso(b) = max_{i<=b} min_{j>=b}
  mean(i..j), equivalent to sequential PAV — asserted against an
  actual pool-adjacent-violators implementation, plus monotonicity.
- acf is the standard biased estimator over a ZERO-FILLED day spine
  (gaps are data), so acf(0) would be 1 and all lags are comparable.
- image entropy folds the intensity histogram in sorted order
  (pinned summation), rounding half-up at 4dp.
"""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F


# --- kmeans_lloyd ---------------------------------------------------------


def _py_kmeans(vecs, k, n_steps, dim):
    """Plain-Python Lloyd replica with the operator's pinned rules:
    first-k-by-id seed, 6dp-rounded argmin distance with smallest-cid
    ties, exact mean update (Python ints/Fractions not needed: use
    sum of doubles? NO — mirror the decimal rule with math.fsum on
    exactly-representable doubles; on the tiny fixture every sum is
    exact anyway)."""
    cent = [list(vecs[i][1][:dim]) for i in sorted(vecs)[:k]]
    ids = sorted(vecs)

    def dist6(x, c):
        return round(math.fsum((a - b) * (a - b) for a, b in zip(x, c)), 6)

    assign = {}
    for _ in range(n_steps):
        assign = {
            i: min(
                range(k), key=lambda c: (dist6(vecs[i][1][:dim], cent[c]), c)
            )
            for i in ids
        }
        for c in range(k):
            members = [vecs[i][1][:dim] for i in ids if assign[i] == c]
            if members:
                cent[c] = [
                    math.fsum(m[d] for m in members) / len(members)
                    for d in range(dim)
                ]
    final = {
        i: min(range(k), key=lambda c: (dist6(vecs[i][1][:dim], cent[c]), c))
        for i in ids
    }
    out = {}
    for c in range(k):
        members = [i for i in ids if final[i] == c]
        inertia = round(
            sum(dist6(vecs[i][1][:dim], cent[c]) for i in members), 2
        )
        norm = round(math.sqrt(math.fsum(x * x for x in cent[c])), 4)
        out[c] = (len(members), inertia, norm)
    return out


def test_kmeans_lloyd_matches_python_replica(spark):
    from eggv_spark.operators.ml import kmeans_lloyd

    # integer-valued coordinates: every double op in the replica is
    # exact, so the comparison is bit-for-bit
    vecs = {
        i: (i, [float((i * 7 + d * 13) % 11 - 5) for d in range(4)])
        for i in range(30)
    }
    df = spark.createDataFrame(
        [(i, v[1]) for i, v in vecs.items()], ["vec_id", "embedding"]
    )
    got = {
        r["cluster_id"]: (r["n_points"], r["inertia"], r["centroid_norm"])
        for r in kmeans_lloyd(
            df, k=3, n_steps=2, dim=4
        ).collect()
    }
    exp = _py_kmeans(vecs, k=3, n_steps=2, dim=4)
    assert got == exp
    assert sum(n for n, _, _ in got.values()) == 30


def test_kmeans_lloyd_empty_cluster_keeps_centroid(spark):
    from eggv_spark.operators.ml import kmeans_lloyd

    # two tight blobs, k=3: the third seed is inside a blob and goes
    # empty after reassignment — its centroid must persist, n=0
    rows = [(i, [0.0, 0.0]) for i in range(5)] + [
        (i, [100.0, 100.0]) for i in range(5, 10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {
        r["cluster_id"]: r["n_points"]
        for r in kmeans_lloyd(df, k=3, n_steps=2, dim=2).collect()
    }
    assert len(out) == 3
    assert sum(out.values()) == 10
    assert 0 in out.values()


# --- isotonic_calibration -------------------------------------------------


def _py_pav(bins):
    """Sequential pool-adjacent-violators over (bin, n, pos) rows."""
    blocks = [
        [n, pos] for _b, n, pos in sorted(bins)
    ]  # [weight, pos-mass]
    # classic stack-based PAV
    stack: list[list[float]] = []
    for w, p in blocks:
        stack.append([w, p])
        while (
            len(stack) > 1
            and stack[-2][1] / stack[-2][0] >= stack[-1][1] / stack[-1][0]
        ):
            w2, p2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += p2
    out = []
    idx = 0
    ordered = sorted(bins)
    for w, p in stack:
        consumed = 0
        while consumed < w:
            b, n, _pos = ordered[idx]
            out.append((b, round(p / w, 6)))
            consumed += n
            idx += 1
    return dict(out)


def test_isotonic_matches_sequential_pav(spark):
    from eggv_spark.operators.ml import isotonic_calibration

    # per-bin (n, pos) with deliberate violations
    spec = [
        (0, 10, 1),
        (1, 8, 4),
        (2, 12, 3),  # violation vs bin 1
        (3, 9, 5),
        (4, 7, 7),
        (5, 11, 6),  # violation vs bin 4
    ]
    rows = []
    for b, n, pos in spec:
        rows += [(b, 1)] * pos + [(b, 0)] * (n - pos)
    df = spark.createDataFrame(rows, ["bin", "label"])
    got = {
        r["bin"]: (r["n"], r["pos_rate"], r["iso_rate"])
        for r in isotonic_calibration(df).collect()
    }
    exp_iso = _py_pav(spec)
    assert set(got) == {b for b, _, _ in spec}
    for b, n, pos in spec:
        assert got[b][0] == n
        assert got[b][1] == round(pos / n, 6)
        assert got[b][2] == pytest.approx(exp_iso[b], abs=2e-6)
    # monotone non-decreasing in bin order
    iso_seq = [got[b][2] for b, _, _ in sorted(spec)]
    assert iso_seq == sorted(iso_seq)


def test_isotonic_max_bins_guard_raises(spark):
    from eggv_spark.operators.ml import isotonic_calibration

    df = spark.createDataFrame(
        [(i, i % 2) for i in range(50)], ["bin", "label"]
    )
    with pytest.raises(Exception, match="max_bins"):
        isotonic_calibration(df, max_bins=10).collect()


# --- acf_lags --------------------------------------------------------------


def test_acf_matches_python_on_seasonal_series(spark):
    from eggv_spark.operators.events import acf_lags

    import datetime as dt

    # strong period-3 seasonality, with a GAP day (zero-filled)
    days, counts = [], []
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    for t in range(21):
        c = [9, 1, 2][t % 3]
        if t == 10:
            continue  # gap day -> x=0 in the spine
        days.append(base + dt.timedelta(days=t))
        counts.append(c)
    rows = [
        (d + dt.timedelta(seconds=s),)
        for d, c in zip(days, counts)
        for s in range(c)
    ]
    df = spark.createDataFrame(rows, ["ts"])
    got = {
        r["lag"]: (r["n_pairs"], r["acf"])
        for r in acf_lags(df, "ts", n_lags=4).collect()
    }
    series = [[9, 1, 2][t % 3] if t != 10 else 0 for t in range(21)]
    n = len(series)
    mu = sum(series) / n
    den = sum((x - mu) ** 2 for x in series)
    for lag in range(1, 5):
        pairs = list(zip(series, series[lag:]))
        acf = round(
            sum((a - mu) * (b - mu) for a, b in pairs) / den, 6
        )
        assert got[lag][0] == len(pairs)
        assert got[lag][1] == pytest.approx(acf, abs=2e-6)
    # period-3 signal: lag-3 autocorrelation dominates lags 1/2
    assert got[3][1] > got[1][1] and got[3][1] > got[2][1]


# --- image_entropy_report ---------------------------------------------------


def test_image_entropy_matches_formula(spark):
    from eggv_spark.operators.multimodal import (
        image_entropy_report,
        synthesize_ppm_images,
    )

    docs = spark.range(6).select(F.col("id").alias("doc_id"))
    assets = synthesize_ppm_images(docs, width=4, height=4)
    got = {
        r["asset_id"]: (
            r["n_bytes"], r["n_distinct"], r["entropy"], r["max_share"]
        )
        for r in image_entropy_report(assets).collect()
    }
    for d in range(6):
        raster = [(d * 7 + i * 13) % 256 for i in range(48)]
        counts: dict[int, int] = {}
        for px in raster:
            counts[px] = counts.get(px, 0) + 1
        h = 0.0
        for _v, c in sorted(counts.items()):
            p = c / 48
            h -= p * math.log(p)
        assert got[d][0] == 48
        assert got[d][1] == len(counts)
        assert got[d][2] == math.floor(h * 10000 + 0.5) / 10000
        assert got[d][3] == math.floor(
            max(counts.values()) / 48 * 10000 + 0.5
        ) / 10000


def test_image_entropy_solid_fill_is_zero(spark):
    from eggv_spark.operators.multimodal import image_entropy_report

    header = b"P6\n2 2\n255\n"
    payload = header + bytes([7] * 12)
    df = spark.createDataFrame(
        [(0, "image", bytearray(payload))],
        "asset_id long, modality string, payload binary",
    )
    row = image_entropy_report(df).collect()[0]
    assert row["entropy"] == 0.0
    assert row["n_distinct"] == 1
    assert row["max_share"] == 1.0


# --- embedding coherence ----------------------------------------------------


def test_embedding_coherence_flags_planted_outlier(spark):
    from eggv_spark.operators.similarity import embedding_coherence

    rows = [(i, 0, [1.0, 0.1 * (i % 3), 0.0]) for i in range(9)]
    rows.append((9, 0, [-1.0, 0.0, 0.0]))  # anti-aligned outlier
    rows += [(10 + i, 1, [0.0, 1.0, 0.05 * i]) for i in range(5)]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    got = {
        r["label"]: r
        for r in embedding_coherence(
            df, dim=3, low_threshold=0.0
        ).collect()
    }
    assert got[0]["n"] == 10
    assert got[0]["n_low"] == 1  # exactly the planted outlier
    assert got[0]["min_cos"] < 0
    assert got[1]["n_low"] == 0
    assert got[1]["avg_cos"] > 0.9


def test_centroid_cosine_exact_for_identical_vectors(spark):
    from eggv_spark.operators.similarity import centroid_cosine

    rows = [(i, 0, [3.0, 4.0]) for i in range(4)]
    df = spark.createDataFrame(rows, ["vec_id", "label", "embedding"])
    out = centroid_cosine(df, dim=2).collect()
    assert all(r["_cos"] == 1.0 for r in out)
