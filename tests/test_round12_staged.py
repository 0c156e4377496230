"""Staging tests for the round-10 wave destined for round 12 (the
registry is frozen at 445 through round 10; the round-11 window is
already claimed by the nine staged registrations):

- aggregates.jarque_bera — normality from exact integer power sums
- aggregates.macd — truncated-EMA trend momentum (12/26/9)
- relational.binned_target_rate — per-quantile-bin event rate with
  Wilson CI, sharing quantile_binning's edge kernel
- aggregates.durbin_watson (wave 2) — residual autocorrelation via
  ordered prefix-sum pooling
- aggregates.stochastic_oscillator (wave 2) — %K/%D rolling-extrema
  momentum windows
- aggregates.hosmer_lemeshow (wave 2) — calibration χ² over
  fixed-width risk bins, degenerate bins excluded loudly
- aggregates.effective_sample_size (wave 2) — Kish ESS/deff from
  exact integer weight sums, non-positive weights refused in-plan

Hand-computed unit tests + the Spark-vs-DuckDB pairing at sf0.001
against the oracle drafts validated in
tests/test_round12_staged_oracles.py.
"""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def con():
    c = duckdb.connect()
    for t in ("orders", "events"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _spark_vs_oracle(con, df, sql):
    got = sorted(tuple(r) for r in df.collect())
    exp = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == exp, f"\ngot: {got[:4]}\nexp: {exp[:4]}"


# ---------------------------------------------------------------------------
# jarque_bera
# ---------------------------------------------------------------------------


def test_jarque_bera_hand_example(spark):
    from eggv_spark.operators.aggregates import jarque_bera

    xs = [1, 2, 3, 4, 5, 6, 7, 8, 100]  # one huge outlier
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    r = jarque_bera(df, "x").collect()[0]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    g1 = m3 / m2 ** 1.5
    g2 = m4 / m2 ** 2 - 3.0
    jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    assert r["n"] == n
    assert r["skewness"] == pytest.approx(round(g1, 6), abs=1e-6)
    assert r["kurtosis_excess"] == pytest.approx(round(g2, 6), abs=1e-6)
    assert r["jb"] == pytest.approx(round(jb, 6), abs=1e-5)
    assert r["reject_5pct"] is True  # the outlier wrecks normality


def test_jarque_bera_symmetric_small_sample_accepts(spark):
    from eggv_spark.operators.aggregates import jarque_bera

    # symmetric, light-tailed: g1 = 0, JB tiny -> not rejected
    df = spark.createDataFrame(
        [(x,) for x in (-2, -1, -1, 0, 0, 0, 0, 1, 1, 2)], "x long"
    )
    r = jarque_bera(df, "x").collect()[0]
    assert r["skewness"] == 0.0
    assert r["reject_5pct"] is False


def test_jarque_bera_degenerate_constant_is_null(spark):
    from eggv_spark.operators.aggregates import jarque_bera

    df = spark.createDataFrame([(5,), (5,), (5,)], "x long")
    r = jarque_bera(df, "x").collect()[0]
    assert r["skewness"] is None and r["jb"] is None


def test_jarque_bera_oracle_sf0001(spark, con):
    from eggv_spark.operators.aggregates import jarque_bera
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import JB_SQL

    u = read_table(spark, SF_DIR, "orders").select(
        F.round("o_totalprice").cast("bigint").alias("x")
    )
    _spark_vs_oracle(con, jarque_bera(u, "x"), JB_SQL)


# ---------------------------------------------------------------------------
# macd
# ---------------------------------------------------------------------------


def _py_trunc_ema(xs, n_periods, max_lags=60):
    a = 2.0 / (n_periods + 1.0)
    out = []
    for t in range(len(xs)):
        num = den = 0.0
        for j in range(max_lags + 1):
            if t - j >= 0:
                wt = a * (1.0 - a) ** j
                num += xs[t - j] * wt
                den += wt
        out.append(num / den)
    return out


def test_macd_matches_sequential_reference(spark):
    from eggv_spark.operators.aggregates import macd

    xs = [float(100 + (i % 7) * 10 + (i % 3)) for i in range(45)]
    df = spark.createDataFrame(list(enumerate(xs)), "t long, v double")
    got = {r["t"]: r for r in macd(df, [], "t", "v").collect()}
    fast = _py_trunc_ema(xs, 12)
    slow = _py_trunc_ema(xs, 26)
    mac = [round(f - s, 6) for f, s in zip(fast, slow)]
    sig = _py_trunc_ema(mac, 9)
    for t in range(len(xs)):
        assert got[t]["macd"] == pytest.approx(mac[t], abs=2e-6)
        assert got[t]["signal_line"] == pytest.approx(sig[t], abs=2e-6)
        assert got[t]["histogram"] == pytest.approx(
            round(got[t]["macd"] - got[t]["signal_line"], 6), abs=2e-6
        )


def test_macd_keyed_series_are_independent(spark):
    from eggv_spark.operators.aggregates import macd

    rows = [("a", i, float(10 * i)) for i in range(20)] + [
        ("b", i, 5.0) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    out = macd(df, ["k"], "t", "v").collect()
    b_rows = [r for r in out if r["k"] == "b"]
    # constant series: every EMA equals the constant -> macd exactly 0
    assert all(r["macd"] == 0.0 and r["histogram"] == 0.0 for r in b_rows)
    a_tail = [r for r in out if r["k"] == "a"][-1]
    assert a_tail["macd"] > 0.0  # rising series: fast EMA above slow


def test_macd_oracle_sf0001(spark, con):
    from eggv_spark.operators.aggregates import macd
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import macd_sql

    daily = (
        read_table(spark, SF_DIR, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint").alias("x_cents")
        )
    )
    out = macd(daily, [], "day", "x_cents").select(
        F.datediff("day", F.lit("1970-01-01")).cast("bigint")
        .alias("day_num"),
        "x_cents", "macd", "signal_line", "histogram",
    )
    _spark_vs_oracle(con, out, macd_sql())


# ---------------------------------------------------------------------------
# binned_target_rate
# ---------------------------------------------------------------------------


def test_btr_hand_example(spark):
    from eggv_spark.operators.relational import binned_target_rate

    rows = [(i, 1 if i % 3 == 0 else 0) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "v long, y long")
    got = {r["bin"]: r for r in
           binned_target_rate(df, "v", "y", n_bins=4).collect()}
    assert [got[j]["upper_edge"] for j in (1, 2, 3, 4)] == [10, 20, 30, 40]
    assert all(got[j]["n_rows"] == 10 for j in (1, 2, 3, 4))
    # events of i%3==0 per decade: 3,3,4,3
    assert [got[j]["n_events"] for j in (1, 2, 3, 4)] == [3, 3, 4, 3]
    p = 0.3
    z2 = 1.96 * 1.96
    denom = 1.0 + z2 / 10.0
    center = (p + z2 / 20.0) / denom
    half = 1.96 * math.sqrt(p * 0.7 / 10.0 + z2 / 400.0) / denom
    assert got[1]["rate"] == pytest.approx(0.3, abs=1e-6)
    assert got[1]["ci_lo"] == pytest.approx(round(center - half, 6),
                                            abs=1e-6)
    assert got[1]["ci_hi"] == pytest.approx(round(center + half, 6),
                                            abs=1e-6)


def test_btr_bins_align_with_quantile_binning(spark):
    from eggv_spark.operators.relational import (
        binned_target_rate,
        quantile_binning,
    )

    rows = [(i * 7 % 97, i % 2) for i in range(1, 80)]
    df = spark.createDataFrame(rows, "v long, y long")
    qb = {r["bin"]: r for r in quantile_binning(df, "v", 5).collect()}
    btr = {r["bin"]: r for r in
           binned_target_rate(df, "v", "y", n_bins=5).collect()}
    for j in qb:
        assert qb[j]["upper_edge"] == btr[j]["upper_edge"]
        assert qb[j]["n_rows"] == btr[j]["n_rows"]


def test_btr_duplicate_heavy_empty_bins_are_null(spark):
    from eggv_spark.operators.relational import binned_target_rate

    df = spark.createDataFrame(
        [(1, 0)] * 9 + [(2, 1)], "v long, y long"
    )
    got = {r["bin"]: r for r in
           binned_target_rate(df, "v", "y", n_bins=4).collect()}
    empty = [j for j in got if got[j]["n_rows"] == 0]
    assert empty, "duplicate-heavy data must produce empty upper bins"
    for j in empty:
        assert got[j]["rate"] is None
        assert got[j]["ci_lo"] is None and got[j]["ci_hi"] is None


def test_btr_oracle_sf0001(spark, con):
    from eggv_spark.operators.relational import binned_target_rate
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import BTR_SQL

    u = read_table(spark, SF_DIR, "orders").select(
        F.round("o_totalprice").cast("bigint").alias("v"),
        (F.col("o_orderkey") % 3 == 0).cast("int").alias("y"),
    )
    _spark_vs_oracle(con, binned_target_rate(u, "v", "y", n_bins=8),
                     BTR_SQL)


# ---------------------------------------------------------------------------
# durbin_watson (wave 2)
# ---------------------------------------------------------------------------


def test_durbin_watson_alternating_residuals_near_four(spark):
    from eggv_spark.operators.aggregates import durbin_watson

    # y = 2t ± 7 alternating: residuals flip sign every step -> DW ~ 4
    rows = [(t, 2 * t + (7 if t % 2 == 0 else -7), t) for t in range(1, 31)]
    df = spark.createDataFrame(rows, "t long, y long, x long")
    r = durbin_watson(df, "t", "y", "x").collect()[0]
    assert r["n"] == 30
    assert r["dw"] > 3.5 and r["rho_approx"] < -0.75


def test_durbin_watson_trending_residuals_near_zero(spark):
    from eggv_spark.operators.aggregates import durbin_watson

    # x is noise, y is a smooth ramp the x-regression cannot explain:
    # residuals walk slowly -> strong positive autocorrelation, DW -> 0
    rows = [(t, t * t // 10, (t * 7) % 5) for t in range(1, 41)]
    df = spark.createDataFrame(rows, "t long, y long, x long")
    r = durbin_watson(df, "t", "y", "x").collect()[0]
    assert r["dw"] < 0.5 and r["rho_approx"] > 0.75


def test_durbin_watson_matches_sequential_reference(spark):
    from eggv_spark.operators.aggregates import durbin_watson

    rows = [(t, (t * 13) % 50, (t * 7) % 23) for t in range(1, 26)]
    df = spark.createDataFrame(rows, "t long, y long, x long")
    r = durbin_watson(df, "t", "y", "x").collect()[0]
    n = len(rows)
    sx = sum(x for _, _, x in rows); sy = sum(y for _, y, _ in rows)
    sxx = sum(x * x for _, _, x in rows)
    sxy = sum(x * y for _, y, x in rows)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    es = [y - a - b * x for _, y, x in rows]
    sse = sum(e * e for e in es)
    sd2 = sum((es[i] - es[i - 1]) ** 2 for i in range(1, n))
    assert r["slope"] == pytest.approx(round(b, 6), abs=1e-6)
    assert r["intercept"] == pytest.approx(round(a, 6), abs=1e-6)
    assert r["dw"] == pytest.approx(round(sd2 / sse, 6), abs=1e-5)


def test_durbin_watson_oracle_sf0001(spark, con):
    from eggv_spark.operators.aggregates import durbin_watson
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import DW_SQL

    u = read_table(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("t"),
        F.round("o_totalprice").cast("bigint").alias("y"),
        (F.col("o_custkey") % 100).cast("bigint").alias("x"),
    )
    _spark_vs_oracle(con, durbin_watson(u, "t", "y", "x"), DW_SQL)


# ---------------------------------------------------------------------------
# stochastic_oscillator (wave 2)
# ---------------------------------------------------------------------------


def test_stochastic_hand_example(spark):
    from eggv_spark.operators.aggregates import stochastic_oscillator

    # close at the window low -> %K = 0; at the high -> %K = 100
    rows = [(1, 10, 0, 5), (2, 10, 0, 0), (3, 10, 0, 10), (4, 20, 0, 5)]
    df = spark.createDataFrame(rows, "t long, h long, l long, c long")
    got = {r["t"]: r for r in
           stochastic_oscillator(df, [], "t", "h", "l", "c",
                                 n_periods=3, d_periods=2).collect()}
    assert got[1]["pct_k"] == 50.0
    assert got[2]["pct_k"] == 0.0
    assert got[3]["pct_k"] == 100.0
    assert got[4]["pct_k"] == 25.0  # range widened to 0..20
    assert got[4]["pct_d"] == pytest.approx(round((100.0 + 25.0) / 2, 6))


def test_stochastic_flat_window_is_null(spark):
    from eggv_spark.operators.aggregates import stochastic_oscillator

    df = spark.createDataFrame(
        [(t, 5, 5, 5) for t in range(1, 6)], "t long, h long, l long, c long"
    )
    out = stochastic_oscillator(df, [], "t", "h", "l", "c").collect()
    assert all(r["pct_k"] is None and r["pct_d"] is None for r in out)


def test_stochastic_keyed_groups_independent(spark):
    from eggv_spark.operators.aggregates import stochastic_oscillator

    rows = [("a", t, 10 + t, t, 5 + t) for t in range(1, 8)] + [
        ("b", t, 1000, 0, 500) for t in range(1, 8)
    ]
    df = spark.createDataFrame(rows, "k string, t long, h long, l long, c long")
    out = stochastic_oscillator(df, ["k"], "t", "h", "l", "c").collect()
    b_rows = [r for r in out if r["k"] == "b"]
    assert all(r["pct_k"] == 50.0 for r in b_rows)  # constant 0..1000 range


def test_stochastic_oracle_sf0001(spark, con):
    from eggv_spark.operators.aggregates import stochastic_oscillator
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import STOCH_SQL

    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    ).select(
        F.col("ts").cast("date").alias("day"), "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("c"),
    )
    daily = ev.groupBy("day").agg(
        F.max("c").alias("high_cents"), F.min("c").alias("low_cents")
    )
    lastts = ev.groupBy("day").agg(F.max("ts").alias("mts"))
    closes = (
        ev.join(lastts, "day")
        .filter(F.col("ts") == F.col("mts"))
        .groupBy("day").agg(F.max("c").alias("close_cents"))
    )
    ser = daily.join(closes, "day")
    out = stochastic_oscillator(
        ser, [], "day", "high_cents", "low_cents", "close_cents",
        n_periods=14, d_periods=3,
    ).select(
        F.datediff("day", F.lit("1970-01-01")).cast("bigint")
        .alias("day_num"),
        "high_cents", "low_cents", "close_cents", "pct_k", "pct_d",
    )
    _spark_vs_oracle(con, out, STOCH_SQL)


# ---------------------------------------------------------------------------
# hosmer_lemeshow (wave 2)
# ---------------------------------------------------------------------------


def test_hosmer_lemeshow_hand_example(spark):
    from eggv_spark.operators.aggregates import hosmer_lemeshow

    # 2 bins (scale 10, n_bins... use 4 bins of width 250 on scale 1000)
    # bin 0: scores 100 (p=0.1), 10 rows, 1 event  -> E = 1,  contrib 0
    # bin 3: scores 900 (p=0.9), 10 rows, 5 events -> E = 9
    rows = [(100, 1 if i == 0 else 0) for i in range(10)] + [
        (900, 1 if i < 5 else 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "s long, y long")
    r = hosmer_lemeshow(df, "s", "y", n_bins=4).collect()[0]
    assert r["n"] == 20 and r["n_bins_used"] == 2
    exp = (1 - 1.0) ** 2 / (1.0 * 0.9) + (5 - 9.0) ** 2 / (9.0 * 0.1)
    assert r["hl"] == pytest.approx(round(exp, 6), abs=1e-6)
    assert r["reject_5pct"] is True  # wildly miscalibrated top bin


def test_hosmer_lemeshow_perfectly_calibrated(spark):
    from eggv_spark.operators.aggregates import hosmer_lemeshow

    # every bin's observed rate equals its mean score -> HL = 0
    rows = []
    for s, k in ((200, 1), (600, 3), (800, 4)):
        rows += [(s, 1 if i < k else 0) for i in range(5)]
    df = spark.createDataFrame(rows, "s long, y long")
    r = hosmer_lemeshow(df, "s", "y", n_bins=5).collect()[0]
    assert r["hl"] == 0.0 and r["reject_5pct"] is False
    assert r["n_bins_used"] == 3


def test_hosmer_lemeshow_degenerate_bins_excluded_loudly(spark):
    from eggv_spark.operators.aggregates import hosmer_lemeshow

    # p̄ = 0 (score 0) and p̄ = 1 (score 1000) bins cannot enter the
    # statistic; n_bins_used reports the shrinkage instead of hiding it
    rows = [(0, 0)] * 5 + [(1000, 1)] * 5 + [(500, 1), (500, 0)]
    df = spark.createDataFrame(rows, "s long, y long")
    r = hosmer_lemeshow(df, "s", "y", n_bins=10).collect()[0]
    assert r["n"] == 12 and r["n_bins_used"] == 1


def test_hosmer_lemeshow_oracle_sf0001(spark, con):
    from eggv_spark.operators.aggregates import hosmer_lemeshow
    from eggv_spark.operators.dedupe import base_hash
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import HL_SQL

    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("event_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        (base_hash(F.col("event_id").cast("string")) % 1001).alias("s"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    _spark_vs_oracle(con, hosmer_lemeshow(ev, "s", "y", n_bins=10), HL_SQL)


# ---------------------------------------------------------------------------
# effective_sample_size (wave 2)
# ---------------------------------------------------------------------------


def test_ess_hand_examples(spark):
    from eggv_spark.operators.aggregates import effective_sample_size

    # equal weights -> ESS = n, deff = 1
    eq = spark.createDataFrame([(7,)] * 5, "w long")
    r = effective_sample_size(eq, "w").collect()[0]
    assert (r["n"], r["ess"], r["deff"], r["ess_ratio"]) == (5, 5.0, 1.0, 1.0)
    # one dominant weight: ESS -> ~1
    sk = spark.createDataFrame([(1,)] * 9 + [(1000,)], "w long")
    r2 = effective_sample_size(sk, "w").collect()[0]
    ess = (9 + 1000) ** 2 / (9 + 1000000)
    assert r2["ess"] == pytest.approx(round(ess, 6), abs=1e-6)
    assert r2["deff"] > 9.0


def test_ess_refuses_nonpositive_weights(spark):
    from pyspark.errors.exceptions.base import SparkRuntimeException

    from eggv_spark.operators.aggregates import effective_sample_size

    df = spark.createDataFrame([(3,), (0,), (2,)], "w long")
    with pytest.raises(SparkRuntimeException,
                       match="effective_sample_size"):
        effective_sample_size(df, "w").collect()


def test_ess_keyed_groups(spark):
    from eggv_spark.operators.aggregates import effective_sample_size

    rows = [("a", 1), ("a", 1), ("b", 1), ("b", 99)]
    df = spark.createDataFrame(rows, "k string, w long")
    got = {r["k"]: r for r in
           effective_sample_size(df, "w", keys=["k"]).collect()}
    assert got["a"]["ess"] == 2.0
    assert got["b"]["ess"] == pytest.approx(
        round(100 * 100 / (1 + 99 * 99), 6), abs=1e-6)


def test_ess_oracle_sf0001(spark, con):
    from eggv_spark.operators.aggregates import effective_sample_size
    from eggv_spark.operators.dedupe import base_hash
    from eggv_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    from tests.test_round12_staged_oracles import ESS_SQL

    ev = read_table(spark, SF_DIR, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    ).select(
        "event_type",
        (base_hash(F.col("user_id").cast("string")) % 1000 + 1).alias("w"),
    )
    _spark_vs_oracle(
        con, effective_sample_size(ev, "w", keys=["event_type"]), ESS_SQL
    )
