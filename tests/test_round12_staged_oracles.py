"""DuckDB-side oracle drafts for the round-10 STAGED (unregistered)
wave — Jarque–Bera normality, truncated-EMA MACD, and the binned
target rate — validated against pure-Python references on sf0.001 so
a later registration only needs the Spark-vs-oracle cross-check.

No SparkSession in this module (the cross-engine pairing lives in
tests/test_round12_staged.py).
"""

from __future__ import annotations

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


# ---------------------------------------------------------------------------
# jarque_bera oracle: exact HUGEINT power sums, fixed-order assembly
# (fixture: orders, x = round(o_totalprice))
# ---------------------------------------------------------------------------

JB_SQL = """
WITH u AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS x
  FROM orders WHERE o_totalprice IS NOT NULL
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS s1, sum(x * x) AS s2, sum(x * x * x) AS s3,
         sum(CAST(x AS HUGEINT) * x * x * x) AS s4
  FROM u
), a AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM m
), b AS (
  SELECT n,
         r2 - mu * mu AS m2,
         r3 - 3.0 * mu * r2 + 2.0 * mu * mu * mu AS m3,
         r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2
            - 3.0 * mu * mu * mu * mu AS m4
  FROM a
), c AS (
  SELECT n, m3 / sqrt(m2 * m2 * m2) AS g1,
         m4 / (m2 * m2) - 3.0 AS g2
  FROM b
)
SELECT n, round(g1, 6) AS skewness, round(g2, 6) AS kurtosis_excess,
       round(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6) AS jb,
       round(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6)
         > 5.991465 AS reject_5pct
FROM c
"""


def test_jarque_bera_oracle_matches_python_reference(con):
    got = con.execute(JB_SQL).fetchone()
    xs = [
        x for (x,) in con.execute(
            "SELECT CAST(round(o_totalprice) AS BIGINT) FROM orders"
            " WHERE o_totalprice IS NOT NULL"
        ).fetchall()
    ]
    n = len(xs)
    s1 = sum(xs)
    s2 = sum(x * x for x in xs)
    s3 = sum(x ** 3 for x in xs)
    s4 = sum(x ** 4 for x in xs)
    mu, r2, r3, r4 = s1 / n, s2 / n, s3 / n, s4 / n
    m2 = r2 - mu * mu
    m3 = r3 - 3.0 * mu * r2 + 2.0 * mu ** 3
    m4 = r4 - 4.0 * mu * r3 + 6.0 * mu * mu * r2 - 3.0 * mu ** 4
    g1 = m3 / (m2 ** 1.5)
    g2 = m4 / (m2 * m2) - 3.0
    jb = n / 6.0 * (g1 * g1 + g2 * g2 / 4.0)
    assert got[0] == n
    assert got[1] == pytest.approx(round(g1, 6), abs=1e-6)
    assert got[2] == pytest.approx(round(g2, 6), abs=1e-6)
    assert got[3] == pytest.approx(round(jb, 6), abs=1e-6)
    assert got[4] == (round(jb, 6) > 5.991465)


# ---------------------------------------------------------------------------
# macd oracle: generated truncated-EMA lag sums over the daily spine
# (fixture: events daily cents, keys=[], 12/26/9, max_lags=60)
# ---------------------------------------------------------------------------


def _ema_sql(col: str, n_periods: int, max_lags: int = 60) -> str:
    """Same finite-memory EWMA as aggregates.macd, with each weight
    emitted via repr() so both engines parse the identical double."""
    a = 2.0 / (n_periods + 1.0)
    num, den = ["0.0"], ["0.0"]
    for j in range(max_lags + 1):
        wt = repr(a * (1.0 - a) ** j)
        lag = col if j == 0 else f"lag({col}, {j}) OVER w"
        num.append(f"coalesce({lag} * {wt}, 0.0)")
        den.append(f"CASE WHEN {lag} IS NOT NULL THEN {wt} ELSE 0.0 END")
    return "(" + " + ".join(num) + ") / (" + " + ".join(den) + ")"


def macd_sql(fast: int = 12, slow: int = 26, signal: int = 9,
             max_lags: int = 60) -> str:
    return f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS x_cents
  FROM events GROUP BY CAST(ts AS DATE)
), t1 AS (
  SELECT day, x_cents, CAST(x_cents AS DOUBLE) AS v FROM daily
), t2 AS (
  SELECT day, x_cents,
         round({_ema_sql('v', fast, max_lags)}
               - {_ema_sql('v', slow, max_lags)}, 6) AS macd
  FROM t1
  WINDOW w AS (ORDER BY day)
), t3 AS (
  SELECT day, x_cents, macd,
         round({_ema_sql('macd', signal, max_lags)}, 6) AS signal_line
  FROM t2
  WINDOW w AS (ORDER BY day)
)
SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num, x_cents,
       macd, signal_line,
       round(macd - signal_line, 6) AS histogram
FROM t3
"""


def _py_ema(xs, n_periods, max_lags=60):
    a = 2.0 / (n_periods + 1.0)
    out = []
    for t in range(len(xs)):
        num = 0.0
        den = 0.0
        for j in range(max_lags + 1):
            wt = a * (1.0 - a) ** j
            if t - j >= 0 and xs[t - j] is not None:
                num += xs[t - j] * wt
                den += wt
        out.append(num / den if den else None)
    return out


def _round6(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           ROUND_HALF_UP))


def test_macd_oracle_matches_python_reference(con):
    rows = con.execute(macd_sql() + " ORDER BY day_num").fetchall()
    xs = [float(r[1]) for r in rows]
    fast = _py_ema(xs, 12)
    slow = _py_ema(xs, 26)
    mac = [_round6(f - s) for f, s in zip(fast, slow)]
    sig = [_round6(s) for s in _py_ema(mac, 9)]
    for i, r in enumerate(rows):
        assert r[2] == pytest.approx(mac[i], abs=1e-6), i
        assert r[3] == pytest.approx(sig[i], abs=1e-6), i
        assert r[4] == pytest.approx(_round6(r[2] - r[3]), abs=1e-6), i
    assert len(rows) >= 20  # the daily spine is long enough to matter


# ---------------------------------------------------------------------------
# binned_target_rate oracle: QBIN edges + per-bin Wilson interval
# (fixture: orders, v = round(o_totalprice), y = o_orderkey % 3 = 0,
#  n_bins = 8)
# ---------------------------------------------------------------------------

BTR_SQL = """
WITH base AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS v,
         CAST(o_orderkey % 3 = 0 AS INT) AS y
  FROM orders WHERE o_totalprice IS NOT NULL AND o_orderkey IS NOT NULL
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         count(*) OVER () AS n
  FROM base
), spine AS (
  SELECT CAST(j AS BIGINT) AS j FROM generate_series(1, 8) t(j)
), edges AS (
  SELECT spine.j, max(ranked.v) AS edge
  FROM ranked JOIN spine
    ON (ranked.rn - 1) * 8 < spine.j * ranked.n
   AND spine.j * ranked.n <= ranked.rn * 8
  GROUP BY spine.j
), assigned AS (
  SELECT (SELECT min(j) FROM edges WHERE edge >= base.v) AS bin, y
  FROM base
), per AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(y) AS BIGINT) AS n_events
  FROM assigned GROUP BY bin
), wil AS (
  SELECT bin, n_rows, n_events,
         CAST(n_events AS DOUBLE) / CAST(n_rows AS DOUBLE) AS p,
         CAST(n_rows AS DOUBLE) AS nf,
         1.0 + (1.96 * 1.96) / CAST(n_rows AS DOUBLE) AS denom
  FROM per
)
SELECT e.j AS bin, e.edge AS upper_edge,
       coalesce(w.n_rows, 0) AS n_rows,
       coalesce(w.n_events, 0) AS n_events,
       round(w.p, 6) AS rate,
       round((w.p + (1.96 * 1.96) / (2.0 * w.nf)) / w.denom
             - 1.96 * sqrt(w.p * (1.0 - w.p) / w.nf
                           + (1.96 * 1.96) / (4.0 * w.nf * w.nf))
               / w.denom, 6) AS ci_lo,
       round((w.p + (1.96 * 1.96) / (2.0 * w.nf)) / w.denom
             + 1.96 * sqrt(w.p * (1.0 - w.p) / w.nf
                           + (1.96 * 1.96) / (4.0 * w.nf * w.nf))
               / w.denom, 6) AS ci_hi
FROM edges e LEFT JOIN wil w ON w.bin = e.j
"""


def test_btr_oracle_matches_python_reference(con):
    import math

    got = sorted(con.execute(BTR_SQL).fetchall())
    rows = con.execute(
        "SELECT CAST(round(o_totalprice) AS BIGINT),"
        " CAST(o_orderkey % 3 = 0 AS INT) FROM orders"
        " WHERE o_totalprice IS NOT NULL"
    ).fetchall()
    vals = sorted(v for v, _ in rows)
    n = len(vals)
    edges = [vals[-((-j * n) // 8) - 1] for j in range(1, 9)]
    per = {}
    for v, y in rows:
        b = next(j + 1 for j, e in enumerate(edges) if v <= e)
        cnt, ev = per.get(b, (0, 0))
        per[b] = (cnt + 1, ev + y)
    assert len(got) == 8
    for j, edge, n_rows, n_events, rate, lo, hi in got:
        cnt, ev = per.get(j, (0, 0))
        assert (edge, n_rows, n_events) == (edges[j - 1], cnt, ev)
        if cnt == 0:
            assert rate is None and lo is None and hi is None
            continue
        p = ev / cnt
        z2 = 1.96 * 1.96
        denom = 1.0 + z2 / cnt
        center = (p + z2 / (2.0 * cnt)) / denom
        half = 1.96 * math.sqrt(p * (1 - p) / cnt
                                + z2 / (4.0 * cnt * cnt)) / denom
        assert rate == pytest.approx(round(p, 6), abs=1e-6)
        assert lo == pytest.approx(round(center - half, 6), abs=1e-6)
        assert hi == pytest.approx(round(center + half, 6), abs=1e-6)


# ---------------------------------------------------------------------------
# durbin_watson oracle: exact moments -> broadcast (a, b) -> ordered
# prefix-sum pooling (fixture: orders ordered by o_orderkey,
# y = round(o_totalprice), x = o_custkey % 100)
# ---------------------------------------------------------------------------

DW_SQL = """
WITH base AS (
  SELECT o_orderkey AS t,
         CAST(round(o_totalprice) AS BIGINT) AS y,
         CAST(o_custkey % 100 AS BIGINT) AS x
  FROM orders WHERE o_totalprice IS NOT NULL AND o_custkey IS NOT NULL
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM base
), ab AS (
  SELECT n, sx, sy,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
  FROM m
), ab2 AS (
  SELECT n, b,
         (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
           / CAST(n AS DOUBLE) AS a
  FROM ab
), e AS (
  SELECT base.t, ab2.n, ab2.a, ab2.b,
         CAST(base.y AS DOUBLE) - ab2.a
           - ab2.b * CAST(base.x AS DOUBLE) AS e
  FROM base CROSS JOIN ab2
), e2 AS (
  SELECT t, n, a, b, e,
         lag(e, 1) OVER (ORDER BY t) AS ep,
         row_number() OVER (ORDER BY t) AS rn
  FROM e
), s AS (
  SELECT t, n, a, b, rn,
         sum(e * e) OVER w AS sse,
         sum(coalesce((e - ep) * (e - ep), 0.0)) OVER w AS sd2
  FROM e2
  WINDOW w AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT n, round(b, 6) AS slope, round(a, 6) AS intercept,
       round(sd2 / sse, 6) AS dw,
       round(1.0 - (sd2 / sse) / 2.0, 6) AS rho_approx
FROM s WHERE rn = n
"""


def test_durbin_watson_oracle_matches_python_reference(con):
    got = con.execute(DW_SQL).fetchone()
    rows = sorted(con.execute(
        "SELECT o_orderkey, CAST(round(o_totalprice) AS BIGINT),"
        " CAST(o_custkey % 100 AS BIGINT) FROM orders"
        " WHERE o_totalprice IS NOT NULL"
    ).fetchall())
    n = len(rows)
    sx = sum(r[2] for r in rows); sy = sum(r[1] for r in rows)
    sxx = sum(r[2] * r[2] for r in rows)
    sxy = sum(r[2] * r[1] for r in rows)
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    es = [r[1] - a - b * r[2] for r in rows]
    sse = 0.0
    sd2 = 0.0
    prev = None
    for e in es:
        sse += e * e
        if prev is not None:
            sd2 += (e - prev) * (e - prev)
        prev = e
    dw = sd2 / sse
    assert got[0] == n
    assert got[1] == pytest.approx(round(b, 6), abs=1e-6)
    assert got[2] == pytest.approx(round(a, 6), abs=1e-6)
    assert got[3] == pytest.approx(round(dw, 6), abs=1e-5)
    assert got[4] == pytest.approx(round(1.0 - dw / 2.0, 6), abs=1e-5)


# ---------------------------------------------------------------------------
# stochastic oscillator oracle: daily OHLC-ish series from events
# (fixture: high = max cents, low = min cents, close = cents at the
#  day's last ts with max-cents tiebreak; n = 14, d = 3)
# ---------------------------------------------------------------------------

STOCH_SQL = """
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day, ts,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
), daily AS (
  SELECT day, max(c) AS h, min(c) AS l FROM ev GROUP BY day
), lastts AS (
  SELECT day, max(ts) AS mts FROM ev GROUP BY day
), closes AS (
  SELECT ev.day, max(ev.c) AS cl
  FROM ev JOIN lastts ON ev.day = lastts.day AND ev.ts = lastts.mts
  GROUP BY ev.day
), ser AS (
  SELECT d.day, d.h, d.l, c.cl FROM daily d JOIN closes c USING (day)
), k AS (
  SELECT day, h, l, cl,
         round(100.0 * (CAST(cl - min(l) OVER wn AS DOUBLE)
                        / CAST(max(h) OVER wn - min(l) OVER wn
                               AS DOUBLE)), 6) AS pct_k
  FROM ser
  WINDOW wn AS (ORDER BY day ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
)
SELECT CAST(day - DATE '1970-01-01' AS BIGINT) AS day_num,
       h AS high_cents, l AS low_cents, cl AS close_cents, pct_k,
       round(avg(pct_k) OVER wd, 6) AS pct_d
FROM k WINDOW wd AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
"""


def test_stochastic_oracle_matches_python_reference(con):
    got = sorted(con.execute(STOCH_SQL).fetchall())
    # python reference straight off the daily series
    rows = sorted(con.execute(
        "WITH ev AS (SELECT CAST(ts AS DATE) AS day, ts,"
        " CAST(round(value * 100) AS BIGINT) AS c FROM events"
        " WHERE value IS NOT NULL AND ts IS NOT NULL),"
        " daily AS (SELECT day, max(c) h, min(c) l FROM ev GROUP BY day),"
        " lastts AS (SELECT day, max(ts) mts FROM ev GROUP BY day),"
        " closes AS (SELECT ev.day, max(ev.c) cl FROM ev JOIN lastts"
        "  ON ev.day = lastts.day AND ev.ts = lastts.mts GROUP BY ev.day)"
        " SELECT d.day, d.h, d.l, c.cl FROM daily d"
        " JOIN closes c USING (day)"
    ).fetchall())
    ks = []
    for i in range(len(rows)):
        win = rows[max(0, i - 13):i + 1]
        lo = min(r[2] for r in win)
        hi = max(r[1] for r in win)
        cl = rows[i][3]
        ks.append(None if hi == lo
                  else _round6(100.0 * ((cl - lo) / (hi - lo))))
    for i, r in enumerate(got):
        assert (r[1], r[2], r[3]) == (rows[i][1], rows[i][2], rows[i][3])
        if ks[i] is None:
            assert r[4] is None
        else:
            assert r[4] == pytest.approx(ks[i], abs=1e-6)
        dwin = [k for k in ks[max(0, i - 2):i + 1] if k is not None]
        if dwin:
            assert r[5] == pytest.approx(
                _round6(sum(dwin) / len(dwin)), abs=1e-6)
    assert len(got) >= 20


# ---------------------------------------------------------------------------
# hosmer_lemeshow oracle (fixture: events, score = base_hash(event_id)
# % 1001 milli-probability, label = event_type = 'purchase', 10 bins)
# ---------------------------------------------------------------------------

HL_SQL = """
WITH base AS (
  SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1001 AS s,
         CAST(event_type = 'purchase' AS INT) AS y
  FROM events WHERE event_id IS NOT NULL AND event_type IS NOT NULL
), binned AS (
  SELECT least(CAST(floor(s * 10 / 1000) AS BIGINT), 9) AS b, y, s
  FROM base
), per AS (
  SELECT b, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS o, CAST(sum(s) AS BIGINT) AS ss
  FROM binned GROUP BY b
), c AS (
  SELECT b, n,
         CASE WHEN (CAST(ss AS DOUBLE) / 1000.0)
                   * (1.0 - CAST(ss AS DOUBLE)
                      / (CAST(n AS DOUBLE) * 1000.0)) = 0.0 THEN NULL
              ELSE (CAST(o AS DOUBLE) - CAST(ss AS DOUBLE) / 1000.0)
                   * (CAST(o AS DOUBLE) - CAST(ss AS DOUBLE) / 1000.0)
                   / ((CAST(ss AS DOUBLE) / 1000.0)
                      * (1.0 - CAST(ss AS DOUBLE)
                         / (CAST(n AS DOUBLE) * 1000.0)))
         END AS contrib
  FROM per
), pooled AS (
  SELECT b, row_number() OVER (ORDER BY b) AS rn,
         count(*) OVER () AS nb,
         sum(n) OVER w AS ntot,
         sum(CASE WHEN contrib IS NOT NULL THEN 1 ELSE 0 END)
           OVER w AS used,
         sum(coalesce(contrib, 0.0)) OVER w AS hl
  FROM c
  WINDOW w AS (ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT ntot AS n, CAST(used AS BIGINT) AS n_bins_used,
       round(hl, 6) AS hl,
       round(hl, 6) > 15.507313 AS reject_5pct
FROM pooled WHERE rn = nb
"""


def test_hosmer_lemeshow_oracle_matches_python_reference(con):
    got = con.execute(HL_SQL).fetchone()
    rows = con.execute(
        "SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8)"
        " AS BIGINT) % 1001, CAST(event_type = 'purchase' AS INT)"
        " FROM events WHERE event_id IS NOT NULL"
        " AND event_type IS NOT NULL"
    ).fetchall()
    per = {}
    for s, y in rows:
        b = min(s * 10 // 1000, 9)
        n, o, ss = per.get(b, (0, 0, 0))
        per[b] = (n + 1, o + y, ss + s)
    hl = 0.0
    used = 0
    for b in sorted(per):
        n, o, ss = per[b]
        e = ss / 1000.0
        pbar = ss / (n * 1000.0)
        den = e * (1.0 - pbar)
        if den == 0.0:
            continue
        used += 1
        hl += (o - e) * (o - e) / den
    assert got[0] == len(rows)
    assert got[1] == used
    assert got[2] == pytest.approx(round(hl, 6), abs=1e-6)
    assert got[3] == (round(hl, 6) > 15.507313)


# ---------------------------------------------------------------------------
# effective_sample_size oracle (fixture: events per event_type,
# w = base_hash(user_id) % 1000 + 1 milli-weights)
# ---------------------------------------------------------------------------

ESS_SQL = """
WITH base AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)
              AS BIGINT) % 1000 + 1 AS w
  FROM events WHERE user_id IS NOT NULL AND event_type IS NOT NULL
), m AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         sum(w) AS sw, sum(w * w) AS sw2
  FROM base GROUP BY event_type
)
SELECT event_type, n, CAST(sw AS BIGINT) AS sum_w_milli,
       round(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
             / CAST(sw2 AS DOUBLE), 6) AS ess,
       round(CAST(n AS DOUBLE)
             / (CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                / CAST(sw2 AS DOUBLE)), 6) AS deff,
       round((CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
              / CAST(sw2 AS DOUBLE)) / CAST(n AS DOUBLE), 6)
         AS ess_ratio
FROM m
"""


def test_ess_oracle_matches_python_reference(con):
    got = {r[0]: r[1:] for r in con.execute(ESS_SQL).fetchall()}
    rows = con.execute(
        "SELECT event_type,"
        " CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8)"
        " AS BIGINT) % 1000 + 1 FROM events"
        " WHERE user_id IS NOT NULL AND event_type IS NOT NULL"
    ).fetchall()
    per = {}
    for t, w in rows:
        n, sw, sw2 = per.get(t, (0, 0, 0))
        per[t] = (n + 1, sw + w, sw2 + w * w)
    assert set(got) == set(per) and len(per) >= 2
    for t, (n, sw, sw2) in per.items():
        ess = sw * sw / sw2
        g = got[t]
        assert g[0] == n and g[1] == sw
        assert g[2] == pytest.approx(round(ess, 6), abs=1e-6)
        assert g[3] == pytest.approx(round(n / ess, 6), abs=1e-6)
        assert g[4] == pytest.approx(round(ess / n, 6), abs=1e-6)
