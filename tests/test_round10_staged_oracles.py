"""DuckDB-side oracle drafts for the round-9 STAGED (unregistered)
operators — validated here against pure-Python references on
sf0.001 so that registration in a later round only needs the
Spark-vs-oracle cross-check, not oracle design.

No SparkSession in this module: it exercises the DuckDB half of the
future driver pair plus the Python reference implementations.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"

# The portable hash both engines share (dedupe.base_hash).
BASEHASH = "CAST('0x' || substr(md5({x}), 1, 8) AS BIGINT)"


@pytest.fixture()
def con():
    c = duckdb.connect()
    for t in ("orders", "events", "documents"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


# ---------------------------------------------------------------------------
# ridge_fit oracle: exact HUGEINT moments + the identical fixed-order
# double assembly (the smd_balance cross-engine discipline)
# ---------------------------------------------------------------------------

RIDGE_SQL = """
WITH u AS (
  SELECT CAST(o_custkey % 100 AS BIGINT) AS x1,
         CAST(o_orderkey % 97 AS BIGINT) AS x2,
         CAST(round(o_totalprice) AS BIGINT) AS y
  FROM orders
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x1) AS s1, sum(x2) AS s2, sum(y) AS sy,
         sum(x1 * x1) AS s11, sum(x2 * x2) AS s22,
         sum(x1 * x2) AS s12, sum(x1 * y) AS s1y,
         sum(x2 * y) AS s2y, sum(y * y) AS syy
  FROM u
), c AS (
  SELECT n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mx1,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS mx2,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
         CAST(s11 AS DOUBLE) AS d11, CAST(s22 AS DOUBLE) AS d22,
         CAST(s12 AS DOUBLE) AS d12, CAST(s1y AS DOUBLE) AS d1y,
         CAST(s2y AS DOUBLE) AS d2y, CAST(syy AS DOUBLE) AS dyy
  FROM m
), k AS (
  SELECT n, mx1, mx2, my,
         d11 - CAST(n AS DOUBLE) * mx1 * mx1 AS c11,
         d22 - CAST(n AS DOUBLE) * mx2 * mx2 AS c22,
         d12 - CAST(n AS DOUBLE) * mx1 * mx2 AS c12,
         d1y - CAST(n AS DOUBLE) * mx1 * my AS c1y,
         d2y - CAST(n AS DOUBLE) * mx2 * my AS c2y,
         dyy - CAST(n AS DOUBLE) * my * my AS cyy
  FROM c
), b AS (
  SELECT n, mx1, mx2, my, c11, c22, c12, c1y, c2y, cyy,
         (c1y * (c22 + {lam}) - c12 * c2y)
           / ((c11 + {lam}) * (c22 + {lam}) - c12 * c12) AS b1,
         ((c11 + {lam}) * c2y - c12 * c1y)
           / ((c11 + {lam}) * (c22 + {lam}) - c12 * c12) AS b2
  FROM k
)
SELECT n,
       round(b1, 6) AS b1,
       round(b2, 6) AS b2,
       round(my - b1 * mx1 - b2 * mx2, 6) AS intercept,
       round((cyy - 2.0 * b1 * c1y - 2.0 * b2 * c2y
              + b1 * b1 * c11 + 2.0 * b1 * b2 * c12
              + b2 * b2 * c22) / CAST(n AS DOUBLE), 6) AS mse,
       CAST({lam} AS DOUBLE) AS lambda
FROM b
"""


def test_ridge_oracle_matches_python_reference(con):
    lam = 1000.0
    rows = con.execute(
        "SELECT CAST(o_custkey % 100 AS BIGINT),"
        " CAST(o_orderkey % 97 AS BIGINT),"
        " CAST(round(o_totalprice) AS BIGINT) FROM orders"
    ).fetchall()
    got = con.execute(RIDGE_SQL.format(lam=repr(lam))).fetchone()
    n = len(rows)
    nf = float(n)
    s1 = sum(r[0] for r in rows); s2 = sum(r[1] for r in rows)
    sy = sum(r[2] for r in rows)
    s11 = sum(r[0] * r[0] for r in rows)
    s22 = sum(r[1] * r[1] for r in rows)
    s12 = sum(r[0] * r[1] for r in rows)
    s1y = sum(r[0] * r[2] for r in rows)
    s2y = sum(r[1] * r[2] for r in rows)
    syy = sum(r[2] * r[2] for r in rows)
    mx1, mx2, my = s1 / nf, s2 / nf, sy / nf
    c11 = s11 - nf * mx1 * mx1; c22 = s22 - nf * mx2 * mx2
    c12 = s12 - nf * mx1 * mx2
    c1y = s1y - nf * mx1 * my; c2y = s2y - nf * mx2 * my
    cyy = syy - nf * my * my
    det = (c11 + lam) * (c22 + lam) - c12 * c12
    b1 = (c1y * (c22 + lam) - c12 * c2y) / det
    b2 = ((c11 + lam) * c2y - c12 * c1y) / det
    assert got[0] == n
    assert got[1] == pytest.approx(round(b1, 6), abs=1e-6)
    assert got[2] == pytest.approx(round(b2, 6), abs=1e-6)
    sse = (cyy - 2 * b1 * c1y - 2 * b2 * c2y
           + b1 * b1 * c11 + 2 * b1 * b2 * c12 + b2 * b2 * c22)
    assert got[4] == pytest.approx(round(sse / nf, 6), abs=1e-6)


# ---------------------------------------------------------------------------
# quantile_binning oracle: the qte-style integer-safe spine join
# ---------------------------------------------------------------------------

QBIN_SQL = """
WITH base AS (
  SELECT CAST(round(o_totalprice) AS BIGINT) AS v FROM orders
  WHERE o_totalprice IS NOT NULL
), ranked AS (
  SELECT v, row_number() OVER (ORDER BY v) AS rn,
         count(*) OVER () AS n
  FROM base
), spine AS (
  SELECT CAST(j AS BIGINT) AS j FROM generate_series(1, {nb}) t(j)
), edges AS (
  SELECT spine.j, max(ranked.v) AS edge
  FROM ranked JOIN spine
    ON (ranked.rn - 1) * {nb} < spine.j * ranked.n
   AND spine.j * ranked.n <= ranked.rn * {nb}
  GROUP BY spine.j
), assigned AS (
  SELECT (SELECT min(j) FROM edges WHERE edge >= base.v) AS bin
  FROM base
), counts AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_rows FROM assigned GROUP BY bin
)
SELECT e.j AS bin, e.edge AS upper_edge,
       coalesce(c.n_rows, 0) AS n_rows
FROM edges e LEFT JOIN counts c ON c.bin = e.j
"""


def test_qbin_oracle_shape_and_totals(con):
    nb = 8
    rows = sorted(con.execute(QBIN_SQL.format(nb=nb)).fetchall())
    assert len(rows) == nb
    n = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert sum(r[2] for r in rows) == n
    edges = [r[1] for r in rows]
    assert edges == sorted(edges)
    # exact type-1 edge check against Python on the sorted values
    vals = sorted(
        v for (v,) in con.execute(
            "SELECT CAST(round(o_totalprice) AS BIGINT) FROM orders"
        ).fetchall()
    )
    for j in range(1, nb + 1):
        rank = -((-j * len(vals)) // nb)  # ceil(j*n/nb) integer-safe
        assert edges[j - 1] == vals[rank - 1]


# ---------------------------------------------------------------------------
# retention_matrix oracle
# ---------------------------------------------------------------------------

RETENTION_SQL = """
WITH up AS (
  SELECT DISTINCT user_id AS u,
         CAST(floor(epoch(ts) / (86400 * {pd})) AS BIGINT) AS p
  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
), cohorts AS (
  SELECT u, min(p) AS c FROM up GROUP BY u
), sizes AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n_cohort FROM cohorts GROUP BY c
), active AS (
  SELECT cohorts.c, up.p - cohorts.c AS "offset",
         CAST(count(*) AS BIGINT) AS n_active
  FROM up JOIN cohorts USING (u)
  GROUP BY cohorts.c, up.p - cohorts.c
)
SELECT active.c AS cohort_period, "offset", n_cohort, n_active,
       round(CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE), 6)
         AS retention
FROM active JOIN sizes ON sizes.c = active.c
"""


def test_retention_oracle_invariants(con):
    rows = con.execute(RETENTION_SQL.format(pd=7)).fetchall()
    assert rows, "events testdata must produce at least one cell"
    by_cell = {(r[0], r[1]): r for r in rows}
    for (c, o), r in by_cell.items():
        assert 0 <= r[3] <= r[2]
        if o == 0:
            assert r[3] == r[2] and r[4] == 1.0
    # offset-0 row exists for every cohort
    cohorts = {c for (c, _) in by_cell}
    assert all((c, 0) in by_cell for c in cohorts)


# ---------------------------------------------------------------------------
# winnowing oracle: k-grams + window-min with the rightmost-tie rule
# ---------------------------------------------------------------------------

WINNOW_SQL = """
WITH d AS (
  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t
  FROM documents WHERE text IS NOT NULL
), gi AS (
  SELECT doc_id, t,
         unnest(generate_series(1, len(t) - {k} + 1)) AS i
  FROM d WHERE len(t) >= {k}
), g AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         {h} AS h
  FROM gi
), n AS (
  SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id
), sel AS (
  SELECT doc_id, pos,
         min(struct_pack(h := h, np := -pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN CURRENT ROW AND {wm1} FOLLOWING
         ) AS pick
  FROM g
)
SELECT DISTINCT sel.doc_id, -(pick.np) AS pos, pick.h AS gram_hash
FROM sel JOIN n USING (doc_id)
WHERE sel.pos <= n.ng - {wm1}
"""


def _ref_winnow(text: str, k: int, w: int):
    norm = "".join(c for c in text.lower() if c.isalnum())
    if len(norm) < k:
        return set()
    hs = [
        (int(hashlib.md5(norm[i:i + k].encode()).hexdigest()[:8], 16),
         i + 1)
        for i in range(len(norm) - k + 1)
    ]
    picks = set()
    for s in range(len(hs) - w + 1):
        best = min(hs[s:s + w], key=lambda t: (t[0], -t[1]))
        picks.add((best[1], best[0]))
    return picks


def test_winnow_oracle_matches_python_reference(con):
    k, w = 5, 4
    sql = WINNOW_SQL.format(
        h=BASEHASH.format(x=f"substr(t, i, {k})"), k=k, wm1=w - 1
    )
    got = {
        (r[0], r[1], r[2])
        for r in con.execute(sql).fetchall()
    }
    texts = con.execute(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    exp = {
        (d, pos, h)
        for d, t in texts
        for (pos, h) in _ref_winnow(t, k, w)
    }
    assert got == exp


# ---------------------------------------------------------------------------
# winnow_neardup_pairs oracle: distinct hashes -> frequency cap ->
# ordered pair join (extends WINNOW_SQL)
# ---------------------------------------------------------------------------

WINNOW_PAIRS_SQL = """
WITH fp0 AS ({winnow}),
fps AS (SELECT DISTINCT doc_id, gram_hash FROM fp0),
per_doc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS fp
            FROM fps GROUP BY doc_id),
hd AS (SELECT gram_hash FROM fps GROUP BY gram_hash
       HAVING count(*) <= {cap}),
kept AS (SELECT fps.doc_id, fps.gram_hash FROM fps JOIN hd USING (gram_hash)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM kept a JOIN kept b
    ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING count(*) >= {ms}
)
SELECT doc_a, doc_b, shared, pa.fp AS fp_a, pb.fp AS fp_b,
       round(CAST(shared AS DOUBLE) / CAST(least(pa.fp, pb.fp) AS DOUBLE), 6)
         AS overlap
FROM pairs
JOIN per_doc pa ON pa.doc_id = doc_a
JOIN per_doc pb ON pb.doc_id = doc_b
"""


def test_winnow_pairs_oracle_matches_python_reference(con):
    k, w, cap, ms = 5, 4, 64, 2
    winnow = WINNOW_SQL.format(
        h=BASEHASH.format(x=f"substr(t, i, {k})"), k=k, wm1=w - 1
    )
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            WINNOW_PAIRS_SQL.format(winnow=winnow, cap=cap, ms=ms)
        ).fetchall()
    }
    texts = con.execute(
        "SELECT doc_id, text FROM documents WHERE text IS NOT NULL"
    ).fetchall()
    fps = {d: {h for (_, h) in _ref_winnow(t, k, w)} for d, t in texts}
    from collections import Counter

    freq = Counter(h for s in fps.values() for h in s)
    kept = {d: {h for h in s if freq[h] <= cap} for d, s in fps.items()}
    # Spark's round() and DuckDB's round() are HALF_UP; Python's is
    # banker's — replicate engine rounding via Decimal (the
    # mmr_diversify driver-side lesson, SCALING.md)
    from decimal import ROUND_HALF_UP, Decimal

    def _round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    exp = {}
    docs = sorted(kept)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            shared = len(kept[a] & kept[b])
            if shared >= ms:
                exp[(a, b)] = (
                    shared, len(fps[a]), len(fps[b]),
                    _round6(shared / min(len(fps[a]), len(fps[b]))),
                )
    assert got == exp


# ---------------------------------------------------------------------------
# rank_metrics oracle: the pooled scoreboard on a literal spine
# (fixture pairing with a validated top-k chain happens at
# registration; this pins the metric SQL itself)
# ---------------------------------------------------------------------------

RANK_METRICS_SQL = """
WITH ranked(q, i, rk) AS (VALUES {ranked}),
truth(q, i) AS (VALUES {truth}),
hits AS (
  SELECT r.q, CAST(min(r.rk) AS BIGINT) AS first,
         CAST(count(*) AS BIGINT) AS hits
  FROM ranked r JOIN truth t ON r.q = t.q AND r.i = t.i
  WHERE r.rk <= {k}
  GROUP BY r.q
),
per_q AS (
  SELECT t.q,
         coalesce(1.0 / CAST(h.first AS DOUBLE), 0.0) AS rr,
         coalesce(CAST(h.hits AS DOUBLE)
                  / CAST(n_rel AS DOUBLE), 0.0) AS rec,
         coalesce(CAST(h.hits AS DOUBLE) / {kf}, 0.0) AS prec,
         CAST(coalesce(h.hits > 0, FALSE) AS BIGINT) AS hit
  FROM (SELECT q, CAST(count(*) AS BIGINT) AS n_rel
        FROM truth GROUP BY q) t
  LEFT JOIN hits h ON h.q = t.q
),
pooled AS (
  SELECT q,
         count(*) OVER w AS nq,
         sum(rr) OVER w AS srr,
         sum(rec) OVER w AS srec,
         sum(prec) OVER w AS sprec,
         sum(hit) OVER w AS shit
  FROM per_q
  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT CAST(nq AS BIGINT) AS n_queries,
       round(srr / nq, 6) AS mrr,
       round(srec / nq, 6) AS recall_at_k,
       round(sprec / nq, 6) AS precision_at_k,
       round(CAST(shit AS DOUBLE) / nq, 6) AS hit_rate,
       {k} AS k
FROM pooled ORDER BY q DESC LIMIT 1
"""


def test_rank_metrics_oracle_hand_example(con):
    ranked = (
        "('q1','x',1),('q1','a',2),('q1','z',3),('q1','b',5),"
        "('q2','u',1),('q2','v',2),('q2','w',3)"
    )
    truth = "('q1','a'),('q1','b'),('q2','c'),('q3','d')"
    r = con.execute(
        RANK_METRICS_SQL.format(ranked=ranked, truth=truth, k=3, kf="3.0")
    ).fetchone()
    assert r[0] == 3
    assert r[1] == round((0.5 + 0.0 + 0.0) / 3.0, 6)
    assert r[2] == round(0.5 / 3.0, 6)
    assert r[3] == round((1.0 / 3.0) / 3.0, 6)
    assert r[4] == round(1.0 / 3.0, 6)


# ---------------------------------------------------------------------------
# page_hinkley oracle: ordered-prefix windows over the daily spine
# ---------------------------------------------------------------------------

PH_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS x_cents
  FROM events GROUP BY CAST(ts AS DATE)
), staged AS (
  SELECT day, x_cents,
         CAST(x_cents AS DOUBLE)
           - sum(CAST(x_cents AS DOUBLE)) OVER w / count(*) OVER w
           - {delta} AS dev
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), m AS (
  SELECT day, x_cents, sum(dev) OVER w AS m
  FROM staged
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT day, x_cents,
       round(m - min(m) OVER w, 6) AS ph,
       round(m - min(m) OVER w, 6) > {lam} AS alarm
FROM m
WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)
"""


def test_page_hinkley_oracle_matches_python_reference(con):
    delta, lam = 50.0, 400.0
    rows = sorted(
        con.execute(PH_SQL.format(delta=repr(delta), lam=repr(lam))).fetchall()
    )
    xs = [r[1] for r in rows]
    s = 0.0
    m = 0.0
    mmin = float("inf")
    for i, (r, x) in enumerate(zip(rows, xs), start=1):
        s += x
        m += x - s / i - delta
        mmin = min(mmin, m)
        assert r[2] == pytest.approx(round(m - mmin, 6), abs=1e-6)
        assert r[3] == (round(m - mmin, 6) > lam)


# ---------------------------------------------------------------------------
# cronbach_alpha oracle: exact HUGEINT moments, fixed-order assembly
# ---------------------------------------------------------------------------

ALPHA_SQL = """
WITH u AS (
  SELECT CAST(o_custkey % 7 AS BIGINT) AS i1,
         CAST(o_orderkey % 5 AS BIGINT) AS i2,
         CAST(round(o_totalprice) % 9 AS BIGINT) AS i3
  FROM orders
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(i1) AS s1, sum(i1 * i1) AS q1,
         sum(i2) AS s2, sum(i2 * i2) AS q2,
         sum(i3) AS s3, sum(i3 * i3) AS q3,
         sum(i1 + i2 + i3) AS st,
         sum((i1 + i2 + i3) * (i1 + i2 + i3)) AS qt
  FROM u
), v AS (
  SELECT n,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
         + (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)
            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0)
         + (CAST(q3 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)
            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS siv,
         (CAST(qt AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
            / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS tv
  FROM m
)
SELECT n AS n_subjects, 3 AS k_items,
       round(siv, 6) AS sum_item_var,
       round(tv, 6) AS total_var,
       round(1.5 * (1.0 - siv / tv), 6) AS alpha
FROM v
"""


def test_cronbach_oracle_matches_python_reference(con):
    got = con.execute(ALPHA_SQL).fetchone()
    rows = con.execute(
        "SELECT CAST(o_custkey % 7 AS BIGINT),"
        " CAST(o_orderkey % 5 AS BIGINT),"
        " CAST(round(o_totalprice) % 9 AS BIGINT) FROM orders"
    ).fetchall()
    import statistics

    v = sum(statistics.variance([r[j] for r in rows]) for j in range(3))
    vt = statistics.variance([sum(r) for r in rows])
    exp = 1.5 * (1 - v / vt)
    assert got[0] == len(rows)
    assert got[2] == pytest.approx(round(v, 6), abs=1e-6)
    assert got[3] == pytest.approx(round(vt, 6), abs=1e-6)
    assert got[4] == pytest.approx(round(exp, 6), abs=1e-6)
