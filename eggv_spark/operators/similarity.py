"""Similarity search over embedding columns (extension, SURVEY §7.4).

Two paths:
- ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
  query set against the full corpus; one pass, no shuffle of the big
  side, window top-k per query.  The correctness baseline.
- ``ivf_topk`` — IVF-style approximate path for scale: corpus rows
  are assigned to the nearest of C deterministic centroids
  (partition pruning analog); each query probes only its P nearest
  centroids' rows.  Cuts the scanned fraction to ~P/C while keeping
  the same final exact-cosine ranking within probed cells.

Both stay in Column expressions (zip_with/aggregate higher-order
functions) — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from eggv_spark.operators.dedupe import base_hash, cosine_col


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` rows per ``queries`` row.

    The query side is broadcast (it must be small — typical ANN usage
    has |queries| << |corpus|); the corpus streams through a single
    stage computing cosines, then one shuffle on query_id for the
    window top-k.  Self-matches are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _deterministic_centroid(c: int, dim: int) -> Column:
    """Pseudo-random unit-free centroid c, derived from md5 — fully
    deterministic, no RNG state to ship to executors."""
    return F.array(
        *[
            ((base_hash(F.lit(f"centroid-{c}-{d}")) % 2001) - 1000).cast("double")
            for d in range(dim)
        ]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-bucketed approximate top-k.

    Assignment and probing both use cosine against the deterministic
    centroid set.  At scale the corpus would be written bucketed by
    ``cell`` (partition pruning per query batch); here the cell join
    performs the pruning.
    """
    dim = len(corpus.select(vec_col).first()[0])
    centroids = [
        _deterministic_centroid(c, dim) for c in range(n_centroids)
    ]

    def best_cells(vec: Column, n: int) -> Column:
        scored = F.array(
            *[
                F.struct(
                    F.round(cosine_col(vec, cen), 6).alias("cos"),
                    F.lit(c).alias("cell"),
                )
                for c, cen in enumerate(centroids)
            ]
        )
        ordered = F.reverse(F.array_sort(scored))
        return F.transform(F.slice(ordered, 1, n), lambda s: s.getField("cell"))

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).withColumn("cell", F.get(best_cells(F.col("c_vec"), 1), 0))

    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        ).withColumn("cell", F.explode(best_cells(F.col("q_vec"), n_probe)))
    )

    scored = (
        c.join(q, "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine_col(F.col("q_vec"), F.col("c_vec")), 4))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
