"""Geospatial-lite operators: grid bucketing and proximity joins.

No geometry library — plain Column math, which is exactly how
planet-scale proximity joins are built on relational engines: bucket
points into lat/lon grid cells sized to the query radius, equi-join on
cell (one side exploded to its 3×3 cell neighborhood so
radius-crossing pairs aren't lost), then verify the exact haversine
distance only on candidates.  Work is Σ per-cell |A_c|·|B_c| — density
bounded — never |A|·|B|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(
    lat1: Column, lon1: Column, lat2: Column, lon2: Column
) -> Column:
    """Great-circle distance in km (double precision, radians inside)."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) * F.sin(dlon)
    )
    return 2 * EARTH_RADIUS_KM * F.asin(F.sqrt(a))


def grid_cell(lat: Column, lon: Column, cell_deg: float) -> Column:
    """Integer grid-cell id for a lat/lon at ``cell_deg`` resolution —
    the geohash-style binning key.  Encoded as one long
    (lat_cell * 4096 + lon_cell, both offset non-negative) so it
    equi-joins and broadcasts cheaply."""
    lat_c = F.floor((lat + 90.0) / cell_deg).cast("long")
    lon_c = F.floor((lon + 180.0) / cell_deg).cast("long")
    return lat_c * 4096 + lon_c


def proximity_join(
    left: DataFrame,
    right: DataFrame,
    radius_km: float,
    left_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    right_cols: tuple[str, str, str] = ("id", "lat", "lon"),
    cell_deg: float | None = None,
) -> DataFrame:
    """All pairs within ``radius_km``: grid-bucket both sides (cell
    edge ≥ the radius in degrees, so any qualifying pair sits in the
    same or an adjacent cell), explode the LEFT side to its 3×3 cell
    neighborhood, equi-join on cell, haversine-verify.  Self-pairs
    and duplicate orientations are dropped via id ordering."""
    if cell_deg is None:
        # 1° latitude ≈ 111 km; round the radius up to a cell edge
        cell_deg = max(radius_km / 111.0, 0.01)
    li, la, lo = left_cols
    ri, ra, ro = right_cols
    lat_c = F.floor((F.col(la) + 90.0) / cell_deg).cast("long")
    lon_c = F.floor((F.col(lo) + 180.0) / cell_deg).cast("long")
    offsets = F.array(*[
        F.struct(F.lit(dy).alias("dy"), F.lit(dx).alias("dx"))
        for dy in (-1, 0, 1) for dx in (-1, 0, 1)
    ])
    lhs = (
        left.select(
            F.col(li).alias("left_id"),
            F.col(la).alias("left_lat"), F.col(lo).alias("left_lon"),
            lat_c.alias("_latc"), lon_c.alias("_lonc"),
        )
        .withColumn("_o", F.explode(offsets))
        .select(
            "left_id", "left_lat", "left_lon",
            ((F.col("_latc") + F.col("_o.dy")) * 4096
             + F.col("_lonc") + F.col("_o.dx")).alias("_cell"),
        )
    )
    rlat_c = F.floor((F.col(ra) + 90.0) / cell_deg).cast("long")
    rlon_c = F.floor((F.col(ro) + 180.0) / cell_deg).cast("long")
    rhs = right.select(
        F.col(ri).alias("right_id"),
        F.col(ra).alias("right_lat"), F.col(ro).alias("right_lon"),
        (rlat_c * 4096 + rlon_c).alias("_cell"),
    )
    dist = haversine_km(
        F.col("left_lat"), F.col("left_lon"),
        F.col("right_lat"), F.col("right_lon"),
    )
    return (
        lhs.join(rhs, "_cell")
        .filter(F.col("left_id") < F.col("right_id"))
        .withColumn("distance_km", F.round(dist, 2))
        .filter(F.col("distance_km") <= radius_km)
        .select("left_id", "right_id", "distance_km")
    )


def grid_density(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    cell_deg: float = 1.0,
    top_n: int = 20,
) -> DataFrame:
    """Spatial density hotspots: bin points to the integer grid
    (``grid_cell``), count per cell, rank by (count desc, cell id)
    — a rank-based cutoff, never a percentile, so the selected set
    is identical across engines.  One map-side-combined aggregation
    + one tiny top-N window; the cell id decodes back to lat/lon
    bounds in the output so the hotspot is human-readable."""
    cell = grid_cell(F.col(lat_col), F.col(lon_col), cell_deg)
    per_cell = df.groupBy(cell.alias("cell_id")).agg(
        F.count("*").alias("n_points")
    )
    w = Window.orderBy(F.col("n_points").desc(), "cell_id")
    ranked = per_cell.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    )
    lat_c = F.floor(F.col("cell_id") / 4096)
    lon_c = F.pmod(F.col("cell_id"), F.lit(4096))
    return ranked.select(
        "rank", "cell_id", "n_points",
        F.round(lat_c * cell_deg - 90.0, 4).alias("lat_lo"),
        F.round(lon_c * cell_deg - 180.0, 4).alias("lon_lo"),
    )


def hotspot_clusters(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    cell_deg: float = 5.0,
    min_points: int = 3,
    adaptive: bool = False,
) -> DataFrame:
    """Grid-based density clustering (the DBSCAN idea at fixed
    resolution): bin points to cells, keep cells with >=
    ``min_points``, connect dense cells that are 8-neighborhood
    adjacent, and resolve clusters with the SAME large-star/small-
    star components used for dedup clusters — composition over a new
    algorithm.  Output: one row per cluster with cell count, point
    total, and the minimum cell id as the stable cluster label.

    Scale: the dense-cell frame is tiny relative to points (the
    aggregation did the heavy lifting), so the CC rounds run on
    cells, never points."""
    from eggv_spark.operators.dedupe import connected_components_star

    cell = grid_cell(F.col(lat_col), F.col(lon_col), cell_deg)
    occupied = df.groupBy(cell.alias("cell_id")).agg(
        F.count("*").alias("n_points")
    )
    if adaptive:
        # threshold = max(min_points, ceil(1.25 * mean-per-occupied-
        # cell)): a fixed count saturates as data grows (every cell
        # goes "dense" and the grid percolates into one megacluster);
        # scaling with the occupancy mean keeps dense cells in the
        # upper tail at ANY scale.  Carried as a broadcast scalar —
        # still lazy.
        thr_row = occupied.agg(
            F.greatest(
                F.lit(min_points),
                F.ceil(1.25 * F.avg("n_points")).cast("int"),
            ).alias("_thr")
        )
        dense = (
            occupied.crossJoin(F.broadcast(thr_row))
            .filter(F.col("n_points") >= F.col("_thr"))
            .select("cell_id", "n_points")
        )
    else:
        dense = occupied.filter(F.col("n_points") >= min_points)
    # 8-neighborhood adjacency among dense cells: explode each cell to
    # its neighbor ids, semi-join back (edge emitted once, a < b)
    offsets = [
        dy * 4096 + dx for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if not (dy == 0 and dx == 0)
    ]
    nbr = dense.select(
        F.col("cell_id").alias("a"),
        F.explode(
            F.array(*[F.col("cell_id") + F.lit(o) for o in offsets])
        ).alias("b"),
    ).filter(F.col("a") < F.col("b"))
    edges = nbr.join(
        dense.select(F.col("cell_id").alias("b")), "b", "left_semi"
    ).select(F.col("a").alias("id_a"), F.col("b").alias("id_b"))
    comp = connected_components_star(edges)
    labeled = dense.join(
        comp.select(
            F.col("node").alias("cell_id"),
            F.col("component").alias("_comp"),
        ),
        "cell_id",
        "left",
    ).select(
        "cell_id", "n_points",
        # isolated dense cells are their own cluster
        F.coalesce("_comp", F.col("cell_id")).alias("cluster_id"),
    )
    return labeled.groupBy("cluster_id").agg(
        F.count("*").alias("n_cells"),
        F.sum("n_points").alias("n_points"),
    )
