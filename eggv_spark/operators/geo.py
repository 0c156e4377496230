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
