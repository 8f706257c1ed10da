"""Geo-encoded secondary index + geo_distance / bbox query surface.

The reference maintains a geo-encoded index over media locations
(`originalIdByLocation`, MediaServiceLive.scala:1811,1827) and indexes
a geo_point per search doc (SaoMedia.scala) so dashboards can issue
ES geo_distance / geo_bounding_box filters.  Spark-first equivalent:

* the index is a parquet table HIVE-PARTITIONED by a coarse grid cell
  (``geo_bucket`` = 10-degree lat/lon tile -> at most 18 x 36 = 648
  partitions, a bounded directory fan-out at any corpus size), rows
  within a partition sorted by the fine 1-degree ``cell_id`` so
  parquet min/max stats prune row groups inside a tile;
* a bbox query maps driver-side to the covering bucket list — the
  scan carries ``geo_bucket IN (...)`` (partition pruning: untouched
  tiles are never listed, let alone read) plus the exact lat/lon
  band as pushed-down data filters;
* geo_distance = the radius' bounding box as the coarse prefilter,
  then the exact haversine (operators/analytics2.haversine_m,
  reference Location.scala:53-70) as a codegen refine — the standard
  grid-index two-phase (filter-and-refine) plan, no UDF anywhere.

At 100 TB the bbox prefilter is what matters: a 50 km radius touches
1-4 tiles out of 648, so the scan cost tracks the query's area, not
the corpus.  Skew (everyone in one city tile) degrades to a
row-group-pruned scan of that tile — the same cliff ES geo queries
have inside one geohash cell.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sotohp_spark.operators.analytics2 import haversine_m

BUCKET_DEG = 10.0   # hive-partition tile (<= 648 partitions globally)
CELL_DEG = 1.0      # in-file sort key (row-group pruning inside a tile)
_M_PER_DEG_LAT = 111_320.0  # meters per degree latitude (spherical)


def geo_bucket_expr(lat, lon):
    """Coarse tile id of (lat, lon): row-major over 10-degree tiles,
    0..647.  Pure column arithmetic (codegen), monotone in (lat, lon)
    within a tile row."""
    row = F.floor((lat + F.lit(90.0)) / F.lit(BUCKET_DEG))
    col = F.floor((lon + F.lit(180.0)) / F.lit(BUCKET_DEG))
    # clamp the degenerate upper edges (lat=90, lon=180) into the last
    # tile instead of a phantom 19th/37th row
    row = F.least(row, F.lit(17.0))
    col = F.least(col, F.lit(35.0))
    return (row * 36 + col).cast("int")


def cell_id_expr(lat, lon):
    """Fine 1-degree cell id — the within-partition sort key."""
    row = F.least(F.floor(lat + F.lit(90.0)), F.lit(179.0))
    col = F.least(F.floor(lon + F.lit(180.0)), F.lit(359.0))
    return (row * 360 + col).cast("int")


def build_geo_index(points: DataFrame, path: str,
                    lat_col: str = "lat", lon_col: str = "lon") -> None:
    """Write the geo-encoded index: hive-partitioned by geo_bucket,
    sorted by cell_id within files.  ``points`` carries the id/payload
    columns plus lat/lon; everything is kept (covering index)."""
    lat, lon = F.col(lat_col), F.col(lon_col)
    (
        points
        .withColumn("geo_bucket", geo_bucket_expr(lat, lon))
        .withColumn("cell_id", cell_id_expr(lat, lon))
        .repartition("geo_bucket")
        .sortWithinPartitions("cell_id")
        .write.mode("overwrite")
        .partitionBy("geo_bucket")
        .parquet(path)
    )


def _bucket_range(lat_min: float, lat_max: float,
                  lon_min: float, lon_max: float) -> list:
    """Driver-side covering-tile list of a bbox (inclusive bounds)."""
    r0 = max(0, min(17, int(math.floor((lat_min + 90.0) / BUCKET_DEG))))
    r1 = max(0, min(17, int(math.floor((lat_max + 90.0) / BUCKET_DEG))))
    c0 = max(0, min(35, int(math.floor((lon_min + 180.0) / BUCKET_DEG))))
    c1 = max(0, min(35, int(math.floor((lon_max + 180.0) / BUCKET_DEG))))
    return [
        r * 36 + c
        for r in range(r0, r1 + 1)
        for c in range(c0, c1 + 1)
    ]


def geo_bbox(spark: SparkSession, index_path: str,
             lat_min: float, lat_max: float,
             lon_min: float, lon_max: float,
             lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ES geo_bounding_box filter over the geo index: partition-pruned
    scan of the covering tiles + the exact lat/lon band as pushed-down
    parquet filters.  Returns the matching index rows."""
    buckets = _bucket_range(lat_min, lat_max, lon_min, lon_max)
    df = spark.read.option("basePath", index_path).parquet(index_path)
    return df.where(
        F.col("geo_bucket").isin(buckets)
        & F.col(lat_col).between(float(lat_min), float(lat_max))
        & F.col(lon_col).between(float(lon_min), float(lon_max))
    )


def geo_grid_agg(spark: SparkSession, index_path: str,
                 lat_min: float, lat_max: float,
                 lon_min: float, lon_max: float,
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ES ``geohash_grid``-style aggregation over a bbox: one count
    per fine grid cell (the 1-degree ``cell_id`` the index already
    stores as its in-file sort key).  Returns DataFrame(cell_id,
    cell_lat, cell_lon, n) — cell_lat/lon are the cell's southwest
    corner in degrees.

    Scale shape: the bbox partition-prunes tiles exactly like
    geo_bbox, then ONE groupBy(cell_id) with map-side partials — the
    result is bounded by the bbox's cell count (<= 360 x 180), never
    the row count."""
    box = geo_bbox(spark, index_path, lat_min, lat_max, lon_min,
                   lon_max, lat_col, lon_col)
    return (
        box.groupBy("cell_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "cell_id",
            (F.floor(F.col("cell_id") / 360) - 90)
            .cast("int").alias("cell_lat"),
            (F.col("cell_id") % 360 - 180).cast("int").alias("cell_lon"),
            "n",
        )
        .orderBy("cell_id")
    )


def geo_distance(spark: SparkSession, index_path: str,
                 lat: float, lon: float, radius_m: float,
                 lat_col: str = "lat", lon_col: str = "lon") -> DataFrame:
    """ES geo_distance filter: rows within ``radius_m`` meters of the
    center, with the exact haversine distance attached (``dist_m``).

    Two-phase grid-index plan: the radius' bounding box prunes tiles
    (partition filter) and lat/lon bands (data filter, parquet
    row-group stats), then the exact haversine refines in codegen.
    The lon band widens by 1/cos(lat) toward the poles; past the
    point where the cap wraps a full circle the band degrades to all
    longitudes (still lat-band-pruned)."""
    radius_m = float(radius_m)
    if radius_m < 0:
        raise ValueError("radius_m must be >= 0")
    dlat = radius_m / _M_PER_DEG_LAT
    lat_min = max(-90.0, lat - dlat)
    lat_max = min(90.0, lat + dlat)
    # widest circle of latitude the cap touches decides the lon band
    max_abs_lat = min(89.999, max(abs(lat_min), abs(lat_max)))
    cosw = math.cos(math.radians(max_abs_lat))
    if cosw * _M_PER_DEG_LAT * 360.0 <= 2.0 * radius_m or cosw <= 0.0:
        lon_min, lon_max = -180.0, 180.0
    else:
        dlon = radius_m / (_M_PER_DEG_LAT * cosw)
        lon_min, lon_max = lon - dlon, lon + dlon
        if lon_min < -180.0 or lon_max > 180.0:
            # the box wraps the antimeridian: fall back to the full
            # lon range (correct, coarser — the lat band still prunes)
            lon_min, lon_max = -180.0, 180.0
    box = geo_bbox(spark, index_path, lat_min, lat_max, lon_min, lon_max,
                   lat_col, lon_col)
    dist = haversine_m(
        F.lit(float(lat)), F.lit(float(lon)),
        F.col(lat_col), F.col(lon_col),
    )
    return (
        box.withColumn("dist_m", dist)
        .where(F.col("dist_m") <= radius_m)
    )
