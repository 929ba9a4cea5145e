"""Spatially-partitioned point store — the Iceberg-partition-pruning analog.

Reference behavior reproduced: per-S2-shard GeoParquet files loaded only
when intersecting the query geometry
(gigaspatial/handlers/google_ms_combined_buildings.py:46-165,
processing/buildings_engine.py:50-99). SURVEY.md §4 row 1: partition the
table by a coarse cell prefix, compute the query cover on the driver, emit
an `isin(cover)` predicate — the file index prunes partitions before any
row is read (the same manifest pruning Iceberg would do; this sandbox has
no Iceberg jars, so hive-style parquet partitioning carries the layout).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import cells

PARTITION_COL = "qk_prefix"


def write_points_partitioned(
    points: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 3,
    mode: str = "overwrite",
) -> str:
    """Write points hive-partitioned by their zoom-level quadkey prefix
    (64 partitions at zoom 3 — coarse enough for manifest-sized listings
    at 10^12 rows, fine enough to prune most of the world per query)."""
    # 'q' prefix keeps hive partition values strings — bare quadkeys like
    # "030" would be type-inferred to int 30, corrupting the key space
    out = points.withColumn(
        PARTITION_COL,
        F.concat(F.lit("q"), cells.quadkey(F.col(lon), F.col(lat), zoom)),
    )
    out.write.mode(mode).partitionBy(PARTITION_COL).parquet(path)
    return path


def read_points_pruned(
    spark: SparkSession,
    path: str,
    query_poly: np.ndarray,
    zoom: int = 3,
) -> DataFrame:
    """Scan only partitions whose cell intersects the query polygon:
    driver-side cover (reference's get_relevant_data_units,
    handlers/base.py:93-133) → partition-value predicate → Catalyst prunes
    at the file index, before any parquet footer is opened."""
    cover_tiles = cells.polygon_cover(query_poly, zoom)
    cover_qks = [
        "q" + _tile_to_quadkey(x, y, zoom) for x, y in cover_tiles
    ]
    df = spark.read.parquet(path)
    return df.where(F.col(PARTITION_COL).isin(cover_qks))


HEX_PARTITION_COL = "hex_part"


def write_points_hex_partitioned(
    points: DataFrame,
    path: str,
    lon: str = "lon",
    lat: str = "lat",
    res: int = 2,
    mode: str = "overwrite",
) -> str:
    """Hex-grid layout variant (the reference's primary grid is hexagonal):
    hive-partition by the coarse hex cell containing each point — the
    native column expression assigns cells inside whole-stage codegen.
    'h' prefix keeps partition values strings (hive type inference)."""
    from .. import cells_hex

    out = points.withColumn(
        HEX_PARTITION_COL,
        F.concat(
            F.lit("h"),
            cells_hex.cell_id_col(F.col(lon), F.col(lat), res).cast("string"),
        ),
    )
    out.write.mode(mode).partitionBy(HEX_PARTITION_COL).parquet(path)
    return path


def read_points_hex_pruned(
    spark: SparkSession,
    path: str,
    query_poly: np.ndarray,
    res: int = 2,
) -> DataFrame:
    """Prune hex partitions against a query polygon: driver-side hex
    polyfill in 'bbox_overlap' mode — a guaranteed superset of every cell
    intersecting the polygon (center/overlap modes can return an EMPTY
    cover for sliver polygons that contain no cell center, which would
    prune away real data) — then a partition-value predicate Catalyst
    resolves at the file index."""
    from .. import cells_hex

    cover = cells_hex.polyfill(query_poly, res, mode="bbox_overlap")
    keys = [f"h{int(c)}" for c in cover]
    df = spark.read.parquet(path)
    return df.where(F.col(HEX_PARTITION_COL).isin(keys))


def _tile_to_quadkey(x: int, y: int, zoom: int) -> str:
    digits = []
    for i in range(zoom):
        shift = zoom - 1 - i
        digits.append(str(((y >> shift) & 1) * 2 + ((x >> shift) & 1)))
    return "".join(digits)
