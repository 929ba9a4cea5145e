"""Point-in-polygon join — the engine's flagship operator.

Reference semantics: gpd.sjoin(points, zones, how="inner",
predicate="within") in aggregate_points_to_zones
(gigaspatial/processing/geo.py:584-743, join at :684) — an R-tree build +
probe on a single node.

Spark-first design (SURVEY.md §2.4): two physical strategies with identical
output:

1. ``pip_join_native`` — cell-cover candidates via a broadcast equi-join on
   the mercator tile id, refined by a *fully native* edge cross-product
   test (no Python in the hot path; whole-stage codegen end to end).
   Correct for convex zones.

2. ``pip_join_rtree`` — candidates the same way, refine inside
   ``mapInPandas`` probing a broadcast :class:`geometry.GridIndex` (the
   from-scratch STRtree analog, reference buildings_engine.py:202-206)
   with vectorized numpy containment. Handles arbitrary simple polygons.

Both scale the same way: the polygon side is small (admin layers), so the
only shuffle-free plan is broadcast; the points side streams. At 10^12 rows
the tile-cover pre-filter drops the candidate multiplier to ~coverage
fraction × ring overlap, and no shuffle of the big side ever happens.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cells
from ..geometry import GridIndex


def zone_cover_df(spark, polys: dict[int, np.ndarray], zoom: int) -> DataFrame:
    """(tile, zone_id) cover table — driver-computed (covers are small, as in
    the reference's driver-side RegionCoverer, grid/s2.py:133-187)."""
    rows = []
    for zid, poly in polys.items():
        for x, y in cells.polygon_cover(poly, zoom):
            rows.append((int(cells.pack_tile(x, y)), int(zid)))
    return spark.createDataFrame(rows, "tile bigint, zone_id int")


def pip_join_native(
    points: DataFrame,
    polys: dict[int, np.ndarray],
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 7,
) -> DataFrame:
    """Broadcast cover join + native edge-refine. Output: points columns +
    zone_id (inner join; multi-zone points duplicate, like sjoin)."""
    spark = points.sparkSession
    cover = zone_cover_df(spark, polys, zoom)
    edges = []
    for zid, poly in polys.items():
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            edges.append((int(zid), float(x1), float(y1), float(x2), float(y2)))
    edges_df = spark.createDataFrame(
        edges, "zone_id int, x1 double, y1 double, x2 double, y2 double"
    )

    pts = points.withColumn("__tile", cells.tile_id(F.col(lon), F.col(lat), zoom))
    cand = pts.join(F.broadcast(cover), pts["__tile"] == cover["tile"], "inner").drop(
        "tile", "__tile"
    )
    # refine: inside ⇔ min over edges of cross(v2-v1, p-v1) >= 0
    cross = (F.col("x2") - F.col("x1")) * (F.col(lat) - F.col("y1")) - (
        F.col("y2") - F.col("y1")
    ) * (F.col(lon) - F.col("x1"))
    refined = (
        cand.join(F.broadcast(edges_df), "zone_id")
        .groupBy(*points.columns, "zone_id")
        .agg(F.min(cross).alias("__min_cross"))
        .where(F.col("__min_cross") >= 0.0)
        .drop("__min_cross")
    )
    return refined


def pip_join_rtree(
    points: DataFrame,
    polys: dict[int, np.ndarray],
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 7,
    convex: bool = True,
) -> DataFrame:
    """Broadcast cover join + per-partition GridIndex refine in mapInPandas.

    The index is built once on the driver and broadcast; each Arrow batch
    probes it vectorized (numpy). This is the general-polygon scale path —
    the engine's own "broadcast R-tree per partition".
    """
    spark = points.sparkSession
    cover = zone_cover_df(spark, polys, zoom)
    pts = points.withColumn("__tile", cells.tile_id(F.col(lon), F.col(lat), zoom))
    cand = (
        pts.join(F.broadcast(cover), pts["__tile"] == cover["tile"], "left_semi")
        .drop("__tile")
    )

    bc = spark.sparkContext.broadcast(
        {int(k): np.asarray(v, dtype=np.float64) for k, v in polys.items()}
    )
    from pyspark.sql.types import IntegerType, StructField, StructType

    out_schema = StructType(
        list(cand.schema.fields) + [StructField("zone_id", IntegerType())]
    )
    cols = cand.columns

    def refine(batches):
        index = GridIndex(bc.value)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx, pid = index.query_points(
                pdf[lon].to_numpy(), pdf[lat].to_numpy(), convex=convex
            )
            if len(idx) == 0:
                continue
            out = pdf.iloc[idx].copy()
            out["zone_id"] = pd.array(pid.astype(np.int64), dtype="int32")
            yield out[cols + ["zone_id"]]

    return cand.mapInPandas(refine, schema=out_schema)
