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


def zone_cover_df(spark, polys: dict[int, np.ndarray], zoom: int,
                  exact: bool = True) -> DataFrame:
    """(tile, zone_id) cover table — driver-computed (covers are small, as in
    the reference's driver-side RegionCoverer, grid/s2.py:133-187).
    exact=True applies the SAT refine — valid ONLY for convex polygons;
    non-convex zones must use the (conservative) bbox cover."""
    rows = []
    for zid, poly in polys.items():
        for x, y in cells.polygon_cover(poly, zoom, exact=exact):
            rows.append((int(cells.pack_tile(x, y)), int(zid)))
    return spark.createDataFrame(rows, "tile bigint, zone_id int")


def convex_contains_expr(poly: np.ndarray, lon: str, lat: str):
    """Native-column containment predicate for one convex polygon (either
    winding — normalized to CCW here): AND over edges of
    cross(v2-v1, p-v1) >= 0 — the same arithmetic as
    geometry.convex_contains and synth.convex_contains_sql."""
    from ..geometry import ensure_ccw

    poly = ensure_ccw(np.asarray(poly, dtype=np.float64))
    pred = None
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        cross = F.lit(float(x2 - x1)) * (F.col(lat) - F.lit(float(y1))) - F.lit(
            float(y2 - y1)
        ) * (F.col(lon) - F.lit(float(x1)))
        term = cross >= 0.0
        pred = term if pred is None else (pred & term)
    return pred


def pip_join_native(
    points: DataFrame,
    polys: dict[int, np.ndarray],
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 7,
) -> DataFrame:
    """Broadcast cover join + literal-predicate refine. Output: points
    columns + zone_id (inner join; multi-zone points duplicate, like sjoin).

    The polygon layer is a small literal dim, so the exact containment test
    compiles to a per-zone CASE of edge cross-products — the whole operator
    is scan → broadcast hash join → filter, zero shuffles of the point side
    and fully inside whole-stage codegen (verified via .explain)."""
    spark = points.sparkSession
    cover = zone_cover_df(spark, polys, zoom)
    pts = points.withColumn("__tile", cells.tile_id(F.col(lon), F.col(lat), zoom))
    cand = pts.join(F.broadcast(cover), pts["__tile"] == cover["tile"], "inner").drop(
        "tile", "__tile"
    )
    refine = None
    for zid, poly in sorted(polys.items()):
        contains = convex_contains_expr(poly, lon, lat)
        branch = F.when(F.col("zone_id") == int(zid), contains)
        refine = branch if refine is None else refine.when(
            F.col("zone_id") == int(zid), contains
        )
    refine = refine.otherwise(F.lit(False))
    return cand.where(refine)


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
    cover = zone_cover_df(spark, polys, zoom, exact=convex)
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
