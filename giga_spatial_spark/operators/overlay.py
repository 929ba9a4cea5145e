"""Fractional (area-weighted) overlay aggregation.

Reference: _fractional_aggregation (gigaspatial/processing/geo.py:1051-1116):
UTM-project both layers, gpd.overlay(intersection), weight each parcel's
value by intersection_area / parcel_area, then groupby(zone).sum.

Spark design: bbox cover equi-join for candidates, then
  - ``fractional_overlay_boxes``: when both layers are axis-aligned boxes the
    intersection area is exact closed-form arithmetic — fully native columns
    AND expressible as the DuckDB oracle (greatest/least), so this operator
    is value-hash-checked end to end.
  - ``fractional_overlay_convex``: general convex×convex via the
    Sutherland–Hodgman clip (geometry.clip_polygon_convex) inside an Arrow
    UDF; verified in pytest against a pure-python oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..geometry import clip_polygon_convex, polygon_area


def fractional_overlay_boxes(
    parcels: DataFrame,
    zones: DataFrame,
    value_col: str = "value",
    zone_key: str = "zone_id",
) -> DataFrame:
    """parcels(pminx..pmaxy, value) × zones(zminx..zmaxy) →
    per-zone sum(value * frac_area). Zones broadcast (small dim)."""
    inter_w = F.greatest(
        F.lit(0.0), F.least("pmaxx", "zmaxx") - F.greatest("pminx", "zminx")
    )
    inter_h = F.greatest(
        F.lit(0.0), F.least("pmaxy", "zmaxy") - F.greatest("pminy", "zminy")
    )
    parcel_area = (F.col("pmaxx") - F.col("pminx")) * (F.col("pmaxy") - F.col("pminy"))
    frac = (inter_w * inter_h) / parcel_area
    joined = (
        parcels.join(
            F.broadcast(zones),
            (F.col("pminx") < F.col("zmaxx"))
            & (F.col("pmaxx") > F.col("zminx"))
            & (F.col("pminy") < F.col("zmaxy"))
            & (F.col("pmaxy") > F.col("zminy")),
            "inner",
        )
        .withColumn("__wv", F.col(value_col) * frac)
    )
    return joined.groupBy(zone_key).agg(
        F.sum("__wv").alias(f"{value_col}_weighted_sum"),
        F.count(F.lit(1)).alias("parcel_count"),
    )


def fractional_overlay_convex(
    parcels: DataFrame,
    zone_polys: dict[int, np.ndarray],
    value_col: str = "value",
    vertices_col: str = "vertices",
) -> DataFrame:
    """General path: parcels carry their polygon as array<array<double>>
    (lon,lat pairs); zones are broadcast convex polygons. Arrow-batched clip
    computes exact intersection fractions."""
    spark = parcels.sparkSession
    bc = spark.sparkContext.broadcast(
        {int(k): np.asarray(v, dtype=np.float64) for k, v in zone_polys.items()}
    )
    out_schema = "parcel_id bigint, zone_id int, frac double, weighted double"

    cols = parcels.columns

    def kernel(batches):
        zones = bc.value
        for pdf in batches:
            recs = []
            for _, row in pdf.iterrows():
                # Arrow hands array<array<double>> as an object array of
                # ndarrays — stack explicitly
                poly = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in row[vertices_col]]
                )
                total = polygon_area(poly)
                if total <= 0:
                    continue
                for zid, zpoly in zones.items():
                    inter = clip_polygon_convex(poly, zpoly)
                    if len(inter) >= 3:
                        a = polygon_area(inter)
                        if a > 0:
                            frac = a / total
                            recs.append(
                                (row["parcel_id"], zid, frac, row[value_col] * frac)
                            )
            if recs:
                yield pd.DataFrame(
                    recs, columns=["parcel_id", "zone_id", "frac", "weighted"]
                )

    pairs = parcels.mapInPandas(kernel, schema=out_schema)
    return pairs.groupBy("zone_id").agg(
        F.sum("weighted").alias(f"{value_col}_weighted_sum"),
        F.count(F.lit(1)).alias("parcel_count"),
    )
