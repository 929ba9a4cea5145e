"""Geo scalar functions (SURVEY.md §2.9) — native column expressions where
possible, numpy kernels otherwise. References cited per function."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def utm_epsg_expr(lon: Column, lat: Column) -> Column:
    """UTM CRS estimation (reference estimate_utm_crs_with_fallback,
    processing/geo.py:21-66): zone from centroid longitude, hemisphere from
    latitude; EPSG 326xx north / 327xx south."""
    zone = (F.floor((lon + 180.0) / 6.0) + 1).cast("int")
    zone = F.least(F.greatest(zone, F.lit(1)), F.lit(60))
    return F.when(lat >= 0, 32600 + zone).otherwise(32700 + zone)


def add_spatial_jitter(
    df: DataFrame,
    lon: str = "lon",
    lat: str = "lat",
    amount_deg: float = 0.0001,
    seed: int = 42,
) -> DataFrame:
    """Jitter duplicate coordinates (reference add_spatial_jitter,
    geo.py:327-409): rows sharing an exact (lon, lat) get a deterministic
    offset; first occurrence stays put. Duplicate detection via a window
    count; offset from a seeded rand so runs are reproducible."""
    w = Window.partitionBy(lon, lat).orderBy(F.monotonically_increasing_id())
    dup_rank = F.row_number().over(w)
    jx = (F.rand(seed) * 2 - 1) * amount_deg
    jy = (F.rand(seed + 1) * 2 - 1) * amount_deg
    return (
        df.withColumn("__rk", dup_rank)
        .withColumn(lon, F.when(F.col("__rk") > 1, F.col(lon) + jx).otherwise(F.col(lon)))
        .withColumn(lat, F.when(F.col("__rk") > 1, F.col(lat) + jy).otherwise(F.col(lat)))
        .drop("__rk")
    )


def buffer_bbox_deg(lat: float, radius_m: float) -> tuple[float, float]:
    """Geodesic buffer approximation for candidate generation (reference
    buffer_geodataframe geo.py:268-324 does a UTM round-trip; for cover
    computation a lat-aware degree box is sufficient and driver-cheap):
    returns (dlon, dlat) half-widths in degrees."""
    m_per_deg = 111_194.9
    dlat = radius_m / m_per_deg
    dlon = radius_m / (m_per_deg * max(math.cos(math.radians(abs(lat) + dlat)), 1e-6))
    return dlon, dlat


def polygon_area_m2(poly: np.ndarray) -> float:
    """Geodesic-approximate polygon area in m² (reference add_area_in_meters,
    geo.py:438-477, does a UTM round-trip): shoelace in a local
    equirectangular frame anchored at the centroid latitude — within ~0.1%
    of the UTM answer for the admin-zone-sized polygons this engine joins."""
    lat0 = float(np.mean(poly[:, 1]))
    m_per_deg = 111_194.9
    x = poly[:, 0] * m_per_deg * math.cos(math.radians(lat0))
    y = poly[:, 1] * m_per_deg
    return 0.5 * float(
        abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    )


def simplify_polyline(points: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker simplification (reference simplify_geometries,
    geo.py:480-520 wraps shapely.simplify). Iterative stack implementation."""
    n = len(points)
    if n < 3:
        return points
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, n - 1)]
    while stack:
        s, e = stack.pop()
        if e <= s + 1:
            continue
        seg = points[e] - points[s]
        seg_len = np.hypot(*seg)
        if seg_len == 0:
            d = np.hypot(*(points[s + 1 : e] - points[s]).T)
        else:
            d = np.abs(np.cross(seg, points[s + 1 : e] - points[s])) / seg_len
        idx = int(np.argmax(d))
        if d[idx] > tolerance:
            k = s + 1 + idx
            keep[k] = True
            stack.append((s, k))
            stack.append((k, e))
    return points[keep]


def mercator_meters_per_pixel(lat: Column, zoom: int) -> Column:
    """Ground resolution at latitude (reference calculate_pixels_at_location
    geo.py:1176-1213): 156543.03392 * cos(lat) / 2^zoom."""
    return F.lit(156543.03392) * F.cos(F.radians(lat)) / F.lit(float(2**zoom))


def pixels_for_meters(lat: Column, meters: Column, zoom: int) -> Column:
    return meters / mercator_meters_per_pixel(lat, zoom)
