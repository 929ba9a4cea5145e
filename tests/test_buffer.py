"""Geodesic buffer (functions/buffer.py) — reference buffer_geodataframe
(processing/geo.py:268-324: UTM project → shapely .buffer(cap_style) →
back). Outline parity is checked against closed-form planar areas and an
exact-distance Monte-Carlo oracle; membership via points_within_buffer is
exact (no discretization)."""

import numpy as np
import pytest

from giga_spatial_spark.functions.buffer import (
    buffer_line_utm,
    buffer_polygon_utm,
    points_within_buffer,
)
from giga_spatial_spark.functions.utm import (
    polygon_area_utm,
    utm_forward,
    utm_zone,
)
from giga_spatial_spark.geometry import point_in_polygon


def test_convex_polygon_buffer_area_closed_form():
    sq = np.array([[10.0, 45.0], [10.3, 45.0], [10.3, 45.2], [10.0, 45.2]])
    r = 5000.0
    zone = utm_zone(10.15)
    e, n = utm_forward(sq[:, 0], sq[:, 1], zone)
    perim = float(np.sum(np.hypot(np.diff(np.r_[e, e[0]]), np.diff(np.r_[n, n[0]]))))
    area = polygon_area_utm(sq)
    ring = buffer_polygon_utm(sq, r, n_points=256)
    got = polygon_area_utm(ring)
    want = area + perim * r + np.pi * r * r  # exact for convex + round joins
    assert abs(got - want) / want < 2e-3


def test_nonconvex_polygon_buffer_matches_exact_distance_mc():
    L = np.array(
        [[10.0, 45.0], [10.3, 45.0], [10.3, 45.08], [10.1, 45.08],
         [10.1, 45.2], [10.0, 45.2]]
    )
    r = 1000.0
    ring = buffer_polygon_utm(L, r, n_points=256)
    rng = np.random.RandomState(0)
    qlon = rng.uniform(9.95, 10.35, 200000)
    qlat = rng.uniform(44.95, 45.25, 200000)
    inb = points_within_buffer(qlon, qlat, L, r, "Polygon")
    box_area = polygon_area_utm(
        np.array([[9.95, 44.95], [10.35, 44.95], [10.35, 45.25], [9.95, 45.25]])
    )
    mc = inb.mean() * box_area
    outline_area = polygon_area_utm(ring)
    assert abs(outline_area - mc) / mc < 8e-3
    # outline membership vs exact distance: disagreements only in the
    # discretization band at the rim
    in_outline = point_in_polygon(ring, qlon, qlat)
    assert (inb != in_outline).mean() < 2e-3


def test_line_buffer_cap_styles():
    line = np.array([[10.0, 45.0], [10.2, 45.05], [10.25, 45.15]])
    zone = utm_zone(10.15)
    e, n = utm_forward(line[:, 0], line[:, 1], zone)
    length = float(np.sum(np.hypot(np.diff(e), np.diff(n))))
    r = 2000.0
    a_round = polygon_area_utm(buffer_line_utm(line, r, "round", n_points=256))
    a_flat = polygon_area_utm(buffer_line_utm(line, r, "flat", n_points=256))
    assert abs(a_round - (2 * length * r + np.pi * r * r)) / a_round < 5e-3
    assert abs(a_flat - 2 * length * r) / a_flat < 5e-3
    assert a_round > a_flat
    with pytest.raises(ValueError, match="cap_style"):
        buffer_line_utm(line, r, "bevel")


def test_point_and_line_membership_exact():
    line = np.array([[10.0, 45.0], [10.2, 45.05]])
    r = 3000.0
    rng = np.random.RandomState(2)
    qlon = rng.uniform(9.9, 10.3, 20000)
    qlat = rng.uniform(44.9, 45.15, 20000)
    got = points_within_buffer(qlon, qlat, line, r, "LineString")
    # independent oracle: dense sampling of the segment + min distance
    zone = utm_zone(10.1)
    e, n = utm_forward(line[:, 0], line[:, 1], zone)
    ts = np.linspace(0, 1, 3000)
    sx = e[0] + ts * (e[1] - e[0])
    sy = n[0] + ts * (n[1] - n[0])
    pe, pn = utm_forward(qlon, qlat, zone)
    d = np.min(
        np.hypot(pe[:, None] - sx[None, :], pn[:, None] - sy[None, :]), axis=1
    )
    # dense sampling overestimates distance by ≤ half the sample step —
    # exclude the ambiguous band around the rim
    band = np.abs(d - r) < 50.0
    assert np.array_equal(got[~band], d[~band] <= r)
    # point buffer degenerate case
    gp = points_within_buffer(qlon, qlat, line[:1], r, "Point")
    dp = np.hypot(pe - e[0], pn - n[0])
    bandp = np.abs(dp - r) < 1.0
    assert np.array_equal(gp[~bandp], dp[~bandp] <= r)


def test_buffered_poi_shard_pruning_join(spark):
    """Verdict r3 #8 'used by a buffered-POI shard-pruning test': tile
    cover of the buffer OUTLINE prunes candidates, the exact distance test
    refines — result equals the brute-force buffered join."""
    from pyspark.sql import functions as F

    from giga_spatial_spark import cells

    zone_poly = np.array(
        [[10.0, 45.0], [10.3, 45.0], [10.3, 45.08], [10.1, 45.08],
         [10.1, 45.2], [10.0, 45.2]]
    )
    r = 8000.0
    ring = buffer_polygon_utm(zone_poly, r, n_points=64)
    rng = np.random.RandomState(7)
    n = 5000
    lons = rng.uniform(9.7, 10.6, n)
    lats = rng.uniform(44.7, 45.5, n)
    pts = spark.createDataFrame(
        list(zip(range(n), map(float, lons), map(float, lats))),
        "poi_id long, lon double, lat double",
    )
    zoom = 9
    cover = spark.createDataFrame(
        [(int(cells.pack_tile(x, y)),) for x, y in
         cells.polygon_cover(ring, zoom, exact=False)],
        "tile bigint",
    )
    cand = (
        pts.withColumn("tile", cells.tile_id(F.col("lon"), F.col("lat"), zoom))
        .join(F.broadcast(cover), "tile", "left_semi")
        .drop("tile")
    )
    import pandas as pd

    def refine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            keep = points_within_buffer(
                pdf["lon"].to_numpy(), pdf["lat"].to_numpy(),
                zone_poly, r, "Polygon",
            )
            yield pdf.loc[keep]

    got = sorted(
        cand.mapInPandas(refine, schema=cand.schema).toPandas()["poi_id"]
    )
    want = sorted(
        np.arange(n)[points_within_buffer(lons, lats, zone_poly, r, "Polygon")]
    )
    assert got == [int(x) for x in want]
    # the pruning actually pruned (cover is a real filter, not pass-through)
    assert cand.count() < n
