"""General polygon×polygon intersects (non-convex both sides) + WKT
MultiPolygon/holes parsing."""

import numpy as np
from pyspark.sql import functions as F

from giga_spatial_spark import synth
from giga_spatial_spark.functions.wkt import (
    multipolygon_wkt,
    parse_multipolygon,
    parse_polygon_rings,
)
from giga_spatial_spark.operators.overlay import (
    box_polygon_intersects_join,
    polygon_intersects_join,
    polygons_intersect,
)

SQ = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
STAR = synth.make_star_polygon(1.0, 1.0, 3.0, 1.2, 5)


def test_polygons_intersect_cases():
    # crossing, containment (both directions), touching, disjoint
    assert polygons_intersect(SQ, SQ + [1.0, 1.0])
    assert polygons_intersect(SQ, SQ * 0.25 + [0.5, 0.5])  # B inside A
    assert polygons_intersect(SQ * 0.25 + [0.5, 0.5], SQ)  # A inside B
    assert polygons_intersect(SQ, SQ + [2.0, 0.0])  # edge-touching counts
    assert not polygons_intersect(SQ, SQ + [5.0, 0.0])
    # non-convex: star crossing square; star arm reaching into square
    assert polygons_intersect(SQ, STAR)
    far_star = synth.make_star_polygon(8.0, 1.0, 3.0, 1.2, 5)
    assert not polygons_intersect(SQ, far_star)
    # collinear edge overlap (shared boundary segment only)
    assert polygons_intersect(SQ, np.array([[2.0, 0.5], [4.0, 0.5], [4.0, 1.5], [2.0, 1.5]]))


def test_star_in_star_hole_free_semantics():
    # a small square fully inside the star's inner radius
    inner = SQ * 0.2 + [0.9, 0.9]
    assert polygons_intersect(inner, STAR)


def test_general_join_matches_box_sat_join(spark):
    """Boxes ARE polygons — the general kernel must agree with the
    SAT-specialized box kernel on the same star zones."""
    zones = {
        0: synth.make_star_polygon(20.0, 10.0, 30.0, 12.0, 5),
        1: synth.make_star_polygon(-80.0, -20.0, 40.0, 15.0, 7),
    }
    parcels = synth.parcels_df(spark, "/root/testdata/sf0.001")
    sat = box_polygon_intersects_join(parcels, zones)
    want = sorted(
        (r["parcel_id"], r["zone_id"]) for r in sat.select("parcel_id", "zone_id").collect()
    )
    as_poly = parcels.withColumn(
        "vertices",
        F.array(
            F.array("pminx", "pminy"),
            F.array("pmaxx", "pminy"),
            F.array("pmaxx", "pmaxy"),
            F.array("pminx", "pmaxy"),
        ),
    )
    gen = polygon_intersects_join(as_poly, zones)
    got = sorted(
        (r["parcel_id"], r["zone_id"]) for r in gen.select("parcel_id", "zone_id").collect()
    )
    assert got == want and len(got) > 0


def test_wkt_polygon_holes_roundtrip():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    wkt = (
        "POLYGON ((0 0, 4 0, 4 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    )
    rings = parse_polygon_rings(wkt)
    assert len(rings) == 2
    assert np.array_equal(rings[0], outer) and np.array_equal(rings[1], hole)


def test_wkt_multipolygon_roundtrip():
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    hole = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
    tri = np.array([[10.0, 10.0], [11.0, 10.0], [10.5, 11.0]])
    wkt = multipolygon_wkt([[outer, hole], [tri]])
    polys = parse_multipolygon(wkt)
    assert len(polys) == 2 and len(polys[0]) == 2 and len(polys[1]) == 1
    assert np.array_equal(polys[0][0], outer)
    assert np.array_equal(polys[0][1], hole)
    assert np.array_equal(polys[1][0], tri)
    assert parse_multipolygon("POLYGON ((0 0, 1 0, 1 1, 0 0))") is None


# -------------------------------------------- general fractional overlay (r4)
def test_ear_clip_partitions_exactly():
    """Triangulation must partition: areas sum to the polygon area and no
    two triangles overlap — for rectilinear shapes (incl. collinear-heavy
    plus/U), stars, staircases and random simple polygons."""
    from giga_spatial_spark.geometry import (
        ear_clip_triangulate,
        polygon_area,
        polygon_intersection_area,
    )

    def check(poly):
        poly = np.asarray(poly, dtype=np.float64)
        tris = ear_clip_triangulate(poly)
        total = sum(polygon_area(t) for t in tris)
        assert abs(total - polygon_area(poly)) < 1e-9 * max(1, polygon_area(poly))
        for i in range(len(tris)):
            for j in range(i + 1, len(tris)):
                assert polygon_intersection_area(tris[i], tris[j]) < 1e-8

    for spec in synth.make_rectilinear_zones().values():
        for ring in spec["rings"]:
            check(ring)
    check(synth.make_star_polygon())
    rng = np.random.RandomState(5)
    for t in range(10):
        m = rng.randint(5, 16)
        gaps = rng.uniform(0.2, 1.0, m)
        ang = 2 * np.pi * np.cumsum(gaps) / gaps.sum()
        r = rng.uniform(1, 10, m)
        check(np.column_stack([r * np.cos(ang), r * np.sin(ang)]))


def test_polygon_intersection_area_analytic_and_symmetric():
    from giga_spatial_spark.geometry import polygon_intersection_area

    L = np.array([[0, 0], [20, 0], [20, 10], [8, 10], [8, 30], [0, 30]], float)
    box = np.array([[5, 5], [15, 5], [15, 20], [5, 20]], float)
    # L = [0,20]×[0,10] ∪ [0,8]×[10,30]; box∩ = 10×5 + 3×10 = 80
    assert abs(polygon_intersection_area(box, L) - 80.0) < 1e-9
    assert abs(polygon_intersection_area(L, box) - 80.0) < 1e-9
    # disjoint
    far = box + np.array([100.0, 0.0])
    assert polygon_intersection_area(far, L) == 0.0
    # non-convex × non-convex, symmetric
    star = synth.make_star_polygon(cx=10.0, cy=10.0)
    a1 = polygon_intersection_area(star, L)
    a2 = polygon_intersection_area(L, star)
    assert a1 > 0 and abs(a1 - a2) < 1e-9


def test_fractional_general_matches_convex_path_on_convex_inputs(spark):
    """On convex zones the general kernel must reproduce
    fractional_overlay_convex exactly (same parcels, same zones)."""
    from giga_spatial_spark.operators.overlay import (
        fractional_overlay_convex,
        fractional_overlay_general,
    )

    rng = np.random.RandomState(3)
    rows = []
    for pid in range(80):
        cx, cy = rng.uniform(-40, 40, 2)
        w, h = rng.uniform(1, 6, 2)
        rows.append(
            (
                pid,
                [[float(cx - w), float(cy - h)], [float(cx + w), float(cy - h)],
                 [float(cx + w), float(cy + h)], [float(cx - w), float(cy + h)]],
                float(rng.uniform(10, 100)),
            )
        )
    parcels = spark.createDataFrame(
        rows, "parcel_id long, vertices array<array<double>>, value double"
    )
    zones = {k: v for k, v in list(synth.make_admin_polygons().items())[:4]}
    a = {
        r["zone_id"]: r
        for r in fractional_overlay_convex(parcels, zones).collect()
    }
    b = {
        r["zone_id"]: r
        for r in fractional_overlay_general(parcels, zones).collect()
    }
    assert set(a) == set(b) and len(a) > 0
    for zid in a:
        assert a[zid]["parcel_count"] == b[zid]["parcel_count"]
        assert abs(
            a[zid]["value_weighted_sum"] - b[zid]["value_weighted_sum"]
        ) < 1e-6


def test_fractional_general_hole_zone(spark):
    """A zone with a hole: parcel fully inside the hole contributes 0;
    parcel spanning the hole contributes outer∩ − hole∩."""
    from giga_spatial_spark.operators.overlay import fractional_overlay_general

    outer = [[0.0, 0.0], [30.0, 0.0], [30.0, 30.0], [0.0, 30.0]]
    hole = [[10.0, 10.0], [20.0, 10.0], [20.0, 20.0], [10.0, 20.0]]
    parcels = spark.createDataFrame(
        [
            # fully inside the hole → dropped
            (1, [[12.0, 12.0], [18.0, 12.0], [18.0, 18.0], [12.0, 18.0]], 100.0),
            # spans hole boundary: [5,15]×[12,18] → inside-zone part is [5,10]×[12,18]=30 of 60
            (2, [[5.0, 12.0], [15.0, 12.0], [15.0, 18.0], [5.0, 18.0]], 100.0),
            # fully in solid part
            (3, [[1.0, 1.0], [5.0, 1.0], [5.0, 5.0], [1.0, 5.0]], 40.0),
        ],
        "parcel_id long, vertices array<array<double>>, value double",
    )
    out = {
        r["zone_id"]: r
        for r in fractional_overlay_general(
            parcels, {7: [np.asarray(outer), np.asarray(hole)]}
        ).collect()
    }
    assert out[7]["parcel_count"] == 2  # parcel 1 contributes nothing
    assert abs(out[7]["value_weighted_sum"] - (100.0 * 0.5 + 40.0)) < 1e-9


def test_fractional_boxes_general_matches_general_path(spark):
    """The vectorized box-parcel fast path must reproduce the per-parcel
    general kernel exactly (same zones incl. the holed one)."""
    from giga_spatial_spark.operators.overlay import (
        fractional_overlay_boxes_general,
        fractional_overlay_general,
    )

    rng = np.random.RandomState(13)
    rows_box, rows_v = [], []
    for pid in range(150):
        cx, cy = rng.uniform(-160, 120), rng.uniform(-60, 60)
        w, h = rng.uniform(1, 8, 2)
        v = float(rng.uniform(10, 100))
        rows_box.append(
            (pid, float(cx - w), float(cy - h), float(cx + w), float(cy + h), v)
        )
        rows_v.append(
            (
                pid,
                [[float(cx - w), float(cy - h)], [float(cx + w), float(cy - h)],
                 [float(cx + w), float(cy + h)], [float(cx - w), float(cy + h)]],
                v,
            )
        )
    boxes = spark.createDataFrame(
        rows_box,
        "parcel_id long, pminx double, pminy double, pmaxx double, "
        "pmaxy double, value double",
    )
    verts = spark.createDataFrame(
        rows_v, "parcel_id long, vertices array<array<double>>, value double"
    )
    zones = synth.rectilinear_zone_rings()
    a = {
        r["zone_id"]: r
        for r in fractional_overlay_boxes_general(boxes, zones).collect()
    }
    b = {
        r["zone_id"]: r
        for r in fractional_overlay_general(verts, zones).collect()
    }
    assert set(a) == set(b) and len(a) > 0
    for zid in a:
        assert a[zid]["parcel_count"] == b[zid]["parcel_count"], zid
        assert abs(
            a[zid]["value_weighted_sum"] - b[zid]["value_weighted_sum"]
        ) < 1e-8
