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
