"""S2-lite cells, geo scalar functions, entity validation layer."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from giga_spatial_spark import cells, cells_s2
from giga_spatial_spark.entity import (
    standard_point_constraints,
    validate,
    with_entity_id,
)
from giga_spatial_spark.functions.geo import (
    add_spatial_jitter,
    simplify_polyline,
    utm_epsg_expr,
)


# ------------------------------------------------------------------ S2-lite
def test_s2_levels_and_hierarchy():
    lats = np.array([40.71, -33.87, 0.0, 51.5, 85.0, -85.0])
    lons = np.array([-74.0, 151.21, 0.0, -0.12, 179.9, -179.9])
    c12 = cells_s2.cell_id(lats, lons, level=12)
    assert (cells_s2.cell_level(c12) == 12).all()
    # parent at level 8 equals direct computation at level 8
    c8 = cells_s2.cell_id(lats, lons, level=8)
    assert (cells_s2.parent(c12, 8) == c8).all()
    # distinct locations → distinct cells at fine level
    c30 = cells_s2.cell_id(lats, lons, level=30)
    assert len(set(c30.tolist())) == len(lats)


def test_s2_children_partition_parent():
    cid = cells_s2.cell_id(np.array([48.85]), np.array([2.35]), level=10)[0]
    kids = cells_s2.children(cid)
    assert len(set(kids.tolist())) == 4
    assert (cells_s2.cell_level(kids) == 11).all()
    assert (cells_s2.parent(kids, 10) == cid).all()


def test_s2_inverse_center_roundtrip():
    rng = np.random.RandomState(9)
    lats = rng.uniform(-84, 84, 200)
    lons = rng.uniform(-179.9, 179.9, 200)
    for level in (4, 8, 14):
        ids = cells_s2.cell_id(lats, lons, level=level)
        for cid in ids[:50].tolist():
            la, lo = cells_s2.cell_center_latlon(cid)
            assert int(cells_s2.cell_id(np.array([la]), np.array([lo]), level)[0]) == cid


def test_s2_token_roundtrip():
    ids = cells_s2.cell_id(
        np.array([40.71, -33.87, 85.0]), np.array([-74.0, 151.21, 179.9]), level=12
    )
    for cid in ids.tolist():
        assert cells_s2.from_token(cells_s2.token(cid)) == cid


def test_s2_cell_polygon_contains_center():
    cid = int(cells_s2.cell_id(np.array([48.85]), np.array([2.35]), level=9)[0])
    poly = cells_s2.cell_polygon(cid)
    assert poly.shape == (4, 2)
    la, lo = cells_s2.cell_center_latlon(cid)
    from giga_spatial_spark.geometry import point_in_polygon

    assert point_in_polygon(poly, np.array([lo]), np.array([la]))[0]
    # CCW orientation
    area2 = np.sum(
        poly[:, 0] * np.roll(poly[:, 1], -1) - np.roll(poly[:, 0], -1) * poly[:, 1]
    )
    assert area2 > 0


def test_s2_neighbors_symmetric():
    # interior cell and a face-boundary cell (lon 45 sits on a cube edge)
    for lat, lon in ((48.85, 2.35), (10.0, 44.9)):
        cid = int(cells_s2.cell_id(np.array([lat]), np.array([lon]), level=7)[0])
        ns = cells_s2.neighbors(cid)
        assert len(ns) == 4 and cid not in ns.tolist()
        assert (cells_s2.cell_level(ns) == 7).all()
        for nb in ns.tolist():
            assert cid in cells_s2.neighbors(int(nb)).tolist()


def test_s2_locality():
    # nearby points share coarse cells; antipodal points do not
    a = cells_s2.cell_id(np.array([40.0, 40.001]), np.array([-74.0, -74.001]), 8)
    assert a[0] == a[1]
    b = cells_s2.cell_id(np.array([40.0, -40.0]), np.array([-74.0, 106.0]), 8)
    assert b[0] != b[1]


def test_s2_token():
    cid = cells_s2.cell_id(np.array([0.0]), np.array([0.0]), level=12)[0]
    t = cells_s2.token(cid)
    assert 1 <= len(t) <= 16 and int(t.ljust(16, "0"), 16) == np.uint64(cid)


# ------------------------------------------------------------------ geo fns
def test_utm_epsg(spark):
    df = spark.createDataFrame(
        [(2.35, 48.85), (-74.0, 40.7), (151.2, -33.87)], "lon double, lat double"
    )
    got = df.select(utm_epsg_expr(F.col("lon"), F.col("lat")).alias("e")).toPandas()
    assert got["e"].tolist() == [32631, 32618, 32756]


def test_spatial_jitter_only_moves_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 10.0, 20.0), (3, 11.0, 21.0)],
        "id long, lon double, lat double",
    )
    out = add_spatial_jitter(df).orderBy("id").toPandas()
    moved = (out["lon"] != [10.0, 10.0, 11.0]) | (out["lat"] != [20.0, 20.0, 21.0])
    assert moved.sum() == 1  # exactly one of the two duplicates moved
    assert not moved[2]
    # all coordinates distinct afterwards
    assert len(set(zip(out["lon"], out["lat"]))) == 3


def test_polygon_area_m2():
    from giga_spatial_spark.functions.geo import polygon_area_m2

    # 1°×1° box at the equator ≈ 111.195 km × 111.195 km
    box = np.array([[0, -0.5], [1, -0.5], [1, 0.5], [0, 0.5]], dtype=float)
    got = polygon_area_m2(box)
    want = 111_194.9**2
    assert abs(got - want) / want < 1e-4
    # at 60°N the east-west extent halves
    box60 = box + np.array([0.0, 60.0])
    assert abs(polygon_area_m2(box60) - want * math.cos(math.radians(60.0))) / want < 2e-3


def test_simplify_polyline():
    pts = np.array([[0, 0], [1, 0.001], [2, 0], [3, 5], [4, 0]], dtype=float)
    out = simplify_polyline(pts, tolerance=0.01)
    assert [0, 0] in out.tolist() and [3, 5] in out.tolist()
    assert len(out) < len(pts)
    assert len(simplify_polyline(pts, tolerance=100.0)) == 2


# ------------------------------------------------------------------ entity
def test_validate_quarantine(spark):
    df = spark.createDataFrame(
        [
            (1, 10.0, 20.0),
            (2, 200.0, 20.0),   # lon out of range
            (3, 0.0, 0.0),      # null island
            (4, None, 5.0),     # missing
        ],
        "id long, lon double, lat double",
    )
    constraints = standard_point_constraints()
    valid, quarantine = validate(df, constraints)
    assert [r.id for r in valid.orderBy("id").collect()] == [1]
    q = {r.id: r.violations for r in quarantine.collect()}
    assert "lon_range" in q[2]
    assert "not_null_island" in q[3]
    assert "coords_present" in q[4]


def test_entity_id_deterministic(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "name string, v int")
    out1 = with_entity_id(df, ["name", "v"]).toPandas().set_index("name")["entity_id"]
    out2 = with_entity_id(df, ["name", "v"]).toPandas().set_index("name")["entity_id"]
    assert (out1 == out2).all()
    import uuid

    expected = str(uuid.uuid3(uuid.NAMESPACE_DNS, "a|1"))
    assert out1["a"] == expected
