"""Hexagonal grid family: axial arithmetic parity (numpy / native Spark /
DuckDB SQL), hierarchy and ring invariants, polyfill vs brute force —
mirroring the reference's H3 surface (grid/h3.py) per SURVEY.md §2.9."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from giga_spatial_spark import cells_hex as H
from giga_spatial_spark import synth
from giga_spatial_spark.geometry import point_in_polygon

rng = np.random.RandomState(42)
LON = rng.uniform(-179.9, 179.9, 400)
LAT = rng.uniform(-84.0, 84.0, 400)


@pytest.mark.parametrize("res", [0, 3, 7, 12, 15])
def test_threeway_parity(spark, res):
    np_ids = H.cell_id(LON, LAT, res)
    pdf = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(LON, LAT)], "lon double, lat double"
    )
    sp = (
        pdf.select(H.cell_id_col(F.col("lon"), F.col("lat"), res).alias("h"))
        .toPandas()["h"]
        .to_numpy()
    )
    assert np.array_equal(np_ids, sp)
    con = duckdb.connect()
    con.register("pts", __import__("pandas").DataFrame({"lon": LON, "lat": LAT}))
    du = con.execute(
        f"SELECT {H.cell_id_sql('lon', 'lat', res)} AS h FROM pts"
    ).df()["h"].to_numpy()
    assert np.array_equal(np_ids, du)


def test_center_roundtrip():
    for res in [0, 4, 9, 15]:
        ids = H.cell_id(LON, LAT, res)
        lon_c, lat_c = H.cell_center(ids)
        assert np.array_equal(H.cell_id(lon_c, lat_c, res), ids)


def test_containment():
    """Every point is within one circumradius of its cell center."""
    res = 8
    ids = H.cell_id(LON, LAT, res)
    lon_c, lat_c = H.cell_center(ids)
    # transform into the axial frame and bound the hex distance
    d = np.hypot(LON - lon_c, (LAT - lat_c))
    assert (d <= H.hex_size(res) * 1.16).all()  # < s·(2/sqrt(3)) + fp slack


@pytest.mark.parametrize("k", [0, 1, 2, 5])
def test_ring_size(k):
    c = int(H.cell_id(np.array([12.3]), np.array([47.1]), 6)[0])
    ring = H.k_ring(c, k)
    assert len(ring) == 1 + 3 * k * (k + 1)
    assert c in ring.tolist()
    res, q0, r0 = H.unpack(np.array([c]))
    res_r, q, r = H.unpack(ring)
    assert (H.hex_distance(q, r, q0[0], r0[0]) <= k).all()


def test_parent_children_invariants():
    ids = np.unique(H.cell_id(LON, LAT, 7))
    pars = H.parent(ids, 6)
    # parent contains the child's center
    lon_c, lat_c = H.cell_center(ids)
    assert np.array_equal(H.cell_id(lon_c, lat_c, 6), pars)
    # children sets partition: every child's parent is the cell
    for c in np.unique(pars)[:20].tolist():
        kids = H.children(int(c))
        assert len(kids) >= 1
        assert (H.parent(kids, 6) == c).all()
    # disjointness: child lists of distinct parents never overlap
    seen: set[int] = set()
    for c in np.unique(pars)[:20].tolist():
        ks = set(H.children(int(c)).tolist())
        assert not (ks & seen)
        seen |= ks


def test_compact_expand_roundtrip():
    base = int(H.cell_id(np.array([-58.2]), np.array([-12.7]), 4)[0])
    fine = H.expand(np.array([base]), 7)
    assert np.array_equal(H.compact(fine), np.array([base]))
    # dropping one fine cell must prevent full compaction to the root
    partial = H.compact(fine[1:])
    assert base not in partial.tolist()


def test_polyfill_center_mode_vs_bruteforce():
    poly = synth.make_admin_polygons()[2]
    res = 6
    cells = H.polyfill(poly, res)
    lon_c, lat_c = H.cell_center(cells)
    assert point_in_polygon(poly, lon_c, lat_c).all()
    # brute force: every cell whose center is inside appears
    lo = H.cell_id(
        rng.uniform(poly[:, 0].min(), poly[:, 0].max(), 4000),
        rng.uniform(poly[:, 1].min(), poly[:, 1].max(), 4000),
        res,
    )
    cand = np.unique(lo)
    lon_a, lat_a = H.cell_center(cand)
    expected = set(cand[point_in_polygon(poly, lon_a, lat_a)].tolist())
    assert expected <= set(cells.tolist())
    # overlap mode is a superset
    over = H.polyfill(poly, res, mode="overlap")
    assert set(cells.tolist()) <= set(over.tolist())
