"""Geodesic H3 (cells_h3) — structural invariants fixed by the PUBLIC H3
spec, doc-example bit-exactness, and exhaustive round-trips.

Reference behavior: gigaspatial/grid/h3.py:347-369 (latlng_to_cell),
:257-273 (res stats) — the reference delegates to the h3 library; this
repo implements the published spec itself (no h3 in this container)."""

import math

import numpy as np
import pytest

from giga_spatial_spark import cells_h3 as h3


def _res0_cells():
    return np.array(
        [
            h3._pack_index(0, np.array([b]), np.zeros((1, 0), np.int64))[0]
            for b in range(122)
        ],
        dtype=np.int64,
    )


def test_doc_example_bit_exact():
    """The canonical published example: (37.7752702151959257,
    -122.418307270836983) at res 9 is cell 8928308280fffff, center
    (37.77670234943567, -122.41845932318311)."""
    cell = h3.latlng_to_cell(37.7752702151959257, -122.418307270836983, 9)
    assert format(int(cell) & 0xFFFFFFFFFFFFFFFF, "x") == "8928308280fffff"
    la, ln = h3.cell_to_latlng(np.array([int(cell)], dtype=np.int64))
    assert abs(la[0] - 37.77670234943567) < 1e-10
    assert abs(ln[0] - (-122.41845932318311)) < 1e-10


def test_cell_counts_and_pentagons():
    """Published spec: 122 res-0 cells (110 hex + 12 pentagons); every
    finer res has 12 pentagons and count 2 + 120·7^res."""
    cells = {0: _res0_cells()}
    for r in (1, 2):
        cells[r] = np.concatenate(
            [h3.cell_to_children(int(c), r) for c in cells[r - 1]]
        )
    for r, want in [(0, 122), (1, 842), (2, 5882)]:
        u = np.unique(cells[r])
        assert len(u) == want == len(cells[r])
        assert int(h3.is_pentagon(u).sum()) == 12


def test_round_trip_exhaustive_res0_to_3():
    """center → re-index is the identity for EVERY cell at res 0..3
    (pins the base-cell table, slot calibration, rotations, pentagon
    handling, and the cross-face overage isometries)."""
    cells = _res0_cells()
    for r in range(4):
        if r > 0:
            cells = np.concatenate(
                [h3.cell_to_children(int(c), r) for c in cells]
            )
        la, ln = h3.cell_to_latlng(cells)
        back = h3.latlng_to_cell(la, ln, r)
        assert int((back != cells).sum()) == 0, f"res {r}"


def test_round_trip_sampled_high_res():
    rng = np.random.RandomState(11)
    for res in (5, 9, 15):
        lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 5000)))
        lng = rng.uniform(-180, 180, 5000)
        c = h3.latlng_to_cell(lat, lng, res)
        la, ln = h3.cell_to_latlng(c)
        assert int((h3.latlng_to_cell(la, ln, res) != c).sum()) == 0


def test_pentagon_descendants_round_trip():
    pents = _res0_cells()[h3.is_pentagon(_res0_cells())]
    desc = pents
    for r in range(1, 4):
        desc = np.concatenate([h3.cell_to_children(int(c), r) for c in desc])
    la, ln = h3.cell_to_latlng(desc)
    assert int((h3.latlng_to_cell(la, ln, 3) != desc).sum()) == 0


def test_published_area_stats():
    """Exact spherical partition (areas sum to the sphere) and the
    published average-hexagon-area table: res 0, 1 AND 2 match to the
    table's full precision. Res 1 required the native-face kink fix
    (round 6): segments between two non-home faces get their distortion
    vertex in the first corner's face plane via the fb→fa lattice
    isometry — the home-plane chord was cutting ~2e4 km² per pentagon."""
    res0 = _res0_cells()
    cells1 = np.concatenate([h3.cell_to_children(int(c), 1) for c in res0])
    sphere = 4 * math.pi * h3.EARTH_RADIUS_KM ** 2
    a0 = h3.cell_area_km2(res0)
    a1 = h3.cell_area_km2(cells1)
    assert abs(a0.sum() / sphere - 1) < 1e-9
    assert abs(a1.sum() / sphere - 1) < 1e-9
    assert abs(a0[~h3.is_pentagon(res0)].mean() - 4357449.416078381) < 1e-3
    assert abs(a1[~h3.is_pentagon(cells1)].mean() / 609788.441794133 - 1) < 1e-9


def test_res1_boundary_probe_exact():
    """Every res-1 boundary polyline agrees with the (independently
    exact) assignment function: points nudged just inside/outside each
    boundary segment classify to the cell / a neighbor respectively —
    the probe that located the pre-fix pentagon kink deficit, now clean
    on the 48 previously-failing giant cells."""
    res0 = _res0_cells()
    cells1 = np.concatenate([h3.cell_to_children(int(c), 1) for c in res0])
    # the 12 pentagons + their 36 kink-side neighbors were the failures;
    # probing every 5th cell plus all pentagons keeps runtime modest
    sel = list(cells1[h3.is_pentagon(cells1)].tolist()) + list(
        cells1[::5].tolist()
    )
    for c in sel:
        b = h3.cell_to_boundary(int(c))
        n = len(b)
        clat, clng = h3.cell_to_latlng(np.array([c], dtype=np.int64))
        cvec = h3._geo_to_vec(np.radians(clat), np.radians(clng))[0]
        vec = h3._geo_to_vec(np.radians(b[:, 0]), np.radians(b[:, 1]))
        for i in range(n):
            a, d = vec[i], vec[(i + 1) % n]
            for t in (0.1, 0.5, 0.9):
                p = a * (1 - t) + d * t
                p /= np.linalg.norm(p)
                for sgn, exp_in in ((+1, True), (-1, False)):
                    q = p + sgn * 2e-6 * (cvec - p)
                    q /= np.linalg.norm(q)
                    la = math.degrees(math.asin(max(-1, min(1, q[2]))))
                    ln = math.degrees(math.atan2(q[1], q[0]))
                    got = int(h3.latlng_to_cell(la, ln, 1))
                    assert (got == c) == exp_in, (hex(c), i, t, sgn)


def test_parent_child_coherence():
    rng = np.random.RandomState(5)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 2000)))
    lng = rng.uniform(-180, 180, 2000)
    c9 = h3.latlng_to_cell(lat, lng, 9)
    c5 = h3.cell_to_parent(c9, 5)
    # digit-prefix parents agree with direct indexing for the overwhelming
    # majority of points (exact equality is NOT an H3 invariant — children
    # don't perfectly tile the parent hexagon — but <2% stray at res gap 4)
    direct5 = h3.latlng_to_cell(lat, lng, 5)
    assert (direct5 == c5).mean() > 0.9
    # parent of children round-trips exactly
    for c in np.unique(c5)[:20]:
        kids = h3.cell_to_children(int(c), 7)
        assert np.all(h3.cell_to_parent(kids, 5) == c)
        assert len(kids) == (41 if h3.is_pentagon(np.array([c]))[0] else 49)


def test_grid_disk_sizes_and_membership():
    c = int(h3.latlng_to_cell(37.77, -122.41, 7))
    for k in (1, 2, 3):
        d = h3.grid_disk(c, k)
        assert len(d) == 1 + 3 * k * (k + 1)
        assert c in d
    # disk-1 members are mutual neighbors: each neighbor's disk-1 contains c
    for n in h3.grid_disk(c, 1):
        assert c in h3.grid_disk(int(n), 1)


def test_string_round_trip_and_res():
    c = h3.latlng_to_cell(48.86, 2.35, 11)
    s = h3.h3_to_string(np.array([c]))[0]
    assert h3.string_to_h3([s])[0] == c
    assert int(h3.get_resolution(np.array([c]))[0]) == 11


def test_polyfill_center_semantics():
    poly = np.array([[10.0, 45.0], [12.0, 45.0], [12.0, 47.0], [10.0, 47.0]])
    cells = h3.polyfill(poly, 5, mode="center")
    assert len(cells) > 10
    la, ln = h3.cell_to_latlng(cells)
    assert (la >= 45).all() and (la <= 47).all()
    assert (ln >= 10).all() and (ln <= 12).all()
    # every cell center strictly classified: re-index stays in the set
    assert set(h3.latlng_to_cell(la, ln, 5).tolist()) == set(cells.tolist())


def test_slot_calibration_complete():
    bc_lut, rot_lut = h3._slot_tables()
    assert (bc_lut >= 0).all() and (bc_lut < 122).all()
    assert (rot_lut >= 0).all() and (rot_lut < 6).all()


def test_slot_table_cache_integrity_probe():
    """A tampered cached slot table (right shape/ranges, wrong content)
    fails _luts_sane's known-value probe, so a pre-seeded or stale cache
    file cannot yield wrong cell ids; the genuine tables pass and state
    recovers for subsequent calls."""
    bc_lut, rot_lut = h3._slot_tables()
    assert h3._luts_sane(bc_lut.copy(), rot_lut.copy())
    bad = bc_lut.copy()
    bad[bad >= 0] = (bad[bad >= 0] + 1) % 122
    assert not h3._luts_sane(bad, rot_lut.copy())
    assert not h3._luts_sane(bc_lut[:10].copy(), rot_lut[:10].copy())
    h = h3.latlng_to_cell(
        np.array([37.7752702151959]), np.array([-122.4183072708370]), 9
    )
    assert int(h[0]) == 0x8928308280FFFFF


def test_boundary_closed_and_pentagon_corners():
    c = int(h3.latlng_to_cell(37.77, -122.41, 6))
    b = h3.cell_to_boundary(c)
    assert len(b) >= 6
    pents = _res0_cells()[h3.is_pentagon(_res0_cells())]
    bp = h3.cell_to_boundary(int(pents[0]))
    assert len(bp) == 5


def test_sql_twins_match_kernels():
    """The DuckDB SQL replays (functions/h3_sql) must reproduce the numpy
    kernels: forward ids exactly, centers to trig-ulp, local IJK exactly."""
    import duckdb
    import pandas as pd

    from giga_spatial_spark.functions import h3_sql

    rng = np.random.RandomState(123)
    n = 20000
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, n)))
    lng = rng.uniform(-180, 180, n)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"id": np.arange(n), "lon": lng, "lat": lat}))
    for res in (1, 5, 8):
        want = h3.latlng_to_cell(lat, lng, res)
        got = con.execute(
            h3_sql.h3_cell_sql("SELECT * FROM pts", res) + " ORDER BY id"
        ).fetchdf()["h3_cell"].to_numpy()
        assert int((got != want).sum()) == 0, f"forward res {res}"
        u = np.unique(want)
        con.register("cells", pd.DataFrame({"h3_cell": u}))
        ctr = con.execute(
            h3_sql.h3_center_sql("SELECT * FROM cells", res)
            + " ORDER BY h3_cell"
        ).fetchdf()
        wla, wln = h3.cell_to_latlng(u)
        o = np.argsort(u)
        assert np.abs(ctr["clat"].to_numpy() - wla[o]).max() < 1e-10
        assert np.abs(ctr["clng"].to_numpy() - wln[o]).max() < 1e-10
        loc = con.execute(
            h3_sql.h3_local_ijk_sql("SELECT * FROM cells", res)
            + " ORDER BY h3_cell"
        ).fetchdf()[["li", "lj", "lk"]].to_numpy()
        assert (loc == h3.local_ijk(u)[o]).all(), f"local ijk res {res}"
    con.close()


def test_compact_uncompact_round_trip():
    c = int(h3.latlng_to_cell(20.0, 15.0, 3))
    kids = h3.cell_to_children(c, 6)
    comp = h3.compact(kids)
    assert len(comp) == 1 and int(comp[0]) == c
    back = h3.uncompact(comp, 6)
    assert set(back.tolist()) == set(kids.tolist())
    # partial set stays partial
    partial = kids[:-1]
    comp2 = h3.compact(partial)
    assert len(comp2) > 1
    assert set(h3.uncompact(comp2, 6).tolist()) == set(partial.tolist())
    # pentagon spine compacts with 6 children
    pent = _res0_cells()[h3.is_pentagon(_res0_cells())][0]
    pk = h3.cell_to_children(int(pent), 2)
    assert len(h3.compact(pk)) == 1


def test_polyfill_modes_nest():
    poly = np.array([[10.0, 45.0], [16.0, 45.0], [16.0, 50.0], [10.0, 50.0]])
    full = set(h3.polyfill(poly, 4, mode="full").tolist())
    center = set(h3.polyfill(poly, 4, mode="center").tolist())
    overlap = set(h3.polyfill(poly, 4, mode="overlap").tolist())
    bbox = set(h3.polyfill(poly, 4, mode="bbox_overlap").tolist())
    assert full <= center <= overlap <= bbox
    assert len(full) > 0 and len(overlap) > len(center)


def test_fast_projection_equals_trig_formulation():
    """The tangent-plane fast path (no per-point tan/acos/atan2) must be
    the published trig formulation to float precision: same faces, hex
    coords to 1e-12 relative, and identical cell ids on the synthetic
    corpus key domain."""
    rng = np.random.RandomState(2)
    lat = np.arcsin(rng.uniform(-1, 1, 50000))
    lng = rng.uniform(-np.pi, np.pi, 50000)
    for res in (0, 1, 9):
        f1, x1, y1 = h3._geo_to_hex2d_tangent(lat, lng, res)
        f2, x2, y2 = h3._geo_to_hex2d(lat, lng, res)
        assert (f1 == f2).all()
        scale = max(float(np.abs(x2).max()), 1.0)
        assert np.abs(x1 - x2).max() / scale < 1e-11
        assert np.abs(y1 - y2).max() / scale < 1e-11
    from giga_spatial_spark import synth

    keys = np.arange(0, 60000)
    lo, la = synth.lon_np(keys), synth.lat_np(keys)
    fast = h3.latlng_to_cell(la, lo, 6)
    orig = h3._geo_to_hex2d
    try:
        h3._geo_to_hex2d = h3._geo_to_hex2d_tangent
        tangent = h3.latlng_to_cell(la, lo, 6)
    finally:
        h3._geo_to_hex2d = orig
    assert int((fast != tangent).sum()) == 0


def test_grid_disk_exact_at_every_res():
    """BFS disk over exact edge-midpoint neighbors: disk-3 has exactly
    37 cells wherever no pentagon is within reach, at coarse AND fine
    res (the one-shot lattice stepping this replaced drifted at res ≤ 4
    near face edges); pentagons have exactly 5 neighbors."""
    rng = np.random.RandomState(78)
    lat = np.degrees(np.arcsin(rng.uniform(-1, 1, 400)))
    lng = rng.uniform(-180, 180, 400)
    for res in (2, 4, 8):
        cells = np.unique(h3.latlng_to_cell(lat, lng, res))[:60]
        for c in cells:
            d3 = h3.grid_disk(int(c), 3)
            if h3.is_pentagon(d3).any():
                continue
            assert len(d3) == 37, f"res {res}"
    pents = _res0_cells()[h3.is_pentagon(_res0_cells())]
    assert len(h3.grid_neighbors(int(pents[0]))) == 5


def test_polyfill_antimeridian():
    """A Fiji-style ±180-crossing polygon polyfills correctly: every
    returned center is inside the (unwrapped) ring, and both hemispheres
    contribute cells."""
    poly = np.array([[176.0, -20.0], [-176.0, -20.0], [-176.0, -14.0],
                     [176.0, -14.0]])
    cells = h3.polyfill(poly, 4, mode="center")
    assert len(cells) > 10
    la, ln = h3.cell_to_latlng(cells)
    assert ((ln >= 176.0) | (ln <= -176.0)).all()
    assert (ln > 0).any() and (ln < 0).any()
    assert (la >= -20.0).all() and (la <= -14.0).all()


def test_distributed_compact_uncompact_parity(spark):
    """compact_cells_df / uncompact_cells_df (the native-bit-math scale
    path) agree exactly with the driver-side compact/uncompact on a set
    mixing a fully-collapsible two-level subtree, a pentagon spine, and
    scattered leaves."""
    from pyspark.sql import functions as F

    hexc = int(h3.latlng_to_cell(20.0, 15.0, 2))
    pent = int(_res0_cells()[h3.is_pentagon(_res0_cells())][1])
    pent2 = int(h3.cell_to_children(pent, 2)[0])  # res-2 pentagon
    rng = np.random.RandomState(5)
    scatter = h3.latlng_to_cell(
        np.degrees(np.arcsin(rng.uniform(-1, 1, 200))),
        rng.uniform(-180, 180, 200),
        4,
    )
    cells = np.unique(
        np.concatenate(
            [
                h3.cell_to_children(hexc, 4),      # collapses 2 levels
                h3.cell_to_children(pent2, 4),     # pentagon completeness
                h3.cell_to_children(hexc, 4)[:-1], # dup + partials
                scatter,
            ]
        )
    )
    want = set(h3.compact(cells).tolist())
    df = spark.createDataFrame([(int(c),) for c in cells], "h3_cell long")
    got = {
        r["h3_cell"]
        for r in h3.compact_cells_df(df, res=4).collect()
    }
    assert got == want
    # auto-detected res matches the explicit one
    got2 = {r["h3_cell"] for r in h3.compact_cells_df(df).collect()}
    assert got2 == want
    # round-trip back to uniform res 4 recovers the input set exactly
    comp_df = spark.createDataFrame([(int(c),) for c in sorted(want)], "h3_cell long")
    back = {r["h3_cell"] for r in h3.uncompact_cells_df(comp_df, 4).collect()}
    assert back == set(cells.tolist())
    # pentagon child counts survive the native path: the res-2 pentagon
    # expands to 6 children, not 7
    pdf = spark.createDataFrame([(pent2,)], "h3_cell long")
    kids = [r["h3_cell"] for r in h3.uncompact_cells_df(pdf, 3).collect()]
    assert len(kids) == 6 and sorted(kids) == sorted(
        h3.cell_to_children(pent2, 3).tolist()
    )


def test_polyfill_overlap_exact_slivers():
    """Thin slivers crossing mid-cell at several orientations: the
    segment-intersection term of cell_overlaps_polygon is load-bearing
    (the sliver contains no cell vertex or center, and no sliver vertex
    is in the cell), and the BFS result equals a brute-force disk sweep
    of the exact predicate."""
    from giga_spatial_spark.geometry import point_in_polygon

    c0 = int(h3.latlng_to_cell(46.2, 8.7, 6))
    clat, clng = (float(v[0]) for v in h3.cell_to_latlng(np.array([c0])))
    b = h3.cell_to_boundary(c0)
    r = float(np.hypot(b[:, 1] - clng, b[:, 0] - clat).max())  # circumradius°
    seg_only_hits = 0
    for theta in (0.0, 0.5, 1.3, 2.1):
        ux, uy = np.cos(theta), np.sin(theta)
        # offset perpendicular so the sliver misses the cell center
        ox, oy = clng - 0.35 * r * uy, clat + 0.35 * r * ux
        L, wdt = 4.0 * r, r / 80.0
        sliver = np.array(
            [
                [ox - L * ux - wdt * uy, oy - L * uy + wdt * ux],
                [ox + L * ux - wdt * uy, oy + L * uy + wdt * ux],
                [ox + L * ux + wdt * uy, oy + L * uy - wdt * ux],
                [ox - L * ux + wdt * uy, oy - L * uy - wdt * ux],
            ]
        )
        got = set(h3.polyfill(sliver, 6, mode="overlap").tolist())
        assert c0 in got, theta
        # brute force: exact predicate over a generous disk around c0
        disk = set(h3.grid_disk(c0, 6).tolist())
        brute = set()
        for c in disk:
            bb = h3.cell_to_boundary(int(c))
            xy = np.stack([bb[:, 1], bb[:, 0]], axis=1)
            la, ln = h3.cell_to_latlng(np.array([c], dtype=np.int64))
            cin = bool(point_in_polygon(sliver, ln, la)[0])
            if h3.cell_overlaps_polygon(xy, cin, sliver):
                brute.add(int(c))
        # within the disk (the sliver extends past it) BFS == brute force
        assert got & disk == brute
        # was the old vertex-only predicate sufficient for c0?
        xy0 = np.stack([b[:, 1], b[:, 0]], axis=1)
        old_style = (
            bool(point_in_polygon(sliver, np.array([clng]), np.array([clat]))[0])
            or point_in_polygon(sliver, xy0[:, 0], xy0[:, 1]).any()
            or point_in_polygon(xy0, sliver[:, 0], sliver[:, 1]).any()
        )
        if not old_style:
            seg_only_hits += 1
    assert seg_only_hits >= 2  # several orientations rely on seg-crossing


def test_polyfill_bfs_bounded_and_guard():
    """Driver cost is bounded by the COVER, not the bbox: a long thin
    diagonal strip (huge bbox, small cover) fills fine at a res where
    the old bbox lattice would allocate ~1e8 points; and max_cells
    raises the documented guidance."""
    import pytest as _p

    strip = np.array(
        [[0.0, 0.0], [30.0, 29.9], [30.0, 30.1], [0.05, 0.2]]
    )
    cells = h3.polyfill(strip, 4, mode="overlap")
    assert 100 < len(cells) < 20000  # cover-sized, not bbox-sized
    with _p.raises(ValueError, match="coarser resolution"):
        h3.polyfill(strip, 6, max_cells=200, mode="overlap")


def test_polyfill_df_matches_driver(spark):
    """The distributed polyfill (spark.range lattice → Arrow H3 assign →
    per-cell exact classify) returns exactly the driver BFS fill's cell
    set for every mode, on the convex quad, the thin-notched comb and
    the mid-cell sliver from the oracle suite."""
    import __spark_entry__ as E

    for pid, poly in E.POLYFILL_POLYS:
        arr = np.asarray(poly, dtype=np.float64)
        for mode in ("center", "overlap", "full"):
            want = set(h3.polyfill(arr, E.PF_RES, mode=mode).tolist())
            got = {
                r["h3_cell"]
                for r in h3.polyfill_df(spark, arr, E.PF_RES, mode=mode).collect()
            }
            assert got == want, (pid, mode)


def test_polyfill_full_mode_exact_containment():
    """'full' rejects cells a reflex notch dips into even when every
    cell vertex is inside the polygon — referee: dense interior sampling
    of each candidate cell (a fully-contained cell has ALL its interior
    points inside the polygon)."""
    from giga_spatial_spark.geometry import point_in_polygon

    # comb with thin V notches (the oracle-suite shape)
    comb = np.array(
        [[20.0, 50.0], [23.0, 50.0], [23.0, 52.0], [22.4, 50.6],
         [21.8, 52.0], [21.2, 50.6], [20.6, 52.0], [20.0, 52.0]]
    )
    for res in (5, 6):
        full = set(h3.polyfill(comb, res, mode="full").tolist())
        center = set(h3.polyfill(comb, res, mode="center").tolist())
        assert full <= center
        # referee every center-mode cell by dense sampling
        for c in center:
            b = h3.cell_to_boundary(int(c))
            la, ln = h3.cell_to_latlng(np.array([c], dtype=np.int64))
            # sample on shrunk rings toward the center (interior points)
            ok = True
            for f in (0.25, 0.6, 0.9, 0.99):
                sx = ln[0] + f * (b[:, 1] - ln[0])
                sy = la[0] + f * (b[:, 0] - la[0])
                if not point_in_polygon(comb, sx, sy).all():
                    ok = False
                    break
            if not ok:
                assert c not in full, (res, hex(c))
        # and the exact-full set must be non-trivial at res 6
        if res == 6:
            assert len(full) > 5
    # the vertices-only approximation would over-accept: prove at least
    # one center cell with ALL vertices inside is rejected by exact full
    over_accepted = 0
    for res in (5, 6):
        center = h3.polyfill(comb, res, mode="center")
        full = set(h3.polyfill(comb, res, mode="full").tolist())
        for c in center.tolist():
            b = h3.cell_to_boundary(int(c))
            la, ln = h3.cell_to_latlng(np.array([c], dtype=np.int64))
            cin = bool(point_in_polygon(comb, ln, la)[0])
            verts_ok = point_in_polygon(comb, b[:, 1], b[:, 0]).all()
            if cin and verts_ok and c not in full:
                over_accepted += 1
    assert over_accepted >= 1


def test_polyfill_property_sweep():
    """Seeded sweep over random simple polygons (radial stars and rotated
    rectangles, anywhere on the globe incl. face-edge straddles): mode
    nesting full <= center <= overlap <= bbox_overlap, every center-mode
    cell re-verified by ray cast, and BFS overlap == brute-force exact
    predicate over a covering grid disk."""
    import math as _m

    from giga_spatial_spark.geometry import point_in_polygon

    rng = np.random.RandomState(42)
    res = 4
    hex_deg = _m.degrees(h3.RES0_U_GNOMONIC / (h3.M_SQRT7 ** res))
    for trial in range(12):
        cx = float(rng.uniform(-150, 150))
        cy = float(rng.uniform(-55, 55))
        if trial % 2 == 0:  # radial star (simple by construction)
            nv = rng.randint(5, 11)
            ang = np.sort(rng.uniform(0, 2 * np.pi, nv))
            rad = rng.uniform(0.3, 1.4, nv)
            poly = np.stack(
                [cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1
            )
        else:  # rotated rectangle
            th = float(rng.uniform(0, np.pi))
            a, b = float(rng.uniform(0.4, 1.4)), float(rng.uniform(0.1, 0.8))
            u = np.array([np.cos(th), np.sin(th)])
            v = np.array([-np.sin(th), np.cos(th)])
            c = np.array([cx, cy])
            poly = np.stack(
                [c + a * u + b * v, c - a * u + b * v,
                 c - a * u - b * v, c + a * u - b * v]
            )
        full = set(h3.polyfill(poly, res, mode="full").tolist())
        center = set(h3.polyfill(poly, res, mode="center").tolist())
        overlap = set(h3.polyfill(poly, res, mode="overlap").tolist())
        bbox = set(h3.polyfill(poly, res, mode="bbox_overlap").tolist())
        assert full <= center <= overlap <= bbox, trial
        if center:
            la, ln = h3.cell_to_latlng(
                np.fromiter(center, dtype=np.int64, count=len(center))
            )
            assert point_in_polygon(poly, ln, la).all(), trial
        # brute force: exact predicate over a disk that covers the poly
        c0 = int(h3.latlng_to_cell(cy, cx, res))
        span = float(
            np.hypot(poly[:, 0] - cx, poly[:, 1] - cy).max()
        )
        k = int(np.ceil(span / hex_deg)) + 3
        disk = h3.grid_disk(c0, k)
        brute = set()
        for cc in disk.tolist():
            bb = h3.cell_to_boundary(int(cc))
            xy = np.stack([bb[:, 1], bb[:, 0]], axis=1)
            la2, ln2 = h3.cell_to_latlng(np.array([cc], dtype=np.int64))
            cin = bool(point_in_polygon(poly, ln2, la2)[0])
            if h3.cell_overlaps_polygon(xy, cin, poly):
                brute.add(int(cc))
        assert overlap == brute, trial


def test_vectorized_segment_sweep_matches_scalar():
    """_any_segments_cross (broadcast) == pairwise segments_cross
    (scalar) on 300 random edge-ring pairs incl. collinear touches."""
    rng = np.random.RandomState(17)
    for trial in range(300):
        n, m = rng.randint(3, 7), rng.randint(3, 9)
        P = rng.uniform(-2, 2, (n, 2))
        Q = rng.uniform(-2, 2, (m, 2))
        if trial % 5 == 0:  # force collinear/touching configurations
            Q[0] = P[0]
            Q[1 % m] = (P[0] + P[1]) / 2.0
        want = any(
            h3.segments_cross(P[i], P[(i + 1) % n], Q[j], Q[(j + 1) % m])
            for i in range(n)
            for j in range(m)
        )
        assert h3._any_segments_cross(P, Q) == want, trial


def test_polyfill_over_pentagon_region():
    """Polyfill across an icosahedron vertex: a box around a res-3
    pentagon's center must include the pentagon cell in center mode,
    keep mode nesting, and match the brute-force disk predicate —
    pentagon boundaries (5 corners + distortion vertices) flow through
    the same exact overlap machinery."""
    from giga_spatial_spark.geometry import point_in_polygon

    res = 3
    pents0 = _res0_cells()[h3.is_pentagon(_res0_cells())]
    # central res-3 descendant of a pentagon base cell is a pentagon
    p3 = pents0[3]
    for r in range(1, res + 1):
        kids = h3.cell_to_children(int(p3), r)
        p3 = kids[h3.is_pentagon(kids)][0]
    la, ln = h3.cell_to_latlng(np.array([int(p3)], dtype=np.int64))
    cy, cx = float(la[0]), float(ln[0])
    poly = np.array(
        [[cx - 2.2, cy - 1.9], [cx + 2.4, cy - 2.1],
         [cx + 2.1, cy + 2.3], [cx - 2.0, cy + 2.0]]
    )
    center = set(h3.polyfill(poly, res, mode="center").tolist())
    overlap = set(h3.polyfill(poly, res, mode="overlap").tolist())
    full = set(h3.polyfill(poly, res, mode="full").tolist())
    assert int(p3) in center and int(p3) in overlap
    assert full <= center <= overlap
    # brute force over a disk centered at the pentagon
    brute = set()
    for cc in h3.grid_disk(int(p3), 9).tolist():
        bb = h3.cell_to_boundary(int(cc))
        xy = np.stack([bb[:, 1], bb[:, 0]], axis=1)
        la2, ln2 = h3.cell_to_latlng(np.array([cc], dtype=np.int64))
        cin = bool(point_in_polygon(poly, ln2, la2)[0])
        if h3.cell_overlaps_polygon(xy, cin, poly):
            brute.add(int(cc))
    disk = set(h3.grid_disk(int(p3), 9).tolist())
    assert overlap & disk == brute


def test_polyfill_antimeridian_overlap_and_df(spark):
    """±180-crossing ring: overlap mode admits both-hemisphere cells and
    nests over center; polyfill_df agrees with the driver BFS in both
    modes across the wrap."""
    poly = np.array([[176.0, -20.0], [-176.0, -20.0], [-176.0, -14.0],
                     [176.0, -14.0]])
    center = set(h3.polyfill(poly, 4, mode="center").tolist())
    overlap = set(h3.polyfill(poly, 4, mode="overlap").tolist())
    assert center <= overlap and len(overlap) > len(center)
    la, ln = h3.cell_to_latlng(
        np.fromiter(overlap, dtype=np.int64, count=len(overlap))
    )
    assert (ln > 0).any() and (ln < 0).any()  # both hemispheres
    for mode in ("center", "overlap"):
        got = {
            r["h3_cell"]
            for r in h3.polyfill_df(spark, poly, 4, mode=mode).collect()
        }
        want = set(h3.polyfill(poly, 4, mode=mode).tolist())
        assert got == want, mode
