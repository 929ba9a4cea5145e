"""Property-based tests (hypothesis) for the pure kernels."""

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from giga_spatial_spark import cells
from giga_spatial_spark.geometry import (
    EARTH_RADIUS_M,
    box_intersection_area,
    clip_polygon_convex,
    convex_contains,
    haversine_np,
    point_in_polygon,
    polygon_area,
)

lat_st = st.floats(min_value=-85.0, max_value=85.0, allow_nan=False)
lon_st = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)


@given(lat_st, lon_st, lat_st, lon_st)
@settings(max_examples=200, deadline=None)
def test_haversine_metric_properties(lat1, lon1, lat2, lon2):
    d = float(haversine_np(lat1, lon1, lat2, lon2))
    assert 0.0 <= d <= math.pi * EARTH_RADIUS_M + 1e-6
    # symmetry
    assert d == float(haversine_np(lat2, lon2, lat1, lon1))
    # identity
    assert float(haversine_np(lat1, lon1, lat1, lon1)) == 0.0


@given(lat_st, lon_st, st.integers(min_value=1, max_value=16))
@settings(max_examples=200, deadline=None)
def test_tile_roundtrip(lat, lon, zoom):
    x, y = cells.tile_xy_np(np.array([lon]), np.array([lat]), zoom)
    min_lon, min_lat, max_lon, max_lat = cells.tile_bounds(int(x[0]), int(y[0]), zoom)
    assert min_lon - 1e-9 <= lon <= max_lon + 1e-9
    # lat clamped into mercator range before assignment
    eff_lat = min(max(lat, -cells.MAX_MERC_LAT), cells.MAX_MERC_LAT)
    assert min_lat - 1e-6 <= eff_lat <= max_lat + 1e-6


@given(st.lists(st.text(alphabet="0123", min_size=1, max_size=6), min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_quadkey_compact_expand_roundtrip(qks):
    zoom = max(len(q) for q in qks)
    expanded = set()
    for q in qks:
        expanded.update(cells.expand_quadkey(q, zoom))
    compacted = cells.compact_quadkeys(expanded)
    re_expanded = set()
    for q in compacted:
        re_expanded.update(cells.expand_quadkey(q, zoom))
    assert re_expanded == expanded
    # compaction is minimal: no complete sibling set remains
    cset = set(compacted)
    for q in compacted:
        if len(q) > 0:
            assert not {q[:-1] + d for d in "0123"} <= cset


@given(
    st.floats(-50, 50), st.floats(-50, 50),
    st.floats(1, 30), st.integers(3, 9),
    st.floats(-80, 80), st.floats(-80, 80),
)
@settings(max_examples=200, deadline=None)
def test_convex_contains_agrees_with_raycast(cx, cy, r, nv, px, py):
    angles = np.sort(np.linspace(0, 2 * math.pi, nv, endpoint=False) + 0.3)
    poly = np.stack([cx + r * np.cos(angles), cy + 0.6 * r * np.sin(angles)], axis=1)
    a = bool(convex_contains(poly, np.array([px]), np.array([py]))[0])
    b = bool(point_in_polygon(poly, np.array([px]), np.array([py]))[0])
    # interior/exterior agree except exactly on the boundary (measure zero)
    edge_dist = min(
        abs((poly[(i + 1) % nv][0] - poly[i][0]) * (py - poly[i][1])
            - (poly[(i + 1) % nv][1] - poly[i][1]) * (px - poly[i][0]))
        for i in range(nv)
    )
    if edge_dist > 1e-9:
        assert a == b


@given(
    st.floats(-10, 10), st.floats(-10, 10), st.floats(0.5, 10), st.floats(0.5, 10),
    st.floats(-10, 10), st.floats(-10, 10), st.floats(0.5, 10), st.floats(0.5, 10),
)
@settings(max_examples=200, deadline=None)
def test_clip_matches_box_formula(ax, ay, aw, ah, bx, by, bw, bh):
    """Sutherland–Hodgman clip of two axis-aligned boxes must equal the
    closed-form box-intersection area."""
    box_a = np.array([[ax, ay], [ax + aw, ay], [ax + aw, ay + ah], [ax, ay + ah]])
    box_b = np.array([[bx, by], [bx + bw, by], [bx + bw, by + bh], [bx, by + bh]])
    inter = clip_polygon_convex(box_a, box_b)
    got = polygon_area(inter) if len(inter) >= 3 else 0.0
    want = float(
        box_intersection_area(
            np.array([ax]), np.array([ay]), np.array([ax + aw]), np.array([ay + ah]),
            np.array([bx]), np.array([by]), np.array([bx + bw]), np.array([by + bh]),
        )[0]
    )
    assert abs(got - want) < 1e-6 * max(1.0, want)


@given(st.integers(3, 8), st.integers(0, 10_000))
@settings(max_examples=40, deadline=None)
def test_box_convex_clip_vectorized_matches_pairwise(k, seed):
    """geometry.box_triangle_areas (vectorized S-H over per-box
    half-planes) must equal the pairwise polygon_intersection_area for
    random convex polygons × random boxes, including touching/degenerate
    configurations."""
    import numpy as np

    from giga_spatial_spark.geometry import (
        box_triangle_areas,
        polygon_intersection_area,
    )

    rng = np.random.RandomState(seed)
    # random CONVEX polygon (the kernel's contract): points on a randomly
    # stretched/rotated ellipse at sorted angles. Non-convex subjects can
    # gain more than one vertex per half-plane clip and overflow the
    # fixed vertex buffer — production call sites triangulate first.
    ang = np.sort(rng.uniform(0, 2 * np.pi, k + 4))
    a_, b_ = rng.uniform(2, 10, 2)
    th = rng.uniform(0, np.pi)
    ex = a_ * np.cos(ang)
    ey = b_ * np.sin(ang)
    hull = np.column_stack(
        [ex * np.cos(th) - ey * np.sin(th), ex * np.sin(th) + ey * np.cos(th)]
    )
    n = 40
    bx1 = rng.uniform(-14, 9, n)
    by1 = rng.uniform(-14, 9, n)
    bx2 = bx1 + rng.uniform(0.0, 9, n)  # includes zero-width boxes
    by2 = by1 + rng.uniform(0.0, 9, n)
    got = box_triangle_areas(hull, bx1, by1, bx2, by2)
    for i in range(n):
        box = np.array(
            [[bx1[i], by1[i]], [bx2[i], by1[i]], [bx2[i], by2[i]], [bx1[i], by2[i]]]
        )
        want = polygon_intersection_area(box, hull)
        assert abs(got[i] - want) < 1e-8, (i, got[i], want)
