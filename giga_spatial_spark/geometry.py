"""Pure-numpy geometry kernels.

The reference delegates geometry to shapely 2.x C kernels
(gigaspatial/processing/geo.py, buildings_engine.py). This container has no
shapely, so the engine implements the needed subset from scratch, fully
vectorized with numpy so it runs efficiently inside Arrow-batched pandas
UDFs (the Spark-side hot path).

Conventions:
  - polygons are (N,2) float64 arrays of (lon, lat) vertices, CCW, not
    closed (first vertex not repeated).
  - "contains" for convex polygons = all edge cross-products >= 0
    (boundary-inclusive). This exact rule is also emitted as ANSI SQL by
    synth.convex_contains_sql so DuckDB oracles match bit-for-bit.
  - haversine matches the reference formula exactly:
    gigaspatial/processing/geo.py:561-581 (R=6371e3, 2*R*asin(sqrt(a))).
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6371e3


def haversine_np(lat1, lon1, lat2, lon2, R: float = EARTH_RADIUS_M):
    """Vectorized haversine distance in meters.

    Formula parity with reference calculate_distance (geo.py:561-581).
    """
    lat1 = np.radians(np.asarray(lat1, dtype=np.float64))
    lon1 = np.radians(np.asarray(lon1, dtype=np.float64))
    lat2 = np.radians(np.asarray(lat2, dtype=np.float64))
    lon2 = np.radians(np.asarray(lon2, dtype=np.float64))
    dlat = lat2 - lat1
    dlon = lon2 - lon1
    a = np.sin(dlat / 2) ** 2 + np.cos(lat1) * np.cos(lat2) * np.sin(dlon / 2) ** 2
    return R * (2 * np.arcsin(np.sqrt(a)))


def ensure_ccw(poly: np.ndarray) -> np.ndarray:
    """Return the ring oriented counter-clockwise (identity when already
    CCW). Convex primitives (edge-sign tests, cover SAT) assume CCW, but
    the engine's storage convention winds outer rings CW (winding.py), so
    every convex kernel normalizes at entry rather than trusting callers."""
    x, y = poly[:, 0], poly[:, 1]
    area2 = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return poly[::-1] if area2 < 0 else poly


def convex_contains(poly: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Boundary-inclusive containment of points in a convex polygon (either
    winding — normalized to CCW at entry).

    Point p is inside iff for every directed edge (v_i -> v_{i+1}):
      cross(v_{i+1}-v_i, p-v_i) >= 0.
    Vectorized over points; loops over the (few) edges.
    """
    poly = ensure_ccw(poly)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    inside = np.ones(x.shape, dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        cross = (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1)
        inside &= cross >= 0.0
    return inside


def point_in_polygon(poly: np.ndarray, x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """General simple-polygon containment via even-odd ray casting.

    Equivalent output to shapely `contains` for points strictly inside /
    outside (boundary points are implementation-defined, as in the
    reference's sjoin predicate paths). Vectorized over points.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    n = len(poly)
    px, py = poly[:, 0], poly[:, 1]
    if n > 16 and x.size * n <= 20_000_000:
        # many-edge ring, modest point count: one broadcast pass over
        # the full point×edge grid (identical elementwise arithmetic to
        # the loop below — crossing-count parity == xor accumulation);
        # a 1200-edge country outline probed per cell would otherwise
        # spin 1200 python iterations per call
        X, Y = x.ravel()[None, :], y.ravel()[None, :]
        x1, y1 = px[:, None], py[:, None]
        x2 = np.roll(px, -1)[:, None]
        y2 = np.roll(py, -1)[:, None]
        crosses = ((y1 > Y) != (y2 > Y)) & (
            X
            < (x2 - x1) * (Y - y1)
            / (y2 - y1 + np.where(y2 == y1, 1e-300, 0.0))
            + x1
        )
        return (crosses.sum(axis=0) % 2 == 1).reshape(x.shape)
    inside = np.zeros(x.shape, dtype=bool)
    for i in range(n):
        x1, y1 = px[i], py[i]
        x2, y2 = px[(i + 1) % n], py[(i + 1) % n]
        crosses = ((y1 > y) != (y2 > y)) & (
            x < (x2 - x1) * (y - y1) / (y2 - y1 + np.where(y2 == y1, 1e-300, 0.0)) + x1
        )
        inside ^= crosses
    return inside


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area (planar, in the polygon's coordinate units²)."""
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * float(np.abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))))


def polygon_centroid(poly: np.ndarray) -> tuple[float, float]:
    """Planar area-weighted centroid (matches shapely .centroid for simple
    polygons; reference uses it for the admin tie-break, geo.py:848-866)."""
    x, y = poly[:, 0], poly[:, 1]
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a = cross.sum() / 2.0
    if a == 0:
        return float(x.mean()), float(y.mean())
    cx = ((x + xn) * cross).sum() / (6.0 * a)
    cy = ((y + yn) * cross).sum() / (6.0 * a)
    return float(cx), float(cy)


def polygon_bbox(poly: np.ndarray) -> tuple[float, float, float, float]:
    return (
        float(poly[:, 0].min()),
        float(poly[:, 1].min()),
        float(poly[:, 0].max()),
        float(poly[:, 1].max()),
    )


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of `subject` polygon by CCW convex `clip`.

    Returns the (possibly empty) intersection polygon. Used by the
    fractional-overlay operator (reference _fractional_aggregation,
    geo.py:1051-1116) to compute intersection areas without shapely.
    """
    output = [tuple(p) for p in subject]
    n = len(clip)
    for i in range(n):
        if not output:
            return np.empty((0, 2))
        cx1, cy1 = clip[i]
        cx2, cy2 = clip[(i + 1) % n]
        input_pts = output
        output = []

        def side(px, py):
            return (cx2 - cx1) * (py - cy1) - (cy2 - cy1) * (px - cx1)

        for j in range(len(input_pts)):
            curr = input_pts[j]
            prev = input_pts[j - 1]
            cs, ps = side(*curr), side(*prev)
            if cs >= 0:
                if ps < 0:
                    output.append(_intersect_seg(prev, curr, (cx1, cy1), (cx2, cy2)))
                output.append(curr)
            elif ps >= 0:
                output.append(_intersect_seg(prev, curr, (cx1, cy1), (cx2, cy2)))
    return np.asarray(output, dtype=np.float64) if output else np.empty((0, 2))


def _intersect_seg(p1, p2, q1, q2):
    """Intersection of segment p1-p2 with infinite line q1-q2."""
    x1, y1 = p1
    x2, y2 = p2
    x3, y3 = q1
    x4, y4 = q2
    denom = (x1 - x2) * (y3 - y4) - (y1 - y2) * (x3 - x4)
    if denom == 0:
        return p2
    t = ((x1 - x3) * (y3 - y4) - (y1 - y3) * (x3 - x4)) / denom
    return (x1 + t * (x2 - x1), y1 + t * (y2 - y1))


def box_intersection_area(
    ax1: np.ndarray, ay1: np.ndarray, ax2: np.ndarray, ay2: np.ndarray,
    bx1: np.ndarray, by1: np.ndarray, bx2: np.ndarray, by2: np.ndarray,
) -> np.ndarray:
    """Vectorized axis-aligned box ∩ box area (exact arithmetic; the
    SQL-oracle-friendly special case of the fractional overlay)."""
    w = np.maximum(
        0.0, np.minimum(ax2, bx2) - np.maximum(ax1, bx1)
    )
    h = np.maximum(
        0.0, np.minimum(ay2, by2) - np.maximum(ay1, by1)
    )
    return w * h


class GridIndex:
    """A flat uniform-grid spatial index over polygons — the engine's
    from-scratch stand-in for the reference's STRtree
    (buildings_engine.py:202-206). Built once on the driver, broadcast to
    executors, probed vectorized inside pandas UDFs.

    cell → list of polygon ids whose bbox intersects the cell.
    """

    def __init__(self, polygons: dict[object, np.ndarray], cell_deg: float = 5.0):
        self.polygons = {k: np.asarray(v, dtype=np.float64) for k, v in polygons.items()}
        self.cell_deg = float(cell_deg)
        self.buckets: dict[tuple[int, int], list] = {}
        for pid, poly in self.polygons.items():
            minx, miny, maxx, maxy = polygon_bbox(poly)
            for cx in range(int(np.floor(minx / cell_deg)), int(np.floor(maxx / cell_deg)) + 1):
                for cy in range(int(np.floor(miny / cell_deg)), int(np.floor(maxy / cell_deg)) + 1):
                    self.buckets.setdefault((cx, cy), []).append(pid)

    def query_points(self, x: np.ndarray, y: np.ndarray, convex: bool = True):
        """Return (point_idx array, polygon_id array) of containment matches.

        Groups points by candidate polygon so each polygon's containment
        test runs once, vectorized over all its candidate points.
        """
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        cx = np.floor(x / self.cell_deg).astype(np.int64)
        cy = np.floor(y / self.cell_deg).astype(np.int64)
        # candidate lists per point → invert to per-polygon point sets
        per_poly: dict[object, list[int]] = {}
        # group points by grid cell first to avoid per-point dict lookups
        order = np.lexsort((cy, cx))
        xs, ys = cx[order], cy[order]
        boundaries = np.nonzero((np.diff(xs) != 0) | (np.diff(ys) != 0))[0] + 1
        starts = np.concatenate(([0], boundaries))
        ends = np.concatenate((boundaries, [len(order)]))
        for s, e in zip(starts, ends):
            key = (int(xs[s]), int(ys[s]))
            pids = self.buckets.get(key)
            if not pids:
                continue
            idxs = order[s:e]
            for pid in pids:
                per_poly.setdefault(pid, []).append(idxs)
        test = convex_contains if convex else point_in_polygon
        out_idx, out_pid = [], []
        for pid, idx_chunks in per_poly.items():
            idxs = np.concatenate(idx_chunks)
            mask = test(self.polygons[pid], x[idxs], y[idxs])
            hit = idxs[mask]
            if len(hit):
                out_idx.append(hit)
                out_pid.extend([pid] * len(hit))
        if not out_idx:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=object)
        return np.concatenate(out_idx), np.asarray(out_pid, dtype=object)

# ------------------------------------------------- general (non-convex) area
def is_convex(poly: np.ndarray) -> bool:
    """True if the simple polygon is convex (all non-zero edge cross
    products share a sign; collinear runs allowed)."""
    p = np.asarray(poly, dtype=np.float64)
    a, b, c = p, np.roll(p, -1, axis=0), np.roll(p, -2, axis=0)
    cross = (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1]) - (b[:, 1] - a[:, 1]) * (
        c[:, 0] - a[:, 0]
    )
    return bool((cross >= 0).all() or (cross <= 0).all())


def _in_tri_closed(a, b, c, p) -> bool:
    """p inside OR on the boundary of CCW triangle abc."""
    d1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
    d2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
    d3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
    return d1 >= 0 and d2 >= 0 and d3 >= 0


def ear_clip_triangulate(poly: np.ndarray) -> list[np.ndarray]:
    """Exact triangulation of an arbitrary simple polygon (either winding)
    via O(n²) ear clipping. Returns CCW (3,2) triangles that partition the
    polygon; degenerate (zero-area) corners are consumed without emitting a
    triangle. The general-overlay kernel reduces non-convex intersection to
    convex clips against these ears (the 'triangulate-and-clip' plan —
    reference gpd.overlay(how='intersection') accepts arbitrary simple
    polygons, processing/geo.py:1051-1116)."""
    p = ensure_ccw(np.asarray(poly, dtype=np.float64))
    idx = list(range(len(p)))
    tris: list[np.ndarray] = []

    def corner_cross(k: int, ids: list[int]) -> float:
        a, b, c = p[ids[k - 1]], p[ids[k]], p[ids[(k + 1) % len(ids)]]
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    while len(idx) > 3:
        n = len(idx)
        reflex = [idx[k] for k in range(n) if corner_cross(k, idx) < 0]
        best_fallback, best_cross = 0, -np.inf
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % n]
            a, b, c = p[i0], p[i1], p[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
            if cross > best_cross:
                best_fallback, best_cross = k, cross
            if cross < 0:
                continue  # reflex corner — not an ear
            if cross == 0:
                del idx[k]  # degenerate (collinear/spike) corner: zero area
                clipped = True
                break
            # textbook ear criterion: no REFLEX vertex inside or ON the
            # candidate triangle (closed test — a reflex vertex exactly on
            # the diagonal still invalidates the ear; convex vertices on
            # the boundary cannot intrude)
            if any(
                _in_tri_closed(a, b, c, p[j])
                for j in reflex
                if j not in (i0, i1, i2)
            ):
                continue
            tris.append(np.array([a, b, c]))
            del idx[k]
            clipped = True
            break
        if not clipped:
            # numerically stuck (near-degenerate input): clip the most
            # convex corner anyway — keeps the partition area-exact up to
            # the degeneracy already present in the input
            k = best_fallback
            i0, i1, i2 = idx[k - 1], idx[k], idx[(k + 1) % n]
            tris.append(np.array([p[i0], p[i1], p[i2]]))
            del idx[k]
    if len(idx) == 3:
        last = p[idx]
        if polygon_area(last) > 0:
            tris.append(ensure_ccw(last))
    return tris


def polygon_intersection_area(
    A: np.ndarray,
    B: np.ndarray,
    tri_b: list[np.ndarray] | None = None,
) -> float:
    """Exact intersection area of two arbitrary simple polygons: triangulate
    each non-convex side, then Sutherland–Hodgman every (convex) triangle
    pair — convex×convex clips are unambiguous, so the pairwise sum is the
    exact area of A∩B. Pass tri_b to reuse a precomputed triangulation of B
    (the overlay operator triangulates each zone once per task)."""
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    tri_a = [ensure_ccw(A)] if is_convex(A) else ear_clip_triangulate(A)
    if tri_b is None:
        tri_b = [ensure_ccw(B)] if is_convex(B) else ear_clip_triangulate(B)
    total = 0.0
    for ta in tri_a:
        axmin, aymin, axmax, aymax = polygon_bbox(ta)
        for tb in tri_b:
            if (
                tb[:, 0].min() > axmax or tb[:, 0].max() < axmin
                or tb[:, 1].min() > aymax or tb[:, 1].max() < aymin
            ):
                continue
            inter = clip_polygon_convex(ta, tb)
            if len(inter) >= 3:
                total += polygon_area(inter)
    return total


def box_triangle_areas(
    tri: np.ndarray,
    bx1: np.ndarray, by1: np.ndarray, bx2: np.ndarray, by2: np.ndarray,
) -> np.ndarray:
    """Exact intersection area of ONE convex polygon (triangle or any
    convex ring) with N axis-aligned boxes, vectorized across the boxes —
    Sutherland–Hodgman against the four per-box half-planes with a fixed
    (k+5)-vertex buffer (k vertices + one per clip plane is the worst
    case). The vectorized fast path of the general fractional overlay for
    box parcels (the reference's raster/parcel disaggregation shape)."""
    tri = np.asarray(tri, dtype=np.float64)
    n = len(bx1)
    k = len(tri)
    maxv = k + 5
    V = np.zeros((n, maxv, 2))
    V[:, :k] = tri[None, :, :]
    cnt = np.full(n, k, dtype=np.int64)
    rows = np.arange(n)
    for axis, bound, keep_ge in (
        (0, bx1, True), (0, bx2, False), (1, by1, True), (1, by2, False),
    ):
        b = np.asarray(bound, dtype=np.float64)
        coord = V[:, :, axis]
        inside = (coord >= b[:, None]) if keep_ge else (coord <= b[:, None])
        newV = np.zeros((n, maxv, 2))
        newc = np.zeros(n, dtype=np.int64)
        emit_flags = np.zeros((n, 2 * maxv), dtype=bool)
        emit_pts = np.zeros((n, 2 * maxv, 2))
        for j in range(maxv):
            valid = j < cnt
            prev_idx = np.where(j == 0, cnt - 1, j - 1)
            prev_idx = np.clip(prev_idx, 0, maxv - 1)
            pv = V[rows, prev_idx]
            cv = V[:, j]
            p_in = inside[rows, prev_idx] & valid
            c_in = inside[:, j] & valid
            # intersection of edge pv→cv with the clip line (axis = bound)
            denom = cv[:, axis] - pv[:, axis]
            safe = np.where(np.abs(denom) > 1e-300, denom, 1.0)
            t = (b - pv[:, axis]) / safe
            ix = pv + t[:, None] * (cv - pv)
            cross_edge = valid & (p_in != c_in)
            emit_flags[:, 2 * j] = cross_edge
            emit_pts[:, 2 * j] = ix
            emit_flags[:, 2 * j + 1] = c_in
            emit_pts[:, 2 * j + 1] = cv
        pos = np.cumsum(emit_flags, axis=1) - 1
        er, ec = np.nonzero(emit_flags)
        newc = emit_flags.sum(axis=1)
        if newc.max(initial=0) > maxv:
            # a CONVEX subject gains at most one vertex per half-plane
            # clip; exceeding the buffer means the input was non-convex
            # (each extra line crossing adds a vertex) — refuse rather
            # than silently drop vertices and return a wrong area
            # (caught by the hypothesis property test)
            raise ValueError(
                "box_triangle_areas requires a CONVEX polygon — "
                "triangulate non-convex subjects first "
                "(geometry.ear_clip_triangulate)"
            )
        newV[er, pos[er, ec]] = emit_pts[er, ec]
        V, cnt = newV, newc
    # shoelace over the ragged rows
    area = np.zeros(n)
    x, y = V[:, :, 0], V[:, :, 1]
    idx = np.arange(maxv)
    for j in range(maxv):
        nxt = np.where(j + 1 < cnt, j + 1, 0)
        m = j < cnt
        area[m] += (
            x[rows, j][m] * y[rows, nxt][m] - x[rows, nxt][m] * y[rows, j][m]
        )
    return 0.5 * np.abs(area)
