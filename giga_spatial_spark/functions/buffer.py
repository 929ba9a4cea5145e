"""Geodesic buffer of points / lines / polygons — UTM offset construction.

Reference: buffer_geodataframe (gigaspatial/processing/geo.py:268-324)
projects to the estimated UTM CRS, calls shapely ``.buffer(distance,
cap_style=...)`` and projects back. No shapely exists here, so the same
pipeline is built from the engine's own Krüger UTM round-trip
(functions/utm.py) plus a from-scratch planar offset algorithm:

  - each edge is offset outward by r; ROUND joins insert a vertex arc at
    convex corners, reflex corners take the offset-line intersection
    (miter clip);
  - open polylines walk both sides; cap_style='round' closes the ends
    with semicircular arcs, 'flat' squares them off at the end vertices
    (shapely cap_style 1 / 2 semantics);
  - points fall back to utm.buffer_point_utm (exact circle).

The outline is exact up to arc discretization (n_points per full circle)
for geometries whose reflex features are wider than 2r — the reference's
use cases (coverage radii around sites / roads / parcels). For the
MEMBERSHIP question ("is this point inside the buffer?") the module also
provides points_within_buffer — an EXACT vectorized distance test
(UTM-planar point-to-segment distance ≤ r, or inside the polygon) that
does not depend on arc discretization at all; spatial joins should prefer
it and use the outline only for pruning covers and export.
"""

from __future__ import annotations

import numpy as np

from .utm import utm_forward, utm_inverse, utm_zone


def _project_ring(ring: np.ndarray, zone: int) -> np.ndarray:
    e, n = utm_forward(ring[:, 0], ring[:, 1], zone)
    # one consistent (northern) frame — southern rows would add a false
    # northing step at the equator (same normalization as polygon_area_utm)
    n = np.where(ring[:, 1] < 0, n - 10_000_000.0, n)
    return np.column_stack([e, n])


def _unproject_ring(ring_m: np.ndarray, zone: int, south_hint: bool) -> np.ndarray:
    n = ring_m[:, 1].copy()
    south = n < 0
    n = np.where(south, n + 10_000_000.0, n)
    lon, lat = utm_inverse(ring_m[:, 0], n, zone, south=south)
    return np.column_stack([lon, lat])


def _arc(center: np.ndarray, a0: float, a1: float, r: float, n_full: int):
    """CCW arc points from angle a0 to a1 (exclusive ends handled by
    caller), stepped at the n_full-per-circle resolution."""
    while a1 < a0:
        a1 += 2 * np.pi
    steps = max(int(np.ceil((a1 - a0) / (2 * np.pi / n_full))), 1)
    ang = a0 + (a1 - a0) * np.arange(1, steps) / steps
    return center[None, :] + r * np.column_stack([np.cos(ang), np.sin(ang)])


def _line_intersect(p1, d1, p2, d2):
    """Intersection of lines p1+t·d1 and p2+s·d2 (None if parallel)."""
    denom = d1[0] * d2[1] - d1[1] * d2[0]
    if abs(denom) < 1e-12:
        return None
    t = ((p2[0] - p1[0]) * d2[1] - (p2[1] - p1[1]) * d2[0]) / denom
    return p1 + t * d1


def _offset_side(chain: np.ndarray, r: float, n_full: int) -> list[np.ndarray]:
    """Offset an open chain by r to its RIGHT side, walking start→end:
    offset edge endpoints joined by arcs at left turns (gaps) and miter
    intersections at right turns (overlaps). Returns outline points."""
    pts: list[np.ndarray] = []
    m = len(chain) - 1
    dirs = chain[1:] - chain[:-1]
    lens = np.hypot(dirs[:, 0], dirs[:, 1])
    keep = lens > 1e-9
    dirs = dirs[keep] / lens[keep][:, None]
    verts = np.vstack([chain[:-1][keep], chain[-1:]])
    m = len(dirs)
    normals = np.column_stack([dirs[:, 1], -dirs[:, 0]])  # right of travel
    for i in range(m):
        a = verts[i] + r * normals[i]
        b = verts[i + 1] + r * normals[i]
        if i == 0:
            pts.append(a)
        else:
            cross = dirs[i - 1][0] * dirs[i][1] - dirs[i - 1][1] * dirs[i][0]
            prev_end = verts[i] + r * normals[i - 1]
            if cross > 1e-12:
                # LEFT turn opens a gap on the right (offset) side: round
                # join — CCW arc around the vertex from the previous
                # offset end to the next offset start (the short, outer way)
                a0 = float(np.arctan2(*(prev_end - verts[i])[::-1]))
                a1 = float(np.arctan2(*(a - verts[i])[::-1]))
                pts.append(prev_end)
                pts.extend(_arc(verts[i], a0, a1, r, n_full))
                pts.append(a)
            elif cross < -1e-12:
                # RIGHT turn overlaps: miter — offset-line intersection
                inter = _line_intersect(prev_end, dirs[i - 1], a, dirs[i])
                pts.append(inter if inter is not None else a)
            else:
                pts.append(a)
        if i == m - 1:
            pts.append(b)
    return [np.asarray(p, dtype=np.float64) for p in pts]


def buffer_line_utm(
    line: np.ndarray, radius_m: float, cap_style: str = "round",
    n_points: int = 32,
) -> np.ndarray:
    """Open polyline (N,2 lon/lat) → buffer outline ring (lon/lat, open).
    cap_style: 'round' (semicircular ends) or 'flat' (squared at the end
    vertices — shapely cap_style 2)."""
    line = np.asarray(line, dtype=np.float64)
    zone = utm_zone(float(line[:, 0].mean()))
    ch = _project_ring(line, zone)
    fwd = _offset_side(ch, radius_m, n_points)
    bwd = _offset_side(ch[::-1], radius_m, n_points)
    out: list[np.ndarray] = list(fwd)
    if cap_style not in ("round", "flat"):
        raise ValueError(f"unknown cap_style {cap_style!r}")
    end_dir = ch[-1] - ch[-2]
    end_dir = end_dir / np.hypot(*end_dir)
    if cap_style == "round":
        # semicircle from the right normal CCW through the tip to the left
        # normal: angle(n_right) = atan2(-dx, dy)
        a0 = float(np.arctan2(-end_dir[0], end_dir[1]))
        out.extend(_arc(ch[-1], a0, a0 + np.pi, radius_m, n_points))
    out.extend(bwd)
    start_dir = ch[0] - ch[1]
    start_dir = start_dir / np.hypot(*start_dir)
    if cap_style == "round":
        a0 = float(np.arctan2(-start_dir[0], start_dir[1]))
        out.extend(_arc(ch[0], a0, a0 + np.pi, radius_m, n_points))
    ring_m = np.vstack(out)
    return _unproject_ring(ring_m, zone, bool(line[:, 1].mean() < 0))


def buffer_polygon_utm(
    poly: np.ndarray, radius_m: float, n_points: int = 32
) -> np.ndarray:
    """Simple polygon (outer ring, either winding) → OUTWARD buffer
    outline ring in lon/lat (round joins — shapely's default join for
    .buffer). The outline is exact up to arc discretization for polygons
    whose reflex notches are wider than 2·radius. Limitations vs the
    reference's shapely .buffer (documented scope): positive radii only
    (no erosion), single outer ring (holes shrink independently — buffer
    the hole ring and keep it as the member's hole), and self-intersection
    removal for radius ≫ notch width is approximate (use
    points_within_buffer for exact membership regardless)."""
    from ..geometry import ensure_ccw

    poly = ensure_ccw(np.asarray(poly, dtype=np.float64))
    zone = utm_zone(float(poly[:, 0].mean()))
    ring = _project_ring(poly, zone)
    closed = np.vstack([ring, ring[:2]])  # wrap two vertices for the joins
    out = _offset_side(closed, radius_m, n_points)
    # drop the duplicated wrap tail (last edge repeats the first edge)
    ring_m = np.vstack(out[1:-1])
    return _unproject_ring(ring_m, zone, bool(poly[:, 1].mean() < 0))


def points_within_buffer(
    lons: np.ndarray,
    lats: np.ndarray,
    geometry: np.ndarray,
    radius_m: float,
    geom_type: str = "Polygon",
) -> np.ndarray:
    """EXACT buffered-membership test: UTM-planar distance(point,
    geometry) ≤ radius (or inside, for polygons). Independent of the
    outline discretization — the authoritative semantics for buffered
    joins (reference: gpd .buffer then sjoin-within ≡ distance ≤ r)."""
    geometry = np.asarray(geometry, dtype=np.float64)
    lons = np.asarray(lons, dtype=np.float64)
    lats = np.asarray(lats, dtype=np.float64)
    zone = utm_zone(float(geometry[:, 0].mean()))
    g = _project_ring(geometry, zone)
    pe, pn = utm_forward(lons, lats, zone)
    pn = np.where(lats < 0, pn - 10_000_000.0, pn)
    if geom_type == "Point":
        d = np.hypot(pe - g[0, 0], pn - g[0, 1])
        return d <= radius_m
    if geom_type == "LineString":
        segs = list(zip(g[:-1], g[1:]))
    elif geom_type == "Polygon":
        segs = list(zip(g, np.roll(g, -1, axis=0)))
    else:
        raise ValueError(f"unsupported geom_type {geom_type!r}")
    best = np.full(len(lons), np.inf)
    for a, b in segs:
        ab = b - a
        den = float(ab @ ab)
        if den < 1e-18:
            d = np.hypot(pe - a[0], pn - a[1])
        else:
            t = np.clip(((pe - a[0]) * ab[0] + (pn - a[1]) * ab[1]) / den, 0.0, 1.0)
            d = np.hypot(pe - (a[0] + t * ab[0]), pn - (a[1] + t * ab[1]))
        best = np.minimum(best, d)
    within = best <= radius_m
    if geom_type == "Polygon":
        from ..geometry import point_in_polygon

        # planar containment in the projected frame (consistent with the
        # projected distance test)
        inside = point_in_polygon(g, pe, pn)
        within |= inside
    return within
