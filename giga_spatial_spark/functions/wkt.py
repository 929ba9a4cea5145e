"""WKT parse / dump for the geometry subset the engine carries
(POINT, POLYGON with one ring) — reference accepts WKT/WKB geometry at
parse time (core/schemas/entity.py:176-212, entity_processor.py:504-547).
Shapely is absent, so these are small exact parsers used inside Arrow UDFs;
vertices travel as (N,2) float arrays / array<array<double>> columns."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

# numbers may carry an exponent ('POINT (1e-05 40.7127)')
_NUM = r"-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_POINT_RE = re.compile(rf"^\s*POINT\s*\(\s*({_NUM})\s+({_NUM})\s*\)\s*$", re.I)
_POLY_RE = re.compile(r"^\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", re.I | re.S)


def parse_point(wkt: str) -> tuple[float, float] | None:
    m = _POINT_RE.match(wkt or "")
    return (float(m.group(1)), float(m.group(2))) if m else None


def parse_polygon(wkt: str) -> np.ndarray | None:
    """Outer ring of a POLYGON as (N,2) lon/lat; closing vertex dropped."""
    m = _POLY_RE.match(wkt or "")
    if not m:
        return None
    pts = []
    for pair in m.group(1).split(","):
        xy = pair.split()
        if len(xy) != 2:
            return None
        pts.append((float(xy[0]), float(xy[1])))
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return np.asarray(pts, dtype=np.float64) if len(pts) >= 3 else None


def _fmt(v: float) -> str:
    """Full-precision coordinate text: repr round-trips float64 exactly
    (shapely WKT parity; %g truncates to 6 significant digits)."""
    return repr(float(v))


_MPOLY_RE = re.compile(r"^\s*MULTIPOLYGON\s*\(\s*(.*)\s*\)\s*$", re.I | re.S)


def _parse_ring(body: str) -> np.ndarray | None:
    pts = []
    for pair in body.split(","):
        xy = pair.split()
        if len(xy) != 2:
            return None
        pts.append((float(xy[0]), float(xy[1])))
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    return np.asarray(pts, dtype=np.float64) if len(pts) >= 3 else None


def _split_groups(body: str, depth_open: int) -> list[str]:
    """Split 'a),(b' style sibling groups at the given nesting depth."""
    groups, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
            if depth == 1:
                start = i + 1
        elif ch == ")":
            if depth == depth_open:
                groups.append(body[start:i])
            depth -= 1
    return groups


def parse_polygon_rings(wkt: str) -> list[np.ndarray] | None:
    """POLYGON with holes → [outer, *holes] open rings (reference accepts
    full WKT geometry, entity.py:176-212)."""
    m = re.match(r"^\s*POLYGON\s*\(\s*(.*)\s*\)\s*$", wkt or "", re.I | re.S)
    if not m:
        return None
    rings = [_parse_ring(g) for g in _split_groups(m.group(1), 1)]
    return rings if rings and all(r is not None for r in rings) else None


def parse_multipolygon(wkt: str) -> list[list[np.ndarray]] | None:
    """MULTIPOLYGON → list of [outer, *holes] ring lists."""
    m = _MPOLY_RE.match(wkt or "")
    if not m:
        return None
    polys = []
    for poly_body in _split_groups(m.group(1), 1):
        rings = [_parse_ring(g) for g in _split_groups(poly_body, 1)]
        if not rings or any(r is None for r in rings):
            return None
        polys.append(rings)
    return polys or None


def multipolygon_wkt(polys: list) -> str:
    parts = []
    for rings in polys:
        if isinstance(rings, np.ndarray) and rings.ndim == 2:
            rings = [rings]
        ring_strs = []
        for ring in rings:
            body = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring)
            first = f"{_fmt(ring[0][0])} {_fmt(ring[0][1])}"
            ring_strs.append(f"({body}, {first})")
        parts.append("(" + ", ".join(ring_strs) + ")")
    return "MULTIPOLYGON (" + ", ".join(parts) + ")"


def point_wkt(lon: float, lat: float) -> str:
    return f"POINT ({_fmt(lon)} {_fmt(lat)})"


def polygon_wkt(poly: np.ndarray) -> str:
    ring = ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in poly)
    first = f"{_fmt(poly[0][0])} {_fmt(poly[0][1])}"
    return f"POLYGON (({ring}, {first}))"


@F.pandas_udf(ArrayType(DoubleType()))
def wkt_point_coords(wkt: pd.Series) -> pd.Series:
    """POINT wkt → [lon, lat] (NULL on parse failure) — vectorized UDF."""
    def go(s):
        p = parse_point(s) if s is not None else None
        return [p[0], p[1]] if p else None

    return wkt.map(go)
