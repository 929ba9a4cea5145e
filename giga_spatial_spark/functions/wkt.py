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
