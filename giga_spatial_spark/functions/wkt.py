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

_POINT_RE = re.compile(r"^\s*POINT\s*\(\s*(-?\d+(?:\.\d+)?)\s+(-?\d+(?:\.\d+)?)\s*\)\s*$", re.I)
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


def point_wkt(lon: float, lat: float) -> str:
    return f"POINT ({lon:g} {lat:g})"


def polygon_wkt(poly: np.ndarray) -> str:
    ring = ", ".join(f"{x:g} {y:g}" for x, y in poly)
    first = f"{poly[0][0]:g} {poly[0][1]:g}"
    return f"POLYGON (({ring}, {first}))"


@F.pandas_udf(ArrayType(DoubleType()))
def wkt_point_coords(wkt: pd.Series) -> pd.Series:
    """POINT wkt → [lon, lat] (NULL on parse failure) — vectorized UDF."""
    def go(s):
        p = parse_point(s) if s is not None else None
        return [p[0], p[1]] if p else None

    return wkt.map(go)
