"""WKB (well-known binary) parse / dump — pure-stdlib struct codec.

Reference accepts WKB geometry at parse time (core/schemas/entity.py:
176-212, entity_processor.py:504-547) and GeoParquet carries geometry as
WKB columns; no shapely/GDAL exists in this container, so this implements
the OGC WKB subset the engine's geometry model needs: Point, LineString,
Polygon (with holes), MultiPoint, MultiLineString, MultiPolygon, both byte
orders. Doubles round-trip bit-exactly.

Vertices surface as (N, 2) float64 arrays (closing vertex dropped on rings,
matching functions/wkt.py and geometry.py's open-ring convention).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DoubleType

from ..winding import wind_member

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON = 4, 5, 6
_NAMES = {
    _POINT: "Point",
    _LINESTRING: "LineString",
    _POLYGON: "Polygon",
    _MULTIPOINT: "MultiPoint",
    _MULTILINESTRING: "MultiLineString",
    _MULTIPOLYGON: "MultiPolygon",
}


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, bo: str) -> int:
        (v,) = struct.unpack_from(bo + "I", self.buf, self.pos)
        self.pos += 4
        return v

    def coords(self, bo: str, n: int, ndims: int = 2) -> np.ndarray:
        arr = np.frombuffer(
            self.buf, dtype=("<f8" if bo == "<" else ">f8"), count=ndims * n,
            offset=self.pos,
        ).astype(np.float64)
        self.pos += 8 * ndims * n
        return arr.reshape(n, ndims)[:, :2]


def _open_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) >= 2 and (ring[0] == ring[-1]).all():
        return ring[:-1]
    return ring


def _parse_one(r: _Reader) -> tuple[str, object]:
    bo = "<" if r.u8() == 1 else ">"
    gtype = r.u32(bo)
    # Dimensionality: ISO WKB offsets type by 1000 (Z), 2000 (M), 3000 (ZM);
    # PostGIS EWKB sets flag bits 0x80000000 (Z) / 0x40000000 (M) and may
    # carry an SRID (0x20000000).  Extra ordinates are read and dropped so
    # the stream stays aligned for later members of Multi* geometries
    # (round-2 advisor finding: Z previously interleaved into x/y).
    has_z = bool(gtype & 0x80000000)
    has_m = bool(gtype & 0x40000000)
    if gtype & 0x20000000:  # EWKB SRID
        r.u32(bo)
    iso = (gtype & 0x1FFFFFFF) // 1000
    if iso in (1, 3):
        has_z = True
    if iso in (2, 3):
        has_m = True
    if iso > 3:
        raise ValueError(f"unsupported WKB geometry type {gtype}")
    ndims = 2 + has_z + has_m
    base = (gtype & 0x1FFFFFFF) % 1000
    if base == _POINT:
        return "Point", r.coords(bo, 1, ndims)[0]
    if base == _LINESTRING:
        return "LineString", r.coords(bo, r.u32(bo), ndims)
    if base == _POLYGON:
        rings = [
            _open_ring(r.coords(bo, r.u32(bo), ndims)) for _ in range(r.u32(bo))
        ]
        return "Polygon", rings
    if base in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON):
        n = r.u32(bo)
        parts = [_parse_one(r)[1] for _ in range(n)]
        return _NAMES[base], parts
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def parse_wkb(buf: bytes | str) -> tuple[str, object]:
    """WKB bytes (or hex string) → (type_name, coords). Point → (2,) array;
    LineString → (N,2); Polygon → [outer_ring, *hole_rings] open (N,2)
    arrays; Multi* → list of member coords."""
    if isinstance(buf, str):
        buf = bytes.fromhex(buf)
    return _parse_one(_Reader(bytes(buf)))


def dump_point(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, x, y)


def _pack_ring(ring: np.ndarray) -> bytes:
    ring = np.asarray(ring, dtype=np.float64)
    closed = np.vstack([ring, ring[:1]])  # WKB rings are closed
    return struct.pack("<I", len(closed)) + closed.astype("<f8").tobytes()


def dump_linestring(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    return (
        struct.pack("<BII", 1, _LINESTRING, len(coords))
        + coords.astype("<f8").tobytes()
    )


def dump_polygon(rings: np.ndarray | list) -> bytes:
    """rings: a single (N,2) outer ring or [outer, *holes] (open rings)."""
    if isinstance(rings, np.ndarray) and rings.ndim == 2:
        rings = [rings]
    out = struct.pack("<BII", 1, _POLYGON, len(rings))
    for ring in rings:
        out += _pack_ring(np.asarray(ring))
    return out


def dump_multipoint(coords: np.ndarray) -> bytes:
    coords = np.asarray(coords, dtype=np.float64)
    out = struct.pack("<BII", 1, _MULTIPOINT, len(coords))
    for x, y in coords:
        out += dump_point(float(x), float(y))
    return out


def dump_multilinestring(lines: list) -> bytes:
    out = struct.pack("<BII", 1, _MULTILINESTRING, len(lines))
    for ls in lines:
        out += dump_linestring(np.asarray(ls))
    return out


def dump_multipolygon(polys: list) -> bytes:
    out = struct.pack("<BII", 1, _MULTIPOLYGON, len(polys))
    for p in polys:
        out += dump_polygon(p)
    return out


# --------------------------------------------------------------- Spark side
_RINGS_T = ArrayType(ArrayType(ArrayType(DoubleType())))


def with_parsed_rings(
    df: DataFrame, wkb_col: str = "geom", out_col: str = "rings"
) -> DataFrame:
    """Attach a rings column (array<array<array<double>>>) parsed from a WKB
    binary/hex column — Arrow-batched UDF, the GeoParquet ingest path.
    Points become a single one-vertex ring; MultiPolygons flatten their
    member rings (outer rings first per member, holes follow)."""

    @F.pandas_udf(_RINGS_T)
    def parse(col: pd.Series) -> pd.Series:
        def go(b):
            if b is None:
                return None
            try:
                gtype, coords = parse_wkb(b)
            except (ValueError, struct.error, IndexError):
                return None
            if gtype == "Point":
                return [[list(coords)]]
            if gtype == "LineString":
                return [[list(v) for v in coords]]
            if gtype == "Polygon":
                return wind_member(
                    [[list(v) for v in ring] for ring in coords]
                )
            if gtype == "MultiPolygon":
                return [
                    ring
                    for poly in coords
                    for ring in wind_member(
                        [[list(v) for v in r] for r in poly]
                    )
                ]
            if gtype in ("MultiPoint", "MultiLineString"):
                return [[list(v) for v in np.atleast_2d(part)] for part in coords]
            return None

        return col.map(go)

    return df.withColumn(out_col, parse(F.col(wkb_col)))
