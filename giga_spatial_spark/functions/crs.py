"""Coordinate reference system transforms — vector-side reprojection.

Reference: zonal/base.py:448-461 caches pyproj transformers and reprojects
zone GeoDataFrames between arbitrary CRSs; tif_processor.py:205 reprojects
rasters. pyproj/GDAL are absent here, so the engine supports the CRS set
its own from-scratch projections cover — the ones the reference's flows
actually touch:

  EPSG:4326   geographic lon/lat (the engine's canonical frame)
  EPSG:3857   spherical web mercator (tile pyramids)
  ESRI:54009  Mollweide (GHSL grids) — functions/mollweide.py
  EPSG:326xx / 327xx   UTM north/south zones — functions/utm.py (Krüger)

All transforms route through 4326 (exact composition of exact legs).
`transform_points` is the numpy kernel; `reproject_rings` lifts it over a
normalized feature table's `rings` column inside one Arrow pass.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

_R_WEB = 6378137.0

# user-registered projection objects (anything with forward/inverse over
# degree/meter arrays — LambertConformal, AlbersConic, LaeaAzimuthal
# instances): the role of the reference's cached arbitrary-CRS pyproj
# transformers (zonal/base.py:448-461) for parameters no EPSG code names
_CUSTOM: dict[str, object] = {}


def register_crs(name: str, projection) -> None:
    """Register a parameterized projection instance under a name usable
    anywhere a CRS string is accepted (transform_points, reproject_rings).
    ``projection`` needs vectorized forward(lon, lat)->(x, y) and
    inverse(x, y)->(lon, lat) in degrees/meters."""
    key = name.upper().replace(" ", "")
    for attr in ("forward", "inverse"):
        if not callable(getattr(projection, attr, None)):
            raise TypeError(f"projection must define {attr}(…)")
    _CUSTOM[key] = projection


# GeoTIFF ProjCoordTransGeoKey codes → parameterized families
_CT_TM = 1
_CT_LCC_2SP = 8
_CT_LAEA = 10
_CT_ALBERS = 11
_CT_POLAR_STEREO = 15


def projection_from_params(p: dict):
    """Build a projection instance from user-defined GeoTIFF GeoKey
    parameters: {"ct": coord-trans code, "sp1", "sp2", "lat0", "lon0",
    "x0", "y0"[, "a", "e2"]}. Supports the conic/azimuthal families the
    engine implements from scratch (LCC 2SP=8, LAEA=10, Albers=11)."""
    ct = int(p["ct"])

    def need(*names):
        missing = [n for n in names if p.get(n) is None]
        if missing:
            raise ValueError(
                f"user-defined projection (ProjCoordTransGeoKey {ct}) is "
                f"missing required GeoKey parameter(s): {missing} — the "
                "GeoDoubleParams tag must carry them"
            )

    kw = {}
    if "a" in p:
        kw["a"] = float(p["a"])
    if "e2" in p:
        kw["e2"] = float(p["e2"])
    elif "inv_f" in p:
        f = 1.0 / float(p["inv_f"])
        kw["e2"] = f * (2.0 - f)
    if ct == _CT_TM:
        from .utm import TransverseMercator

        need("lat0", "lon0")
        tm_kw = {}
        if "a" in p:
            tm_kw["a"] = float(p["a"])
        if "inv_f" in p:
            tm_kw["inv_f"] = float(p["inv_f"])
        return TransverseMercator(
            p["lat0"], p["lon0"], p.get("k0", 1.0),
            p.get("x0", 0.0), p.get("y0", 0.0), **tm_kw,
        )
    if ct == _CT_LCC_2SP:
        from .lcc import LambertConformal

        need("sp1", "sp2", "lat0", "lon0")
        return LambertConformal(
            p["sp1"], p["sp2"], p["lat0"], p["lon0"],
            p.get("x0", 0.0), p.get("y0", 0.0), **kw,
        )
    if ct == _CT_ALBERS:
        from .albers import AlbersConic

        need("sp1", "sp2", "lat0", "lon0")
        return AlbersConic(
            p["sp1"], p["sp2"], p["lat0"], p["lon0"],
            p.get("x0", 0.0), p.get("y0", 0.0), **kw,
        )
    if ct == _CT_LAEA:
        from .laea import LaeaAzimuthal

        need("lat0", "lon0")
        return LaeaAzimuthal(
            p["lat0"], p["lon0"], p.get("x0", 0.0), p.get("y0", 0.0), **kw,
        )
    if ct == _CT_POLAR_STEREO:
        from .polar import PolarStereographic

        # lat_ts arrives in sp1 (ProjStdParallel1GeoKey) per GeoTIFF
        # convention; fall back to lat0 for writers that use NatOriginLat
        lat_ts = p.get("sp1")
        if lat_ts is None:
            need("lat0")
            lat_ts = p["lat0"]
        return PolarStereographic(
            lat_ts, p["lon0"], p.get("x0", 0.0), p.get("y0", 0.0), **kw,
        )
    raise ValueError(
        f"unsupported ProjCoordTransGeoKey {ct} — user-defined GeoTIFF "
        "projections are supported for TM (1), LCC 2SP (8), LAEA (10), "
        "Albers (11) and polar stereographic (15); named EPSG codes "
        "cover the other families"
    )


def _parse(crs: str) -> tuple[str, int]:
    c = crs.upper().replace(" ", "")
    if c in _CUSTOM:
        return ("custom:" + c, 0)
    if c in ("EPSG:4326", "WGS84", "4326"):
        return ("geographic", 0)
    if c in ("EPSG:3857", "EPSG:900913", "3857"):
        return ("webmercator", 0)
    if c in ("ESRI:54009", "54009"):
        return ("mollweide", 0)
    if c in ("EPSG:3035", "3035"):
        return ("laea_europe", 0)
    if c in ("EPSG:5070", "5070"):
        return ("albers_conus", 0)
    if c in ("EPSG:2154", "2154"):
        return ("lcc_france", 0)
    if c in ("EPSG:3413", "3413"):
        return ("polar_north", 0)
    if c in ("EPSG:3031", "3031"):
        return ("polar_south", 0)
    if c.startswith("EPSG:326") and len(c) == 10:
        return ("utm_north", int(c[8:]))
    if c.startswith("EPSG:327") and len(c) == 10:
        return ("utm_south", int(c[8:]))
    raise ValueError(
        f"unsupported crs {crs!r} — supported: EPSG:4326, EPSG:3857, "
        "ESRI:54009, EPSG:3035 (LAEA Europe), EPSG:5070 (Conus Albers), "
        "EPSG:2154 (Lambert-93), EPSG:3413/3031 (polar stereographic), "
        "EPSG:326xx/327xx (UTM), and register_crs() custom projections"
    )


def _to_geographic(xs: np.ndarray, ys: np.ndarray, kind: str, zone: int):
    if kind == "geographic":
        return xs, ys
    if kind.startswith("custom:"):
        return _CUSTOM[kind[7:]].inverse(xs, ys)
    if kind == "webmercator":
        lon = np.degrees(xs / _R_WEB)
        lat = np.degrees(np.arctan(np.sinh(ys / _R_WEB)))
        return lon, lat
    if kind == "mollweide":
        from . import mollweide

        return mollweide.inverse(xs, ys)
    if kind == "laea_europe":
        from . import laea

        return laea.inverse(xs, ys)
    if kind == "albers_conus":
        from . import albers

        return albers.inverse(xs, ys)
    if kind == "lcc_france":
        from . import lcc

        return lcc.inverse(xs, ys)
    if kind in ("polar_north", "polar_south"):
        from . import polar

        pj = polar.EPSG_3413 if kind == "polar_north" else polar.EPSG_3031
        return pj.inverse(xs, ys)
    from . import utm

    south = kind == "utm_south"
    lon, lat = utm.utm_inverse(
        xs, ys, zone, south=np.full(len(np.atleast_1d(xs)), south)
    )
    return lon, lat


def _from_geographic(lon: np.ndarray, lat: np.ndarray, kind: str, zone: int):
    if kind == "geographic":
        return lon, lat
    if kind.startswith("custom:"):
        return _CUSTOM[kind[7:]].forward(lon, lat)
    if kind == "webmercator":
        x = np.radians(lon) * _R_WEB
        lat_c = np.clip(lat, -85.05112878, 85.05112878)
        y = _R_WEB * np.arcsinh(np.tan(np.radians(lat_c)))
        return x, y
    if kind == "mollweide":
        from . import mollweide

        return mollweide.forward(lon, lat)
    if kind == "laea_europe":
        from . import laea

        return laea.forward(lon, lat)
    if kind == "albers_conus":
        from . import albers

        return albers.forward(lon, lat)
    if kind == "lcc_france":
        from . import lcc

        return lcc.forward(lon, lat)
    if kind in ("polar_north", "polar_south"):
        from . import polar

        pj = polar.EPSG_3413 if kind == "polar_north" else polar.EPSG_3031
        return pj.forward(lon, lat)
    from . import utm

    e, n = utm.utm_forward(lon, lat, zone)
    if kind == "utm_north":
        # keep the standard false-northing convention: southern points in
        # a northern-zone frame go negative (consistent planar frame)
        n = np.where(lat < 0, n - 10_000_000.0, n)
    return e, n


def transform_points(
    xs, ys, from_crs: str = "EPSG:4326", to_crs: str = "EPSG:4326"
):
    """Vectorized CRS transform; routes through geographic lon/lat."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    fk, fz = _parse(from_crs)
    tk, tz = _parse(to_crs)
    lon, lat = _to_geographic(xs, ys, fk, fz)
    return _from_geographic(lon, lat, tk, tz)


def reproject_rings(
    df, from_crs: str, to_crs: str, rings_col: str = "rings"
):
    """Normalized feature table → same table with `rings` reprojected.
    Mirrors the reference's gdf.to_crs() over zone layers
    (zonal/base.py:448-461). The rings cross into Python as JSON STRINGS
    (native to_json / from_json wrap the scalar Arrow UDF): this Spark
    build's Arrow deserializer SEGFAULTS on nested-array/map UDF inputs
    when a partition is empty or the column is all-null in a batch
    (measured — minimal repro in tests), while primitive string columns
    are safe. Every other column (incl. map-typed properties) stays
    JVM-side untouched."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType

    # resolve now, on the driver: custom-registered projections live in
    # the driver's _CUSTOM registry, which does NOT exist on executors —
    # the resolved (picklable) projection objects ship in the closure
    fk, fz = _parse(from_crs)
    tk, tz = _parse(to_crs)
    fobj = _CUSTOM[fk[7:]] if fk.startswith("custom:") else None
    tobj = _CUSTOM[tk[7:]] if tk.startswith("custom:") else None

    def _tx(xs, ys):
        lon, lat = (
            fobj.inverse(xs, ys) if fobj is not None
            else _to_geographic(xs, ys, fk, fz)
        )
        return (
            tobj.forward(lon, lat) if tobj is not None
            else _from_geographic(lon, lat, tk, tz)
        )

    @F.pandas_udf(StringType())
    def kernel(col: pd.Series) -> pd.Series:
        def go(doc):
            if doc is None:
                return None
            rings = json.loads(doc)
            nr = []
            for ring in rings:
                arr = np.asarray(ring, dtype=np.float64)
                if len(arr):
                    x, y = _tx(arr[:, 0], arr[:, 1])
                    nr.append(np.column_stack([x, y]).tolist())
                else:
                    nr.append([])
            return json.dumps(nr)

        return col.map(go)

    rings_t = "array<array<array<double>>>"
    return df.withColumn(
        rings_col,
        F.from_json(kernel(F.to_json(F.col(rings_col))), rings_t),
    )
