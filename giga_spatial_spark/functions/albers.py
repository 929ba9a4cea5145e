"""Albers equal-area conic, ellipsoidal — EPSG:5070 — from scratch.

EPSG:5070 (NAD83 / Conus Albers: lat_1=29.5, lat_2=45.5, lat_0=23,
lon_0=-96, x_0=y_0=0 on GRS80) is the standard grid of US-wide public
rasters (NLCD, LANDFIRE, cropland data layers) — with EPSG:3035 LAEA
covered last commit, it is the most common projected raster CRS the
reference's flows meet that the engine still refused
(gigaspatial/handlers/tif_processor.py accepts any rasterio CRS). No
projection library exists in this container, so this implements the
published ellipsoidal Albers equations (Snyder 1987, "Map Projections —
A Working Manual", pp.98-103, eqs 14-1..14-21) directly — the same
from-scratch pattern as functions/laea.py, with which it shares the
authalic-q machinery (Snyder 3-12) and the authalic→geodetic series
(3-18, sub-µm on GRS80).

  forward: n from the two standard parallels' (m, q), C = m1² + n·q1,
           ρ = a·√(C − n·q)/n, θ = n·(λ − λ0)
  inverse: ρ/θ recovery about ρ0, q = (C − (ρn/a)²)/n, β = asin(q/qp),
           then the published authalic→geodetic series.

The inverse has an exact SQL twin (inverse_sql) so DuckDB oracles
recompute pixel lon/lat identically (trig-ulp envelope, the same
tolerance class as laea.inverse_sql / mollweide.inverse_sql)."""

from __future__ import annotations

import math

import numpy as np

from .laea import A_GRS80, E2, _C2, _C4, _C6, _q, _QP

PHI_1 = math.radians(29.5)
PHI_2 = math.radians(45.5)
LAT_0 = math.radians(23.0)
LON_0 = math.radians(-96.0)
X_0 = 0.0
Y_0 = 0.0


def _m(phi: float) -> float:
    """Snyder (14-15): m = cos φ / √(1 − e² sin²φ)."""
    return math.cos(phi) / math.sqrt(1.0 - E2 * math.sin(phi) ** 2)


_M1 = _m(PHI_1)
_M2 = _m(PHI_2)
_Q0 = float(_q(np.array(math.sin(LAT_0))))
_Q1 = float(_q(np.array(math.sin(PHI_1))))
_Q2 = float(_q(np.array(math.sin(PHI_2))))
_N = (_M1 * _M1 - _M2 * _M2) / (_Q2 - _Q1)  # Snyder (14-14)
_C = _M1 * _M1 + _N * _Q1  # Snyder (14-13)
_RHO0 = A_GRS80 * math.sqrt(_C - _N * _Q0) / _N  # Snyder (14-12a)


def forward(lon_deg, lat_deg):
    """(lon, lat) degrees → EPSG:5070 (x, y) meters. Vectorized."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    # wrap Δλ to (-π, π] so the cone seam sits opposite lon_0
    dl = np.remainder(lam - LON_0 + math.pi, 2.0 * math.pi) - math.pi
    theta = _N * dl  # Snyder (14-4)
    rho = (
        A_GRS80
        * np.sqrt(np.maximum(_C - _N * _q(np.sin(phi)), 0.0))
        / _N
    )  # Snyder (14-12)
    x = rho * np.sin(theta) + X_0
    y = _RHO0 - rho * np.cos(theta) + Y_0
    return x, y


def inverse(x, y):
    """EPSG:5070 (x, y) meters → (lon, lat) degrees. Closed form +
    published authalic series; vectorized."""
    xs = np.asarray(x, dtype=np.float64) - X_0
    ys = _RHO0 - (np.asarray(y, dtype=np.float64) - Y_0)
    rho = np.sqrt(xs * xs + ys * ys)
    theta = np.arctan2(xs, ys)  # n > 0 for 5070
    qv = (_C - (rho * _N / A_GRS80) ** 2) / _N  # Snyder (14-19)
    beta = np.arcsin(np.clip(qv / _QP, -1.0, 1.0))
    phi = (
        beta
        + _C2 * np.sin(2.0 * beta)
        + _C4 * np.sin(4.0 * beta)
        + _C6 * np.sin(6.0 * beta)
    )
    lam = LON_0 + theta / _N  # Snyder (14-9)
    return np.degrees(lam), np.degrees(phi)


def inverse_sql(x_sql: str, y_sql: str) -> tuple[str, str]:
    """(lon_sql, lat_sql) DuckDB twins of ``inverse`` — identical
    operation order, trig-ulp equivalence (laea.inverse_sql pattern)."""

    def d(v: float) -> str:
        # ::DOUBLE — DuckDB types long bare decimal literals as DECIMAL
        # and overflows its 38-digit scale in chained multiplications
        return f"{v!r}::DOUBLE"

    xs = f"(({x_sql}) - {d(X_0)})"
    ys = f"({d(_RHO0)} - (({y_sql}) - {d(Y_0)}))"
    rho = f"sqrt({xs}*{xs} + {ys}*{ys})"
    theta = f"atan2({xs}, {ys})"
    rn = f"({rho} * {d(_N)} / {d(A_GRS80)})"
    qv = f"(({d(_C)} - {rn} * {rn}) / {d(_N)})"
    beta = f"asin(least(greatest({qv} / {d(_QP)}, -1.0), 1.0))"
    phi = (
        f"({beta} + {d(_C2)} * sin(2.0 * {beta}) + {d(_C4)} * sin(4.0 * {beta})"
        f" + {d(_C6)} * sin(6.0 * {beta}))"
    )
    lam = f"({d(LON_0)} + {theta} / {d(_N)})"
    return f"degrees({lam})", f"degrees({phi})"
