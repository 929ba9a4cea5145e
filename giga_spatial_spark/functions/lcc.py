"""Lambert conformal conic, ellipsoidal — EPSG:2154 — from scratch.

EPSG:2154 (RGF93 / Lambert-93: lat_1=49, lat_2=44, lat_0=46.5, lon_0=3,
x_0=700000, y_0=6600000 on GRS80) is the French national grid and the
most widely used public-raster CRS of the Lambert conformal conic family
(national mapping agencies across Europe and the US State Plane system
use the same projection with different parameters). The reference accepts
it via rasterio (gigaspatial/handlers/tif_processor.py takes any CRS); no
projection library exists in this container, so this implements the
published ellipsoidal LCC equations (Snyder 1987, "Map Projections — A
Working Manual", pp.107-109, eqs 15-1..15-11) directly — the same
from-scratch pattern as functions/{laea,albers}.py:

  forward: t(φ) = tan(π/4−φ/2)/[(1−e·sinφ)/(1+e·sinφ)]^(e/2),
           n = (ln m1 − ln m2)/(ln t1 − ln t2), F = m1/(n·t1^n),
           ρ = a·F·t^n, θ = n·(λ−λ0)
  inverse: ρ/θ recovery about ρ0, t = (ρ/(aF))^(1/n),
           χ = π/2 − 2·atan(t), then the published conformal→geodetic
           series (Snyder 3-5, e²…e⁸ terms — sub-µm on GRS80).

The inverse has an exact SQL twin (inverse_sql) so DuckDB oracles
recompute pixel lon/lat identically (trig-ulp envelope, the same
tolerance class as laea/albers/mollweide inverse_sql)."""

from __future__ import annotations

import math

import numpy as np

from .laea import A_GRS80, E2, E

PHI_1 = math.radians(49.0)
PHI_2 = math.radians(44.0)
LAT_0 = math.radians(46.5)
LON_0 = math.radians(3.0)
X_0 = 700000.0
Y_0 = 6600000.0


def _t(phi):
    """Snyder (15-9): conformal t for latitude φ (vectorized-safe)."""
    esin = E * np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - esin) / (1.0 + esin)
    ) ** (E / 2.0)


def _m(phi: float) -> float:
    """Snyder (14-15): m = cos φ / √(1 − e² sin²φ)."""
    return math.cos(phi) / math.sqrt(1.0 - E2 * math.sin(phi) ** 2)


_M1 = _m(PHI_1)
_M2 = _m(PHI_2)
_T0 = float(_t(np.array(LAT_0)))
_T1 = float(_t(np.array(PHI_1)))
_T2 = float(_t(np.array(PHI_2)))
_N = (math.log(_M1) - math.log(_M2)) / (math.log(_T1) - math.log(_T2))
_F = _M1 / (_N * _T1 ** _N)  # Snyder (15-10)
_RHO0 = A_GRS80 * _F * _T0 ** _N  # Snyder (15-7a)

# conformal → geodetic series coefficients (Snyder 3-5)
_E4 = E2 * E2
_E6 = _E4 * E2
_E8 = _E6 * E2
_D2 = E2 / 2.0 + 5.0 * _E4 / 24.0 + _E6 / 12.0 + 13.0 * _E8 / 360.0
_D4 = 7.0 * _E4 / 48.0 + 29.0 * _E6 / 240.0 + 811.0 * _E8 / 11520.0
_D6 = 7.0 * _E6 / 120.0 + 81.0 * _E8 / 1120.0
_D8 = 4279.0 * _E8 / 161280.0


def forward(lon_deg, lat_deg):
    """(lon, lat) degrees → EPSG:2154 (x, y) meters. Vectorized."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    # wrap Δλ to (-π, π] so the cone seam sits opposite lon_0
    dl = np.remainder(lam - LON_0 + math.pi, 2.0 * math.pi) - math.pi
    theta = _N * dl  # Snyder (14-4)
    rho = A_GRS80 * _F * _t(phi) ** _N  # Snyder (15-7)
    x = rho * np.sin(theta) + X_0
    y = _RHO0 - rho * np.cos(theta) + Y_0
    return x, y


def inverse(x, y):
    """EPSG:2154 (x, y) meters → (lon, lat) degrees. Closed form +
    published conformal series; vectorized."""
    xs = np.asarray(x, dtype=np.float64) - X_0
    ys = _RHO0 - (np.asarray(y, dtype=np.float64) - Y_0)
    rho = np.sqrt(xs * xs + ys * ys)
    theta = np.arctan2(xs, ys)  # n > 0 for 2154
    tv = (rho / (A_GRS80 * _F)) ** (1.0 / _N)  # Snyder (15-11)
    chi = math.pi / 2.0 - 2.0 * np.arctan(tv)  # Snyder (7-13)
    phi = (
        chi
        + _D2 * np.sin(2.0 * chi)
        + _D4 * np.sin(4.0 * chi)
        + _D6 * np.sin(6.0 * chi)
        + _D8 * np.sin(8.0 * chi)
    )  # Snyder (3-5)
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
    # x ** y in numpy is pow(); DuckDB's ^ operator is the same libm pow
    tv = f"(({rho} / {d(A_GRS80 * _F)}) ^ {d(1.0 / _N)})"
    chi = f"({d(math.pi / 2.0)} - 2.0 * atan({tv}))"
    phi = (
        f"({chi} + {d(_D2)} * sin(2.0 * {chi}) + {d(_D4)} * sin(4.0 * {chi})"
        f" + {d(_D6)} * sin(6.0 * {chi}) + {d(_D8)} * sin(8.0 * {chi}))"
    )
    lam = f"({d(LON_0)} + {theta} / {d(_N)})"
    return f"degrees({lam})", f"degrees({phi})"
