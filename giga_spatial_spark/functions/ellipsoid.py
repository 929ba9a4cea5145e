"""Shared ellipsoidal-series helpers for the projection family modules.

The published machinery common to the equal-area (LAEA, Albers) and
conformal (LCC, TM) families, parameterized by eccentricity so the
families work on any reference ellipsoid (GRS80 and WGS84 in practice —
their flattenings differ in the 11th digit but bit-exactness matters
here): Snyder 1987, "Map Projections — A Working Manual":

  q(φ)      authalic q               — eq (3-12)
  m(φ)      parallel radius factor   — eq (14-15)
  t(φ)      conformal t              — eq (15-9)
  authalic_coeffs   β → φ series     — eq (3-18)
  conformal_coeffs  χ → φ series     — eq (3-5)
"""

from __future__ import annotations

import math

import numpy as np

A_GRS80 = 6378137.0
F_GRS80 = 1.0 / 298.257222101
E2_GRS80 = F_GRS80 * (2.0 - F_GRS80)

A_WGS84 = 6378137.0
F_WGS84 = 1.0 / 298.257223563
E2_WGS84 = F_WGS84 * (2.0 - F_WGS84)


def q_authalic(sinphi, e2: float):
    """Snyder (3-12): authalic q for sin φ (vectorized)."""
    e = math.sqrt(e2)
    esin = e * sinphi
    return (1.0 - e2) * (
        sinphi / (1.0 - e2 * sinphi * sinphi)
        - (1.0 / (2.0 * e)) * np.log((1.0 - esin) / (1.0 + esin))
    )


def m_parallel(phi: float, e2: float) -> float:
    """Snyder (14-15): m = cos φ / √(1 − e² sin²φ)."""
    return math.cos(phi) / math.sqrt(1.0 - e2 * math.sin(phi) ** 2)


def t_conformal(phi, e2: float):
    """Snyder (15-9): conformal t (vectorized)."""
    e = math.sqrt(e2)
    esin = e * np.sin(phi)
    return np.tan(math.pi / 4.0 - phi / 2.0) / (
        (1.0 - esin) / (1.0 + esin)
    ) ** (e / 2.0)


def authalic_coeffs(e2: float) -> tuple[float, float, float]:
    """Snyder (3-18): authalic β → geodetic φ series coefficients."""
    return (
        e2 / 3.0 + 31.0 * e2**2 / 180.0 + 517.0 * e2**3 / 5040.0,
        23.0 * e2**2 / 360.0 + 251.0 * e2**3 / 3780.0,
        761.0 * e2**3 / 45360.0,
    )


def conformal_coeffs(e2: float) -> tuple[float, float, float, float]:
    """Snyder (3-5): conformal χ → geodetic φ series coefficients."""
    e4 = e2 * e2
    e6 = e4 * e2
    e8 = e6 * e2
    return (
        e2 / 2.0 + 5.0 * e4 / 24.0 + e6 / 12.0 + 13.0 * e8 / 360.0,
        7.0 * e4 / 48.0 + 29.0 * e6 / 240.0 + 811.0 * e8 / 11520.0,
        7.0 * e6 / 120.0 + 81.0 * e8 / 1120.0,
        4279.0 * e8 / 161280.0,
    )


def sql_double(v: float) -> str:
    """DuckDB double literal — ::DOUBLE so long decimals don't become
    38-digit DECIMALs that overflow in chained multiplications."""
    return f"{v!r}::DOUBLE"
