"""Mollweide (ESRI:54009 World_Mollweide) forward/inverse — from scratch.

The reference ingests GHSL rasters delivered on a Mollweide grid
(gigaspatial/handlers/ghsl.py:78-152 — rasterio/GDAL reproject); no
projection library exists in this container, so the engine implements the
public closed-form spherical Mollweide equations directly, the same
from-scratch pattern as functions/utm.py:

  forward:  solve 2θ + sin 2θ = π sin φ  (Newton, quadratic convergence),
            x = (2√2/π) R λ cos θ,  y = √2 R sin θ
  inverse:  θ = asin(y / (√2 R)),  φ = asin((2θ + sin 2θ)/π),
            λ = π x / (2√2 R cos θ)          — fully closed-form.

R is the WGS84 semi-major axis used as the sphere radius (the ESRI:54009
definition). The inverse also has an exact SQL twin (inverse_sql) so
DuckDB oracles recompute pixel lon/lat identically (1-ulp trig envelope,
same tolerance class as every other trig oracle in the engine).
"""

from __future__ import annotations

import math

import numpy as np

R_MOLLWEIDE = 6378137.0  # ESRI:54009 sphere radius (WGS84 semi-major)
_SQRT2 = math.sqrt(2.0)


def forward(lon_deg, lat_deg, radius: float = R_MOLLWEIDE):
    """(lon, lat) degrees → Mollweide (x, y) meters. Vectorized."""
    lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
    phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
    theta = np.array(phi, dtype=np.float64, copy=True)
    pi_sin_phi = math.pi * np.sin(phi)
    for _ in range(50):
        f = 2.0 * theta + np.sin(2.0 * theta) - pi_sin_phi
        fp = 2.0 + 2.0 * np.cos(2.0 * theta)
        # at the poles fp → 0 but θ → ±π/2 is already the exact solution
        step = f / np.maximum(fp, 1e-12)
        theta = theta - step
        if np.max(np.abs(step)) < 1e-14:
            break
    x = (2.0 * _SQRT2 / math.pi) * radius * lam * np.cos(theta)
    y = _SQRT2 * radius * np.sin(theta)
    return x, y


def inverse(x, y, radius: float = R_MOLLWEIDE):
    """Mollweide (x, y) meters → (lon, lat) degrees. Closed-form,
    vectorized. Points off the projection disc clamp to the rim."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    theta = np.arcsin(np.clip(y / (radius * _SQRT2), -1.0, 1.0))
    phi = np.arcsin(np.clip((2.0 * theta + np.sin(2.0 * theta)) / math.pi, -1.0, 1.0))
    cos_theta = np.cos(theta)
    lam = np.where(
        cos_theta > 1e-12,
        math.pi * x / (2.0 * _SQRT2 * radius * np.maximum(cos_theta, 1e-12)),
        0.0,
    )
    return np.degrees(lam), np.degrees(phi)


def inverse_sql(x_sql: str, y_sql: str, radius: float = R_MOLLWEIDE) -> tuple[str, str]:
    """(lon_sql, lat_sql) DuckDB twins of ``inverse`` — identical
    arithmetic (clip → least/greatest) so oracles agree to trig-ulp."""
    theta = (
        f"asin(least(greatest(({y_sql}) / {radius * _SQRT2!r}, -1.0), 1.0))"
    )
    lat = (
        f"degrees(asin(least(greatest((2.0 * {theta} + sin(2.0 * {theta}))"
        f" / pi(), -1.0), 1.0)))"
    )
    lon = (
        f"degrees(CASE WHEN cos({theta}) > 1e-12 THEN pi() * ({x_sql})"
        f" / (2.0 * {_SQRT2!r} * {radius!r} * greatest(cos({theta}), 1e-12))"
        " ELSE 0.0 END)"
    )
    return lon, lat
