"""Polar stereographic, ellipsoidal, ANY parameters — from scratch.

EPSG:3413 (WGS84 / NSIDC Sea Ice Polar Stereographic North: lat_ts=70,
lon_0=-45) and EPSG:3031 (WGS84 / Antarctic Polar Stereographic:
lat_ts=-71, lon_0=0) are the standard grids of polar public rasters
(sea-ice concentration, ice-sheet velocity, REMA/ArcticDEM). The
reference accepts them via rasterio (gigaspatial/handlers/
tif_processor.py takes any CRS); no projection library exists in this
container, so this implements the published ellipsoidal polar
stereographic equations (Snyder 1987, "Map Projections — A Working
Manual", pp.160-163, eqs 21-33..21-41 / 15-9) directly — the same
from-scratch pattern as functions/{lcc,albers}.py, sharing the
conformal machinery in functions/ellipsoid.py:

  forward: t(φ) per (15-9), m_c/t_c at the standard parallel,
           ρ = a·m_c·t/t_c (21-34), x = ρ·sin(λ−λ0),
           y = −ρ·cos(λ−λ0)   (north aspect; south mirrors signs)
  inverse: ρ recovery, t = ρ·t_c/(a·m_c), χ = π/2 − 2·atan(t), then the
           published conformal→geodetic series (Snyder 3-5).

The inverse has an exact SQL twin (inverse_sql) so DuckDB oracles
recompute pixel lon/lat identically (trig-ulp envelope)."""

from __future__ import annotations

import math

import numpy as np

from .ellipsoid import (
    A_WGS84,
    E2_WGS84,
    conformal_coeffs,
    m_parallel,
    sql_double,
    t_conformal,
)


class PolarStereographic:
    """Ellipsoidal polar stereographic with a standard parallel
    (variant B). ``lat_ts_deg`` > 0 → north aspect, < 0 → south."""

    def __init__(
        self,
        lat_ts_deg: float,
        lon0_deg: float,
        x0: float = 0.0,
        y0: float = 0.0,
        a: float = A_WGS84,
        e2: float = E2_WGS84,
    ):
        if abs(lat_ts_deg) < 1e-9:
            raise ValueError("polar stereographic needs a polar aspect "
                             "(lat_ts != 0)")
        self.a, self.e2 = float(a), float(e2)
        self.south = lat_ts_deg < 0
        self.lat_ts = math.radians(abs(lat_ts_deg))
        self.lon0 = math.radians(lon0_deg)
        self.x0, self.y0 = float(x0), float(y0)
        # work in the north aspect; the south aspect mirrors φ and λ
        self.mc = m_parallel(self.lat_ts, self.e2)
        self.tc = float(t_conformal(np.array(self.lat_ts), self.e2))
        self.d2, self.d4, self.d6, self.d8 = conformal_coeffs(self.e2)

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees → projected (x, y) meters. Vectorized."""
        lam = np.radians(np.asarray(lon_deg, dtype=np.float64))
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        if self.south:
            lam, phi = -lam, -phi
            lon0 = -self.lon0
        else:
            lon0 = self.lon0
        dl = np.remainder(lam - lon0 + math.pi, 2.0 * math.pi) - math.pi
        rho = self.a * self.mc * t_conformal(phi, self.e2) / self.tc
        x = rho * np.sin(dl)
        y = -rho * np.cos(dl)
        if self.south:
            x, y = -x, -y
        return x + self.x0, y + self.y0

    def inverse(self, x, y):
        """Projected (x, y) meters → (lon, lat) degrees. Closed form +
        published conformal series; vectorized."""
        xs = np.asarray(x, dtype=np.float64) - self.x0
        ys = np.asarray(y, dtype=np.float64) - self.y0
        if self.south:
            xs, ys = -xs, -ys
            lon0 = -self.lon0
        else:
            lon0 = self.lon0
        rho = np.sqrt(xs * xs + ys * ys)
        tv = rho * self.tc / (self.a * self.mc)  # Snyder (21-39)
        chi = math.pi / 2.0 - 2.0 * np.arctan(tv)  # Snyder (7-13)
        phi = (
            chi
            + self.d2 * np.sin(2.0 * chi)
            + self.d4 * np.sin(4.0 * chi)
            + self.d6 * np.sin(6.0 * chi)
            + self.d8 * np.sin(8.0 * chi)
        )  # Snyder (3-5)
        lam = np.where(rho > 1e-12, lon0 + np.arctan2(xs, -ys), lon0)
        phi = np.where(rho > 1e-12, phi, math.pi / 2.0)
        if self.south:
            lam, phi = -lam, -phi
        return np.degrees(lam), np.degrees(phi)

    def inverse_sql(self, x_sql: str, y_sql: str) -> tuple[str, str]:
        """(lon_sql, lat_sql) DuckDB twins of ``inverse`` — identical
        operation order, trig-ulp equivalence."""
        d = sql_double
        sgn = -1.0 if self.south else 1.0
        lon0 = -self.lon0 if self.south else self.lon0
        xs = f"({d(sgn)} * (({x_sql}) - {d(self.x0)}))"
        ys = f"({d(sgn)} * (({y_sql}) - {d(self.y0)}))"
        rho = f"sqrt({xs}*{xs} + {ys}*{ys})"
        tv = f"({rho} * {d(self.tc)} / {d(self.a * self.mc)})"
        chi = f"({d(math.pi / 2.0)} - 2.0 * atan({tv}))"
        phi = (
            f"({chi} + {d(self.d2)} * sin(2.0 * {chi}) + "
            f"{d(self.d4)} * sin(4.0 * {chi})"
            f" + {d(self.d6)} * sin(6.0 * {chi}) + "
            f"{d(self.d8)} * sin(8.0 * {chi}))"
        )
        phi = (
            f"(CASE WHEN {rho} > 1e-12 THEN {phi} "
            f"ELSE {d(math.pi / 2.0)} END)"
        )
        lam = (
            f"(CASE WHEN {rho} > 1e-12 THEN {d(lon0)} + "
            f"atan2({xs}, -{ys}) ELSE {d(lon0)} END)"
        )
        return (
            f"degrees({d(sgn)} * {lam})",
            f"degrees({d(sgn)} * {phi})",
        )


# canonical NSIDC instances
EPSG_3413 = PolarStereographic(70.0, -45.0)
EPSG_3031 = PolarStereographic(-71.0, 0.0)
