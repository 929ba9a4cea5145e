"""Transverse-Mercator (UTM) projection — from-scratch Krüger series.

The reference buffers and measures in an estimated UTM CRS via pyproj
(buffer_geodataframe processing/geo.py:268-324, add_area_in_meters
:438-477). pyproj/GDAL are absent here, so this implements the standard
published Karney–Krüger 3rd-order series for WGS84 (the same formulation
PROJ uses; accurate to well under a millimeter within a UTM zone), giving
the engine exact UTM round-trip buffers and areas instead of the
equirectangular approximations in functions/geo.py.

All kernels are vectorized numpy over coordinate arrays.
"""

from __future__ import annotations

import numpy as np

_A = 6378137.0  # WGS84 semi-major axis
_F = 1.0 / 298.257223563
_N = _F / (2.0 - _F)
_E = np.sqrt(_F * (2.0 - _F))  # first eccentricity
_K0 = 0.9996
_E0 = 500_000.0
# rectifying radius
_ABAR = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)
# forward (alpha) and inverse (beta) series coefficients, 3rd order in n
_ALPHA = (
    _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16,
    13 * _N**2 / 48 - 3 * _N**3 / 5,
    61 * _N**3 / 240,
)
_BETA = (
    _N / 2 - 2 * _N**2 / 3 + 37 * _N**3 / 96,
    _N**2 / 48 + _N**3 / 15,
    17 * _N**3 / 480,
)


def utm_zone(lon: float) -> int:
    return int(min(max(np.floor((lon + 180.0) / 6.0) + 1, 1), 60))


def zone_central_meridian(zone: int) -> float:
    return zone * 6.0 - 183.0


def utm_forward(lon, lat, zone: int) -> tuple[np.ndarray, np.ndarray]:
    """(lon, lat) degrees → UTM (easting, northing) meters in `zone`.
    Southern-hemisphere northings carry the 10,000,000 m false northing,
    decided per point (matching EPSG 327xx vs 326xx semantics)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians(lon - zone_central_meridian(zone))
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _E * np.arctanh(_E * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
    xi = xi_p.copy()
    eta = eta_p.copy()
    for j, a in enumerate(_ALPHA, start=1):
        xi += a * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += a * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    easting = _E0 + _K0 * _ABAR * eta
    northing = _K0 * _ABAR * xi
    northing = np.where(lat < 0, northing + 10_000_000.0, northing)
    return easting, northing


def utm_inverse(easting, northing, zone: int, south=False) -> tuple[np.ndarray, np.ndarray]:
    """UTM meters → (lon, lat) degrees. `south` (bool or array) says which
    points carry the 10,000,000 m false northing — it must be explicit
    because the northing ranges of the two hemisphere conventions overlap
    (EPSG splits them into 326xx vs 327xx for the same reason)."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    n = np.where(south, northing - 10_000_000.0, northing)
    xi = n / (_K0 * _ABAR)
    eta = (easting - _E0) / (_K0 * _ABAR)
    xi_p = xi.copy()
    eta_p = eta.copy()
    for j, b in enumerate(_BETA, start=1):
        xi_p -= b * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= b * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    t = np.sinh(eta_p)
    lam = np.arctan2(t, np.cos(xi_p))
    # conformal → geodetic latitude by Newton iteration on the conformal map
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for _ in range(4):
        s = np.sin(phi)
        target = np.arctanh(s) - _E * np.arctanh(_E * s)
        # d(target)/dphi = 1/cos(phi) * (1 - e^2) / (1 - e^2 s^2) ... use
        # exact derivative of the isometric latitude
        dpsi = (1 - _E**2) / ((1 - _E**2 * s * s) * np.cos(phi))
        psi_chi = np.arctanh(np.sin(chi))  # isometric latitude target
        phi = phi - (target - psi_chi) / dpsi
    lon = np.degrees(lam) + zone_central_meridian(zone)
    lat = np.degrees(phi)
    return lon, lat


def buffer_point_utm(lon: float, lat: float, radius_m: float, n_points: int = 32) -> np.ndarray:
    """Exact reference-parity point buffer (geo.py:268-324): project to the
    point's UTM zone, build the radius-m circle polygon in meters, inverse-
    project the ring back to lon/lat. Returns an open (n_points, 2) ring."""
    zone = utm_zone(lon)
    e, n = utm_forward(np.array([lon]), np.array([lat]), zone)
    ang = np.linspace(0.0, 2 * np.pi, n_points, endpoint=False)
    ring_e = e[0] + radius_m * np.cos(ang)
    ring_n = n[0] + radius_m * np.sin(ang)
    south = np.full(n_points, lat < 0)
    rlon, rlat = utm_inverse(ring_e, ring_n, zone, south=south)
    return np.column_stack([rlon, rlat])


def polygon_area_utm(poly: np.ndarray) -> float:
    """UTM round-trip polygon area in m² (reference add_area_in_meters,
    geo.py:438-477): project vertices into the centroid's UTM zone, shoelace
    in meters."""
    poly = np.asarray(poly, dtype=np.float64)
    zone = utm_zone(float(poly[:, 0].mean()))
    e, n = utm_forward(poly[:, 0], poly[:, 1], zone)
    # a polygon straddling the equator would mix false northings — project
    # everything with the northern convention for a consistent frame
    n = np.where(poly[:, 1] < 0, n - 10_000_000.0, n)
    return 0.5 * float(abs(np.dot(e, np.roll(n, -1)) - np.dot(n, np.roll(e, -1))))


class TransverseMercator:
    """Karney–Krüger transverse Mercator with ARBITRARY parameters —
    central meridian, latitude of origin (meridian-arc offset), scale
    factor, false easting/northing, and ellipsoid (a, 1/f). The same
    series as the module-level UTM functions above, parameterized so
    non-UTM TM grids ingest: OSGB-style national grids, US State Plane
    TM zones, and user-defined GeoTIFF GeoKeys (ProjCoordTransGeoKey 1).
    Coefficients to n⁴ (Karney 2011, eqs 35-36; ~nanometer truncation on
    Earth ellipsoids)."""

    def __init__(
        self,
        lat0_deg: float,
        lon0_deg: float,
        k0: float = 1.0,
        x0: float = 0.0,
        y0: float = 0.0,
        a: float = _A,
        inv_f: float = 298.257223563,
    ):
        self.a = float(a)
        f = 1.0 / float(inv_f)
        n = f / (2.0 - f)
        self.e = float(np.sqrt(f * (2.0 - f)))
        self.k0 = float(k0)
        self.lat0 = np.radians(lat0_deg)
        self.lon0 = float(lon0_deg)
        self.x0, self.y0 = float(x0), float(y0)
        self.abar = self.a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
        self.alpha = (
            n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
            13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
            61 * n**3 / 240 - 103 * n**4 / 140,
            49561 * n**4 / 161280,
        )
        self.beta = (
            n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
            n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
            17 * n**3 / 480 - 37 * n**4 / 840,
            4397 * n**4 / 161280,
        )
        # meridian arc from the equator to lat0 (rectifying latitude of
        # lat0 × rectifying radius): the northing origin offset
        self.m0 = self.abar * float(self._xi_rect(np.array(self.lat0)))

    def _xi_rect(self, phi):
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi_p = np.arctan(t)
        xi = xi_p.copy()
        for j, av in enumerate(self.alpha, start=1):
            xi += av * np.sin(2 * j * xi_p)
        return xi

    def forward(self, lon_deg, lat_deg):
        """(lon, lat) degrees → projected (x, y) meters. Vectorized."""
        lon_deg = np.asarray(lon_deg, dtype=np.float64)
        phi = np.radians(np.asarray(lat_deg, dtype=np.float64))
        dl = np.remainder(lon_deg - self.lon0 + 180.0, 360.0) - 180.0
        lam = np.radians(dl)
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - self.e * np.arctanh(self.e * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
        xi = xi_p.copy()
        eta = eta_p.copy()
        for j, av in enumerate(self.alpha, start=1):
            xi += av * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += av * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        x = self.x0 + self.k0 * self.abar * eta
        y = self.y0 + self.k0 * (self.abar * xi - self.m0)
        return x, y

    def inverse(self, x, y):
        """Projected (x, y) meters → (lon, lat) degrees. Inverse series +
        Newton iteration on the isometric latitude (the module-level
        utm_inverse pattern, parameterized)."""
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        xi = ((y - self.y0) / self.k0 + self.m0) / self.abar
        eta = (x - self.x0) / (self.k0 * self.abar)
        xi_p = xi.copy()
        eta_p = eta.copy()
        for j, bv in enumerate(self.beta, start=1):
            xi_p -= bv * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= bv * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        t = np.sinh(eta_p)
        lam = np.arctan2(t, np.cos(xi_p))
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        phi = chi.copy()
        e = self.e
        for _ in range(4):
            s = np.sin(phi)
            target = np.arctanh(s) - e * np.arctanh(e * s)
            dpsi = (1 - e**2) / ((1 - e**2 * s * s) * np.cos(phi))
            psi_chi = np.arctanh(np.sin(chi))
            phi = phi - (target - psi_chi) / dpsi
        lon = np.degrees(lam) + self.lon0
        lat = np.degrees(phi)
        return lon, lat


# the British National Grid (OSGB36 / Airy 1830) — the canonical
# non-UTM TM instance, validated against the published OS worked example
OSGB36 = TransverseMercator(
    49.0, -2.0, 0.9996012717, 400000.0, -100000.0,
    a=6377563.396, inv_f=299.3249646,
)
