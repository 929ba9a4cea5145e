"""Property tests for the parameterized projection families: for ANY
valid parameter set (random standard parallels / origins / false origins
/ either reference ellipsoid), forward∘inverse is the identity and the
defining differential property of the family holds — equal-area families
preserve the ellipsoidal area element, conformal families have isotropic
local scale. This is the §5 test-strategy role of the reference's
pyproj round-trip fixtures, over the whole parameter space instead of
named EPSG codes."""

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from giga_spatial_spark.functions.albers import AlbersConic
from giga_spatial_spark.functions.ellipsoid import E2_GRS80, E2_WGS84
from giga_spatial_spark.functions.laea import LaeaAzimuthal
from giga_spatial_spark.functions.lcc import LambertConformal
from giga_spatial_spark.functions.polar import PolarStereographic
from giga_spatial_spark.functions.utm import TransverseMercator

E2S = st.sampled_from([E2_GRS80, E2_WGS84])


def _ellipsoid_cell_area(phi: float, e2: float, a: float = 6378137.0):
    m = a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    n = a / (1 - e2 * math.sin(phi) ** 2) ** 0.5
    return m * n * math.cos(phi)


def _jacobian(pj, lon: float, lat: float, d: float = 1e-5):
    x0, y0 = pj.forward(np.array([lon]), np.array([lat]))
    x1, y1 = pj.forward(np.array([lon + d]), np.array([lat]))
    x2, y2 = pj.forward(np.array([lon]), np.array([lat + d]))
    return (
        (x1[0] - x0[0]) / d, (y1[0] - y0[0]) / d,
        (x2[0] - x0[0]) / d, (y2[0] - y0[0]) / d,
    )


@settings(max_examples=40, deadline=None)
@given(
    sp1=st.floats(5, 60), dsp=st.floats(3, 25), lat0=st.floats(-40, 60),
    lon0=st.floats(-179, 179), x0=st.floats(-1e6, 1e6),
    y0=st.floats(-1e6, 1e6), e2=E2S, flip=st.booleans(),
    lon=st.floats(-60, 60), lat=st.floats(-65, 70),
)
def test_albers_any_params(sp1, dsp, lat0, lon0, x0, y0, e2, flip, lon, lat):
    s = -1.0 if flip else 1.0
    pj = AlbersConic(s * sp1, s * (sp1 + dsp), s * abs(lat0), lon0, x0, y0, e2=e2)
    L = lon0 + lon  # stay away from the cone seam
    fx, fy = pj.forward(np.array([L]), np.array([lat]))
    lo, la = pj.inverse(fx, fy)
    assert abs((lo[0] - L + 180) % 360 - 180) < 1e-6
    assert abs(la[0] - lat) < 1e-6
    # equal-area: |det J| in (m per degree)² equals the ellipsoidal cell
    xx, yx, xy, yy = _jacobian(pj, L, lat)
    det = abs(xx * yy - xy * yx) * (180 / math.pi) ** 2
    want = _ellipsoid_cell_area(math.radians(lat), e2)
    assert abs(det / want - 1) < 1e-4


@settings(max_examples=40, deadline=None)
@given(
    sp1=st.floats(10, 65), dsp=st.floats(3, 20), lat0=st.floats(-40, 60),
    lon0=st.floats(-179, 179), x0=st.floats(0, 2e6), y0=st.floats(0, 7e6),
    e2=E2S, flip=st.booleans(),
    lon=st.floats(-40, 40), lat=st.floats(-60, 66),
)
def test_lcc_any_params(sp1, dsp, lat0, lon0, x0, y0, e2, flip, lon, lat):
    s = -1.0 if flip else 1.0
    pj = LambertConformal(s * sp1, s * (sp1 + dsp), s * abs(lat0), lon0, x0, y0, e2=e2)
    L = lon0 + lon
    fx, fy = pj.forward(np.array([L]), np.array([lat]))
    lo, la = pj.inverse(fx, fy)
    assert abs((lo[0] - L + 180) % 360 - 180) < 1e-7
    assert abs(la[0] - lat) < 1e-7
    # conformal: isotropic local scale (meridian == parallel to 1e-5)
    xx, yx, xy, yy = _jacobian(pj, L, lat, d=1e-6)
    phi = math.radians(lat)
    m = 6378137.0 * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    n = 6378137.0 / (1 - e2 * math.sin(phi) ** 2) ** 0.5
    kp = math.hypot(xx, yx) / (n * math.cos(phi))
    km = math.hypot(xy, yy) / m
    assert abs(kp / km - 1) < 1e-5


@settings(max_examples=40, deadline=None)
@given(
    lat0=st.floats(-75, 75), lon0=st.floats(-179, 179),
    x0=st.floats(-1e6, 1e6), y0=st.floats(-1e6, 1e6), e2=E2S,
    dlon=st.floats(-90, 90), lat=st.floats(-75, 75),
)
def test_laea_any_params(lat0, lon0, x0, y0, e2, dlon, lat):
    pj = LaeaAzimuthal(lat0, lon0, x0, y0, e2=e2)
    L = lon0 + dlon
    fx, fy = pj.forward(np.array([L]), np.array([lat]))
    lo, la = pj.inverse(fx, fy)
    assert abs((lo[0] - L + 180) % 360 - 180) < 1e-6
    assert abs(la[0] - lat) < 1e-6
    xx, yx, xy, yy = _jacobian(pj, L, lat)
    det = abs(xx * yy - xy * yx) * (180 / math.pi) ** 2
    want = _ellipsoid_cell_area(math.radians(lat), e2)
    assert abs(det / want - 1) < 1e-4


@settings(max_examples=40, deadline=None)
@given(
    lat_ts=st.floats(55, 85), lon0=st.floats(-179, 179),
    x0=st.floats(-1e6, 1e6), y0=st.floats(-1e6, 1e6), e2=E2S,
    south=st.booleans(), lon=st.floats(-180, 180), lat=st.floats(35, 89),
)
def test_polar_any_params(lat_ts, lon0, x0, y0, e2, south, lon, lat):
    s = -1.0 if south else 1.0
    pj = PolarStereographic(s * lat_ts, lon0, x0, y0, e2=e2)
    fx, fy = pj.forward(np.array([lon]), np.array([s * lat]))
    lo, la = pj.inverse(fx, fy)
    assert abs((lo[0] - lon + 180) % 360 - 180) < 1e-6
    assert abs(la[0] - s * lat) < 1e-6
    xx, yx, xy, yy = _jacobian(pj, lon, s * lat, d=1e-6)
    phi = math.radians(s * lat)
    m = 6378137.0 * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    n = 6378137.0 / (1 - e2 * math.sin(phi) ** 2) ** 0.5
    kp = math.hypot(xx, yx) / (n * abs(math.cos(phi)))
    km = math.hypot(xy, yy) / m
    assert abs(kp / km - 1) < 1e-5


@settings(max_examples=40, deadline=None)
@given(
    lat0=st.floats(-60, 60), lon0=st.floats(-179, 179),
    k0=st.floats(0.9995, 1.0005), x0=st.floats(0, 1e6),
    y0=st.floats(-1e6, 1e6),
    inv_f=st.sampled_from([298.257223563, 298.257222101, 299.3249646]),
    dlon=st.floats(-3.5, 3.5), lat=st.floats(-80, 80),
)
def test_tm_any_params(lat0, lon0, k0, x0, y0, inv_f, dlon, lat):
    pj = TransverseMercator(lat0, lon0, k0, x0, y0, inv_f=inv_f)
    L = lon0 + dlon
    fx, fy = pj.forward(np.array([L]), np.array([lat]))
    lo, la = pj.inverse(fx, fy)
    assert abs((lo[0] - L + 180) % 360 - 180) < 1e-8
    assert abs(la[0] - lat) < 1e-8
    # conformal near the central meridian
    xx, yx, xy, yy = _jacobian(pj, L, lat, d=1e-6)
    e2 = (1 / inv_f) * (2 - 1 / inv_f)
    phi = math.radians(lat)
    m = pj.a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5
    n = pj.a / (1 - e2 * math.sin(phi) ** 2) ** 0.5
    kp = math.hypot(xx, yx) / (n * math.cos(phi))
    km = math.hypot(xy, yy) / m
    assert abs(kp / km - 1) < 1e-5
