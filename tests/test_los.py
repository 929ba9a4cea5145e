"""Line-of-sight / Fresnel analysis vs a direct numpy port of the
reference LOSAnalyzer math (processing/elevation/los_analyzer.py:515-1043
analyze_profile + helpers; srtm_manager.py:280-360 profile sampling)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from giga_spatial_spark.operators.los import (
    K_MEDIAN,
    K_MIN,
    los_analyze,
    radio_horizon_km_expr,
)
from giga_spatial_spark.operators.raster import RasterMeta, synthetic_raster

META = RasterMeta()
N = 80


def _grid():
    """The synthetic raster as a (h, w) array with NaN nodata."""
    px = np.arange(META.width)[None, :]
    py = np.arange(META.height)[:, None]
    vals = ((px * 31 + py * 17 + 1) % 997) / 10.0
    return np.where((px * 7 + py * 13) % 23 == 0, np.nan, vals)


GRID = _grid()


def _bilinear(lons, lats):
    fx = (lons - META.lon0) / META.dx - 0.5
    fy = (lats - META.lat0) / META.dy - 0.5
    x0 = np.floor(fx).astype(int)
    y0 = np.floor(fy).astype(int)
    wx, wy = fx - x0, fy - y0
    v = np.full(len(lons), np.nan)
    ok = (x0 >= 0) & (x0 + 1 < META.width) & (y0 >= 0) & (y0 + 1 < META.height)
    v[ok] = (
        (1 - wx[ok]) * (1 - wy[ok]) * GRID[y0[ok], x0[ok]]
        + wx[ok] * (1 - wy[ok]) * GRID[y0[ok], x0[ok] + 1]
        + (1 - wx[ok]) * wy[ok] * GRID[y0[ok] + 1, x0[ok]]
        + wx[ok] * wy[ok] * GRID[y0[ok] + 1, x0[ok] + 1]
    )
    return v


def _ref_analyze(lat1, lon1, lat2, lon2, tx_h, rx_h, freq_mhz, n=N):
    """Direct numpy port of the reference analyze_profile."""
    lats = np.linspace(lat1, lat2, n)
    lons = np.linspace(lon1, lon2, n)
    la = np.radians(lats)
    lo = np.radians(lons)
    a = (
        np.sin(np.diff(la) / 2) ** 2
        + np.cos(la[:-1]) * np.cos(la[1:]) * np.sin(np.diff(lo) / 2) ** 2
    )
    seg = 2 * 6371.0 * np.arcsin(np.sqrt(a))
    d = np.concatenate([[0.0], np.cumsum(seg)])
    elev = _bilinear(lons, lats)
    if np.isnan(elev).any():
        return None
    D = d[-1]
    tx_abs = elev[0] + tx_h
    rx_abs = elev[-1] + rx_h
    los = tx_abs + (d / D) * (rx_abs - tx_abs)
    bulge_med = d * (D - d) / (2 * K_MEDIAN * 6371.0) * 1000.0
    bulge_min = d * (D - d) / (2 * K_MIN * 6371.0) * 1000.0
    clear_med = los - (elev + bulge_med)
    clear_min = los - (elev + bulge_min)
    fres = 17.32 * np.sqrt(d * (D - d) / ((freq_mhz / 1000.0) * D))
    margin_med = clear_med - fres * 1.0
    margin_min = clear_min - fres * 0.6
    inner = slice(1, n - 1)
    passes_worst = bool((margin_min[inner] >= 0).all())
    bi = int(np.argmin(margin_min[inner])) + 1
    ke = None
    if not passes_worst:
        h = -clear_min[bi]
        d1 = d[bi] * 1000.0
        d2 = (D - d[bi]) * 1000.0
        lam = 300.0 / freq_mhz
        nu = h * np.sqrt(2.0 * (d1 + d2) / (lam * d1 * d2))
        if nu <= -0.7:
            ke = 0.0
        elif nu <= 0:
            ke = 20 * np.log10(0.5 - 0.62 * nu)
        elif nu <= 1:
            ke = 20 * np.log10(0.5 * np.exp(-0.95 * nu))
        elif nu <= 2.4:
            ke = 20 * np.log10(0.4 - np.sqrt(max(0.1184 - (0.38 - 0.1 * nu) ** 2, 0.0)))
        else:
            ke = 20 * np.log10(0.225 / nu)
    return {
        "is_visual_los": bool((clear_med[inner] >= 0).all()),
        "passes_median_clearance": bool((margin_med[inner] >= 0).all()),
        "passes_worst_case_clearance": passes_worst,
        "margin_median_m": float(np.min(margin_med[inner])),
        "margin_worst_case_m": float(np.min(margin_min[inner])),
        "bottleneck_distance_worst_case_km": float(d[bi]),
        "obstruction_count_worst_case": int((margin_min[inner] < 0).sum()),
        "knife_edge_loss_worst_case_db": ke,
        "total_distance_km": float(D),
    }


@pytest.fixture(scope="module")
def links():
    rng = np.random.RandomState(11)
    rows = []
    for i in range(40):
        lat1 = rng.uniform(-55, 55)
        lon1 = rng.uniform(-160, 160)
        # half short links (~3-10 km, tall towers: clearances pass), half
        # long (~50-150 km: earth bulge dominates, clearances fail) so the
        # fixture exercises both outcomes + the knife-edge branch
        span = rng.uniform(0.03, 0.1) if i % 2 == 0 else rng.uniform(0.5, 1.5)
        lat2 = lat1 + span * rng.choice([-1, 1])
        lon2 = lon1 + rng.uniform(0.3, 1.0) * span * rng.choice([-1, 1])
        tx = float(rng.uniform(80, 150)) if i % 2 == 0 else float(rng.uniform(5, 60))
        rx = float(rng.uniform(60, 120)) if i % 2 == 0 else float(rng.uniform(3, 30))
        rows.append(
            (i, float(lon1), float(lat1), float(lon2), float(lat2), tx, rx,
             float(rng.choice([2400.0, 5800.0, 11000.0])))
        )
    return rows


def test_los_matches_reference_port(spark, links):
    ldf = spark.createDataFrame(
        links,
        "link_id long, lon1 double, lat1 double, lon2 double, lat2 double, "
        "tx_height_m double, rx_height_m double, frequency_mhz double",
    )
    pixels = synthetic_raster(spark, META)
    got = {r["link_id"]: r for r in
           los_analyze(ldf, pixels, META, num_points=N).collect()}
    assert len(got) == len(links)
    compared = 0
    saw_pass = saw_fail = saw_ke = 0
    for (lid, lon1, lat1, lon2, lat2, tx, rx, fq) in links:
        want = _ref_analyze(lat1, lon1, lat2, lon2, tx, rx, fq)
        g = got[lid]
        if want is None:  # profile touched nodata → engine yields NULLs
            assert g["margin_worst_case_m"] is None
            continue
        compared += 1
        assert g["is_visual_los"] == want["is_visual_los"]
        assert g["passes_median_clearance"] == want["passes_median_clearance"]
        assert g["passes_worst_case_clearance"] == want["passes_worst_case_clearance"]
        for k in ("margin_median_m", "margin_worst_case_m",
                  "bottleneck_distance_worst_case_km", "total_distance_km"):
            assert abs(g[k] - want[k]) < 1e-6, (lid, k, g[k], want[k])
        assert g["obstruction_count_worst_case"] == want["obstruction_count_worst_case"]
        if want["knife_edge_loss_worst_case_db"] is None:
            assert g["knife_edge_loss_worst_case_db"] is None
            saw_pass += 1
        else:
            assert abs(
                g["knife_edge_loss_worst_case_db"]
                - want["knife_edge_loss_worst_case_db"]
            ) < 1e-6
            saw_fail += 1
            saw_ke += 1
    assert compared >= 20
    # the fixture must exercise both outcomes or the test proves little
    assert saw_pass > 0 and saw_fail > 0, (saw_pass, saw_fail)


def test_radio_horizon_prefilter(spark):
    df = spark.createDataFrame([(30.0, 15.0)], "tx double, rx double")
    got = df.select(
        radio_horizon_km_expr(F.col("tx"), F.col("rx")).alias("h")
    ).collect()[0]["h"]
    want = np.sqrt(2 * 6371.0 * (4 / 3) * 0.030) + np.sqrt(2 * 6371.0 * (4 / 3) * 0.015)
    assert abs(got - want) < 1e-9


def test_k_factor_itu_model():
    """ITU-R P.453 k-factor model (reference refractivity.py fallback
    path): formula fixed points and the non-physical fallback."""
    from giga_spatial_spark.operators.los import (
        ZONE_DN1_MEDIAN,
        k_factor_from_dn1,
    )

    assert abs(k_factor_from_dn1(40.0) - 4.0 / 3.0) < 0.01  # temperate ≈ 4/3
    assert k_factor_from_dn1(0.0) == 1.0  # no gradient → true Earth radius
    # extreme super-refraction → reference falls back to 4/3
    assert k_factor_from_dn1(160.0) == 4.0 / 3.0
    # monotone: stronger lapse → larger k (until the fallback)
    ks = [k_factor_from_dn1(d) for d in (10, 30, 50, 70)]
    assert ks == sorted(ks)
    assert set(ZONE_DN1_MEDIAN) == {
        "tropical", "subtropical_dry", "temperate", "polar"
    }
