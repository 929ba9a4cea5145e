"""DuckDB SQL twins of the Krüger UTM forward/inverse projections.

House oracle pattern (mollweide.inverse_sql, laea.inverse_sql,
h3_sql.h3_cell_sql): the oracle replays the ENTIRE projection pipeline in
SQL so the engine's Arrow kernels (functions/utm.py) are checked against
an independently-executed float path. DuckDB lacks hyperbolic functions,
so sinh/cosh/atanh are expanded via exp/ln — a deliberately different
evaluation route from numpy's intrinsics; agreement is asserted after
rounding to micro-degrees (~0.11 m, vs the series' sub-mm accuracy).

The builders emit chains of CTEs over an input CTE that must provide the
named columns; every CTE carries prior columns through with `SELECT *`.
"""

from __future__ import annotations

from .utm import _ABAR, _ALPHA, _BETA, _E, _E0, _K0

_K0ABAR = _K0 * _ABAR
_E2 = _E * _E


def _sinh(x: str) -> str:
    return f"((exp({x}) - exp(-({x}))) / 2)"


def _cosh(x: str) -> str:
    return f"((exp({x}) + exp(-({x}))) / 2)"


def _atanh(x: str) -> str:
    return f"(0.5 * ln((1 + ({x})) / (1 - ({x}))))"


def forward_ctes(src: str, lon: str = "lon", lat: str = "lat",
                 cm: str = "cm", prefix: str = "uf") -> tuple[str, str]:
    """CTE chain computing UTM (easting, northing) from (lon, lat) degrees
    and a per-row central meridian `cm`. Returns (ctes_sql, final_name);
    the final CTE adds columns `easting`, `northing` (false northing
    applied for lat < 0, EPSG 326xx/327xx semantics, matching
    utm.utm_forward)."""
    p = prefix
    a1, a2, a3 = (repr(a) for a in _ALPHA)
    t_expr = _sinh(f"{_atanh('sphi')} - {_E!r} * {_atanh(f'({_E!r} * sphi)')}")
    xi_terms = " + ".join(
        f"{a} * sin({2 * j} * xip) * {_cosh(f'{2 * j} * etap')}"
        for j, a in ((1, a1), (2, a2), (3, a3))
    )
    eta_terms = " + ".join(
        f"{a} * cos({2 * j} * xip) * {_sinh(f'{2 * j} * etap')}"
        for j, a in ((1, a1), (2, a2), (3, a3))
    )
    ctes = (
        f"{p}1 AS (SELECT *, radians({lon} - {cm}) AS lam, "
        f"radians({lat}) AS phi FROM {src}), "
        f"{p}2 AS (SELECT *, sin(phi) AS sphi FROM {p}1), "
        f"{p}3 AS (SELECT *, {t_expr} AS t FROM {p}2), "
        f"{p}4 AS (SELECT *, atan2(t, cos(lam)) AS xip, "
        f"{_atanh('(sin(lam) / sqrt(1 + t * t))')} AS etap FROM {p}3), "
        f"{p}5 AS (SELECT *, xip + {xi_terms} AS xi_f, "
        f"etap + {eta_terms} AS eta_f FROM {p}4), "
        f"{p}6 AS (SELECT *, {_E0!r} + {_K0ABAR!r} * eta_f AS easting, "
        f"{_K0ABAR!r} * xi_f + CASE WHEN {lat} < 0 THEN 10000000.0 "
        f"ELSE 0.0 END AS northing FROM {p}5)"
    )
    return ctes, f"{p}6"


def inverse_ctes(src: str, easting: str = "easting",
                 northing: str = "northing", south: str = "(lat < 0)",
                 cm: str = "cm", prefix: str = "ui",
                 newton_iters: int = 4) -> tuple[str, str]:
    """CTE chain computing geodetic (lon_out, lat_out) degrees from UTM
    meters. `south` is a boolean SQL expression saying which rows carry
    the 10,000,000 m false northing (it cannot be inferred — matches
    utm.utm_inverse's explicit flag). Newton refinement of the conformal→
    geodetic latitude is unrolled `newton_iters` times (4 = the kernel's
    fixed count)."""
    p = prefix
    b1, b2, b3 = (repr(b) for b in _BETA)
    xip_terms = " - ".join(
        f"{b} * sin({2 * j} * xi_i) * {_cosh(f'{2 * j} * eta_i')}"
        for j, b in ((1, b1), (2, b2), (3, b3))
    )
    etap_terms = " - ".join(
        f"{b} * cos({2 * j} * xi_i) * {_sinh(f'{2 * j} * eta_i')}"
        for j, b in ((1, b1), (2, b2), (3, b3))
    )
    ctes = [
        f"{p}1 AS (SELECT *, "
        f"(CASE WHEN {south} THEN {northing} - 10000000.0 "
        f"ELSE {northing} END) / {_K0ABAR!r} AS xi_i, "
        f"({easting} - {_E0!r}) / {_K0ABAR!r} AS eta_i FROM {src})",
        # numpy subtracts each term in turn: xi - t1 - t2 - t3 (NOT
        # xi - (t1 - t2 - t3)) — keep the chain unparenthesized
        f"{p}2 AS (SELECT *, xi_i - {xip_terms} AS xip_i, "
        f"eta_i - {etap_terms} AS etap_i FROM {p}1)",
        f"{p}3 AS (SELECT *, {_sinh('etap_i')} AS t_i, "
        f"asin(sin(xip_i) / {_cosh('etap_i')}) AS chi FROM {p}2)",
        f"{p}4 AS (SELECT *, atan2(t_i, cos(xip_i)) AS lam_i, "
        f"{_atanh('sin(chi)')} AS psi_chi, chi AS phi_0 FROM {p}3)",
    ]
    for k in range(newton_iters):
        s = f"sin(phi_{k})"
        target = f"({_atanh(s)} - {_E!r} * {_atanh(f'({_E!r} * {s})')})"
        dpsi = (
            f"((1 - {_E2!r}) / ((1 - {_E2!r} * {s} * {s}) * cos(phi_{k})))"
        )
        ctes.append(
            f"{p}n{k} AS (SELECT *, phi_{k} - ({target} - psi_chi) / {dpsi} "
            f"AS phi_{k + 1} FROM {p}{4 if k == 0 else f'n{k - 1}'})"
        )
    last = f"{p}n{newton_iters - 1}"
    ctes.append(
        f"{p}out AS (SELECT *, degrees(lam_i) + {cm} AS lon_out, "
        f"degrees(phi_{newton_iters}) AS lat_out FROM {last})"
    )
    return ", ".join(ctes), f"{p}out"


def zone_cm_sql(lon: str) -> str:
    """Per-row UTM zone central meridian from longitude (utm.utm_zone +
    zone_central_meridian, clamped 1..60)."""
    zone = (
        f"least(greatest(CAST(floor(({lon} + 180.0) / 6.0) + 1 AS BIGINT), "
        f"1), 60)"
    )
    return f"({zone} * 6.0 - 183.0)"
