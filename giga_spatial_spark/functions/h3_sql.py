"""DuckDB SQL twins of the geodesic H3 kernels (cells_h3).

Generates unrolled SQL replaying the published H3 algorithm so the driver
oracle recomputes cell ids / cell centers independently of the numpy
kernels — the same pattern as cells_s2.cell_id_sql / cell_center_sql
(unrolled Hilbert rounds) and hashing_sql.uuid3_sql (unrolled MD5).

  - h3_cell_sql(src, res): forward — lon/lat columns → `h3_cell` BIGINT.
    Full pipeline: 20-face argmax, gnomonic projection, hex lattice
    rounding, res unrolled up-aperture digit extractions, slot lookup
    (the self-calibrated tables embedded as VALUES, exactly as the S2
    twin embeds its Hilbert lookup tables), canonical rotations INCLUDING
    the complete pentagon path (K-lead cw/ccw offset adjustment and the
    deleted-subsequence-aware rotation steps).
  - h3_center_sql(src, res): inverse — `h3_cell` → clat/clng degrees.
    Digit walk (unrolled integer affine steps), Class II substrate
    conversion for odd res, pentagon IK-lead adjustment and leading-4
    fold, and up to 3 unrolled cross-face overage corrections using the
    derived integer edge isometries (embedded as per-(face, edge) affine
    constants), then the inverse gnomonic.

Float caveat: trig (tan/acos/atan2) differs between numpy and DuckDB by
ulps; a point would have to sit within ~1e-13 of a cell boundary for the
lattice rounding to flip. No synthetic-corpus point does (asserted by the
oracle queries passing at every sf); the pure-integer stages are exact.
"""

from __future__ import annotations

import numpy as np

from .. import cells_h3 as H

_TAU = 2.0 * np.pi


def _posangle(x: str) -> str:
    return (
        f"(CASE WHEN ({x}) < 0 THEN ({x}) + {_TAU!r} "
        f"WHEN ({x}) >= {_TAU!r} THEN ({x}) - {_TAU!r} ELSE ({x}) END)"
    )


def _case_by_face(col: str, values) -> str:
    body = " ".join(f"WHEN {f} THEN {float(v)!r}" for f, v in enumerate(values))
    return f"(CASE {col} {body} END)"


def _digit_map_case(d: str, lut: np.ndarray) -> str:
    body = " ".join(f"WHEN {i} THEN {int(lut[i])}" for i in range(7))
    return f"(CASE {d} {body} END)"


def _rot_pow_case(rot: str, d: str) -> str:
    """digit rotated `rot` times ccw — 6×7 composed map."""
    rot_pow = np.empty((6, 7), dtype=np.int64)
    rot_pow[0] = np.arange(7)
    for p in range(1, 6):
        rot_pow[p] = H._ROT_CCW[rot_pow[p - 1]]
    body = " ".join(
        f"WHEN {r * 8 + i} THEN {int(rot_pow[r, i])}"
        for r in range(6)
        for i in range(7)
    )
    return f"(CASE ({rot}) * 8 + ({d}) {body} END)"


def _lead_expr(digits: list[str]) -> str:
    inner = ", ".join(f"nullif({d}, 0)" for d in digits)
    return f"coalesce({inner}, 0)"


def _slot_values() -> str:
    """The self-calibrated (face, i, j, k) → (bc, rot) tables plus the
    base-cell pentagon/cw-offset attributes, as a VALUES relation."""
    bc_lut, rot_lut = H._slot_tables()
    rows = []
    for f in range(20):
        for i in range(3):
            for j in range(3):
                for k in range(3):
                    bc = int(bc_lut[f, i, j, k])
                    rot = int(rot_lut[f, i, j, k])
                    pent = 1 if H.PENTAGONS[bc] else 0
                    cw1, cw2 = H._CW_OFFSETS[bc]
                    rows.append(f"({f},{i},{j},{k},{bc},{rot},{pent},{cw1},{cw2})")
    return (
        "(VALUES " + ", ".join(rows)
        + ") AS h3slot(sface, si, sj, sk, bc, rot, pent, cw1, cw2)"
    )


def h3_cell_sql(src: str, res: int, lon: str = "lon", lat: str = "lat") -> str:
    """SQL computing the H3 cell id at `res` for every row of ``src``
    → SELECT *src columns*, h3_cell. Unrolled forward pipeline — the
    same tangent-plane algebra as the numpy kernel (p = v/⟨v,f⟩ − f
    projected onto the face basis: no tan/acos/atan2, so the cross-engine
    float envelope shrinks to mul/add/trig-of-input only)."""
    fvx, fvy, fvz = H._FACE_VEC[:, 0], H._FACE_VEC[:, 1], H._FACE_VEC[:, 2]

    dots = ", ".join(
        f"(vx*{float(fvx[f])!r} + vy*{float(fvy[f])!r} + vz*{float(fvz[f])!r})"
        f" AS fd{f}"
        for f in range(20)
    )
    mx = "greatest(" + ", ".join(f"fd{f}" for f in range(20)) + ")"
    face_case = (
        "(CASE "
        + " ".join(f"WHEN fd{f} = fmax THEN {f}" for f in range(20))
        + " END)"
    )
    e1 = H._FACE_E1_III if res % 2 == 1 else H._FACE_E1
    e2 = H._FACE_E2_III if res % 2 == 1 else H._FACE_E2
    scale = float(H.M_SQRT7 ** res)

    # hex2d -> ijk rounding (the published lattice rounding, CASE form)
    sin60 = float(H.M_SIN60)
    rnd = f"""
hx0 AS (
  SELECT *, abs(gx) AS a1, abs(gy) AS a2 FROM hgxy
),
hx1 AS (
  SELECT *, a1 + (a2 / {sin60!r}) / 2.0 AS x1, a2 / {sin60!r} AS x2 FROM hx0
),
hx2 AS (
  SELECT *, CAST(floor(x1) AS BIGINT) AS m1, CAST(floor(x2) AS BIGINT) AS m2,
         x1 - floor(x1) AS r1, x2 - floor(x2) AS r2 FROM hx1
),
hx3 AS (
  SELECT *,
    CASE
      WHEN r1 < 0.5 AND r1 < 1.0/3.0 THEN m1
      WHEN r1 < 0.5 AND NOT (r1 < 1.0/3.0)
        THEN CASE WHEN (1.0 - r1) <= r2 AND r2 < (2.0*r1) THEN m1 + 1 ELSE m1 END
      WHEN NOT (r1 < 0.5) AND r1 < 2.0/3.0
        THEN CASE WHEN (2.0*r1 - 1.0) < r2 AND r2 < (1.0 - r1) THEN m1 ELSE m1 + 1 END
      ELSE m1 + 1
    END AS ri0,
    CASE
      WHEN r1 < 0.5 AND r1 < 1.0/3.0
        THEN CASE WHEN r2 < (1.0 + r1)/2.0 THEN m2 ELSE m2 + 1 END
      WHEN r1 < 0.5 AND NOT (r1 < 1.0/3.0)
        THEN CASE WHEN r2 < (1.0 - r1) THEN m2 ELSE m2 + 1 END
      WHEN NOT (r1 < 0.5) AND r1 < 2.0/3.0
        THEN CASE WHEN r2 < (1.0 - r1) THEN m2 ELSE m2 + 1 END
      ELSE CASE WHEN r2 < (r1/2.0) THEN m2 ELSE m2 + 1 END
    END AS rj0
  FROM hx2
),
hx4 AS (
  SELECT *,
    CASE WHEN gx < 0.0 THEN
      CASE WHEN rj0 % 2 = 0
           THEN ri0 - 2*(ri0 - rj0 // 2)
           ELSE ri0 - (2*(ri0 - (rj0 + 1) // 2) + 1) END
    ELSE ri0 END AS ri1
  FROM hx3
),
hx5 AS (
  SELECT *,
    CASE WHEN gy < 0.0 THEN ri1 - (2*rj0 + 1) // 2 ELSE ri1 END AS ri2,
    CASE WHEN gy < 0.0 THEN -rj0 ELSE rj0 END AS rj2
  FROM hx4
),
hx6 AS (
  SELECT *,
    ri2 - least(least(ri2, rj2), 0) AS ci{res},
    rj2 - least(least(ri2, rj2), 0) AS cj{res},
    0 - least(least(ri2, rj2), 0) AS ck{res}
  FROM hx5
)"""

    # unrolled up-aperture digit extraction, res .. 1
    steps = []
    prev = f"hx6"
    for r in range(res, 0, -1):
        i_, j_, k_ = f"ci{r}", f"cj{r}", f"ck{r}"
        a = f"({i_} - {k_})"
        b = f"({j_} - {k_})"
        if r % 2 == 1:
            ni = f"CAST(floor((3*{a} - {b}) / 7.0 + 0.5) AS BIGINT)"
            nj = f"CAST(floor(({a} + 2*{b}) / 7.0 + 0.5) AS BIGINT)"
        else:
            ni = f"CAST(floor((2*{a} + {b}) / 7.0 + 0.5) AS BIGINT)"
            nj = f"CAST(floor((3*{b} - {a}) / 7.0 + 0.5) AS BIGINT)"
        up = (
            f"up{r} AS (SELECT *, {ni} AS ui, {nj} AS uj FROM {prev}), "
            f"upn{r} AS (SELECT * EXCLUDE (ui, uj), "
            f"ui - least(least(ui, uj), 0) AS ci{r - 1}, "
            f"uj - least(least(ui, uj), 0) AS cj{r - 1}, "
            f"0 - least(least(ui, uj), 0) AS ck{r - 1} FROM up{r})"
        )
        if r % 2 == 1:
            ci = f"(3*ci{r - 1} + cj{r - 1})"
            cj = f"(3*cj{r - 1} + ck{r - 1})"
            ck = f"(ci{r - 1} + 3*ck{r - 1})"
        else:
            ci = f"(3*ci{r - 1} + ck{r - 1})"
            cj = f"(ci{r - 1} + 3*cj{r - 1})"
            ck = f"(cj{r - 1} + 3*ck{r - 1})"
        mc = f"least(least({ci}, {cj}), {ck})"
        di = f"({i_} - ({ci} - {mc}))"
        dj = f"({j_} - ({cj} - {mc}))"
        dk = f"({k_} - ({ck} - {mc}))"
        md = f"least(least({di}, {dj}), {dk})"
        dig = (
            f"dg{r} AS (SELECT * EXCLUDE (ci{r}, cj{r}, ck{r}), "
            f"4*({di} - {md}) + 2*({dj} - {md}) + ({dk} - {md}) AS rd{r} "
            f"FROM upn{r})"
        )
        steps.append(up + ", " + dig)
        prev = f"dg{r}"

    digit_cols = [f"rd{r}" for r in range(1, res + 1)]
    # slot lookup FIRST (adds bc/rot/pent/cw1/cw2), then canonicalization
    slot_join = (
        f"pk AS MATERIALIZED (SELECT x0.*, h3slot.bc, h3slot.rot, "
        f"h3slot.pent, h3slot.cw1, h3slot.cw2 "
        f"FROM {prev} x0 JOIN {_slot_values()} "
        f"ON sface = x0.face AND si = x0.ci0 AND sj = x0.cj0 "
        f"AND sk = x0.ck0)"
    )
    if res > 0:
        # hexagon rotation (rot times ccw); pentagon rows pass through
        hex_rot = ", ".join(
            f"CASE WHEN pent = 0 THEN {_rot_pow_case('rot', d)} ELSE {d} END"
            f" AS {d}x"
            for d in digit_cols
        )
        dx = [f"{d}x" for d in digit_cols]
        hex_cte = (
            f"hx_rot AS (SELECT * EXCLUDE ({', '.join(digit_cols)}), "
            f"{hex_rot} FROM pk)"
        )
        # pentagon K-lead offset adjustment
        klead = _lead_expr(dx)
        pent_adj = ", ".join(
            f"CASE WHEN pent = 1 AND {klead} = 1 THEN "
            f"CASE WHEN face = cw1 OR face = cw2 "
            f"THEN {_digit_map_case(d, H._ROT_CW)} "
            f"ELSE {_digit_map_case(d, H._ROT_CCW)} END ELSE {d} END AS {d}p"
            for d in dx
        )
        padj_cte = (
            f"pkl AS (SELECT * EXCLUDE ({', '.join(dx)}), {pent_adj} "
            f"FROM hx_rot)"
        )
        cur = [f"{d}p" for d in dx]
        # pentagon-aware rotation: 5 unrolled conditional steps
        pent_steps = []
        prev_cte = "pkl"
        for s in range(5):
            stepped = [f"pd{r}_{s}" for r in range(1, res + 1)]
            once = ", ".join(
                f"CASE WHEN pent = 1 AND rot > {s} THEN "
                f"{_digit_map_case(d, H._ROT_CCW)} ELSE {d} END AS {nd}t"
                for d, nd in zip(cur, stepped)
            )
            lead_t = _lead_expr([f"{nd}t" for nd in stepped])
            again = ", ".join(
                f"CASE WHEN pent = 1 AND rot > {s} AND {lead_t} = 1 THEN "
                f"{_digit_map_case(nd + 't', H._ROT_CCW)} ELSE {nd}t END AS {nd}"
                for nd in stepped
            )
            pent_steps.append(
                f"ps{s}a AS (SELECT * EXCLUDE ({', '.join(cur)}), {once} "
                f"FROM {prev_cte}), "
                f"ps{s} AS (SELECT * EXCLUDE ("
                + ", ".join(f"{nd}t" for nd in stepped)
                + f"), {again} FROM ps{s}a)"
            )
            cur = stepped
            prev_cte = f"ps{s}"
        rot_ctes = ", ".join([hex_cte, padj_cte] + pent_steps)
        final_cte = prev_cte
        pack_digits = " + ".join(
            f"(CAST({d} AS BIGINT) << {(H.MAX_RES - r) * 3})"
            for r, d in zip(range(1, res + 1), cur)
        )
    else:
        rot_ctes = ""
        final_cte = "pk"
        pack_digits = "0"
    fill = 0
    for r in range(res + 1, H.MAX_RES + 1):
        fill |= H.INVALID_DIGIT << ((H.MAX_RES - r) * 3)
    header = (1 << 59) | (res << 52)
    pack = f"{header} + (CAST(bc AS BIGINT) << 45) + {pack_digits} + {fill}"

    scratch = (
        ["rlat", "rlng", "vx", "vy", "vz"]
        + [f"fd{f}" for f in range(20)]
        + ["fmax", "face", "tpx", "tpy", "tpz", "gx", "gy", "a1", "a2", "x1", "x2",
           "m1", "m2", "r1", "r2", "ri0", "rj0", "ri1", "ri2", "rj2",
           "ci0", "cj0", "ck0", "bc", "rot", "pent", "cw1", "cw2"]
        + (list(cur) if res > 0 else [])
    )
    return (
        f"""
WITH h3src AS MATERIALIZED (SELECT * FROM ({src})),
hrad AS (SELECT *, radians({lat}) AS rlat, radians({lon}) AS rlng FROM h3src),
hvec AS (SELECT *, cos(rlat)*cos(rlng) AS vx, cos(rlat)*sin(rlng) AS vy,
         sin(rlat) AS vz FROM hrad),
hdot AS MATERIALIZED (SELECT *, {dots} FROM hvec),
hfac AS (SELECT *, {mx} AS fmax FROM hdot),
hface AS MATERIALIZED (SELECT *, {face_case} AS face FROM hfac),
hpol AS (SELECT *,
  vx / fmax - {_case_by_face('face', fvx)} AS tpx,
  vy / fmax - {_case_by_face('face', fvy)} AS tpy,
  vz / fmax - {_case_by_face('face', fvz)} AS tpz FROM hface),
hgxy AS MATERIALIZED (SELECT *,
  (tpx * {_case_by_face('face', e1[:, 0])} +
   tpy * {_case_by_face('face', e1[:, 1])} +
   tpz * {_case_by_face('face', e1[:, 2])}) *
   {scale / float(H.RES0_U_GNOMONIC)!r} AS gx,
  (tpx * {_case_by_face('face', e2[:, 0])} +
   tpy * {_case_by_face('face', e2[:, 1])} +
   tpz * {_case_by_face('face', e2[:, 2])}) *
   {scale / float(H.RES0_U_GNOMONIC)!r} AS gy
  FROM hpol),{rnd},
{', '.join(steps + [slot_join])}"""
        + (f",\n{rot_ctes}" if rot_ctes else "")
        + f"\nSELECT * EXCLUDE ({', '.join(scratch)}), "
        f"CAST({pack} AS BIGINT) AS h3_cell FROM {final_cte}"
    )


def _bc_values() -> str:
    rows = []
    for b in range(H.NUM_BASE_CELLS):
        f, i, j, k = (int(v) for v in H._BC_HOME[b])
        pent = 1 if H.PENTAGONS[b] else 0
        rows.append(f"({b},{f},{i},{j},{k},{pent})")
    return (
        "(VALUES " + ", ".join(rows)
        + ") AS h3bc(bbc, hface, hi, hj, hk, bpent)"
    )


def h3_center_sql(src: str, res: int, cell_col: str = "h3_cell") -> str:
    """SQL recomputing cell_to_latlng per row of ``src`` (a query exposing
    `cell_col` at resolution `res`) → SELECT *src columns*, clat, clng.

    Exact inverse replay: digit unpack, pentagon IK-lead adjustment, the
    unrolled home-face digit walk (integer affine steps), Class II
    substrate conversion for odd res, the pentagon leading-4 fold, up to
    3 unrolled cross-face overage corrections (derived integer edge
    isometries embedded as per-(face, edge) affine constants), then the
    inverse gnomonic. Matches the numpy kernel bit-for-bit on integer
    stages; trig stages agree to ulps (see module caveat)."""
    topo = H._topo()
    res_cii = res + 1 if res % 2 == 1 else res
    D = H._scale_matrix(res_cii)
    sin60 = float(H.M_SIN60)

    # per-(face, edge) triangle side-test constants and crossing affines
    tri_rows = {0: [], 1: [], 2: []}
    aff_rows = []
    for f in range(20):
        verts = topo.face_verts[f]
        corners = []
        for v in verts:
            slot = np.array(topo.vert_slot[(f, v)], np.int64)[None, :] @ D
            cx, cy = H._ijk_to_hex2d(slot)
            corners.append((float(cx[0]), float(cy[0])))
        pairs = [(0, 1), (0, 2), (1, 2)]
        for e, (a, b) in enumerate(pairs):
            c3 = 3 - a - b
            ca, cb, cc = corners[a], corners[b], corners[c3]
            ex, ey = cb[0] - ca[0], cb[1] - ca[1]
            side_c = ex * (cc[1] - ca[1]) - ey * (cc[0] - ca[0])
            sgn = 1.0 if side_c >= 0 else -1.0
            tri_rows[e].append(
                f"({f},{ex!r}::DOUBLE,{ey!r}::DOUBLE,{ca[0]!r}::DOUBLE,"
                f"{ca[1]!r}::DOUBLE,{sgn!r}::DOUBLE)"
            )
            pair = frozenset((verts[a], verts[b]))
            g = topo.edge_neighbor[(f, pair)]
            t = topo.edge_rot[(f, pair)]
            v1 = sorted(pair)[0]
            a_f = (np.array(topo.vert_slot[(f, v1)], np.int64)[None, :] @ D)[0]
            a_g = (np.array(topo.vert_slot[(g, v1)], np.int64)[None, :] @ D)[0]
            Rt = np.eye(3, dtype=np.int64)
            for _ in range(t % 6):
                Rt = Rt @ H._ROT60_CCW_M
            T = a_g - a_f @ Rt
            m = ",".join(str(int(Rt[r_, c_])) for r_ in range(3) for c_ in range(3))
            aff_rows.append(
                f"({f},{e},{g},{m},{int(T[0])},{int(T[1])},{int(T[2])})"
            )
    tri_cte = ", ".join(
        f"h3tri{e} AS (SELECT * FROM (VALUES {', '.join(tri_rows[e])}) "
        f"t{e}(tf, tex, tey, tcx, tcy, tsgn))"
        for e in range(3)
    )
    aff_cte = (
        f"h3aff AS (SELECT * FROM (VALUES {', '.join(aff_rows)}) "
        "af(af_f, af_e, af_nf, m11, m12, m13, m21, m22, m23, m31, m32, m33, "
        "t1, t2, t3))"
    )
    # pentagon leading-4 fold constants (cw rotation about the scaled
    # pentagon home vertex {2,0,0})
    o = (np.array([[2, 0, 0]], np.int64) @ D)[0]
    Rcw = H._ROT60_CW_M
    fold_i = f"((wi - {int(o[0])})*{int(Rcw[0,0])} + (wj - {int(o[1])})*{int(Rcw[1,0])} + (wk - {int(o[2])})*{int(Rcw[2,0])} + {int(o[0])})"
    fold_j = f"((wi - {int(o[0])})*{int(Rcw[0,1])} + (wj - {int(o[1])})*{int(Rcw[1,1])} + (wk - {int(o[2])})*{int(Rcw[2,1])} + {int(o[1])})"
    fold_k = f"((wi - {int(o[0])})*{int(Rcw[0,2])} + (wj - {int(o[1])})*{int(Rcw[1,2])} + (wk - {int(o[2])})*{int(Rcw[2,2])} + {int(o[2])})"

    digits = [f"cd{r}" for r in range(1, res + 1)]
    unpack = ", ".join(
        f"CAST(({cell_col} >> {(H.MAX_RES - r) * 3}) & 7 AS BIGINT) AS cd{r}"
        for r in range(1, res + 1)
    )
    lead = _lead_expr(digits)
    ik_adj = ", ".join(
        f"CASE WHEN bpent = 1 AND {lead} = 5 THEN "
        f"{_digit_map_case(d, H._ROT_CW)} ELSE {d} END AS {d}a"
        for d in digits
    )
    da = [f"{d}a" for d in digits]

    # unrolled digit walk on the home face
    walk = []
    prev = "cwk0"
    for r in range(1, res + 1):
        if r % 2 == 1:  # down-aperture 7 (Class III step)
            ni = "(3*wi + wj)"
            nj = "(3*wj + wk)"
            nk = "(wi + 3*wk)"
        else:  # down-aperture 7r
            ni = "(3*wi + wk)"
            nj = "(wi + 3*wj)"
            nk = "(wj + 3*wk)"
        d = da[r - 1]
        uvi = f"(CASE WHEN {d} >= 4 THEN 1 ELSE 0 END)"
        uvj = f"(CASE WHEN {d} IN (2, 3, 6) THEN 1 ELSE 0 END)"
        uvk = f"(CASE WHEN {d} IN (1, 3, 5) THEN 1 ELSE 0 END)"
        walk.append(
            f"cwk{r} AS (SELECT * EXCLUDE (wi, wj, wk), "
            f"{ni} + {uvi} AS wi, {nj} + {uvj} AS wj, {nk} + {uvk} AS wk "
            f"FROM {prev})"
        )
        prev = f"cwk{r}"
    if res % 2 == 1:  # Class II substrate conversion
        walk.append(
            f"cwks AS (SELECT * EXCLUDE (wi, wj, wk), "
            f"(3*wi + wk) AS wi, (wi + 3*wj) AS wj, (wj + 3*wk) AS wk "
            f"FROM {prev})"
        )
        prev = "cwks"

    lead_a = _lead_expr(da)
    pent4 = f"(bpent = 1 AND {lead_a} = 4)" if res > 0 else "FALSE"

    # overage: 1 fold opportunity + 3 crossing iterations, unrolled
    ov = []
    ov_prev = prev
    for it in range(4):
        px = "((wi - wk)::DOUBLE - 0.5*(wj - wk)::DOUBLE)"
        py = f"((wj - wk)::DOUBLE * {sin60!r}::DOUBLE)"
        vals = ", ".join(
            f"(-(t{e}.tex*({py} - t{e}.tcy) - t{e}.tey*({px} - t{e}.tcx)) "
            f"* t{e}.tsgn) AS v{e}"
            for e in range(3)
        )
        ov.append(
            f"ovp{it} AS (SELECT x.*, {vals} FROM {ov_prev} x "
            f"JOIN h3tri0 t0 ON t0.tf = x.cface "
            f"JOIN h3tri1 t1 ON t1.tf = x.cface "
            f"JOIN h3tri2 t2 ON t2.tf = x.cface), "
            f"ove{it} AS (SELECT *, CASE WHEN greatest(v0, v1, v2) <= 1e-9 "
            f"THEN -1 WHEN v0 >= v1 AND v0 >= v2 THEN 0 "
            f"WHEN v1 >= v2 THEN 1 ELSE 2 END AS ce FROM ovp{it})"
        )
        if it == 0:
            # pentagon fold consumes the first detection
            ov.append(
                f"ovf{it} AS (SELECT * EXCLUDE (wi, wj, wk, v0, v1, v2, ce, fold_due), "
                f"CASE WHEN ce != -1 AND fold_due THEN {fold_i} ELSE wi END AS wi, "
                f"CASE WHEN ce != -1 AND fold_due THEN {fold_j} ELSE wj END AS wj, "
                f"CASE WHEN ce != -1 AND fold_due THEN {fold_k} ELSE wk END AS wk, "
                f"CASE WHEN ce != -1 AND fold_due THEN FALSE ELSE fold_due END "
                f"AS fold_due, "
                f"CASE WHEN ce != -1 AND fold_due THEN ce ELSE -2 END AS folded "
                f"FROM ove{it})"
            )
            ov_prev = f"ovf{it}"
        else:
            ov.append(
                f"ovx{it} AS (SELECT x.* EXCLUDE (wi, wj, wk, v0, v1, v2, ce, "
                f"cface), "
                f"CASE WHEN x.ce = -1 THEN x.cface ELSE af.af_nf END AS cface, "
                f"CASE WHEN x.ce = -1 THEN x.wi ELSE "
                f"x.wi*af.m11 + x.wj*af.m21 + x.wk*af.m31 + af.t1 END AS wi, "
                f"CASE WHEN x.ce = -1 THEN x.wj ELSE "
                f"x.wi*af.m12 + x.wj*af.m22 + x.wk*af.m32 + af.t2 END AS wj, "
                f"CASE WHEN x.ce = -1 THEN x.wk ELSE "
                f"x.wi*af.m13 + x.wj*af.m23 + x.wk*af.m33 + af.t3 END AS wk "
                f"FROM ove{it} x LEFT JOIN h3aff af "
                f"ON af.af_f = x.cface AND af.af_e = x.ce)"
            )
            ov_prev = f"ovx{it}"

    fc_lat = H.FACE_CENTER_GEO[:, 0]
    fc_lng = H.FACE_CENTER_GEO[:, 1]
    az0 = H.FACE_AXES_AZ[:, 0]
    scale = float(H.M_SQRT7 ** res_cii)
    flat = _case_by_face("cface", fc_lat)
    flng = _case_by_face("cface", fc_lng)
    faz = _case_by_face("cface", az0)
    tau = float(_TAU)
    wrap = (
        "(((glng + pi()) - floor((glng + pi()) / {t!r}) * {t!r}) - pi())"
    ).format(t=tau)
    proj = f"""
cpp AS (SELECT *, ((wi - wk)::DOUBLE - 0.5*(wj - wk)::DOUBLE) AS fx,
        ((wj - wk)::DOUBLE * {sin60!r}::DOUBLE) AS fy FROM {ov_prev}),
cpr AS (SELECT *, sqrt(fx*fx + fy*fy) AS rmag, atan2(fy, fx) AS rtheta
        FROM cpp),
cpd AS (SELECT *,
  atan(rmag * {float(H.RES0_U_GNOMONIC)!r} / {scale!r}) AS rdist,
  {_posangle(f"{faz} - rtheta")} AS raz FROM cpr),
cpg AS (SELECT *,
  CASE WHEN rmag < 1e-16 THEN {flat} ELSE
    asin(CASE WHEN sin({flat})*cos(rdist) + cos({flat})*sin(rdist)*cos(raz) > 1
      THEN 1 WHEN sin({flat})*cos(rdist) + cos({flat})*sin(rdist)*cos(raz) < -1
      THEN -1 ELSE sin({flat})*cos(rdist) + cos({flat})*sin(rdist)*cos(raz) END)
  END AS glat,
  CASE WHEN rmag < 1e-16 THEN {flng} ELSE
    {flng} + atan2(sin(raz)*sin(rdist)*cos({flat}),
                   cos(rdist) - sin({flat})*sin(
                     asin(CASE WHEN sin({flat})*cos(rdist)
                       + cos({flat})*sin(rdist)*cos(raz) > 1 THEN 1
                       WHEN sin({flat})*cos(rdist)
                       + cos({flat})*sin(rdist)*cos(raz) < -1 THEN -1
                       ELSE sin({flat})*cos(rdist)
                       + cos({flat})*sin(rdist)*cos(raz) END)))
  END AS glng
  FROM cpd)"""

    scratch = (
        ["bbc", "hface", "bpent", "cface", "fold_due",
         "folded", "wi", "wj", "wk", "fx", "fy", "rmag", "rtheta", "rdist",
         "raz", "glat", "glng"]
        + digits + da
    )
    return f"""
WITH csrc AS MATERIALIZED (SELECT *, CAST(({cell_col} >> 45) & 127 AS BIGINT)
  AS bbc0, {unpack} FROM ({src})),
cbc AS (SELECT csrc.* EXCLUDE (bbc0), h3bc.* FROM csrc
        JOIN {_bc_values()} ON bbc = bbc0),
cadj AS (SELECT * EXCLUDE ({', '.join(digits) if digits else ''}{', ' if digits else ''}hi, hj, hk),
  {ik_adj + ',' if res > 0 else ''}
  hface AS cface0, hi::BIGINT AS wi, hj::BIGINT AS wj, hk::BIGINT AS wk,
  {', '.join(digits) if digits else '1 AS one__'}
  FROM cbc),
cwk0 AS (SELECT * EXCLUDE (cface0), cface0 AS cface,
  {pent4} AS fold_due FROM cadj),
{', '.join(walk) + ',' if walk else ''}
{tri_cte},
{aff_cte},
{', '.join(ov)},
{proj.strip()}
SELECT * EXCLUDE ({', '.join(scratch)}{', one__' if res == 0 else ''}),
  degrees(glat) AS clat, degrees({wrap}) AS clng FROM cpg
"""


def h3_local_ijk_sql(src: str, res: int, cell_col: str = "h3_cell") -> str:
    """SQL computing cells_h3.local_ijk per row of ``src`` → SELECT *src*,
    lbc, li, lj, lk. The base-cell-local digit walk (straight unrolled
    integer affine steps, no overage — both cells of a distance comparison
    must share lbc, which the ring query asserts at build time)."""
    unpack = ", ".join(
        f"CAST(({cell_col} >> {(H.MAX_RES - r) * 3}) & 7 AS BIGINT) AS ld{r}"
        for r in range(1, res + 1)
    )
    walk = []
    prev = "lwk0"
    for r in range(1, res + 1):
        if r % 2 == 1:
            ni, nj, nk = "(3*li + lj)", "(3*lj + lk)", "(li + 3*lk)"
        else:
            ni, nj, nk = "(3*li + lk)", "(li + 3*lj)", "(lj + 3*lk)"
        d = f"ld{r}"
        uvi = f"(CASE WHEN {d} >= 4 THEN 1 ELSE 0 END)"
        uvj = f"(CASE WHEN {d} IN (2, 3, 6) THEN 1 ELSE 0 END)"
        uvk = f"(CASE WHEN {d} IN (1, 3, 5) THEN 1 ELSE 0 END)"
        mexp = (
            f"least(least({ni} + {uvi}, {nj} + {uvj}), {nk} + {uvk})"
        )
        walk.append(
            f"lwk{r} AS (SELECT * EXCLUDE (li, lj, lk), "
            f"{ni} + {uvi} - {mexp} AS li, {nj} + {uvj} - {mexp} AS lj, "
            f"{nk} + {uvk} - {mexp} AS lk FROM {prev})"
        )
        prev = f"lwk{r}"
    return (
        f"WITH lsrc AS (SELECT *, {unpack}, "
        f"CAST(({cell_col} >> 45) & 127 AS BIGINT) AS lbc FROM ({src})), "
        f"lwk0 AS (SELECT *, 0::BIGINT AS li, 0::BIGINT AS lj, "
        f"0::BIGINT AS lk FROM lsrc), "
        + ", ".join(walk)
        + f" SELECT * EXCLUDE ({', '.join(f'ld{r}' for r in range(1, res + 1))}) "
        f"FROM {prev}"
    )
