"""k-nearest-neighbor joins (k=1 nearest facility, and top-k).

Reference semantics: cKDTree(right).query(left, k=1) then exact haversine
(PoiViewGenerator.map_nearest_points, generators/poi.py:287-391), with the
shard-local min-merge (buildings_engine.py:226-316) and progressive radius
expansion (poi.py:1217-1355).

Spark-first design (SURVEY.md §2.4):
  - ``knn_broadcast``: when the right side is a small dim (facilities),
    broadcast its coordinate array and scan the big side once in
    ``mapInPandas`` — zero shuffle, exact argmin per row via vectorized
    haversine. This is THE plan for dim-sized right sides at 10^12 rows.
  - ``knn_grid``: two-phase grid kNN for large right sides — candidates by
    tile-id equi-join expanded over a k-ring (``ring_candidates``), final
    ``min_by`` aggregation; a driver loop widens the ring for the
    unresolved frontier (reference's progressive radius, poi.py:1288) and
    stops via a conservative ring-band distance bound.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import cells
from ..geometry import haversine_np
from ..synth import haversine_expr

# Ceiling for the collected facility dim — coordinate triples at ~24 B/row
# put 2M rows at ~50 MB broadcast, the edge of worth-broadcasting; beyond
# it knn_broadcast raises and knn_grid (no driver collect) is the plan.
# PoiViewGenerator dispatches on the same constant.
BROADCAST_FACILITY_LIMIT = 2_000_000


def ring_candidates(
    df: DataFrame,
    k: int,
    zoom: int,
    tile_col: str = "__ptile",
    row_ring=None,
) -> DataFrame:
    """Expand each row to its k-ring candidate tiles (__ctile), emitting each
    candidate tile exactly once per row: lon offsets wrap mod n without
    duplication (full coverage when 2k+1 >= n), lat offsets are filtered at
    the poles rather than clamped (clamping would duplicate edge tiles and
    inflate join pair counts).

    ``row_ring`` (optional Column) caps the ring PER ROW: rows keep only
    offsets within their own ring requirement, so mid-latitude data stops
    paying for a ring sized for the ±85° worst case (k stays the global
    bound — the offsets table covers every row; the filter prunes inside the
    broadcast nested-loop join before anything is shuffled)."""
    n = 2**zoom
    full_wrap = 2 * k + 1 >= n
    if full_wrap:
        dxs = list(range(n))  # all lon residues exactly once
    else:
        dxs = list(range(-k, k + 1))
    dys = list(range(-k, k + 1))
    offsets = [(dx, dy) for dx in dxs for dy in dys]
    off_df = df.sparkSession.createDataFrame(offsets, "dx int, dy int")
    px = F.shiftright(F.col(tile_col), 32)
    py = F.col(tile_col) % F.lit(2**32)
    ny = py + F.col("dy")
    out = df.crossJoin(F.broadcast(off_df))
    if row_ring is not None:
        wrap_dx = (
            F.least(F.col("dx"), F.lit(n) - F.col("dx"))
            if full_wrap
            else F.abs(F.col("dx"))
        )
        out = out.where((wrap_dx <= row_ring) & (F.abs(F.col("dy")) <= row_ring))
    return (
        out.where((ny >= 0) & (ny < n))
        .withColumn("__ctile", F.shiftleft(F.pmod(px + F.col("dx"), F.lit(n)), 32) + ny)
        .drop("dx", "dy")
    )


def knn_broadcast(
    points: DataFrame,
    facilities: DataFrame,
    point_id: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    fac_id: str = "facility_id",
    flon: str = "flon",
    flat: str = "flat",
    dist_col: str = "nearest_dist_m",
) -> DataFrame:
    """Exact nearest facility per point; facilities broadcast as numpy.

    Tie-break on smallest facility id (deterministic, matching an
    ORDER BY dist, id LIMIT 1 oracle).

    The facility side is a DIM by contract: its size is checked (JVM-side
    truncated count, nothing collected) BEFORE the toPandas — a
    fact-table-sized right side raises with a pointer at knn_grid instead
    of OOMing the driver (same guarded-collect pattern as
    ann.cosine_topk_gemm's GEMM_CORPUS_LIMIT).
    """
    probe = facilities.limit(BROADCAST_FACILITY_LIMIT + 1).count()
    if probe > BROADCAST_FACILITY_LIMIT:
        raise ValueError(
            f"knn_broadcast: facility table exceeds "
            f"{BROADCAST_FACILITY_LIMIT:,} rows — not a broadcast-able dim. "
            "Use knn_grid (tile-grid progressive-radius kNN, no driver "
            "collect) for fact-sized facility layers."
        )
    # sorted by id so np.argmin's first-among-equals tie-break = smallest id
    fac = facilities.select(fac_id, flon, flat).orderBy(fac_id).toPandas()
    if len(fac) == 0:
        # no facilities: every point resolves to NULL neighbor / NULL dist
        from pyspark.sql.types import DoubleType, LongType

        return points.withColumn(
            "nearest_facility_id", F.lit(None).cast(LongType())
        ).withColumn(dist_col, F.lit(None).cast(DoubleType()))
    spark = points.sparkSession
    bc = spark.sparkContext.broadcast(
        (
            fac[fac_id].to_numpy(),
            fac[flon].to_numpy(dtype=np.float64),
            fac[flat].to_numpy(dtype=np.float64),
        )
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    # copy — DataFrame.schema is cached; StructType.add mutates in place
    out_schema = StructType(
        list(points.schema.fields)
        + [
            StructField("nearest_facility_id", LongType()),
            StructField(dist_col, DoubleType()),
        ]
    )
    cols = points.columns

    def kernel(batches):
        ids, flons, flats = bc.value
        # great-circle argmin == argmax of unit-vector dot products
        # (haversine distance is monotone decreasing in the dot product),
        # so the (n_points × n_fac) sweep is one BLAS dgemm instead of
        # six trig kernels on (n, m) temporaries — ~20× less memory
        # traffic. Exact haversine is evaluated only for the winner.
        frad_lat = np.radians(flats)
        frad_lon = np.radians(flons)
        fvec = np.stack(
            [
                np.cos(frad_lat) * np.cos(frad_lon),
                np.cos(frad_lat) * np.sin(frad_lon),
                np.sin(frad_lat),
            ],
            axis=1,
        )  # (m, 3)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            plat = pdf[lat].to_numpy(dtype=np.float64)
            plon = pdf[lon].to_numpy(dtype=np.float64)
            prad_lat = np.radians(plat)
            prad_lon = np.radians(plon)
            pvec = np.stack(
                [
                    np.cos(prad_lat) * np.cos(prad_lon),
                    np.cos(prad_lat) * np.sin(prad_lon),
                    np.sin(prad_lat),
                ],
                axis=1,
            )  # (n, 3)
            best_id = np.empty(len(pdf), dtype=np.int64)
            best_j = np.empty(len(pdf), dtype=np.int64)
            # two-level blocking with a running argmax: the (points ×
            # facilities) dot matrix is never materialized beyond one
            # cache-sized block, so the sweep stays compute-bound instead
            # of DRAM-bound under many concurrent workers. Strict > keeps
            # the FIRST maximum → lowest facility id on ties (ids sorted).
            m = len(ids)
            p_step = 4096
            f_step = max(64, min(m, (1 << 21) // (8 * p_step) or 64))
            fvec_t = np.ascontiguousarray(fvec.T)
            for s in range(0, len(pdf), p_step):
                e = min(s + p_step, len(pdf))
                blk = pvec[s:e]
                run_val = np.full(e - s, -2.0)
                run_j = np.zeros(e - s, dtype=np.int64)
                for fs in range(0, m, f_step):
                    fe = min(fs + f_step, m)
                    dots = blk @ fvec_t[:, fs:fe]
                    j = np.argmax(dots, axis=1)
                    v = dots[np.arange(e - s), j]
                    upd = v > run_val
                    run_val[upd] = v[upd]
                    run_j[upd] = j[upd] + fs
                best_j[s:e] = run_j
            best_id[:] = ids[best_j]
            best_d = haversine_np(plat, plon, flats[best_j], flons[best_j])
            out = pdf.copy()
            out["nearest_facility_id"] = best_id
            out[dist_col] = best_d
            yield out[cols + ["nearest_facility_id", dist_col]]

    # facilities must be sorted by id so argmax tie-break = smallest id
    return points.mapInPandas(kernel, schema=out_schema)


def knn_grid(
    points: DataFrame,
    facilities: DataFrame,
    point_id: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    fac_id: str = "facility_id",
    flon: str = "flon",
    flat: str = "flat",
    zoom: int = 5,
    max_ring: int = 64,
    dist_col: str = "nearest_dist_m",
) -> DataFrame:
    """Two-phase grid kNN: tile-cover candidate equi-join + min_by finalize,
    driver loop widening the ring for unresolved points.

    Scale shape: facilities indexed by tile once; each round shuffles only
    the unresolved frontier (shrinks geometrically; AQE re-plans each pass).
    """
    n = 2**zoom
    tile_deg = 360.0 / n
    m_per_deg = 111194.9
    fac_tiles = facilities.withColumn(
        "__ftile", cells.tile_id(F.col(flon), F.col(flat), zoom)
    )
    # localCheckpoint the shrinking frontier each round — without it the
    # iterative plan nests and task binaries blow up
    unresolved = points.withColumn(
        "__ptile", cells.tile_id(F.col(lon), F.col(lat), zoom)
    ).localCheckpoint()
    resolved_parts: list[DataFrame] = []
    ring = 1
    while ring <= max_ring:
        cand_tiles = ring_candidates(unresolved, ring, zoom)
        matched = cand_tiles.join(
            fac_tiles, cand_tiles["__ctile"] == fac_tiles["__ftile"], "inner"
        ).withColumn(
            "__dist", haversine_expr(F.col(lat), F.col(lon), F.col(flat), F.col(flon))
        )
        best = matched.groupBy(point_id).agg(
            F.min_by(F.col(fac_id), F.struct("__dist", fac_id)).alias(
                "nearest_facility_id"
            ),
            F.min("__dist").alias(dist_col),
        )
        pts_best = unresolved.join(best, point_id, "left")
        # stopping rule: accept iff no facility outside the ring can be
        # closer. Ground extent of a mercator tile shrinks ~cos(lat); take
        # the worst case over the entire ring band (|lat| + (ring+1) tiles).
        band_lat = F.least(
            F.abs(F.col(lat)) + F.lit((ring + 1) * tile_deg), F.lit(85.06)
        )
        bound = (
            F.lit(float(ring)) * F.lit(tile_deg) * F.lit(m_per_deg)
            * F.cos(F.radians(band_lat))
        )
        done = pts_best.where(F.col(dist_col).isNotNull() & (F.col(dist_col) <= bound))
        resolved_parts.append(done.drop("__ptile").localCheckpoint())
        unresolved = (
            pts_best.where(F.col(dist_col).isNull() | (F.col(dist_col) > bound))
            .drop("nearest_facility_id", dist_col)
            .localCheckpoint()
        )
        if unresolved.isEmpty():
            unresolved = None
            break
        ring *= 2
    if unresolved is not None:
        # stragglers (sparse regions / poles): exact broadcast kernel
        resolved_parts.append(
            knn_broadcast(
                unresolved.drop("__ptile"), facilities,
                point_id=point_id, lon=lon, lat=lat,
                fac_id=fac_id, flon=flon, flat=flat, dist_col=dist_col,
            )
        )
    out = resolved_parts[0]
    for part in resolved_parts[1:]:
        out = out.unionByName(part)
    return out


def topk_neighbors(
    left: DataFrame,
    right: DataFrame,
    k: int,
    max_distance_m: float,
    left_id: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    right_id: str = "facility_id",
    rlon: str = "flon",
    rlat: str = "flat",
    zoom: int = 4,
) -> DataFrame:
    """ε-bounded top-k neighbors per left row (reference build_distance_graph,
    processing/algorithms.py:24-204): cell-cover candidates at a ring sized
    to ε, haversine filter, row_number window top-k."""
    from pyspark.sql.window import Window

    n = 2**zoom
    tile_deg = 360.0 / n
    m_per_deg = 111194.9
    # global ring bound guaranteeing coverage of max_distance_m at any
    # latitude the data can hold (worst case: lon-meters shrink by cos(lat)
    # near poles; mercator lat clamp is ±85.05° → cos ≈ 0.086) — this only
    # sizes the broadcast offsets table; each row prunes to ITS latitude band
    min_cos = 0.086
    ring = int(np.ceil(max_distance_m / (tile_deg * m_per_deg * min_cos))) + 1
    # per-row requirement: both the lon ground extent and the mercator lat
    # extent of a tile scale ~cos(lat); take the worst latitude inside the
    # row's ε-disk (|lat| + ε in degrees)
    eps_deg = max_distance_m / m_per_deg
    band_cos = F.cos(
        F.radians(F.least(F.abs(F.col(lat)) + F.lit(eps_deg), F.lit(85.06)))
    )
    row_ring = F.ceil(F.lit(max_distance_m / (tile_deg * m_per_deg)) / band_cos) + 1
    lt = left.withColumn("__ptile", cells.tile_id(F.col(lon), F.col(lat), zoom))
    rt = right.withColumn("__rtile", cells.tile_id(F.col(rlon), F.col(rlat), zoom))
    cand = (
        ring_candidates(lt, ring, zoom, row_ring=row_ring)
        .join(rt, F.col("__ctile") == F.col("__rtile"), "inner")
        .withColumn(
            "dist_m", haversine_expr(F.col(lat), F.col(lon), F.col(rlat), F.col(rlon))
        )
        .where(F.col("dist_m") <= F.lit(max_distance_m))
        .drop("__ptile", "__rtile", "__ctile")
    )
    if k >= 2**31 - 1:
        # unbounded k = plain ε-range join: ranking every pair would add a
        # full shuffle+sort of the entire pair set for a column nobody reads
        return cand.withColumn("rank", F.lit(None).cast("int"))
    w = Window.partitionBy(left_id).orderBy(F.col("dist_m").asc(), F.col(right_id).asc())
    return cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
