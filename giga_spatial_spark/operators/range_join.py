"""ε-distance range join and proximity dedup.

Reference: build_distance_graph (gigaspatial/processing/algorithms.py:24-204)
— cKDTree range query emitting (left, right, dist) edges; and
deduplicate_by_proximity (entity_processor.py:990-1081) — greedy forward
scan where each *kept* row suppresses its ε-neighbors.

Spark design:
  - range_join: tile k-ring candidate equi-join + haversine filter (native).
  - proximity_dedup_exists: the parallel-friendly variant "drop any row with
    an earlier surviving-or-not row within ε" — SQL-expressible (oracle'd).
  - proximity_dedup_greedy: exact reference parity. Greedy scan is
    sequential along chains, so: ε-self-join edges → connected components
    (iterative min-label propagation — converges in O(log n) rounds) →
    per-component greedy replay in applyInPandas. Components are tiny in
    practice (clusters of near-duplicate sites), so the sequential part is
    per-group vectorized numpy over a few rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .knn import topk_neighbors
from ..geometry import haversine_np


def range_join(
    left: DataFrame,
    right: DataFrame,
    max_distance_m: float,
    **kw,
) -> DataFrame:
    """All (left, right, dist_m) pairs within ε — top-k with k=∞."""
    return topk_neighbors(left, right, k=2**31 - 1, max_distance_m=max_distance_m, **kw).drop(
        "rank"
    )


def self_range_edges(
    points: DataFrame,
    max_distance_m: float,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Directed self-join edges (a, b, dist) with a.id != b.id."""
    right = points.select(
        F.col(id_col).alias("__rid"),
        F.col(lon).alias("__rlon"),
        F.col(lat).alias("__rlat"),
    )
    edges = range_join(
        points,
        right,
        max_distance_m,
        left_id=id_col,
        lon=lon,
        lat=lat,
        right_id="__rid",
        rlon="__rlon",
        rlat="__rlat",
        zoom=zoom,
    )
    return edges.where(F.col(id_col) != F.col("__rid")).select(
        F.col(id_col).alias("src"), F.col("__rid").alias("dst"), "dist_m"
    )


def proximity_dedup_exists(
    points: DataFrame,
    max_distance_m: float,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 6,
) -> DataFrame:
    """Keep rows with no lower-id row within ε (single-pass semantics;
    SQL-oracle-checkable, unlike the chain-sensitive greedy)."""
    edges = self_range_edges(points, max_distance_m, id_col, lon, lat, zoom)
    killers = edges.where(F.col("dst") < F.col("src")).select(
        F.col("src").alias(id_col)
    ).distinct()
    return points.join(killers, id_col, "left_anti")


def proximity_dedup_greedy(
    points: DataFrame,
    max_distance_m: float,
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    zoom: int = 6,
    max_iter: int = 20,
) -> DataFrame:
    """Exact reference greedy semantics (entity_processor.py:1044-1056),
    ordered by ascending id (the reference's row order)."""
    edges = self_range_edges(points, max_distance_m, id_col, lon, lat, zoom).select(
        "src", "dst"
    )
    # ε-edges → connected components (operators/graph — Kiveris
    # large/small-star contraction, O(log² n) rounds, with a union-find
    # fast path for dim-sized graphs) with the
    # point set as the node set so isolated points self-label. A
    # non-converged run raises there rather than returning silently-split
    # components the greedy replay below would then over-keep.
    from .graph import with_component

    pts_comp = with_component(
        points, edges, id_col=id_col, max_iter=max_iter
    )
    out_schema = points.schema

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        """Greedy forward scan within one component. The scan itself is
        inherently sequential (reference entity_processor.py:1044-1056) but
        each kept row only needs its ε-NEIGHBORS, not all members: members
        are bucketed on an ε-sized lon/lat grid and each kept row tests the
        3×3 neighborhood only — O(m · local density) instead of O(m²) for
        the citywide-ε-chain component (round-3 verdict #7). Components
        wrapping the antimeridian (grid adjacency would break) fall back to
        the all-pairs scan. Component size is bounded by the ε-connectivity
        of the data; for adversarial ε prefer proximity_dedup_exists (the
        single-pass variant with no chain dependency)."""
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        lats = pdf[lat].to_numpy(dtype=np.float64)
        lons = pdf[lon].to_numpy(dtype=np.float64)
        m = len(pdf)
        kept = np.ones(m, dtype=bool)
        wraps = m and (lons.max() - lons.min()) > 350.0
        lat_cell = max_distance_m / 110_540.0 * 1.1
        cos_min = max(
            float(np.cos(np.radians(np.abs(lats).max() if m else 0.0))), 0.01
        )
        lon_cell = max_distance_m / (111_320.0 * cos_min) * 1.1
        # near-pole geometry: along-parallel ε-reach grows faster than the
        # linear cell estimate (asin convexity) and can wrap — all-pairs
        if m <= 64 or wraps or lon_cell > 45.0:
            for i in range(m):
                if not kept[i]:
                    continue
                d = haversine_np(lats[i], lons[i], lats, lons)
                near = (d <= max_distance_m) & (np.arange(m) != i)
                kept[near] = False
            return pdf.loc[kept, [c for c in pdf.columns if c != "comp"]]
        # ε-grid bucketing: cell ≥ ε in both axes ⇒ ε-pairs are in
        # adjacent cells. Longitude cell stretches by the component's
        # worst-case cos(lat) so high-latitude clusters stay correct.
        gx = np.floor(lons / lon_cell).astype(np.int64)
        gy = np.floor(lats / lat_cell).astype(np.int64)
        buckets: dict[tuple[int, int], list[int]] = {}
        for i in range(m):
            buckets.setdefault((int(gx[i]), int(gy[i])), []).append(i)
        for i in range(m):
            if not kept[i]:
                continue
            cand: list[int] = []
            for dx_ in (-1, 0, 1):
                for dy_ in (-1, 0, 1):
                    cand.extend(
                        buckets.get((int(gx[i]) + dx_, int(gy[i]) + dy_), ())
                    )
            idx = np.asarray(cand, dtype=np.int64)
            d = haversine_np(lats[i], lons[i], lats[idx], lons[idx])
            near = idx[(d <= max_distance_m) & (idx != i)]
            kept[near] = False
        return pdf.loc[kept, [c for c in pdf.columns if c != "comp"]]

    return pts_comp.groupBy("comp").applyInPandas(replay, schema=out_schema)
