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
    # undirected → keep both directions (self_range_edges already emits both)
    # connected components: one-hop min-label propagation + pointer jumping
    # (comp <- comp[comp]) per round — the jump halves remaining chain length,
    # giving O(log diameter) rounds instead of O(diameter) for long ε-chains
    labels = points.select(F.col(id_col).alias("node"), F.col(id_col).alias("comp"))
    edges_c = edges.localCheckpoint()
    converged = False
    for _ in range(max_iter):
        neigh_min = (
            edges_c.join(labels, edges_c["dst"] == labels["node"], "inner")
            .groupBy("src")
            .agg(F.min("comp").alias("ncomp"))
        )
        hop = (
            labels.join(neigh_min, labels["node"] == neigh_min["src"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("ncomp", F.col("comp"))).alias("comp"),
            )
        )
        parent = hop.select(F.col("node").alias("pnode"), F.col("comp").alias("pcomp"))
        new_labels = (
            hop.join(parent, hop["comp"] == parent["pnode"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce("pcomp", F.col("comp"))).alias("comp"),
            )
            .localCheckpoint()  # truncate lineage: iterative plans otherwise grow
        )
        converged = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .isEmpty()
        )
        labels = new_labels
        if converged:
            break
    if not converged:
        # never exit silently with split components — the greedy replay below
        # would keep rows the reference greedy suppresses
        raise RuntimeError(
            f"connected components did not converge in {max_iter} rounds; "
            "raise max_iter (chains longer than 2^max_iter hops)"
        )
    pts_comp = points.join(
        labels.withColumnRenamed("node", id_col), id_col, "inner"
    )
    out_schema = points.schema

    def replay(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        lats = pdf[lat].to_numpy(dtype=np.float64)
        lons = pdf[lon].to_numpy(dtype=np.float64)
        kept = np.ones(len(pdf), dtype=bool)
        for i in range(len(pdf)):
            if not kept[i]:
                continue
            d = haversine_np(lats[i], lons[i], lats, lons)
            near = (d <= max_distance_m) & (np.arange(len(pdf)) != i)
            kept[near] = False
        return pdf.loc[kept, [c for c in pdf.columns if c != "comp"]]

    return pts_comp.groupBy("comp").applyInPandas(replay, schema=out_schema)
