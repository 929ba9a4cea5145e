"""Deterministic corpus sampling — per-domain downsampling of
over-represented hosts, a standard step between dedup and training-data
release (Common-Crawl pipelines cap how much any one site contributes).

Everything is integer arithmetic on a splittable multiplicative hash, so
the sample is reproducible across engines, partitionings and reruns, and
the keep decision is SQL-replayable bit-exactly (no float thresholds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_KNUTH = 2654435761  # Knuth multiplicative constant (golden-ratio/2^32)
_M31 = 2_147_483_648  # 2^31
_M32 = 4_294_967_296  # 2^32


def hash_u32_expr(id_col: Column) -> Column:
    """Deterministic uniform 32-bit hash of an integer id — ANSI-mode
    safe (max intermediate 2^31 × Knuth < 2^63) and replayable in any
    SQL engine: ((pmod(id, 2^31)) * 2654435761) % 2^32. Both inner and
    outer reductions use NON-NEGATIVE modulo (Spark/DuckDB `%` keeps the
    dividend's sign, which would make every negative id hash negative
    and pass any `< rate` cut unconditionally)."""
    inner = ((id_col % F.lit(_M31)) + F.lit(_M31)) % F.lit(_M31)
    return (inner * F.lit(_KNUTH)) % F.lit(_M32)


def domain_downsample(
    docs: DataFrame,
    host_col: str = "host",
    id_col: str = "doc_id",
    cap: int = 10,
) -> DataFrame:
    """Cap each host's EXPECTED contribution at ``cap`` documents: a doc
    survives iff hash_u32(id) / 2^32 < cap / n_host, evaluated as the
    exact integer cross-product hash * n_host < cap * 2^32 (no float
    anywhere, so the decision is bit-reproducible). Hosts at or under
    the cap keep everything.

    Plan: one host-count aggregate joined back on the host key — the
    count side is host-cardinality-sized (no broadcast hint: AQE
    converts when it is actually small; at web scale with ~1e8 hosts
    the shuffle join on the same key the aggregate produced is the
    right plan), then a codegen filter. Returns the surviving rows."""
    counts = docs.groupBy(host_col).agg(F.count(F.lit(1)).alias("_n_host"))
    keep = hash_u32_expr(F.col(id_col)) * F.col("_n_host") < F.lit(
        cap * _M32
    )
    return (
        docs.join(counts, host_col)
        .where(keep)
        .drop("_n_host")
    )
