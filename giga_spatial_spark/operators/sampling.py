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


def domain_keep_expr(id_col: Column, n_host: Column, cap: int) -> Column:
    """Exact integer keep predicate hash_u32(id) · n_host < cap · 2^32,
    computed in decimal(38,0) so no host cardinality can overflow int64
    (38 digits hold 2^32 · 2^63 with room to spare)."""
    dec = "decimal(38,0)"
    return hash_u32_expr(id_col).cast(dec) * n_host.cast(dec) < F.lit(
        cap * _M32
    ).cast(dec)


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
    right plan), then a codegen filter. Returns the surviving rows.

    The cross-product is evaluated in decimal(38,0): the int64 form
    hash (≤ 2^32−1) × n_host overflows — an ANSI-mode exception — once
    a single host exceeds ~2.1e9 documents, plausible at the module's
    stated web-scale posture (round-6 advisory). Same predicate, no
    bound."""
    counts = docs.groupBy(host_col).agg(F.count(F.lit(1)).alias("_n_host"))
    keep = domain_keep_expr(F.col(id_col), F.col("_n_host"), cap)
    return (
        docs.join(counts, host_col)
        .where(keep)
        .drop("_n_host")
    )
