"""Structured Streaming pipelines.

The reference is batch-only (SURVEY.md §2.10); the engine adds the
streaming analog of its batch operators for incremental ingest:

  - ``windowed_event_counts``: watermarked tumbling-window aggregation over
    the events stream — the streaming twin of q_events_hourly (identical
    results on the same data once the watermark closes).
  - ``streaming_enrich``: the flagship enrichment (extract → entities →
    tile → PIP tag) as a stateless streaming transform — every stage is a
    narrow map / broadcast join, so it runs unchanged under readStream.

Tests drive these with a file source over the same parquet the batch
queries use and compare against the batch answer (exactly-once semantics
of the file source + deterministic kernels ⇒ equal results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    # watermarks require TIMESTAMP (with zone); parquet often carries NTZ.
    # Session tz is pinned to UTC so the cast is value-preserving.
    events_stream = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("value_cents"),
        )
        .select(
            F.col("w.start").alias("hour"),
            "event_type",
            "event_count",
            "value_cents",
        )
    )


def streaming_exact_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup — first document per md5(text) digest survives
    (the streaming twin of dedup.exact_dedup's survivor semantics, but
    arrival-order: Structured Streaming's native dropDuplicates keeps the
    first-seen row per key with state-store backing).

    With an event-time column the digest state is watermark-bounded via
    dropDuplicatesWithinWatermark (Spark evicts digests older than the
    watermark — the standard unbounded-stream dedup pattern); without one
    the state grows with distinct digests (only appropriate for bounded
    backfills)."""
    out = docs_stream.withColumn("digest", F.md5(F.col(text_col).cast("binary")))
    if event_time_col is not None:
        out = out.withColumn(
            event_time_col, F.col(event_time_col).cast("timestamp")
        ).withWatermark(event_time_col, watermark)
        return out.dropDuplicatesWithinWatermark(["digest"])
    return out.dropDuplicates(["digest"])


def streaming_enrich(pages_stream: DataFrame, admin_polys, tile_zoom: int = 8,
                     pip_zoom: int = 6) -> DataFrame:
    """Stateless streaming enrichment: per-microbatch rows of
    (url, zone_id, tile). Aggregation left to the sink side (or a
    downstream watermarked agg) — the PIP join is a broadcast join, legal
    in streaming plans."""
    from ..cells import tile_id
    from ..operators.pip_join import pip_join_rtree
    from ..pipeline import entity_points, extract_stage

    pts = entity_points(extract_stage(pages_stream))
    tagged = pip_join_rtree(pts, admin_polys, zoom=pip_zoom, convex=True)
    return tagged.withColumn("tile", tile_id(F.col("lon"), F.col("lat"), tile_zoom))


def h3_windowed_counts(
    events_stream: DataFrame,
    res: int = 4,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window per-GEODESIC-H3-CELL event counts —
    the streaming twin of q_h3_events (grid rollup of an event stream;
    the reference is batch-only, SURVEY §2.10, and its grid is H3 —
    grid/h3.py). The H3 assignment is the stateless Arrow kernel
    (cells_h3.assign_cells_df — mapInPandas is a narrow streaming
    transform), so the only stateful operator is the windowed count."""
    from .. import cells_h3, synth

    ev = events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
    ev = synth.with_coords(ev, "event_id")
    tagged = cells_h3.assign_cells_df(ev, res)
    return (
        tagged.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "h3_cell")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.col("w.start").alias("hour"), "h3_cell", "event_count"
        )
    )
