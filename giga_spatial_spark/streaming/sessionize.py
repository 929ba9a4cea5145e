"""Custom stateful streaming operator: event sessionization.

The reference has no streaming (SURVEY.md §2.10); this is the engine's
`applyInPandasWithState` showcase — per-user session windows with a gap
timeout, the canonical custom stateful operator the build brief calls for.
A batch twin (`sessionize_batch`, plain window functions) exists so the
stateful path is verifiable against a deterministic oracle.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("event_count", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("count", LongType()),
    ]
)


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Streaming sessionization with processing-time timeout: a session
    closes (and is emitted) when no event arrives for `gap_minutes`."""
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            (start_us, end_us, count) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "event_count": [count],
                }
            )
            return
        rows = pd.concat(list(pdfs))
        ts_us = rows["ts"].astype("int64") // 1000
        lo, hi, n = int(ts_us.min()), int(ts_us.max()), len(rows)
        if state.exists:
            (start_us, end_us, count) = state.get
            lo, hi, n = min(lo, start_us), max(hi, end_us), n + count
        state.update((lo, hi, n))
        state.setTimeoutDuration(gap_minutes * 60 * 1000)
        yield pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "session_start": pd.Series([], dtype="datetime64[ns]"),
                "session_end": pd.Series([], dtype="datetime64[ns]"),
                "event_count": pd.Series([], dtype="int64"),
            }
        )

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Batch twin: gap-based sessions via lag + cumulative session ids —
    the deterministic oracle for the stateful operator."""
    from pyspark.sql.window import Window

    # secondary key stabilizes ordering under equal timestamps; interval
    # comparison (not unix_timestamp) keeps the gap test independent of the
    # session timezone for TIMESTAMP_NTZ inputs
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        events.withColumn("__prev", F.lag("ts").over(w))
        .withColumn(
            "__new_sess",
            (
                F.col("__prev").isNull()
                | (
                    F.col("ts") - F.col("__prev")
                    > F.expr(f"INTERVAL {gap_minutes} MINUTES")
                )
            ).cast("int"),
        )
        .withColumn(
            "__sess_id",
            F.sum("__new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    return marked.groupBy("user_id", "__sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).cast("long").alias("event_count"),
    ).drop("__sess_id")


PACK_SCHEMA = StructType(
    [
        StructField("shard", LongType()),
        StructField("doc_id", LongType()),
        StructField("n_tokens", LongType()),
        StructField("bin", LongType()),
    ]
)

PACK_STATE_SCHEMA = StructType(
    [
        StructField("cur_bin", LongType()),
        StructField("cur_fill", LongType()),
        StructField("max_doc_id", LongType()),
    ]
)


def pack_greedy_stream(docs: DataFrame, budget: int) -> DataFrame:
    """STREAMING greedy sequence packing — the stateful twin of
    operators/packing.pack_greedy: per shard, documents arriving across
    micro-batches keep filling the current context-window bin, opening a
    new one whenever the next doc would overflow. State per shard is
    just (current bin, current fill, high-water doc id) — constant, so
    watermarkless processing-time streaming is safe at any corpus size.
    Docs are processed in doc_id order WITHIN a micro-batch; an
    out-of-order doc arriving in a LATER micro-batch simply packs into
    the current bin (bins already emitted are never rewritten — append
    semantics), and the high-water doc id rides in the state for
    observability of such arrivals. Exactly-once packing across
    restarts comes from Structured Streaming's checkpointed state."""

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("doc_id")
        if state.exists:
            cur_bin, cur_fill, hwm = state.get
        else:
            cur_bin, cur_fill, hwm = 0, 0, -1
        out_bins = []
        for did, tok in zip(
            rows["doc_id"].astype("int64"), rows["n_tokens"].astype("int64")
        ):
            t = int(tok)
            if cur_fill > 0 and cur_fill + t > budget:
                cur_bin += 1
                cur_fill = 0
            out_bins.append(cur_bin)
            cur_fill += t
            hwm = max(hwm, int(did))
        state.update((int(cur_bin), int(cur_fill), int(hwm)))
        yield pd.DataFrame(
            {
                "shard": key[0],
                "doc_id": rows["doc_id"].astype("int64").to_numpy(),
                "n_tokens": rows["n_tokens"].astype("int64").to_numpy(),
                "bin": out_bins,
            }
        )

    return docs.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=PACK_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
