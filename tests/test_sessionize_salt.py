"""Stateful sessionization + salted aggregation correctness."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from giga_spatial_spark.pipeline import salted_count
from giga_spatial_spark.streaming.sessionize import (
    sessionize_batch,
    sessionize_stream,
)

from .conftest import SF_DIR


def test_sessionize_batch_properties(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    sess = sessionize_batch(ev, gap_minutes=30).toPandas()
    # total events conserved
    assert sess["event_count"].sum() == ev.count()
    # sessions are well-formed and per-user non-overlapping
    assert (sess["session_end"] >= sess["session_start"]).all()
    for _, g in sess.groupby("user_id"):
        g = g.sort_values("session_start")
        gaps = (
            g["session_start"].iloc[1:].reset_index(drop=True)
            - g["session_end"].iloc[:-1].reset_index(drop=True)
        ).dt.total_seconds()
        assert (gaps > 0).all()


def test_sessionize_stream_runs_stateful(spark):
    """The applyInPandasWithState operator starts, consumes a microbatch and
    maintains state without error (deterministic output equivalence is
    carried by the batch twin's DuckDB oracle, q_sessionize)."""
    tmp = tempfile.mkdtemp(prefix="sess_")
    try:
        src = os.path.join(tmp, "src")
        os.makedirs(src)
        shutil.copy(f"{SF_DIR}/events.parquet", src)
        schema = spark.read.parquet(f"{SF_DIR}/events.parquet").schema
        stream = spark.readStream.schema(schema).format("parquet").load(src)
        q = (
            sessionize_stream(stream, gap_minutes=30)
            .writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # with a single microbatch no session times out yet → no rows, but
        # the stateful operator must have committed its state cleanly
        assert q.lastProgress is not None
        n = spark.sql("select count(*) from sessions_out").collect()[0][0]
        assert n >= 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_salted_count_equals_plain_groupby(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    salted = (
        salted_count(ev, ["event_type"], "n", buckets=8)
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    plain = (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .toPandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    assert salted.equals(plain)
