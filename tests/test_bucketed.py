"""Bucketed co-located join: no shuffle exchange in the join plan, and
results equal the plain join."""

from pyspark.sql import functions as F

from giga_spatial_spark import cells, synth
from giga_spatial_spark.sources.bucketed import (
    join_is_shuffle_free,
    read_table,
    write_bucketed,
)

from .conftest import SF_DIR


def test_bucketed_join_no_shuffle(spark):
    docs = synth.with_coords(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id"
    ).withColumn("tile", cells.tile_id(F.col("lon"), F.col("lat"), 5))
    fac = synth.facilities_df(spark, SF_DIR).withColumn(
        "tile", cells.tile_id(F.col("flon"), F.col("flat"), 5)
    )
    write_bucketed(docs.select("doc_id", "tile"), "b_docs", n_buckets=8)
    write_bucketed(fac.select("facility_id", "tile"), "b_fac", n_buckets=8)

    l = read_table(spark, "b_docs")
    r = read_table(spark, "b_fac")
    joined = l.join(r, "tile")
    joined.collect()  # force planning + execution
    assert join_is_shuffle_free(joined), (
        joined._jdf.queryExecution().executedPlan().toString()[:2000]
    )

    plain = docs.select("doc_id", "tile").join(
        fac.select("facility_id", "tile"), "tile"
    )
    got = sorted(map(tuple, joined.select("doc_id", "facility_id").collect()))
    want = sorted(map(tuple, plain.select("doc_id", "facility_id").collect()))
    assert got == want
