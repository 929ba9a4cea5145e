"""Bucketed (co-located) tables for repeated tile-keyed joins.

SURVEY.md §4 / build brief: "repartition/bucketing for co-located joins".
When two large tables are repeatedly joined on the tile key (e.g. entity
points vs a large facility layer at the same zoom), bucketing both by that
key at write time removes the shuffle from EVERY subsequent join — the
Iceberg equivalent is a bucket partition transform.

Local catalog note: `bucketBy` requires `saveAsTable` (bucket metadata
lives in the session catalog); the parquet lands under spark-warehouse/.
"""

from __future__ import annotations

import shutil
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession


def _drop_table_and_location(spark: SparkSession, table: str) -> None:
    """Drop the catalog entry AND any orphaned warehouse directory. A fresh
    derby metastore does not know about tables a previous session wrote, but
    their parquet locations survive on disk — saveAsTable then fails with
    LOCATION_ALREADY_EXISTS. Idempotent writes must clear both.

    Location resolution order (round-2 advisor fix): if the table exists,
    ask the catalog for its real LOCATION; otherwise derive the default
    warehouse path, honoring qualified `db.table` names. Only file:// (or
    scheme-less local) locations are rmtree'd — hdfs://, s3a:// etc. are
    left to the catalog DROP, which owns remote data for managed tables."""
    location = None
    if spark.catalog.tableExists(table):
        try:
            location = next(
                r["data_type"]
                for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
                if r["col_name"] == "Location"
            )
        except StopIteration:
            location = None
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if location is None:
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        parts = table.lower().split(".")
        name = parts[-1]
        db = parts[-2] if len(parts) > 1 and parts[-2] != "default" else None
        location = f"{warehouse}/{db}.db/{name}" if db else f"{warehouse}/{name}"
    scheme = urlparse(location).scheme
    if scheme in ("", "file"):
        shutil.rmtree(urlparse(location).path or location, ignore_errors=True)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "tile",
    n_buckets: int = 16,
    sort: bool = True,
) -> str:
    _drop_table_and_location(df.sparkSession, table)
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.format("parquet").saveAsTable(table)
    return table


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the physical plan contains no shuffle exchange — the
    bucketing evidence the tests assert on."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
