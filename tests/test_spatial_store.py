"""Partition-pruning evidence: the pruned scan reads strictly fewer files
and returns exactly the rows the full scan + filter would."""

import os
import shutil
import tempfile

import numpy as np
from pyspark.sql import functions as F

from giga_spatial_spark import synth
from giga_spatial_spark.geometry import convex_contains
from giga_spatial_spark.sources.spatial_store import (
    HEX_PARTITION_COL,
    PARTITION_COL,
    read_points_hex_pruned,
    read_points_pruned,
    write_points_hex_partitioned,
    write_points_partitioned,
)

from .conftest import SF_DIR


def test_partition_pruning(spark):
    tmp = tempfile.mkdtemp(prefix="store_")
    try:
        pts = synth.with_coords(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id"
        ).select("doc_id", "lon", "lat")
        path = os.path.join(tmp, "points")
        write_points_partitioned(pts, path)

        poly = synth.make_admin_polygons()[0]
        pruned = read_points_pruned(spark, path, poly)

        # pruning is visible at the file level: input_file_name() reflects
        # the files actually scanned after partition pruning
        all_files = {
            r[0]
            for r in spark.read.parquet(path)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        pruned_files = {
            r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
        }
        assert pruned_files and pruned_files < all_files

        # and the partition filter reaches the scan node
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan

        # correctness: pruned scan ⊇ exact polygon containment set
        got = pruned.toPandas()
        full = pts.toPandas()
        inside = full[
            convex_contains(poly, full["lon"].to_numpy(), full["lat"].to_numpy())
        ]
        assert set(inside["doc_id"]) <= set(got["doc_id"])
        # and nothing outside the cover partitions leaks in
        assert set(got[PARTITION_COL].astype(str).unique()) <= {
            os.path.basename(os.path.dirname(f)).split("=")[1] for f in pruned_files
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_hex_partition_pruning(spark):
    """Hex-grid store layout: the overlap-mode polyfill cover prunes
    partitions at the file index and never drops an in-polygon point."""
    tmp = tempfile.mkdtemp(prefix="hexstore_")
    try:
        pts = synth.with_coords(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id"
        ).select("doc_id", "lon", "lat")
        path = os.path.join(tmp, "points")
        write_points_hex_partitioned(pts, path, res=2)

        poly = synth.make_admin_polygons()[0]
        pruned = read_points_hex_pruned(spark, path, poly, res=2)

        all_files = {
            r[0]
            for r in spark.read.parquet(path)
            .select(F.input_file_name())
            .distinct()
            .collect()
        }
        pruned_files = {
            r[0] for r in pruned.select(F.input_file_name()).distinct().collect()
        }
        assert pruned_files and pruned_files < all_files
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan

        got = pruned.toPandas()
        full = pts.toPandas()
        inside = full[
            convex_contains(poly, full["lon"].to_numpy(), full["lat"].to_numpy())
        ]
        assert set(inside["doc_id"]) <= set(got["doc_id"])
        assert set(got[HEX_PARTITION_COL].astype(str).unique()) <= {
            os.path.basename(os.path.dirname(f)).split("=")[1] for f in pruned_files
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
