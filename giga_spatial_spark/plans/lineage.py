"""Per-partition lineage checkpoints with kill-resume.

North-rule requirement: every stage checkpoints per-partition lineage
(work unit, row counts, content hashes) so a killed job resumes without
recomputing completed units. Reference analogues: skip-if-exists
availability checks (handlers/base.py:848-954) and cache-or-compute
(google_ms_combined_buildings.py:787-800).

This sandbox has no Iceberg jars, so the design degrades exactly as
SURVEY.md §7 planned: data as parquet partitioned by work unit, lineage as
an append-only JSONL manifest (the stand-in for the Iceberg metadata
table). Behavior is identical — the driver anti-joins pending work units
against the manifest before launching; a unit becomes visible atomically
(tmp-write + rename of its manifest entry) only after its parquet is
committed.

Work unit = any coarse key (tile prefix, input file, partition id). The
content hash is an order-independent 64-bit fold (sum of xxhash64 over all
row structs in the unit) so resume verification is O(rows) and
shuffle-free (map-side partial agg).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageStage:
    def __init__(self, stage_dir: str, unit_col: str = "unit"):
        self.stage_dir = stage_dir
        self.unit_col = unit_col
        self.data_dir = os.path.join(stage_dir, "data")
        self.manifest_dir = os.path.join(stage_dir, "manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # ------------------------------------------------------------ manifest
    def completed_units(self) -> dict[str, dict]:
        done: dict[str, dict] = {}
        for fn in sorted(os.listdir(self.manifest_dir)):
            if not fn.endswith(".jsonl"):
                continue
            with open(os.path.join(self.manifest_dir, fn)) as f:
                for line in f:
                    rec = json.loads(line)
                    done[str(rec["unit"])] = rec
        return done

    def _append_manifest(self, records: list[dict]) -> None:
        """Atomic append: write a new jsonl then rename into place."""
        tmp = os.path.join(self.manifest_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            for rec in records:
                f.write(json.dumps(rec) + "\n")
        os.rename(tmp, os.path.join(self.manifest_dir, f"{uuid.uuid4().hex}.jsonl"))

    # ------------------------------------------------------------ execution
    def run(
        self,
        source: DataFrame,
        transform,
        extra_meta: dict | None = None,
    ) -> int:
        """Process only work units absent from the manifest.

        source must carry unit_col; transform(df)->df must preserve it.
        Returns the number of units processed this invocation (0 = fully
        resumed).
        """
        unit = self.unit_col
        done = set(self.completed_units())
        todo_units = [
            r[0]
            for r in source.select(unit).distinct().collect()
            if str(r[0]) not in done
        ]
        if not todo_units:
            return 0
        pending = source.where(F.col(unit).isin(todo_units))
        result = transform(pending)
        # Idempotent unit write: a kill between the parquet job commit and
        # _append_manifest leaves committed-but-unmanifested data; the resumed
        # run re-executes the unit, and dynamic partition overwrite REPLACES
        # (not appends to) exactly the unit partitions it recomputes, so
        # read() never serves duplicated rows (exactly-once kill-resume).
        spark = result.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                result.write.mode("overwrite")
                .partitionBy(unit)
                .parquet(self.data_dir)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        # lineage facts from what was just written (read-back = what a
        # resumed job would see)
        written = (
            result.sparkSession.read.parquet(self.data_dir)
            .where(F.col(unit).isin(todo_units))
        )
        hash_cols = [c for c in written.columns]
        stats = (
            written.groupBy(unit)
            .agg(
                F.count(F.lit(1)).alias("row_count"),
                # decimal sum: order-independent, exact, overflow-proof
                # under ANSI mode even at 10^12 rows per unit
                F.sum(F.xxhash64(F.struct(*hash_cols)).cast("decimal(38,0)")).alias(
                    "content_hash"
                ),
            )
            .collect()
        )
        now = time.time()
        self._append_manifest(
            [
                {
                    "unit": str(r[unit]),
                    "row_count": r["row_count"],
                    "content_hash": int(r["content_hash"]) if r["content_hash"] is not None else 0,
                    "ts": now,
                    **(extra_meta or {}),
                }
                for r in stats
            ]
        )
        return len(stats)

    def read(self, spark: SparkSession) -> DataFrame:
        """Read only manifest-committed units (uncommitted partials from a
        killed job are invisible)."""
        done = list(self.completed_units())
        df = spark.read.parquet(self.data_dir)
        return df.where(F.col(self.unit_col).cast("string").isin(done))
