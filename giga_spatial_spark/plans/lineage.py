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

When `cover=(lat_col, lon_col, res)` is given, each manifest record also
carries the unit's COMPACT geodesic H3 cover (north-rule lineage fields:
input file, H3 cover, row counts, content hashes) — the distinct res-R
cells its rows touch, hierarchy-compacted and stored as H3 hex strings, so
a resumed or downstream job can partition-prune against a unit without
touching its data. Scale posture: the driver materialization is the
DISTINCT (unit, cell) set, bounded by the cover resolution (res ≤ 5 ≈ 2M
cells globally, thousands per realistic unit), never by row count; cell
assignment is the stateless Arrow kernel and the distinct is one map-side
partial-agg shuffle.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class LineageStage:
    def __init__(
        self,
        stage_dir: str,
        unit_col: str = "unit",
        cover: tuple[str, str, int] | None = None,
    ):
        self.stage_dir = stage_dir
        self.unit_col = unit_col
        self.cover = cover
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
        covers = self._unit_covers(written) if self.cover is not None else {}
        now = time.time()
        self._append_manifest(
            [
                {
                    "unit": str(r[unit]),
                    "row_count": r["row_count"],
                    "content_hash": int(r["content_hash"]) if r["content_hash"] is not None else 0,
                    "ts": now,
                    **(
                        {"h3_cover": covers.get(str(r[unit]), [])}
                        if self.cover is not None
                        else {}
                    ),
                    **(extra_meta or {}),
                }
                for r in stats
            ]
        )
        return len(stats)

    def _unit_covers(self, written: DataFrame) -> dict[str, list[str]]:
        """Per-unit compact H3 cover of the rows just written. Distinct
        (unit, cell) before the collect — driver memory is bounded by the
        cover resolution's cell count, not by rows."""
        import numpy as np

        from .. import cells_h3

        lat_c, lon_c, res = self.cover
        if lat_c not in written.columns or lon_c not in written.columns:
            raise ValueError(
                f"lineage cover columns ({lat_c}, {lon_c}) not in written "
                f"schema {written.columns}"
            )
        unit = self.unit_col
        tagged = cells_h3.assign_cells_df(
            written.select(unit, lat_c, lon_c).where(
                F.col(lat_c).isNotNull() & F.col(lon_c).isNotNull()
            ),
            res,
            lon=lon_c,
            lat=lat_c,
            out_col="_cover_cell",
        )
        by_unit: dict[str, list[int]] = {}
        for r in tagged.select(unit, "_cover_cell").distinct().collect():
            by_unit.setdefault(str(r[0]), []).append(int(r[1]))
        return {
            u: sorted(
                cells_h3.h3_to_string(
                    cells_h3.compact(np.asarray(sorted(cells), dtype=np.int64))
                ).tolist()
            )
            for u, cells in by_unit.items()
        }

    def read(self, spark: SparkSession) -> DataFrame:
        """Read only manifest-committed units (uncommitted partials from a
        killed job are invisible)."""
        done = list(self.completed_units())
        df = spark.read.parquet(self.data_dir)
        return df.where(F.col(self.unit_col).cast("string").isin(done))
