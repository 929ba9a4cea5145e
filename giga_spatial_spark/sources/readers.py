"""Format-dispatch readers — reference read_dataset
(gigaspatial/core/io/readers.py:208-407): extension-sniffed dispatch over
CSV/JSON/NDJSON/Parquet (+gzip), geo formats normalized to parquet-with-WKT
at ingest. The DataStore abstraction (core/io/data_store.py) collapses into
spark.read, as SURVEY.md §1 planned."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_dataset(spark: SparkSession, path: str, **options) -> DataFrame:
    """Dispatch on extension (compression sniffed by Spark natively)."""
    name = path.lower()
    for gz in (".gz", ".bz2", ".xz"):
        if name.endswith(gz):
            name = name[: -len(gz)]
            break
    if name.endswith(".parquet") or name.endswith(".pq"):
        return spark.read.parquet(path)
    if name.endswith(".csv") or name.endswith(".tsv"):
        sep = "\t" if name.endswith(".tsv") else ","
        return spark.read.options(header=True, inferSchema=True, sep=sep, **options).csv(path)
    if name.endswith(".ndjson") or name.endswith(".jsonl"):
        return spark.read.options(**options).json(path)
    if name.endswith(".json"):
        return spark.read.options(multiLine=True, **options).json(path)
    raise ValueError(f"unsupported dataset format: {path}")


def read_datasets(spark: SparkSession, paths: list[str], **options) -> DataFrame:
    """Multi-path read with error accumulation (reference readers.py:441-471):
    unions per-path frames; raises with the full error list if any fail."""
    frames, errors = [], []
    for p in paths:
        try:
            frames.append(read_dataset(spark, p, **options))
        except Exception as e:  # noqa: BLE001 — accumulate like the reference
            errors.append((p, str(e)))
    if errors:
        raise ValueError(f"failed to read {len(errors)} dataset(s): {errors}")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out


def write_dataset(df: DataFrame, path: str, fmt: str | None = None, mode: str = "overwrite") -> str:
    """Dispatch-write (reference writers.py:31-133)."""
    if fmt is None:
        ext = os.path.splitext(path)[1].lstrip(".").lower()
        fmt = {"pq": "parquet"}.get(ext, ext or "parquet")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", True)
    writer.save(path)
    return path
