"""Entity layer — typed Gold tables with constraint validation + quarantine.

Reference: Pydantic per-row validation in EntityTable (core/schemas/
entity.py:95-253, validation loop :378-408 where failing rows are skipped
and logged), deterministic UUID3 entity ids (entity_processor.py:1083-1179,
namespace core/schemas/shared.py:280).

Spark mapping (SURVEY.md §1 row 1): constraints are column predicates;
validation is a single pass splitting valid rows from a quarantine
side-output carrying the violated-constraint name — no per-row Python.
"""

from __future__ import annotations

import uuid

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# fixed namespace for deterministic ids (role of shared.py:280)
ENTITY_NAMESPACE = uuid.UUID("6ba7b810-9dad-11d1-80b4-00c04fd430c8")  # uuid.NAMESPACE_DNS


@F.pandas_udf(StringType())
def uuid3_id(key: pd.Series) -> pd.Series:
    """Deterministic UUID3 over the concatenated source columns — same
    reproducibility requirement as entity_processor.py:1155-1161."""
    return key.map(
        lambda s: str(uuid.uuid3(ENTITY_NAMESPACE, s)) if s is not None else None
    )


def with_entity_id(df: DataFrame, cols: list[str], id_col: str = "entity_id") -> DataFrame:
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
    return df.withColumn(id_col, uuid3_id(key))


# standard constraint set mirroring GigaEntity field validators
# (entity.py:115-155): lat/lon range, non-empty name, bounded length
def standard_point_constraints(lat: str = "lat", lon: str = "lon") -> dict[str, Column]:
    return {
        "lat_range": (F.col(lat) >= -90) & (F.col(lat) <= 90),
        "lon_range": (F.col(lon) >= -180) & (F.col(lon) <= 180),
        "not_null_island": ~((F.col(lat) == 0.0) & (F.col(lon) == 0.0)),
        "coords_present": F.col(lat).isNotNull() & F.col(lon).isNotNull(),
    }


def validate(
    df: DataFrame, constraints: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """One-pass split into (valid, quarantine). Quarantine rows carry
    `violations: array<string>` naming every failed constraint — richer
    than the reference's skip-and-log (entity.py:389-399) but same
    keep/drop decision."""
    viol = F.array_compact(
        F.array(
            *[
                F.when(~cond, F.lit(name)).otherwise(F.lit(None))
                for name, cond in constraints.items()
            ]
        )
    )
    tagged = df.withColumn("violations", viol)
    valid = tagged.where(F.size("violations") == 0).drop("violations")
    quarantine = tagged.where(F.size("violations") > 0)
    return valid, quarantine
