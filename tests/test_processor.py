"""Pluggable EntityProcessor: 12-step pipeline as one plan + registry."""

import pytest
from pyspark.sql import functions as F

from giga_spatial_spark.processor import EntityProcessor, EntityProcessorConfig


@EntityProcessor.register("school")
class SchoolProcessor(EntityProcessor):
    config = EntityProcessorConfig(
        rename_map={"School_Name": "name", "GPS": "gps"},
        nfkc_columns=["name"],
        string_columns=["name", "status"],
        merged_coord_column="gps",
        numeric_columns=["enrollment"],
        enum_aliases={"status": {"op": "open", "cl": "closed"}},
        titlecase_columns=["admin1"],
        validate_coordinates=True,
        id_source_columns=["name", "admin1"],
        drop_all_null_subset=["name", "status"],
        dedup_columns=["entity_id"],
    )


def test_full_pipeline(spark):
    df = spark.createDataFrame(
        [
            ("  Ｓｔ．Ｍａｒｙ ", "OP", "12.5, -1.25", "40", " nairobi west "),
            ("  Ｓｔ．Ｍａｒｙ ", "OP", "12.5, -1.25", "40", " nairobi west "),  # dup
            ("Hill School", "CL", "bogus", "n/a", "UNKNOWN"),
            ("NA", "NA", None, None, None),  # all-null after cleaning
        ],
        "School_Name string, STATUS string, GPS string, enrollment string, admin1 string",
    )
    proc = EntityProcessor.for_entity("school")
    out = proc(df).collect()
    rows = {r["name"]: r for r in out}
    assert len(out) == 2  # dup collapsed, all-null dropped
    mary = rows["st.mary"]  # NFKC folds fullwidth, clean lowers
    assert mary["status"] == "open"
    assert mary["latitude"] == 12.5 and mary["longitude"] == -1.25
    assert mary["enrollment"] == 40.0
    assert mary["admin1"] == "Nairobi West"
    assert mary["coord_status"] == "ok"
    assert len(mary["entity_id"]) == 36
    hill = rows["hill school"]
    assert hill["status"] == "closed"
    assert hill["enrollment"] is None  # try_cast of a cleaned-to-null value
    assert hill["admin1"] is None  # unknown sentinel
    assert hill["coord_status"] == "missing"


def test_registry_and_hooks(spark):
    with pytest.raises(KeyError, match="no EntityProcessor registered"):
        EntityProcessor.for_entity("nope")

    @EntityProcessor.register("tagged")
    class Tagged(EntityProcessor):
        config = EntityProcessorConfig(string_columns=["v"])

        def post_process(self, df):
            return df.withColumn("tag", F.lit("x"))

    df = spark.createDataFrame([(" A ",)], "v string")
    out = EntityProcessor.for_entity("tagged")(df).collect()[0]
    assert out["v"] == "a" and out["tag"] == "x"


def test_determinism_of_ids(spark):
    df = spark.createDataFrame([("a", "b")], "name string, admin1 string")
    cfg = EntityProcessorConfig(id_source_columns=["name", "admin1"])

    class P(EntityProcessor):
        config = cfg

    id1 = P()(df).collect()[0]["entity_id"]
    id2 = P()(df).collect()[0]["entity_id"]
    assert id1 == id2
