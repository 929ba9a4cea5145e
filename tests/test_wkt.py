import numpy as np
from pyspark.sql import functions as F

from giga_spatial_spark.functions.wkt import (
    parse_point,
    parse_polygon,
    point_wkt,
    polygon_wkt,
    wkt_point_coords,
)


def test_wkt_point_roundtrip():
    assert parse_point("POINT (2.35 48.85)") == (2.35, 48.85)
    assert parse_point(point_wkt(-74.0, 40.71)) == (-74.0, 40.71)
    assert parse_point("LINESTRING (0 0, 1 1)") is None
    assert parse_point(None) is None


def test_wkt_polygon_roundtrip():
    poly = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
    back = parse_polygon(polygon_wkt(poly))
    assert np.allclose(back, poly)
    assert parse_polygon("POLYGON ((0 0, 1 1))") is None  # degenerate


def test_wkt_udf(spark):
    df = spark.createDataFrame(
        [("POINT (10 20)",), ("garbage",), (None,)], "wkt string"
    )
    out = df.select(wkt_point_coords("wkt").alias("c")).toPandas()
    assert list(out["c"][0]) == [10.0, 20.0]
    assert out["c"][1] is None and out["c"][2] is None
