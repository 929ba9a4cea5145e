"""WKB codec round-trips (both byte orders, holes, multis) and
GeoJSON / GeoParquet-style ingest — reference geometry-at-parse-time
(entity.py:176-212) and geo-format readers (readers.py:122-175, 208-407)."""

import json
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from giga_spatial_spark import synth
from giga_spatial_spark.functions import wkb
from giga_spatial_spark.sources.readers import read_dataset, read_geojson

RING = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0], [0.0, 3.0]])
HOLE = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])


def test_point_roundtrip():
    buf = wkb.dump_point(12.3456789012345, -7.000000001)
    t, c = wkb.parse_wkb(buf)
    assert t == "Point" and c[0] == 12.3456789012345 and c[1] == -7.000000001
    # hex input path
    t2, c2 = wkb.parse_wkb(buf.hex())
    assert t2 == "Point" and (c2 == c).all()


def test_polygon_roundtrip_with_holes():
    buf = wkb.dump_polygon([RING, HOLE])
    t, rings = wkb.parse_wkb(buf)
    assert t == "Polygon" and len(rings) == 2
    assert np.array_equal(rings[0], RING) and np.array_equal(rings[1], HOLE)


def test_multipolygon_roundtrip():
    buf = wkb.dump_multipolygon([[RING], [HOLE]])
    t, polys = wkb.parse_wkb(buf)
    assert t == "MultiPolygon" and len(polys) == 2
    assert np.array_equal(polys[0][0], RING)


def test_big_endian_parse():
    # hand-packed XDR point
    buf = struct.pack(">BIdd", 0, 1, 1.5, -2.5)
    t, c = wkb.parse_wkb(buf)
    assert t == "Point" and c[0] == 1.5 and c[1] == -2.5


def test_linestring_and_errors():
    ls = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 0.5]])
    t, c = wkb.parse_wkb(wkb.dump_linestring(ls))
    assert t == "LineString" and np.array_equal(c, ls)
    with pytest.raises(ValueError):
        wkb.parse_wkb(struct.pack("<BI", 1, 99))


def test_iso_z_types_parse_xy():
    # ISO WKB Z: LineString Z (type 1002) with 3 doubles per vertex — the
    # round-2 advisor case where Z previously interleaved into x/y.
    pts = [(0.0, 1.0, 9.0), (2.0, 3.0, 8.0), (4.0, 5.0, 7.0)]
    buf = struct.pack("<BII", 1, 1002, len(pts))
    for x, y, z in pts:
        buf += struct.pack("<ddd", x, y, z)
    t, c = wkb.parse_wkb(buf)
    assert t == "LineString"
    assert np.array_equal(c, np.array([[0, 1], [2, 3], [4, 5]], dtype=float))

    # Point ZM (3001): 4 doubles, keep xy
    buf = struct.pack("<BIdddd", 1, 3001, 1.5, -2.5, 10.0, 20.0)
    t, c = wkb.parse_wkb(buf)
    assert t == "Point" and c[0] == 1.5 and c[1] == -2.5

    # MultiLineString Z (1005): stream must stay aligned across members
    m = struct.pack("<BII", 1, 1005, 2)
    for member in (pts, [(9.0, 8.0, 1.0), (7.0, 6.0, 2.0)]):
        m += struct.pack("<BII", 1, 1002, len(member))
        for x, y, z in member:
            m += struct.pack("<ddd", x, y, z)
    t, parts = wkb.parse_wkb(m)
    assert t == "MultiLineString" and len(parts) == 2
    assert np.array_equal(parts[1], np.array([[9, 8], [7, 6]], dtype=float))


def test_ewkb_flags_and_srid():
    # EWKB point with Z flag + SRID flag: 0x80000000 | 0x20000000 | 1
    gtype = 0x80000000 | 0x20000000 | 1
    buf = struct.pack("<BIIddd", 1, gtype, 4326, 3.25, -4.5, 100.0)
    t, c = wkb.parse_wkb(buf)
    assert t == "Point" and c[0] == 3.25 and c[1] == -4.5
    # unsupported ISO offset still raises
    with pytest.raises(ValueError):
        wkb.parse_wkb(struct.pack("<BIdd", 1, 4001, 0.0, 0.0))


def test_with_parsed_rings_spark(spark):
    polys = synth.make_admin_polygons()
    rows = [(zid, bytearray(wkb.dump_polygon(p))) for zid, p in sorted(polys.items())]
    rows.append((999, None))  # NULL geometry must survive as NULL rings
    rows.append((998, bytearray(b"\x01\xff")))  # garbage → NULL, not crash
    df = spark.createDataFrame(rows, "zone_id int, geom binary")
    out = {r["zone_id"]: r["rings"] for r in wkb.with_parsed_rings(df).collect()}
    assert out[999] is None and out[998] is None
    for zid, p in polys.items():
        got = np.array(out[zid][0])
        # reader normalizes winding (outer CW); vertices survive exactly
        assert np.array_equal(got, p) or np.array_equal(got, p[::-1])


def test_geojson_reader(spark, tmp_path):
    fc = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "geometry": {"type": "Point", "coordinates": [10.5, -3.25]},
                "properties": {"name": "p1", "pop": 1234},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "Polygon",
                    "coordinates": [
                        [[0, 0], [4, 0], [4, 3], [0, 3], [0, 0]],
                        [[1, 1], [2, 1], [2, 2], [1, 2], [1, 1]],
                    ],
                },
                "properties": {"name": "z1"},
            },
            {
                "type": "Feature",
                "geometry": {
                    "type": "MultiPolygon",
                    "coordinates": [[[[0, 0], [1, 0], [1, 1], [0, 0]]]],
                },
                "properties": {},
            },
        ],
    }
    path = str(tmp_path / "zones.geojson")
    with open(path, "w") as f:
        json.dump(fc, f)
    out = read_dataset(spark, path).orderBy("feature_id").collect()
    assert [r["geom_type"] for r in out] == ["Point", "Polygon", "MultiPolygon"]
    assert out[0]["rings"] == [[[10.5, -3.25]]]
    assert out[0]["properties"]["pop"] == "1234"
    # closing vertices dropped, holes preserved as separate rings
    assert len(out[1]["rings"]) == 2 and len(out[1]["rings"][0]) == 4
    assert len(out[2]["rings"][0]) == 3


def test_geoparquet_style_roundtrip(spark, tmp_path):
    polys = synth.make_admin_polygons()
    rows = [(zid, bytearray(wkb.dump_polygon(p))) for zid, p in sorted(polys.items())]
    src = spark.createDataFrame(rows, "zone_id int, geometry binary")
    path = str(tmp_path / "zones.geoparquet")
    src.write.mode("overwrite").parquet(path)
    out = read_dataset(spark, path).select("zone_id", "rings").collect()
    got = {r["zone_id"]: np.array(r["rings"][0]) for r in out}
    for zid, p in polys.items():
        assert np.array_equal(got[zid], p) or np.array_equal(got[zid], p[::-1])


def test_parse_wkb_fuzz_failure_modes():
    """Adversarial/corrupt WKB must fail ONLY with the exception types the
    Spark-side parser catches (ValueError/struct.error/IndexError) — any
    other type would crash the Arrow UDF instead of yielding NULL."""
    import struct as _struct

    rng = np.random.RandomState(0)
    caught = (ValueError, _struct.error, IndexError)
    for _ in range(4000):
        buf = rng.bytes(rng.randint(0, 60))
        try:
            wkb.parse_wkb(buf)
        except caught:
            pass
    base = wkb.dump_polygon(np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 3.0]]))
    for _ in range(4000):
        b = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            b[rng.randint(len(b))] = rng.randint(256)
        try:
            wkb.parse_wkb(bytes(b))
        except caught:
            pass


def test_geoparquet_metadata_stamp(spark, tmp_path):
    """stamp_geoparquet_metadata writes the spec's 'geo' KV metadata on
    every part file (pyarrow-visible), data round-trips unchanged, and
    the dataset still reads through read_dataset."""
    import json

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F  # noqa: F401

    from giga_spatial_spark.sources.geo_writers import (
        stamp_geoparquet_metadata,
        write_geoparquet,
    )
    from giga_spatial_spark.sources.readers import read_geoparquet

    from giga_spatial_spark import synth

    rows = [
        (zid, "Polygon", [poly.tolist()], {"name": f"z{zid}"})
        for zid, poly in sorted(synth.make_admin_polygons(4).items())
    ]
    df = spark.createDataFrame(
        rows,
        "feature_id int, geom_type string, "
        "rings array<array<array<double>>>, properties map<string,string>",
    ).repartition(3)
    path = str(tmp_path / "gp")
    write_geoparquet(df, path)
    before = read_geoparquet(spark, path).toPandas()
    n = stamp_geoparquet_metadata(spark, path, geometry_types=["Polygon"])
    assert n >= 1
    import os

    for f in os.listdir(path):
        if f.endswith(".parquet") and not f.startswith("_"):
            md = pq.read_table(os.path.join(path, f)).schema.metadata
            geo = json.loads(md[b"geo"])
            assert geo["primary_column"] == "geometry"
            assert geo["columns"]["geometry"]["encoding"] == "WKB"
    after = read_geoparquet(spark, path).toPandas()
    key = ["feature_id"]
    assert before.sort_values(key).reset_index(drop=True)["feature_id"].equals(
        after.sort_values(key).reset_index(drop=True)["feature_id"]
    )
    assert len(before) == len(after) == 4
