"""Geo writers: GeoJSON / GeoJSONL / GeoParquet-WKB over the engine's
normalized feature table (geom_type, rings, properties[, feature_id]).

Reference parity: core/io/writers.py GEO_WRITERS routes GeoDataFrames to
GeoJSON / GPKG / (Geo)Parquet via geopandas; here each format is written
directly. GeoParquet-WKB is the DISTRIBUTED path (an Arrow UDF packs WKB
per partition, then a plain parquet write — this is the format fact-sized
geometry should use at 100 TB); GeoJSONL streams one feature per line and
also writes distributed; GeoJSON proper is a single monolithic JSON
document, so it collects with a row cap, like write_xlsx (dim layers only).

Ring-grouping convention: the engine's normalized `rings` column flattens
MultiPolygon members. Every reader GUARANTEES consistent winding (outer CW,
holes CCW — enforced by winding.wind_member at parse time, while member
structure is still explicit in the source format, because real-world
GeoJSON/KML routinely violates RFC 7946 orientation). `group_rings`
reconstructs members by winding: a ring wound like the first starts a new
member, an opposite-wound ring is a hole of the current member.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame

from ..functions import wkb as _wkb

GEOJSON_WRITE_LIMIT = 5_000_000


def _ring_cw(ring: np.ndarray) -> bool:
    x, y = ring[:, 0], ring[:, 1]
    return np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y) < 0


def _ring_arr(ring) -> np.ndarray:
    """One ring (list/object-array of [x, y]) → (N, 2) float64. Arrow hands
    nested arrays over as ragged object arrays, which np.asarray rejects."""
    return np.array([[float(v[0]), float(v[1])] for v in ring], dtype=np.float64)


def group_rings(rings: list) -> list[list[np.ndarray]]:
    """Flattened open rings → list of [outer, *holes] members (by winding)."""
    arrays = [_ring_arr(r) for r in rings]
    outer_cw = _ring_cw(arrays[0])
    members: list[list[np.ndarray]] = []
    for a in arrays:
        if not members or _ring_cw(a) == outer_cw:
            members.append([a])
        else:
            members[-1].append(a)
    return members


def rings_to_wkb(geom_type: str | None, rings: list | None) -> bytes | None:
    """Normalized (geom_type, flattened rings) → OGC WKB bytes."""
    # Arrow batches surface array columns as numpy object arrays, whose
    # truthiness is ambiguous — test None/len explicitly
    if geom_type is None or rings is None or len(rings) == 0:
        return None
    if geom_type == "Point":
        x, y = rings[0][0]
        return _wkb.dump_point(float(x), float(y))
    if geom_type == "LineString":
        return _wkb.dump_linestring(_ring_arr(rings[0]))
    if geom_type == "MultiPoint":
        return _wkb.dump_multipoint(_ring_arr(rings[0]))
    if geom_type == "MultiLineString":
        return _wkb.dump_multilinestring([_ring_arr(r) for r in rings])
    if geom_type == "Polygon":
        return _wkb.dump_polygon([_ring_arr(r) for r in rings])
    if geom_type == "MultiPolygon":
        return _wkb.dump_multipolygon(group_rings(rings))
    raise ValueError(f"unsupported geometry type {geom_type!r}")


def _closed(ring) -> list:
    vs = [[float(x), float(y)] for x, y in ring]
    if vs and vs[0] != vs[-1]:
        vs.append(vs[0])
    return vs


def rings_to_geojson_geometry(geom_type: str | None, rings: list | None):
    if geom_type is None or rings is None or len(rings) == 0:
        return None
    if geom_type == "Point":
        x, y = rings[0][0]
        return {"type": "Point", "coordinates": [float(x), float(y)]}
    if geom_type in ("LineString", "MultiPoint"):
        return {
            "type": geom_type,
            "coordinates": [[float(x), float(y)] for x, y in rings[0]],
        }
    if geom_type == "MultiLineString":
        return {
            "type": geom_type,
            "coordinates": [[[float(x), float(y)] for x, y in r] for r in rings],
        }
    if geom_type == "Polygon":
        return {"type": geom_type, "coordinates": [_closed(r) for r in rings]}
    if geom_type == "MultiPolygon":
        return {
            "type": geom_type,
            "coordinates": [
                [_closed(r) for r in member] for member in group_rings(rings)
            ],
        }
    raise ValueError(f"unsupported geometry type {geom_type!r}")


def _feature_dict(row) -> dict:
    props = dict(row["properties"]) if row["properties"] is not None else {}
    feat = {
        "type": "Feature",
        "geometry": rings_to_geojson_geometry(row["geom_type"], row["rings"]),
        "properties": props,
    }
    try:
        feat["id"] = int(row["feature_id"])
    except (KeyError, TypeError, ValueError):
        pass
    return feat


def write_geojson(
    df: DataFrame, path: str, max_rows: int = GEOJSON_WRITE_LIMIT
) -> str:
    """FeatureCollection document (reference GEO_WRITERS['.geojson']) —
    driver-side with a row cap; the distributed sibling is write_geojsonl."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"geojson writer caps at {max_rows} rows — use geojsonl/geoparquet"
        )
    fc = {"type": "FeatureCollection", "features": [_feature_dict(r) for r in rows]}
    with open(path, "w", encoding="utf-8") as f:
        json.dump(fc, f, ensure_ascii=False, separators=(",", ":"))
    return path


def write_geojsonl(df: DataFrame, path: str) -> str:
    """Newline-delimited GeoJSON features, written DISTRIBUTED: each
    partition serializes its own rows (Arrow-batched), then a plain text
    write — no driver collect, arbitrarily large layers."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    cols = [c for c in ("feature_id", "geom_type", "rings", "properties")
            if c in df.columns]

    def kernel(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                out.append(
                    json.dumps(
                        _feature_dict(row), ensure_ascii=False,
                        separators=(",", ":"),
                    )
                )
            yield pd.DataFrame({"value": out})

    lines = df.select(*cols).mapInPandas(
        kernel, schema=StructType([StructField("value", StringType())])
    )
    lines.write.mode("overwrite").text(path)
    return path


def write_geoparquet(
    df: DataFrame, path: str, geometry_col: str = "geometry", mode: str = "overwrite"
) -> str:
    """GeoParquet-WKB: pack the normalized rings into an OGC WKB binary
    column with an Arrow UDF, keep every other column, write plain parquet —
    fully distributed, round-trips through read_geoparquet. This is the
    format geometry-bearing FACT tables should use."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    @F.pandas_udf(BinaryType())
    def pack(gt, rings):  # noqa: ANN001 — hints confuse the UDF type infer
        return pd.Series(
            [
                None if g is None or r is None else rings_to_wkb(g, list(r))
                for g, r in zip(gt, rings)
            ],
            dtype=object,
        )

    keep = [c for c in df.columns if c not in ("rings", "geom_type")]
    out = df.withColumn(geometry_col, pack("geom_type", "rings")).select(
        *keep, "geom_type", geometry_col
    )
    out.write.mode(mode).parquet(path)
    return path


def stamp_geoparquet_metadata(
    spark,
    path: str,
    geometry_col: str = "geometry",
    geometry_types: list[str] | None = None,
) -> int:
    """Stamp the GeoParquet spec's ``geo`` file metadata (version,
    primary_column, per-column encoding) onto every part file of a
    written dataset, so external readers (geopandas ≥0.11 / GDAL ≥3.5)
    recognize it as GeoParquet rather than plain parquet with a binary
    column. Spark's parquet writer cannot attach custom KV metadata, so
    this is a post-pass: each part file is rewritten ON EXECUTORS
    (spark.range over the file list — the driver never touches a row;
    cost = one extra read+write of each part, the price of footer
    ownership). Returns the number of parts stamped. write_geoparquet
    leaves data un-stamped by default — tables consumed only by this
    engine skip the extra IO; call this before handing files to
    external tools."""
    import json
    import os

    import pyarrow.parquet as pq  # noqa: F401 — presence check on driver

    parts = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    if not parts:
        return 0
    meta_json = json.dumps(
        {
            "version": "1.0.0",
            "primary_column": geometry_col,
            "columns": {
                geometry_col: {
                    "encoding": "WKB",
                    "geometry_types": geometry_types or [],
                }
            },
        }
    )

    def stamp(it):
        import os as _os
        import pyarrow.parquet as _pq

        n = 0
        for row in it:
            p = parts[row.id]
            if not _os.path.exists(p):
                raise FileNotFoundError(
                    f"stamp_geoparquet_metadata: {p} not visible on this "
                    "executor — the post-pass rewrites driver-enumerated "
                    "local paths and requires a filesystem shared between "
                    "driver and executors (local mode / NFS); on a real "
                    "cluster or object store run the stamping driver-side "
                    "or over a shared mount"
                )
            t = _pq.read_table(p)
            md = dict(t.schema.metadata or {})
            md[b"geo"] = meta_json.encode()
            # attempt-unique tmp name: speculative/retried tasks would
            # race on a shared fixed '<part>.geo.tmp' (one attempt
            # os.replace-ing a twin mid-write — round-6 advisory)
            tmp = f"{p}.geo.{_os.getpid()}.tmp"
            _pq.write_table(t.replace_schema_metadata(md), tmp)
            _os.replace(tmp, p)
            # Hadoop's LocalFileSystem keeps a .crc sidecar per part; the
            # rewrite invalidates it and a stale one fails every later
            # read with ChecksumException — drop it
            crc = os.path.join(
                os.path.dirname(p), "." + os.path.basename(p) + ".crc"
            )
            if os.path.exists(crc):
                os.remove(crc)
            n += 1
        yield n

    counts = (
        spark.range(len(parts), numPartitions=min(len(parts), 64))
        .rdd.mapPartitions(stamp)
        .collect()
    )
    return sum(counts)
