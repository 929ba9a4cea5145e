"""Web-pages generation + extraction invariant + flagship pipeline."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from giga_spatial_spark import synth
from giga_spatial_spark.functions.text import (
    extract_geo_entities_py,
    extract_text_py,
)
from giga_spatial_spark.pipeline import (
    enrich,
    entity_points,
    extract_stage,
    verify_extraction_invariant,
)
from giga_spatial_spark.sources.webpages import webpages_df


def test_extract_text_golden():
    html = (
        b"<html><head><style>p{}</style><script>var x=1;</script></head>"
        b"<body><h1>A &amp; B</h1><p>hello  world</p><p>l&#39;eau</p>"
        b"<!-- c --></body></html>"
    )
    assert extract_text_py(html) == "A & B\nhello world\nl'eau"


def test_extract_geo_entities():
    txt = "see (40.7100, -74.0000) and (-33.8700, 151.2100) but not (999, 5)"
    assert extract_geo_entities_py(txt) == [(40.71, -74.0), (-33.87, 151.21)]


def test_generation_deterministic_across_partitioning(spark):
    a = webpages_df(spark, 200, partitions=2).orderBy("url").toPandas()
    b = webpages_df(spark, 200, partitions=7).orderBy("url").toPandas()
    assert a["url"].tolist() == b["url"].tolist()
    assert all(x == y for x, y in zip(a["html"], b["html"]))
    assert a["text"].tolist() == b["text"].tolist()


def test_byte_identical_extraction_invariant(spark):
    pages = webpages_df(spark, 300)
    assert verify_extraction_invariant(pages) == 0


def test_entity_points_and_skew(spark):
    pages = webpages_df(spark, 1000)
    pts = entity_points(extract_stage(pages)).toPandas()
    # ids 0..999, mentions = id % 4 → expected sum = sum(i % 4)
    assert len(pts) == sum(i % 4 for i in range(1000))
    assert pts["lat"].between(-90, 90).all()
    # skew: ~30% of mentions near the 3 hot clusters
    hot = (
        pts[["lat", "lon"]]
        .apply(
            lambda r: any(
                abs(r.lat - hl) < 0.2 and abs(r.lon - ho) < 0.2
                for hl, ho in [(40.71, -74.0), (51.5, -0.12), (35.68, 139.69)]
            ),
            axis=1,
        )
        .mean()
    )
    assert 0.2 < hot < 0.4


def test_enrich_end_to_end(spark):
    pages = webpages_df(spark, 500)
    polys = synth.make_admin_polygons()
    out = enrich(pages, polys).toPandas()
    assert set(out.columns) == {"zone_id", "tile", "mention_count"}
    assert (out["mention_count"] > 0).all()
    # cross-check total against a pandas replay of PIP on the exploded points
    pts = entity_points(extract_stage(pages)).toPandas()
    from giga_spatial_spark.geometry import convex_contains

    expected = 0
    for zid, poly in polys.items():
        expected += int(
            convex_contains(poly, pts["lon"].to_numpy(), pts["lat"].to_numpy()).sum()
        )
    assert out["mention_count"].sum() == expected
