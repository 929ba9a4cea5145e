"""knn_grid (two-phase grid kNN with ring expansion) must equal the exact
broadcast kernel, and embedding near-dup pairs must be valid."""

import numpy as np
from pyspark.sql import functions as F

from giga_spatial_spark import synth
from giga_spatial_spark.operators.dedup import embedding_near_dup_pairs
from giga_spatial_spark.operators.knn import knn_broadcast, knn_grid

from .conftest import SF_DIR


def test_knn_grid_equals_broadcast(spark):
    pts = synth.with_coords(
        spark.read.parquet(f"{SF_DIR}/documents.parquet"), "doc_id"
    ).select("doc_id", "lon", "lat")
    fac = synth.facilities_df(spark, SF_DIR)
    exact = (
        knn_broadcast(pts, fac, point_id="doc_id")
        .select("doc_id", "nearest_facility_id", F.round("nearest_dist_m", 3).alias("d"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    grid = (
        knn_grid(pts, fac, point_id="doc_id", zoom=4)
        .select("doc_id", "nearest_facility_id", F.round("nearest_dist_m", 3).alias("d"))
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert len(grid) == len(exact)
    assert (grid["d"] == exact["d"]).all()
    # ties (equidistant facilities) are broken identically
    assert (grid["nearest_facility_id"] == exact["nearest_facility_id"]).all()


def test_embedding_near_dup_validity(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    pairs = embedding_near_dup_pairs(emb, threshold=0.5).toPandas()
    pdf = emb.toPandas().set_index("vec_id")
    for row in pairs.itertuples():
        va = np.asarray(pdf.loc[row.a, "embedding"], dtype=np.float64)
        vb = np.asarray(pdf.loc[row.b, "embedding"], dtype=np.float64)
        true = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert true >= 0.5 and abs(true - row.cosine) < 1e-3
    assert (pairs["a"] < pairs["b"]).all()
    assert not pairs.duplicated(["a", "b"]).any()


def test_knn_broadcast_size_guard(spark, monkeypatch):
    """A fact-sized facility table must raise (pointing at knn_grid)
    BEFORE any driver collect — the probe is a truncated JVM count."""
    import pytest

    from giga_spatial_spark.operators import knn

    fac = synth.facilities_df(spark, SF_DIR)
    pts = spark.createDataFrame([(1, 0.0, 0.0)], "id long, lon double, lat double")
    monkeypatch.setattr(knn, "BROADCAST_FACILITY_LIMIT", 3)
    with pytest.raises(ValueError, match="knn_grid"):
        knn.knn_broadcast(pts, fac, point_id="id")
