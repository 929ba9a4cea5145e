"""Approximate nearest-neighbor search over the embeddings table.

Two paths per the build brief:
  - ``cosine_topk_bruteforce`` — exact baseline: candidate set broadcast,
    dot products as *native* column expressions (F.aggregate/zip_with —
    JVM-side, no Python), window top-k. The right plan when the candidate
    set is dim-sized.
  - ``lsh_topk`` — scale path: random-hyperplane LSH (fixed seeded planes)
    buckets both sides; only same-bucket pairs are scored. Hyperplane sign
    bits are computed in one vectorized Arrow UDF; the join is a plain
    equi-join on the bucket key (uniform, no skew).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType
from pyspark.sql.window import Window


def dot_expr(a, b):
    """Native dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k most-similar corpus vector per query vector (excluding
    self-matches on id). Corpus broadcast; cosine fully native."""
    # norms projected once per side — computing them inside the pair
    # expression would redo each row's norm |other side| times
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        norm_expr(F.col(vec_col)).alias("qnorm"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        norm_expr(F.col(vec_col)).alias("cnorm"),
    )
    pairs = (
        q.join(F.broadcast(c), F.col("qid") != F.col("cid"))
        .withColumn(
            "cosine",
            dot_expr(F.col("qvec"), F.col("cvec")) / (F.col("qnorm") * F.col("cnorm")),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", F.round("cosine", 4).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 11) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_table(
    df: DataFrame,
    dim: int,
    n_planes: int = 12,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
) -> DataFrame:
    """(id, bucket) over n_tables independent hash tables — bucket packs
    (table_idx, sign-bit pattern) so buckets from different tables never
    join. Multi-table is the standard recall lever: per-table collision
    probability (1-θ/π)^n_planes compounds to 1-(1-p)^n_tables."""
    planes = np.stack(
        [_hyperplanes(dim, n_planes, seed + 997 * t) for t in range(n_tables)]
    )  # (tables, planes, dim)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(planes)

    schema = StructType(
        [StructField("vec_id", LongType()), StructField("bucket", LongType())]
    )

    def kernel(batches):
        pl = bc.value
        t_count, p_count, _ = pl.shape
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            ids_rep, buckets_all = [], []
            for t in range(t_count):
                signs = (mat @ pl[t].T) > 0
                buckets = np.zeros(len(pdf), dtype=np.int64)
                for b in range(p_count):
                    buckets |= signs[:, b].astype(np.int64) << b
                buckets |= np.int64(t) << 48  # table-disambiguation bits
                ids_rep.append(pdf[id_col].to_numpy())
                buckets_all.append(buckets)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(ids_rep),
                    "bucket": np.concatenate(buckets_all),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(kernel, schema=schema)


def lsh_topk(
    vectors: DataFrame,
    dim: int,
    k: int = 1,
    n_planes: int = 12,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k within the table: score only same-bucket pairs."""
    buckets = lsh_bucket_table(vectors, dim, n_planes, n_tables, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec"))
    bl = buckets.select(F.col("vec_id").alias("qid"), "bucket").join(
        v.withColumnRenamed("__vid", "qid").withColumnRenamed("__vec", "qvec"), "qid"
    )
    br = buckets.select(F.col("vec_id").alias("cid"), "bucket").join(
        v.withColumnRenamed("__vid", "cid").withColumnRenamed("__vec", "cvec"), "cid"
    )
    pairs = (
        bl.join(br, "bucket")
        .where(F.col("qid") != F.col("cid"))
        .withColumn("cosine", cosine_expr(F.col("qvec"), F.col("cvec")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid").asc())
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "cid", F.round("cosine", 4).alias("cosine"), "rank")
        .distinct()
    )
