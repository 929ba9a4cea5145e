"""Deduplication operators over the documents table — exact, MinHash+LSH,
SimHash, n-gram Jaccard. Training-data-pipeline additions (first-class per
the build brief), designed around shuffle economics:

  exact:    hash-groupBy on md5(text) — one shuffle keyed by digest.
  minhash:  shingle→signature (Arrow UDF, no shuffle) → explode band keys →
            self-join on band bucket (the ONLY shuffle, keyed by bucket) →
            exact Jaccard verify on candidate pairs only.
  simhash:  64-bit signature per doc; near-dup = hamming ≤ r via banded
            equi-join on 4×16-bit chunks (pigeonhole: r<4 ⇒ some chunk equal).
  At 100 TB: bucket join keys are uniformly-hashed → no skew; candidate
  verification is O(candidates), never O(n²).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ..functions.hashing import (
    jaccard,
    lsh_band_keys_batch,
    minhash_signatures_batch,
    shingle_hashes,
    simhash,
)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Survivor per distinct text: min id per md5(text) (reference
    EntityTable.merge dedup-by-id analog, entity.py:468-517)."""
    return (
        docs.withColumn("digest", F.md5(F.col(text_col).cast("binary")))
        .groupBy("digest")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


_SIG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("band_keys", ArrayType(LongType())),
        StructField("n_shingles", LongType()),
    ]
)


def minhash_band_table(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 5,
) -> DataFrame:
    """(doc_id, band_key) exploded LSH bucket table."""

    def kernel(batches):
        for pdf in batches:
            # shingling is per-doc python (tokenization), but signatures and
            # band keys are computed for the whole Arrow batch at once
            shs = [shingle_hashes(txt, k=k_shingle) for txt in pdf[text_col]]
            sigs = minhash_signatures_batch(shs, num_perm=num_perm)
            keys = lsh_band_keys_batch(sigs, bands=bands)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].to_numpy(),
                    "band_keys": list(keys),
                    "n_shingles": [len(s) for s in shs],
                }
            )

    sigs = docs.select(id_col, text_col).mapInPandas(kernel, schema=_SIG_SCHEMA)
    return sigs.select(
        "doc_id", "n_shingles", F.explode("band_keys").alias("band_key")
    )


def minhash_candidate_pairs(band_table: DataFrame) -> DataFrame:
    """Distinct candidate (a, b) doc pairs sharing ≥1 LSH bucket, a < b."""
    l = band_table.select(F.col("doc_id").alias("a"), "band_key")
    r = band_table.select(F.col("doc_id").alias("b"), "band_key")
    return (
        l.join(r, "band_key")
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_near_dup_pairs(
    docs: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    k_shingle: int = 5,
) -> DataFrame:
    """Candidate pairs verified by exact shingle Jaccard ≥ threshold.

    Verify joins the candidate pair list back to the texts (broadcast-safe
    at dim sizes; shuffle-hash at scale) and recomputes shingles per pair
    inside an Arrow UDF.
    """
    bands_tbl = minhash_band_table(docs, id_col, text_col, num_perm, bands, k_shingle)
    cand = minhash_candidate_pairs(bands_tbl)
    texts = docs.select(F.col(id_col).alias("__id"), F.col(text_col).alias("__text"))
    pairs = (
        cand.join(texts.withColumnRenamed("__id", "a").withColumnRenamed("__text", "text_a"), "a")
        .join(texts.withColumnRenamed("__id", "b").withColumnRenamed("__text", "text_b"), "b")
    )

    out_schema = StructType(
        [
            StructField("a", LongType()),
            StructField("b", LongType()),
            StructField("jaccard", DoubleType()),
        ]
    )

    def verify(batches):
        for pdf in batches:
            ja = [
                jaccard(shingle_hashes(ta, k=k_shingle), shingle_hashes(tb, k=k_shingle))
                for ta, tb in zip(pdf["text_a"], pdf["text_b"])
            ]
            out = pd.DataFrame({"a": pdf["a"], "b": pdf["b"], "jaccard": ja})
            yield out[out["jaccard"] >= threshold]

    return pairs.mapInPandas(verify, schema=out_schema)


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 10,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH candidates
    (same-bucket equi-join) verified by the exact native cosine — the
    embedding analog of MinHash dedup. O(candidates), never O(n²)."""
    from .ann import cosine_expr, lsh_bucket_table

    buckets = lsh_bucket_table(vectors, dim, n_planes, n_tables, id_col, vec_col)
    v = vectors.select(F.col(id_col).alias("__vid"), F.col(vec_col).alias("__vec"))
    l = buckets.select(F.col("vec_id").alias("a"), "bucket")
    r = buckets.select(F.col("vec_id").alias("b"), "bucket")
    cand = (
        l.join(r, "bucket").where(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    pairs = (
        cand.join(v.withColumnRenamed("__vid", "a").withColumnRenamed("__vec", "va"), "a")
        .join(v.withColumnRenamed("__vid", "b").withColumnRenamed("__vec", "vb"), "b")
        .withColumn("cosine", cosine_expr(F.col("va"), F.col("vb")))
    )
    return pairs.where(F.col("cosine") >= threshold).select(
        "a", "b", F.round("cosine", 4).alias("cosine")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    k_shingle: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """n-gram Jaccard similarity pairs via MinHash candidate generation +
    exact verification at a different shingle width (word 3-grams)."""
    return minhash_near_dup_pairs(
        docs, threshold=threshold, id_col=id_col, text_col=text_col,
        num_perm=64, bands=32, k_shingle=k_shingle,
    )


def simhash_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash, chunk0..chunk3) — 16-bit chunks for the pigeonhole
    banded join."""

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("simhash", LongType()),
            StructField("c0", LongType()),
            StructField("c1", LongType()),
            StructField("c2", LongType()),
            StructField("c3", LongType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            hs = [simhash(t) for t in pdf[text_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "simhash": hs,
                    "c0": [h & 0xFFFF for h in hs],
                    "c1": [(h >> 16) & 0xFFFF for h in hs],
                    "c2": [(h >> 32) & 0xFFFF for h in hs],
                    "c3": [(h >> 48) & 0xFFFF for h in hs],
                }
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, schema=schema)


def simhash_near_dup_pairs(docs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Pairs with hamming(simhash_a, simhash_b) ≤ max_hamming (<4 ⇒ at least
    one 16-bit chunk matches exactly — pigeonhole over 4 banded equi-joins)."""
    t = simhash_table(docs)
    parts = []
    for c in ["c0", "c1", "c2", "c3"]:
        l = t.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"), F.col(c).alias("k"))
        r = t.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"), F.col(c).alias("k"))
        parts.append(l.join(r, "k").where(F.col("a") < F.col("b")).select("a", "b", "ha", "hb"))
    cand = parts[0]
    for p in parts[1:]:
        cand = cand.unionByName(p)
    cand = cand.distinct()
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )
