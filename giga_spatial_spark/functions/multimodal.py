"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque `binary` columns with typed metadata structs —
the Spark-side schema, partitioning, UDF signatures and Arrow batch shapes
are real and tested; the actual codec decode is STUBBED (this container has
no image/audio libraries) behind ``DECODERS`` with a deterministic fake, as
the build brief prescribes. Swapping in a real decoder (PIL/ffmpeg) changes
only the function body, not the plan.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
    ]
)


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real image decode: derives a small
    'pixel' array from the payload digest. Replace with PIL.Image.open
    in production — signature and batch shape stay identical."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer((digest * 12)[: 8 * 8 * 3], dtype=np.uint8)
    return arr.reshape(8, 8, 3)


def _fake_decode_audio(payload: bytes) -> np.ndarray:
    digest = hashlib.sha256(payload).digest()
    raw = np.frombuffer((digest * 40)[: 256 * 4], dtype=np.int32)
    return (raw % 32768).astype(np.float32) / 32768.0


DECODERS = {"image": _fake_decode_image, "audio": _fake_decode_audio}


@F.pandas_udf(IMAGE_META_SCHEMA)
def image_meta(payload: pd.Series) -> pd.DataFrame:
    """Header-only metadata probe (no full decode): dimensions from the
    payload prefix — deterministic fake mirroring e.g. PNG IHDR parsing."""
    widths, heights, fmts, sizes = [], [], [], []
    for b in payload:
        h = hashlib.sha256(b).digest()
        widths.append(64 + h[0] % 192)
        heights.append(64 + h[1] % 192)
        fmts.append(["png", "jpeg", "webp"][h[2] % 3])
        sizes.append(len(b))
    return pd.DataFrame(
        {"width": widths, "height": heights, "format": fmts, "n_bytes": sizes}
    )


_FEATURE_SCHEMA = ArrayType(FloatType())


@F.pandas_udf(_FEATURE_SCHEMA)
def image_features(payload: pd.Series) -> pd.Series:
    """Decode → feature-extract (mean-pool per channel + intensity
    histogram), vectorized per Arrow batch. The decode call is the stub."""
    out = []
    for b in payload:
        img = DECODERS["image"](b)
        means = img.reshape(-1, 3).mean(axis=0) / 255.0
        hist, _ = np.histogram(img, bins=8, range=(0, 255))
        feat = np.concatenate([means, hist / hist.sum()]).astype(np.float32)
        out.append(feat.tolist())
    return pd.Series(out)


def frame_sample(video_df: DataFrame, payload_col: str = "payload",
                 every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index with a
    binary frame payload (sliced deterministically from the source payload
    — a real implementation seeks the container instead)."""
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, b in zip(pdf["media_id"], pdf[payload_col]):
                n_frames = max(1, len(b) // 64)
                for fi in range(0, n_frames, every_n):
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(bytes(b[fi * 64 : (fi + 1) * 64]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return video_df.mapInPandas(kernel, schema=schema)


def synthetic_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic opaque binary payloads for tests/benchmarks."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [
                hashlib.sha256(struct.pack("<q", int(i))).digest()
                * (3 + int(i) % 5)
                for i in ids
            ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return spark.range(n).mapInPandas(
        gen, schema="media_id bigint, payload binary"
    )
