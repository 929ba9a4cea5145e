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


# ---------------------------------------------------- real header parsers
# Public-spec, stdlib-struct parsers — pixel/sample DECODE stays stubbed
# (no media libs in this container; brief-prescribed), but the metadata
# probe is real: PNG IHDR, JPEG SOF marker scan, GIF logical screen, and
# WAV RIFF/fmt/data. Robust to truncation/corruption: any structural
# violation degrades to format='unknown' rather than raising (fuzz-tested).

_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
     0xCE, 0xCF]
)


def parse_media_meta(b: bytes) -> dict:
    """Best-effort header metadata for one payload. Returns a dict with
    keys format/width/height/sample_rate/channels/bits/n_samples —
    inapplicable fields None; unparseable payloads format='unknown'."""
    out = {
        "format": "unknown", "width": None, "height": None,
        "sample_rate": None, "channels": None, "bits": None,
        "n_samples": None,
    }
    try:
        if len(b) >= 24 and b[:8] == b"\x89PNG\r\n\x1a\n":
            # first chunk must be IHDR: length(4) type(4) data(13)
            (clen,) = struct.unpack(">I", b[8:12])
            if b[12:16] == b"IHDR" and clen >= 8:
                w, h = struct.unpack(">II", b[16:24])
                if 0 < w < 1 << 24 and 0 < h < 1 << 24:
                    out.update(format="png", width=int(w), height=int(h))
            return out
        if len(b) >= 4 and b[:2] == b"\xff\xd8":
            # JPEG: walk marker segments to the first SOFn frame header
            i = 2
            while i + 4 <= len(b):
                if b[i] != 0xFF:
                    break
                marker = b[i + 1]
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                if marker == 0xD9 or marker == 0xDA:
                    break  # EOI / start-of-scan before any SOF
                (seglen,) = struct.unpack(">H", b[i + 2 : i + 4])
                if seglen < 2 or i + 2 + seglen > len(b):
                    break
                if marker in _SOF_MARKERS and seglen >= 7:
                    h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                    if w > 0 and h > 0:
                        out.update(
                            format="jpeg", width=int(w), height=int(h)
                        )
                    return out
                i += 2 + seglen
            return out
        if len(b) >= 10 and b[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", b[6:10])
            if w > 0 and h > 0:
                out.update(format="gif", width=int(w), height=int(h))
            return out
        if len(b) >= 12 and b[:4] == b"RIFF" and b[8:12] == b"WAVE":
            i = 12
            fmt_seen = False
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                (csize,) = struct.unpack("<I", b[i + 4 : i + 8])
                if cid == b"fmt " and csize >= 16 and i + 8 + 16 <= len(b):
                    _tag, ch, rate = struct.unpack("<HHI", b[i + 8 : i + 16])
                    bits = struct.unpack("<H", b[i + 22 : i + 24])[0]
                    if ch > 0 and rate > 0 and bits > 0:
                        out.update(
                            sample_rate=int(rate), channels=int(ch),
                            bits=int(bits),
                        )
                        fmt_seen = True
                elif cid == b"data" and fmt_seen:
                    block = out["channels"] * out["bits"] // 8
                    if block > 0:
                        out.update(
                            format="wav", n_samples=int(csize // block)
                        )
                    return out
                i += 8 + csize + (csize & 1)  # chunks are word-aligned
            return out
    except (struct.error, TypeError, ValueError):
        return out
    return out


MEDIA_META_SCHEMA = StructType(
    [
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bits", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


@F.pandas_udf(MEDIA_META_SCHEMA)
def media_meta(payload: pd.Series) -> pd.DataFrame:
    """Header-only metadata probe (no pixel/sample decode): real PNG /
    JPEG / GIF / WAV header parsing per Arrow batch."""
    rows = []
    for b in payload:
        m = parse_media_meta(bytes(b) if b is not None else b"")
        m["n_bytes"] = len(b) if b is not None else 0
        rows.append(m)
    return pd.DataFrame(rows)


@F.pandas_udf(IMAGE_META_SCHEMA)
def image_meta(payload: pd.Series) -> pd.DataFrame:
    """Image-only metadata probe: REAL header parsing (PNG IHDR / JPEG
    SOF / GIF screen descriptor) — the former deterministic fake is gone;
    non-image payloads report format='unknown' with NULL dims."""
    widths, heights, fmts, sizes = [], [], [], []
    for b in payload:
        m = parse_media_meta(bytes(b) if b is not None else b"")
        widths.append(m["width"])
        heights.append(m["height"])
        fmts.append(m["format"])
        sizes.append(len(b) if b is not None else 0)
    return pd.DataFrame(
        {"width": widths, "height": heights, "format": fmts, "n_bytes": sizes}
    )


# ------------------------------------------------- deterministic builders
def make_png(w: int, h: int, seed: int = 0) -> bytes:
    """Structurally valid PNG prefix (signature + IHDR) + deterministic
    body bytes (the pixel stream is not decoded by this engine)."""
    ihdr = struct.pack(">II", w, h) + bytes([8, 2, 0, 0, 0])
    body = hashlib.sha256(struct.pack("<qqq", w, h, seed)).digest() * 3
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13) + b"IHDR" + ihdr + b"\x00\x00\x00\x00"
        + body
    )


def make_jpeg(w: int, h: int, seed: int = 0) -> bytes:
    """Minimal JPEG: SOI + APP0(JFIF) + SOF0 carrying the dimensions +
    deterministic tail + EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11)
        + bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    )
    body = hashlib.sha256(struct.pack("<qqq", w, h, seed)).digest()
    return b"\xff\xd8" + app0 + sof0 + body + b"\xff\xd9"


def make_wav(rate: int, channels: int, bits: int, n_samples: int) -> bytes:
    """Fully valid PCM WAV container with deterministic sample bytes."""
    block = channels * bits // 8
    data_size = n_samples * block
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * block, block, bits
    )
    data = (
        hashlib.sha256(struct.pack("<qqq", rate, channels, n_samples)).digest()
        * (data_size // 32 + 1)
    )[:data_size]
    return (
        b"RIFF" + struct.pack("<I", 36 + data_size) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", data_size) + data
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


def media_dims(i: int) -> tuple[int, int]:
    """Deterministic image dimensions for media id `i` — the arithmetic
    the DuckDB oracle replays (q_multimodal_meta)."""
    return 64 + (i * 37) % 512, 64 + (i * 59) % 512


WAV_RATES = (8000, 16000, 22050, 44100)


def media_wav_params(i: int) -> tuple[int, int, int, int]:
    """(rate, channels, bits, n_samples) for media id `i`."""
    return WAV_RATES[i % 4], 1 + (i % 2), 16, 100 + (i * 13) % 4000


def build_payload(i: int, kind: str) -> bytes:
    """Deterministic REAL media container for id `i`: kind 'image'
    alternates PNG/JPEG; 'audio' is WAV; 'mixed' cycles all three."""
    if kind == "mixed":
        sub = ("png", "jpeg", "wav")[i % 3]
    elif kind == "image":
        sub = ("png", "jpeg")[i % 2]
    else:
        sub = "wav"
    if sub == "wav":
        rate, ch, bits, ns = media_wav_params(i)
        return make_wav(rate, ch, bits, ns)
    w, h = media_dims(i)
    return make_png(w, h, i) if sub == "png" else make_jpeg(w, h, i)


def synthetic_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic binary payloads with REAL container headers (PNG /
    JPEG / WAV) for tests, benchmarks, and the q_multimodal_meta oracle."""
    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            payloads = [build_payload(int(i), kind) for i in ids]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return spark.range(n).mapInPandas(
        gen, schema="media_id bigint, payload binary"
    )
