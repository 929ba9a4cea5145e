"""Document hashing / sketching kernels — MinHash, SimHash, shingles.

These are the training-data-pipeline additions (web-scale dedup) the
engine layers on top of the reference's spatial operators. All vectorized
numpy inside Arrow pandas UDFs; hash functions are fixed-parameter
polynomial hashes so results are deterministic across runs and engines.
"""

from __future__ import annotations

import re

import numpy as np

MERSENNE = (1 << 61) - 1
_A = 0x9E3779B97F4A7C15


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit hashes of the k-word shingles of `text`.

    Tokenization: lowercase alphanumeric runs (stable across engines).
    """
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if len(toks) < k:
        toks = toks + ["\x00"] * (k - len(toks))
    n = len(toks) - k + 1
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        h = np.uint64(1469598103934665603)  # FNV offset
        for t in toks[i : i + k]:
            for ch in t:
                h = np.uint64((int(h) ^ ord(ch)) * 1099511628211 % (1 << 64))
            h = np.uint64((int(h) ^ 0x20) * 1099511628211 % (1 << 64))
        out[i] = h
    return np.unique(out)


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """num_perm-wide MinHash over universal hash family
    h_i(x) = (a_i * x + b_i) mod p, a/b from a seeded RandomState."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    if len(shingles) == 0:
        return np.full(num_perm, MERSENNE, dtype=np.uint64)
    x = shingles.astype(np.object_)  # python ints avoid uint64 overflow
    sig = np.empty(num_perm, dtype=np.uint64)
    for i in range(num_perm):
        vals = (int(a[i]) * x + int(b[i])) % MERSENNE
        sig[i] = np.uint64(min(vals))
    return sig


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Band the signature: hash each band of rows to a bucket key. Docs
    sharing any band key are near-dup candidates."""
    rows = len(sig) // bands
    keys = []
    for bi in range(bands):
        band = sig[bi * rows : (bi + 1) * rows]
        h = 1469598103934665603
        for v in band:
            h = ((h ^ int(v)) * 1099511628211) % (1 << 64)
        # include band index so buckets from different bands never collide
        keys.append(((h << 5) | bi) % (1 << 63))
    return keys


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over word unigrams (FNV-hashed), unweighted."""
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if not toks:
        return 0
    acc = np.zeros(bits, dtype=np.int64)
    for t in toks:
        h = 1469598103934665603
        for ch in t:
            h = ((h ^ ord(ch)) * 1099511628211) % (1 << 64)
        for b in range(bits):
            acc[b] += 1 if (h >> b) & 1 else -1
    v = 0
    for b in range(bits):
        if acc[b] > 0:
            v |= 1 << b
    return v & ((1 << 63) - 1)  # keep in signed-long range for Spark


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprint(text: str, window: int = 16, mod: int = (1 << 61) - 1,
                        base: int = 257) -> int:
    """Document fingerprint: minimum polynomial rolling hash over all
    `window`-byte substrings (Rabin–Karp / winnowing-style). Deterministic,
    O(len) via the rolling update."""
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return 0
    if n <= window:
        h = 0
        for b in data:
            h = (h * base + b) % mod
        return h
    pow_w = pow(base, window - 1, mod)
    h = 0
    for b in data[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, n):
        h = ((h - data[i - window] * pow_w) * base + data[i]) % mod
        if h < best:
            best = h
    return best


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique shingle-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
