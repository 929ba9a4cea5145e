"""Document hashing / sketching kernels — MinHash, SimHash, shingles.

These are the training-data-pipeline additions (web-scale dedup) the
engine layers on top of the reference's spatial operators. Hot paths are
numpy-vectorized: tokens are FNV-hashed once via a per-process cache, and
shingle/minhash/simhash math runs as uint64 array arithmetic (natural 2^64
wraparound), so the per-document cost is O(tokens) python + O(tokens×k)
numpy instead of per-character python loops.
"""

from __future__ import annotations

import re

import numpy as np

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)

_token_cache: dict[str, int] = {}


def _fnv(token: str) -> int:
    h = 1469598103934665603
    for ch in token.encode("utf-8"):
        h = ((h ^ ch) * 1099511628211) % (1 << 64)
    return h


def _token_hashes(text: str) -> np.ndarray:
    """uint64 FNV hash per token, cached across calls (vocabulary is far
    smaller than the corpus)."""
    toks = _TOKEN_RE.findall(text.lower())
    cache = _token_cache
    out = np.empty(len(toks), dtype=np.uint64)
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) > 2_000_000:  # bound executor memory
                cache.clear()
            h = _fnv(t)
            cache[t] = h
        out[i] = h
    return out


# fixed odd multipliers combining the k token hashes of a shingle
_SHINGLE_MULT = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D,
     0x9E3779B97F4A7C55, 0xC2B2AE3D27D4EBAF],
    dtype=np.uint64,
)


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Sorted unique 64-bit hashes of the k-token shingles of `text`
    (lowercase alphanumeric tokenization). Vectorized: shingle hash =
    Σ_j mult_j · token_hash[i+j] (mod 2^64)."""
    th = _token_hashes(text)
    if len(th) < k:
        th = np.concatenate([th, np.zeros(k - len(th), dtype=np.uint64)])
    n = len(th) - k + 1
    acc = np.zeros(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc += th[j : j + n] * _SHINGLE_MULT[j % len(_SHINGLE_MULT)]
    return np.unique(acc)


def minhash_signature(shingles: np.ndarray, num_perm: int = 64, seed: int = 1) -> np.ndarray:
    """num_perm-wide MinHash with multiplicative hashing
    h_i(x) = (a_i·x + b_i) mod 2^64 (a_i odd), fully vectorized."""
    rng = np.random.RandomState(seed)
    a = (
        rng.randint(1, (1 << 62), size=num_perm).astype(np.uint64) * np.uint64(2)
        + np.uint64(1)
    )
    b = rng.randint(0, (1 << 62), size=num_perm).astype(np.uint64)
    if len(shingles) == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = shingles[None, :] * a[:, None] + b[:, None]
    return vals.min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[int]:
    """Band the signature: hash each band of rows to a bucket key. Docs
    sharing any band key are near-dup candidates."""
    rows = len(sig) // bands
    keys = []
    with np.errstate(over="ignore"):
        for bi in range(bands):
            band = sig[bi * rows : (bi + 1) * rows]
            h = np.uint64(1469598103934665603)
            for v in band:
                h = (h ^ v) * _FNV_PRIME
            keys.append(int((int(h) << 5 | bi) % (1 << 63)))
    return keys


def simhash(text: str, bits: int = 64) -> int:
    """Charikar SimHash over word unigrams (FNV token hashes), unweighted.
    Vectorized bit counting."""
    th = _token_hashes(text)
    if len(th) == 0:
        return 0
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = (th[:, None] >> shifts[None, :]) & np.uint64(1)
    acc = (2 * bitmat.astype(np.int64) - 1).sum(axis=0)
    v = 0
    for bpos in range(bits):
        if acc[bpos] > 0:
            v |= 1 << bpos
    return v & ((1 << 63) - 1)  # keep in signed-long range for Spark


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted-unique shingle-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def rolling_fingerprint(text: str, window: int = 16, mod: int = (1 << 61) - 1,
                        base: int = 257) -> int:
    """Document fingerprint: minimum polynomial rolling hash over all
    `window`-byte substrings (Rabin–Karp / winnowing-style). Vectorized:
    H[i] = Σ_j data[i+j]·base^(w-1-j) mod p computed with per-position
    powers folded via float-safe 64-bit splitting is overkill — instead use
    numpy object-free arithmetic mod 2^64? No: parity with the pure-python
    definition matters for tests, so keep exact mod-p but fold with numpy
    int64 chunks."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    n = len(data)
    if n == 0:
        return 0
    if n <= window:
        h = 0
        for b in data.tolist():
            h = (h * base + int(b)) % mod
        return h
    # rolling in pure python over ints is O(n) and fast enough (no per-char
    # re-hash); numpy handles the windowed view only
    pow_w = pow(base, window - 1, mod)
    buf = data.tolist()
    h = 0
    for b in buf[:window]:
        h = (h * base + b) % mod
    best = h
    for i in range(window, n):
        h = ((h - buf[i - window] * pow_w) * base + buf[i]) % mod
        if h < best:
            best = h
    return best
