"""Text hashing / sketching kernels for deduplication (pure, deterministic).

Public-algorithm implementations (Broder '97 minhash resemblance; Charikar
'02 simhash; bottom-k sketches; banded LSH as in Mining of Massive Datasets
ch.3). No wall-clock, no process state — every function is a pure function of
its inputs so results are stable across workers, retries and resume.
"""

from __future__ import annotations

import re
import zlib

import numpy as np

MERSENNE_P = (1 << 61) - 1  # modulus for universal hashing
_SHINGLE_A = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def word_hashes(text: str) -> np.ndarray:
    """uint64 hash per whitespace token (crc32 pairs folded to 64 bits)."""
    words = text.split()
    if not words:
        return np.zeros(0, dtype=np.uint64)
    lo = np.fromiter(
        (zlib.crc32(w.encode()) for w in words), dtype=np.uint64, count=len(words)
    )
    hi = np.fromiter(
        (zlib.crc32(w.encode(), 0xBEEF) for w in words), dtype=np.uint64, count=len(words)
    )
    return (hi << np.uint64(32)) | lo


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of word k-grams via a vectorized rolling polynomial."""
    w = word_hashes(text)
    if len(w) == 0:
        return w
    if len(w) < k:
        k = len(w)
    acc = w[: len(w) - k + 1].copy()
    for i in range(1, k):
        acc = acc * _SHINGLE_A + w[i : len(w) - k + 1 + i]
    return np.unique(acc)


def shingle_position_hashes(text: str, width: int = 8) -> np.ndarray:
    """uint64 hash per word-``width``-gram POSITION, duplicates kept in
    order — the exact-substring-dedup shingling (Lee et al. '22, "Deduplicating
    Training Data Makes Language Models Better"). Unlike ``shingle_hashes``
    (a SET for resemblance sketches), position multiplicity is the signal:
    a span repeated across (or within) documents shows up once per
    occurrence. Tokens are ``[a-z0-9]+`` runs of the lowercased text so the
    DuckDB oracle can rebuild the identical shingle stream with
    ``regexp_extract_all``; documents shorter than ``width`` tokens emit no
    shingles (mirrored by the oracle's ``len(ws) >= width`` guard)."""
    words = _TOKEN_RE.findall(text.lower())
    n = len(words)
    if n < width:
        return np.zeros(0, dtype=np.uint64)
    lo = np.fromiter((zlib.crc32(w.encode()) for w in words), dtype=np.uint64, count=n)
    hi = np.fromiter(
        (zlib.crc32(w.encode(), 0xBEEF) for w in words), dtype=np.uint64, count=n
    )
    w = (hi << np.uint64(32)) | lo
    acc = w[: n - width + 1].copy()
    for i in range(1, width):
        acc = acc * _SHINGLE_A + w[i : n - width + 1 + i]
    return acc


def minhash_signature(hashes: np.ndarray, num_perm: int = 64, seed: int = 12345) -> np.ndarray:
    """num_perm minimum values under universal hashes (a*x+b) mod p."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, MERSENNE_P, size=num_perm, dtype=np.int64).astype(np.uint64)
    if len(hashes) == 0:
        return np.full(num_perm, np.uint64(MERSENNE_P), dtype=np.uint64)
    x = (hashes % np.uint64(MERSENNE_P)).astype(np.uint64)
    # (num_perm, m) — modular arithmetic in python ints is avoided; wrap-around
    # multiply in uint64 is itself a fixed deterministic mixing, adequate for
    # permutation hashing as long as both sides of a comparison use it.
    vals = (a[:, None] * x[None, :] + b[:, None]) % np.uint64(MERSENNE_P)
    return vals.min(axis=1)


def band_keys(signature: np.ndarray, num_bands: int = 16) -> list[int]:
    """Fold each band of the signature to one uint64 bucket key."""
    rows = len(signature) // num_bands
    keys = []
    for b in range(num_bands):
        band = signature[b * rows : (b + 1) * rows]
        acc = np.uint64(1469598103934665603)  # FNV offset
        for v in band:
            acc = (acc ^ v) * np.uint64(1099511628211)
        keys.append(int(acc))
    return keys


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing minhash components — unbiased Jaccard estimate."""
    return float(np.mean(sig_a == sig_b))


def bottomk_sketch(hashes: np.ndarray, k: int = 128) -> np.ndarray:
    """k smallest distinct hashes — mergeable set sketch for exact-ish Jaccard."""
    u = np.unique(hashes)
    return u[:k]


def jaccard_from_bottomk(a: np.ndarray, b: np.ndarray, k: int = 128) -> float:
    """Jaccard estimate from two bottom-k sketches (union-bottom-k method)."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    if len(a) == 0 or len(b) == 0:
        return 0.0
    union = np.union1d(a, b)[:k]
    inter = np.intersect1d(a, b, assume_unique=True)
    return float(np.isin(union, inter, assume_unique=False).sum() / len(union))


def simhash64(text: str) -> int:
    """Charikar simhash over unigram hashes (unit weights)."""
    w = word_hashes(text)
    if len(w) == 0:
        return 0
    bits = ((w[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    sums = (2 * bits - 1).sum(axis=0)
    sig = np.uint64(0)
    for i in range(64):
        if sums[i] > 0:
            sig |= np.uint64(1) << np.uint64(i)
    return int(sig)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_band_keys(sig: int, num_bands: int = 4) -> list[int]:
    """Split 64 bits into num_bands chunks; near-dups within Hamming distance
    num_bands-1 share at least one chunk (pigeonhole)."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    return [(sig >> (i * width)) & mask for i in range(num_bands)]
