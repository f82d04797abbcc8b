"""Mergeable sketches for streaming aggregates (pure, deterministic).

Public algorithms only: HyperLogLog (Flajolet et al. '07, with the standard
small-range linear-counting correction) for approximate distinct counts, and
bottom-k hash sampling (the k-minimum-values uniform sample underlying KMV /
distinct sketches, here used as a deterministic uniform ROW sample) for
approximate quantiles. Both are associative merges, so they compose with the
repo's partial-combiner discipline: each block folds to a tiny sketch, the
sketches merge in one reduce, nothing rescans data.

Determinism contract (same as functions/text_hash.py): no wall clock, no
process state — identical inputs give identical sketches on any worker, any
block split, any retry. That is what lets the driver hash-compare results
against a single-process mirror in sources/oracle_sidecars.py.
"""

from __future__ import annotations

import zlib

import numpy as np

_MIX_MUL1 = np.uint64(0xBF58476D1CE4E5B9)  # splitmix64 finalizer constants
_MIX_MUL2 = np.uint64(0x94D049BB133111EB)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: uniform uint64 hash of int/uint 64-bit keys.
    Needed because HLL/bottom-k read BIT PATTERNS — sequential ids would
    otherwise land in a handful of registers."""
    z = x.astype(np.uint64, copy=True)
    z ^= z >> np.uint64(30)
    z *= _MIX_MUL1
    z ^= z >> np.uint64(27)
    z *= _MIX_MUL2
    z ^= z >> np.uint64(31)
    return z


def string_hashes(values: list[str]) -> np.ndarray:
    """uint64 per string (crc32 pair fold, the word_hashes idiom)."""
    if not values:
        return np.zeros(0, np.uint64)
    lo = np.fromiter(
        (zlib.crc32(v.encode()) for v in values), dtype=np.uint64, count=len(values)
    )
    hi = np.fromiter(
        (zlib.crc32(v.encode(), 0xBEEF) for v in values),
        dtype=np.uint64,
        count=len(values),
    )
    return mix64((hi << np.uint64(32)) | lo)


# --- HyperLogLog --------------------------------------------------------------

HLL_P = 12  # 4096 registers, ~1.6% standard error, 4 KiB per sketch


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold uint64 hashes into a 2^p uint8 register array (one batch)."""
    if p < 12:
        # The frexp rank trick below is only exact when the (64-p)-bit
        # suffix fits float64's 52-bit mantissa; smaller p silently biases
        # ranks when the suffix rounds across a power of two.
        raise ValueError(f"hll_registers requires p >= 12 (got {p})")
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(hashes) == 0:
        return regs
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - p)) - 1)
    # rank = leading zeros of the (64-p)-bit suffix + 1 = (64-p) - bitlen + 1;
    # suffix < 2^52 for p >= 12 so float64 frexp exponents are exact
    bitlen = np.frexp(w.astype(np.float64))[1]
    rank = np.uint8(64 - p + 1) - bitlen.astype(np.uint8)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_merge(sketches: list[np.ndarray]) -> np.ndarray:
    return np.maximum.reduce(sketches) if sketches else np.zeros(1 << HLL_P, np.uint8)


def hll_estimate(regs: np.ndarray) -> int:
    """Standard HLL estimate with the small-range linear-counting switch,
    rounded to int (deterministic)."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return int(round(est))


# --- bottom-k hash sample (uniform, mergeable) --------------------------------

def bottomk_rows(hashes: np.ndarray, values: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Keep the k rows with the smallest (hash, value) pairs: a uniform
    deterministic sample of the rows that merges by concat+retake. Sorting
    on the PAIR (lexsort) makes the result independent of input order even
    when duplicate keys produce hash ties."""
    order = np.lexsort((values, hashes))
    if len(hashes) > k:
        order = order[:k]
    return hashes[order], values[order]


def quantiles_from_sample(values: np.ndarray, qs: list[float]) -> list[float]:
    """Linear-interpolated quantiles over the sampled values (numpy default
    method — deterministic)."""
    if len(values) == 0:
        return [float("nan")] * len(qs)
    return [float(v) for v in np.quantile(values, qs)]
