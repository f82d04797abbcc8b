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


def _check_hll_p(p: int) -> None:
    if p < 12:
        # The frexp rank trick is only exact when the (64-p)-bit suffix
        # fits float64's 52-bit mantissa; smaller p silently biases ranks
        # when the suffix rounds across a power of two.
        raise ValueError(f"hll registers require p >= 12 (got {p})")


def hll_index_rank(hashes: np.ndarray, p: int = HLL_P) -> tuple[np.ndarray, np.ndarray]:
    """Per-hash (register index, rank) pairs — the scatter inputs shared by
    the flat and grouped register folds."""
    _check_hll_p(p)
    idx = (hashes >> np.uint64(64 - p)).astype(np.int64)
    w = hashes & np.uint64((1 << (64 - p)) - 1)
    # rank = leading zeros of the (64-p)-bit suffix + 1 = (64-p) - bitlen + 1;
    # suffix < 2^52 for p >= 12 so float64 frexp exponents are exact
    bitlen = np.frexp(w.astype(np.float64))[1]
    rank = (np.uint8(64 - p + 1) - bitlen.astype(np.uint8)).astype(np.uint8)
    return idx, rank


def hll_registers(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """Fold uint64 hashes into a 2^p uint8 register array (one batch)."""
    _check_hll_p(p)
    regs = np.zeros(1 << p, dtype=np.uint8)
    if len(hashes):
        idx, rank = hll_index_rank(hashes, p)
        np.maximum.at(regs, idx, rank)
    return regs


def hll_registers_grouped(group_idx: np.ndarray, hashes: np.ndarray,
                          n_groups: int, p: int = HLL_P) -> np.ndarray:
    """Fold hashes into PER-GROUP register arrays in one scatter: a
    (n_groups, 2^p) uint8 matrix via a single ``np.maximum.at`` on
    (group, register) pairs — O(n) at any group cardinality (the per-group
    mask loop it replaces was O(groups x n)). Row g equals
    ``hll_registers(hashes[group_idx == g], p)`` exactly (max is max)."""
    _check_hll_p(p)
    regs = np.zeros((n_groups, 1 << p), dtype=np.uint8)
    if len(hashes):
        idx, rank = hll_index_rank(hashes, p)
        np.maximum.at(regs, (group_idx, idx), rank)
    return regs


# --- weighted reservoir sampling (Efraimidis-Spirakis A-ES, deterministic) -----

def aes_keys(ids: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """A-ES selection keys: key = u^(1/w) with u a hash-uniform of the id
    (no RNG state — identical on any block split / retry / resume). The k
    LARGEST keys under the (-key, id) total order are a weight-proportional
    sample; top-k is mergeable (per-block top-k union re-taken to k equals
    the one-pass top-k). ONE definition shared by the pipeline and the
    sidecar mirror so the kernel cannot desynchronize."""
    u = (mix64(ids.astype(np.uint64)).astype(np.float64) + 1.0) / 2.0**64
    return u ** (1.0 / np.maximum(weights.astype(np.float64), 1.0))


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


# --- frequent items (heavy hitters) --------------------------------------------

def frequent_candidates(values: np.ndarray, phi: float) -> np.ndarray:
    """Items whose LOCAL frequency in this block exceeds ``phi`` — the
    per-block candidate kernel of two-pass exact heavy hitters (the candidate
    set a Misra-Gries sketch with 1/phi counters would surface; we pre-count
    the block with ``np.unique`` instead of MG decrements since the block is
    already materialized — identical guarantee, vectorized).

    Guarantee (pigeonhole over blocks b): if an item's GLOBAL frequency
    exceeds phi then max_b c_b/N_b >= (sum_b c_b)/(sum_b N_b) > phi, so the
    item is a candidate in at least one block — the UNION of per-block
    candidates is a superset of the global >phi heavy hitters, with at most
    floor(1/phi) candidates per block (bounded driver collect)."""
    if len(values) == 0:
        return values
    vals, counts = np.unique(values, return_counts=True)
    return vals[counts > phi * len(values)]


# --- Count-Min sketch (approximate frequencies, mergeable by addition) ---------

CMS_DEPTH = 4      # independent hash rows; overestimate prob ~ (n/w)^d
CMS_WIDTH = 2048   # int64 counters: 4 x 2048 x 8 B = 64 KiB per sketch

# per-row salts derived from the splitmix64 increment — fixed, so every
# block/builder uses the SAME hash family and sketches add coherently
_CMS_SALTS = mix64(np.arange(1, CMS_DEPTH + 1, dtype=np.uint64)
                   * np.uint64(0x9E3779B97F4A7C15))


def _cms_columns(hashes: np.ndarray, j: int, w: int) -> np.ndarray:
    return (mix64(hashes ^ _CMS_SALTS[j]) % np.uint64(w)).astype(np.int64)


def cms_fold(hashes: np.ndarray, d: int = CMS_DEPTH, w: int = CMS_WIDTH) -> np.ndarray:
    """Fold uint64 key hashes into a d x w int64 counter matrix (one block).
    Matrices from any block split ADD into the same sketch (integer addition
    is associative+commutative, so the distributed merge is bit-identical to
    a single-process fold) — Cormode-Muthukrishnan Count-Min."""
    counts = np.zeros((d, w), dtype=np.int64)
    for j in range(d):
        np.add.at(counts[j], _cms_columns(hashes, j, w), 1)
    return counts


def cms_estimate(counts: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point-frequency estimates: min over the d rows. Never underestimates;
    overestimates by > 2n/w with probability <= 2^-d per key."""
    d, w = counts.shape
    est = np.full(len(hashes), np.iinfo(np.int64).max, dtype=np.int64)
    for j in range(d):
        np.minimum(est, counts[j, _cms_columns(hashes, j, w)], out=est)
    return est


# --- Bloom filter (approximate membership, mergeable by bitwise OR) ------------

BLOOM_BITS_PER_KEY = 16   # m/n ratio; with k=11 hashes FP rate ~= 4.6e-4
BLOOM_NUM_HASHES = 11     # ~= (m/n) ln 2, the optimal k for 16 bits/key


def bloom_num_bits(n_keys: int, bits_per_key: int = BLOOM_BITS_PER_KEY) -> int:
    """Power-of-two bit count sized from an UPPER BOUND on the key count
    (e.g. parquet-footer row counts — no scan). Power of two so position
    masking is a bit-and and every builder derives the same m."""
    m = 1 << max(10, int(np.ceil(np.log2(max(1, n_keys) * bits_per_key))))
    return m


def _bloom_positions(h1: np.ndarray, h2: np.ndarray, m: int,
                     k: int = BLOOM_NUM_HASHES) -> np.ndarray:
    """(n, k) bit positions via Kirsch-Mitzenmacher double hashing:
    pos_j = (h1 + j*h2) mod m — k independent-enough probes from two 64-bit
    hashes (h2 forced odd so probes cycle the full power-of-two range)."""
    j = np.arange(k, dtype=np.uint64)[None, :]
    h2 = (h2 | np.uint64(1))[:, None]
    return ((h1[:, None] + j * h2) & np.uint64(m - 1)).astype(np.int64)


def bloom_fill(h1: np.ndarray, h2: np.ndarray, m: int) -> np.ndarray:
    """One block's keys -> an m-bit bitmap (uint8[m/8]). Bitmaps from any
    block split OR together into the same filter (associative, order-free)."""
    regs = np.zeros(m >> 3, dtype=np.uint8)
    if len(h1):
        pos = _bloom_positions(h1, h2, m).ravel()
        np.bitwise_or.at(regs, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return regs


def bloom_contains(regs: np.ndarray, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
    """Vectorized membership probe: True = possibly present (FP rate set by
    sizing), False = DEFINITELY absent — the one-sided error that makes a
    Bloom filter a safe dedup pre-filter (it never drops a genuinely new
    document... it only ever lets the exact path see a few extra)."""
    if len(h1) == 0:
        return np.zeros(0, dtype=bool)
    m = len(regs) << 3
    pos = _bloom_positions(h1, h2, m)
    bits = (regs[pos >> 3] & (1 << (pos & 7)).astype(np.uint8)) != 0
    return bits.all(axis=1)


def md5_hash_pairs(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hashes per text (md5 digest halves) — the
    exact-content fingerprint feeding the Bloom probes. md5 so a
    single-process mirror (hashlib) is bit-identical on any platform."""
    import hashlib

    n = len(texts)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    for i, s in enumerate(texts):
        d = hashlib.md5(s.encode()).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little")
    return h1, h2


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
