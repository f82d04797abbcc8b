"""Sketch-based streaming aggregates: approximate distinct counts and
approximate quantiles over unbounded columns.

Shape for 100 TB: each block folds to a CONSTANT-size sketch inside
``map_batches`` (4 KiB HLL registers / k sampled rows), then the sketches —
not the data — move through one ``repartition(1)`` reduce. Total exchange
volume is O(blocks x sketch_size) regardless of input size; compare the
exact alternatives (`distinct_status_priority`'s bucketed groupby,
`length_percentiles`' exact global percentile) which must shuffle every key.
Kernels in ``functions/sketch.py`` are pure/deterministic, so the driver
cross-checks the whole distributed merge against a single-process mirror
(sources/oracle_sidecars.py) byte-for-byte.

No reference counterpart (§2.6 training-data-curation extension suite).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from qwen_ocr_ray.functions.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    HLL_P,
    bottomk_rows,
    cms_estimate,
    cms_fold,
    hll_estimate,
    hll_merge,
    hll_registers,
    mix64,
    quantiles_from_sample,
    string_hashes,
)


def _column_hashes(arr: pa.ChunkedArray) -> np.ndarray:
    """uint64 hash per NON-NULL value. Nulls are dropped for every type —
    a null contributes neither a distinct value to HLL nor a sample key to
    bottom-k (mapping them to "" counted one phantom distinct for strings
    while integer nulls errored: inconsistent semantics)."""
    arr = arr.drop_null()
    if pa.types.is_integer(arr.type):
        return mix64(arr.to_numpy(zero_copy_only=False).astype(np.uint64))
    return string_hashes(arr.to_pylist())


_FANIN = 64  # level-1 combine width


def _two_level_reduce(sketch_rows, combine, finalize):
    """Merge per-block sketch rows without funnelling them all into ONE
    task: level 1 re-partitions the (tiny) sketch rows across _FANIN
    combine tasks, level 2 merges the _FANIN partials. Both merges are
    associative+commutative, so the grouping is irrelevant to the result;
    the final task's input is bounded at _FANIN sketches no matter how many
    blocks the input had (a single repartition(1) would scale linearly with
    block count — ~4 GB of HLL registers at 10^6 blocks)."""
    return (
        sketch_rows.repartition(_FANIN)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(finalize, batch_format="pyarrow", batch_size=None)
    )


def approx_distinct(ds, col: str, p: int = HLL_P):
    """HyperLogLog distinct-count: one row ``{approx_distinct: int64}``."""

    def batch_regs(t: pa.Table) -> pa.Table:
        regs = hll_registers(_column_hashes(t[col]), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def _merged(t: pa.Table) -> np.ndarray:
        return hll_merge(
            [np.frombuffer(b, dtype=np.uint8) for b in t["regs"].to_pylist()]
        )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return pa.table({"regs": pa.array([_merged(t).tobytes()], pa.binary())})

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"approx_distinct": pa.array([hll_estimate(_merged(t))], pa.int64())}
        )

    return _two_level_reduce(
        ds.map_batches(batch_regs, batch_format="pyarrow"), combine, finalize
    )


def approx_quantiles(ds, value_col: str, key_col: str, qs: list[float], k: int = 4096):
    """Quantiles of ``value_col`` from a deterministic bottom-k hash sample
    keyed on ``key_col``; one row per requested quantile ``{q, value}``."""

    def batch_sample(t: pa.Table) -> pa.Table:
        if t[key_col].null_count:
            # keep hash/value row alignment: null keys contribute no sample
            import pyarrow.compute as pc

            t = t.filter(pc.is_valid(t[key_col]))
        h = _column_hashes(t[key_col])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hs, vs = bottomk_rows(h, v, k)
        return pa.table(
            {"h": pa.array(hs, pa.uint64()), "v": pa.array(vs, pa.float64())}
        )

    def _retake(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        return bottomk_rows(
            t["h"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False),
            k,
        )

    def combine(t: pa.Table) -> pa.Table:
        hs, vs = _retake(t)
        return pa.table(
            {"h": pa.array(hs, pa.uint64()), "v": pa.array(vs, pa.float64())}
        )

    def finalize(t: pa.Table) -> pa.Table:
        _, vs = _retake(t)
        vals = quantiles_from_sample(vs, qs)
        return pa.table(
            {
                "q": pa.array([float(q) for q in qs], pa.float64()),
                "value": pa.array(
                    [float(np.float32(round(v, 4))) for v in vals], pa.float64()
                ),
            }
        )

    return _two_level_reduce(
        ds.map_batches(batch_sample, batch_format="pyarrow"), combine, finalize
    )


def cms_point_counts(ds, col: str, probes: list[int],
                     d: int = CMS_DEPTH, w: int = CMS_WIDTH):
    """Count-Min approximate frequency of each probe key: per-block d x w
    counter folds (64 KiB each), merged by ADDITION through the two-level
    reduce — the mergeable replacement for COUNT(*) GROUP BY point lookups
    when the key space is unbounded. Integer addition commutes, so the
    distributed result is bit-identical to a single-process fold (what the
    sidecar oracle certifies). Rows: ``{key: int64, est_count: int64}``."""
    probe_hashes = mix64(np.asarray(sorted(probes), dtype=np.uint64))

    def batch_fold(t: pa.Table) -> pa.Table:
        counts = cms_fold(_column_hashes(t[col]), d, w)
        return pa.table({"cms": pa.array([counts.tobytes()], pa.binary())})

    def _merged(t: pa.Table) -> np.ndarray:
        return np.sum(
            [np.frombuffer(b, np.int64).reshape(d, w) for b in t["cms"].to_pylist()],
            axis=0,
        )

    def combine(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        return pa.table({"cms": pa.array([_merged(t).tobytes()], pa.binary())})

    def finalize(t: pa.Table) -> pa.Table:
        est = cms_estimate(_merged(t), probe_hashes)
        return pa.table(
            {
                "key": pa.array(sorted(probes), pa.int64()),
                "est_count": pa.array(est, pa.int64()),
            }
        )

    return _two_level_reduce(
        ds.map_batches(batch_fold, batch_format="pyarrow"), combine, finalize
    )


def grouped_approx_quantiles(ds, value_col: str, key_col: str, group_col: str,
                             qs: list[float], k: int = 256):
    """Per-group bottom-k hash-sample quantiles (the grouped form of
    ``approx_quantiles``): each block keeps k sampled rows PER GROUP, so the
    exchange carries O(blocks x groups x k) tiny (group, hash, value) rows —
    never the data — and the per-group merge re-takes k and interpolates.
    map_groups is safe here: cells are a string key + two scalars (the
    large-payload pathology documented in CLAUDE.md does not apply)."""

    def batch_sample(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.filter(pc.is_valid(t[key_col]))
        groups = t[group_col].to_numpy(zero_copy_only=False)
        h_all = _column_hashes(t[key_col])
        v_all = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        # one lexsort ((group, hash, value) ascending), then keep the first
        # k rows of each group run — O(n log n) at ANY group cardinality
        # (a per-group boolean-mask loop is O(groups x n): fine for 5 event
        # types, pathological for 10^5 domains)
        order = np.lexsort((v_all, h_all, groups))
        g_sorted = groups[order]
        starts = np.flatnonzero(np.r_[True, g_sorted[1:] != g_sorted[:-1]])
        run_lens = np.diff(np.r_[starts, len(g_sorted)])
        rank = np.arange(len(g_sorted)) - np.repeat(starts, run_lens)
        keep = order[rank < k]
        return pa.table(
            {
                group_col: pa.array(groups[keep], pa.string()),
                "h": pa.array(h_all[keep], pa.uint64()),
                "v": pa.array(v_all[keep], pa.float64()),
            }
        )

    def finalize_group(t: pa.Table) -> pa.Table:
        _, vs = bottomk_rows(
            t["h"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False),
            k,
        )
        vals = quantiles_from_sample(vs, qs)
        g = t[group_col][0].as_py()
        return pa.table(
            {
                group_col: pa.array([g] * len(qs), pa.string()),
                "q": pa.array([float(q) for q in qs], pa.float64()),
                "value": pa.array(
                    [float(np.float32(round(v, 4))) for v in vals], pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(batch_sample, batch_format="pyarrow")
        .groupby(group_col)
        .map_groups(finalize_group, batch_format="pyarrow")
    )
