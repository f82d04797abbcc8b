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
    HLL_P,
    bottomk_rows,
    hll_estimate,
    hll_merge,
    hll_registers,
    mix64,
    quantiles_from_sample,
    string_hashes,
)


def _column_hashes(arr: pa.ChunkedArray) -> np.ndarray:
    if pa.types.is_integer(arr.type):
        return mix64(arr.to_numpy(zero_copy_only=False).astype(np.uint64))
    return string_hashes([x if x is not None else "" for x in arr.to_pylist()])


def approx_distinct(ds, col: str, p: int = HLL_P):
    """HyperLogLog distinct-count: one row ``{approx_distinct: int64}``."""

    def batch_regs(t: pa.Table) -> pa.Table:
        regs = hll_registers(_column_hashes(t[col]), p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    def reduce_regs(t: pa.Table) -> pa.Table:
        merged = hll_merge(
            [np.frombuffer(b, dtype=np.uint8) for b in t["regs"].to_pylist()]
        )
        return pa.table({"approx_distinct": pa.array([hll_estimate(merged)], pa.int64())})

    return (
        ds.map_batches(batch_regs, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_regs, batch_format="pyarrow", batch_size=None)
    )


def approx_quantiles(ds, value_col: str, key_col: str, qs: list[float], k: int = 4096):
    """Quantiles of ``value_col`` from a deterministic bottom-k hash sample
    keyed on ``key_col``; one row per requested quantile ``{q, value}``."""

    def batch_sample(t: pa.Table) -> pa.Table:
        h = _column_hashes(t[key_col])
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        hs, vs = bottomk_rows(h, v, k)
        return pa.table(
            {"h": pa.array(hs, pa.uint64()), "v": pa.array(vs, pa.float64())}
        )

    def reduce_sample(t: pa.Table) -> pa.Table:
        hs, vs = bottomk_rows(
            t["h"].to_numpy(zero_copy_only=False),
            t["v"].to_numpy(zero_copy_only=False),
            k,
        )
        vals = quantiles_from_sample(vs, qs)
        return pa.table(
            {
                "q": pa.array([float(q) for q in qs], pa.float64()),
                "value": pa.array(
                    [float(np.float32(round(v, 4))) for v in vals], pa.float64()
                ),
            }
        )

    return (
        ds.map_batches(batch_sample, batch_format="pyarrow")
        .repartition(1)
        .map_batches(reduce_sample, batch_format="pyarrow", batch_size=None)
    )
