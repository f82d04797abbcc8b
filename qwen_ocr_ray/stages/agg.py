"""Aggregation at scale: partial (combiner) aggregation before the shuffle.

A bare ``groupby(key).aggregate(...)`` shuffles every input row. These
helpers collapse each batch to one row per key FIRST (vectorized
``pyarrow.Table.group_by``), so the all-to-all exchange moves |keys|-sized
partials instead of |rows|-sized data — the distributed form of the
reference's in-loop token/cost accumulators
(/root/reference/src/models/document_job.py:290-292,364-366).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data.aggregate import Sum


def partial_sums_batch(
    batch: pa.Table, keys: list[str], sum_cols: dict[str, str], count_name: str | None = None
) -> pa.Table:
    """One row per key-combination per batch: sums of ``sum_cols`` (mapping
    source column -> output name) plus an optional row count."""
    work = batch.select([*keys, *sum_cols.keys()])
    if count_name:
        work = work.append_column("__ones", pa.array([1] * batch.num_rows, pa.int64()))
    aggs = [(src, "sum") for src in sum_cols]
    if count_name:
        aggs.append(("__ones", "sum"))
    grouped = work.group_by(keys).aggregate(aggs)
    renames = {f"{src}_sum": out for src, out in sum_cols.items()}
    if count_name:
        renames["__ones_sum"] = count_name
    return grouped.rename_columns([renames.get(n, n) for n in grouped.column_names])


def grouped_sums(
    ds,
    keys: list[str],
    sum_cols: dict[str, str],
    count_name: str | None = None,
):
    """Full partial->final grouped sum: map_batches combiner, then a small
    ``groupby().aggregate`` over the partials."""
    partial = ds.map_batches(
        lambda t: partial_sums_batch(t, keys, sum_cols, count_name),
        batch_format="pyarrow",
    )
    finals = [Sum(out, alias_name=out) for out in sum_cols.values()]
    if count_name:
        finals.append(Sum(count_name, alias_name=count_name))
    return partial.groupby(keys).aggregate(*finals)
