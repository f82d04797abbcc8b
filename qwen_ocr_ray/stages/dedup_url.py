"""Exact URL dedup — first fetch wins (north_rule "Deduped"; SURVEY.md §2.5/§2.7).

The reference has no dedup (single-document tool); the rule for the rebuild
is: one output row per url, keeping the earliest ``warc_ts`` fetch (ties
broken by payload bytes for full determinism).

Shuffle strategy: hash-bucket on ``url`` (see stages/bucketing.py), then a
fully vectorized within-bucket first-row-per-key pass — one Python call per
bucket, O(B) calls total, never one per url.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from qwen_ocr_ray.stages.bucketing import add_bucket_column, pick_num_buckets


def first_per_key(table: pa.Table, key: str, order: list[tuple[str, str]]) -> pa.Table:
    """Vectorized keep-first-row-per-key: sort by (key, *order), then mask rows
    whose key differs from the previous row's."""
    if table.num_rows == 0:
        return table
    table = table.combine_chunks()
    idx = pc.sort_indices(table, sort_keys=[(key, "ascending"), *order])
    table = table.take(idx)
    keys = table[key].combine_chunks()
    n = len(keys)
    first = pa.concat_arrays(
        [
            pa.array([True]),
            pc.not_equal(keys.slice(1, n - 1), keys.slice(0, n - 1)),
        ]
    )
    return table.filter(first)


def dedup_first_fetch(ds, *, approx_rows: int | None = None, num_buckets: int | None = None):
    """Dataset-level exact dedup on url, earliest warc_ts wins.

    ``approx_rows`` sizes the bucket count (callers that know the input row
    count should pass it; ``ds.count()`` would trigger an extra pass).
    """
    b = num_buckets or pick_num_buckets(approx_rows)

    def bucket_stage(t: pa.Table) -> pa.Table:
        return add_bucket_column(t, "url", b)

    def dedup_bucket(t: pa.Table) -> pa.Table:
        out = first_per_key(t, "url", [("warc_ts", "ascending"), ("html", "ascending")])
        return out.drop_columns(["bucket"])

    return (
        ds.map_batches(bucket_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )
