"""Exact-substring duplication analysis (Lee et al. '22 style, shingle form).

The substring-level complement of the document-level dedup suite
(stages/dedup_text.py): instead of asking "are these two DOCUMENTS
near-identical", it asks "which SPANS of this document also occur elsewhere
in the corpus" — the signal behind suffix-array exact-substring dedup in
training-data pipelines. We use fixed-width word shingles (hashes of every
k-gram POSITION, multiplicity kept) rather than a suffix array: shingle
streams shard trivially over blocks, the duplicated-span verdict needs only
a corpus-wide count per shingle, and at 10^12 documents that count is a
hash-bucketed exchange of 16-byte (hash, count) partials — no payload ever
shuffles, no global structure is built.

Pipeline shape (all exchanges carry small fixed-width cells — safe through
``groupby().map_groups`` per CLAUDE.md):

  map_batches   doc -> (doc_id, sh, n_pos) per DISTINCT shingle per doc
                (the per-batch combiner: within-doc multiplicity is already
                collapsed here, so the exchange moves |distinct shingles|
                rows, not |positions|)
  bucket(sh) -> groupby(bucket).map_groups: per-bucket corpus totals per
                shingle (all occurrences of a hash land in one bucket), then
                per-(doc, bucket) partial sums of total/duplicated positions
  grouped_sums(doc_id): final per-document totals + duplicated fraction

The oracle (SQL over DuckDB) rebuilds the identical shingle stream from the
string side (``regexp_extract_all`` + list slicing) and groups by the shingle
STRING — results agree unless the 64-bit rolling hash collides (~n^2/2^64).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from qwen_ocr_ray.functions.text_hash import shingle_position_hashes
from qwen_ocr_ray.stages.agg import grouped_sums
from qwen_ocr_ray.stages.bucketing import add_bucket_column

_PARTIAL_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("sh", pa.int64()), ("n_pos", pa.int64())]
)


def shingle_counts_batch(
    t: pa.Table, *, width: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """One row per (doc, distinct shingle) with its within-doc position count."""
    doc_ids: list[int] = []
    sh_out: list[np.ndarray] = []
    n_out: list[np.ndarray] = []
    for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
        sh = shingle_position_hashes(text, width)
        if len(sh) == 0:
            continue
        uniq, counts = np.unique(sh, return_counts=True)
        sh_out.append(uniq.view(np.int64))
        n_out.append(counts.astype(np.int64))
        doc_ids.extend([doc_id] * len(uniq))
    if not doc_ids:
        return pa.table({n: [] for n in _PARTIAL_SCHEMA.names}, schema=_PARTIAL_SCHEMA)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "sh": pa.array(np.concatenate(sh_out), pa.int64()),
            "n_pos": pa.array(np.concatenate(n_out), pa.int64()),
        },
        schema=_PARTIAL_SCHEMA,
    )


def dup_stats_in_bucket(t: pa.Table) -> pa.Table:
    """One shingle-hash bucket -> per-doc PARTIAL (n_pos, dup_pos) sums.

    The bucket holds every (doc, shingle, count) row for its hash range, so
    the corpus-wide total per shingle is complete here; a shingle is
    "duplicated" when its total occurrence count (across all docs AND within
    one doc) is >= 2. Module-level so the oracle sidecar could run the
    identical kernel single-process if the SQL oracle were unavailable."""
    if t.num_rows == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_pos": pa.array([], pa.int64()),
                "dup_pos": pa.array([], pa.int64()),
            }
        )
    if "bucket" in t.column_names:
        t = t.drop_columns(["bucket"])
    tot = t.group_by(["sh"]).aggregate([("n_pos", "sum")])  # sh, n_pos_sum
    j = t.join(tot, keys="sh")
    dup = pc.if_else(
        pc.greater_equal(j["n_pos_sum"], 2), j["n_pos"], pa.scalar(0, pa.int64())
    )
    per = pa.table({"doc_id": j["doc_id"], "n_pos": j["n_pos"], "dup_pos": dup})
    g = per.group_by(["doc_id"]).aggregate([("n_pos", "sum"), ("dup_pos", "sum")])
    # select output columns BY NAME: pyarrow's aggregate column ORDER is
    # version-dependent (keys-first vs keys-last), so a positional
    # rename_columns would silently swap doc_id with the sums (ADVICE r04)
    return pa.table(
        {"doc_id": g["doc_id"], "n_pos": g["n_pos_sum"], "dup_pos": g["dup_pos_sum"]}
    )


def substring_dup_stats(
    ds, *, width: int = 8, num_buckets: int = 16,
    id_col: str = "doc_id", text_col: str = "text",
):
    """Per-document exact-substring duplication stats:
    (doc_id, n_shingles, n_dup_shingles, dup_frac)."""
    partial = ds.map_batches(
        lambda t: shingle_counts_batch(t, width=width, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    per_doc = (
        partial.map_batches(
            lambda t: add_bucket_column(t, "sh", num_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(dup_stats_in_bucket, batch_format="pyarrow")
    )
    stats = grouped_sums(
        per_doc, keys=["doc_id"],
        sum_cols={"n_pos": "n_shingles", "dup_pos": "n_dup_shingles"},
    )

    def finish(t: pa.Table) -> pa.Table:
        # int/int division is bit-identical cross-engine (CLAUDE.md)
        frac = pc.divide(
            pc.cast(t["n_dup_shingles"], pa.float64()),
            pc.cast(t["n_shingles"], pa.float64()),
        )
        return t.append_column("dup_frac", frac)

    return stats.map_batches(finish, batch_format="pyarrow")
