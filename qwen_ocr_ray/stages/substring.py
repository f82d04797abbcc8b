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

from qwen_ocr_ray.functions.text_hash import _TOKEN_RE, shingle_position_hashes
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


# --- exact-substring REMOVAL (the companion operator: Lee et al. '22 cut) -------

POS_LIM = 1 << 20  # positions-per-doc cap for the packed (doc_id, pos) int64
# key doc_id * POS_LIM + pos; valid while doc_id < 2^43 and docs < 1M tokens


def shingle_occurrence_batch(
    t: pa.Table, *, width: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """One row per shingle OCCURRENCE: (sh, dockey) with dockey packing
    (doc_id, position) so the corpus-wide FIRST occurrence of a gram is just
    ``min(dockey)`` — computable inside the gram's hash bucket."""
    sh_out: list[np.ndarray] = []
    key_out: list[np.ndarray] = []
    for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
        sh = shingle_position_hashes(text, width)
        if len(sh) == 0:
            continue
        # Guard the packing preconditions EXPLICITLY: an overflow would
        # alias (doc, pos) onto a neighboring doc — and the SQL oracle
        # packs identically, so conformance would mask the corruption (the
        # same failure mode kmeans.quantize raises on). 2^43 docs x 2^20
        # positions fills int64.
        if len(sh) >= POS_LIM or not (0 <= doc_id < (1 << 43)):
            raise ValueError(
                f"substring packing overflow: doc {doc_id} has {len(sh)} "
                f"shingle positions (limit {POS_LIM}) or id out of [0, 2^43)"
                " — raise POS_LIM or split the document"
            )
        sh_out.append(sh.view(np.int64))
        key_out.append(doc_id * POS_LIM + np.arange(len(sh), dtype=np.int64))
    if not sh_out:
        return pa.table(
            {"sh": pa.array([], pa.int64()), "dockey": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "sh": pa.array(np.concatenate(sh_out), pa.int64()),
            "dockey": pa.array(np.concatenate(key_out), pa.int64()),
        }
    )


def dup_occurrences_in_bucket(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """One shingle-hash bucket -> (id, pos) of every NON-FIRST occurrence
    (first = min packed key corpus-wide; all occurrences of a hash land in
    this bucket, so the min is global)."""
    if t.num_rows == 0:
        return pa.table(
            {id_col: pa.array([], pa.int64()), "pos": pa.array([], pa.int32())}
        )
    if "bucket" in t.column_names:
        t = t.drop_columns(["bucket"])
    firsts = t.group_by(["sh"]).aggregate([("dockey", "min")])
    j = t.join(firsts, keys="sh")
    d = j.filter(pc.greater(j["dockey"], j["dockey_min"]))
    keys = d["dockey"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            id_col: pa.array(keys // POS_LIM, pa.int64()),
            "pos": pa.array((keys % POS_LIM).astype(np.int32), pa.int32()),
        }
    )


def _starts_lists_in_bucket(t: pa.Table, id_col: str = "doc_id") -> pa.Table:
    """(id, pos) dup rows -> one (id, starts: list<int32>) row per doc.
    Cells are small int lists — safe through map_groups."""
    if t.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "starts": pa.array([], pa.list_(pa.int32())),
            }
        )
    if "bucket" in t.column_names:
        t = t.drop_columns(["bucket"])
    g = t.group_by([id_col]).aggregate([("pos", "list")])
    return pa.table({id_col: g[id_col], "starts": g["pos_list"]})


def _cut_batch(
    t: pa.Table, starts_of, *, width: int, id_col: str, text_col: str
) -> pa.Table:
    """Remove every word covered by a duplicated-gram start in ``starts_of``
    (a callable (doc_id, row_index) -> int array or None). Operates on the
    normalized token stream ([a-z0-9]+ of the lowercased text) — the same
    tokenization the dup verdict used, which the SQL oracle replays
    byte-exactly."""
    ids, n_words, n_removed, texts = [], [], [], []
    for i, (doc_id, text) in enumerate(
        zip(t[id_col].to_pylist(), t[text_col].to_pylist())
    ):
        words = _TOKEN_RE.findall(text.lower())
        n = len(words)
        if n == 0:
            continue  # no token rows on the SQL side either
        starts = starts_of(doc_id, i)
        if starts is None or len(starts) == 0:
            kept, removed = " ".join(words), 0
        else:
            delta = np.zeros(n + 1, dtype=np.int32)
            s = np.asarray(starts, dtype=np.int64)
            np.add.at(delta, s, 1)
            np.add.at(delta, np.minimum(s + width, n), -1)
            covered = np.cumsum(delta[:n]) > 0
            removed = int(covered.sum())
            kept = " ".join(w for w, c in zip(words, covered) if not c)
        ids.append(doc_id)
        n_words.append(n)
        n_removed.append(removed)
        texts.append(kept)
    return pa.table(
        {
            id_col: pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
            "text_dedup": pa.array(texts, pa.string()),
        }
    )


def substring_dedup(
    ds, *, width: int = 8, num_buckets: int = 16,
    id_col: str = "doc_id", text_col: str = "text",
    strategy: str = "broadcast", approx_rows: int | None = None,
    tmp_dir: str | None = None,
):
    """Exact-substring REMOVAL (Lee et al. '22 completed — the companion to
    ``substring_dup_stats``): keep the corpus-wide FIRST occurrence of every
    duplicated ``width``-gram and cut the words covered by every later
    occurrence. Returns (doc_id, n_words, n_removed, text_dedup).

    Shape: the shingle-occurrence stream (16-byte rows) exchanges once by
    gram hash to find non-first occurrences; the surviving (doc, start)
    evidence — sized by the corpus's DUPLICATED mass, not the corpus —
    folds to per-doc start lists. Three ways to land it on the text:

    * ``strategy="broadcast"`` (default): the evidence ships once via
      ray.put and documents stream through a pure map — the
      contested-winners discipline of the flagship's URL dedup.
    * ``strategy="join"``: a bucketed LEFT hash join. Fully distributed,
      but the text payload rides an in-memory ``groupby().map_groups``
      exchange — measured pathological on THIS VM for GB-scale string
      cells (CLAUDE.md); fine for moderate payloads.
    * ``strategy="disk"``: the 100 TB fallback, mirroring the flagship's
      dedup exchange — both sides write bucket-partitioned parquet (a
      per-task local partition, NO shuffle), then one raw Ray task per
      bucket joins its two bucket files and cuts. Payload bytes hit disk
      once and never ride a map_groups exchange. Scratch goes under
      ``tmp_dir`` (default ``/tmp/qor_subdedup/<pid>``).
    """
    import ray as _ray

    occ = ds.map_batches(
        lambda t: shingle_occurrence_batch(
            t, width=width, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
    )
    dups = (
        occ.map_batches(
            lambda t: add_bucket_column(t, "sh", num_buckets), batch_format="pyarrow"
        )
        .groupby("bucket")
        .map_groups(
            lambda t: dup_occurrences_in_bucket(t, id_col), batch_format="pyarrow"
        )
    )
    starts = (
        dups.map_batches(
            lambda t: add_bucket_column(t, id_col, num_buckets),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(
            lambda t: _starts_lists_in_bucket(t, id_col), batch_format="pyarrow"
        )
    )

    if strategy == "disk":
        return _cut_via_disk_exchange(
            ds, starts, width=width, id_col=id_col, text_col=text_col,
            num_buckets=num_buckets, tmp_dir=tmp_dir,
        )
    if strategy == "join":
        from qwen_ocr_ray.stages.join import bucketed_hash_join

        joined = bucketed_hash_join(
            ds.map_batches(
                lambda t: t.select([id_col, text_col]), batch_format="pyarrow"
            ),
            starts,
            id_col,
            pa.schema([(id_col, pa.int64()), (text_col, pa.string())]),
            pa.schema(
                [(id_col, pa.int64()), ("starts", pa.list_(pa.int32()))]
            ),
            how="left",
            approx_rows=approx_rows,
            num_buckets=num_buckets,
        )

        def cut_joined(t: pa.Table) -> pa.Table:
            return _cut_rowwise(
                t, t["starts"].to_pylist(),
                width=width, id_col=id_col, text_col=text_col,
            )

        return joined.map_batches(cut_joined, batch_format="pyarrow")

    # broadcast: collect the bounded (doc_id -> starts) evidence once
    evidence: dict[int, np.ndarray] = {}
    for b in starts.iter_batches(batch_size=None, batch_format="pyarrow"):
        for did, st in zip(b[id_col].to_pylist(), b["starts"].to_pylist()):
            evidence[did] = np.asarray(st, dtype=np.int64)
    ref = _ray.put(evidence)

    def cut(t: pa.Table) -> pa.Table:
        ev = _ray.get(ref)
        return _cut_batch(
            t, lambda did, _i: ev.get(did),
            width=width, id_col=id_col, text_col=text_col,
        )

    return ds.map_batches(cut, batch_format="pyarrow")


def _cut_rowwise(t: pa.Table, starts_list, *, width: int, id_col: str,
                 text_col: str) -> pa.Table:
    """_cut_batch over a joined batch whose i-th row carries its own starts
    (list or None from the left join)."""
    return _cut_batch(
        t, lambda _did, i: starts_list[i],
        width=width, id_col=id_col, text_col=text_col,
    )


def _cut_via_disk_exchange(ds, starts, *, width: int, id_col: str,
                           text_col: str, num_buckets: int,
                           tmp_dir: str | None) -> "object":
    """The flagship-exchange form of the removal join: both sides write
    bucket-partitioned parquet (``partition_cols`` is a per-task LOCAL
    partition — no shuffle, payload bytes hit disk exactly once), then one
    raw Ray task per bucket reads its two bucket directories, builds the
    evidence dict (bucket-bounded), and cuts — the text never rides a
    ``groupby().map_groups`` exchange (CLAUDE.md's measured pathology).
    Returns a Dataset over the per-bucket result tables."""
    import os
    import shutil

    import ray as _ray

    base = tmp_dir or f"/tmp/qor_subdedup/{os.getpid()}"
    docs_dir = os.path.join(base, "docs")
    starts_dir = os.path.join(base, "starts")
    shutil.rmtree(base, ignore_errors=True)
    ds.map_batches(
        lambda t: add_bucket_column(
            t.select([id_col, text_col]), id_col, num_buckets
        ),
        batch_format="pyarrow",
    ).write_parquet(docs_dir, partition_cols=["bucket"])
    starts.map_batches(
        lambda t: add_bucket_column(t, id_col, num_buckets),
        batch_format="pyarrow",
    ).write_parquet(starts_dir, partition_cols=["bucket"])

    @_ray.remote
    def cut_bucket(db: str, sb: str) -> pa.Table:
        import pyarrow.parquet as pq

        docs = pq.read_table(db)
        ev: dict[int, np.ndarray] = {}
        if os.path.isdir(sb):
            st = pq.read_table(sb)
            for did, s in zip(st[id_col].to_pylist(), st["starts"].to_pylist()):
                ev[did] = np.asarray(s, dtype=np.int64)
        return _cut_batch(
            docs, lambda did, _i: ev.get(did),
            width=width, id_col=id_col, text_col=text_col,
        )

    refs = [
        cut_bucket.remote(
            os.path.join(docs_dir, d), os.path.join(starts_dir, d)
        )
        for d in sorted(os.listdir(docs_dir))
        if d.startswith("bucket=")
    ]
    import ray.data as _rd

    return _rd.from_arrow_refs(refs)
