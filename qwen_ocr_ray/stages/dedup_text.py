"""Content deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Large-scale training-data pipeline operators (a core engine capability beyond
the reference's own surface). All follow the same shuffle discipline as the
url dedup: vectorized per-batch sketching, hash-bucketed shuffles keyed on
the sketch, O(buckets) Python calls.

Pipeline shapes:
  exact       md5(text) -> bucket by fingerprint -> first doc_id per fp
  minhash-LSH shingle->minhash per batch -> explode (band, key, doc) rows
              -> groupby band bucket -> candidate pairs -> signature-estimated
              Jaccard filter (no second text fetch; signatures travel with
              the rows)
  simhash     64-bit signature per doc -> 4-way band explode -> co-bucketed
              pairs within Hamming distance <= 3
  bottom-k    exact-ish n-gram Jaccard verify on candidate pairs via
              mergeable bottom-k set sketches
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from qwen_ocr_ray.functions.text_hash import (
    band_keys,
    bottomk_sketch,
    estimate_jaccard,
    hamming64,
    jaccard_from_bottomk,
    minhash_signature,
    shingle_hashes,
    simhash64,
    simhash_band_keys,
)
from qwen_ocr_ray.stages.band_guard import guarded_group_pairs
from qwen_ocr_ray.stages.bucketing import add_bucket_column
from qwen_ocr_ray.stages.dedup_url import first_per_key

NUM_PERM = 64
NUM_BANDS = 16
BOTTOM_K = 128


# --- exact content dedup ------------------------------------------------------

def fingerprint_batch(t: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [hashlib.md5(s.encode()).hexdigest() for s in t[text_col].to_pylist()]
    return t.append_column("fingerprint", pa.array(fps, pa.string()))


def dedup_exact_text(ds, *, id_col: str = "doc_id", text_col: str = "text",
                     strategy: str = "broadcast", num_buckets: int = 32):
    """Keep the smallest id per distinct text content.

    ``broadcast`` (default): shuffle only (fingerprint, id) pairs — a
    partial-combiner groupby finds the winner id per CONTESTED fingerprint
    (count > 1); that duplicate-fraction-sized map is broadcast and rows are
    filtered in place. Document payloads never move.

    ``exchange``: bucket-shuffle full rows (general but pays the
    payload-through-groupby cost; see CLAUDE.md on map_groups)."""
    if strategy == "broadcast":
        import ray
        from ray.data.aggregate import Min, Sum

        def partial(t: pa.Table) -> pa.Table:
            t = fingerprint_batch(t, text_col).select(["fingerprint", id_col])
            t = t.append_column("ones", pa.array([1] * t.num_rows, pa.int64()))
            g = t.group_by(["fingerprint"]).aggregate([(id_col, "min"), ("ones", "sum")])
            return g.rename_columns(["fingerprint", "win_id", "n"])

        agg = (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("fingerprint")
            .aggregate(Min("win_id", alias_name="win_id"), Sum("n", alias_name="n"))
        )
        contested = agg.map_batches(
            lambda t: t.filter(pc.greater(t["n"], 1)).drop_columns(["n"]),
            batch_format="pyarrow",
        ).to_pandas()
        if len(contested):
            # Broadcast as Arrow arrays for vectorized pc.is_in filtering —
            # this is the full-payload pass, no per-row Python membership.
            ref = ray.put((
                pa.array(contested.fingerprint, pa.string()),
                pa.array(
                    [f"{f}|{i}" for f, i in
                     zip(contested.fingerprint, contested.win_id)],
                    pa.string(),
                ),
            ))
        else:
            ref = None

        def keep(t: pa.Table) -> pa.Table:
            t = fingerprint_batch(t, text_col)
            if ref is None:
                return t
            fps_a, keys_a = ray.get(ref)
            is_cont = pc.is_in(t["fingerprint"], value_set=fps_a)
            if not pc.any(is_cont).as_py():
                return t
            key = pc.binary_join_element_wise(
                t["fingerprint"], pc.cast(t[id_col], pa.string()), "|"
            )
            return t.filter(
                pc.or_(pc.invert(is_cont), pc.is_in(key, value_set=keys_a))
            )

        return ds.map_batches(keep, batch_format="pyarrow")

    def bucket(t: pa.Table) -> pa.Table:
        return add_bucket_column(fingerprint_batch(t, text_col), "fingerprint", num_buckets)

    def first_in_bucket(t: pa.Table) -> pa.Table:
        return first_per_key(t, "fingerprint", [(id_col, "ascending")]).drop_columns(["bucket"])

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_in_bucket, batch_format="pyarrow")
    )


# --- minhash + LSH ------------------------------------------------------------

def minhash_explode_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Doc rows -> (band_id, band_key, doc_id, signature) rows (NUM_BANDS per
    doc). The id column keeps its input type (int keys for the documents
    table, url strings for the composed curation pipeline)."""
    ids = t[id_col].to_pylist()
    texts = t[text_col].to_pylist()
    out_band, out_key, out_id, out_sig = [], [], [], []
    for i, text in zip(ids, texts):
        sig = minhash_signature(shingle_hashes(text), NUM_PERM)
        sig_bytes = sig.tobytes()
        for band_id, key in enumerate(band_keys(sig, NUM_BANDS)):
            out_band.append(band_id)
            out_key.append(key - (1 << 63))  # to signed int64
            out_id.append(i)
            out_sig.append(sig_bytes)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            "doc_id": pa.array(out_id, t[id_col].type),
            "signature": pa.array(out_sig, pa.binary()),
        }
    )


PAIRS_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("est_jaccard", pa.float32())]
)


def pairs_schema(id_type: pa.DataType) -> pa.Schema:
    return pa.schema(
        [("doc_a", id_type), ("doc_b", id_type), ("est_jaccard", pa.float32())]
    )


def _minhash_score(threshold: float):
    """score_fn for guarded_group_pairs: signature-agreement Jaccard."""

    def score(a: bytes, b: bytes) -> float | None:
        e = estimate_jaccard(
            np.frombuffer(a, dtype=np.uint64), np.frombuffer(b, dtype=np.uint64)
        )
        return e if e >= threshold else None

    return score


def candidate_pairs_in_bucket(
    t: pa.Table, threshold: float, *, max_group: int = 256
) -> pa.Table:
    """One (band_id-range) bucket of exploded rows -> verified near-dup pairs.

    Groups rows by (band_id, band_key); every pair sharing a band bucket is a
    candidate; verification = signature-agreement Jaccard estimate (the
    signatures travel with the rows, so no second fetch of the corpus).
    Every group goes through the hot-band guard (stages/band_guard.py):
    identical-signature star edges, max_group chunk split, representative
    bridges."""
    schema = pairs_schema(t["doc_id"].type)
    if t.num_rows == 0:
        return pa.table({n: [] for n in schema.names}, schema=schema)
    t = t.combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("band_id", "ascending"), ("band_key", "ascending"), ("doc_id", "ascending")]
    )
    t = t.take(idx)
    bands = t["band_id"].to_pylist()
    keys = t["band_key"].to_pylist()
    ids = t["doc_id"].to_pylist()
    sigs = t["signature"].to_pylist()
    est: dict[tuple[int, int], float] = {}
    score = _minhash_score(threshold)
    i, n = 0, len(ids)
    while i < n:
        j = i
        while j < n and bands[j] == bands[i] and keys[j] == keys[i]:
            j += 1
        if j - i > 1:
            guarded_group_pairs(
                ids, sigs, i, j, est,
                score_fn=score, self_score_fn=lambda s: 1.0, max_group=max_group,
            )
        i = j
    pairs = sorted(est)
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], schema.field("doc_a").type),
            "doc_b": pa.array([p[1] for p in pairs], schema.field("doc_b").type),
            "est_jaccard": pa.array([np.float32(round(est[p], 4)) for p in pairs], pa.float32()),
        },
        schema=schema,
    )


def minhash_lsh_pairs(ds, *, threshold: float = 0.5, id_col: str = "doc_id",
                      text_col: str = "text", num_buckets: int = 32):
    """Near-duplicate pairs via banded MinHash-LSH; output may contain the
    same pair discovered in different band buckets — deduped by a final
    first-per-pair pass."""
    exploded = ds.map_batches(
        lambda t: minhash_explode_batch(t, id_col, text_col), batch_format="pyarrow"
    )

    def bucket(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["band_id"], pa.string()), pc.cast(t["band_key"], pa.string()), ":"
        )
        return add_bucket_column(t.append_column("bk", key), "bk", num_buckets).drop_columns(["bk"])

    pairs = (
        exploded.map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: candidate_pairs_in_bucket(t.drop_columns(["bucket"]), threshold),
            batch_format="pyarrow",
        )
    )

    def pair_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["doc_a"], pa.string()), pc.cast(t["doc_b"], pa.string()), "_"
        )
        return add_bucket_column(t.append_column("pair", key), "pair", 16)

    return (
        pairs.map_batches(pair_key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: first_per_key(t, "pair", [("doc_a", "ascending")]).drop_columns(
                ["pair", "bucket"]
            ),
            batch_format="pyarrow",
        )
    )


# --- simhash ------------------------------------------------------------------

def simhash_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    sigs = [simhash64(s) for s in t[text_col].to_pylist()]
    return pa.table(
        {
            id_col: t[id_col],
            "simhash": pa.array([format(s, "016x") for s in sigs], pa.string()),
        }
    )


def simhash_docs(ds, *, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document 64-bit simhash (hex). Pure map — no shuffle."""
    return ds.map_batches(lambda t: simhash_batch(t, id_col, text_col), batch_format="pyarrow")


def simhash_explode_banded(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Doc rows -> 4 banded (doc_id, band_id, band_key, sig) rows per doc."""
    ids, texts = t[id_col].to_pylist(), t[text_col].to_pylist()
    out_id, out_band, out_key, out_sig = [], [], [], []
    for i, text in zip(ids, texts):
        sig = simhash64(text)
        for band_id, key in enumerate(simhash_band_keys(sig, 4)):
            out_id.append(i)
            out_band.append(band_id)
            out_key.append(key)
            out_sig.append(sig - (1 << 63))
    return pa.table(
        {
            "doc_id": pa.array(out_id, pa.int64()),
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            "sig": pa.array(out_sig, pa.int64()),
        }
    )


def simhash_pairs_in_bucket(
    t: pa.Table, max_hamming: int, *, max_group: int = 256
) -> pa.Table:
    """One bucket of banded simhash rows -> verified pairs (hamming <= max).
    Module-level so the oracle sidecar can run the IDENTICAL kernel over all
    rows single-process (distributed-plumbing parity check). Hot-band guard
    (stages/band_guard.py): identical signatures collapse to star edges
    (hamming 0), distinct signatures chunk-split past ``max_group``."""
    schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int32())]
    )
    if t.num_rows == 0:
        return pa.table({n: [] for n in schema.names}, schema=schema)
    t = t.combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("band_id", "ascending"), ("band_key", "ascending"), ("doc_id", "ascending")]
    )
    t = t.take(idx)
    bands, keys = t["band_id"].to_pylist(), t["band_key"].to_pylist()
    ids, sigs = t["doc_id"].to_pylist(), t["sig"].to_pylist()
    off = 1 << 63

    def score(a: int, b: int) -> int | None:
        d = hamming64(a + off, b + off)
        return d if d <= max_hamming else None

    seen: dict[tuple[int, int], int] = {}
    i, n = 0, len(ids)
    while i < n:
        j = i
        while j < n and bands[j] == bands[i] and keys[j] == keys[i]:
            j += 1
        if j - i > 1:
            guarded_group_pairs(
                ids, sigs, i, j, seen,
                score_fn=score,
                self_score_fn=lambda s: 0,
                sig_bytes=lambda s: (s + off).to_bytes(8, "little"),
                max_group=max_group,
            )
        i = j
    pairs = sorted(seen)
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
            "hamming": pa.array([seen[p] for p in pairs], pa.int32()),
        },
        schema=schema,
    )


def simhash_near_pairs(ds, *, max_hamming: int = 3, id_col: str = "doc_id",
                       text_col: str = "text", num_buckets: int = 16):
    """Pairs within Hamming distance <= max_hamming via 4-way band pigeonhole."""

    def bucket(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["band_id"], pa.string()), pc.cast(t["band_key"], pa.string()), ":"
        )
        return add_bucket_column(t.append_column("bk", key), "bk", num_buckets).drop_columns(["bk"])

    pairs = (
        ds.map_batches(lambda t: simhash_explode_banded(t, id_col, text_col), batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: simhash_pairs_in_bucket(t.drop_columns(["bucket"]), max_hamming),
            batch_format="pyarrow",
        )
    )

    def pair_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["doc_a"], pa.string()), pc.cast(t["doc_b"], pa.string()), "_"
        )
        return add_bucket_column(t.append_column("pair", key), "pair", 8)

    return (
        pairs.map_batches(pair_key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: first_per_key(t, "pair", [("doc_a", "ascending")]).drop_columns(
                ["pair", "bucket"]
            ),
            batch_format="pyarrow",
        )
    )


# --- bottom-k n-gram Jaccard ---------------------------------------------------

def ngram_explode_batch(t: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Doc rows -> banded rows carrying the bottom-k n-gram sketch."""
    ids, texts = t[id_col].to_pylist(), t[text_col].to_pylist()
    out_band, out_key, out_id, out_sk = [], [], [], []
    for i, text in zip(ids, texts):
        sh = shingle_hashes(text)
        sig = minhash_signature(sh, NUM_PERM)
        sk = bottomk_sketch(sh, BOTTOM_K).tobytes()
        for band_id, key in enumerate(band_keys(sig, NUM_BANDS)):
            out_band.append(band_id)
            out_key.append(key - (1 << 63))
            out_id.append(i)
            out_sk.append(sk)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            "doc_id": pa.array(out_id, pa.int64()),
            "signature": pa.array(out_sk, pa.binary()),
        }
    )


def ngram_verify_in_bucket(
    t: pa.Table, threshold: float, *, max_group: int = 256
) -> pa.Table:
    """One bucket of banded bottom-k rows -> verified pairs. Module-level so
    the oracle sidecar can run the IDENTICAL kernel single-process. Hot-band
    guard (stages/band_guard.py): identical sketches collapse to star edges
    (Jaccard 1.0), distinct sketches chunk-split past ``max_group``."""
    if t.num_rows == 0:
        return pa.table({n: [] for n in PAIRS_SCHEMA.names}, schema=PAIRS_SCHEMA)
    t = t.combine_chunks()
    idx = pc.sort_indices(
        t, sort_keys=[("band_id", "ascending"), ("band_key", "ascending"), ("doc_id", "ascending")]
    )
    t = t.take(idx)
    bands, keys = t["band_id"].to_pylist(), t["band_key"].to_pylist()
    ids, sks = t["doc_id"].to_pylist(), t["signature"].to_pylist()

    def score(a: bytes, b: bytes) -> float | None:
        jac = jaccard_from_bottomk(
            np.frombuffer(a, dtype=np.uint64),
            np.frombuffer(b, dtype=np.uint64),
            BOTTOM_K,
        )
        return jac if jac >= threshold else None

    out: dict[tuple[int, int], float] = {}
    i, n = 0, len(ids)
    while i < n:
        j = i
        while j < n and bands[j] == bands[i] and keys[j] == keys[i]:
            j += 1
        if j - i > 1:
            guarded_group_pairs(
                ids, sks, i, j, out, score_fn=score, max_group=max_group
            )
        i = j
    pairs = sorted(out)
    return pa.table(
        {
            "doc_a": pa.array([p[0] for p in pairs], pa.int64()),
            "doc_b": pa.array([p[1] for p in pairs], pa.int64()),
            "est_jaccard": pa.array(
                [np.float32(round(out[p], 4)) for p in pairs], pa.float32()
            ),
        },
        schema=PAIRS_SCHEMA,
    )


def ngram_jaccard_pairs(ds, *, threshold: float = 0.5, id_col: str = "doc_id",
                        text_col: str = "text", num_buckets: int = 32):
    """Near-dup pairs with Jaccard estimated from bottom-k n-gram sketches.

    Candidates come from MinHash banding (same recall); verification uses the
    bottom-k sketch (tighter estimator than signature agreement)."""

    def bucket(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["band_id"], pa.string()), pc.cast(t["band_key"], pa.string()), ":"
        )
        return add_bucket_column(t.append_column("bk", key), "bk", num_buckets).drop_columns(["bk"])

    pairs = (
        ds.map_batches(lambda t: ngram_explode_batch(t, id_col, text_col), batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: ngram_verify_in_bucket(t.drop_columns(["bucket"]), threshold),
            batch_format="pyarrow",
        )
    )

    def pair_key(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t["doc_a"], pa.string()), pc.cast(t["doc_b"], pa.string()), "_"
        )
        return add_bucket_column(t.append_column("pair", key), "pair", 8)

    return (
        pairs.map_batches(pair_key, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda t: first_per_key(t, "pair", [("doc_a", "ascending")]).drop_columns(
                ["pair", "bucket"]
            ),
            batch_format="pyarrow",
        )
    )
