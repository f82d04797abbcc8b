"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation set.

The standard LLM-curation step (public method: n-gram-overlap decontamination
as described for GPT-3 / C4 / The Pile): any training document containing an
n-token span that also appears in an eval/benchmark document is contaminated
and must be dropped (or at least flagged) before training.

Shape for 100 TB: eval/benchmark sets are SMALL by nature (thousands of
documents), so their n-gram fingerprint is a broadcast side — built once,
``ray.put`` once, read by every task — while the training corpus streams
through ``map_batches``. Membership tests are vectorized: each document's
unique n-gram hashes (``text_hash.shingle_hashes`` — rolling polynomial over
crc32 word hashes) probe a sorted uint64 array via ``np.searchsorted``.
64-bit hashes make a false positive a ~1e-8 event per corpus; the driver
oracle cross-checks the whole pipeline against exact string n-grams in SQL,
so a collision would surface as a conformance failure rather than silently.
At larger eval sets, swap the sorted array for a Bloom filter of the same
hashes (same broadcast discipline, constant memory).

No reference counterpart (reference is a single-document OCR app); this is
part of the §2.6 training-data-curation extension suite.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from qwen_ocr_ray.functions.text_hash import shingle_hashes


def _doc_gram_hashes(text: str, n: int) -> np.ndarray:
    """Unique n-gram hashes; EMPTY for docs shorter than n tokens (unlike
    ``shingle_hashes``, which shrinks k — a 5-token doc must not emit a
    5-gram that matches another 5-token doc under 8-gram semantics)."""
    if len(text.split()) < n:
        return np.zeros(0, np.uint64)
    return shingle_hashes(text, k=n)


def eval_ngram_hashes(eval_ds, n: int = 8) -> np.ndarray:
    """Sorted unique uint64 n-gram hashes of the eval set (the broadcast side).

    ``eval_ds`` must have a ``text`` column. Per-batch distinct hashes are
    computed in workers; the driver only unions the per-batch DISTINCT sets
    (bounded by the eval set's vocabulary, not the corpus).
    """

    def batch_hashes(t: pa.Table) -> pa.Table:
        hs = [_doc_gram_hashes(x, n) for x in t["text"].to_pylist()]
        merged = np.unique(np.concatenate(hs)) if hs else np.zeros(0, np.uint64)
        return pa.table({"h": pa.array(merged, pa.uint64())})

    parts = [
        b["h"].to_numpy(zero_copy_only=False)
        for b in eval_ds.map_batches(batch_hashes, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        )
    ]
    if not parts:
        return np.zeros(0, np.uint64)
    return np.unique(np.concatenate(parts))


def decontaminate(train_ds, eval_hashes_ref, n: int = 8):
    """Per training document: distinct eval-overlapping n-grams and a flag.

    Returns rows ``{doc_id, n_hits, contaminated}``; callers filter on
    ``contaminated`` (or join back) to drop. ``eval_hashes_ref`` is a
    ``ray.put`` handle to the sorted hash array from ``eval_ngram_hashes``.
    """

    def probe(t: pa.Table) -> pa.Table:
        # plain TASK map, not an actor pool: the broadcast array resolves
        # per task from the LOCAL object store (zero-copy numpy view,
        # microseconds), while an actor pool pays ~1.5 s ramp-up per stage
        # on this VM (CLAUDE.md; same fix as unigram_logprob r05)
        ev = ray.get(eval_hashes_ref)
        hits = np.zeros(t.num_rows, dtype=np.int64)
        for i, text in enumerate(t["text"].to_pylist()):
            hs = _doc_gram_hashes(text, n)  # already unique
            if len(hs) and len(ev):
                idx = np.searchsorted(ev, hs)
                idx[idx == len(ev)] = 0
                hits[i] = int(np.count_nonzero(ev[idx] == hs))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array(hits > 0, pa.bool_()),
            }
        )

    return train_ds.map_batches(probe, batch_format="pyarrow")
