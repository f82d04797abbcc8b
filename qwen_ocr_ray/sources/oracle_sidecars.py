"""Deterministic oracle sidecars for the non-SQL-expressible queries.

The driver's correctness gate can only compare a Ray result against DuckDB
SQL — so for sketch/heuristic operators (MinHash, SimHash, LSH, stub-VLM
figures, composed curation) we materialize an EXPECTED table computed
single-process (plain pyarrow/numpy over the parquet inputs, no Ray), and
the oracle SQL is a ``read_parquet('<sidecar>')`` SELECT. This follows the
round-2 pattern established for the media features and the extraction golden
(VERDICT r02 next-round #1).

What the check proves: the sketching KERNELS are shared with the pipeline
(deliberately — they are unit/property-tested separately), but the
ORCHESTRATION is disjoint: here every operator runs as one in-process pass
over one table, while the pipeline runs banded explodes, hash-bucketed
shuffles, distributed anti-joins and label propagation over many blocks. A
hash match therefore certifies the distributed plumbing — block splits,
shuffle completeness, per-bucket group boundaries, dedup-across-buckets,
union ordering — byte-for-byte. Connected components additionally uses an
INDEPENDENT algorithm (union-find here vs pointer-jumping label propagation
in stages/clusters.py).

Cache layout (CLAUDE.md "Caches"): /tmp/qor_oracle/<sf>_v<pages>_o<N>/ with
one parquet per query plus a _SUCCESS marker; atomic tmp+rename writes.
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

ORACLE_VERSION = 13  # v12: training_prep_semantic; v13: kmeans_sampled


def oracle_tag(sf_dir: str) -> str:
    from qwen_ocr_ray.sources.synth_pages import GEN_VERSION

    base = os.path.basename(os.path.normpath(sf_dir))
    return f"{base}_v{GEN_VERSION}_o{ORACLE_VERSION}"


# --- per-operator expected tables (single-process) ----------------------------

def _docs(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )


def _emb(sf_dir: str) -> pa.Table:
    return pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )


def expected_simhash_docs(docs: pa.Table) -> pa.Table:
    from qwen_ocr_ray.stages.dedup_text import simhash_batch

    return simhash_batch(docs.select(["doc_id", "text"]))


def expected_minhash_pairs(docs: pa.Table, threshold: float = 0.5) -> pa.Table:
    from qwen_ocr_ray.stages.dedup_text import (
        candidate_pairs_in_bucket, minhash_explode_batch,
    )

    # ONE logical bucket holding every (band, key) group == the union of the
    # pipeline's per-bucket outputs after its first-per-pair dedup (the pair
    # estimate depends only on the two full signatures, never on which band
    # or bucket discovered it)
    return candidate_pairs_in_bucket(
        minhash_explode_batch(docs.select(["doc_id", "text"])), threshold
    )


def expected_ngram_pairs(docs: pa.Table, threshold: float = 0.5) -> pa.Table:
    from qwen_ocr_ray.stages.dedup_text import ngram_explode_batch, ngram_verify_in_bucket

    return ngram_verify_in_bucket(
        ngram_explode_batch(docs.select(["doc_id", "text"])), threshold
    )


def expected_simhash_pairs(docs: pa.Table, max_hamming: int = 3) -> pa.Table:
    from qwen_ocr_ray.stages.dedup_text import (
        simhash_explode_banded, simhash_pairs_in_bucket,
    )

    return simhash_pairs_in_bucket(
        simhash_explode_banded(docs.select(["doc_id", "text"])), max_hamming
    )


def expected_lsh_embed_pairs(emb: pa.Table, threshold: float = 0.4) -> pa.Table:
    from qwen_ocr_ray.stages.similarity import lsh_explode_batch, lsh_verify_in_bucket

    return lsh_verify_in_bucket(lsh_explode_batch(emb), threshold)


def expected_embed_dedup_kept(emb: pa.Table, pairs: pa.Table) -> pa.Table:
    # greedy representative rule (stages/similarity.near_dup_representatives):
    # drop every id appearing as the LARGER member of a near-dup pair
    dropped = set(pairs["vec_b"].to_pylist())
    keep = [v for v in emb["vec_id"].to_pylist() if v not in dropped]
    return pa.table({"vec_id": pa.array(keep, pa.int64())})


def expected_clusters(pairs: pa.Table) -> pa.Table:
    """Union-find (path compression) — an INDEPENDENT algorithm from the
    pipeline's label propagation; component = min member id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "component": pa.array([find(n) for n in nodes], pa.int64()),
        }
    )


def expected_lang_quality(docs: pa.Table) -> pa.Table:
    """Expectation columns for lang_id AND quality_scores (one sidecar)."""
    from qwen_ocr_ray.functions.text_stats import (
        bpe_ish_token_count, lang_id, quality_score, rolling_fingerprints,
        stopword_ratio,
    )

    texts = docs["text"].to_pylist()
    langs = docs["lang"].to_pylist()
    return pa.table(
        {
            "doc_id": docs["doc_id"],
            "lang": docs["lang"],
            "pred_lang": pa.array([lang_id(s) for s in texts], pa.string()),
            "quality": pa.array(
                [np.float32(quality_score(s, l)) for s, l in zip(texts, langs)],
                pa.float32(),
            ),
            "stopword_ratio": pa.array(
                [np.float32(round(stopword_ratio(s, l), 4)) for s, l in zip(texts, langs)],
                pa.float32(),
            ),
            "approx_bpe_tokens": pa.array(
                [bpe_ish_token_count(s) for s in texts], pa.int64()
            ),
            "n_fingerprints": pa.array(
                [len(rolling_fingerprints(s)) for s in texts], pa.int64()
            ),
        }
    )


def expected_figures(pages_path: str) -> pa.Table:
    """Mirror of the figures pipeline, single-process: route pages-kind rows,
    explode -> optimize -> stub-detect -> area-filter -> crop via the SAME
    pure table kernels the Ray stages call (no Ray)."""
    from qwen_ocr_ray.config import DEFAULT_CONFIG
    from qwen_ocr_ray.stages.figures import ExtractFigures
    from qwen_ocr_ray.stages.pages_branch import explode_pages, optimize_pages_batch
    from qwen_ocr_ray.stages.route import add_kind_column

    t = pq.read_table(pages_path)
    t = add_kind_column(t)
    t = t.filter(pc.equal(t["kind"], "pages"))
    pages = optimize_pages_batch(explode_pages(t, DEFAULT_CONFIG), DEFAULT_CONFIG)
    figs = ExtractFigures(DEFAULT_CONFIG)(pages)
    return figs.select(
        ["url", "page_num", "fig_number", "fig_seq", "element_type",
         "x1", "y1", "x2", "y2", "area_frac", "width", "height"]
    )


def expected_training_prep(
    pages_path: str, golden_path: str, *,
    languages: tuple[str, ...] = ("en",), min_tokens: int = 10,
    min_quality: float = 0.2, near_threshold: float = 0.5,
) -> pa.Table:
    """Mirror of run_training_prep over the golden table: quality/lang
    filter -> exact dedup (min url per md5(text)) -> near-dup drop (larger
    member of any MinHash pair)."""
    from qwen_ocr_ray.functions.text_stats import lang_id, quality_score
    from qwen_ocr_ray.stages.dedup_text import (
        candidate_pairs_in_bucket, minhash_explode_batch,
    )

    golden = pq.read_table(golden_path)
    lang_by_url: dict[str, str] = {}
    p = pq.read_table(pages_path, columns=["url", "lang"])
    for u, l in zip(p["url"].to_pylist(), p["lang"].to_pylist()):
        lang_by_url.setdefault(u, l)

    rows = []  # (url, lang, pred_lang, text, n_tokens, quality)
    for url, text in zip(golden["url"].to_pylist(), golden["text"].to_pylist()):
        lang = lang_by_url[url]
        toks = len(text.split())
        q = quality_score(text, lang)
        if toks >= min_tokens and q >= min_quality and lang in languages:
            rows.append((url, lang, lang_id(text), text, toks, q))

    # exact content dedup: lexicographically smallest url per fingerprint
    win: dict[str, str] = {}
    for r in rows:
        fp = hashlib.md5(r[3].encode()).hexdigest()
        if fp not in win or r[0] < win[fp]:
            win[fp] = r[0]
    kept = [r for r in rows if win[hashlib.md5(r[3].encode()).hexdigest()] == r[0]]

    # near-dup drop: larger url of any MinHash-LSH pair over the kept rows
    kt = pa.table(
        {
            "url": pa.array([r[0] for r in kept], pa.string()),
            "text": pa.array([r[3] for r in kept], pa.string()),
        }
    )
    pairs = candidate_pairs_in_bucket(
        minhash_explode_batch(kt, id_col="url"), near_threshold
    )
    dropped = set(pairs["doc_b"].to_pylist())
    final = [r for r in kept if r[0] not in dropped]
    return pa.table(
        {
            "url": pa.array([r[0] for r in final], pa.string()),
            "lang": pa.array([r[1] for r in final], pa.string()),
            "pred_lang": pa.array([r[2] for r in final], pa.string()),
            "n_tokens": pa.array([r[4] for r in final], pa.int64()),
            "quality": pa.array([np.float32(r[5]) for r in final], pa.float32()),
        }
    )


def expected_training_prep_semantic(
    pages_path: str, golden_path: str, sf_dir: str,
) -> pa.Table:
    """Mirror of run_training_prep(semantic=True): the plain prep mirror,
    then SemDeDup over the SURVIVORS' embedding rows — same quantized fit /
    assignment / guarded prune kernels as the distributed path, so the
    dropped set is bit-identical."""
    from qwen_ocr_ray.pipelines.prep import url_doc_id
    from qwen_ocr_ray.pipelines.queries import (
        KMEANS_ITERS, KMEANS_K, SEMDEDUP_THRESHOLD,
    )
    from qwen_ocr_ray.stages.kmeans import (
        assign_clusters, kmeans_fit_mirror, quantize, semantic_prune_cluster,
    )

    base = expected_training_prep(pages_path, golden_path)
    surv = {url_doc_id(u) for u in base["url"].to_pylist()}
    emb = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    sel = np.array([v in surv for v in emb["vec_id"].to_pylist()])
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)[sel]
    m = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)[sel]
    cq = kmeans_fit_mirror(ids, m, KMEANS_K, KMEANS_ITERS)
    a = assign_clusters(quantize(m), cq)
    kept: set[int] = set()
    for c in np.unique(a):
        s = a == c
        kept.update(
            semantic_prune_cluster(ids[s], m[s], SEMDEDUP_THRESHOLD).tolist()
        )
    mask = pa.array(
        [url_doc_id(u) in kept for u in base["url"].to_pylist()], pa.bool_()
    )
    return base.filter(mask)


def expected_ann_ivf_topk(sf_dir: str, *, k: int = 6, nprobe: int = 3) -> pa.Table:
    """Mirror of q_ann_ivf_topk: same bounded query/centroid acquisition,
    then one in-process scan instead of the distributed score stage."""
    from qwen_ocr_ray.stages.similarity import (
        _normalize, kmeans_centroids, load_query_vector, sample_embeddings,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    query = _normalize(load_query_vector(path, 0)[None, :])[0]
    centroids = kmeans_centroids(_normalize(sample_embeddings(path)), k=16)
    probe = set(int(c) for c in np.argsort(centroids @ query)[::-1][:nprobe])

    emb = _emb(sf_dir)
    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    m = _normalize(np.asarray(emb["embedding"].to_pylist(), dtype=np.float64))
    assign = (m @ centroids.T).argmax(axis=1)
    mask = np.isin(assign, list(probe))
    sel_ids = ids[mask]
    scores = np.round(m[mask] @ query, 6).astype(np.float32)
    order = sorted(zip(scores.tolist(), sel_ids.tolist()), key=lambda p: (-p[0], p[1]))
    top = [(s, i) for s, i in order[:k] if i != 0]
    return pa.table(
        {
            "vec_id": pa.array([i for _, i in top], pa.int64()),
            "score": pa.array([np.float32(s) for s, _ in top], pa.float32()),
        }
    )


def expected_bloom_kept(docs: pa.Table) -> pa.Table:
    """Mirror of q_bloom_incremental_dedup: one in-process pass with the SAME
    Bloom kernels (sizing from the full-table count, fill over even-doc_id
    texts, probe over odd) — bit-identical bitmap, so the kept set matches
    exactly including any false-positive drops."""
    from qwen_ocr_ray.functions.sketch import (
        bloom_contains, bloom_fill, bloom_num_bits, md5_hash_pairs,
    )

    ids = np.asarray(docs["doc_id"].to_pylist(), dtype=np.int64)
    texts = docs["text"].to_pylist()
    m = bloom_num_bits(len(ids))
    seen = [t for i, t in zip(ids, texts) if i % 2 == 0]
    regs = bloom_fill(*md5_hash_pairs(seen), m)
    odd_ids = ids[ids % 2 == 1]
    odd_texts = [t for i, t in zip(ids, texts) if i % 2 == 1]
    hit = bloom_contains(regs, *md5_hash_pairs(odd_texts))
    return pa.table({"doc_id": pa.array(odd_ids[~hit], pa.int64())})


def expected_ann_ivfpq(sf_dir: str, *, k: int = 6, nprobe: int = 3,
                       rerank: int = 32) -> pa.Table:
    """Mirror of q_ann_ivfpq_topk: identical training (bounded sample),
    one in-process ADC scan instead of the distributed per-block top-rerank
    (equal under the rounded (adc desc, id asc) total order), then the same
    exact re-rank of the rerank-bounded candidate set."""
    from qwen_ocr_ray.stages.similarity import (
        _matrix, _normalize, kmeans_centroids, load_query_vector,
        pq_adc_lut, pq_adc_scores, pq_encode, pq_train, sample_embeddings,
    )

    path = os.path.join(sf_dir, "embeddings.parquet")
    query = _normalize(load_query_vector(path, 0)[None, :])[0]
    sample = _normalize(sample_embeddings(path))
    centroids = kmeans_centroids(sample, k=16)
    books = pq_train(sample)
    lut = pq_adc_lut(query, books)
    probe = set(int(c) for c in np.argsort(centroids @ query)[::-1][:nprobe])

    emb = _emb(sf_dir)
    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    m = _normalize(_matrix(emb))
    assign = (m @ centroids.T).argmax(axis=1)
    mask = np.isin(assign, list(probe))
    sel_ids, sel = ids[mask], m[mask]
    adc = np.round(pq_adc_scores(pq_encode(sel, books), lut), 6)
    cand = np.lexsort((sel_ids, -adc))[:rerank]
    cand_ids = set(sel_ids[cand].tolist())
    cmask = np.isin(ids, list(cand_ids))
    cids = ids[cmask]
    sims = np.round(m[cmask] @ query, 6)
    order = np.lexsort((cids, -sims))[:k]
    top = [(int(i), float(s)) for i, s in zip(cids[order], sims[order]) if i != 0]
    return pa.table(
        {
            "vec_id": pa.array([i for i, _ in top], pa.int64()),
            "score": pa.array([np.float32(s) for _, s in top], pa.float32()),
        }
    )


def expected_domain_partitions(pages_path: str, *, hot_fraction: float = 0.05) -> pa.Table:
    """Mirror of partition_histogram via the same pure helpers, one pass."""
    from qwen_ocr_ray.stages.bucketing import hash_bucket_ids
    from qwen_ocr_ray.stages.skew import add_domain_column

    t = pq.read_table(pages_path, columns=["url"])
    total = t.num_rows
    t = add_domain_column(t)
    counts = t.group_by(["domain"]).aggregate([("domain", "count")])
    threshold = max(1, int(hot_fraction * total))
    hot = {
        d: max(1, math.ceil((n / total) / hot_fraction))
        for d, n in zip(
            counts["domain"].to_pylist(), counts["domain_count"].to_pylist()
        )
        if n >= threshold
    }
    dom = t["domain"]
    salt = pa.nulls(t.num_rows, pa.int64()).fill_null(0)
    if hot:
        raw = pc.cast(hash_bucket_ids(t["url"], 1 << 16), pa.int64())
        for d, m in hot.items():
            mod = pc.subtract(raw, pc.multiply(pc.divide(raw, m), m))
            salt = pc.if_else(pc.equal(dom, d), mod, salt)
    parts = pc.binary_join_element_wise(dom, pc.cast(salt, pa.string()), "#")
    g = (
        pa.table({"part": parts})
        .group_by(["part"])
        .aggregate([("part", "count")])
        .rename_columns(["part", "n_rows"])
    )
    return g.set_column(1, "n_rows", pc.cast(g["n_rows"], pa.int64()))


def expected_sketches(sf_dir: str) -> dict[str, pa.Table]:
    """Single-process mirrors of the stages/sketch.py aggregates over events:
    one full-table pass with the SAME pure kernels the pipeline folds per
    block — a hash match certifies the distributed sketch merge exactly."""
    from qwen_ocr_ray.functions.sketch import (
        bottomk_rows, cms_estimate, cms_fold, hll_estimate, hll_registers, mix64,
        quantiles_from_sample,
    )

    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "user_id", "value"]
    )
    users = mix64(ev["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
    distinct = pa.table(
        {"approx_distinct": pa.array([hll_estimate(hll_registers(users))], pa.int64())}
    )

    # per-group HLL (distinct users per event_type) — one in-process pass
    # with the same register/estimate kernels the pipeline folds per block
    ev_t = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "user_id"]
    )
    types = ev_t["event_type"].to_numpy(zero_copy_only=False)
    uid = ev_t["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
    g_keys = sorted(set(types.tolist()))
    group_distinct = pa.table(
        {
            "event_type": pa.array(g_keys, pa.string()),
            "approx_distinct": pa.array(
                [hll_estimate(hll_registers(mix64(uid[types == ty]))) for ty in g_keys],
                pa.int64(),
            ),
        }
    )

    qs = [0.25, 0.5, 0.75, 0.9]
    keys = mix64(ev["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
    vals = ev["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    _, vs = bottomk_rows(keys, vals, 4096)
    quants = pa.table(
        {
            "q": pa.array(qs, pa.float64()),
            "value": pa.array(
                [float(np.float32(round(v, 4))) for v in quantiles_from_sample(vs, qs)],
                pa.float64(),
            ),
        }
    )

    # Count-Min point counts: one in-process fold over the whole column —
    # integer addition commutes, so the distributed per-block fold + sum
    # reduce must match this bit-for-bit
    from qwen_ocr_ray.pipelines.queries import CMS_PROBES

    cms = cms_fold(users)
    probe_hashes = mix64(np.asarray(sorted(CMS_PROBES), dtype=np.uint64))
    cms_counts = pa.table(
        {
            "key": pa.array(sorted(CMS_PROBES), pa.int64()),
            "est_count": pa.array(cms_estimate(cms, probe_hashes), pa.int64()),
        }
    )

    # per-group bottom-k quantiles (value quantiles per event_type): the
    # union-of-block-bottom-ks re-taken to k equals the one-pass per-group
    # bottom-k, so the mirror is the per-group kernel applied once
    ev_q = pq.read_table(
        os.path.join(sf_dir, "events.parquet"),
        columns=["event_id", "event_type", "value"],
    )
    q_types = ev_q["event_type"].to_numpy(zero_copy_only=False)
    q_keys = mix64(ev_q["event_id"].to_numpy(zero_copy_only=False).astype(np.uint64))
    q_vals = ev_q["value"].to_numpy(zero_copy_only=False).astype(np.float64)
    gq_rows: list[tuple[str, float, float]] = []
    for ty in sorted(set(q_types.tolist())):
        m = q_types == ty
        _, g_vs = bottomk_rows(q_keys[m], q_vals[m], 256)
        for q, v in zip(qs, quantiles_from_sample(g_vs, qs)):
            gq_rows.append((ty, float(q), float(np.float32(round(v, 4)))))
    group_quantiles = pa.table(
        {
            "event_type": pa.array([r[0] for r in gq_rows], pa.string()),
            "q": pa.array([r[1] for r in gq_rows], pa.float64()),
            "value": pa.array([r[2] for r in gq_rows], pa.float64()),
        }
    )

    return {
        "approx_distinct_users.parquet": distinct,
        "value_quantiles.parquet": quants,
        "group_distinct.parquet": group_distinct,
        "cms_point_counts.parquet": cms_counts,
        "group_quantiles.parquet": group_quantiles,
    }


# --- cache driver -------------------------------------------------------------

def expected_kmeans(emb: pa.Table) -> pa.Table:
    """Single-process mirror of the kmeans_clusters query: same quantized
    int64 kernels (stages/kmeans.py), so assignments are bit-identical to
    the distributed fit + assignment pass."""
    from qwen_ocr_ray.pipelines.queries import KMEANS_ITERS, KMEANS_K
    from qwen_ocr_ray.stages.kmeans import (
        assign_clusters, kmeans_fit_mirror, quantize,
    )

    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    m = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    cq = kmeans_fit_mirror(ids, m, KMEANS_K, KMEANS_ITERS)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(assign_clusters(quantize(m), cq), pa.int64()),
        }
    )


def expected_kmeans_sampled(emb: pa.Table) -> pa.Table:
    """Mirror of q_kmeans_sampled: one-pass global bottom-S hash sample
    (== the distributed per-block bottom-S union re-taken to S), local
    Lloyd, full assignment — same integer kernels, bit-identical."""
    from qwen_ocr_ray.functions.sketch import mix64
    from qwen_ocr_ray.pipelines.queries import (
        KMEANS_ITERS, KMEANS_K, KMEANS_SAMPLE,
    )
    from qwen_ocr_ray.stages.kmeans import (
        _block_partials, assign_clusters, quantize, seed_from_sample,
        update_centroids,
    )

    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    m = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    xq = quantize(m)
    h = mix64(ids.astype(np.uint64))
    take = np.argsort(h, kind="stable")[:KMEANS_SAMPLE]
    cq = seed_from_sample(h[take], xq[take], KMEANS_K)
    for _ in range(KMEANS_ITERS):
        _, counts, sums = _block_partials(xq[take], cq, KMEANS_K)
        cq = update_centroids(cq, counts, sums)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(assign_clusters(xq, cq), pa.int64()),
        }
    )


def expected_weighted_sample(sf_dir: str) -> pa.Table:
    """Single-process mirror of q_weighted_sample: same hash-uniform key
    kernel (u^(1/w)), same (-key, doc_id) order, same top-k — bit-identical
    because the distributed per-block top-k union re-taken to k equals the
    one-pass top-k under an identical total order."""
    from qwen_ocr_ray.functions.sketch import aes_keys
    from qwen_ocr_ray.pipelines.queries import WSAMPLE_K

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "n_chars"]
    )
    ids = t["doc_id"].to_numpy(zero_copy_only=False)
    w = t["n_chars"].to_numpy(zero_copy_only=False)
    key = aes_keys(ids, w)
    order = np.lexsort((ids, -key))[:WSAMPLE_K]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], pa.int64()),
            "n_chars": pa.array(w[order], pa.int64()),
        }
    )


def expected_semantic_dedup(emb: pa.Table) -> pa.Table:
    """Mirror of semantic_dedup: same fit, same assignment, same per-cluster
    prune kernel over identically sorted rows (bit-identical; the matmul
    sees the same arrays in the same order on both sides)."""
    from qwen_ocr_ray.pipelines.queries import (
        KMEANS_ITERS, KMEANS_K, SEMDEDUP_THRESHOLD,
    )
    from qwen_ocr_ray.stages.kmeans import (
        assign_clusters, kmeans_fit_mirror, quantize, semantic_prune_cluster,
    )

    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    m = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    cq = kmeans_fit_mirror(ids, m, KMEANS_K, KMEANS_ITERS)
    a = assign_clusters(quantize(m), cq)
    kept: list[int] = []
    for c in np.unique(a):
        sel = a == c
        kept.extend(
            np.sort(
                semantic_prune_cluster(ids[sel], m[sel], SEMDEDUP_THRESHOLD)
            ).tolist()
        )
    return pa.table({"vec_id": pa.array(sorted(kept), pa.int64())})


def ensure_oracle_sidecars(sf_dir: str, cache_root: str = "/tmp/qor_oracle") -> str:
    """Generate-and-cache every expected table for ``sf_dir``; returns the
    cache dir. Atomic per-file writes + a _SUCCESS marker; concurrent callers
    are safe (os.replace)."""
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    out_dir = os.path.join(cache_root, oracle_tag(sf_dir))
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)

    pages_path, golden_path = ensure_pages_dataset(sf_dir)
    docs = _docs(sf_dir)
    emb = _emb(sf_dir)
    lsh_pairs = expected_lsh_embed_pairs(emb)
    minhash = expected_minhash_pairs(docs)
    tables = {
        "simhash_docs.parquet": expected_simhash_docs(docs),
        "minhash_pairs.parquet": minhash,
        "ngram_pairs.parquet": expected_ngram_pairs(docs),
        "simhash_pairs.parquet": expected_simhash_pairs(docs),
        "lsh_embed_pairs.parquet": lsh_pairs,
        "embed_dedup_kept.parquet": expected_embed_dedup_kept(emb, lsh_pairs),
        "near_dup_clusters.parquet": expected_clusters(minhash),
        "lang_quality.parquet": expected_lang_quality(docs),
        "figures.parquet": expected_figures(pages_path),
        "training_prep.parquet": expected_training_prep(pages_path, golden_path),
        "training_prep_semantic.parquet": expected_training_prep_semantic(
            pages_path, golden_path, sf_dir
        ),
        "ann_ivf_topk.parquet": expected_ann_ivf_topk(sf_dir),
        "ann_ivfpq_topk.parquet": expected_ann_ivfpq(sf_dir),
        "bloom_kept.parquet": expected_bloom_kept(docs),
        "domain_partitions.parquet": expected_domain_partitions(pages_path),
        "kmeans_clusters.parquet": expected_kmeans(emb),
        "kmeans_sampled.parquet": expected_kmeans_sampled(emb),
        "semantic_dedup_kept.parquet": expected_semantic_dedup(emb),
        "weighted_sample.parquet": expected_weighted_sample(sf_dir),
        **expected_sketches(sf_dir),
    }
    for name, table in tables.items():
        path = os.path.join(out_dir, name)
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp, row_group_size=1024)
        os.replace(tmp, path)
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir
