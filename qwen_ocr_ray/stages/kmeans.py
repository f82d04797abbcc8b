"""Distributed Lloyd k-means over an embedding column — the semantic
clustering primitive behind SemDeDup-style curation (cluster the corpus,
then prune near-duplicates within clusters) and IVF coarse quantizers.

Shape for 100 TB: centroids broadcast via ``ray.put`` once per iteration;
each block folds its rows into AT MOST k (cluster, count, coordinate-sum)
rows, so the per-iteration exchange is O(blocks x k) tiny rows — the data
never moves. The driver merge is k rows of 64 int64s (bounded regardless of
corpus size). At real scale, train on a bounded sample (the IVF builder's
discipline, `similarity.py`) and run ONE streaming assignment pass; the
full-corpus iteration here demonstrates the exchange shape.

Determinism contract: ALL distance and accumulation arithmetic runs in
QUANTIZED int64 space (x_q = round(x * 2^24)): integer sums commute (any
block split / retry / merge order gives identical sums), the int64 distance
expansion is exact (|x_q|^2 - 2 x_q.c_q + |c_q|^2 <= 2^56 << 2^63 for unit
vectors at dim 64), and argmin ties break to the lowest cluster index.
Assignments are therefore bit-identical between the distributed fold and the
single-process mirror in sources/oracle_sidecars.py.

No reference counterpart (§2.6 training-data-curation extension suite).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from qwen_ocr_ray.functions.sketch import mix64
from qwen_ocr_ray.stages.similarity import _matrix

KMEANS_SCALE = 1 << 24  # fixed-point quantization step


def quantize(m: np.ndarray) -> np.ndarray:
    """Fixed-point quantization. Guards the int64-exactness precondition of
    the distance expansion: dim * (2 * max|x| * 2^24)^2 must stay under
    2^62, i.e. max|x| <= sqrt(2^12 / dim) (8.0 at dim 64). Without the
    check, non-unit-norm inputs would WRAP silently — and wrap identically
    in the mirror, so the bit-parity oracle would mask garbage clusters."""
    if m.size:
        limit = float(np.sqrt(4096.0 / m.shape[-1]))
        peak = float(np.abs(m).max())
        if peak > limit:
            raise ValueError(
                f"kmeans quantization overflow: max|x|={peak:.3g} exceeds "
                f"{limit:.3g} at dim {m.shape[-1]} — normalize the vectors"
            )
    return np.round(m * KMEANS_SCALE).astype(np.int64)


def assign_clusters(xq: np.ndarray, cq: np.ndarray) -> np.ndarray:
    """argmin_j ||x_q - c_q_j||^2 in exact int64 arithmetic (no BLAS float
    path — numpy integer matmul), first-min tie-break."""
    d = (
        (xq * xq).sum(axis=1, keepdims=True)
        - 2 * (xq @ cq.T)
        + (cq * cq).sum(axis=1)[None, :]
    )
    return d.argmin(axis=1)


def seed_sample_size(k: int) -> int:
    return max(64, 8 * k)


def seed_from_sample(hashes: np.ndarray, xq: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-means++-style seeding: greedy farthest-point selection
    (max-min squared distance, int64-exact) over the bottom-m hash sample,
    starting from the smallest-hash point. Plain uniform seeding routinely
    drops two seeds in one dense cluster and merges true clusters (observed:
    purity 0.60 on 5 planted Gaussians); farthest-point spreads seeds across
    the data's extent. Ties break to the first (lowest-hash-order) index.
    The bottom-m sample is mergeable, so the distributed per-block
    bottom-m union re-taken to m equals this one-pass selection."""
    order = np.argsort(hashes, kind="stable")[: seed_sample_size(k)]
    s = xq[order]
    chosen = [0]
    d = ((s - s[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        i = int(d.argmax())
        chosen.append(i)
        d = np.minimum(d, ((s - s[i]) ** 2).sum(axis=1))
    return s[chosen]


def init_centroids_quantized(vec_ids: np.ndarray, xq: np.ndarray, k: int) -> np.ndarray:
    """Deterministic seeding over the full table (mirror path): distinct ids
    hash distinctly, so there are no sample ties."""
    return seed_from_sample(mix64(vec_ids.astype(np.uint64)), xq, k)


def update_centroids(
    cq: np.ndarray, counts: np.ndarray, sums: np.ndarray
) -> np.ndarray:
    """New quantized centroids = round(sum / count) per cluster; an empty
    cluster keeps its previous centroid (deterministic, no re-seeding)."""
    out = cq.copy()
    nz = counts > 0
    out[nz] = np.round(sums[nz] / counts[nz, None]).astype(np.int64)
    return out


def _block_partials(xq: np.ndarray, cq: np.ndarray, k: int):
    a = assign_clusters(xq, cq)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    dim = xq.shape[1]
    sums = np.zeros((k, dim), dtype=np.int64)
    np.add.at(sums, a, xq)
    present = np.flatnonzero(counts)
    return present, counts, sums


def _fsl_matrix(col) -> np.ndarray:
    """(n, dim) int64 matrix from a fixed_size_list<int64> column, zero-copy
    through the values buffer."""
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    dim = a.type.list_size
    return a.flatten().to_numpy(zero_copy_only=False).reshape(-1, dim)


def kmeans_fit(ds, k: int, iters: int, id_col: str = "vec_id",
               vec_col: str = "embedding") -> np.ndarray:
    """Lloyd iterations over a Dataset; returns quantized centroids (k, dim)
    int64. Each pass exchanges only O(blocks x k) partial-sum rows.

    The quantized (hash, vector) projection is materialized ONCE into the
    object store and feeds the seed pass AND every iteration — previously
    each of the 1 + iters passes re-read the parquet and re-quantized
    (measured ~0.3 s/pass of the benched kmeans time at sf0.1). Blocks
    spill if the projection outgrows memory; at extreme scale train on a
    bounded sample instead (the IVF builder's discipline) and keep the one
    streaming assignment pass."""
    import ray as _ray

    m = seed_sample_size(k)

    def prep(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        xq = quantize(_matrix(t, vec_col))
        h = mix64(ids.astype(np.uint64))
        q = pa.FixedSizeListArray.from_arrays(
            pa.array(xq.reshape(-1), pa.int64()), xq.shape[1]
        )
        return pa.table({"h": pa.array(h, pa.uint64()), "q": q})

    qds = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def seed_cands(t: pa.Table) -> pa.Table:
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.take(np.argsort(h, kind="stable")[:m])

    # bottom-m merge of per-block seed candidates (m x blocks tiny rows);
    # seed_from_sample re-takes the global bottom-m, so the union suffices
    hs: list[np.ndarray] = []
    qs: list[np.ndarray] = []
    for b in qds.map_batches(seed_cands, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        hs.append(b["h"].to_numpy(zero_copy_only=False))
        qs.append(_fsl_matrix(b["q"]))
    cq = seed_from_sample(np.concatenate(hs), np.vstack(qs), k)

    for _ in range(iters):
        ref = _ray.put(cq.tobytes())
        dim = cq.shape[1]

        def partial(t: pa.Table, _ref=ref, _dim=dim) -> pa.Table:
            c = np.frombuffer(_ray.get(_ref), np.int64).reshape(-1, _dim)
            present, counts, sums = _block_partials(_fsl_matrix(t["q"]), c, len(c))
            return pa.table(
                {
                    "cluster": pa.array(present, pa.int64()),
                    "count": pa.array(counts[present], pa.int64()),
                    "sums": pa.array(
                        [sums[j].tobytes() for j in present], pa.binary()
                    ),
                }
            )

        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros((k, cq.shape[1]), dtype=np.int64)
        for b in qds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"
        ):
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            counts[cl] += b["count"].to_numpy(zero_copy_only=False)
            for j, buf in zip(cl, b["sums"].to_pylist()):
                sums[j] += np.frombuffer(buf, np.int64)
        cq = update_centroids(cq, counts, sums)
    return cq


def kmeans_fit_sample(ds, k: int, iters: int, sample_size: int,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> np.ndarray:
    """The 100 TB k-means fit: Lloyd on a DETERMINISTIC bounded sample (the
    bottom-``sample_size`` rows by id hash — mergeable: per-block bottom-S
    union re-taken to S equals the one-pass global bottom-S), then the
    caller runs ONE streaming ``kmeans_assign`` pass. Training cost is one
    projection pass over the corpus + O(S) driver work, instead of
    ``kmeans_fit``'s 1 + iters full passes. Same quantized integer kernels,
    so the result is bit-identical to a single-process mirror on any block
    layout, and hash sampling makes the sample itself invariant to
    splits/retries/resume."""
    s = int(sample_size)

    def cands(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        xq = quantize(_matrix(t, vec_col))
        h = mix64(ids.astype(np.uint64))
        order = np.argsort(h, kind="stable")[:s]
        q = pa.FixedSizeListArray.from_arrays(
            pa.array(xq[order].reshape(-1), pa.int64()), xq.shape[1]
        )
        return pa.table({"h": pa.array(h[order], pa.uint64()), "q": q})

    hs: list[np.ndarray] = []
    qs: list[np.ndarray] = []
    for b in ds.map_batches(cands, batch_format="pyarrow").iter_batches(
        batch_size=None, batch_format="pyarrow"
    ):
        hs.append(b["h"].to_numpy(zero_copy_only=False))
        qs.append(_fsl_matrix(b["q"]))
    h = np.concatenate(hs)
    take = np.argsort(h, kind="stable")[:s]  # global bottom-S re-take
    xq = np.vstack(qs)[take]
    cq = seed_from_sample(h[take], xq, k)
    for _ in range(iters):
        present, counts, sums = _block_partials(xq, cq, k)
        cq = update_centroids(cq, counts, sums)
    return cq


def kmeans_assign(ds, cq: np.ndarray, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """One streaming assignment pass: rows ``{vec_id, cluster}``."""
    import ray as _ray

    ref = _ray.put(cq.tobytes())
    dim = cq.shape[1]

    def am(t: pa.Table) -> pa.Table:
        c = np.frombuffer(_ray.get(ref), np.int64).reshape(-1, dim)
        xq = quantize(_matrix(t, vec_col))
        return pa.table(
            {
                id_col: t[id_col],
                "cluster": pa.array(assign_clusters(xq, c), pa.int64()),
            }
        )

    return ds.map_batches(am, batch_format="pyarrow")


SEM_CHUNK = 2048      # pairwise matmul row-block inside a chunk (memory cap)
SEM_MAX_GROUP = 4096  # distinct-embedding cap per pairwise chunk (flops cap)


def _greedy_prune_rows(x: np.ndarray, threshold: float) -> np.ndarray:
    """Exact greedy drop mask over unit rows ALREADY in ascending-id order:
    row j is dropped iff some lower row i has round(cos(i, j), 6) >=
    threshold (witnesses need not survive themselves — matches the repo's
    larger-member-drops rule, `similarity.near_dup_representatives`).
    SEM_CHUNK row-blocks keep peak memory O(chunk x n), never n^2."""
    g = len(x)
    dropped = np.zeros(g, dtype=bool)
    for lo in range(0, g, SEM_CHUNK):
        hi = min(g, lo + SEM_CHUNK)
        s = np.round(x[lo:hi] @ x[:hi].T, 6) >= threshold
        # only i < j witnesses count: columns < lo always qualify; within
        # the chunk's own square keep the strict lower triangle (col < row)
        s[:, lo:hi] &= np.tri(hi - lo, hi - lo, -1, dtype=bool)
        dropped[lo:hi] = s.any(axis=1)
    return dropped


def semantic_prune_cluster(
    vec_ids: np.ndarray, m: np.ndarray, threshold: float,
    max_group: int = SEM_MAX_GROUP, stats: dict | None = None,
) -> np.ndarray:
    """Within-cluster SemDeDup prune with the hot-cluster guard (the
    band_guard discipline, VERDICT r04 #1 — k-means on a boilerplate-heavy
    crawl routinely yields a mega-cluster, and the naive prune is O(g^2)
    flops in one task):

      1. **Star-collapse byte-identical embeddings** (vectorized
         ``np.unique(axis=0)``): every non-lowest-id member of an identical
         group drops iff the group's self-cosine clears the threshold —
         O(g log g), exactly the naive verdict for those rows.
      2. **Chunk split.** If the DISTINCT embeddings exceed ``max_group``
         they are split into content-hash (crc32) chunks pruned
         independently — per-chunk pairwise cost ~max_group^2 — plus one
         bridge pass over the chunk minima so cross-chunk near-dup mass
         keeps a deterministic witness path. Chunking approximates the
         global greedy rule (a cross-chunk witness pair below bridge level
         is missed); when the cluster fits one chunk the result is
         IDENTICAL to the unguarded kernel.

    Requires ``0 < threshold <= 1`` (the star-collapse equivalence needs a
    normalized self-cosine of 1 to clear the threshold and a zero vector's 0
    to miss it). Deterministic on any input order: rows sort by vec_id,
    chunk assignment hashes content. Scores threshold on the round(6) value
    so engine ulp differences cannot flip membership; the sidecar mirror
    calls THIS kernel on identically sorted rows, so results are
    bit-identical."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    order = np.argsort(vec_ids, kind="stable")
    ids, x = vec_ids[order], m[order]
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    x = x / np.where(norms == 0, 1.0, norms)
    n = len(ids)
    dropped = np.zeros(n, dtype=bool)
    uniq, first_idx, inv = np.unique(
        x, axis=0, return_index=True, return_inverse=True
    )
    if len(uniq) < n:
        # x is id-ascending, so each group's first occurrence IS its min id
        self_hit = np.round((uniq * uniq).sum(axis=1), 6) >= threshold
        is_rep = np.zeros(n, dtype=bool)
        is_rep[first_idx] = True
        dup_rows = ~is_rep
        dropped[dup_rows] = self_hit[inv.reshape(-1)[dup_rows]]
    rep_rows = np.sort(first_idx)  # distinct embeddings, id-ascending
    n_reps = len(rep_rows)
    n_chunks = -(-n_reps // max_group) if n_reps else 0
    if stats is not None:
        stats["n_rows"] = n
        stats["n_reps"] = n_reps
        stats["n_chunks"] = n_chunks
        stats["max_chunk_rows"] = 0
    if n_chunks <= 1:
        dropped[rep_rows] |= _greedy_prune_rows(x[rep_rows], threshold)
        if stats is not None:
            stats["max_chunk_rows"] = n_reps
    else:
        import zlib

        ch = np.fromiter(
            (zlib.crc32(x[r].tobytes()) % n_chunks for r in rep_rows),
            dtype=np.int64, count=n_reps,
        )
        bridge_rows: list[int] = []
        for c in range(n_chunks):
            sel = rep_rows[ch == c]
            if len(sel) == 0:
                continue
            dropped[sel] |= _greedy_prune_rows(x[sel], threshold)
            bridge_rows.append(int(sel[0]))
            if stats is not None:
                stats["max_chunk_rows"] = max(stats["max_chunk_rows"], len(sel))
        if len(bridge_rows) > 1:
            br = np.sort(np.asarray(bridge_rows, dtype=np.int64))
            dropped[br] |= _greedy_prune_rows(x[br], threshold)
    return ids[~dropped]


def kmeans_fit_mirror(vec_ids: np.ndarray, m: np.ndarray, k: int,
                      iters: int) -> np.ndarray:
    """Single-process mirror of kmeans_fit (same kernels, one pass per
    iteration) — the sidecar-oracle twin. Bit-identical because every
    operation is integer-exact and order-free."""
    xq = quantize(m)
    cq = init_centroids_quantized(vec_ids, xq, k)
    for _ in range(iters):
        present, counts, sums = _block_partials(xq, cq, k)
        cq = update_centroids(cq, counts, sums)
    return cq


def semantic_dedup(ds, k: int, iters: int, threshold: float,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   max_group: int = SEM_MAX_GROUP):
    """SemDeDup (Abbas et al. '23) as a Ray Data composition: k-means
    clusters the corpus (quantized Lloyd above), then each cluster prunes
    its internal near-duplicates independently — the clustering turns the
    corpus-wide O(n^2) cosine problem into K independent bounded ones, and
    the cluster-keyed exchange moves (id, embedding) rows exactly once.
    A skewed mega-cluster is bounded by the prune kernel's hot-cluster
    guard (star-collapse + ``max_group`` chunk split, see
    ``semantic_prune_cluster``). Returns kept ids ``{vec_id}``."""
    import ray as _ray

    return _semantic_prune_pipeline(
        ds, k, iters, threshold, id_col, vec_col, max_group, emit="kept"
    )


def semantic_dropped_ids(ds, k: int, iters: int, threshold: float,
                         id_col: str = "vec_id", vec_col: str = "embedding",
                         max_group: int = SEM_MAX_GROUP):
    """Complement of ``semantic_dedup``: emits the DROPPED ids — sized by
    the corpus's near-dup mass, not the corpus — for broadcast anti-join
    composition (the contested-winners discipline)."""
    return _semantic_prune_pipeline(
        ds, k, iters, threshold, id_col, vec_col, max_group, emit="dropped"
    )


def _semantic_prune_pipeline(ds, k, iters, threshold, id_col, vec_col,
                             max_group, emit):
    import ray as _ray

    cq = kmeans_fit(ds, k, iters, id_col=id_col, vec_col=vec_col)
    ref = _ray.put(cq.tobytes())
    dim = cq.shape[1]

    def tag(t: pa.Table) -> pa.Table:
        c = np.frombuffer(_ray.get(ref), np.int64).reshape(-1, dim)
        xq = quantize(_matrix(t, vec_col))
        return t.append_column(
            "cluster", pa.array(assign_clusters(xq, c), pa.int64())
        )

    def prune(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        kept = semantic_prune_cluster(
            ids, _matrix(t, vec_col), threshold, max_group=max_group
        )
        out = kept if emit == "kept" else np.setdiff1d(ids, kept)
        return pa.table({id_col: pa.array(np.sort(out), pa.int64())})

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )
