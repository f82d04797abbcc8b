"""k-means: planted-cluster recovery, integer-exact merge invariance, and
distributed == single-process mirror (the property the sidecar oracle
certifies). Note the testdata embeddings table's `label` column is NOT
geometric (within-label cosine == cross-label, both ~0), so recovery is
proved on planted Gaussians instead."""

import numpy as np
import pyarrow.parquet as pq

from qwen_ocr_ray.stages.kmeans import (
    _block_partials,
    assign_clusters,
    init_centroids_quantized,
    kmeans_fit_mirror,
    quantize,
    update_centroids,
)


def _planted(n_per=200, k=5, dim=16, seed=9):
    rng = np.random.RandomState(seed)
    centers = rng.normal(size=(k, dim)) * 3.0
    pts = np.concatenate(
        [centers[j] + rng.normal(scale=0.15, size=(n_per, dim)) for j in range(k)]
    )
    labels = np.repeat(np.arange(k), n_per)
    ids = np.arange(len(pts), dtype=np.int64)
    return ids, pts, labels


class TestKmeansKernels:
    def test_planted_cluster_recovery(self):
        ids, pts, labels = _planted()
        cq = kmeans_fit_mirror(ids, pts, 5, 8)
        a = assign_clusters(quantize(pts), cq)
        purity = sum(
            np.bincount(labels[a == c]).max() for c in np.unique(a)
        ) / len(a)
        assert purity >= 0.95, purity

    def test_partials_merge_equals_whole(self):
        # integer sums commute: per-split partials add to the one-pass fold
        ids, pts, _ = _planted(n_per=50)
        xq = quantize(pts)
        cq = init_centroids_quantized(ids, xq, 5)
        _, c_whole, s_whole = _block_partials(xq, cq, 5)
        c_sum = np.zeros(5, np.int64)
        s_sum = np.zeros_like(s_whole)
        for part in np.array_split(np.arange(len(xq)), 7):
            _, c, s = _block_partials(xq[part], cq, 5)
            c_sum += c
            s_sum += s
        assert (c_whole == c_sum).all() and (s_whole == s_sum).all()

    def test_empty_cluster_keeps_centroid(self):
        cq = np.arange(6, dtype=np.int64).reshape(3, 2)
        counts = np.array([2, 0, 1], np.int64)
        sums = np.array([[10, 10], [0, 0], [7, 7]], np.int64)
        out = update_centroids(cq, counts, sums)
        assert (out[1] == cq[1]).all() and (out[0] == [5, 5]).all()

    def test_argmin_tie_breaks_low_index(self):
        xq = np.zeros((1, 2), np.int64)
        cq = np.array([[1, 0], [0, 1]], np.int64)  # equidistant
        assert assign_clusters(xq, cq)[0] == 0


class TestKmeansDistributed:
    def test_matches_mirror(self, ray_session):
        from qwen_ocr_ray.pipelines.queries import (
            KMEANS_ITERS, KMEANS_K, q_kmeans_clusters,
        )

        sf = "/root/testdata/sf0.001"
        got = {r["vec_id"]: r["cluster"] for r in q_kmeans_clusters(sf).take_all()}
        t = pq.read_table(sf + "/embeddings.parquet")
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        m = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        cq = kmeans_fit_mirror(ids, m, KMEANS_K, KMEANS_ITERS)
        exp = dict(zip(ids.tolist(), assign_clusters(quantize(m), cq).tolist()))
        assert got == exp


class TestSemanticPrune:
    def test_planted_duplicate_dropped_keeps_lowest_id(self):
        from qwen_ocr_ray.stages.kmeans import semantic_prune_cluster

        rng = np.random.RandomState(4)
        m = rng.normal(size=(20, 8))
        m[7] = m[3] * 2.0  # same direction -> cosine 1.0 with id 3
        ids = np.arange(20, dtype=np.int64)
        kept = semantic_prune_cluster(ids, m, 0.99)
        assert 3 in kept and 7 not in kept

    def test_chunked_equals_whole(self):
        import qwen_ocr_ray.stages.kmeans as km

        rng = np.random.RandomState(5)
        m = rng.normal(size=(300, 8))
        # plant several near-dup chains crossing would-be chunk boundaries
        for a, b in [(0, 299), (10, 150), (149, 151)]:
            m[b] = m[a] + rng.normal(scale=0.01, size=8)
        ids = np.arange(300, dtype=np.int64)
        whole = km.semantic_prune_cluster(ids, m, 0.9)
        old = km.SEM_CHUNK
        try:
            km.SEM_CHUNK = 64
            chunked = km.semantic_prune_cluster(ids, m, 0.9)
        finally:
            km.SEM_CHUNK = old
        assert (whole == chunked).all()
        assert len(whole) < 300  # the planted dups actually dropped


class TestHotClusterGuard:
    """VERDICT r04 #1: one skewed k-means cell must not pin a task at
    O(g^2) flops with the whole cluster resident."""

    @staticmethod
    def _naive(ids, m, th):
        order = np.argsort(ids, kind="stable")
        ids, x = ids[order], m[order]
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        x = x / np.where(norms == 0, 1.0, norms)
        s = np.round(x @ x.T, 6) >= th
        s &= np.tri(len(x), len(x), -1, dtype=bool)  # i < j witnesses only
        return ids[~s.any(axis=1)]

    def test_guard_equals_naive_when_unchunked(self):
        from qwen_ocr_ray.stages.kmeans import semantic_prune_cluster

        rng = np.random.RandomState(11)
        m = rng.normal(size=(300, 8))
        m[50] = m[10]  # byte-identical pair -> star path
        m[51] = m[10]
        m[200] = m[20] * 3.0  # same direction, different bytes
        m[250] = np.zeros(8)  # zero vectors: never dropped, never witnesses
        m[251] = np.zeros(8)
        ids = np.arange(300, dtype=np.int64)
        got = semantic_prune_cluster(ids, m, 0.9)
        exp = self._naive(ids, m, 0.9)
        assert (got == exp).all()
        assert 50 not in got and 51 not in got and 200 not in got
        assert 250 in got and 251 in got

    def test_guard_equals_naive_property(self):
        """Hypothesis sweep of the unchunked equivalence: random row counts,
        dims, duplicate patterns and thresholds — the guarded kernel must
        equal the naive O(n^2) rule whenever max_group doesn't bind."""
        from hypothesis import given, settings, strategies as st

        from qwen_ocr_ray.stages.kmeans import semantic_prune_cluster

        @settings(max_examples=40, deadline=None)
        @given(
            seed=st.integers(0, 10_000),
            n=st.integers(2, 60),
            dim=st.integers(2, 9),
            th=st.sampled_from([0.3, 0.7, 0.95, 1.0]),
            ndup=st.integers(0, 5),
            nzero=st.integers(0, 2),
        )
        def check(seed, n, dim, th, ndup, nzero):
            rng = np.random.RandomState(seed)
            m = rng.normal(size=(n, dim))
            for j in range(min(ndup, n - 1)):
                m[rng.randint(1, n)] = m[rng.randint(0, n)]  # byte-dups
            for j in range(min(nzero, n)):
                m[rng.randint(0, n)] = 0.0
            ids = np.arange(n, dtype=np.int64)
            got = semantic_prune_cluster(ids, m.copy(), th)
            exp = TestHotClusterGuard._naive(ids, m.copy(), th)
            assert (got == exp).all(), (seed, n, dim, th)

        check()

    def test_mega_cluster_bounded_star_and_chunks(self):
        from qwen_ocr_ray.stages.kmeans import semantic_prune_cluster

        rng = np.random.RandomState(12)
        base = rng.normal(size=8)
        # 6000 byte-identical copies (boilerplate) + 2000 distinct rows
        m = np.concatenate(
            [np.tile(base, (6000, 1)), rng.normal(size=(2000, 8))]
        )
        ids = np.arange(8000, dtype=np.int64)
        stats: dict = {}
        kept = semantic_prune_cluster(ids, m, 0.99, max_group=256, stats=stats)
        # star-collapse: exactly one of the 6000 identical rows survives
        assert 0 in kept and not any(1 <= k < 6000 for k in kept)
        # the pairwise work was chunk-bounded, not O(n_reps^2)
        assert stats["n_reps"] == 2001
        assert stats["n_chunks"] == -(-2001 // 256)
        assert stats["max_chunk_rows"] <= 3 * 256  # crc32 balance slack

    def test_chunked_prune_deterministic_under_permutation(self):
        from qwen_ocr_ray.stages.kmeans import semantic_prune_cluster

        rng = np.random.RandomState(13)
        m = rng.normal(size=(1000, 8))
        for a, b in [(3, 700), (400, 900), (100, 101)]:
            m[b] = m[a] + rng.normal(scale=0.01, size=8)
        ids = np.arange(1000, dtype=np.int64)
        a1 = semantic_prune_cluster(ids, m, 0.9, max_group=64)
        p = rng.permutation(1000)
        a2 = semantic_prune_cluster(ids[p], m[p], 0.9, max_group=64)
        assert (a1 == a2).all()
        assert len(a1) < 1000  # the planted dups actually dropped

    def test_semantic_dedup_e2e_with_binding_guard(self, ray_session):
        """Distributed semantic_dedup with max_group binding equals the
        single-process kernel composition (fit + assign + guarded prune)."""
        import ray.data

        import pyarrow as pa
        from qwen_ocr_ray.stages.kmeans import (
            assign_clusters, kmeans_fit_mirror, quantize,
            semantic_dedup, semantic_prune_cluster,
        )

        rng = np.random.RandomState(14)
        m = rng.normal(size=(600, 8)) * 0.2
        m[100:400] = np.tile(m[100], (300, 1))  # one boilerplate blob
        ids = np.arange(600, dtype=np.int64)
        t = pa.table(
            {"vec_id": pa.array(ids, pa.int64()),
             "embedding": pa.array(list(m), pa.list_(pa.float64()))}
        )
        got = sorted(
            r["vec_id"]
            for r in semantic_dedup(
                ray.data.from_arrow(t).repartition(5), 3, 3, 0.95, max_group=32
            ).take_all()
        )
        cq = kmeans_fit_mirror(ids, m, 3, 3)
        a = assign_clusters(quantize(m), cq)
        exp: list[int] = []
        for c in np.unique(a):
            sel = a == c
            exp.extend(
                semantic_prune_cluster(ids[sel], m[sel], 0.95, max_group=32)
            )
        assert got == sorted(exp)


class TestBlockSplitInvariance:
    def test_fit_identical_across_block_layouts(self, ray_session):
        """The quantized fold is order/split-free: fitting over 2 blocks and
        over 9 blocks must give byte-identical centroids (what makes the
        sidecar mirror a valid oracle at ANY cluster size)."""
        import ray.data

        from qwen_ocr_ray.stages.kmeans import kmeans_fit

        t = pq.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        cq2 = kmeans_fit(ray.data.from_arrow(t).repartition(2), 10, 3)
        cq9 = kmeans_fit(ray.data.from_arrow(t).repartition(9), 10, 3)
        assert (cq2 == cq9).all()

    def test_sampled_fit_identical_across_block_layouts(self, ray_session):
        """The bounded-sample fit (the 100 TB path) is layout-invariant too:
        per-block bottom-S union re-taken to S == one-pass bottom-S."""
        import ray.data

        from qwen_ocr_ray.stages.kmeans import kmeans_fit_sample

        t = pq.read_table(
            "/root/testdata/sf0.001/embeddings.parquet",
            columns=["vec_id", "embedding"],
        )
        cq2 = kmeans_fit_sample(ray.data.from_arrow(t).repartition(2), 10, 3, 128)
        cq9 = kmeans_fit_sample(ray.data.from_arrow(t).repartition(9), 10, 3, 128)
        assert (cq2 == cq9).all()


class TestSemanticVsExactPairs:
    def test_drops_are_larger_members_of_exact_pairs(self, ray_session):
        """Cross-validation of two independent near-dup implementations:
        every doc semantic_dedup drops must be the LARGER member of some
        exact brute-force cosine pair >= threshold (the clustering only
        RESTRICTS which witnesses are visible — same-cluster — so its drop
        set is a subset of the exact greedy drop set). The converse is not
        asserted: cross-cluster pairs are invisible to SemDeDup by design."""
        import pyarrow.parquet as pq

        from qwen_ocr_ray.pipelines.queries import (
            q_embedding_pairs, q_semantic_dedup,
        )

        sf = "/root/testdata/sf0.001"
        kept = {r["vec_id"] for r in q_semantic_dedup(sf).take_all()}
        all_ids = set(
            pq.read_table(sf + "/embeddings.parquet", columns=["vec_id"])[
                "vec_id"
            ].to_pylist()
        )
        dropped = all_ids - kept
        assert dropped, "prune should drop the planted near-dups"
        exact_larger = {r["vec_b"] for r in q_embedding_pairs(sf).take_all()}
        assert dropped <= exact_larger, dropped - exact_larger
