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
