"""Sketch kernels: accuracy, determinism, and split-invariance (the property
that makes the distributed per-block fold + merge equal the single-process
mirror the driver oracle compares against)."""

import numpy as np
import pyarrow as pa

from qwen_ocr_ray.functions.sketch import (
    HLL_P,
    bottomk_rows,
    hll_estimate,
    hll_merge,
    hll_registers,
    mix64,
    quantiles_from_sample,
    string_hashes,
)


class TestHll:
    def test_accuracy_within_three_sigma(self):
        # 4096 registers -> ~1.6% stderr; 5% is ~3 sigma
        rng = np.random.RandomState(11)
        for n in (1_000, 50_000):
            hashes = mix64(rng.randint(0, 1 << 62, size=n).astype(np.uint64))
            est = hll_estimate(hll_registers(np.unique(hashes)))
            assert abs(est - n) / n < 0.05, (n, est)

    def test_small_range_linear_counting(self):
        hashes = mix64(np.arange(10, dtype=np.uint64))
        assert hll_estimate(hll_registers(hashes)) == 10

    def test_split_invariance(self):
        h = mix64(np.arange(20_000, dtype=np.uint64))
        whole = hll_registers(h)
        merged = hll_merge([hll_registers(part) for part in np.array_split(h, 7)])
        np.testing.assert_array_equal(whole, merged)

    def test_duplicates_do_not_inflate(self):
        h = mix64(np.arange(5_000, dtype=np.uint64))
        once = hll_estimate(hll_registers(h))
        thrice = hll_estimate(hll_registers(np.concatenate([h, h, h])))
        assert once == thrice


class TestBottomK:
    def test_split_merge_equals_whole(self):
        rng = np.random.RandomState(3)
        h = mix64(rng.permutation(30_000).astype(np.uint64))
        v = rng.normal(size=30_000)
        k = 512
        wh, wv = bottomk_rows(h, v, k)
        parts = [bottomk_rows(hp, vp, k) for hp, vp in
                 zip(np.array_split(h, 5), np.array_split(v, 5))]
        mh, mv = bottomk_rows(
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]), k,
        )
        np.testing.assert_array_equal(wh, mh)
        np.testing.assert_array_equal(wv, mv)

    def test_quantiles_track_truth(self):
        rng = np.random.RandomState(5)
        v = rng.normal(loc=10.0, scale=2.0, size=100_000)
        h = mix64(np.arange(len(v), dtype=np.uint64))
        _, sample = bottomk_rows(h, v, 4096)
        est = quantiles_from_sample(sample, [0.25, 0.5, 0.75])
        true = np.quantile(v, [0.25, 0.5, 0.75])
        assert np.abs(np.asarray(est) - true).max() < 0.15  # ~2%/sigma at k=4096


class TestStageAgainstMirror:
    def test_approx_distinct_matches_single_process(self, ray_session):
        import ray.data

        from qwen_ocr_ray.stages.sketch import approx_distinct

        ids = np.arange(4_000, dtype=np.int64) % 1_777  # duplicate-heavy
        ds = ray.data.from_arrow(pa.table({"user_id": pa.array(ids, pa.int64())}))
        got = approx_distinct(ds, "user_id").to_pandas().approx_distinct.iloc[0]
        expected = hll_estimate(hll_registers(mix64(np.unique(ids).astype(np.uint64))))
        assert got == expected
        assert abs(got - 1_777) / 1_777 < 0.05

    def test_string_hashing_path(self, ray_session):
        import ray.data

        from qwen_ocr_ray.stages.sketch import approx_distinct

        vals = [f"dom{i % 997}.example.com" for i in range(3_000)]
        ds = ray.data.from_arrow(pa.table({"domain": pa.array(vals, pa.string())}))
        got = approx_distinct(ds, "domain").to_pandas().approx_distinct.iloc[0]
        expected = hll_estimate(hll_registers(np.unique(string_hashes(vals[:997]))))
        assert got == expected


def test_string_hashes_deterministic():
    a = string_hashes(["x", "y", "zebra"])
    b = string_hashes(["x", "y", "zebra"])
    np.testing.assert_array_equal(a, b)
    assert len(np.unique(a)) == 3


class TestFrequentCandidates:
    def test_union_guarantee_over_blocks(self):
        from qwen_ocr_ray.functions.sketch import frequent_candidates

        # skewed stream: item i appears ~Zipf-ish; shuffled, then split into
        # blocks — every GLOBAL >phi heavy hitter must appear in the union of
        # per-block candidate sets (the pigeonhole superset guarantee)
        rng = np.random.RandomState(7)
        counts = {i: max(1, int(5000 / (i + 1))) for i in range(200)}
        stream = np.repeat(
            np.fromiter(counts, dtype=np.int64),
            np.fromiter(counts.values(), dtype=np.int64),
        )
        rng.shuffle(stream)
        phi = 1.0 / 50.0
        n = len(stream)
        truth = {i for i, c in counts.items() if c > phi * n}
        assert truth  # the fixture actually has heavy hitters
        union: set = set()
        for block in np.array_split(stream, 13):
            cands = frequent_candidates(block, phi)
            assert len(cands) <= int(1 / phi)  # bounded per block
            union.update(cands.tolist())
        assert truth <= union

    def test_empty_block(self):
        from qwen_ocr_ray.functions.sketch import frequent_candidates

        assert len(frequent_candidates(np.zeros(0, np.int64), 0.01)) == 0


class TestBloom:
    def test_no_false_negatives_and_mergeable(self):
        from qwen_ocr_ray.functions.sketch import (
            bloom_contains, bloom_fill, bloom_num_bits, md5_hash_pairs,
        )

        keys = [f"doc {i} text" for i in range(500)]
        m = bloom_num_bits(1000)
        # split fill across 4 "blocks", OR-merge — must equal one-shot fill
        parts = [keys[i::4] for i in range(4)]
        regs = np.zeros(m >> 3, np.uint8)
        for p in parts:
            regs |= bloom_fill(*md5_hash_pairs(p), m)
        whole = bloom_fill(*md5_hash_pairs(keys), m)
        assert np.array_equal(regs, whole)
        # one-sided error: every inserted key IS contained
        assert bloom_contains(regs, *md5_hash_pairs(keys)).all()
        # sized filter: fresh keys are (almost) all absent
        fresh = [f"other {i}" for i in range(500)]
        fp = bloom_contains(regs, *md5_hash_pairs(fresh)).mean()
        assert fp < 0.01, fp

    def test_tiny_filter_saturates_to_false_positives(self):
        # under-sizing degrades to FPs, never FNs — the documented one-sided
        # error direction
        from qwen_ocr_ray.functions.sketch import (
            bloom_contains, bloom_fill, md5_hash_pairs,
        )

        keys = [f"k{i}" for i in range(5000)]
        regs = bloom_fill(*md5_hash_pairs(keys), 1024)
        assert bloom_contains(regs, *md5_hash_pairs(keys)).all()
        fresh = [f"f{i}" for i in range(1000)]
        assert bloom_contains(regs, *md5_hash_pairs(fresh)).mean() > 0.5


class TestGroupedHll:
    def test_split_invariance_matches_single_process(self, ray_session):
        import ray.data

        from qwen_ocr_ray.functions.sketch import hll_estimate, hll_registers
        from qwen_ocr_ray.pipelines.queries import q_approx_distinct_by_type

        # block-split invariance on the real testdata: distributed per-block
        # fold + per-key register max must equal the one-pass mirror
        sf = "/root/testdata/sf0.001"
        got = {
            r["event_type"]: r["approx_distinct"]
            for r in q_approx_distinct_by_type(sf).take_all()
        }
        import pyarrow.parquet as pq

        ev = pq.read_table(sf + "/events.parquet", columns=["event_type", "user_id"])
        types = ev["event_type"].to_numpy(zero_copy_only=False)
        uid = ev["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        exp = {
            ty: hll_estimate(hll_registers(mix64(uid[types == ty])))
            for ty in set(types.tolist())
        }
        assert got == exp
        # sanity: estimates track the exact distinct counts within HLL error
        import collections

        truth = collections.defaultdict(set)
        for ty, u in zip(types.tolist(), uid.tolist()):
            truth[ty].add(u)
        for ty, est in got.items():
            n = len(truth[ty])
            assert abs(est - n) / n < 0.10, (ty, est, n)


class TestCms:
    def test_split_invariance_and_bounds(self):
        from qwen_ocr_ray.functions.sketch import cms_estimate, cms_fold

        rng = np.random.RandomState(7)
        keys = rng.zipf(1.3, size=20_000).astype(np.uint64) % 500
        h = mix64(keys)
        whole = cms_fold(h)
        # additive merge over any split == one fold (what the sidecar relies on)
        parts = np.array_split(h, 7)
        merged = np.sum([cms_fold(p) for p in parts], axis=0)
        assert (whole == merged).all()
        # never underestimates; overestimate bounded far under n/w * small factor
        probe = np.arange(500, dtype=np.uint64)
        est = cms_estimate(whole, mix64(probe))
        true = np.bincount(keys.astype(np.int64), minlength=500)
        assert (est >= true).all()
        assert (est - true).max() <= 200, (est - true).max()  # n/w ~ 10, min over d=4

    def test_empty_fold_is_zero(self):
        from qwen_ocr_ray.functions.sketch import cms_fold

        assert cms_fold(np.zeros(0, np.uint64)).sum() == 0


class TestGroupedQuantiles:
    def test_bottomk_union_retake_equals_one_pass(self):
        # the mergeability property grouped_approx_quantiles relies on
        rng = np.random.RandomState(3)
        h = mix64(rng.randint(0, 1 << 62, size=5_000).astype(np.uint64))
        v = rng.normal(size=5_000)
        k = 256
        one = bottomk_rows(h, v, k)
        ha, hb = np.array_split(h, 2)
        va, vb = np.array_split(v, 2)
        pa_, pb = bottomk_rows(ha, va, k), bottomk_rows(hb, vb, k)
        re = bottomk_rows(np.concatenate([pa_[0], pb[0]]),
                          np.concatenate([pa_[1], pb[1]]), k)
        assert (one[0] == re[0]).all() and (one[1] == re[1]).all()

    def test_matches_sidecar_mirror(self, ray_session):
        from qwen_ocr_ray.pipelines.queries import q_quantiles_by_type
        from qwen_ocr_ray.sources.oracle_sidecars import expected_sketches

        sf = "/root/testdata/sf0.001"
        got = sorted(
            (r["event_type"], r["q"], r["value"])
            for r in q_quantiles_by_type(sf).take_all()
        )
        exp_t = expected_sketches(sf)["group_quantiles.parquet"]
        exp = sorted(zip(*(exp_t[c].to_pylist() for c in ("event_type", "q", "value"))))
        assert got == exp


class TestWeightedSample:
    def test_biases_toward_heavy_docs_and_matches_mirror(self, ray_session):
        import numpy as np

        from qwen_ocr_ray.pipelines.queries import q_weighted_sample
        from qwen_ocr_ray.sources.oracle_sidecars import expected_weighted_sample

        sf = "/root/testdata/sf0.001"
        got = sorted(
            (r["doc_id"], r["n_chars"]) for r in q_weighted_sample(sf).take_all()
        )
        exp_t = expected_weighted_sample(sf)
        exp = sorted(zip(exp_t["doc_id"].to_pylist(), exp_t["n_chars"].to_pylist()))
        assert got == exp  # distributed top-k union-retake == one-pass mirror
        import pyarrow.parquet as pq

        corpus = pq.read_table(sf + "/documents.parquet", columns=["n_chars"])
        corpus_mean = np.mean(corpus["n_chars"].to_numpy(zero_copy_only=False))
        sample_mean = np.mean([c for _, c in got])
        assert sample_mean > corpus_mean  # weight-proportional selection
