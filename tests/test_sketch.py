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
