"""Multimodal stages (plumbing real, codecs stubbed) + skew partitioning."""

import numpy as np
import pyarrow.parquet as pq
import pytest

import ray.data

from qwen_ocr_ray.sources.synth_media import ensure_media_dataset
from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset
from qwen_ocr_ray.stages.multimodal import (
    RAW_PCM16, RAW_RGB, RAW_VIDEO,
    AudioFeatures, ImageFeatures, ResizeImages, SampleVideoFrames,
)


@pytest.fixture(scope="module")
def media(ray_session, sf_dir):
    path = ensure_media_dataset(sf_dir)
    return path, pq.read_table(path)


def _kind_ds(path, mime):
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(path)
    return ds.map_batches(
        lambda t, m=mime: t.filter(pc.equal(t["mime"], m)), batch_format="pyarrow"
    )


class TestMultimodal:
    def test_mix_present(self, media):
        _, t = media
        mimes = set(t["mime"].to_pylist())
        assert {RAW_RGB, RAW_PCM16, RAW_VIDEO, "image/jpeg"} <= mimes

    def test_resize_images(self, media):
        path, t = media
        out = _kind_ds(path, RAW_RGB).map_batches(
            ResizeImages, fn_constructor_kwargs={"target_w": 32, "target_h": 16},
            batch_format="pyarrow", batch_size=64, concurrency=2, num_cpus=1,
        ).to_pandas()
        n_imgs = sum(1 for m in t["mime"].to_pylist() if m == RAW_RGB)
        assert len(out) == n_imgs
        assert (out.width == 32).all() and (out.height == 16).all()
        assert out.error.isna().all()
        assert all(len(p) == 32 * 16 * 3 for p in out.payload)

    def test_image_features_deterministic(self, media):
        path, _ = media
        a = ImageFeatures()
        ds = _kind_ds(path, RAW_RGB)
        f1 = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                            concurrency=2, num_cpus=1).to_pandas().sort_values("media_id")
        f2 = ds.map_batches(ImageFeatures, batch_format="pyarrow",
                            concurrency=2, num_cpus=1).to_pandas().sort_values("media_id")
        assert (f1.brightness.values == f2.brightness.values).all()
        assert f1.error.isna().all()
        assert ((f1.brightness >= 0) & (f1.brightness <= 255)).all()

    def test_stubbed_codec_yields_error_rows(self, media):
        path, _ = media
        out = _kind_ds(path, "image/jpeg").map_batches(
            ImageFeatures, batch_format="pyarrow", concurrency=2, num_cpus=1
        ).to_pandas()
        assert len(out) > 0
        assert out.error.str.contains("no codec").all()
        assert out.brightness.isna().all()

    def test_audio_features(self, media):
        path, t = media
        out = _kind_ds(path, RAW_PCM16).map_batches(
            AudioFeatures, batch_format="pyarrow", concurrency=2, num_cpus=1
        ).to_pandas()
        assert len(out) == sum(1 for m in t["mime"].to_pylist() if m == RAW_PCM16)
        assert ((out.duration_ms >= 500) & (out.duration_ms <= 1500)).all()
        assert (out.rms > 0).all() and (out.zero_crossings > 0).all()

    def test_video_frame_sampling(self, media):
        path, t = media
        out = _kind_ds(path, RAW_VIDEO).map_batches(
            SampleVideoFrames, fn_constructor_kwargs={"every_k": 4},
            batch_format="pyarrow", batch_size=16, concurrency=2, num_cpus=1,
        ).to_pandas()
        vids = {
            mid: nf
            for mid, m, nf in zip(
                t["media_id"].to_pylist(), t["mime"].to_pylist(), t["n_frames"].to_pylist()
            )
            if m == RAW_VIDEO
        }
        expected = sum((nf + 3) // 4 for nf in vids.values())
        assert len(out) == expected
        assert (out.frame_idx % 4 == 0).all()
        assert (out.mime == RAW_RGB).all()


class TestSkewPartitioning:
    def test_hot_domain_salted_and_bounded(self, ray_session, sf_dir):
        from qwen_ocr_ray.pipelines.extract import sized_read_parquet
        from qwen_ocr_ray.stages.skew import compute_hot_domains, partition_histogram

        pages_path, _ = ensure_pages_dataset(sf_dir)
        total = pq.read_metadata(pages_path).num_rows
        ds = sized_read_parquet(pages_path, columns=["url"])

        hot = compute_hot_domains(ds, hot_fraction=0.05, total_rows=total)
        assert "hot.example.com" in hot          # fixture plants ~30% on this domain
        assert hot["hot.example.com"] >= 4       # split into >= share/threshold slices

        hist = partition_histogram(ds, hot_fraction=0.05, total_rows=total).to_pandas()
        hot_parts = hist[hist.part.str.startswith("hot.example.com#")]
        assert len(hot_parts) == hot["hot.example.com"]
        # boundedness: no salted partition exceeds ~2x the hot threshold
        assert hist.n_rows.max() <= 2 * 0.05 * total
        # cold domains keep a single partition (locality preserved)
        cold = hist[~hist.part.str.startswith("hot.example.com#")]
        assert cold.part.str.endswith("#0").all()
