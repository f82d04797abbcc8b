"""Multimodal columns: image / audio / video as opaque binary + typed metadata.

Media travel as ``binary`` payload columns with explicit metadata columns
(mime, width/height, sample_rate, n_frames) — never as Python objects. The
container has no codec libraries, so REAL codecs (JPEG/PNG/FLAC/H.264) are
stubbed: a payload whose mime we cannot decode yields an error row via
``NotImplementedError``, while the deterministic raw formats below exercise
the full Ray plumbing (schemas, actor pools, batch sizing, output layout):

  image  mime="image/x-raw-rgb"   raw RGB bytes + width/height
  audio  mime="audio/x-raw-pcm16" little-endian int16 mono + sample_rate
  video  mime="video/x-rawpages"  RAWPAGES1 container of raw-RGB frames

Stages are callable classes (actor pools): setup in __init__, vectorized
numpy kernels per batch. Batch sizes stay small — payload bytes dominate row
size (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from qwen_ocr_ray.functions.geometry import rgb_view
from qwen_ocr_ray.functions.payload import area_mean_resize
from qwen_ocr_ray.sources.pagepack import unpack_pages

RAW_RGB = "image/x-raw-rgb"
RAW_PCM16 = "audio/x-raw-pcm16"
RAW_VIDEO = "video/x-rawpages"
PNG = "image/png"

IMAGE_MIMES = (RAW_RGB, PNG)


def _decode_image(payload: bytes, mime: str, width: int, height: int) -> np.ndarray:
    if mime == RAW_RGB:
        return rgb_view(payload, width, height)
    if mime == PNG:
        # real codec: pure-python PNG (functions/png.py) — zlib + numpy
        from qwen_ocr_ray.functions.png import decode_png

        w, h, rgb = decode_png(payload)
        return rgb_view(rgb, w, h)
    raise NotImplementedError(f"no codec for {mime} in this sandbox")


class ResizeImages:
    """Image rows -> resized image rows (area-mean kernel; real compute)."""

    def __init__(self, target_w: int = 64, target_h: int = 64):
        self.tw, self.th = target_w, target_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_payload, out_w, out_h, errs = [], [], [], []
        for payload, mime, w, h in zip(
            batch["payload"].to_pylist(), batch["mime"].to_pylist(),
            batch["width"].to_pylist(), batch["height"].to_pylist(),
        ):
            try:
                img = _decode_image(payload, mime, w, h)
                resized = area_mean_resize(img, self.tw, self.th)
                out_payload.append(resized.tobytes())
                out_w.append(self.tw)
                out_h.append(self.th)
                errs.append(None)
            except NotImplementedError as e:
                out_payload.append(None)
                out_w.append(None)
                out_h.append(None)
                errs.append(str(e))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "mime": batch["mime"],
                "payload": pa.array(out_payload, pa.binary()),
                "width": pa.array(out_w, pa.int32()),
                "height": pa.array(out_h, pa.int32()),
                "error": pa.array(errs, pa.string()),
            }
        )


class ImageFeatures:
    """Image rows -> feature rows: mean RGB, brightness, edge density."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "media_id": [], "mean_r": [], "mean_g": [], "mean_b": [],
            "brightness": [], "edge_density": [], "error": [],
        }
        for mid, payload, mime, w, h in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(),
            batch["mime"].to_pylist(), batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            cols["media_id"].append(mid)
            try:
                img = _decode_image(payload, mime, w, h).astype(np.float64)
                means = img.mean(axis=(0, 1))
                gray = img.mean(axis=2)
                gx = np.abs(np.diff(gray, axis=1)).mean() if w > 1 else 0.0
                gy = np.abs(np.diff(gray, axis=0)).mean() if h > 1 else 0.0
                cols["mean_r"].append(round(float(means[0]), 4))
                cols["mean_g"].append(round(float(means[1]), 4))
                cols["mean_b"].append(round(float(means[2]), 4))
                cols["brightness"].append(round(float(gray.mean()), 4))
                cols["edge_density"].append(round(float(gx + gy), 4))
                cols["error"].append(None)
            except NotImplementedError as e:
                for k in ("mean_r", "mean_g", "mean_b", "brightness", "edge_density"):
                    cols[k].append(None)
                cols["error"].append(str(e))
        return pa.table(
            {
                "media_id": pa.array(cols["media_id"], pa.int64()),
                "mean_r": pa.array(cols["mean_r"], pa.float64()),
                "mean_g": pa.array(cols["mean_g"], pa.float64()),
                "mean_b": pa.array(cols["mean_b"], pa.float64()),
                "brightness": pa.array(cols["brightness"], pa.float64()),
                "edge_density": pa.array(cols["edge_density"], pa.float64()),
                "error": pa.array(cols["error"], pa.string()),
            }
        )


class AudioFeatures:
    """PCM16 audio rows -> duration + RMS/zero-crossing features."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "media_id": [], "duration_ms": [], "rms": [], "zero_crossings": [], "error": [],
        }
        for mid, payload, mime, sr in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(),
            batch["mime"].to_pylist(), batch["sample_rate"].to_pylist(),
        ):
            cols["media_id"].append(mid)
            if mime != RAW_PCM16:
                cols["duration_ms"].append(None)
                cols["rms"].append(None)
                cols["zero_crossings"].append(None)
                cols["error"].append(f"no codec for {mime} in this sandbox")
                continue
            samples = np.frombuffer(payload, dtype="<i2").astype(np.float64)
            cols["duration_ms"].append(int(len(samples) * 1000 / sr))
            cols["rms"].append(round(float(np.sqrt((samples**2).mean())) if len(samples) else 0.0, 4))
            cols["zero_crossings"].append(int((np.diff(np.signbit(samples)) != 0).sum()))
            cols["error"].append(None)
        return pa.table(
            {
                "media_id": pa.array(cols["media_id"], pa.int64()),
                "duration_ms": pa.array(cols["duration_ms"], pa.int64()),
                "rms": pa.array(cols["rms"], pa.float64()),
                "zero_crossings": pa.array(cols["zero_crossings"], pa.int64()),
                "error": pa.array(cols["error"], pa.string()),
            }
        )


class SampleVideoFrames:
    """Video rows -> exploded frame rows, every k-th frame (flat-map shape)."""

    def __init__(self, every_k: int = 4):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {
            "media_id": [], "frame_idx": [], "payload": [], "width": [],
            "height": [], "mime": [], "error": [],
        }
        for mid, payload, mime in zip(
            batch["media_id"].to_pylist(), batch["payload"].to_pylist(),
            batch["mime"].to_pylist(),
        ):
            if mime != RAW_VIDEO:
                cols["media_id"].append(mid)
                cols["frame_idx"].append(None)
                cols["payload"].append(None)
                cols["width"].append(None)
                cols["height"].append(None)
                cols["mime"].append(mime)
                cols["error"].append(f"no codec for {mime} in this sandbox")
                continue
            for idx, (w, h, raw) in enumerate(unpack_pages(payload)):
                if idx % self.k:
                    continue
                cols["media_id"].append(mid)
                cols["frame_idx"].append(idx)
                cols["payload"].append(raw)
                cols["width"].append(w)
                cols["height"].append(h)
                cols["mime"].append(RAW_RGB)
                cols["error"].append(None)
        return pa.table(
            {
                "media_id": pa.array(cols["media_id"], pa.int64()),
                "frame_idx": pa.array(cols["frame_idx"], pa.int32()),
                "payload": pa.array(cols["payload"], pa.binary()),
                "width": pa.array(cols["width"], pa.int32()),
                "height": pa.array(cols["height"], pa.int32()),
                "mime": pa.array(cols["mime"], pa.string()),
                "error": pa.array(cols["error"], pa.string()),
            }
        )
