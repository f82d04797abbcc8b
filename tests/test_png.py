"""Pure-python PNG codec (functions/png.py) + the figure PNG file sink.

Output-format parity with the reference's PNG sinks
(pdf_handler.py:67-71, extracted_image.py:33-43).
"""

import struct
import zlib

import numpy as np
import pytest

from qwen_ocr_ray.functions.png import _SIG, _chunk, decode_png, encode_png


def _gradient(w, h):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = xx % 256
    img[:, :, 1] = yy % 256
    img[:, :, 2] = (xx + yy) % 256
    return img


def _build_png(samples: np.ndarray, color_type: int, filters: list[int]) -> bytes:
    """Hand-roll a PNG with per-scanline filter types to exercise the
    decoder's unfilter paths (the encoder itself only emits filter 0)."""
    h, w, ch = samples.shape
    stride = w * ch
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        line = samples[y].reshape(stride).astype(np.int32)
        f = filters[y % len(filters)]
        enc = line.copy()
        if f == 1:  # Sub
            for x in range(stride - 1, ch - 1, -1):
                enc[x] = (enc[x] - line[x - ch]) & 0xFF
        elif f == 2:  # Up
            enc = (line - prev) & 0xFF
        elif f == 3:  # Average
            for x in range(stride - 1, -1, -1):
                a = line[x - ch] if x >= ch else 0
                enc[x] = (line[x] - ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride - 1, -1, -1):
                a = line[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                p = a + b - c
                pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)
                enc[x] = (line[x] - pred) & 0xFF
        out.append(f)
        out += enc.astype(np.uint8).tobytes()
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


class TestRoundTrip:
    def test_rgb_round_trip(self):
        img = _gradient(37, 23)
        data = encode_png(img.tobytes(), 37, 23)
        w, h, rgb = decode_png(data)
        assert (w, h) == (37, 23)
        assert rgb == img.tobytes()

    def test_size_mismatch_rejected(self):
        with pytest.raises(ValueError):
            encode_png(b"\x00" * 10, 4, 4)

    def test_not_a_png(self):
        with pytest.raises(ValueError):
            decode_png(b"\xff\xd8\xff\xe0 jpeg junk")


class TestDecoderFilters:
    @pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_all_filter_types(self, filters):
        img = _gradient(16, 12)
        data = _build_png(img, 2, filters)
        w, h, rgb = decode_png(data)
        assert (w, h) == (16, 12)
        assert rgb == img.tobytes()

    def test_rgba_drops_alpha(self):
        img = _gradient(8, 6)
        rgba = np.dstack([img, np.full((6, 8), 128, np.uint8)])
        w, h, rgb = decode_png(_build_png(rgba, 6, [0, 2]))
        assert rgb == img.tobytes()

    def test_grayscale_expands(self):
        gray = (np.arange(48, dtype=np.uint8).reshape(6, 8, 1)) * 5
        w, h, rgb = decode_png(_build_png(gray, 0, [0, 1]))
        expect = np.repeat(gray, 3, axis=2)
        assert rgb == expect.tobytes()


class TestMultimodalPngPath:
    def test_image_features_decode_png_rows(self):
        from qwen_ocr_ray.functions.png import encode_png
        from qwen_ocr_ray.stages.multimodal import PNG, RAW_RGB, ImageFeatures
        import pyarrow as pa

        img = _gradient(20, 10)
        batch = pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "mime": pa.array([RAW_RGB, PNG], pa.string()),
                "payload": pa.array(
                    [img.tobytes(), encode_png(img.tobytes(), 20, 10)], pa.binary()
                ),
                "width": pa.array([20, 20], pa.int32()),
                "height": pa.array([10, 10], pa.int32()),
            }
        )
        out = ImageFeatures()(batch).to_pandas()
        # same pixels -> identical features through both codecs
        assert out.error.isna().all()
        assert out.iloc[0][["mean_r", "mean_g", "mean_b", "brightness"]].tolist() == \
            out.iloc[1][["mean_r", "mean_g", "mean_b", "brightness"]].tolist()


class TestFigurePngSink:
    def test_writes_reference_named_files(self, ray_session, sf_dir, tmp_path):
        import os

        from qwen_ocr_ray.pipelines.figures import run_figures, write_figure_pngs
        from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

        pages_path, _ = ensure_pages_dataset(sf_dir)
        figures = run_figures(pages_path, routed_dir=str(tmp_path / "routed"),
                              approx_rows=600)
        n = write_figure_pngs(figures, str(tmp_path / "pngs"))
        assert n > 0
        files = [
            f for r, _, fs in os.walk(tmp_path / "pngs") for f in fs
        ]
        assert len(files) == n
        import re

        assert all(re.fullmatch(r"\d+_fig\d+\.png", f) for f in files)
        # every file decodes back to its crop dimensions
        sample_dir = next((tmp_path / "pngs").iterdir())
        sample = next(sample_dir.iterdir())
        w, h, rgb = decode_png(sample.read_bytes())
        assert w > 0 and h > 0 and len(rgb) == w * h * 3
