"""Geometry fixtures (FIXTURES.md §3): white-threshold crop, bbox math, area filter."""

import numpy as np
import pytest

from qwen_ocr_ray.functions.geometry import (
    area_filter_mask,
    area_fraction,
    content_bbox,
    crop_figure,
    denormalize_bbox,
    estimate_image_tokens,
    downscale_dims,
    optimize_page,
    rgb_view,
    validate_bbox,
)


def make_page(w=91, h=117, block=None, bg=255):
    """Synthetic white page with an optional black block (x1,y1,x2,y2)."""
    img = np.full((h, w, 3), bg, dtype=np.uint8)
    if block:
        x1, y1, x2, y2 = block
        img[y1:y2, x1:x2] = 0
    return img.tobytes(), w, h


class TestOptimizePage:
    def test_crop_to_content(self):
        raw, w, h = make_page(block=(10, 20, 50, 70))
        out, ow, oh = optimize_page(raw, w, h)
        assert (ow, oh) == (40, 50)
        assert np.all(rgb_view(out, ow, oh) == 0)

    def test_blank_page_passthrough(self):
        raw, w, h = make_page()
        out, ow, oh = optimize_page(raw, w, h)
        assert out == raw and (ow, oh) == (w, h)

    def test_threshold_boundary(self):
        # Pixels >= 250 count as background; 249 is content (pdf_handler.py:12,30-35).
        img = np.full((10, 10, 3), 250, dtype=np.uint8)
        img[4, 4] = 249
        assert content_bbox(img) == (4, 4, 5, 5)
        img2 = np.full((10, 10, 3), 250, dtype=np.uint8)
        assert content_bbox(img2) is None

    def test_margin_page(self):
        raw, w, h = make_page(w=910, h=1170, block=(100, 100, 810, 1070))
        _, ow, oh = optimize_page(raw, w, h)
        assert (ow, oh) == (710, 970)


class TestBbox:
    def test_validate_ok(self):
        validate_bbox((0, 0, 1000, 1000))
        validate_bbox((100, 250, 600, 700))

    @pytest.mark.parametrize("bbox", [(600, 250, 100, 700), (0, 0, 0, 1000),
                                      (-1, 0, 10, 10), (0, 0, 1001, 10)])
    def test_validate_raises(self, bbox):
        with pytest.raises(ValueError):
            validate_bbox(bbox)

    def test_denormalize_truncates(self):
        # int(x*dim/1000) truncation (pdf_handler.py:86-91)
        assert denormalize_bbox((0, 0, 1000, 1000), 910, 1170) == (0, 0, 910, 1170)
        assert denormalize_bbox((333, 333, 667, 667), 910, 1170) == (303, 389, 606, 780)

    def test_area_fraction(self):
        assert area_fraction((0, 0, 1000, 1000)) == 1.0
        assert area_fraction((100, 250, 600, 700)) == 0.225

    def test_area_filter_keep_bounds_inclusive(self):
        # keep min<=frac<=max; skip outside (document_job.py:202-227)
        x1 = np.array([0, 0, 0, 0])
        y1 = np.array([0, 0, 0, 0])
        # fracs: 0.04 (skip), 0.05 (keep), 0.85 (keep), 0.86 (skip)
        x2 = np.array([200, 250, 1000, 1000])
        y2 = np.array([200, 200, 850, 860])
        mask = area_filter_mask(x1, y1, x2, y2)
        assert mask.tolist() == [False, True, True, False]


class TestCropFigure:
    def test_crop_matches_denorm(self):
        raw, w, h = make_page(w=100, h=200, block=(10, 20, 60, 120))
        out, cw, ch = crop_figure(raw, w, h, (100, 100, 600, 600))
        assert (cw, ch) == (50, 100)
        # region (10..60, 20..120) px equals the black block exactly
        assert np.all(rgb_view(out, cw, ch) == 0)

    def test_invalid_bbox_raises(self):
        raw, w, h = make_page(w=10, h=10)
        with pytest.raises(ValueError):
            crop_figure(raw, w, h, (500, 0, 100, 100))


class TestTokens:
    def test_estimate(self):
        assert estimate_image_tokens(910, 1170) == (910 // 28) * (1170 // 28)
        assert estimate_image_tokens(27, 1000) == 0

    def test_downscale_dims(self):
        assert downscale_dims(910, 1170) == (700, 900)
        assert downscale_dims(130, 130) == (100, 100)
