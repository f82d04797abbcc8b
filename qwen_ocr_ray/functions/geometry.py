"""Page/figure geometry: white-threshold crop, bbox math, area filter.

Semantics transcribed from the reference (NOT copied code):
  - page optimizer (invert + content crop)  /root/reference/src/pdf_handler.py:27-41
  - image token estimate                    /root/reference/src/pdf_handler.py:64; src/processing.py:100-102
  - bbox denormalization (0-1000 -> px)     /root/reference/src/pdf_handler.py:78-93
  - bbox validation (raises)                /root/reference/src/pdf_handler.py:107-110
  - area filter (warns/skips, non-fatal)    /root/reference/src/models/document_job.py:202-227

The container has no PIL, so page images are carried as **raw RGB bytes**
(``binary`` column) plus explicit ``width``/``height`` int32 columns — the
Arrow-native analogue of ``PageImage`` (src/models/page_models.py:8-13). All
kernels operate on numpy views of those bytes; PNG en/decoding is an I/O-edge
concern (see sources/png.py) and never happens in the hot path.

Note the reference's error asymmetry (SURVEY.md §7 hard part 5): bbox
violations RAISE, area-filter violations SKIP with a warning.
"""

from __future__ import annotations

import numpy as np

Bbox = tuple[int, int, int, int]


def rgb_view(image_bytes: bytes, width: int, height: int) -> np.ndarray:
    """Zero-copy (H, W, 3) uint8 view over raw RGB bytes."""
    arr = np.frombuffer(image_bytes, dtype=np.uint8)
    if arr.size != width * height * 3:
        raise ValueError(
            f"raw RGB payload is {arr.size} bytes, expected {width}x{height}x3 = {width * height * 3}"
        )
    return arr.reshape(height, width, 3)


def content_bbox(img: np.ndarray, white_threshold: int = 250) -> Bbox | None:
    """Bounding box of non-background content, in pixel coords (x1, y1, x2, y2).

    Mirrors the reference trick (pdf_handler.py:30-35): per-channel map
    ``x -> 255 - x if x < threshold else 0`` then take the bbox of non-zero
    pixels (PIL ``getbbox`` over all channels). Returns None for a blank page,
    matching ``getbbox()``'s None.
    """
    # 255 - x is non-zero except at x == 255, and x < threshold already excludes
    # that case for threshold <= 255 — so the non-zero mask is simply x < threshold.
    # (measured: compare+bool-any beats min(axis=2)<t 2x — numpy's uint8
    # reduce over the short last axis is slower than the bool temp)
    mask = (img < white_threshold).any(axis=2)
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    if rows.size == 0:
        return None
    return int(cols[0]), int(rows[0]), int(cols[-1]) + 1, int(rows[-1]) + 1


def optimize_page(
    image_bytes: bytes, width: int, height: int, white_threshold: int = 250
) -> tuple[bytes, int, int]:
    """Crop a page to its content bbox (reference: pdf_handler.py:27-41).

    Input and output are raw RGB bytes; returns (cropped_bytes, w, h). A blank
    page passes through uncropped, matching the reference's ``if bbox:`` guard.
    """
    img = rgb_view(image_bytes, width, height)
    box = content_bbox(img, white_threshold)
    if box is None:
        return image_bytes, width, height
    x1, y1, x2, y2 = box
    cropped = np.ascontiguousarray(img[y1:y2, x1:x2])
    return cropped.tobytes(), x2 - x1, y2 - y1


def estimate_image_tokens(width: int, height: int, patch: int = 28) -> int:
    """ViT-patch token estimate ``(w//28)*(h//28)`` (reference: processing.py:100-102)."""
    return (width // patch) * (height // patch)


def downscale_dims(width: int, height: int, num: int = 100, den: int = 130) -> tuple[int, int]:
    """Transmission downscale target dims, 130->100 DPI (reference: processing.py:81-87)."""
    return int(width * num / den), int(height * num / den)


def validate_bbox(bbox: Bbox) -> None:
    """Raise ValueError unless ``0 <= x1 < x2 <= 1000 and 0 <= y1 < y2 <= 1000``
    (reference: pdf_handler.py:107-110 — violations are FATAL per figure)."""
    x1, y1, x2, y2 = bbox
    if not (0 <= x1 < x2 <= 1000 and 0 <= y1 < y2 <= 1000):
        raise ValueError(
            f"Invalid normalized bbox {bbox}. Must satisfy: "
            "0 <= x1 < x2 <= 1000 and 0 <= y1 < y2 <= 1000"
        )


def denormalize_bbox(bbox: Bbox, width: int, height: int) -> Bbox:
    """Normalized 0-1000 coords -> pixel coords, truncating like ``int()``
    (reference: pdf_handler.py:86-91)."""
    x1, y1, x2, y2 = bbox
    return (
        int(x1 * width / 1000),
        int(y1 * height / 1000),
        int(x2 * width / 1000),
        int(y2 * height / 1000),
    )


def area_fraction(bbox: Bbox) -> float:
    """Normalized bbox area as a fraction of the page (reference: document_job.py:203-205)."""
    x1, y1, x2, y2 = bbox
    return (x2 - x1) * (y2 - y1) / 1_000_000


def area_filter_mask(
    x1: np.ndarray, y1: np.ndarray, x2: np.ndarray, y2: np.ndarray,
    min_fraction: float = 0.05, max_fraction: float = 0.85,
) -> np.ndarray:
    """Vectorized keep-mask for the figure area filter (reference:
    document_job.py:202-227): keep ``min <= area_fraction <= max``. Skips are
    non-fatal (dropped rows, not errors)."""
    frac = (x2 - x1).astype(np.float64) * (y2 - y1).astype(np.float64) / 1_000_000
    return (frac >= min_fraction) & (frac <= max_fraction)


def crop_figure(
    image_bytes: bytes, width: int, height: int, bbox: Bbox
) -> tuple[bytes, int, int]:
    """Validate + denormalize a 0-1000 bbox and crop the raw-RGB page
    (reference: pdf_handler.py:78-113). Returns (crop_bytes, w, h).

    Matches PIL ``crop`` semantics for in-range boxes; the reference never
    produces out-of-range pixel boxes because validation bounds them.
    """
    validate_bbox(bbox)
    px1, py1, px2, py2 = denormalize_bbox(bbox, width, height)
    img = rgb_view(image_bytes, width, height)
    cropped = np.ascontiguousarray(img[py1:py2, px1:px2])
    return cropped.tobytes(), px2 - px1, py2 - py1
