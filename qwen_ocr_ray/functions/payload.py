"""Inference payload assembly: downscale, base64 data-URIs, chat messages.

Byte-exact analogues of the reference's API-edge builders:
  - transmission downscale 130->100 DPI   /root/reference/src/processing.py:81-97
  - base64 data-uri + page labels        /root/reference/src/processing.py:99-124
  - 2-message chat payload               /root/reference/src/processing.py:127-154

PIL's LANCZOS is unavailable (no PIL in the container); the downscale uses a
deterministic area-mean kernel over raw RGB instead. The *geometry* (target
dims via int(width*100/130)) and the token arithmetic match the reference
exactly; the resample kernel is a documented substitution at the stubbed
media edge.
"""

from __future__ import annotations

import base64

import numpy as np

from qwen_ocr_ray.config import (
    NEW_IMAGES_HEADER_PREFIX,
    PAGE_LABEL_PREFIX,
    PAGE_LABEL_SUFFIX,
    PRECEDING_CONTEXT_HEADER,
    START_OF_DOCUMENT_PLACEHOLDER,
)
from qwen_ocr_ray.functions.geometry import downscale_dims, estimate_image_tokens, rgb_view


def area_mean_resize(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic box-filter downscale (H, W, 3) -> (new_h, new_w, 3)."""
    h, w, _ = img.shape
    ys = (np.arange(new_h + 1) * h) // new_h
    xs = (np.arange(new_w + 1) * w) // new_w
    out = np.empty((new_h, new_w, 3), dtype=np.uint8)
    csum = np.cumsum(np.cumsum(img.astype(np.int64), axis=0), axis=1)
    padded = np.zeros((h + 1, w + 1, 3), dtype=np.int64)
    padded[1:, 1:] = csum
    y0, y1 = ys[:-1], ys[1:]
    x0, x1 = xs[:-1], xs[1:]
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    for c in range(3):
        p = padded[:, :, c]
        s = p[y1][:, x1] - p[y0][:, x1] - p[y1][:, x0] + p[y0][:, x0]
        out[:, :, c] = s // area
    return out


def build_image_content(
    pages: list[tuple[int, bytes, int, int]], downscale: bool = True
) -> tuple[list[dict], int]:
    """pages: (page_num, raw_rgb, width, height) -> (content list, input tokens).

    Mirrors processing.py:69-124: optional 100/130 downscale, token estimate
    on the POST-downscale dims, a text label then an image_url element per
    page. Data-URI media type documents the raw-RGB payload."""
    content: list[dict] = []
    total_tokens = 0
    for page_num, raw, width, height in pages:
        payload = raw
        if downscale:
            new_w, new_h = downscale_dims(width, height)
            if new_w > 0 and new_h > 0:
                payload = area_mean_resize(rgb_view(raw, width, height), new_w, new_h).tobytes()
                width, height = new_w, new_h
        total_tokens += estimate_image_tokens(width, height)
        b64 = base64.b64encode(payload).decode("utf-8")
        content.append(
            {"type": "text", "text": f"{PAGE_LABEL_PREFIX}{page_num}{PAGE_LABEL_SUFFIX}"}
        )
        content.append(
            {
                "type": "image_url",
                "image_url": {"url": f"data:image/x-raw-rgb;w={width};h={height};base64,{b64}"},
            }
        )
    return content, total_tokens


def build_messages(
    system_prompt: str, context: str, image_content: list[dict], num_images: int
) -> list[dict]:
    """2-message chat payload, literals matching processing.py:127-154."""
    return [
        {"role": "system", "content": system_prompt},
        {
            "role": "user",
            "content": [
                {
                    "type": "text",
                    "text": PRECEDING_CONTEXT_HEADER
                    + "\n"
                    + (context if context else START_OF_DOCUMENT_PLACEHOLDER),
                },
                {"type": "text", "text": NEW_IMAGES_HEADER_PREFIX + f"{num_images} pages):"},
                *image_content,
            ],
        },
    ]
