"""Deterministic stub inference backend (FIXTURES.md §4).

The reference's VLM calls (``/root/reference/src/models/document_job.py:65-161``
text; ``:163-273`` figures) are replaced in tests/bench by pure functions of
row content: stable across processes, retries and resume, so the distributed
fold can be verified byte-identically against a local reference computation.
A live OpenAI-compatible backend plugs in at the same seam (stages/inference.py).
"""

from __future__ import annotations

import hashlib

from qwen_ocr_ray.functions.markdown import batch_num_for_page, fold_document


def page_digest(image_bytes: bytes) -> str:
    return hashlib.md5(image_bytes).hexdigest()


def stub_page_markdown(page_num: int, image_bytes: bytes) -> str:
    """Markdown 'transcription' of one page: pure function of (page_num, bytes).

    Emits a header whose level cycles 1-3 with page number so the header-stack
    fold (processing.py:45-66 semantics) is exercised across batch boundaries.
    """
    h = page_digest(image_bytes)
    level = (page_num - 1) % 3 + 1
    return (
        f"{'#' * level} Page {page_num} {h[:8]}\n\n"
        f"Body {h[8:16]} of page {page_num}.\n"
    )


def stub_figures(page_num: int, image_bytes: bytes) -> list[dict]:
    """Deterministic figure metadata for ~1 page in 5 (FIXTURES.md §4).

    Bboxes are derived from the digest; one in ~8 emitted bboxes is
    deliberately tiny (<5% area) to exercise the non-fatal area filter
    (document_job.py:202-227).
    """
    h = page_digest(image_bytes)
    v = int(h[:8], 16)
    if v % 5 != 0:
        return []
    x1 = 50 + v % 400
    y1 = 50 + (v >> 8) % 400
    if v % 8 == 0:  # too-small figure: area < 0.05
        x2, y2 = x1 + 100, y1 + 100
    else:
        x2, y2 = x1 + 450, y1 + 350
    return [
        {
            "page_number": page_num,
            "fig_number": 1,
            "x1": x1, "y1": y1, "x2": min(x2, 1000), "y2": min(y2, 1000),
            "caption": f"Figure 1: synthetic {h[:6]}",
            "element_type": "chart",
        }
    ]


def stub_transcribe_document(
    pages: list[tuple[int, bytes]], batch_size: int = 10, start_page: int = 1
) -> tuple[str, str]:
    """Local (non-distributed) reference computation of a whole document:
    per-page stub markdown -> per-batch chunks -> ordered fold. Returns
    ``(assembled_markdown, final_breadcrumb)``. Tests compare the Ray pipeline
    against this byte-for-byte."""
    from qwen_ocr_ray.functions.markdown import build_context

    chunks: dict[int, list[tuple[int, str]]] = {}
    for page_num, image_bytes in pages:
        bn = batch_num_for_page(page_num, start_page, batch_size)
        chunks.setdefault(bn, []).append((page_num, stub_page_markdown(page_num, image_bytes)))
    batches = [
        (bn, "".join(md for _, md in sorted(members)))
        for bn, members in chunks.items()
    ]
    text, stack, _ = fold_document(batches)
    return text, build_context(stack)
