"""Payload routing: classify each page row by its ``html`` binary payload.

The analogue of the reference's implicit input branching (it only ever saw
PDFs; the CC-style corpus carries mixed payloads — SURVEY.md §3 target
lifecycle "route (HTML / PDF-binary / hard-page)").

Kinds:
  html     valid UTF-8 markup -> DOM extraction branch
  pages    RAWPAGES1 multi-page raw-RGB container -> rasterized-page branch
  pdf      %PDF payload -> stubbed (no poppler in the sandbox; plumbing only)
  empty    zero-length payload
  invalid  undecodable bytes
"""

from __future__ import annotations

import pyarrow as pa

from qwen_ocr_ray.sources.pagepack import MAGIC, PDF_MAGIC

KINDS = ("html", "pages", "pdf", "empty", "invalid")


def classify_payload(payload: bytes | None) -> str:
    if not payload:
        return "empty"
    if payload.startswith(MAGIC):
        return "pages"
    if payload.startswith(PDF_MAGIC):
        return "pdf"
    try:
        payload.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return "invalid"
    return "html"


def add_kind_column(batch: pa.Table) -> pa.Table:
    """Per-batch routing. The prefix probe + strict-decode validation are
    C-speed per row; the loop is over ~binary_batch_size rows only."""
    kinds = pa.array(
        [classify_payload(v) for v in batch["html"].to_pylist()], pa.string()
    )
    return batch.append_column("kind", kinds)


def keep_kind(batch: pa.Table, kind: str) -> pa.Table:
    import pyarrow.compute as pc

    return batch.filter(pc.equal(batch["kind"], kind))
