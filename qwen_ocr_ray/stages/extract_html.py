"""HTML branch: DOM parse + boilerplate strip + markdown serialize, per batch.

Stateless ``map_batches`` kernel (regexes are module-level compiled — once
per worker process import, SURVEY.md §2.3 A3 analogue). The parser itself is
per-row Python (there is no vectorized DOM), so this is the designed
CPU-bound hot stage; everything around it stays Arrow.

Per-row failures land in the ``error`` column — extraction failure is
non-fatal per document, matching the reference's per-figure leniency
(document_job.py:229-239) generalized to rows.
"""

from __future__ import annotations

import pyarrow as pa

from qwen_ocr_ray.functions.html_extract import extract_markdown

OUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("n_chars", pa.int64()),
        ("error", pa.string()),
    ]
)


def extract_html_batch(batch: pa.Table) -> pa.Table:
    payloads = batch["html"].to_pylist()
    texts: list[str] = []
    errors: list[str | None] = []
    for raw in payloads:
        try:
            texts.append(extract_markdown(raw.decode("utf-8")))
            errors.append(None)
        except Exception as e:  # per-row, non-fatal
            texts.append("")
            errors.append(f"{type(e).__name__}: {e}")
    text_arr = pa.array(texts, pa.string())
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "kind": batch["kind"],
            "text": text_arr,
            "n_chars": pa.compute.utf8_length(text_arr).cast(pa.int64()),
            "error": pa.array(errors, pa.string()),
        },
        schema=OUT_SCHEMA,
    )


def extract_pdf_batch(batch: pa.Table) -> pa.Table:
    """kind=pdf rows -> doc rows via the embedded text layer.

    The reference rasterizes every PDF page (pdf_handler.py:44-75); without
    poppler in this sandbox, text-BEARING PDFs extract their text layer
    (functions/pdf_text.py) and image-only PDFs produce an explicit
    needs-rasterization error row. Emits the full doc schema with n_pages
    populated (reference page count capability, pdf_handler.py:17-24)."""
    from qwen_ocr_ray.functions.pdf_text import extract_pdf_text

    texts: list[str] = []
    errors: list[str | None] = []
    n_pages: list[int | None] = []
    for raw in batch["html"].to_pylist():
        try:
            pages = extract_pdf_text(raw)
            n_pages.append(len(pages))
            if any(pages):
                texts.append("\n\n".join(pages))
                errors.append(None)
            else:
                texts.append("")
                errors.append(
                    "NotImplemented: no text layer; PDF rasterization is "
                    "stubbed in this sandbox (no poppler)"
                )
        except Exception as e:  # per-row, non-fatal
            texts.append("")
            n_pages.append(None)
            errors.append(f"{type(e).__name__}: {e}")
    text_arr = pa.array(texts, pa.string())
    n = batch.num_rows
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "kind": batch["kind"],
            "text": text_arr,
            "n_chars": pa.compute.utf8_length(text_arr).cast(pa.int64()),
            "error": pa.array(errors, pa.string()),
            "n_pages": pa.array(n_pages, pa.int32()),
            "final_breadcrumb": pa.nulls(n, pa.string()),
            "input_tokens": pa.nulls(n, pa.int64()),
            "output_tokens": pa.nulls(n, pa.int64()),
        }
    )


def passthrough_batch(batch: pa.Table, error_by_kind: dict[str, str]) -> pa.Table:
    """empty/invalid/pdf rows -> empty-text output rows with an error marker.

    The pdf marker documents the sandbox stub (SURVEY.md: decode stubbed, Ray
    plumbing real).
    """
    kinds = batch["kind"].to_pylist()
    n = len(kinds)
    return pa.table(
        {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "kind": batch["kind"],
            "text": pa.array([""] * n, pa.string()),
            "n_chars": pa.array([0] * n, pa.int64()),
            "error": pa.array([error_by_kind.get(k) for k in kinds], pa.string()),
        },
        schema=OUT_SCHEMA,
    )
