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
