"""Rasterized-page branch: explode -> optimize -> transcribe -> per-doc fold.

The Ray-Data re-expression of the reference's document loop
(``/root/reference/src/models/document_job.py:275-412``):

  explode    one doc row -> N page rows (flat-map-shaped map_batches; the
             analogue of pages_to_images, pdf_handler.py:44-75) with a
             deterministic ``batch_num`` column (document_job.py:53-63)
  optimize   white-threshold content crop per page (pdf_handler.py:27-41)
  transcribe stub-VLM actor pool emits per-page markdown (document_job.py:65-161)
  fold       hash-bucketed groupby on url; within a bucket, per-document
             ordered fold of batch chunks + header stack (document_job.py:321-389)

Parallelism is across documents and pages; the fold is the ONE sequential
per-document step (SURVEY.md §2.9 W2) and never crosses documents.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from qwen_ocr_ray.config import EngineConfig, DEFAULT_CONFIG
from qwen_ocr_ray.functions.geometry import estimate_image_tokens, optimize_page
from qwen_ocr_ray.functions.markdown import batch_num_for_page, build_context, fold_document
from qwen_ocr_ray.sources.pagepack import unpack_pages
from qwen_ocr_ray.stages.bucketing import add_bucket_column, pick_num_buckets

PAGE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("page_num", pa.int32()),
        ("batch_num", pa.int32()),
        ("image", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


def explode_pages(
    batch: pa.Table,
    cfg: EngineConfig = DEFAULT_CONFIG,
    end_page: int | None = None,
) -> pa.Table:
    """Doc rows (kind == 'pages') -> page rows. Returns a LARGER table —
    the map_batches explode idiom (SURVEY.md §2.1 S2).

    ``cfg.start_page`` / ``end_page`` clamp the page range like the
    reference's start/end handling (document_job.py:60-62,
    pdf_handler.py:50-55): pages outside [start_page, end_page] never leave
    the explode, so downstream stages do no work for them (O2)."""
    cols: dict[str, list] = {name: [] for name in PAGE_SCHEMA.names}
    for row_idx in range(batch.num_rows):
        payload = batch["html"][row_idx].as_py()
        url = batch["url"][row_idx].as_py()
        ts = batch["warc_ts"][row_idx].as_py()
        lang = batch["lang"][row_idx].as_py()
        for page_idx, (w, h, raw) in enumerate(unpack_pages(payload)):
            page_num = 1 + page_idx
            if page_num < cfg.start_page or (end_page is not None and page_num > end_page):
                continue
            cols["url"].append(url)
            cols["warc_ts"].append(ts)
            cols["lang"].append(lang)
            cols["page_num"].append(page_num)
            cols["batch_num"].append(
                batch_num_for_page(page_num, cfg.start_page, cfg.pages_per_batch)
            )
            cols["image"].append(raw)
            cols["width"].append(w)
            cols["height"].append(h)
    return pa.table(cols, schema=PAGE_SCHEMA)


def optimize_pages_batch(batch: pa.Table, cfg: EngineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Content-crop every page; adds an ``input_tokens`` estimate column
    (pdf_handler.py:27-41,64)."""
    images, widths, heights, tokens = [], [], [], []
    for raw, w, h in zip(
        batch["image"].to_pylist(), batch["width"].to_pylist(), batch["height"].to_pylist()
    ):
        out, ow, oh = optimize_page(raw, w, h, cfg.white_threshold)
        images.append(out)
        widths.append(ow)
        heights.append(oh)
        tokens.append(estimate_image_tokens(ow, oh, cfg.image_token_size))
    return (
        batch.drop_columns(["image", "width", "height"])
        .append_column("image", pa.array(images, pa.binary()))
        .append_column("width", pa.array(widths, pa.int32()))
        .append_column("height", pa.array(heights, pa.int32()))
        .append_column("input_tokens", pa.array(tokens, pa.int64()))
    )


FOLD_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("n_chars", pa.int64()),
        ("error", pa.string()),
        ("n_pages", pa.int32()),
        ("final_breadcrumb", pa.string()),
        ("input_tokens", pa.int64()),
        ("output_tokens", pa.int64()),
    ]
)


def fold_documents_in_bucket(t: pa.Table) -> pa.Table:
    """One hash bucket of transcribed page rows -> one output row per url.

    Sorts the bucket once by (url, batch_num, page_num), then walks url runs;
    each run is one document's ordered fold (pure-Python by necessity — the
    header-stack carry is sequential, SURVEY.md §7 hard part 2)."""
    if t.num_rows == 0:
        return pa.table({n: [] for n in FOLD_SCHEMA.names}, schema=FOLD_SCHEMA)
    t = t.combine_chunks()
    idx = pc.sort_indices(
        t,
        sort_keys=[("url", "ascending"), ("batch_num", "ascending"), ("page_num", "ascending")],
    )
    t = t.take(idx)
    urls = t["url"].to_pylist()
    batch_nums = t["batch_num"].to_pylist()
    mds = t["md"].to_pylist()
    in_toks = t["input_tokens"].to_pylist()
    out_toks = t["output_tokens"].to_pylist()
    ts = t["warc_ts"].to_pylist()
    langs = t["lang"].to_pylist()

    out: dict[str, list] = {n: [] for n in FOLD_SCHEMA.names}
    i, n = 0, len(urls)
    while i < n:
        j = i
        while j < n and urls[j] == urls[i]:
            j += 1
        # one document: rows [i, j), already in (batch_num, page_num) order
        chunks: list[tuple[int, str]] = []
        k = i
        while k < j:
            m = k
            while m < j and batch_nums[m] == batch_nums[k]:
                m += 1
            chunks.append((batch_nums[k], "".join(mds[k:m])))
            k = m
        text, stack, _ = fold_document(chunks)
        out["url"].append(urls[i])
        out["warc_ts"].append(ts[i])
        out["lang"].append(langs[i])
        out["kind"].append("pages")
        out["text"].append(text)
        out["n_chars"].append(len(text))
        out["error"].append(None)
        out["n_pages"].append(j - i)
        out["final_breadcrumb"].append(build_context(stack))
        out["input_tokens"].append(sum(in_toks[i:j]))
        out["output_tokens"].append(sum(out_toks[i:j]))
        i = j
    return pa.table(out, schema=FOLD_SCHEMA)


def fold_documents(pages_ds, *, approx_docs: int | None = None, num_buckets: int | None = None):
    """Transcribed page rows -> one row per document (shuffle key: url)."""
    b = num_buckets or pick_num_buckets(approx_docs, rows_per_bucket=50_000)

    def bucket_stage(t: pa.Table) -> pa.Table:
        return add_bucket_column(t, "url", b)

    def fold_bucket(t: pa.Table) -> pa.Table:
        return fold_documents_in_bucket(t.drop_columns(["bucket"]))

    return (
        pages_ds.map_batches(bucket_stage, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(fold_bucket, batch_format="pyarrow")
    )
