"""Deterministic Common-Crawl-style pages table generator (FIXTURES.md §1).

Builds the authoritative input shape from BASELINE.json `input_hint`:
    (url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)
derived row-for-row from the driver's ``documents.parquet`` (seed folded with
doc_id — order-independent, no wall clock), together with a **golden table**
``(url, kind, text)`` holding the expected byte-identical extracted markdown
per url. The golden is computed from the article *plan*, independently of the
HTML parser, so extractor bugs cannot cancel out.

Row mix (FIXTURES.md §1): ~86% HTML with boilerplate wrapping a planned
article; ~4% text-bearing PDFs (Flate streams, Tj text ops — the reference's
core input format); ~8% RAWPAGES1 multi-page binary payloads (the
rasterized-page analogue); ~1% empty; ~1% invalid bytes. ~30% of rows land
on one hot domain (skew), and ~2% are exact-duplicate urls with a later
warc_ts (dedup fodder; first fetch wins).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
from html import escape

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from qwen_ocr_ray.functions.geometry import optimize_page
from qwen_ocr_ray.functions.stub_vlm import stub_transcribe_document
from qwen_ocr_ray.sources.pagepack import pack_pages

SEED = 42
# bump when generator output changes: versions the /tmp cache directories
GEN_VERSION = 3
BASE_TS = _dt.datetime(2025, 1, 1)
HOT_DOMAIN = "hot.example.com"
N_COLD_DOMAINS = 49


def _mix(*parts: int) -> int:
    """Deterministic 64-bit mix of integers (splitmix-style via blake2b)."""
    h = hashlib.blake2b(b",".join(str(p).encode() for p in parts), digest_size=8)
    return int.from_bytes(h.digest(), "little")


def _words(text: str) -> list[str]:
    return text.split()


# --- article plan -> (html, markdown) ----------------------------------------

def _plan_article(doc_id: int, text: str) -> list[tuple[str, object]]:
    """Deterministic block plan: list of (block_type, payload)."""
    w = _words(text) or ["empty"]
    r = _mix(SEED, doc_id, 1)
    title = " ".join(w[:4]) or "untitled"
    blocks: list[tuple[str, object]] = [("h1", f"Document {doc_id}: {title}")]
    n_paras = 2 + r % 4
    chunk = max(5, len(w) // max(1, n_paras))
    for i in range(n_paras):
        para = " ".join(w[i * chunk : (i + 1) * chunk]) or f"filler paragraph {i}"
        if i == 1:
            blocks.append(("h2", f"Section {i} {w[(r + i) % len(w)]}"))
        if i == 2 and r % 3 == 0:
            blocks.append(("h3", f"Subsection {w[(r + 7) % len(w)]}"))
        if i == n_paras - 1 and r % 2 == 0:
            para += f" with inline math $x_{{{doc_id % 9}}} = {doc_id % 97}$ applied"
        blocks.append(("p", para))
    blocks.append(("ul", [f"item {w[(r + k) % len(w)]} {k}" for k in range(3)]))
    if r % 2 == 1:
        blocks.append(
            ("table", [["metric", "value"], [w[r % len(w)], str(r % 1000)], [w[(r + 3) % len(w)], str(r % 77)]])
        )
    return blocks


def _render_markdown(blocks: list[tuple[str, object]]) -> str:
    out: list[str] = []
    for kind, payload in blocks:
        if kind in ("h1", "h2", "h3"):
            out.append("#" * int(kind[1]) + " " + payload)
        elif kind == "p":
            out.append(payload)  # already whitespace-normalized
        elif kind == "ul":
            out.append("\n".join("- " + item for item in payload))
        elif kind == "table":
            rows = ["<tr>" + "".join(f"<th>{escape(c)}</th>" for c in payload[0]) + "</tr>"]
            rows += ["<tr>" + "".join(f"<td>{escape(c)}</td>" for c in row) + "</tr>" for row in payload[1:]]
            out.append("<table>\n" + "\n".join(rows) + "\n</table>")
    return "\n\n".join(out)


def _render_html(blocks: list[tuple[str, object]], doc_id: int, lang: str) -> str:
    r = _mix(SEED, doc_id, 2)
    body: list[str] = []
    for kind, payload in blocks:
        if kind in ("h1", "h2", "h3"):
            body.append(f"<{kind}>{escape(payload)}</{kind}>")
        elif kind == "p":
            # Inject raw newlines/tabs that must collapse to single spaces.
            words = payload.split(" ")
            k = 1 + r % 5
            noisy = " ".join(words[:k]) + ("\n   " if words[k:] else "") + " ".join(words[k:])
            body.append(f"<p>{escape(noisy)}</p>")
        elif kind == "ul":
            body.append("<ul>" + "".join(f"<li>{escape(i)}</li>" for i in payload) + "</ul>")
        elif kind == "table":
            rows = ["<tr>" + "".join(f"<th>{escape(c)}</th>" for c in payload[0]) + "</tr>"]
            rows += ["<tr>" + "".join(f"<td>{escape(c)}</td>" for c in row) + "</tr>" for row in payload[1:]]
            body.append("<table>" + "".join(rows) + "</table>")
    nav = "<nav>" + " ".join(f'<a href="/s{k}">Sec{k}</a>' for k in range(6)) + "</nav>"
    side = '<div class="sidebar promo">' + "".join(f'<a href="/r{k}">rel {k}</a>' for k in range(8)) + "</div>"
    ad = '<div id="ad-banner"><p>Buy widget brand now great deal</p></div>'
    footer = '<footer><p>copyright example corp</p><a href="/privacy">privacy</a></footer>'
    return (
        f'<!DOCTYPE html><html lang="{lang}"><head><title>doc {doc_id}</title>'
        "<script>window.track&&window.track(1);</script><style>.x{color:#333}</style></head>"
        f'<body><header class="site-header"><h1>Example Site</h1></header>{nav}{side}{ad}'
        f"<article>{''.join(body)}</article>{footer}</body></html>"
    )


# --- binary (RAWPAGES1) payloads ---------------------------------------------

def _render_pagepack(doc_id: int) -> tuple[bytes, list[tuple[int, bytes]]]:
    """A multi-page raw-RGB payload with deterministic content blocks.

    Page size 112x140 keeps the binary row a few tens of KB; content is a
    black block whose position is a pure function of (doc_id, page_num), so
    optimize_page's crop and the stub transcription are reproducible.
    """
    r = _mix(SEED, doc_id, 3)
    n_pages = 3 + r % 22  # spans multiple 10-page batches often enough
    pages = []
    plain = []
    for p in range(1, n_pages + 1):
        rp = _mix(SEED, doc_id, 3, p)
        w, h = 112, 140
        img = np.full((h, w, 3), 255, dtype=np.uint8)
        x1, y1 = 5 + rp % 40, 5 + (rp >> 8) % 50
        x2, y2 = x1 + 30 + (rp >> 16) % 30, y1 + 40 + (rp >> 24) % 30
        img[y1:y2, x1:x2] = (rp % 200, (rp >> 8) % 200, (rp >> 16) % 200)
        raw = img.tobytes()
        pages.append((w, h, raw))
        # The expected transcription sees the OPTIMIZED page, matching the
        # reference order rasterize -> optimize -> transcribe
        # (pdf_handler.py:44-75 then document_job.py:302-362).
        cropped, _, _ = optimize_page(raw, w, h)
        plain.append((p, cropped))
    return pack_pages(pages), plain


# --- PDF payloads --------------------------------------------------------------

def _render_pdf(doc_id: int, text: str) -> tuple[bytes, str]:
    """A text-bearing PDF built from the document words, plus its expected
    extracted text (computed from the line plan, independently of the PDF
    parser, so extractor bugs cannot cancel out)."""
    from qwen_ocr_ray.functions.pdf_text import build_simple_pdf, sanitize_pdf_text

    words = _words(text) or ["empty"]
    r = _mix(SEED, doc_id, 4)
    per_line = 6 + r % 5
    per_page = 8 + (r >> 8) % 8
    lines = [
        sanitize_pdf_text(" ".join(words[i : i + per_line]))
        for i in range(0, len(words), per_line)
    ]
    pages = [lines[i : i + per_page] for i in range(0, len(lines), per_page)]
    payload = build_simple_pdf(pages)
    expected = "\n\n".join("\n".join(p) for p in pages)
    return payload, expected


# --- table assembly -----------------------------------------------------------

def generate_pages_table(
    doc_table: pa.Table, dup_rate: float | None = None
) -> tuple[pa.Table, pa.Table]:
    """documents rows -> (pages table, golden table). Pure per-row function of
    (doc_id, text, lang); duplicate rows reference the previous doc's url.

    ``dup_rate=None`` (default) keeps the legacy ~2% stale-refetch planting
    (``r % 50 == 7`` — byte-identical to every cached fixture). A float sets
    the contested-url fraction explicitly — the high-dup stress fixture
    (>=30%) that breaks the broadcast-dedup assumption on purpose, for
    exercising ``dedup_strategy="exchange"``."""
    urls: list[str] = []
    ts: list[_dt.datetime] = []
    htmls: list[bytes] = []
    raw_texts: list[str] = []
    langs: list[str] = []
    g_urls: list[str] = []
    g_kinds: list[str] = []
    g_texts: list[str] = []

    doc_ids = doc_table["doc_id"].to_pylist()
    texts = doc_table["text"].to_pylist()
    doc_langs = doc_table["lang"].to_pylist()

    def url_for(doc_id: int) -> str:
        rd = _mix(SEED, doc_id, 0)
        if rd % 100 < 30:
            domain = HOT_DOMAIN
        else:
            domain = f"d{rd % N_COLD_DOMAINS:02d}.example.org"
        return f"https://{domain}/articles/{doc_id}"

    for doc_id, text, lang in zip(doc_ids, texts, doc_langs):
        r = _mix(SEED, doc_id)
        url = url_for(doc_id)
        warc_ts = BASE_TS + _dt.timedelta(seconds=(doc_id * 137) % 31_536_000)
        kind_roll = r % 100
        if kind_roll < 86:
            blocks = _plan_article(doc_id, text)
            payload = _render_html(blocks, doc_id, lang).encode()
            expected = _render_markdown(blocks)
            kind = "html"
        elif kind_roll < 90:
            payload, expected = _render_pdf(doc_id, text)
            kind = "pdf"
        elif kind_roll < 98:
            payload, plain_pages = _render_pagepack(doc_id)
            expected, _ = stub_transcribe_document(plain_pages)
            kind = "pages"
        elif kind_roll < 99:
            payload, expected, kind = b"", "", "empty"
        else:
            payload, expected, kind = bytes([0xFF, 0xFE, 0x00, 0x9C] * 8), "", "invalid"

        urls.append(url)
        ts.append(warc_ts)
        htmls.append(payload)
        raw_texts.append(" ".join(_words(text)))  # distractor column
        langs.append(lang)
        g_urls.append(url)
        g_kinds.append(kind)
        g_texts.append(expected)

        # exact-duplicate url with a LATER fetch and different payload;
        # dedup (first fetch wins) must keep the row above. Default ~2%.
        plant_dup = (
            (r % 50 == 7) if dup_rate is None else (r % 1000) < int(dup_rate * 1000)
        )
        if plant_dup:
            urls.append(url)
            ts.append(warc_ts + _dt.timedelta(days=30))
            htmls.append(b"<html><body><article><p>stale refetch duplicate</p></article></body></html>")
            raw_texts.append("stale refetch duplicate")
            langs.append(lang)

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(raw_texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    golden = pa.table(
        {
            "url": pa.array(g_urls, pa.string()),
            "kind": pa.array(g_kinds, pa.string()),
            "text": pa.array(g_texts, pa.string()),
        }
    )
    return pages, golden


def ensure_pages_dataset(
    sf_dir: str, cache_root: str = "/tmp/qor_pages", replicate: int = 1,
    dup_rate: float | None = None,
) -> tuple[str, str]:
    """Generate-and-cache pages.parquet + golden.parquet for an sf dir.

    Returns (pages_path, golden_path). Cache key = sf dir name (+ replication
    factor); files are written atomically (tmp + rename) so concurrent
    callers are safe. ``replicate=K`` derives K deterministic variants per
    document (distinct doc_ids -> distinct urls/content) — used by the
    scaling benchmark to build a compute-dominated input from small testdata.
    """
    import os

    tag = os.path.basename(os.path.normpath(sf_dir)) + f"_v{GEN_VERSION}"
    if replicate > 1:
        tag = f"{tag}_x{replicate}"
    if dup_rate is not None:
        tag = f"{tag}_dup{int(dup_rate * 1000)}"
    out_dir = os.path.join(cache_root, tag)
    pages_path = os.path.join(out_dir, "pages.parquet")
    golden_path = os.path.join(out_dir, "golden.parquet")
    if os.path.exists(pages_path) and os.path.exists(golden_path):
        return pages_path, golden_path
    os.makedirs(out_dir, exist_ok=True)
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    if replicate > 1:
        ids = docs["doc_id"].to_pylist()
        texts = docs["text"].to_pylist()
        langs = docs["lang"].to_pylist()
        rep_ids, rep_texts, rep_langs = [], [], []
        for k in range(replicate):
            off = k * 10_000_000
            rep_ids.extend(i + off for i in ids)
            # rotate words so replicas are distinct documents, not exact dups
            rep_texts.extend(
                " ".join(t.split()[k % max(1, len(t.split())):] + t.split()[: k % max(1, len(t.split()))])
                for t in texts
            )
            rep_langs.extend(langs)
        docs = pa.table(
            {
                "doc_id": pa.array(rep_ids, pa.int64()),
                "text": pa.array(rep_texts, pa.string()),
                "lang": pa.array(rep_langs, pa.string()),
            }
        )
    pages, golden = generate_pages_table(docs, dup_rate=dup_rate)
    for path, table in ((pages_path, pages), (golden_path, golden)):
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(table, tmp, row_group_size=1024)
        os.replace(tmp, path)
    return pages_path, golden_path
