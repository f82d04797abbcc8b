"""PDF text-layer extraction (functions/pdf_text.py, stages extract_pdf_batch).

Reference capability: page count (pdf_handler.py:17-24) + per-page content
(pdf_handler.py:44-75, rasterization path). Sandbox extracts the embedded
text layer instead; image-only PDFs yield an explicit rasterization-stub
error row.
"""

import pyarrow as pa
import pytest

from qwen_ocr_ray.functions.pdf_text import (
    build_simple_pdf,
    extract_pdf_text,
    pdf_page_count,
    sanitize_pdf_text,
)


class TestRoundTrip:
    def test_multi_page_round_trip(self):
        pages = [
            ["first line", "second (with) parens", "back\\slash"],
            ["page two only line"],
            ["third page a", "third page b"],
        ]
        data = build_simple_pdf(pages)
        assert data.startswith(b"%PDF-1.4")
        assert pdf_page_count(data) == 3
        texts = extract_pdf_text(data)
        assert texts == ["\n".join(p) for p in pages]

    def test_latin1_sanitize(self):
        s = sanitize_pdf_text("café — résumé 中文")
        data = build_simple_pdf([[s]])
        assert extract_pdf_text(data) == [s]
        assert "?" in s  # non-latin1 chars replaced deterministically

    def test_empty_page(self):
        data = build_simple_pdf([[]])
        assert pdf_page_count(data) == 1
        assert extract_pdf_text(data) == [""]


class TestParserRobustness:
    def test_uncompressed_stream_and_tj_array(self):
        # hand-built single page: raw (uncompressed) stream with a TJ array
        content = b"BT /F1 11 Tf 72 720 Td [(Hel) -20 (lo)] TJ T* (world) Tj ET"
        body = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"
            b"2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n"
            b"3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n"
            b"4 0 obj << /Length " + str(len(content)).encode() + b" >>\n"
            b"stream\n" + content + b"\nendstream endobj\n"
            b"trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n"
        )
        assert pdf_page_count(body) == 1
        assert extract_pdf_text(body) == ["Hello\nworld"]

    def test_octal_escape(self):
        content = b"BT (\\101\\102\\103) Tj ET"
        body = (
            b"%PDF-1.4\n"
            b"1 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj\n"
            b"2 0 obj << /Type /Page /Contents 3 0 R >> endobj\n"
            b"3 0 obj << /Length 20 >>\nstream\n" + content + b"\nendstream endobj\n"
        )
        assert extract_pdf_text(body) == ["ABC"]

    def test_not_a_pdf(self):
        with pytest.raises(ValueError):
            extract_pdf_text(b"plain text, no header")
        with pytest.raises(ValueError):
            extract_pdf_text(b"%PDF-1.4\nno objects here")


class TestExtractPdfBatch:
    def _batch(self, payloads: list[bytes]) -> pa.Table:
        import datetime as dt

        n = len(payloads)
        return pa.table(
            {
                "url": pa.array([f"https://x.org/{i}" for i in range(n)], pa.string()),
                "warc_ts": pa.array([dt.datetime(2025, 1, 1)] * n, pa.timestamp("us")),
                "lang": pa.array(["en"] * n, pa.string()),
                "kind": pa.array(["pdf"] * n, pa.string()),
                "html": pa.array(payloads, pa.binary()),
            }
        )

    def test_text_pdf_extracts_image_pdf_errors(self):
        from qwen_ocr_ray.stages.extract_html import extract_pdf_batch

        good = build_simple_pdf([["hello pdf"], ["page 2"]])
        no_text = build_simple_pdf([[]])
        broken = b"%PDF-1.4 garbage with no structure"
        out = extract_pdf_batch(self._batch([good, no_text, broken])).to_pandas()
        assert out.text.tolist()[0] == "hello pdf\n\npage 2"
        assert out.error.tolist()[0] is None
        assert out.n_pages.tolist()[0] == 2
        assert "rasterization is stubbed" in out.error.tolist()[1]
        assert out.text.tolist()[1] == ""
        assert out.error.tolist()[2].startswith("ValueError")
