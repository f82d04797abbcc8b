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


# --- rasterizer seam (VERDICT r02 #7) -----------------------------------------

def _make_fake_rasterize():
    """Deterministic test double for the poppler seam: two 112x140 pages
    whose content block position derives from the payload digest. Built as a
    CLOSURE so cloudpickle ships it by value (the test module itself is not
    importable inside Ray workers)."""

    def fake_rasterize(pdf_bytes: bytes) -> list[tuple[int, int, bytes]]:
        import hashlib

        import numpy as np

        v = int(hashlib.md5(pdf_bytes).hexdigest()[:8], 16)
        pages = []
        for p in (1, 2):
            img = np.full((140, 112, 3), 255, dtype=np.uint8)
            x, y = 10 + (v + p) % 40, 10 + (v >> 4 + p) % 50
            img[y:y + 40, x:x + 30] = (p * 60, 120, 180)
            pages.append((112, 140, img.tobytes()))
        return pages

    return fake_rasterize


class TestRasterizerSeam:
    def test_image_only_pdf_extracts_via_injected_double(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwen_ocr_ray.functions.geometry import optimize_page
        from qwen_ocr_ray.functions.pdf_text import build_simple_pdf
        from qwen_ocr_ray.functions.stub_vlm import stub_transcribe_document
        from qwen_ocr_ray.pipelines.extract import run_extraction

        img_only = build_simple_pdf([[]])  # a page with no text operators
        text_pdf = build_simple_pdf([["hello text layer world"]])
        t = pa.table(
            {
                "url": pa.array(
                    ["https://x.example/img-only", "https://x.example/texty"],
                    pa.string(),
                ),
                "warc_ts": pa.array([dt.datetime(2025, 1, 1)] * 2, pa.timestamp("us")),
                "html": pa.array([img_only, text_pdf], pa.binary()),
                "text": pa.array(["", ""], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
            }
        )
        p = str(tmp_path / "pages.parquet")
        pq.write_table(t, p)

        fake_rasterize = _make_fake_rasterize()
        out = run_extraction(
            p, approx_rows=2, checkpoint="inline", rasterize=fake_rasterize
        ).to_pandas().set_index("url")

        # expected: same local-reference fold over the optimized fake pages
        plain = []
        for i, (w, h, raw) in enumerate(fake_rasterize(img_only)):
            cropped, _, _ = optimize_page(raw, w, h)
            plain.append((i + 1, cropped))
        want, _ = stub_transcribe_document(plain)
        got = out.loc["https://x.example/img-only"]
        assert got.text == want
        assert got.kind == "pages" and got.n_pages == 2 and got.error is None
        texty = out.loc["https://x.example/texty"]
        assert texty.kind == "pdf" and texty.text == "hello text layer world"

    def test_raster_failure_is_per_row_error(self, ray_session, tmp_path):
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwen_ocr_ray.functions.pdf_text import build_simple_pdf
        from qwen_ocr_ray.pipelines.extract import run_extraction

        t = pa.table(
            {
                "url": pa.array(["https://x.example/bad"], pa.string()),
                "warc_ts": pa.array([dt.datetime(2025, 1, 1)], pa.timestamp("us")),
                "html": pa.array([build_simple_pdf([[]])], pa.binary()),
                "text": pa.array([""], pa.string()),
                "lang": pa.array(["en"], pa.string()),
            }
        )
        p = str(tmp_path / "pages.parquet")
        pq.write_table(t, p)
        def boom(pdf_bytes: bytes):
            raise ValueError("no raster backend")

        out = run_extraction(
            p, approx_rows=1, checkpoint="inline", rasterize=boom
        ).to_pandas()
        assert len(out) == 1
        assert out.error[0].startswith("rasterize failed: ValueError")
        assert out.text[0] == ""



class TestIndirectLength:
    def test_indirect_length_reference_not_treated_as_byte_count(self):
        """'/Length 5 0 R' is an indirect REFERENCE — the object number must
        not be read as a declared byte length (which silently truncated the
        stream when len(raw) - objnum landed in [0, 2])."""
        from qwen_ocr_ray.functions.pdf_text import _stream_bytes

        content = b"BT (hi) Tj ET"  # 13 bytes
        body = (
            b"<< /Length 11 0 R >>\nstream\n" + content + b"\nendstream"
        )
        # objnum 11: len(raw)=14 (trailing \n), 14-11=3 -> outside [0,2] by
        # luck; craft the bad case explicitly: objnum 12 -> 14-12=2 in range
        bad = b"<< /Length 12 0 R >>\nstream\n" + content + b"\nendstream"
        assert _stream_bytes(body) == content
        assert _stream_bytes(bad) == content

    def test_direct_length_still_disambiguates_trailing_newline(self):
        from qwen_ocr_ray.functions.pdf_text import _stream_bytes

        content = b"data ends with newline\n"
        body = (
            b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
            + content + b"endstream"
        )
        assert _stream_bytes(body) == content
