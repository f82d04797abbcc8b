"""Payload/message assembly byte-exactness (M3/M4) + page-range clamp (O2)."""

import base64

import numpy as np
import pyarrow as pa

from qwen_ocr_ray.functions.payload import area_mean_resize, build_image_content, build_messages


def _page(w, h, fill=128):
    return np.full((h, w, 3), fill, dtype=np.uint8)


class TestAreaMeanResize:
    def test_uniform_stays_uniform(self):
        out = area_mean_resize(_page(130, 130, 77), 100, 100)
        assert out.shape == (100, 100, 3)
        assert (out == 77).all()

    def test_averages_blocks(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        img[:2] = 100
        out = area_mean_resize(img, 2, 2)
        assert (out[0] == 100).all() and (out[1] == 0).all()

    def test_deterministic(self):
        img = (np.arange(60 * 90 * 3, dtype=np.int64) % 251).astype(np.uint8).reshape(90, 60, 3)
        a = area_mean_resize(img, 31, 47)
        assert np.array_equal(a, area_mean_resize(img, 31, 47))


class TestBuildImageContent:
    def test_labels_and_tokens(self):
        raw = _page(130, 130).tobytes()
        content, tokens = build_image_content([(5, raw, 130, 130)], downscale=True)
        # downscale 130->100: tokens = (100//28)*(100//28) = 9
        assert tokens == 9
        assert content[0] == {"type": "text", "text": "\nPage 5:\n"}
        assert content[1]["type"] == "image_url"
        url = content[1]["image_url"]["url"]
        assert url.startswith("data:image/x-raw-rgb;w=100;h=100;base64,")
        decoded = base64.b64decode(url.split("base64,", 1)[1])
        assert len(decoded) == 100 * 100 * 3

    def test_no_downscale(self):
        raw = _page(56, 28).tobytes()
        content, tokens = build_image_content([(1, raw, 56, 28)], downscale=False)
        assert tokens == (56 // 28) * (28 // 28)
        assert base64.b64decode(
            content[1]["image_url"]["url"].split("base64,", 1)[1]
        ) == raw


class TestBuildMessages:
    def test_structure_and_literals(self):
        msgs = build_messages("SYS", "", [{"type": "text", "text": "x"}], 3)
        assert msgs[0] == {"role": "system", "content": "SYS"}
        user = msgs[1]["content"]
        assert user[0]["text"] == (
            "## PRECEDING CONTEXT (Read-Only, use for flow continuity):\n[Start of Document]"
        )
        assert user[1]["text"] == "\n\n## NEW IMAGES TO TRANSCRIBE (3 pages):"
        assert user[2] == {"type": "text", "text": "x"}

    def test_context_passthrough(self):
        msgs = build_messages("S", "### DOCUMENT LOCATION BREADCRUMB\n# A", [], 1)
        assert msgs[1]["content"][0]["text"].endswith("BREADCRUMB\n# A")


class TestPageRangeClamp:
    def test_explode_respects_range(self):
        from dataclasses import replace

        from qwen_ocr_ray.config import DEFAULT_CONFIG
        from qwen_ocr_ray.sources.pagepack import pack_pages
        from qwen_ocr_ray.stages.pages_branch import explode_pages
        import datetime as dt

        pages = [(8, 6, bytes(8 * 6 * 3)) for _ in range(12)]
        batch = pa.table(
            {
                "url": ["u"],
                "warc_ts": pa.array([dt.datetime(2025, 1, 1)], pa.timestamp("us")),
                "lang": ["en"],
                "html": [pack_pages(pages)],
            }
        )
        cfg = replace(DEFAULT_CONFIG, start_page=3)
        out = explode_pages(batch, cfg, end_page=7)
        assert out["page_num"].to_pylist() == [3, 4, 5, 6, 7]
