"""Unit tests for stage kernels that don't need a Ray session: routing,
pagepack codec, bucketed dedup kernel, explode/optimize, stub determinism."""

import datetime as dt

import pyarrow as pa
import pytest

from qwen_ocr_ray.functions.stub_vlm import stub_page_markdown, stub_transcribe_document
from qwen_ocr_ray.sources.pagepack import is_pagepack, pack_pages, unpack_pages
from qwen_ocr_ray.stages.dedup_url import first_per_key
from qwen_ocr_ray.stages.inference import DetectFigures, StubBackend, TranscribePages
from qwen_ocr_ray.stages.pages_branch import explode_pages, fold_documents_in_bucket, optimize_pages_batch
from qwen_ocr_ray.stages.route import classify_payload


class TestPagepack:
    def test_roundtrip(self):
        pages = [(2, 3, bytes(range(18))), (1, 1, b"\x01\x02\x03")]
        blob = pack_pages(pages)
        assert is_pagepack(blob)
        assert unpack_pages(blob) == pages

    def test_trailing_garbage_rejected(self):
        blob = pack_pages([(1, 1, b"\x00\x00\x00")]) + b"x"
        with pytest.raises(ValueError):
            unpack_pages(blob)

    def test_size_mismatch_rejected(self):
        with pytest.raises(ValueError):
            pack_pages([(2, 2, b"short")])


class TestRouting:
    def test_kinds(self):
        assert classify_payload(b"") == "empty"
        assert classify_payload(None) == "empty"
        assert classify_payload(pack_pages([(1, 1, b"\x00\x00\x00")])) == "pages"
        assert classify_payload(b"%PDF-1.7 ...") == "pdf"
        assert classify_payload("<html>ok</html>".encode()) == "html"
        assert classify_payload(b"\xff\xfe\x00\x9c") == "invalid"


class TestDedupKernel:
    def test_first_per_key_orders_by_ts(self):
        t = pa.table(
            {
                "url": ["b", "a", "b", "a"],
                "warc_ts": pa.array(
                    [dt.datetime(2025, 1, d) for d in (5, 2, 1, 9)], pa.timestamp("us")
                ),
                "html": [b"b5", b"a2", b"b1", b"a9"],
            }
        )
        out = first_per_key(t, "url", [("warc_ts", "ascending"), ("html", "ascending")])
        rows = sorted(zip(out["url"].to_pylist(), out["html"].to_pylist()))
        assert rows == [("a", b"a2"), ("b", b"b1")]

    def test_empty(self):
        t = pa.table({"url": pa.array([], pa.string()), "warc_ts": pa.array([], pa.timestamp("us")), "html": pa.array([], pa.binary())})
        assert first_per_key(t, "url", [("warc_ts", "ascending")]).num_rows == 0


def _doc_batch(n_pages=12, url="https://x/1"):
    from qwen_ocr_ray.sources.pagepack import pack_pages
    import numpy as np

    pages = []
    for p in range(n_pages):
        img = np.full((20, 30, 3), 255, dtype=np.uint8)
        img[5 : 10 + p % 5, 4:20] = p % 11
        pages.append((30, 20, img.tobytes()))
    return pa.table(
        {
            "url": [url],
            "warc_ts": pa.array([dt.datetime(2025, 1, 1)], pa.timestamp("us")),
            "lang": ["en"],
            "html": [pack_pages(pages)],
        }
    )


class TestPagesBranch:
    def test_explode_and_batch_nums(self):
        page_rows = explode_pages(_doc_batch(n_pages=25))
        assert page_rows.num_rows == 25
        assert page_rows["page_num"].to_pylist() == list(range(1, 26))
        assert page_rows["batch_num"].to_pylist() == [(p - 1) // 10 for p in range(1, 26)]

    def test_optimize_crops(self):
        page_rows = explode_pages(_doc_batch(n_pages=2))
        opt = optimize_pages_batch(page_rows)
        assert opt["width"].to_pylist() == [16, 16]
        assert all(h >= 5 for h in opt["height"].to_pylist())
        assert "input_tokens" in opt.column_names

    def test_fold_matches_local_reference(self):
        page_rows = optimize_pages_batch(explode_pages(_doc_batch(n_pages=25)))
        transcribed = TranscribePages()(page_rows).drop_columns(["image", "width", "height"])
        folded = fold_documents_in_bucket(transcribed)
        assert folded.num_rows == 1
        expected_text, expected_crumb = stub_transcribe_document(
            list(zip(page_rows["page_num"].to_pylist(), opt_bytes(page_rows)))
        )
        assert folded["text"][0].as_py() == expected_text
        assert folded["final_breadcrumb"][0].as_py() == expected_crumb
        assert folded["n_pages"][0].as_py() == 25


def opt_bytes(optimized_rows: pa.Table) -> list[bytes]:
    return optimized_rows["image"].to_pylist()


class TestStubDeterminism:
    def test_pure_function_of_content(self):
        assert stub_page_markdown(3, b"abc") == stub_page_markdown(3, b"abc")
        assert stub_page_markdown(3, b"abc") != stub_page_markdown(4, b"abc")
        assert stub_page_markdown(3, b"abc") != stub_page_markdown(3, b"abd")

    def test_header_levels_cycle(self):
        assert stub_page_markdown(1, b"x").startswith("# ")
        assert stub_page_markdown(2, b"x").startswith("## ")
        assert stub_page_markdown(3, b"x").startswith("### ")
        assert stub_page_markdown(4, b"x").startswith("# ")

    def test_figure_detector_schema_and_filterability(self):
        det = DetectFigures()
        batch = optimize_pages_batch(explode_pages(_doc_batch(n_pages=30)))
        figs = det(batch)
        assert figs.schema.equals(DetectFigures.SCHEMA)
        assert figs.num_rows > 0  # ~1 in 5 pages emits a figure
        backend = StubBackend()
        again = [
            f
            for pn, raw in zip(batch["page_num"].to_pylist(), batch["image"].to_pylist())
            for f in backend.detect_figures(pn, raw)
        ]
        assert figs.num_rows == len(again)


class TestConfigJson:
    def test_roundtrip_and_unknown_keys(self, tmp_path):
        import json
        from dataclasses import replace

        from qwen_ocr_ray.config import DEFAULT_CONFIG, load_json, save_json

        cfg = replace(DEFAULT_CONFIG, pages_per_batch=7, min_area_fraction=0.1)
        p = str(tmp_path / "cfg.json")
        save_json(cfg, p)
        assert load_json(p) == cfg
        # unknown keys ignored (reference Config.load applies only known fields)
        data = json.load(open(p))
        data["bogus_key"] = 123
        json.dump(data, open(p, "w"))
        assert load_json(p) == cfg


class TestEnvApiSettings:
    """U2: OCR_* env overrides with reference precedence (src/config.py:30-41)."""

    def test_precedence_and_defaults(self, monkeypatch):
        from qwen_ocr_ray.config import (
            DEFAULT_API_BASE_URL,
            DEFAULT_MODEL_NAME,
            api_settings,
        )

        monkeypatch.delenv("OCR_API_BASE_URL", raising=False)
        monkeypatch.delenv("OCR_MODEL_NAME", raising=False)
        monkeypatch.setenv("OCR_API_KEY", "env-key")
        s = api_settings()
        assert s == {
            "base_url": DEFAULT_API_BASE_URL,
            "model": DEFAULT_MODEL_NAME,
            "api_key": "env-key",
        }
        monkeypatch.setenv("OCR_API_BASE_URL", "https://env.example/v1/")
        monkeypatch.setenv("OCR_MODEL_NAME", "env-model")
        s = api_settings()
        assert s["base_url"] == "https://env.example/v1/"
        assert s["model"] == "env-model"
        # explicit argument beats environment
        s = api_settings(base_url="https://arg.example/v1/", model="arg-model",
                         api_key="arg-key")
        assert s == {
            "base_url": "https://arg.example/v1/",
            "model": "arg-model",
            "api_key": "arg-key",
        }

    def test_missing_key_hard_fails(self, monkeypatch):
        import pytest as _pytest

        from qwen_ocr_ray.config import api_settings

        monkeypatch.delenv("OCR_API_KEY", raising=False)
        with _pytest.raises(ValueError, match="OCR_API_KEY"):
            api_settings()
        assert api_settings(require_key=False)["api_key"] == ""


class TestFigureSchema:
    """U5: structured-output validation at the VLM boundary
    (reference api_schemas.py:10-79 semantics)."""

    def test_valid_both_shapes_normalize_flat(self):
        from qwen_ocr_ray.functions.figure_schema import validate_figures

        live_shape = {"images": [{"page_number": 3, "fig_number": 1,
                                  "bbox": [100, 250, 600, 700],
                                  "caption": "Figure 1", "element_type": "chart"}]}
        stub_shape = [{"page_number": 3, "fig_number": 1,
                       "x1": 100, "y1": 250, "x2": 600, "y2": 700,
                       "caption": "Figure 1", "element_type": "chart"}]
        a, b = validate_figures(live_shape), validate_figures(stub_shape)
        assert a == b
        assert a[0]["x2"] == 600 and "bbox" not in a[0]

    def test_malformed_bbox_rejected(self):
        import pytest as _pytest
        from pydantic import ValidationError

        from qwen_ocr_ray.functions.figure_schema import validate_figures

        bad = [
            {"page_number": 1, "fig_number": 1, "bbox": [600, 250, 100, 700]},  # x1>x2
            {"page_number": 1, "fig_number": 1, "bbox": [0, 0, 2000, 500]},     # >1000
            {"page_number": 1, "fig_number": 1, "bbox": [1, 2, 3]},             # not 4
            {"page_number": 1, "fig_number": 1, "bbox": [0, 0, 10, 10],
             "element_type": "meme"},                                           # enum
            {"page_number": 0, "fig_number": 1, "bbox": [0, 0, 10, 10]},        # page>=1
        ]
        for fig in bad:
            with _pytest.raises((ValidationError, ValueError)):
                validate_figures([fig])

    def test_empty_and_missing_images(self):
        from qwen_ocr_ray.functions.figure_schema import validate_figures

        assert validate_figures({"images": []}) == []
        assert validate_figures({}) == []


class TestIvf:
    def test_ivf_recovers_duplicate(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from qwen_ocr_ray.stages.similarity import ivf_topk, kmeans_centroids, _normalize

        rng = np.random.RandomState(5)
        base = _normalize(rng.standard_normal((60, 16)))
        vecs = np.vstack([base, base[9]])  # id 60 == id 9
        t = pa.table(
            {
                "vec_id": pa.array(list(range(61)), pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs], pa.list_(pa.float32())),
            }
        )
        cents = kmeans_centroids(vecs, k=8)
        top = ivf_topk(ray.data.from_arrow(t), base[9], k=2, centroids=cents, nprobe=2).to_pandas()
        assert {9, 60} == set(top.vec_id)


class TestPiiScrub:
    def test_counts_and_redaction(self):
        import pyarrow as pa

        from qwen_ocr_ray.functions.pii import scrub_column

        col = pa.array(
            [
                "mail a@b.co and c.d-e@f.org twice",
                "call 555-301-0042 from 10.1.0.99",
                "nothing sensitive here",
                "",
            ],
            pa.string(),
        )
        out = scrub_column(col)
        assert out["n_emails"].to_pylist() == [2, 0, 0, 0]
        assert out["n_phones"].to_pylist() == [0, 1, 0, 0]
        assert out["n_ips"].to_pylist() == [0, 1, 0, 0]
        s = out["scrubbed"].to_pylist()
        assert s[0] == "mail <EMAIL> and <EMAIL> twice"
        assert s[1] == "call <PHONE> from <IP>"
        assert s[2] == "nothing sensitive here"

    def test_ip_in_email_domain_not_double_scrubbed(self):
        import pyarrow as pa

        from qwen_ocr_ray.functions.pii import scrub_column

        # user@1.2.3.4 is not a match for the conservative email pattern
        # (numeric TLD), so the IP inside it is redacted instead
        out = scrub_column(pa.array(["u@1.2.3.4 end"], pa.string()))
        assert out["n_emails"].to_pylist() == [0]
        assert out["n_ips"].to_pylist() == [1]
        assert out["scrubbed"].to_pylist() == ["u@<IP> end"]


class TestChunkDocuments:
    def test_window_boundaries_and_empty_doc(self, ray_session):
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from qwen_ocr_ray.pipelines.queries import (
            CHUNK_LEN, CHUNK_STRIDE, ORACLE, QUERIES,
        )

        # lengths straddling every boundary: empty, < len, == len, one past
        # a stride boundary, several windows
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    ["", "x" * 100, "y" * CHUNK_LEN, "z" * (CHUNK_LEN + CHUNK_STRIDE + 1),
                     "w" * (3 * CHUNK_STRIDE + CHUNK_LEN)],
                    pa.string(),
                ),
            }
        )
        import tempfile, os
        with tempfile.TemporaryDirectory() as d:
            pq.write_table(docs, os.path.join(d, "documents.parquet"))
            got = (
                QUERIES["chunk_documents"](d)
                .to_pandas()
                .sort_values(["doc_id", "chunk_idx"])
                .reset_index(drop=True)
            )
            con = duckdb.connect()
            con.execute(
                f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
            )
            exp = (
                con.execute(ORACLE["chunk_documents"]).df()
                .sort_values(["doc_id", "chunk_idx"])
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(
            got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
        )
        n_per_doc = got.groupby("doc_id").size()
        assert n_per_doc.tolist() == [1, 1, 1, 3, 4]
        # overlap: consecutive chunks share CHUNK_LEN - CHUNK_STRIDE chars
        c4 = got[got.doc_id == 4].chunk.tolist()
        assert c4[0][CHUNK_STRIDE:] == c4[1][: CHUNK_LEN - CHUNK_STRIDE]
        # full coverage: concatenating stride prefixes + last chunk == text
        rebuilt = "".join(c[:CHUNK_STRIDE] for c in c4[:-1]) + c4[-1]
        assert rebuilt == "w" * (3 * CHUNK_STRIDE + CHUNK_LEN)


class TestRowGroupDatasourceMetadata:
    def test_multifile_split_ranges_report_correct_num_rows(self, tmp_path):
        """Regression: per-RANGE items zipped against per-FILE metas paired
        later files' row counts under the wrong path (and dropped trailing
        files), corrupting BlockMetadata.num_rows whenever a file split into
        more than one range."""
        import os

        import pyarrow.parquet as pq

        from qwen_ocr_ray.pipelines.extract import (
            _RowGroupParquetDatasource,
            _parquet_files,
        )

        # two files with DIFFERENT per-row-group counts so misalignment shows
        f1 = str(tmp_path / "a.parquet")
        f2 = str(tmp_path / "b.parquet")
        pq.write_table(pa.table({"x": list(range(40))}), f1, row_group_size=10)
        pq.write_table(pa.table({"x": list(range(9))}), f2, row_group_size=3)
        files = _parquet_files(str(tmp_path))
        metas = [pq.read_metadata(f) for f in files]
        # each file splits into two ranges — the shape that broke the zip
        items = [
            {"path": files[0], "lo": 0, "hi": 2},
            {"path": files[0], "lo": 2, "hi": 4},
            {"path": files[1], "lo": 0, "hi": 1},
            {"path": files[1], "lo": 1, "hi": 3},
        ]
        src = _RowGroupParquetDatasource(items, ["x"], 1 << 20, metas, files)
        tasks = src.get_read_tasks(len(items))
        got = [t.metadata.num_rows for t in tasks]
        assert got == [20, 20, 3, 6]
        # and the metadata agrees with what each task actually reads
        for t in tasks:
            blocks = t.read_fn()
            assert sum(b.num_rows for b in blocks) == t.metadata.num_rows


class TestIvfIndexed:
    def test_index_probe_matches_scan_and_prunes_bytes(self, ray_session, tmp_path):
        """The built index must (a) give identical results to the one-shot
        scan path, (b) read only the probed cells' bytes (<= nprobe/k of the
        corpus with slack for uneven cells), and (c) cover the corpus exactly
        when probing all cells."""
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data

        from qwen_ocr_ray.stages.similarity import (
            _normalize,
            build_ivf_index,
            ivf_probe_dirs,
            ivf_topk,
            ivf_topk_indexed,
            kmeans_centroids,
        )

        rng = np.random.RandomState(5)
        base = _normalize(rng.standard_normal((600, 16)))
        vecs = np.vstack([base, base[9]])  # id 600 == id 9
        t = pa.table(
            {
                "vec_id": pa.array(list(range(601)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        path = str(tmp_path / "emb.parquet")
        pq.write_table(t, path, row_group_size=64)
        cents = kmeans_centroids(vecs, k=8)
        idx = build_ivf_index(path, cents, index_dir=str(tmp_path / "ivf"))
        assert os.path.exists(os.path.join(idx, "_SUCCESS"))

        q = base[9]
        got = ivf_topk_indexed(idx, q, k=4, centroids=cents, nprobe=2).to_pandas()
        ref = ivf_topk(
            ray.data.from_arrow(t), q, k=4, centroids=cents, nprobe=2
        ).to_pandas()
        assert got.vec_id.tolist() == ref.vec_id.tolist()
        assert got.score.tolist() == ref.score.tolist()
        assert {9, 600} <= set(got.vec_id)

        # pruned read: probed-cell bytes are a strict minority of the index
        def dir_bytes(d):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(d) for f in fs
            )

        probed = ivf_probe_dirs(idx, q, cents, nprobe=2)
        assert len(probed) == 2
        cell_dirs = [
            os.path.join(idx, d) for d in os.listdir(idx) if d.startswith("cell=")
        ]
        total = sum(dir_bytes(d) for d in cell_dirs)
        read = sum(dir_bytes(d) for d in probed)
        assert read <= total * (2 / 8) * 2.5  # nprobe/k with skew slack

        # probing all cells == brute force coverage (the index loses no rows)
        full = ivf_topk_indexed(
            idx, q, k=601, centroids=cents, nprobe=len(cents)
        ).to_pandas()
        assert len(full) == 601

    def test_build_is_idempotent(self, ray_session, tmp_path):
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwen_ocr_ray.stages.similarity import (
            _normalize, build_ivf_index, kmeans_centroids,
        )

        rng = np.random.RandomState(7)
        vecs = _normalize(rng.standard_normal((50, 8)))
        t = pa.table(
            {
                "vec_id": pa.array(list(range(50)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
                ),
            }
        )
        path = str(tmp_path / "emb.parquet")
        pq.write_table(t, path)
        cents = kmeans_centroids(vecs, k=4)
        idx1 = build_ivf_index(path, cents, index_dir=str(tmp_path / "ivf"))
        import os
        mtime = os.path.getmtime(os.path.join(idx1, "_SUCCESS"))
        idx2 = build_ivf_index(path, cents, index_dir=str(tmp_path / "ivf"))
        assert idx1 == idx2
        assert os.path.getmtime(os.path.join(idx2, "_SUCCESS")) == mtime


    def test_incremental_append_equals_fresh_full_build(self, ray_session, tmp_path):
        """VERDICT r04 #8: build index over A, append B — every query must
        return exactly what a fresh full build over A ∪ B returns (cell
        membership is a pure function of (row, centroids))."""
        import os

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from qwen_ocr_ray.stages.similarity import (
            _normalize, build_ivf_index, ivf_index_append, ivf_topk_indexed,
            kmeans_centroids,
        )

        rng = np.random.RandomState(21)
        all_vecs = _normalize(rng.standard_normal((300, 16)))

        def tbl(ids, vecs):
            return pa.table(
                {
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array(
                        [list(map(float, v)) for v in vecs],
                        pa.list_(pa.float32()),
                    ),
                }
            )

        pa_path = str(tmp_path / "a.parquet")
        pb_path = str(tmp_path / "b.parquet")
        pu_path = str(tmp_path / "u.parquet")
        pq.write_table(tbl(range(200), all_vecs[:200]), pa_path, row_group_size=64)
        pq.write_table(tbl(range(200, 300), all_vecs[200:]), pb_path, row_group_size=64)
        pq.write_table(tbl(range(300), all_vecs), pu_path, row_group_size=64)

        cents = kmeans_centroids(all_vecs[:200], k=6)  # trained once, reused
        idx = build_ivf_index(pa_path, cents, index_dir=str(tmp_path / "ivf"))
        ivf_index_append(idx, pb_path, cents)
        full = build_ivf_index(pu_path, cents, index_dir=str(tmp_path / "ivf_full"))

        for q in (all_vecs[250], all_vecs[10]):
            got = ivf_topk_indexed(idx, q, k=8, centroids=cents, nprobe=3).to_pandas()
            exp = ivf_topk_indexed(full, q, k=8, centroids=cents, nprobe=3).to_pandas()
            assert got.vec_id.tolist() == exp.vec_id.tolist()
            assert got.score.tolist() == exp.score.tolist()
        # appended rows are findable and the staging dir is gone
        assert 250 in set(
            ivf_topk_indexed(
                idx, all_vecs[250], k=1, centroids=cents, nprobe=2
            ).to_pandas().vec_id
        )
        assert not [d for d in os.listdir(idx) if d.startswith("_append.")]

        # idempotency: a repeat append is a no-op (marker short-circuit),
        # and a retry after a "crash" that lost the marker but kept the
        # published cells must not duplicate rows either
        q = all_vecs[250]
        before = ivf_topk_indexed(idx, q, k=8, centroids=cents, nprobe=6).to_pandas()
        ivf_index_append(idx, pb_path, cents)
        markers = [d for d in os.listdir(idx) if d.startswith("_APPEND_")]
        assert len(markers) == 1
        os.remove(os.path.join(idx, markers[0]))  # simulate crash-lost marker
        ivf_index_append(idx, pb_path, cents)
        after = ivf_topk_indexed(idx, q, k=8, centroids=cents, nprobe=6).to_pandas()
        assert before.vec_id.tolist() == after.vec_id.tolist()
        assert len(set(after.vec_id)) == len(after)  # no duplicated rows

    def test_append_requires_published_index(self, ray_session, tmp_path):
        import numpy as np
        import pytest

        from qwen_ocr_ray.stages.similarity import ivf_index_append

        with pytest.raises(FileNotFoundError):
            ivf_index_append(
                str(tmp_path / "missing"), "x.parquet", np.zeros((2, 4))
            )


class TestTokenCost:
    def test_pricing_formula_and_default_off(self):
        from qwen_ocr_ray.config import EngineConfig, token_cost

        cfg = EngineConfig(
            price_per_m_input_tokens=0.8, price_per_m_output_tokens=2.4
        )
        assert token_cost(cfg, 1_000_000, 500_000) == 2.0
        assert token_cost(EngineConfig(), 123_456, 654_321) == 0.0
        assert token_cost(cfg, None, None) == 0.0  # all-null token columns

    def test_pricing_survives_config_roundtrip(self, tmp_path):
        from qwen_ocr_ray.config import EngineConfig, load_json, save_json

        cfg = EngineConfig(price_per_m_input_tokens=1.5)
        p = str(tmp_path / "cfg.json")
        save_json(cfg, p)
        assert load_json(p).price_per_m_input_tokens == 1.5
