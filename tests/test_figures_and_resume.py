"""Figure pipeline + sharded resume tests (SURVEY.md §5.3)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from qwen_ocr_ray.pipelines.figures import run_figures
from qwen_ocr_ray.pipelines.sharded import read_extraction_output, run_sharded_extraction
from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset


@pytest.fixture(scope="module")
def synth(ray_session, sf_dir):
    return ensure_pages_dataset(sf_dir)


class TestFigures:
    @pytest.fixture(scope="class")
    def figures(self, synth, tmp_path_factory):
        pages_path, _ = synth
        routed = str(tmp_path_factory.mktemp("routed_figs"))
        return run_figures(pages_path, routed_dir=routed, approx_rows=600).to_pandas()

    def test_matches_local_stub(self, figures, synth):
        """Distributed figure rows == local recomputation over the same pages."""
        from qwen_ocr_ray.functions.geometry import area_fraction, optimize_page
        from qwen_ocr_ray.functions.stub_vlm import stub_figures
        from qwen_ocr_ray.sources.pagepack import is_pagepack, unpack_pages
        from qwen_ocr_ray.stages.route import classify_payload

        pages_path, _ = synth
        t = pq.read_table(pages_path, columns=["url", "warc_ts", "html"])
        # replicate dedup (first fetch wins) locally: first occurrence per url
        seen: dict[str, bool] = {}
        expected = []
        rows = sorted(
            zip(t["url"].to_pylist(), t["warc_ts"].to_pylist(), t["html"].to_pylist()),
            key=lambda r: (r[0], r[1]),
        )
        for url, _, payload in rows:
            if url in seen:
                continue
            seen[url] = True
            if not payload or not is_pagepack(payload):
                continue
            for idx, (w, h, raw) in enumerate(unpack_pages(payload)):
                opt, ow, oh = optimize_page(raw, w, h)
                for fig in stub_figures(idx + 1, opt):
                    frac = area_fraction((fig["x1"], fig["y1"], fig["x2"], fig["y2"]))
                    if 0.05 <= frac <= 0.85:
                        expected.append((url, idx + 1, fig["fig_number"]))
        got = set(zip(figures.url, figures.page_num, figures.fig_number))
        assert got == set(expected)
        assert len(figures) == len(expected)

    def test_area_filter_applied(self, figures):
        assert (figures.area_frac >= 0.05).all() and (figures.area_frac <= 0.85).all()

    def test_crops_present_and_sized(self, figures):
        ok = figures[figures.error.isna()]
        assert len(ok) == len(figures)  # stub emits only valid bboxes
        assert (ok.width > 0).all() and (ok.height > 0).all()
        for _, r in ok.head(5).iterrows():
            assert len(r.image) == r.width * r.height * 3

    def test_fig_seq_renumbers(self, figures):
        assert (figures.fig_seq >= 1).all()


class TestShardedResume:
    def test_crash_then_resume_is_complete_and_identical(self, synth, tmp_path_factory):
        pages_path, golden_path = synth
        out_dir = str(tmp_path_factory.mktemp("sharded"))

        # run 1: crash partway (before the last planned shard)
        from qwen_ocr_ray.pipelines.sharded import _shard_plan
        from qwen_ocr_ray.pipelines.extract import route_and_checkpoint

        route_and_checkpoint(pages_path, os.path.join(out_dir, "routed"), approx_rows=600)
        plan = _shard_plan(os.path.join(out_dir, "routed"), 1)
        assert len(plan) >= 3
        victim = plan[-1]["shard"]
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_sharded_extraction(
                pages_path, out_dir, files_per_shard=1, approx_rows=600,
                fail_on_shard=victim,
            )
        manifests = os.listdir(os.path.join(out_dir, "_manifest"))
        assert 0 < len(manifests) < len(plan)

        # run 2: resume — only the missing shards run
        summary = run_sharded_extraction(
            pages_path, out_dir, files_per_shard=1, approx_rows=600
        )
        assert summary["shards_failed"] == []
        assert len(summary["shards_skipped"]) == len(manifests)
        assert set(summary["shards_ran"]) | set(summary["shards_skipped"]) == {
            s["shard"] for s in plan
        }

        # output complete + byte-identical to goldens
        out = read_extraction_output(out_dir).to_pandas()
        golden = pq.read_table(golden_path).to_pandas()
        m = out.merge(golden, on="url", suffixes=("", "_exp"))
        assert len(m) == len(golden) == len(out)
        assert (m.text == m.text_exp).all()

        # manifests carry lineage + metrics
        with open(os.path.join(out_dir, "_manifest", manifests[0])) as f:
            man = json.load(f)
        assert man["status"] == "done"
        assert man["input_files"] and all(os.path.exists(p) for p in man["input_files"])
        assert man["rows_out"] >= 0 and man["bytes_out"] > 0 and man["wall_s"] > 0
        # token + dollar-cost accounting (reference main.py:56,268-283)
        assert man["input_tokens"] >= 0 and man["output_tokens"] >= 0
        assert man["cost"] == 0.0  # default pricing is 0.0/Mtok

    def test_inline_strategy_crash_resume_identical(self, synth, tmp_path_factory):
        """Checkpoint-free input sharding (row-group ranges + fused kernel):
        crash, resume, byte-identical output — and no routed/ dir at all."""
        from qwen_ocr_ray.pipelines.sharded import _plan_input_shards
        from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

        # sf0.001 fits one 1024-row row group; replicate x4 -> multiple
        # row groups so the input-level shard plan has >1 entry
        pages_path, golden_path = ensure_pages_dataset(
            "/root/testdata/sf0.001", replicate=4
        )
        out_dir = str(tmp_path_factory.mktemp("sharded_inline"))
        plan = _plan_input_shards(pages_path, 1)
        assert len(plan) >= 2
        victim = plan[-1]["shard"]
        with pytest.raises(RuntimeError, match="simulated crash"):
            run_sharded_extraction(
                pages_path, out_dir, strategy="inline", row_groups_per_shard=1,
                fail_on_shard=victim,
            )
        manifests = os.listdir(os.path.join(out_dir, "_manifest"))
        assert 0 < len(manifests) < len(plan)

        summary = run_sharded_extraction(
            pages_path, out_dir, strategy="inline", row_groups_per_shard=1,
        )
        assert summary["shards_failed"] == []
        assert len(summary["shards_skipped"]) == len(manifests)
        assert not os.path.exists(os.path.join(out_dir, "routed", "_SUCCESS"))

        out = read_extraction_output(out_dir).to_pandas()
        golden = pq.read_table(golden_path).to_pandas()
        m = out.merge(golden, on="url", suffixes=("", "_exp"))
        assert len(m) == len(golden) == len(out)
        assert (m.text == m.text_exp).all()
