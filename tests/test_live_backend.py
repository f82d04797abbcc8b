"""Live-backend integration against a LOCAL OpenAI-compatible HTTP stub
(VERDICT r02 #6): the retry-on-429, streaming-delta-assembly and
malformed-figure-JSON paths of ``OpenAICompatBackend`` execute for real —
no network, no openai package (the pure-stdlib fallback client carries the
identical call surface)."""

from __future__ import annotations

import dataclasses
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from qwen_ocr_ray.config import DEFAULT_CONFIG
from qwen_ocr_ray.stages.inference import OpenAICompatBackend


class _StubHandler(BaseHTTPRequestHandler):
    """Behavior keyed on the requested model name; per-server mutable state
    counts attempts for the retry scenarios."""

    state: dict

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        model = body["model"]
        is_json_mode = body.get("response_format", {}).get("type") == "json_object"
        rec = {"model": model, "stream": body.get("stream", False),
               "json_mode": is_json_mode,
               "auth": self.headers.get("Authorization"),
               "t_in": time.monotonic()}
        self.state.setdefault("requests", []).append(rec)
        if model == "m-slow-both":
            # concurrency probe: each call takes 0.5 s; a concurrent
            # text+figures pair has OVERLAPPING handling windows
            time.sleep(0.5)
        rec["t_out"] = time.monotonic()
        if is_json_mode and model in ("m-both", "m-slow-both"):
            content = json.dumps(
                {"images": [{"page_number": 1, "fig_number": 1, "x1": 10,
                             "y1": 10, "x2": 500, "y2": 400,
                             "caption": "Figure 1: live", "element_type": "chart"}]}
            )
            resp = {"choices": [{"message": {"content": content}}]}
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(json.dumps(resp).encode())
            return
        if model == "m-429-twice":
            n = self.state["attempts"] = self.state.get("attempts", 0) + 1
            if n <= 2:
                self.send_response(429)
                self.end_headers()
                self.wfile.write(b'{"error": "rate limited"}')
                return
        if model == "m-500-always":
            self.send_response(500)
            self.end_headers()
            self.wfile.write(b'{"error": "boom"}')
            return
        if body.get("stream"):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            for chunk in ("## Str", "eamed ", "page"):
                evt = {"choices": [{"delta": {"content": chunk}}]}
                self.wfile.write(f"data: {json.dumps(evt)}\n\n".encode())
            self.wfile.write(b"data: [DONE]\n\n")
            return
        if model == "m-bad-figures":
            content = '{"images": [{"page_number": "NaN", "x1": -5}]}'
        elif model == "m-figures":
            content = json.dumps(
                {"images": [{"page_number": 1, "fig_number": 1, "x1": 10,
                             "y1": 10, "x2": 500, "y2": 400,
                             "caption": "Figure 1: live", "element_type": "chart"}]}
            )
        else:
            content = "```markdown\n# Live page\n```"
        resp = {"choices": [{"message": {"content": content}}]}
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(json.dumps(resp).encode())


@pytest.fixture()
def stub_server():
    handler = type("H", (_StubHandler,), {"state": {}})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1", handler.state
    srv.shutdown()
    thread.join(timeout=5)


def _backend(base_url: str, model: str) -> OpenAICompatBackend:
    # backoff base 0 -> retry sleeps are 0**1.. = 0 after the first 1 s
    cfg = dataclasses.replace(DEFAULT_CONFIG, exponential_backoff_base=0)
    return OpenAICompatBackend(cfg, base_url=base_url, api_key="test-key",
                               model=model)


PAGE = (1, b"\xff" * (4 * 4 * 3), 4, 4)


class TestLiveBackendAgainstStub:
    def test_success_and_fence_cleaning(self, stub_server):
        url, state = stub_server
        be = _backend(url, "m-ok")
        out = be.transcribe_page(*PAGE)
        assert out == "# Live page"
        assert state["requests"][0]["auth"] == "Bearer test-key"

    def test_429_retries_then_succeeds(self, stub_server):
        url, state = stub_server
        be = _backend(url, "m-429-twice")
        out = be.transcribe_page(*PAGE)
        assert out == "# Live page"
        assert len(state["requests"]) == 3  # 2 x 429 + success

    def test_500_exhausts_retries(self, stub_server):
        url, state = stub_server
        be = _backend(url, "m-500-always")
        with pytest.raises(RuntimeError, match="Max retries"):
            be.transcribe_page(*PAGE)
        assert len(state["requests"]) == DEFAULT_CONFIG.max_retry_attempts

    def test_streaming_delta_assembly(self, stub_server):
        url, state = stub_server
        be = _backend(url, "m-ok")
        out = be.transcribe_window([PAGE], context="", stream=True)
        assert out == "## Streamed page"
        assert state["requests"][0]["stream"] is True

    def test_malformed_figure_json_degrades_to_zero(self, stub_server):
        url, _ = stub_server
        be = _backend(url, "m-bad-figures")
        assert be.detect_figures(*PAGE) == []

    def test_valid_figures_pass_schema_gate(self, stub_server):
        url, _ = stub_server
        be = _backend(url, "m-figures")
        figs = be.detect_figures(*PAGE)
        assert len(figs) == 1
        assert figs[0]["x1"] == 10 and figs[0]["element_type"] == "chart"

    def test_connection_refused_is_fatal_not_retried(self):
        be = _backend("http://127.0.0.1:9", "m-ok")  # discard port, refused
        with pytest.raises(Exception) as ei:
            be.transcribe_page(*PAGE)
        assert not isinstance(ei.value, RuntimeError) or "Max retries" not in str(ei.value)


class TestConcurrentTextAndFigures:
    def test_one_image_pass_serves_both_calls(self, stub_server):
        """The live document actor runs the text transcription and the
        structured-output figure call for a window CONCURRENTLY over the
        same optimized page batch (reference document_job.py:338-362 runs
        both under one asyncio.TaskGroup): exactly two HTTP calls per
        window, overlapped in time."""
        import pyarrow as pa

        from qwen_ocr_ray.stages.inference import TranscribeDocumentsLive

        url, state = stub_server
        cfg = dataclasses.replace(DEFAULT_CONFIG, exponential_backoff_base=0)
        actor = TranscribeDocumentsLive(
            cfg, detect_figures=True, base_url=url, api_key="test-key",
            model="m-slow-both",
        )
        page_t = pa.struct(
            [("page_num", pa.int32()), ("image", pa.binary()),
             ("width", pa.int32()), ("height", pa.int32())]
        )
        batch = pa.table(
            {
                "url": pa.array(["https://x.org/d1"], pa.string()),
                "pages": pa.array(
                    [[
                        {"page_num": 1, "image": b"\xff" * 48, "width": 4, "height": 4},
                        {"page_num": 2, "image": b"\x00" * 48, "width": 4, "height": 4},
                    ]],
                    pa.list_(page_t),
                ),
            }
        )
        t0 = time.perf_counter()
        out = actor(batch)
        wall = time.perf_counter() - t0
        assert out["text"][0].as_py() == "## Streamed page"
        figs = out["figures"][0].as_py()
        assert len(figs) == 1
        assert figs[0]["element_type"] == "chart" and figs[0]["x2"] == 500
        reqs = state["requests"]
        # ONE text call (streamed) + ONE figure call (json mode) per window
        assert len(reqs) == 2
        assert sorted(r["json_mode"] for r in reqs) == [False, True]
        # both calls overlapped: the second ARRIVED before the first left
        # the handler (load-robust — a wall-clock bound flakes on this VM's
        # documented timing variance; keep only a liveness ceiling)
        assert max(r["t_in"] for r in reqs) < min(r["t_out"] for r in reqs)
        assert wall < 5.0

    def test_detect_figures_off_keeps_schema(self, stub_server):
        import pyarrow as pa

        from qwen_ocr_ray.stages.inference import TranscribeDocumentsLive

        url, _ = stub_server
        cfg = dataclasses.replace(DEFAULT_CONFIG, exponential_backoff_base=0)
        actor = TranscribeDocumentsLive(
            cfg, base_url=url, api_key="test-key", model="m-ok"
        )
        page_t = pa.struct(
            [("page_num", pa.int32()), ("image", pa.binary()),
             ("width", pa.int32()), ("height", pa.int32())]
        )
        batch = pa.table(
            {
                "url": pa.array(["https://x.org/d1"], pa.string()),
                "pages": pa.array(
                    [[{"page_num": 1, "image": b"\xff" * 48, "width": 4, "height": 4}]],
                    pa.list_(page_t),
                ),
            }
        )
        out = actor(batch)
        assert out.column_names == ["url", "text", "final_breadcrumb"]
        assert out["text"][0].as_py() == "## Streamed page"
