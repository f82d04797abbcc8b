"""Stateful inference stage: the actor-pool seam for VLM transcription.

The reference's per-batch API calls (``/root/reference/src/models/document_job.py:65-161``
text, ``:163-273`` figures) map to a callable-CLASS ``map_batches`` stage:
backend/client construction happens once per actor in ``__init__``, per-batch
work in ``__call__`` (SURVEY.md §2.3 A1/A2). Two backends share the seam:

  * ``StubBackend`` — deterministic pure function of row content
    (FIXTURES.md §4); used by tests and bench so the golden path never
    depends on a live VLM.
  * ``OpenAICompatBackend`` — the production path: batched requests with
    in-actor retry (``2**attempt`` backoff, HTTP >= 400 only, matching
    config.py:56-58 semantics). Gated behind an import-try: the sandbox has
    no network and no openai package, so constructing it raises a clear
    NotImplementedError; the Ray-side plumbing is identical to the stub's.
"""

from __future__ import annotations

import time

import pyarrow as pa

from qwen_ocr_ray.config import EngineConfig, DEFAULT_CONFIG
from qwen_ocr_ray.functions.stub_vlm import stub_figures, stub_page_markdown


class StubBackend:
    """Deterministic transcription/figure backend (no I/O, no state)."""

    def transcribe_page(self, page_num: int, image_bytes: bytes) -> str:
        return stub_page_markdown(page_num, image_bytes)

    def detect_figures(self, page_num: int, image_bytes: bytes) -> list[dict]:
        return stub_figures(page_num, image_bytes)


def _ns(obj):
    """JSON -> attribute-shaped objects (the subset of the openai client's
    response surface this module reads)."""
    from types import SimpleNamespace

    if isinstance(obj, dict):
        return SimpleNamespace(**{k: _ns(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_ns(x) for x in obj]
    return obj


class _MiniChatCompletions:
    def __init__(self, base_url: str, api_key: str, timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.timeout = timeout

    def create(self, *, model, messages, stream: bool = False, **params):
        import json as _json
        import urllib.error
        import urllib.request

        payload = {"model": model, "messages": messages}
        if stream:
            payload["stream"] = True
        payload.update({k: v for k, v in params.items() if v is not None})
        req = urllib.request.Request(
            self.base_url + "/chat/completions",
            data=_json.dumps(payload).encode(),
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
            method="POST",
        )
        try:
            resp = urllib.request.urlopen(req, timeout=self.timeout)
        except urllib.error.HTTPError as e:
            body = e.read()[:200]
            err = RuntimeError(f"HTTP {e.code}: {body!r}")
            # same attribute the openai APIStatusError carries — the retry
            # policy keys on it
            err.status_code = e.code
            raise err
        if stream:
            def events():
                with resp:
                    for line in resp:
                        line = line.decode().strip()
                        if not line.startswith("data:"):
                            continue
                        data = line[len("data:"):].strip()
                        if data == "[DONE]":
                            break
                        yield _ns(_json.loads(data))

            return events()
        with resp:
            return _ns(_json.loads(resp.read().decode()))


class _MiniOpenAIClient:
    """Pure-stdlib OpenAI-compatible chat client.

    Fallback when the ``openai`` package is absent: implements exactly the
    surface this module uses (``chat.completions.create`` with optional
    ``stream`` / ``response_format``, HTTP errors carrying ``status_code``),
    over urllib + server-sent-events parsing. This makes the live-backend
    retry/stream/validation paths executable against any OpenAI-compatible
    server — including the local test stub — with no third-party client."""

    def __init__(self, base_url: str, api_key: str):
        from types import SimpleNamespace

        self.chat = SimpleNamespace(
            completions=_MiniChatCompletions(base_url, api_key)
        )


TEXT_SYSTEM_PROMPT = (
    "You are a Document Digitization Engine converting document pages to "
    "Markdown. Output ONLY the raw Markdown for the pages, continuing "
    "seamlessly from the preceding context; no code fences, no page markers."
)
FIGURES_SYSTEM_PROMPT = (
    "You are a Visual Element Extraction Engine. Identify important figures "
    "on each page and return JSON rows (page_number, fig_number, bbox "
    "normalized 0-1000, caption, element_type)."
)


class OpenAICompatBackend:
    """Live OpenAI-compatible VLM backend.

    Client construction happens once per actor (the seam the reference keeps
    in its config singleton, config.py:23-25); per-call retry follows the
    reference policy exactly: up to 3 attempts, backoff 2**attempt seconds,
    retry ONLY on HTTP status >= 400, anything else fatal
    (document_job.py:132-161; config.py:56-58). Uses the official ``openai``
    client when installed; otherwise falls back to the pure-stdlib
    ``_MiniOpenAIClient`` with the identical call surface — so the retry,
    streaming-delta and JSON-validation paths run for real against any
    OpenAI-compatible endpoint (tests drive them with a local HTTP stub).
    """

    def __init__(self, cfg: EngineConfig, base_url: str | None = None,
                 api_key: str | None = None, model: str | None = None):
        from qwen_ocr_ray.config import api_settings

        # env-var overrides (OCR_API_BASE_URL / OCR_MODEL_NAME / OCR_API_KEY)
        # with the reference's precedence and missing-key failure (U2,
        # src/config.py:30-41)
        settings = api_settings(base_url=base_url, model=model, api_key=api_key)
        self.cfg = cfg
        self.model = settings["model"]
        try:
            from openai import OpenAI

            self.client = OpenAI(
                base_url=settings["base_url"], api_key=settings["api_key"]
            )
        except ImportError:
            self.client = _MiniOpenAIClient(
                base_url=settings["base_url"], api_key=settings["api_key"]
            )

    def _retry(self, fn):
        cfg = self.cfg
        last = None
        for attempt in range(cfg.max_retry_attempts):
            try:
                return fn()
            except Exception as e:  # APIStatusError shape: .status_code
                status = getattr(e, "status_code", None)
                if status is None or status < cfg.min_http_error_code:
                    raise
                last = e
                if attempt < cfg.max_retry_attempts - 1:
                    time.sleep(cfg.exponential_backoff_base**attempt)
        raise RuntimeError("Max retries exceeded") from last

    def transcribe_page(self, page_num: int, image_bytes: bytes,
                        width: int = 0, height: int = 0, context: str = "") -> str:
        from qwen_ocr_ray.functions.markdown import clean_markdown_output
        from qwen_ocr_ray.functions.payload import build_image_content, build_messages

        content, _ = build_image_content([(page_num, image_bytes, width, height)])
        messages = build_messages(TEXT_SYSTEM_PROMPT, context, content, 1)

        def call():
            resp = self.client.chat.completions.create(
                model=self.model,
                messages=messages,
                max_tokens=self.cfg.max_tokens,
                temperature=self.cfg.temperature,
            )
            return clean_markdown_output(resp.choices[0].message.content or "")

        return self._retry(call)

    def transcribe_window(
        self, pages: list[tuple[int, bytes, int, int]], context: str,
        *, stream: bool = True,
    ) -> str:
        """One multi-page batch call (reference: 10 pages per request,
        document_job.py:65-161 / config.py:52).

        ``stream=True`` consumes the response as server-sent deltas like the
        reference's delta loop (document_job.py:104-125): a 64k-token
        response accumulates incrementally instead of one blocking body read,
        so the actor observes progress and client timeouts apply per chunk.
        """
        from qwen_ocr_ray.functions.payload import build_image_content, build_messages

        content, _ = build_image_content(pages)
        messages = build_messages(TEXT_SYSTEM_PROMPT, context, content, len(pages))

        def call():
            if stream:
                parts: list[str] = []
                for event in self.client.chat.completions.create(
                    model=self.model,
                    messages=messages,
                    max_tokens=self.cfg.max_tokens,
                    temperature=self.cfg.temperature,
                    stream=True,
                ):
                    if event.choices and event.choices[0].delta.content:
                        parts.append(event.choices[0].delta.content)
                return "".join(parts)
            resp = self.client.chat.completions.create(
                model=self.model,
                messages=messages,
                max_tokens=self.cfg.max_tokens,
                temperature=self.cfg.temperature,
            )
            return resp.choices[0].message.content or ""

        return self._retry(call)

    def detect_figures(self, page_num: int, image_bytes: bytes,
                       width: int = 0, height: int = 0) -> list[dict]:
        import json

        from qwen_ocr_ray.functions.payload import build_image_content, build_messages

        content, _ = build_image_content([(page_num, image_bytes, width, height)],
                                         downscale=False)
        messages = build_messages(FIGURES_SYSTEM_PROMPT, "", content, 1)

        def call():
            resp = self.client.chat.completions.create(
                model=self.model,
                messages=messages,
                response_format={"type": "json_object"},
            )
            parsed = json.loads(resp.choices[0].message.content or "{}")
            # Eager structured-output validation before anything reaches the
            # crop stage (reference parses into ImageExtractionResponse at
            # the call site, document_job.py:187-201); an unparseable
            # response degrades to zero figures like the reference's
            # missing-parsed fallback (document_job.py:196-201).
            from pydantic import ValidationError

            from qwen_ocr_ray.functions.figure_schema import validate_figures

            try:
                return validate_figures(parsed)
            except ValidationError:
                return []

        return self._retry(call)

    def detect_figures_window(
        self, pages: list[tuple[int, bytes, int, int]], context: str = ""
    ) -> list[dict]:
        """One structured-output figure call for a whole page batch — the
        shape of the reference's per-batch image task
        (document_job.py:163-273 sends all batch_images in one request).
        Malformed JSON degrades to zero figures, like the per-page call."""
        import json

        from qwen_ocr_ray.functions.payload import build_image_content, build_messages

        content, _ = build_image_content(pages, downscale=False)
        messages = build_messages(FIGURES_SYSTEM_PROMPT, context, content, len(pages))

        def call():
            resp = self.client.chat.completions.create(
                model=self.model,
                messages=messages,
                response_format={"type": "json_object"},
            )
            parsed = json.loads(resp.choices[0].message.content or "{}")
            from pydantic import ValidationError

            from qwen_ocr_ray.functions.figure_schema import validate_figures

            try:
                return validate_figures(parsed)
            except ValidationError:
                return []

        return self._retry(call)


def _count_output_tokens(text: str) -> int:
    """Output-token accounting (reference: tiktoken re-encode per delta,
    document_job.py:115 — an O(n^2) inefficiency there; counted once per row
    here). Without tiktoken in this sandbox, the BPE-ish pre-tokenizer regex
    (word/number/punct split) stands in — materially closer to a real BPE
    count than whitespace splitting, since punctuation and code tokenize
    separately."""
    from qwen_ocr_ray.functions.text_stats import bpe_ish_token_count

    return bpe_ish_token_count(text)


def transcribe_pages_stub(batch: pa.Table) -> pa.Table:
    """Stateless-task form of the transcribe stage for the STUB backend.

    The stub holds no client/model state, so an actor pool would only add
    spin-up latency (each actor is a fresh worker process); plain tasks reuse
    the already-warm task workers. Live backends MUST use the
    :class:`TranscribePages` actor class instead — client construction
    belongs in ``__init__`` (SURVEY.md §2.3 A1)."""
    backend = StubBackend()
    mds = [
        backend.transcribe_page(pn, raw)
        for pn, raw in zip(batch["page_num"].to_pylist(), batch["image"].to_pylist())
    ]
    md_arr = pa.array(mds, pa.string())
    out_tokens = pa.array([_count_output_tokens(m) for m in mds], pa.int64())
    return batch.append_column("md", md_arr).append_column("output_tokens", out_tokens)


class TranscribePages:
    """Actor-pool stage: page rows -> page rows + ``md`` + ``output_tokens``.

    Use with ``ds.map_batches(TranscribePages, fn_constructor_kwargs=...,
    concurrency=(min, max), batch_size=B, batch_format="pyarrow")``.
    """

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG, backend: str = "stub", **backend_kwargs):
        self.cfg = cfg
        if backend == "stub":
            self.backend = StubBackend()
        elif backend == "openai":
            self.backend = OpenAICompatBackend(cfg, **backend_kwargs)
        else:
            raise ValueError(f"unknown backend {backend!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        mds = [
            self.backend.transcribe_page(pn, raw)
            for pn, raw in zip(batch["page_num"].to_pylist(), batch["image"].to_pylist())
        ]
        md_arr = pa.array(mds, pa.string())
        out_tokens = pa.array([_count_output_tokens(m) for m in mds], pa.int64())
        return batch.append_column("md", md_arr).append_column("output_tokens", out_tokens)


class DetectFigures:
    """Actor-pool stage: page rows -> exploded figure-metadata rows.

    The analogue of the structured-output figure call
    (document_job.py:163-273): emits one row per detected figure with the
    normalized bbox as flat int32 columns (list<struct> flattened — friendlier
    to vectorized filtering than nested structs)."""

    SCHEMA = pa.schema(
        [
            ("url", pa.string()),
            ("page_num", pa.int32()),
            ("fig_number", pa.int32()),
            ("x1", pa.int32()),
            ("y1", pa.int32()),
            ("x2", pa.int32()),
            ("y2", pa.int32()),
            ("caption", pa.string()),
            ("element_type", pa.string()),
        ]
    )

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG, backend: str = "stub", **backend_kwargs):
        self.cfg = cfg
        self.backend = StubBackend() if backend == "stub" else OpenAICompatBackend(cfg, **backend_kwargs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from qwen_ocr_ray.functions.figure_schema import validate_figures

        cols: dict[str, list] = {n: [] for n in self.SCHEMA.names}
        for url, pn, raw in zip(
            batch["url"].to_pylist(),
            batch["page_num"].to_pylist(),
            batch["image"].to_pylist(),
        ):
            # schema gate for EVERY backend (U5): malformed figures raise
            # here, before the bbox filter/crop stages see them
            for fig in validate_figures(self.backend.detect_figures(pn, raw)):
                cols["url"].append(url)
                cols["page_num"].append(fig["page_number"])
                cols["fig_number"].append(fig["fig_number"])
                for k in ("x1", "y1", "x2", "y2"):
                    cols[k].append(fig[k])
                cols["caption"].append(fig.get("caption"))
                cols["element_type"].append(fig.get("element_type", "other"))
        return pa.table(cols, schema=self.SCHEMA)


class TranscribeDocumentsLive:
    """Live-backend document-level actor: the reference's sequential
    batch-with-context loop (/root/reference/src/models/document_job.py:321-389)
    as an actor-pool stage over WHOLE-DOCUMENT rows.

    Input rows: {url, pages: list<struct{page_num:int32, image:binary,
    width:int32, height:int32}>} (grouped upstream). For each document, pages
    are windowed into cfg.pages_per_batch batches in order; each batch call
    receives the breadcrumb context rendered from the running header stack,
    and the stack is folded forward from the cleaned output — exactly the
    reference's context-carry semantics (W2). Parallelism is across
    documents; one document is strictly sequential.

    Not runnable in this sandbox (no openai/network); the deterministic stub
    path covers tests, and fold equivalence is proven there (the stub ignores
    context, so the post-hoc fold equals the chained fold — tested in
    test_stages.test_fold_matches_local_reference).
    """

    FIGURE_STRUCT = pa.struct(
        [
            ("page_num", pa.int32()),
            ("fig_number", pa.int32()),
            ("x1", pa.int32()),
            ("y1", pa.int32()),
            ("x2", pa.int32()),
            ("y2", pa.int32()),
            ("caption", pa.string()),
            ("element_type", pa.string()),
        ]
    )

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG,
                 detect_figures: bool = False, **backend_kwargs):
        self.cfg = cfg
        self.detect_figures = detect_figures
        self.backend = OpenAICompatBackend(cfg, **backend_kwargs)
        # One page-image pass serves BOTH calls: the text transcription and
        # the structured-output figure call for a window run CONCURRENTLY
        # (the reference's asyncio.TaskGroup per batch,
        # document_job.py:338-362) — two threads because the stdlib client
        # is synchronous; one in-flight window per document keeps the
        # reference's strictly-sequential context carry.
        self._pool = None
        if detect_figures:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(max_workers=2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from qwen_ocr_ray.functions.markdown import (
            batch_iterator,
            build_context,
            clean_markdown_output,
            extract_headers,
            update_header_stack,
        )

        cfg = self.cfg
        urls, texts, crumbs, figures = [], [], [], []
        for url, pages in zip(batch["url"].to_pylist(), batch["pages"].to_pylist()):
            pages = sorted(pages, key=lambda p: p["page_num"])
            stack: list = []
            parts: list[str] = []
            doc_figs: list[dict] = []
            n = len(pages)
            for _, ps, pe in batch_iterator(cfg.start_page, n, cfg.pages_per_batch):
                window = [
                    (p["page_num"], p["image"], p["width"], p["height"])
                    for p in pages[ps - 1 : pe]
                ]
                context = build_context(stack)
                if self._pool is not None:
                    text_f = self._pool.submit(
                        self.backend.transcribe_window, window, context
                    )
                    figs_f = self._pool.submit(
                        self.backend.detect_figures_window, window, context
                    )
                    raw = text_f.result()
                    doc_figs.extend(
                        {
                            "page_num": f["page_number"],
                            "fig_number": f["fig_number"],
                            "x1": f["x1"], "y1": f["y1"],
                            "x2": f["x2"], "y2": f["y2"],
                            "caption": f.get("caption"),
                            "element_type": f.get("element_type", "other"),
                        }
                        for f in figs_f.result()
                    )
                else:
                    raw = self.backend.transcribe_window(window, context)
                cleaned = clean_markdown_output(raw)
                parts.append(cleaned)
                stack = update_header_stack(stack, extract_headers(cleaned))
            urls.append(url)
            texts.append("".join(parts))
            crumbs.append(build_context(stack))
            figures.append(doc_figs)
        cols = {
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "final_breadcrumb": pa.array(crumbs, pa.string()),
        }
        if self.detect_figures:
            cols["figures"] = pa.array(figures, pa.list_(self.FIGURE_STRUCT))
        return pa.table(cols)
