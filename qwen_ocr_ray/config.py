"""Engine configuration.

Numeric knobs and prompt/label literals carry the reference semantics
(``/root/reference/src/config.py:47-62,156-163``). Unlike the reference's
process-global singleton (``config.py:11-21``), this is a plain frozen
dataclass shipped to workers inside closures/actor state — no globals, no
client handles, safe to pickle into Ray tasks.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class EngineConfig:
    # Page geometry / rasterization (reference: src/config.py:47-49, src/pdf_handler.py:11-13)
    dpi: int = 130
    white_threshold: int = 250
    image_token_size: int = 28

    # Batch windowing (reference: src/config.py:52)
    pages_per_batch: int = 10
    start_page: int = 1

    # Inference envelope (reference: src/config.py:50-51)
    max_tokens: int = 64_000
    temperature: float = 0.1

    # Retry policy (reference: src/config.py:56-58)
    min_http_error_code: int = 400
    max_retry_attempts: int = 3
    exponential_backoff_base: int = 2

    # Figure area filter, fraction of page (reference: src/config.py:61-62)
    min_area_fraction: float = 0.05
    max_area_fraction: float = 0.85

    # Ray Data stage sizing (new — scale knobs, not reference semantics).
    # Batches of binary page rows are kept small; text batches large.
    text_batch_size: int = 4096
    binary_batch_size: int = 64
    inference_concurrency: tuple[int, int] = (2, 32)

    # Skew handling: number of salt buckets for hot domains.
    salt_buckets: int = 16

    # Dollar-cost accounting (reference: main.py:56,268-283 tracks a
    # total_cost per job next to the token totals). Price per MILLION
    # tokens; defaults 0.0 = cost reporting off but fields present.
    price_per_m_input_tokens: float = 0.0
    price_per_m_output_tokens: float = 0.0


def token_cost(cfg: EngineConfig, input_tokens: int, output_tokens: int) -> float:
    """Dollar cost of a (input, output) token total under ``cfg`` pricing,
    rounded to 4 decimals (the reference displays ``${total_cost:.4f}``,
    main.py:271)."""
    return round(
        (input_tokens or 0) / 1e6 * cfg.price_per_m_input_tokens
        + (output_tokens or 0) / 1e6 * cfg.price_per_m_output_tokens,
        4,
    )


# Message-assembly literals (reference: src/config.py:156-163). These are part
# of the byte-exact contract for context/breadcrumb rendering.
PRECEDING_CONTEXT_HEADER = "## PRECEDING CONTEXT (Read-Only, use for flow continuity):"
START_OF_DOCUMENT_PLACEHOLDER = "[Start of Document]"
NEW_IMAGES_HEADER_PREFIX = "\n\n## NEW IMAGES TO TRANSCRIBE ("
PAGE_LABEL_PREFIX = "\nPage "
PAGE_LABEL_SUFFIX = ":\n"
DOCUMENT_BREADCRUMB_HEADER = "### DOCUMENT LOCATION BREADCRUMB\n"

DEFAULT_CONFIG = EngineConfig()


DEFAULT_API_BASE_URL = "https://api.synthetic.new/v1/"
DEFAULT_MODEL_NAME = "hf:Qwen/Qwen3-VL-235B-A22B-Instruct"


def api_settings(
    *,
    base_url: str | None = None,
    model: str | None = None,
    api_key: str | None = None,
    require_key: bool = True,
) -> dict[str, str]:
    """Live-backend connection settings with env-var overrides (U2).

    Precedence: explicit argument > environment variable > default —
    mirroring the reference's env-read initialization
    (``/root/reference/src/config.py:30-41``), including the hard failure
    when no API key is available (``:37-41``). Resolved wherever the
    backend is constructed; on a multi-node cluster pass explicit values
    from the driver via ``fn_constructor_kwargs`` (worker env is not
    guaranteed to carry the driver's variables).
    """
    import os

    resolved = {
        "base_url": base_url
        or os.environ.get("OCR_API_BASE_URL", DEFAULT_API_BASE_URL),
        "model": model or os.environ.get("OCR_MODEL_NAME", DEFAULT_MODEL_NAME),
        "api_key": api_key or os.environ.get("OCR_API_KEY", ""),
    }
    if require_key and not resolved["api_key"]:
        raise ValueError(
            "OCR_API_KEY environment variable is not set. "
            "Please set it with: export OCR_API_KEY='your-api-key'"
        )
    return resolved


def save_json(cfg: EngineConfig, path: str) -> None:
    """Persist config as JSON (reference: Config.save, src/config.py:169-180).

    Unlike the reference's singleton round-trip to ~/.config, this is an
    explicit job-config file read on the driver before graph construction."""
    import dataclasses
    import json

    with open(path, "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)


def load_json(path: str) -> EngineConfig:
    """Load config from JSON, ignoring unknown keys (reference: Config.load,
    src/config.py:182-192 — only known, non-private fields are applied)."""
    import dataclasses
    import json

    with open(path) as f:
        data = json.load(f)
    known = {f.name for f in dataclasses.fields(EngineConfig)}
    kwargs = {k: v for k, v in data.items() if k in known}
    if "inference_concurrency" in kwargs:
        kwargs["inference_concurrency"] = tuple(kwargs["inference_concurrency"])
    return EngineConfig(**kwargs)
