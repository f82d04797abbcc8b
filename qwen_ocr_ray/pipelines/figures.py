"""Figure-extraction pipeline: pages parquet -> figures table (S4 sink analogue).

Shares phase A (dedup+route checkpoint) with the flagship extraction; the
figure branch then explodes/optimizes pages and runs the fused
detect-filter-crop actor stage. Output is a Parquet-ready figures table with
raw-RGB crops in a binary column — the distributed analogue of the
``{page}_fig{n}.png`` sink (/root/reference/src/models/extracted_image.py:33-43).
"""

from __future__ import annotations

import ray.data

from qwen_ocr_ray.config import DEFAULT_CONFIG, EngineConfig
from qwen_ocr_ray.pipelines.extract import _read_kind, route_and_checkpoint
from qwen_ocr_ray.stages.figures import ExtractFigures, FIGURES_SCHEMA
from qwen_ocr_ray.stages.pages_branch import explode_pages, optimize_pages_batch


def run_figures(
    pages_path: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    routed_dir: str | None = None,
    approx_rows: int | None = None,
    backend: str = "stub",
) -> "ray.data.Dataset":
    import hashlib
    import os

    import pyarrow as pa

    if routed_dir is None:
        tag = hashlib.md5(os.path.abspath(pages_path).encode()).hexdigest()[:12]
        routed_dir = f"/tmp/qor_routed/{tag}"
    os.makedirs(routed_dir, exist_ok=True)
    route_and_checkpoint(pages_path, routed_dir, cfg, approx_rows=approx_rows)

    pages_rows = _read_kind(routed_dir, "pages")
    if pages_rows is None:
        return ray.data.from_arrow(
            pa.table({n: [] for n in FIGURES_SCHEMA.names}, schema=FIGURES_SCHEMA)
        )
    return (
        pages_rows.map_batches(
            lambda t, c=cfg: explode_pages(t, c), batch_format="pyarrow",
            batch_size=cfg.binary_batch_size,
        )
        .map_batches(
            lambda t, c=cfg: optimize_pages_batch(t, c), batch_format="pyarrow",
            batch_size=cfg.binary_batch_size,
        )
        .map_batches(
            ExtractFigures,
            fn_constructor_kwargs={"cfg": cfg, "backend": backend},
            batch_format="pyarrow",
            batch_size=cfg.binary_batch_size,
            concurrency=cfg.inference_concurrency,
            num_cpus=1,
        )
    )
