"""Figure extraction stage: detect -> area-filter -> crop, fused per batch.

Re-expresses the reference's figure path (detection call, area filter, bbox
validation, crop — /root/reference/src/models/document_job.py:163-273 and
/root/reference/src/pdf_handler.py:78-122) as ONE actor-pool map_batches
stage. The reference holds the page images in memory while detecting and
cropping; the fused stage keeps that locality, so no (url, page_num) join /
shuffle is needed at all — the generic bucketed hash join exists separately
(stages/join.py) for when metadata arrives as its own table.

Reference error semantics preserved (SURVEY.md §7 hard part 5):
  * area outside [min, max] fraction -> row silently SKIPPED (warning-level,
    counted in `skipped_area`) — document_job.py:202-227
  * invalid bbox or crop failure    -> non-fatal per figure: an error ROW is
    emitted with null image          — document_job.py:229-239
"""

from __future__ import annotations

import pyarrow as pa

from qwen_ocr_ray.config import DEFAULT_CONFIG, EngineConfig
from qwen_ocr_ray.functions.figure_schema import validate_figures
from qwen_ocr_ray.functions.geometry import area_fraction, crop_figure
from qwen_ocr_ray.stages.inference import OpenAICompatBackend, StubBackend

FIGURES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("page_num", pa.int32()),
        ("fig_number", pa.int32()),   # model-assigned (image_metadata.py:29-40)
        ("fig_seq", pa.int32()),      # per-page renumbering, collision-safe (O3)
        ("caption", pa.string()),
        ("element_type", pa.string()),
        ("x1", pa.int32()),
        ("y1", pa.int32()),
        ("x2", pa.int32()),
        ("y2", pa.int32()),
        ("area_frac", pa.float32()),
        ("image", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("error", pa.string()),
    ]
)


class ExtractFigures:
    """Actor-pool stage over optimized page rows -> figure rows with crops."""

    def __init__(self, cfg: EngineConfig = DEFAULT_CONFIG, backend: str = "stub", **backend_kwargs):
        self.cfg = cfg
        self.backend = StubBackend() if backend == "stub" else OpenAICompatBackend(cfg, **backend_kwargs)
        self.skipped_area = 0  # actor-lifetime counter (warning analogue)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        cols: dict[str, list] = {n: [] for n in FIGURES_SCHEMA.names}
        for url, pn, raw, w, h in zip(
            batch["url"].to_pylist(),
            batch["page_num"].to_pylist(),
            batch["image"].to_pylist(),
            batch["width"].to_pylist(),
            batch["height"].to_pylist(),
        ):
            seq = 0
            # structured-output schema gate (U5): malformed figure metadata
            # is rejected before the area filter / crop see it
            for fig in validate_figures(self.backend.detect_figures(pn, raw)):
                bbox = (fig["x1"], fig["y1"], fig["x2"], fig["y2"])
                frac = area_fraction(bbox)
                if frac < cfg.min_area_fraction or frac > cfg.max_area_fraction:
                    self.skipped_area += 1  # silent skip, not an error row
                    continue
                seq += 1
                image = width = height = None
                err = None
                try:
                    image, width, height = crop_figure(raw, w, h, bbox)
                except Exception as e:  # non-fatal per figure
                    err = f"{type(e).__name__}: {e}"
                cols["url"].append(url)
                cols["page_num"].append(pn)
                cols["fig_number"].append(fig["fig_number"])
                cols["fig_seq"].append(seq)
                cols["caption"].append(fig.get("caption"))
                cols["element_type"].append(fig.get("element_type", "other"))
                for k, v in zip(("x1", "y1", "x2", "y2"), bbox):
                    cols[k].append(v)
                cols["area_frac"].append(round(frac, 4))
                cols["image"].append(image)
                cols["width"].append(width)
                cols["height"].append(height)
                cols["error"].append(err)
        return pa.table(cols, schema=FIGURES_SCHEMA)
