"""qwen_ocr_ray — a Ray-Data-native page-to-markdown extraction engine.

A from-scratch rebuild of the data-processing capabilities of
``alexispurslane/qwen-ocr`` (reference at /root/reference, read-only), expressed
as streaming ``ray.data.Dataset`` pipelines over zero-copy Arrow batches.

Layout:
  functions/  pure deterministic kernels (no Ray): markdown core, geometry,
              HTML extraction, text statistics, hashing
  sources/    parquet readers + the deterministic synthetic pages generator
  stages/     Ray Data stages (map_batches / actor pools / groupby folds)
  pipelines/  end-to-end pipeline builders (flagship extraction, dedup, ...)
  state/      broadcast helpers and checkpoint manifests

Library code never calls ``ray.init()`` — the driver owns the session.
"""

__version__ = "0.1.0"
