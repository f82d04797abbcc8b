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


# NOTE on this sandbox's memory behavior (measured, see CLAUDE.md): fresh
# page faults are ~1000x slower than touching already-mapped pages
# (0.01 GB/s vs 9.5 GB/s memcpy). Disabling jemalloc decay to keep arenas
# hot was tried and made things WORSE (grown RSS degrades the VM further),
# so allocator defaults are left alone; the engine instead minimizes fresh
# allocation by keeping batches Arrow-native and block counts moderate.
