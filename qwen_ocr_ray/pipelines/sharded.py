"""Sharded, resumable extraction: per-partition manifests with lineage+metrics.

The 10^12-row run must survive restarts (north_rule: "resumable from
checkpoint with per-partition lineage + metrics"). Layout:

    out_dir/
      routed/                     phase-A checkpoint (dedup+route, _SUCCESS)
      shards/shard=<kind>-<i>/    one directory of parquet per shard
      _manifest/<kind>-<i>.json   written AFTER the shard's data is durable

A shard = a fixed slice of the routed checkpoint's part files for one kind
(so lineage is a concrete file list). The driver loop skips any shard whose
manifest says done — rerunning after a kill redoes only unfinished shards.
Shard outputs are staged under out_dir/_tmp (outside shards/) and renamed
into place, manifest last, so a crash can never leave a "done" manifest over
partial data — and the read path additionally trusts only shards whose
manifest says done.

Manifest fields: shard, kind, input_files (lineage), rows_out, bytes_out,
wall_s, status, error — the distributed analogue of ProcessingJobState
(/root/reference/src/main.py:42-57).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data

from qwen_ocr_ray.config import DEFAULT_CONFIG, EngineConfig
from qwen_ocr_ray.pipelines.extract import (
    PASSTHROUGH_ERRORS,
    _pad_doc_schema,
    build_pages_branch,
    route_and_checkpoint,
    sized_read_parquet,
)
from qwen_ocr_ray.stages.extract_html import (
    extract_html_batch,
    extract_pdf_batch,
    passthrough_batch,
)

import pyarrow as pa


def _shard_plan(routed_dir: str, files_per_shard: int) -> list[dict]:
    """Deterministic shard list: per kind, consecutive groups of part files."""
    shards = []
    for entry in sorted(os.listdir(routed_dir)):
        if not entry.startswith("kind="):
            continue
        kind = entry.split("=", 1)[1]
        files = sorted(
            os.path.join(routed_dir, entry, f)
            for f in os.listdir(os.path.join(routed_dir, entry))
            if f.endswith(".parquet")
        )
        for i in range(0, len(files), files_per_shard):
            shards.append(
                {
                    "shard": f"{kind}-{i // files_per_shard}",
                    "kind": kind,
                    "input_files": files[i : i + files_per_shard],
                }
            )
    return shards


def _restore_kind(ds: "ray.data.Dataset", kind: str) -> "ray.data.Dataset":
    def fix(t: pa.Table, k: str = kind) -> pa.Table:
        if "kind" in t.column_names:
            t = t.drop_columns(["kind"])
        return t.append_column("kind", pa.array([k] * t.num_rows, pa.string()))

    return ds.map_batches(fix, batch_format="pyarrow")


def _build_shard_dataset(shard: dict, cfg: EngineConfig, backend: str) -> "ray.data.Dataset":
    ds = _restore_kind(sized_read_parquet(shard["input_files"]), shard["kind"])
    kind = shard["kind"]
    if kind == "html":
        return ds.map_batches(
            extract_html_batch, batch_format="pyarrow", batch_size=cfg.text_batch_size
        ).map_batches(_pad_doc_schema, batch_format="pyarrow")
    if kind == "pages":
        return build_pages_branch(ds, cfg, backend=backend)
    if kind == "pdf":
        return ds.map_batches(
            extract_pdf_batch, batch_format="pyarrow",
            batch_size=cfg.binary_batch_size,
        )
    return ds.map_batches(
        lambda t: _pad_doc_schema(passthrough_batch(t, PASSTHROUGH_ERRORS)),
        batch_format="pyarrow",
    )


def _plan_input_shards(pages_path: str, row_groups_per_shard: int) -> list[dict]:
    """Input-level shard plan: per parquet file, contiguous row-group ranges.

    The generators write row_group_size=1024, so a row-group range is an
    addressable, deterministic slice; at real scale each CC segment FILE is
    its own shard and the range covers the whole file. Lineage = (file,
    rg_lo, rg_hi)."""
    import pyarrow.parquet as pq

    files = (
        sorted(
            os.path.join(pages_path, f)
            for f in os.listdir(pages_path)
            if f.endswith(".parquet")
        )
        if os.path.isdir(pages_path)
        else [pages_path]
    )
    shards = []
    for fi, path in enumerate(files):
        n_rg = pq.read_metadata(path).num_row_groups
        for lo in range(0, n_rg, row_groups_per_shard):
            hi = min(n_rg, lo + row_groups_per_shard)
            shards.append(
                {
                    "shard": f"f{fi}-rg{lo}",
                    "kind": "inline",
                    "input_files": [f"{path}#rg[{lo},{hi})"],
                    "path": path,
                    "rg_lo": lo,
                    "rg_hi": hi,
                }
            )
    return shards


def _build_inline_shard_dataset(
    shard: dict, cfg: EngineConfig, win_ref, num_buckets: int
) -> "ray.data.Dataset":
    """One input shard -> extracted docs via the fused inline kernel.

    The row-group range is read INSIDE workers as MULTIPLE sub-range
    ReadTasks (extract.read_row_group_range — a real Datasource, so fusion
    with the kernel's batch_size can't re-bundle the shard into one serial
    task; nothing passes through the driver); the fused
    route/extract/transcribe kernel and the url-bucket fold then run as a
    normal per-shard Ray Data graph. A document's page rows all come from
    one input row, so folding within a shard is exact; url dedup uses the
    broadcast global winner map."""
    from qwen_ocr_ray.pipelines.extract import (
        fold_mixed_bucket, make_route_process, read_row_group_range,
    )
    from qwen_ocr_ray.stages.bucketing import add_bucket_column

    route_process = make_route_process(win_ref, cfg)
    source = read_row_group_range(
        shard["path"], shard["rg_lo"], shard["rg_hi"],
        columns=["url", "warc_ts", "html", "lang"],
    )

    return (
        source
        .map_batches(
            route_process, batch_format="pyarrow", batch_size=cfg.binary_batch_size
        )
        .map_batches(
            lambda t, nb=num_buckets: add_bucket_column(t, "url", nb),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(fold_mixed_bucket, batch_format="pyarrow")
    )


def _pin_fsspec_http() -> None:
    """Make ``fsspec.implementations.http`` import deterministically.

    Ray's path resolution re-imports that module on EVERY read/write
    (`ray/data/datasource/path_util.py:_is_http_filesystem`). When aiohttp is
    absent the import fails each time, and CPython's failed-import cleanup
    races under concurrent driver threads: a second thread can observe the
    half-dead module and get an ImportError ("cannot import name
    HTTPFileSystem") that Ray's ModuleNotFoundError handler doesn't catch.
    Pin a sentinel module once so the import always succeeds; the sentinel
    class matches no real filesystem, so ``_is_http_filesystem`` still
    returns False for every local/pyarrow path."""
    import sys
    import types

    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
        return
    except Exception:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # sentinel: aiohttp absent, never instantiated
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


def run_sharded_extraction(
    pages_path: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
    *,
    files_per_shard: int = 4,
    approx_rows: int | None = None,
    backend: str = "stub",
    strategy: str = "checkpoint",
    row_groups_per_shard: int = 16,
    shard_window: int = 3,
    fail_on_shard: str | None = None,  # test hook: simulate a mid-run crash
) -> dict:
    """Run (or resume) the full extraction; returns a summary dict.

    ``strategy="checkpoint"`` (durable phase A): build/reuse the
    kind-partitioned routed checkpoint, shard its part files per kind.

    ``strategy="inline"`` (fast path, stub backend): shard the INPUT by
    (file, row-group range) — no checkpoint write at all; each shard runs
    the fused inline kernel with the broadcast global dedup winner map and
    commits atomically through the same manifest protocol.

    ``shard_window`` shards execute CONCURRENTLY (driver threads, each
    owning its own Dataset execution): a strictly sequential loop idles the
    cluster in every shard's tail while its last tasks drain (VERDICT r02
    #5). The window is bounded so shard working sets don't compound; the
    manifest-last invariant is per shard and unaffected by overlap."""
    routed_dir = os.path.join(out_dir, "routed")
    manifest_dir = os.path.join(out_dir, "_manifest")
    shards_dir = os.path.join(out_dir, "shards")
    for d in (manifest_dir, shards_dir):
        os.makedirs(d, exist_ok=True)

    win_ref = None
    if strategy == "inline":
        from qwen_ocr_ray.pipelines.extract import (
            _broadcast_winners,
            _contested_winners,
        )
        from qwen_ocr_ray.stages.bucketing import pick_num_buckets

        plan = _plan_input_shards(pages_path, row_groups_per_shard)
        win_ref = _broadcast_winners(_contested_winners(pages_path))
        inline_buckets = pick_num_buckets(
            row_groups_per_shard * 1024, rows_per_bucket=50_000
        )
    else:
        os.makedirs(routed_dir, exist_ok=True)
        route_and_checkpoint(pages_path, routed_dir, cfg, approx_rows=approx_rows)
        plan = _shard_plan(routed_dir, files_per_shard)
    done, ran, failed = [], [], []
    _pin_fsspec_http()

    def run_shard(shard: dict) -> tuple[str, bool]:
        """Build, execute and atomically commit ONE shard (runs in a driver
        thread; every path it touches is shard-private)."""
        name = shard["shard"]
        mpath = os.path.join(manifest_dir, f"{name}.json")
        final_dir = os.path.join(shards_dir, f"shard={name}")
        # stage OUTSIDE shards/ so a crash mid-write can never leave partial
        # parquet where read_extraction_output looks
        tmp_dir = os.path.join(out_dir, "_tmp", f"shard={name}")
        os.makedirs(os.path.dirname(tmp_dir), exist_ok=True)
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(final_dir, ignore_errors=True)  # partial from a crash
        t0 = time.perf_counter()
        manifest = {
            "shard": name,
            "kind": shard["kind"],
            "input_files": shard["input_files"],
            "status": "failed",
            "error": None,
        }
        ok = False
        try:
            if strategy == "inline":
                ds = _build_inline_shard_dataset(shard, cfg, win_ref, inline_buckets)
            else:
                ds = _build_shard_dataset(shard, cfg, backend)
            ds.write_parquet(tmp_dir)
            os.replace(tmp_dir, final_dir)
            import pyarrow.compute as _pc
            import pyarrow.parquet as pq

            # one footer open per file serves rows_out AND the schema check;
            # the token columns are read once for the cost roll-up
            files = [f for f in os.listdir(final_dir) if f.endswith(".parquet")]
            tok_in = tok_out = rows_out = 0
            for f in files:
                fp = os.path.join(final_dir, f)
                meta = pq.read_metadata(fp)
                rows_out += meta.num_rows
                schema_names = meta.schema.to_arrow_schema().names
                cols = [c for c in ("input_tokens", "output_tokens") if c in schema_names]
                if cols:
                    tt = pq.read_table(fp, columns=cols)
                    if "input_tokens" in cols:
                        tok_in += _pc.sum(tt["input_tokens"]).as_py() or 0
                    if "output_tokens" in cols:
                        tok_out += _pc.sum(tt["output_tokens"]).as_py() or 0
            from qwen_ocr_ray.config import token_cost

            manifest.update(
                status="done",
                rows_out=rows_out,
                bytes_out=sum(os.path.getsize(os.path.join(final_dir, f)) for f in files),
                input_tokens=int(tok_in),
                output_tokens=int(tok_out),
                cost=token_cost(cfg, tok_in, tok_out),
                wall_s=round(time.perf_counter() - t0, 3),
            )
            ok = True
        except Exception as e:
            manifest["error"] = f"{type(e).__name__}: {e}"
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, mpath)
        return name, ok

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max(1, shard_window)) as pool:
        futures = []
        crash = None
        for shard in plan:
            name = shard["shard"]
            mpath = os.path.join(manifest_dir, f"{name}.json")
            if os.path.exists(mpath):
                with open(mpath) as f:
                    if json.load(f).get("status") == "done":
                        done.append(name)
                        continue
            if fail_on_shard == name:
                # drain in-flight shards first so their manifests are durable
                # (a real crash would lose only un-committed shards — same)
                crash = name
                break
            futures.append(pool.submit(run_shard, shard))
        for fut in futures:
            name, ok = fut.result()
            (ran if ok else failed).append(name)
        if crash is not None:
            raise RuntimeError(f"simulated crash before shard {crash}")

    return {
        "out_dir": out_dir,
        "shards_total": len(plan),
        "shards_skipped": done,
        "shards_ran": ran,
        "shards_failed": failed,
    }


def read_extraction_output(out_dir: str) -> "ray.data.Dataset":
    """Read only shards whose manifest says done — never partial data (the
    manifest-last invariant holds at the READ path too)."""
    manifest_dir = os.path.join(out_dir, "_manifest")
    done_dirs = []
    for f in sorted(os.listdir(manifest_dir)) if os.path.isdir(manifest_dir) else []:
        if not f.endswith(".json"):
            continue
        with open(os.path.join(manifest_dir, f)) as fh:
            if json.load(fh).get("status") == "done":
                name = f[: -len(".json")]
                d = os.path.join(out_dir, "shards", f"shard={name}")
                done_dirs.extend(
                    os.path.join(d, p)
                    for p in sorted(os.listdir(d))
                    if p.endswith(".parquet")
                )
    if not done_dirs:
        raise FileNotFoundError(f"no completed shards under {out_dir}")
    return sized_read_parquet(done_dirs)
