"""Benchmark driver: headline flagship extraction + operator queries.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

Env: GRAFT_SF_DIR (default /root/testdata/sf0.1), RAY_GRAFT_CPUS (default 32).

--scaling: runs the headline twice in FRESH processes at N and 4N CPUs
(default 4 vs 16 — see run_scaling docstring for the hardware rationale) on
the same (pre-generated, page-cache-warm) input and reports throughput at
both plus scaling efficiency = (t_N / t_4N) / 4 — the sandbox evidence for
the north_rule's N->4N criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time


SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# scaling runs use a replicated (compute-dominated) input so fixed Ray
# overheads don't mask parallel speedup; plain bench uses the sf input as-is
REPLICATE = int(os.environ.get("QOR_REPLICATE", "1"))

BENCH_QUERIES = [
    "pricing_summary",
    "filter_project",
    "segment_revenue",
    "region_revenue",
    "order_lineitem_join",
    "supplier_nation_revenue",
    "brand_volume",
    "events_asof_order",
    "first_event_per_user",
    "events_hourly",
    "events_running_total",
    "top_orders",
    "token_stats_by_lang",
    "doc_fingerprints",
    "ann_topk",
    "repetition_scores",
    "token_doc_freq",
    "pack_chunks",
    "event_followups",
    "decontaminate",
    "pii_scrub",
    "approx_distinct_users",
    "corpus_rebalance",
    "substring_dup_stats",
    "heavy_hitters",
    "bloom_incremental_dedup",
    "cms_point_counts",
    "quantiles_by_type",
    "unigram_logprob",
    "approx_distinct_by_type",
    "kmeans_clusters",
    "value_zscores",
    "semantic_dedup",
    "shuffle_shards",
    "weighted_sample",
    "substring_dedup",
    "kmeans_sampled",
    "dsir_weights",
]


def _warm_pool(ray) -> None:
    """Untimed: spin up the worker pool and trigger library imports in every
    worker — in this sandbox 32-worker cold start costs tens of seconds and
    would otherwise be charged (anti-proportionally) to the first pipeline.
    The warm tasks BARRIER on each other so all NUM_CPUS workers must be
    alive SIMULTANEOUSLY before timing starts: without it, N quick warm
    tasks can be served by fewer workers while a straggler worker hangs
    during start (documented sporadic behavior here), and the stall then
    bleeds into the first timed pipeline (observed as a bimodal 12 s /
    17-22 s 16-CPU leg; 3 consecutive in-process runs sit at 12.2-13.5 s)."""

    @ray.remote(num_cpus=0)
    class _Gate:
        def __init__(self):
            self.n = 0

        def arrive(self) -> int:
            self.n += 1
            return self.n

        def count(self) -> int:
            return self.n

    @ray.remote(num_cpus=1)
    def _warm(gate, n: int, deadline_s: float) -> int:
        import time as _t

        import polars  # noqa: F401

        import qwen_ocr_ray.stages.bucketing  # noqa: F401
        import qwen_ocr_ray.functions.html_extract  # noqa: F401

        ray.get(gate.arrive.remote())
        t0 = _t.monotonic()
        while ray.get(gate.count.remote()) < n:
            if _t.monotonic() - t0 > deadline_s:
                break  # don't deadlock if the cluster can't start n workers
            _t.sleep(0.05)
        return 1

    gate = _Gate.remote()
    ray.get([_warm.remote(gate, NUM_CPUS, 60.0) for _ in range(NUM_CPUS)])
    # Warm Ray Data's executor too (lazy module/executor init costs ~2 s on
    # the FIRST dataset a process runs — a fixed per-process term that is
    # not the engine's throughput; measured winner-scan 3.2 s cold vs 0.9 s
    # warm at both 4 and 16 CPUs).
    ray.data.range(NUM_CPUS).map_batches(lambda b: b).materialize()


def run_bench() -> dict:
    # polars/pyarrow in ray workers must not each spawn a full thread pool
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from qwen_ocr_ray.pipelines.extract import run_extraction
    from qwen_ocr_ray.pipelines.queries import QUERIES
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset
    import pyarrow.parquet as pq

    # untimed: generate + warm the page cache (guide: measure compute+shuffle,
    # not the first disk read). The VM drops its page cache under memory
    # pressure, so warm the query tables too — cold reads hit this box's
    # pathological fresh-page-fault path and would charge disk to the engine.
    pages_path, _ = ensure_pages_dataset(SF_DIR, replicate=REPLICATE)
    n_rows = pq.read_metadata(pages_path).num_rows
    warm_files = [pages_path] + [
        os.path.join(SF_DIR, f) for f in sorted(os.listdir(SF_DIR))
        if f.endswith(".parquet")
    ]
    for path in warm_files:
        with open(path, "rb") as f:
            while f.read(1 << 24):
                pass

    _warm_pool(ray)

    if os.environ.get("QOR_BENCH_MODE") == "minhash":
        # compute-bound leg: minhash sketch + band explode + bucket count over
        # replicated documents. Almost no allocation per row -> isolates the
        # engine's CPU scaling from this VM's pathological page-fault cost.
        import pyarrow as pa

        from qwen_ocr_ray.stages.bucketing import add_bucket_column
        from qwen_ocr_ray.stages.dedup_text import minhash_explode_batch

        docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                             columns=["doc_id", "text"])
        reps = []
        for k in range(REPLICATE):
            t = docs
            if k:
                import pyarrow.compute as pc

                t = t.set_column(0, "doc_id", pc.add(t["doc_id"], k * 10_000_000))
            reps.append(t)
        big = pa.concat_tables(reps)
        n_docs = big.num_rows
        ds = ray.data.from_arrow(big).repartition(NUM_CPUS * 4)
        t0 = time.perf_counter()
        out = (
            ds.map_batches(minhash_explode_batch, batch_format="pyarrow")
            .map_batches(
                lambda t: add_bucket_column(
                    t.drop_columns(["signature"]), "band_key", 64
                ),
                batch_format="pyarrow",
            )
            .groupby("bucket")
            .count()
        )
        out.to_pandas()
        headline = time.perf_counter() - t0
        ray.shutdown()
        return {
            "metric": "minhash_sketch_sec",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs": n_docs,
            "docs_per_sec": round(n_docs / headline, 1),
        }

    # headline: flagship extraction, fresh checkpoint dir (no resume credit).
    # QOR_CHECKPOINT=disk measures the durable phase-A variant instead.
    checkpoint = os.environ.get("QOR_CHECKPOINT", "auto")
    routed_dir = f"/tmp/qor_bench_routed_{os.getpid()}"
    out_dir = f"/tmp/qor_bench_out_{os.getpid()}"
    shutil.rmtree(routed_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.perf_counter()
    ds = run_extraction(pages_path, routed_dir=routed_dir, approx_rows=n_rows,
                        checkpoint=checkpoint)
    ds.write_parquet(out_dir)
    headline = time.perf_counter() - t0
    n_docs = sum(
        pq.read_metadata(os.path.join(out_dir, f)).num_rows
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    shutil.rmtree(routed_dir, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)

    per_query: dict[str, float] = {}
    if os.environ.get("QOR_SKIP_QUERIES"):
        ray.shutdown()
        return {
            "metric": "extraction_pipeline_sec_sf",
            "value": round(headline, 3),
            "unit": "sec",
            "queries": {},
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
            "docs": n_docs,
            "docs_per_sec": round(n_docs / headline, 1),
        }
    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        res = QUERIES[name](SF_DIR)
        # consume without driver materialization of large results
        for _ in res.iter_batches(batch_size=65536, batch_format="pyarrow"):
            pass
        per_query[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "extraction_pipeline_sec_sf",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / headline, 1),
    }


def run_scaling() -> dict:
    """Fresh-process runs at N and 4N CPUs on identical, pre-warmed input.

    Default N=4 (so 4 vs 16): a pure-CPU probe shows this VM delivers ~16
    effective cores (32 concurrent spinners run 1.9x slower than 16), so
    8-vs-32 would measure hardware oversubscription, not the engine. The
    input is replicated so the job is compute-dominated (~160k docs at
    sf0.1 x32); generation is cached and untimed.
    """
    replicate = int(os.environ.get("QOR_SCALING_REPLICATE", "16"))
    lo_cpus, hi_cpus = (
        int(x) for x in os.environ.get("QOR_SCALING_CPUS", "4,16").split(",")
    )
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    pages_path, _ = ensure_pages_dataset(SF_DIR, replicate=replicate)

    def warm_input() -> None:
        """Re-fault the input into the page cache immediately before each
        timed leg. The one-off warmup leg used to be enough, but this VM's
        host balloon can reclaim the guest page cache MID-SEQUENCE (observed:
        buff/cache dropped to ~3 GB between runs; the 16-CPU leg then read
        cold at fresh-fault bandwidth and efficiency collapsed 0.92 -> 0.59
        with the pure-CPU control unaffected). A ~0.1 s warm re-read per leg
        closes that window."""
        for p in (pages_path, os.path.join(SF_DIR, "documents.parquet")):
            with open(p, "rb") as f:
                while f.read(1 << 24):
                    pass

    def one(ncpu: int, extra_env: dict | None = None) -> dict:
        warm_input()
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=SF_DIR,
                   QOR_REPLICATE=str(replicate), QOR_SKIP_QUERIES="1")
        env.update(extra_env or {})
        cmd = [sys.executable, os.path.abspath(__file__)]
        # Pin each leg to a FIXED cpuset (VERDICT r02 #9): unpinned, the
        # hi-CPU leg bursts above its nominal share on a quiet machine and
        # efficiency reads >1 (1.24-1.64 observed). taskset holds both legs
        # at exactly their nominal CPU budget so the ratio measures the
        # engine. QOR_PIN=0 restores the unpinned behavior.
        if shutil.which("taskset") and os.environ.get("QOR_PIN", "1") != "0":
            cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    repeat = int(os.environ.get("QOR_SCALING_REPEAT", "1"))

    def one_mode(mode: str) -> dict:
        extra = {"QOR_BENCH_MODE": "flagship", "QOR_CHECKPOINT": "disk"} \
            if mode == "flagship_disk" else {"QOR_BENCH_MODE": mode}
        # Untimed warmup leg (QOR_WARM_MEM=0 skips): this firecracker VM
        # backs guest memory lazily — the FIRST process to touch fresh pages
        # pays ~1000x-slower fault service (BASELINE.md probe: 0.01 GB/s
        # fresh vs 9.5 GB/s warmed). Whichever timed leg runs first would
        # absorb that one-off host-side cost and bias the ratio (lo-first
        # read as superlinear, up to 1.45). One discarded hi-CPU run backs
        # the pages so both timed legs measure the engine, not the balloon.
        if os.environ.get("QOR_WARM_MEM", "1") != "0":
            one(hi_cpus, extra)
        # INTERLEAVE the legs (lo,hi,lo,hi,...) and pair adjacent runs: this
        # VM's host-side capacity drifts on a ~tens-of-minutes timescale
        # (observed: 16-CPU legs 11.4 s in one half-hour window, 14-18 s in
        # another, with the 4-CPU legs moving the OPPOSITE way and zero repo
        # code change in between). Lo-block-then-hi-block sampling aliases
        # that drift straight into the ratio; adjacent lo/hi pairs sample
        # the same instant, and the median pair is the drift-robust
        # efficiency. repeat=1 keeps the single-pair behavior.
        los, his = [], []
        for _ in range(repeat):
            los.append(one(lo_cpus, extra))
            his.append(one(hi_cpus, extra))
        lo = sorted(los, key=lambda r: r["value"])[len(los) // 2]
        hi = sorted(his, key=lambda r: r["value"])[len(his) // 2]
        t_lo, t_hi = lo["value"], hi["value"]
        pair_effs = sorted(
            round((l["value"] / h["value"]) / (hi_cpus / lo_cpus), 3)
            for l, h in zip(los, his)
        )
        res = {
            f"sec_{lo_cpus}": t_lo,
            f"sec_{hi_cpus}": t_hi,
            f"docs_per_sec_{lo_cpus}": lo["docs_per_sec"],
            f"docs_per_sec_{hi_cpus}": hi["docs_per_sec"],
            "scaling_efficiency": pair_effs[len(pair_effs) // 2],
            "docs": lo["docs"],
        }
        if repeat > 1:  # median-of-pairs above; raw legs for transparency
            res[f"runs_{lo_cpus}"] = [r["value"] for r in los]
            res[f"runs_{hi_cpus}"] = [r["value"] for r in his]
            res["pair_efficiencies"] = pair_effs
        return res

    def cpu_control() -> dict:
        """Hardware-ceiling control: a fixed amount of pure-CPU work (no Ray,
        no memory pressure, zero coordination) run on the SAME pinned cpusets
        as the timed legs. This VM's 32 advertised vCPUs deliver ~16
        effective cores (host-side throttling), so even an embarrassingly
        parallel job cannot reach efficiency 1.0 between the pinned legs —
        measured ~0.86 for 4-vs-16. The control bounds what ANY engine could
        score here; `normalized_efficiency` below reports the engine against
        that attainable ceiling (a real N->4N node cluster adds hardware,
        not vCPU shares, so it has no such ceiling)."""
        probe = (
            "import sys,time;from concurrent.futures import ProcessPoolExecutor\n"
            "def spin(_):\n"
            "    x=0\n"
            "    for i in range(6_000_000): x+=i*i\n"
            "    return x\n"
            "n=int(sys.argv[1])\n"
            "t0=time.perf_counter()\n"
            "ex=ProcessPoolExecutor(n);list(ex.map(spin,range(64)));ex.shutdown()\n"
            "print(time.perf_counter()-t0)\n"
        )

        def leg(ncpu: int) -> float:
            cmd = [sys.executable, "-c", probe, str(ncpu)]
            if shutil.which("taskset") and os.environ.get("QOR_PIN", "1") != "0":
                cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
            return float(subprocess.run(
                cmd, capture_output=True, text=True, check=True
            ).stdout.strip().splitlines()[-1])

        t_lo, t_hi = leg(lo_cpus), leg(hi_cpus)
        return {
            f"sec_{lo_cpus}": round(t_lo, 3),
            f"sec_{hi_cpus}": round(t_hi, 3),
            "scaling_efficiency": round((t_lo / t_hi) / (hi_cpus / lo_cpus), 3),
        }

    def mem_control() -> dict:
        """Second hardware-ceiling control: aggregate PREFAULTED memory-copy
        bandwidth on the same pinned cpusets (prefaulted so the r01
        fresh-fault pathology is excluded). The flagship's per-doc work is
        string/Arrow-buffer traffic, so its attainable 4->16 ratio is
        bounded by the memory SYSTEM, not just CPU: this VM saturates
        copy bandwidth at ~4 processes and the measured 4->16 memory
        scaling swings 0.16-0.82 across minutes (host memory QoS varies
        like its CPU share) while pure-CPU spinners hold 0.86-0.91. A
        memory-traffic-heavy pipeline's attainable ceiling lies BETWEEN
        the two controls."""
        probe = (
            "import sys,time\n"
            "import multiprocessing as mp\n"
            "import numpy as np\n"
            "def w(q):\n"
            "    src=np.ones(64<<20,np.uint8)\n"
            "    dst=np.empty_like(src)\n"
            "    np.copyto(dst,src)\n"
            "    t0=time.perf_counter()\n"
            "    for _ in range(20): np.copyto(dst,src)\n"
            "    q.put(time.perf_counter()-t0)\n"
            "n=int(sys.argv[1])\n"
            "q=mp.Queue()\n"
            "ps=[mp.Process(target=w,args=(q,)) for _ in range(n)]\n"
            "[p.start() for p in ps]\n"
            "ts=[q.get() for _ in ps]\n"
            "[p.join() for p in ps]\n"
            "print(n*20*(64<<20)/max(ts)/1e9)\n"
        )

        def leg(ncpu: int) -> float:
            cmd = [sys.executable, "-c", probe, str(ncpu)]
            if shutil.which("taskset") and os.environ.get("QOR_PIN", "1") != "0":
                cmd = ["taskset", "-c", f"0-{ncpu - 1}"] + cmd
            return float(subprocess.run(
                cmd, capture_output=True, text=True, check=True
            ).stdout.strip().splitlines()[-1])

        bw_lo, bw_hi = leg(lo_cpus), leg(hi_cpus)
        return {
            f"gbps_{lo_cpus}": round(bw_lo, 1),
            f"gbps_{hi_cpus}": round(bw_hi, 1),
            "scaling_efficiency": round((bw_hi / bw_lo) / (hi_cpus / lo_cpus), 3),
        }

    modes = os.environ.get("QOR_SCALING_MODES", "flagship,minhash").split(",")
    results = {m: one_mode(m) for m in modes}
    control = cpu_control()
    membw = mem_control()
    ceiling = max(control["scaling_efficiency"], 1e-9)
    flagship = results.get("flagship") or next(iter(results.values()))
    out = {
        "metric": f"scaling_efficiency_{lo_cpus}_to_{hi_cpus}_cpus",
        # headline fields mirror the flagship numbers
        **flagship,
        "replicate": replicate,
        "sf": SF_DIR,
        "pinned": bool(shutil.which("taskset")) and os.environ.get("QOR_PIN", "1") != "0",
        "cpu_control": control,
        "mem_control": membw,
        "normalized_efficiency": round(
            flagship["scaling_efficiency"] / ceiling, 3
        ),
    }
    for m, r in results.items():
        out["minhash_compute_bound" if m == "minhash" else m] = r
        r["normalized_efficiency"] = round(r["scaling_efficiency"] / ceiling, 3)
    return out


def run_dedup_stress() -> dict:
    """Measured cost of the exchange-dedup fallback next to the broadcast
    path on a HIGH-CONTENTION input (VERDICT r03 #5): ~35% contested urls —
    far past the 'dup fraction is broadcastable' assumption the default
    strategy rests on — at sf x QOR_STRESS_REPLICATE (default 16: ~80k
    unique docs, ~108k rows). Both strategies run through the durable
    checkpoint path in one session (pool warm for both; broadcast first, so
    any residual cold-start bias hurts the INCUMBENT, not the fallback).
    Prints one JSON line; record the numbers in BASELINE.md."""
    os.environ.setdefault("POLARS_MAX_THREADS", "1")
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    from qwen_ocr_ray.pipelines.extract import run_extraction
    from qwen_ocr_ray.sources.synth_pages import ensure_pages_dataset

    replicate = int(os.environ.get("QOR_STRESS_REPLICATE", "16"))
    dup_rate = float(os.environ.get("QOR_STRESS_DUP_RATE", "0.35"))
    pages_path, golden_path = ensure_pages_dataset(
        SF_DIR, replicate=replicate, dup_rate=dup_rate
    )
    rows_in = pq.read_metadata(pages_path).num_rows
    unique_docs = pq.read_metadata(golden_path).num_rows
    with open(pages_path, "rb") as f:  # page-cache warm (untimed)
        while f.read(1 << 24):
            pass
    _warm_pool(ray)

    results: dict[str, dict] = {}
    for strat in ("broadcast", "exchange"):
        routed = f"/tmp/qor_stress_routed_{strat}_{os.getpid()}"
        out_dir = f"/tmp/qor_stress_out_{strat}_{os.getpid()}"
        shutil.rmtree(routed, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        ds = run_extraction(
            pages_path, routed_dir=routed, approx_rows=rows_in,
            checkpoint="disk", dedup_strategy=strat,
        )
        ds.write_parquet(out_dir)
        elapsed = time.perf_counter() - t0
        n_docs = sum(
            pq.read_metadata(os.path.join(out_dir, f)).num_rows
            for f in os.listdir(out_dir) if f.endswith(".parquet")
        )
        results[strat] = {
            "sec": round(elapsed, 3),
            "docs": n_docs,
            "docs_per_sec": round(n_docs / elapsed, 1),
        }
        shutil.rmtree(routed, ignore_errors=True)
        shutil.rmtree(out_dir, ignore_errors=True)
    ray.shutdown()
    assert results["broadcast"]["docs"] == results["exchange"]["docs"] == unique_docs
    return {
        "metric": "dedup_stress_sec",
        "dup_rate": dup_rate,
        "replicate": replicate,
        "rows_in": rows_in,
        "unique_docs": unique_docs,
        "num_cpus": NUM_CPUS,
        "sf": SF_DIR,
        "broadcast": results["broadcast"],
        "exchange": results["exchange"],
        "exchange_over_broadcast": round(
            results["exchange"]["sec"] / results["broadcast"]["sec"], 3
        ),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--dedup-stress" in sys.argv:
        print(json.dumps(run_dedup_stress()))
    else:
        print(json.dumps(run_bench()))
