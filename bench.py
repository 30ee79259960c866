#!/usr/bin/env python
"""Benchmark harness.

Headline metric (BASELINE.json): files/sec validated by the full check suite
(range, staleness, drift-rate, z-score gate, IQR gate, uniqueness,
referential) over the synthetic code-repository Parquet corpus, plus per-query
timings of the anomaly/text/ANN pipelines over ``$GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``).

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, ...extras}

``--scaling`` runs the bench twice in fresh processes at num_cpus=8 and 32 on
the identical corpus and reports both throughputs + scaling efficiency
(speedup/4); record the result in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
import warnings

# This guest kernel (Firecracker microVM) serializes page-fault zeroing:
# 16 concurrent parquet decoders burn 10x the system time of 4. Huge-page-
# backed allocations (mimalloc + MADV_HUGEPAGE) cut fault counts 512x and
# restore decode scaling (measured: 16-way decode 3.2s -> 1.4s wall,
# sys 39 -> 12 core-s). Set before ray.init so workers inherit.
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
os.environ.setdefault("MIMALLOC_ALLOW_LARGE_OS_PAGES", "1")
# Never purge freed arenas back to the OS: a worker's first decode task
# faults its buffers once and every later task reuses the same resident
# pages, so total page-fault volume is O(workers x working-set) instead of
# O(total bytes decoded) — the difference between 0.5 and ~1.0 scaling
# efficiency on this page-fault-serializing guest kernel.
os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
os.environ.setdefault("MIMALLOC_RESET_DELAY", "-1")  # mimalloc<2.1 name
os.environ.setdefault("MIMALLOC_ARENA_EAGER_COMMIT", "1")

BENCH_PARTS = int(os.environ.get("BENCH_PARTS", "48"))
BENCH_ROWS = int(os.environ.get("BENCH_ROWS_PER_PART", "160000"))
CORPUS_ROOT = os.environ.get("BENCH_CORPUS_DIR", "/tmp/rtad_bench_corpus")


def ensure_corpus() -> str:
    """Generate (once, cached) the bench-scale code corpus."""
    from use_case_real_time_anomaly_detection_ray.datagen import CorpusSpec, generate_corpus

    tag = f"p{BENCH_PARTS}_r{BENCH_ROWS}"
    cdir = os.path.join(CORPUS_ROOT, tag)
    marker = os.path.join(cdir, "_COMPLETE")
    if os.path.exists(marker):
        return cdir
    shutil.rmtree(cdir, ignore_errors=True)
    spec = CorpusSpec(
        n_parts=BENCH_PARTS,
        rows_per_part=BENCH_ROWS,
        n_repos=64,
        n_out_of_range=max(64, BENCH_PARTS * 2),
        n_duplicates=32,
        n_dangling=32,
        base_len_lo=400,
        base_len_hi=900,
    )
    generate_corpus(cdir, spec)
    open(marker, "w").write("ok")
    return cdir


def warm_page_cache(*paths: str) -> None:
    for root in paths:
        if os.path.isfile(root):
            open(root, "rb").read()
            continue
        for dirpath, _d, files in os.walk(root):
            for f in files:
                if f.endswith(".parquet"):
                    open(os.path.join(dirpath, f), "rb").read()


def run_bench() -> dict:
    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")

    cdir = ensure_corpus()  # before ray.init: generation is not benched

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from use_case_real_time_anomaly_detection_ray.config import ValidationConfig
    from use_case_real_time_anomaly_detection_ray.pipelines import validate
    from use_case_real_time_anomaly_detection_ray.pipelines.queries import (
        ANOMALY_QUERIES,
    )
    from use_case_real_time_anomaly_detection_ray.pipelines.streamops import (
        STREAM_QUERIES,
    )
    from use_case_real_time_anomaly_detection_ray.pipelines.tqueries import TEXT_QUERIES
    from use_case_real_time_anomaly_detection_ray.pipelines.vqueries import (
        VALIDATION_QUERIES,
    )

    warm_page_cache(cdir, sf_dir)
    # spawn the full worker pool before timing (cold actor/worker startup is
    # a per-session cost, not pipeline throughput)
    ray.data.range(1000, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    # ---- headline: full validation suite over the code corpus -------------
    # min of BENCH_SUITE_REPS runs: this guest sees bursty hypervisor steal
    # (±50 % wall swings, see BENCH/BASELINE.md), and a single contaminated
    # run measures the neighbor's load, not the engine. The scaling path
    # already takes min-of-reps at the PROCESS level, so it pins this to 1.
    suite_reps = int(os.environ.get("BENCH_SUITE_REPS", "2"))
    rep_secs: list[float] = []
    for rep in range(suite_reps):
        out_dir = f"/tmp/rtad_bench_out_{num_cpus}_{os.getpid()}_{rep}"
        shutil.rmtree(out_dir, ignore_errors=True)
        t0 = time.perf_counter()
        res = validate.run(cdir, out_dir, ValidationConfig(), resume=False)
        rep_secs.append(round(time.perf_counter() - t0, 3))
        shutil.rmtree(out_dir, ignore_errors=True)
    t_validate = min(rep_secs)
    n_files = int(res.verdicts.drop_duplicates("part")["n_checked"].sum())

    # ---- per-query timings over the driver tables --------------------------
    chosen = {
        "copy_log": ANOMALY_QUERIES["copy_log"],
        "z_score": ANOMALY_QUERIES["z_score"],
        "iqr": ANOMALY_QUERIES["iqr"],
        "timeout": ANOMALY_QUERIES["timeout"],
        "rate_of_change": ANOMALY_QUERIES["rate_of_change"],
        "uniqueness_lineitem": VALIDATION_QUERIES["uniqueness_lineitem"],
        "column_profile_lineitem": VALIDATION_QUERIES["column_profile_lineitem"],
        "doc_exact_dedup": TEXT_QUERIES["doc_exact_dedup"],
        "doc_minhash_dedup": TEXT_QUERIES["doc_minhash_dedup"],
        "doc_simhash_dedup": TEXT_QUERIES["doc_simhash_dedup"],
        "doc_lang_id": TEXT_QUERIES["doc_lang_id"],
        "doc_tfidf_top": TEXT_QUERIES["doc_tfidf_top"],
        "doc_heavy_tokens": TEXT_QUERIES["doc_heavy_tokens"],
        "ann_topk": TEXT_QUERIES["ann_topk"],
        "ann_ivf_topk": TEXT_QUERIES["ann_ivf_topk"],
        "doc_lm_perplexity": TEXT_QUERIES["doc_lm_perplexity"],
        "doc_shared_passages": TEXT_QUERIES["doc_shared_passages"],
        "drift_psi_sources": VALIDATION_QUERIES["drift_psi_sources"],
        "doc_chunks": TEXT_QUERIES["doc_chunks"],
        "q3_shipping_priority": VALIDATION_QUERIES["q3_shipping_priority"],
        "events_funnel": STREAM_QUERIES["events_funnel"],
        "events_json_agg": STREAM_QUERIES["events_json_agg"],
        "events_sessionize": STREAM_QUERIES["events_sessionize"],
        "events_asof_join": STREAM_QUERIES["events_asof_join"],
        "events_range_join": STREAM_QUERIES["events_range_join"],
        "events_hourly_windows": STREAM_QUERIES["events_hourly_windows"],
    }
    import pandas as pd

    # re-warm the task-worker pool: the suite's actor pools displace idle
    # task workers, and without this the first query pays their respawn
    ray.data.range(1000, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()

    qtimes: dict[str, float] = {}
    for name, fn in chosen.items():
        t0 = time.perf_counter()
        r = fn(sf_dir)
        if not isinstance(r, pd.DataFrame):
            r = r.to_pandas()  # consume the lazy Dataset
        qtimes[name] = round(time.perf_counter() - t0, 3)

    ray.shutdown()
    return {
        "metric": "sec: full validation suite over synthetic code corpus "
                  f"({BENCH_PARTS} parts x {BENCH_ROWS} rows)",
        "value": round(t_validate, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "n_files": n_files,
        "files_per_sec": round(n_files / t_validate, 1),
        "suite_rep_secs": rep_secs,
    }


DOCS_CORPUS = os.environ.get("BENCH_DOCS_DIR", "/tmp/rtad_bench_docs")
DOCS_N = int(os.environ.get("BENCH_DOCS_N", "60000"))


def ensure_docs() -> str:
    """Synthetic document corpus for the compute-bound scaling pipeline."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(DOCS_CORPUS, f"n{DOCS_N}")
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    rng = np.random.default_rng(123)
    vocab = np.array([f"tok{i}" for i in range(20000)])
    texts = []
    for i in range(DOCS_N):
        n = int(rng.integers(80, 160))
        texts.append(" ".join(vocab[rng.integers(0, 20000, n)]))
        if i % 10 == 7:  # plant near-duplicates
            w = texts[-1].split()
            w[int(rng.integers(0, len(w)))] = str(vocab[int(rng.integers(0, 20000))])
            texts.append(" ".join(w))
    tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    for i in range(16):  # 16 files → parallel read
        pq.write_table(tab.slice(i * len(texts) // 16,
                                 (i + 1) * len(texts) // 16 - i * len(texts) // 16),
                       os.path.join(d, f"docs_{i}.parquet"))
    open(marker, "w").write("ok")
    return d


def run_bench_compute() -> dict:
    """Compute-bound scaling pipeline: MinHash-LSH dedup over the synthetic
    document corpus (shingling + 64-permutation hashing per doc — CPU-dense
    and cache-resident, so it tracks the core count rather than the memory
    subsystem)."""
    warnings.filterwarnings("ignore")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    d = ensure_docs()

    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from use_case_real_time_anomaly_detection_ray.pipelines import textops

    warm_page_cache(d)
    ray.data.range(1000, override_num_blocks=num_cpus * 2).map_batches(
        lambda b: b, batch_format="pyarrow"
    ).materialize()
    ds = ray.data.read_parquet(
        [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    )
    n_docs = ds.count()
    t0 = time.perf_counter()
    out = textops.minhash_dedup(ds, threshold=0.7).to_pandas()  # consume the Dataset
    dt = time.perf_counter() - t0
    ray.shutdown()
    return {
        "metric": f"sec: MinHash-LSH dedup over {n_docs} docs",
        "value": round(dt, 3),
        "unit": "sec",
        "num_cpus": num_cpus,
        "n_docs": int(n_docs),
        "docs_per_sec": round(n_docs / dt, 1),
        "n_dups": int((~out["keep"]).sum()),
    }


def steal_jiffies() -> int:
    """Cumulative hypervisor CPU-steal (jiffies) from /proc/stat field 9 —
    the ONE shared parser every bench's steal screen uses (bench.py,
    tools/bench_streamops.py, tools/bench_dedup_shard.py)."""
    return int(open("/proc/stat").readline().split()[8])


def _cpu_ceiling(n_lo: int, n_hi: int) -> float:
    """Hardware parallel-scaling ceiling: aggregate sha256 throughput of
    n_lo vs n_hi plain processes. This box exposes 32 hyperthreads over ~16
    physical cores, so 8→32 tops out at ~0.62 even for embarrassingly
    parallel C code — the ceiling contextualizes the engine's number."""
    import hashlib
    import multiprocessing as mp
    import time as _t

    def spin(q):
        data = b"x" * 65536
        t0 = _t.perf_counter()
        n = 0
        while _t.perf_counter() - t0 < 3.0:
            hashlib.sha256(data).digest()
            n += 1
        q.put(n)

    agg = {}
    for n in (n_lo, n_hi):
        q = mp.Queue()
        ps = [mp.Process(target=spin, args=(q,)) for _ in range(n)]
        [p.start() for p in ps]
        [p.join() for p in ps]
        agg[n] = sum(q.get() for _ in ps)
    return agg[n_hi] / agg[n_lo] / (n_hi / n_lo)


def run_scaling() -> None:
    """Same corpus + pipeline at two parallelism levels (N and 4N CPUs) in
    fresh processes; two repetitions per level, min taken (standard
    noise-floor practice on a shared box)."""
    n_lo = int(os.environ.get("SCALE_N", "4"))
    n_hi = 4 * n_lo
    reps = int(os.environ.get("SCALE_REPS", "2"))
    compute = "--compute" in sys.argv
    extra = ["--bench-compute"] if compute else []

    best: dict[int, dict] = {}
    screen: dict[int, dict] = {}
    for ncpu in (n_lo, n_hi):
        clean_runs = 0
        attempts = 0
        # the host hypervisor steals CPU in bursts; a stolen run measures the
        # neighbor's load, not this engine — retry until `reps` clean runs
        # (steal < 5% of the run's CPU budget) or the attempt cap
        while clean_runs < reps and attempts < reps + 4:
            attempts += 1
            s0 = steal_jiffies()
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                       BENCH_SUITE_REPS="1")
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)] + extra,
                env=env, capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout
            r = json.loads(out.strip().splitlines()[-1])
            stolen = (steal_jiffies() - s0) / 100.0
            r["steal_core_s"] = round(stolen, 1)
            contaminated = stolen > 0.05 * ncpu * r["value"]
            if not contaminated:
                clean_runs += 1
            # min-of-attempts is safe: steal only SLOWS a run, so a
            # contaminated attempt can never beat a clean one
            if ncpu not in best or r["value"] < best[ncpu]["value"]:
                best[ncpu] = r
        screen[ncpu] = {"clean": clean_runs, "attempts": attempts}
    t_lo, t_hi = best[n_lo]["value"], best[n_hi]["value"]
    eff = (t_lo / t_hi) / (n_hi / n_lo)
    ceiling = _cpu_ceiling(n_lo, n_hi)
    rate_key = "docs_per_sec" if compute else "files_per_sec"
    print(json.dumps({
        "pipeline": "minhash_dedup" if compute else "validation_suite",
        "n_lo": n_lo,
        "n_hi": n_hi,
        # a level with clean == 0 exhausted its attempt cap on stolen runs:
        # the number below is NOT screened — do not record it as criterion
        # evidence (BENCH/BASELINE.md protocol)
        "steal_screen": {str(k): v for k, v in screen.items()},
        f"sec_{n_lo}": t_lo,
        f"sec_{n_hi}": t_hi,
        f"{rate_key}_{n_lo}": best[n_lo][rate_key],
        f"{rate_key}_{n_hi}": best[n_hi][rate_key],
        "speedup": round(t_lo / t_hi, 3),
        "scaling_efficiency": round(eff, 3),
        "hardware_ceiling_efficiency": round(ceiling, 3),
        "efficiency_vs_ceiling": round(eff / ceiling, 3),
    }))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    elif "--bench-compute" in sys.argv:
        print(json.dumps(run_bench_compute()))
    else:
        print(json.dumps(run_bench()))
