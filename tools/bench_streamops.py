"""At-scale measurement of the stream operators (sessionize / range join /
tumbling agg) over a deterministic synthetic events corpus. Results recorded
in BENCH/BASELINE.md ("Event-stream operators at scale").

Usage (fresh process per parallelism level, like bench.py --scaling)::

    EV_DIR=/tmp/rtad_events_40m EV_PARTS=64 python tools/bench_streamops.py gen
    EV_DIR=/tmp/rtad_events_40m EV_PARTS=64 EV_BLOCKS=128 \
        python tools/bench_streamops.py run <num_cpus> [op]
    # two parallelism levels in fresh processes, steal-screened min-of-reps
    # (bench.py --scaling protocol), e.g. the partial-runs sessionizer over
    # the time-sliced corpus:
    EV_DIR=/tmp/rtad_events_100m_sorted EV_PARTS=160 EV_USERS=20000 \
        EV_SORTED=1 EV_BLOCKS=160 SCALE_N=2 \
        python tools/bench_streamops.py scaling sessionize_partial
"""
import json
import os
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "mimalloc")
os.environ.setdefault("MIMALLOC_ALLOW_LARGE_OS_PAGES", "1")
os.environ.setdefault("MIMALLOC_PURGE_DELAY", "-1")
os.environ.setdefault("MIMALLOC_RESET_DELAY", "-1")
os.environ.setdefault("MIMALLOC_ARENA_EAGER_COMMIT", "1")
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DIR = os.environ.get("EV_DIR", "/tmp/rtad_events_10m")
PARTS, ROWS = int(os.environ.get("EV_PARTS", "16")), 625_000
N_USERS = int(os.environ.get("EV_USERS", "100000"))
# EV_SORTED=1: each part covers a contiguous slice of the 30-day span with
# timestamps sorted inside the part — the hourly/daily-dump layout real
# event logs land in, and the layout sessionize(partial_runs=True) exploits
SORTED = os.environ.get("EV_SORTED", "0") == "1"
SPAN_US = 30 * 86400 * 1_000_000


def gen():
    os.makedirs(DIR, exist_ok=True)
    if os.path.exists(os.path.join(DIR, "_COMPLETE")):
        print("cached")
        return
    base = 1_700_000_000_000_000  # epoch us
    types = np.array(["click", "view", "purchase", "signup", "error"])
    for p in range(PARTS):
        rng = np.random.default_rng(1234 + p)
        n = ROWS
        if SORTED:
            lo = SPAN_US * p // PARTS
            hi = SPAN_US * (p + 1) // PARTS
            ts = np.sort(rng.integers(lo, hi, n))
        else:
            ts = rng.integers(0, SPAN_US, n)
        t = pa.table({
            "event_id": pa.array(np.arange(p * n, (p + 1) * n), pa.int64()),
            "ts": pa.array(base + ts, pa.int64()).cast(pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, N_USERS, n), pa.int64()),
            "event_type": pa.array(types[rng.integers(0, 5, n)], pa.string()),
            "value": pa.array(np.floor(rng.uniform(0, 100, n) * 100 + 0.5)
                              / 100.0, pa.float64()),
        })
        pq.write_table(t, os.path.join(DIR, f"events_{p:02d}.parquet"))
    open(os.path.join(DIR, "_COMPLETE"), "w").write("ok")
    print("generated", PARTS * ROWS)


def run(num_cpus: int, only: str | None):
    import ray
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import ray.data as rd

    from use_case_real_time_anomaly_detection_ray.pipelines import streamops as SO

    def read(cols):
        return rd.read_parquet(DIR, columns=cols, override_num_blocks=int(os.environ.get("EV_BLOCKS", "64")))

    def consume(ds):
        # stream to a count, never a driver collect
        return ds.count()

    ops = {
        "sessionize": lambda: consume(SO.sessionize(
            read(["user_id", "ts", "event_id", "value"]))),
        "sessionize_partial": lambda: consume(SO.sessionize(
            read(["user_id", "ts", "event_id", "value"]),
            partial_runs=True)),
        "range_join": lambda: consume(SO.range_join_count(
            SO._pick_type(read(["event_id", "user_id", "ts", "event_type"]),
                          "purchase"),
            SO._pick_type(read(["event_id", "user_id", "ts", "event_type"]),
                          "view"))),
        "tumbling": lambda: consume(SO.tumbling_agg(
            read(["ts", "event_type", "user_id", "value"]))),
    }
    out = {"num_cpus": num_cpus, "rows": PARTS * ROWS}
    for name, fn in ops.items():
        if only and name != only:
            continue
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        out[name] = {"sec": round(dt, 2), "out_rows": n,
                     "events_per_sec": round(PARTS * ROWS / dt)}
    ray.shutdown()
    print(json.dumps(out))


def scaling(op: str):
    """Same corpus + operator at N and 4N CPUs in fresh processes;
    min-of-reps per level, hypervisor-steal-screened like bench.py
    --scaling (a stolen run measures the neighbor's load, not the engine)."""
    import subprocess

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import steal_jiffies

    n_lo = int(os.environ.get("SCALE_N", "2"))
    n_hi = 4 * n_lo
    reps = int(os.environ.get("SCALE_REPS", "2"))

    best: dict[int, float] = {}
    screen: dict[int, dict] = {}
    for ncpu in (n_lo, n_hi):
        clean, attempts = 0, 0
        while clean < reps and attempts < reps + 4:
            attempts += 1
            s0 = steal_jiffies()
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "run",
                 str(ncpu), op],
                capture_output=True, text=True, check=True,
            ).stdout
            sec = json.loads(out.strip().splitlines()[-1])[op]["sec"]
            stolen = (steal_jiffies() - s0) / 100.0
            if stolen <= 0.05 * ncpu * sec:
                clean += 1
            # min-of-attempts is safe: steal only slows a run
            if ncpu not in best or sec < best[ncpu]:
                best[ncpu] = sec
        screen[ncpu] = {"clean": clean, "attempts": attempts}
    eff = (best[n_lo] / best[n_hi]) / (n_hi / n_lo)
    rows = PARTS * ROWS
    print(json.dumps({
        "pipeline": op, "rows": rows, "n_lo": n_lo, "n_hi": n_hi,
        # clean == 0 at a level -> the number is unscreened; don't record it
        "steal_screen": {str(k): v for k, v in screen.items()},
        f"sec_{n_lo}": best[n_lo], f"sec_{n_hi}": best[n_hi],
        f"events_per_sec_{n_lo}": round(rows / best[n_lo]),
        f"events_per_sec_{n_hi}": round(rows / best[n_hi]),
        "speedup": round(best[n_lo] / best[n_hi], 3),
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen()
    elif sys.argv[1] == "scaling":
        scaling(sys.argv[2])
    else:
        run(int(sys.argv[2]), sys.argv[3] if len(sys.argv) > 3 else None)
