"""Microbench: DedupShard.check_and_add steady-state throughput on 1 M-key
batches, vs the round-4 per-row set-loop implementation (re-created inline).

Usage: python tools/bench_dedup_shard.py

Shape mirrors deployment: one long-lived shard absorbing a stream of 1 M-key
ticks (keys ~U[0, 6M) → a realistic new/seen mix that ends ~4.8 M distinct).
Steady-state = mean of the last 8 of 16 batches, so one-off costs (table
growth, first-touch page faults — both amortized over a shard's lifetime)
don't flatter either side. Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


class _OldShard:
    """round-4 dedup_index.py:34-43 — per-row Python set loop."""

    def __init__(self) -> None:
        self._seen: set[int] = set()

    def check_and_add(self, hashes: np.ndarray, tick: str = "") -> np.ndarray:
        seen = self._seen
        out = np.empty(len(hashes), bool)
        for i, h in enumerate(hashes.tolist()):
            if h in seen:
                out[i] = False
            else:
                seen.add(h)
                out[i] = True
        return out


def _steal() -> int:
    from bench import steal_jiffies  # the one shared /proc/stat parser
    return steal_jiffies()


def main() -> None:
    from use_case_real_time_anomaly_detection_ray.state import dedup_index as D

    new_cls = D.DedupShard.__ray_metadata__.modified_class  # no Ray session needed
    rng = np.random.default_rng(0)
    batches = [rng.integers(0, 6_000_000, 1_000_000).astype(np.uint64)
               for _ in range(16)]

    def run(cls):
        shard = cls()
        times, outs = [], []
        for i, b in enumerate(batches):
            t0 = time.perf_counter()
            outs.append(shard.check_and_add(b, f"t{i}"))
            times.append(time.perf_counter() - t0)
        warm = times[8:]
        return len(warm) / sum(warm), outs, [round(t * 1e3) for t in times]

    s0 = _steal()
    old_thr, old_out, old_ms = run(_OldShard)
    new_thr, new_out, new_ms = run(new_cls)
    for a, b in zip(old_out, new_out):
        assert (a == b).all(), "mask mismatch vs old implementation"
    print(json.dumps({
        "metric": "DedupShard steady-state M keys/s, 1M-key batches (last 8 of 16)",
        "old_mkeys_s": round(old_thr, 2),
        "new_mkeys_s": round(new_thr, 2),
        "speedup": round(new_thr / old_thr, 2),
        "old_batch_ms": old_ms,
        "new_batch_ms": new_ms,
        "steal_jiffies": _steal() - s0,
        "masks_identical": True,
    }))


if __name__ == "__main__":
    main()
