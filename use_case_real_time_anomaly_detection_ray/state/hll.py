"""HyperLogLog distinct-count sketch (Flajolet et al. 2007), mergeable by
per-register max — the distributed shape: each block emits its non-zero
(register, rank) rows, a bucketed max-merge completes every register, and
the driver folds at most 2^p tiny rows into the estimate.

Hashes must be uniform 64-bit (callers use blake2b-8 via
``functions.text.hash64`` — process-independent, so distributed partials
reproduce bit-for-bit). Standard error ≈ 1.04/sqrt(2^p): p=14 → 0.81 %.

The estimator applies linear counting below the small-range threshold
(E ≤ 2.5·m with empty registers) and the raw HLL formula elsewhere; the
empirical bias-correction table of HLL++ is deliberately omitted (a
constants table, not an algorithmic difference — documented accuracy is
pinned by tests at three corpus scales).
"""

from __future__ import annotations

import numpy as np


def register_rows(hashes: np.ndarray, p: int = 14) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rank) per hash, vectorized.

    Register = top ``p`` bits; rank = 1 + count of leading zeros in the
    remaining ``64-p`` bits (so rank ∈ [1, 64-p+1], the all-zeros tail
    mapping to the maximum)."""
    h = np.ascontiguousarray(hashes, dtype=np.uint64)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h << np.uint64(p)  # remaining bits, left-aligned in 64
    # vectorized clz via binary reduction
    lz = np.zeros(h.shape, np.int64)
    shift = 32
    cur = w.copy()
    while shift:
        s = np.uint64(shift)
        mask = cur < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        cur[mask] = cur[mask] << s
        shift >>= 1
    rank = np.minimum(lz, 64 - p) + 1  # clz==64 (w==0) caps at 64-p+1
    return reg, rank


def fold_registers(reg: np.ndarray, rank: np.ndarray, p: int = 14) -> np.ndarray:
    """Dense register array (length 2^p) from sparse (register, rank) rows."""
    m = 1 << p
    regs = np.zeros(m, np.int64)
    np.maximum.at(regs, np.asarray(reg, np.int64), np.asarray(rank, np.int64))
    return regs


def merge_registers(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate(regs: np.ndarray) -> float:
    """Cardinality estimate from a dense register array."""
    m = regs.size
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if e <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))  # linear counting, small range
    return float(e)
