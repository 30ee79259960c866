"""Event-stream operators a large-scale pipeline needs that Ray Data lacks
natively: gap sessionization, as-of join, tumbling-window aggregation, and
deterministic hash-stratified sampling — each as a distributed composition
of ``map_batches`` + the bucketed-merge discipline (`stages/reduce.py`), and
each oracle-paired (DuckDB window functions / ASOF JOIN / md5 reproduce the
exact semantics, so the driver gets rows+schema+hash checks, not rows-only).

Partitioning assumptions (documented per the custom-operator contract):

- ``sessionize`` / ``asof_join`` need each key's full history co-located;
  they hash-bucket by ``user_id`` and sort within the bucket. The shuffle
  ships only the pruned working columns, never the full row. A pathological
  single hot user lands in one task — the same bound any per-key window has.
- ``tumbling_agg`` pre-aggregates blocks to per-(window, type, user)
  partials with Arrow ``group_by``, then ONE shuffle keyed on
  (window, type) finishes each group's exact distinct-user fold locally.
- ``hash_sample`` is stateless map-only — embarrassingly parallel at any
  scale.

Float determinism (BENCH/BASELINE.md tricks): money-like ``value`` sums go
through the shared half-up integer-cents form ``floor(value*100 + 0.5)`` on
BOTH engine and oracle sides; timestamps are compared as μs integers.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..sources.readers import read_table
from ..stages.reduce import bucketed_merge_arrow
from ..stages.salt import key_salt

_US_PER_HOUR = 3_600_000_000
SESSION_GAP_US = 1_800_000_000  # 30 min
# Rows per run-fold batch in sessionize(partial_runs=True). An EXPLICIT
# batch size matters here: fused onto a parquet read, ``batch_size=None``
# hands the UDF the reader's ~10k-row micro-batches, and a fold over a
# micro-batch shrinks almost nothing (measured 1.27× on a corpus whose
# whole-file fold shrinks 17×). 1M rows ≈ 32 MB buffered per task.
SESSION_FOLD_ROWS = 1_000_000


def _cents(v: np.ndarray) -> np.ndarray:
    """Shared half-up 2-decimal integerization (same formula as the SQL).
    Nulls fail LOUDLY: ``floor(NaN)`` casts to INT64_MIN garbage that would
    silently corrupt a sum, while the paired SQL ``SUM`` skips NULLs — a
    null `value` is a data-contract violation, not a row to invent."""
    if np.isnan(v).any():
        raise ValueError(
            f"{int(np.isnan(v).sum())} null `value` rows — the value column "
            "must be non-null (SQL SUM would skip them; an integer-cents sum "
            "cannot represent that silently)"
        )
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def _pick_type(events: "ray.data.Dataset", kind: str) -> "ray.data.Dataset":
    """Filter to one ``event_type`` and drop the column — filter+project
    fused in ONE stage (Ray skips UDFs on empty blocks; a separate project
    stage would lose the schema when everything filters out)."""

    def f(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["event_type"], kind)) \
                .drop_columns(["event_type"])

    return events.map_batches(f, batch_format="pyarrow", batch_size=None)


# --------------------------------------------------------------------------
# gap sessionization
# --------------------------------------------------------------------------

def _empty_sessions() -> pa.Table:
    return pa.table({
        "user_id": pa.array([], pa.int64()),
        "session_id": pa.array([], pa.int64()),
        "session_start": pa.array([], pa.timestamp("us")),
        "session_end": pa.array([], pa.timestamp("us")),
        "n_events": pa.array([], pa.int64()),
        "sum_value": pa.array([], pa.float64()),
    })


def sessionize(
    events: "ray.data.Dataset",
    gap_us: int = SESSION_GAP_US,
    num_buckets: int = 64,
    partial_runs: bool = False,
) -> "ray.data.Dataset":
    """Split each user's event stream into sessions at inactivity gaps
    > ``gap_us``; emit one row per session with start/end/count/value sum.

    Distributed shape: hash-bucket by ``user_id`` (full per-user history in
    one task — the minimum any sessionizer needs), then a fully vectorized
    all-Arrow/numpy in-bucket pass: one lexsort by (user, ts, event_id),
    run-boundary detection with shifted compares, and ``np.add.reduceat``
    over the session runs. No per-user Python loop, no pandas round-trip
    of the shuffled rows.

    ``partial_runs=True`` selects the scale path for time-clustered inputs
    (real event logs land as hourly/daily files): each block first folds
    its own rows into maximal per-user runs (consecutive events ≤
    ``gap_us`` apart) and only the run summaries ``(user, start, end, n,
    cents)`` shuffle — on time-partitioned layouts that is orders of
    magnitude fewer rows than the events themselves. The stitch is exact,
    not approximate: a session of the union is a connected component of
    events under "gap ≤ threshold" adjacency, and any event inside a run's
    time interval lies within ``gap_us`` of some event of that run (two
    consecutive run events straddle it at ≤ ``gap_us``), so merging runs
    sorted by start whenever ``start ≤ running-max-end + gap_us`` — the
    classic interval-union sweep, with a per-user grouped cummax — yields
    exactly the single-pass sessions; counts and cents sums are
    permutation-invariant integer folds. Both paths are pinned
    bitwise-identical by test. On uniformly shuffled inputs runs ≈ events
    and the extra pass buys nothing — keep the default there."""
    if partial_runs:
        return _sessionize_partial(events, gap_us, num_buckets)

    def merge(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        eid = g["event_id"].to_numpy()
        cents = _cents(g["value"].to_numpy())
        order = np.lexsort((eid, ts, uid))
        uid, ts, cents = uid[order], ts[order], cents[order]
        n = len(uid)
        if n == 0:
            return _empty_sessions()
        new_user = np.empty(n, bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        new_s = new_user.copy()
        new_s[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(new_s)              # session run starts
        counts = np.diff(np.append(starts, n))
        # 1-based session index per user: run number minus the run number at
        # the user's first session
        run = np.cumsum(new_s)
        user_starts = np.flatnonzero(new_user)
        user_counts = np.diff(np.append(user_starts, n))
        run_at_user_start = np.repeat(run[user_starts], user_counts)
        sid_rows = run - run_at_user_start + 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_id": pa.array(sid_rows[starts], pa.int64()),
            "session_start": pa.array(ts[starts], pa.int64())
                               .cast(pa.timestamp("us")),
            # within a session ts is sorted: the end is the run's last row
            "session_end": pa.array(ts[starts + counts - 1], pa.int64())
                             .cast(pa.timestamp("us")),
            "n_events": pa.array(counts, pa.int64()),
            "sum_value": pa.array(np.add.reduceat(cents, starts) / 100.0,
                                  pa.float64()),
        })

    return bucketed_merge_arrow(events, ["user_id"], merge, num_buckets)


def _sessionize_partial(
    events: "ray.data.Dataset",
    gap_us: int,
    num_buckets: int,
) -> "ray.data.Dataset":
    """The ``partial_runs=True`` body of :func:`sessionize` — see there for
    the exactness argument. Stage 1 (map-only) folds each block into
    maximal per-user runs; stage 2 hash-buckets the run summaries by user
    and stitches with the interval-union sweep."""

    def to_runs(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy()
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = _cents(t["value"].to_numpy())
        order = np.lexsort((ts, uid))
        uid, ts, cents = uid[order], ts[order], cents[order]
        n = len(uid)
        if n == 0:
            starts = np.zeros(0, np.int64)
            counts = starts
        else:
            new_s = np.empty(n, bool)
            new_s[0] = True
            new_s[1:] = (uid[1:] != uid[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
            starts = np.flatnonzero(new_s)
            counts = np.diff(np.append(starts, n))
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "__rs": pa.array(ts[starts], pa.int64()),
            "__re": pa.array(ts[starts + counts - 1], pa.int64()),
            "__rn": pa.array(counts, pa.int64()),
            "__rc": pa.array(np.add.reduceat(cents, starts)
                             if n else np.zeros(0, np.int64), pa.int64()),
        })

    def merge_runs(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        rs, re_ = g["__rs"].to_numpy(), g["__re"].to_numpy()
        rn, rc = g["__rn"].to_numpy(), g["__rc"].to_numpy()
        order = np.lexsort((re_, rs, uid))
        uid, rs, re_, rn, rc = (a[order] for a in (uid, rs, re_, rn, rc))
        m = len(uid)
        if m == 0:
            return _empty_sessions()
        new_user = np.empty(m, bool)
        new_user[0] = True
        new_user[1:] = uid[1:] != uid[:-1]
        # per-user running max of run ends (runs from different blocks can
        # nest/overlap, so the previous row's end alone is not enough);
        # grouped cummax is one vectorized C pass over the SHRUNK run table
        cm = pd.Series(re_).groupby(uid).cummax().to_numpy()
        brk = new_user.copy()
        brk[1:] |= rs[1:] > cm[:-1] + gap_us
        starts = np.flatnonzero(brk)
        counts = np.diff(np.append(starts, m))
        o = len(starts)
        user_starts = np.flatnonzero(new_user[starts])
        user_counts = np.diff(np.append(user_starts, o))
        sid = np.arange(o) - np.repeat(user_starts, user_counts) + 1
        return pa.table({
            "user_id": pa.array(uid[starts], pa.int64()),
            "session_id": pa.array(sid, pa.int64()),
            "session_start": pa.array(rs[starts], pa.int64())
                               .cast(pa.timestamp("us")),
            "session_end": pa.array(np.maximum.reduceat(re_, starts),
                                    pa.int64()).cast(pa.timestamp("us")),
            "n_events": pa.array(np.add.reduceat(rn, starts), pa.int64()),
            "sum_value": pa.array(np.add.reduceat(rc, starts) / 100.0,
                                  pa.float64()),
        })

    runs = events.map_batches(to_runs, batch_format="pyarrow",
                              batch_size=SESSION_FOLD_ROWS)
    return bucketed_merge_arrow(runs, ["user_id"], merge_runs, num_buckets)


def _tag_side(side: int):
    """Stamp the side flag and normalize the schema for the Arrow union:
    a right side without ``event_id`` gets a constant -1 column (the value
    is never read for right rows, but heterogeneous-schema unions would
    otherwise null-promote the int column)."""

    def f(t: pa.Table) -> pa.Table:
        if "event_id" not in t.column_names:
            t = t.append_column(
                "event_id", pa.array(np.full(t.num_rows, -1, np.int64)))
        t = t.select(["event_id", "user_id", "ts"])
        return t.append_column(
            "__side", pa.array(np.full(t.num_rows, side, np.int8)))

    return f


# --------------------------------------------------------------------------
# as-of join
# --------------------------------------------------------------------------

def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """LEFT AS-OF join: each left row (event_id, user_id, ts) matches the
    latest right (user_id, ts) with ``right.ts <= left.ts``; unmatched rows
    keep NULLs (DuckDB ``ASOF LEFT JOIN`` semantics).

    Distributed shape: tag the two sides, union, hash-bucket by key, then a
    single vectorized all-Arrow/numpy merge-scan per bucket — lexsort by
    (user, ts, side) with the right side first at equal ts (``<=``), carry
    the last right-row index forward with a masked ``maximum.accumulate``
    (reset at user boundaries by comparing against the row's own user-run
    start), and emit the left rows. O(n log n) per bucket, no per-key loop,
    no pandas round-trip; only the pruned key/ts columns shuffle."""

    lt = left.map_batches(_tag_side(1), batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(_tag_side(0), batch_format="pyarrow",
                           batch_size=None)
    both = lt.union(rt)

    def merge(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        side = g["__side"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((side, ts, uid))
        uid, ts, side, eid = uid[order], ts[order], side[order], eid[order]
        n = len(uid)
        is_right = side == 0
        # index of the latest right row at-or-before each position; entries
        # pointing before the row's own user run are cross-user garbage
        idx = np.where(is_right, np.arange(n), -1)
        acc = np.maximum.accumulate(idx) if n else idx
        if n:
            new_user = np.empty(n, bool)
            new_user[0] = True
            new_user[1:] = uid[1:] != uid[:-1]
            user_starts = np.flatnonzero(new_user)
            user_counts = np.diff(np.append(user_starts, n))
            run_start_row = np.repeat(user_starts, user_counts)
        else:
            run_start_row = idx
        is_left = ~is_right
        acc_l = acc[is_left]
        miss = acc_l < run_start_row[is_left]
        view_us = ts[np.where(miss, 0, acc_l)]
        out_ts = ts[is_left]
        # nullable construction straight in Arrow (no object-dtype pass)
        view_arr = pa.array(view_us, pa.int64(),
                            mask=miss).cast(pa.timestamp("us"))
        gap_arr = pa.array(out_ts - view_us, pa.int64(), mask=miss)
        return pa.table({
            "event_id": pa.array(eid[is_left], pa.int64()),
            "user_id": pa.array(uid[is_left], pa.int64()),
            "ts": pa.array(out_ts, pa.int64()).cast(pa.timestamp("us")),
            "matched_ts": view_arr,
            "gap_us": gap_arr,
        })

    return bucketed_merge_arrow(both, ["user_id"], merge, num_buckets)


# --------------------------------------------------------------------------
# range (interval) join
# --------------------------------------------------------------------------

def range_join_count(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    lookback_us: int = _US_PER_HOUR,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Per-key range join, aggregated: for each left row count the right
    rows of the same ``user_id`` with ``ts`` in ``(left.ts - lookback_us,
    left.ts]``. The classic "events in the preceding window" interval join.

    Distributed shape: same tag-union + key-bucket co-location as
    :func:`asof_join`; per bucket, ONE pair of ``np.searchsorted`` calls
    over the (user-offset + ts) composite key counts every left row's
    interval at once — no per-row or per-user Python loop, O(n log n) per
    bucket. Only (user_id, ts, event_id) columns shuffle."""

    lt = left.map_batches(_tag_side(1), batch_format="pyarrow",
                          batch_size=None)
    rt = right.map_batches(_tag_side(0), batch_format="pyarrow",
                           batch_size=None)
    both = lt.union(rt)

    def merge(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        side = g["__side"].to_numpy()
        # composite sort key: dense-user-index * span + ts-offset gives each
        # user a disjoint key range, so ONE searchsorted pass serves every
        # user. Interval lower bounds are clamped to the row's own user base
        # so a lookback reaching past the user's earliest event can never
        # bleed into the previous user's range.
        order = np.lexsort((ts, uid))
        uid_s, ts_s, side_s = uid[order], ts[order], side[order]
        uniq, dense = np.unique(uid_s, return_inverse=True)
        ts0 = ts_s.min() if len(ts_s) else 0
        span = (ts_s.max() - ts0 + 1) if len(ts_s) else 1
        if len(uniq) and len(uniq) > (2 ** 62) // span:
            raise OverflowError(
                f"{len(uniq)} users × {span} μs span overflows the composite "
                "key — raise num_buckets"
            )
        key_s = dense * span + (ts_s - ts0)
        r_mask = side_s == 0
        r_keys = key_s[r_mask]
        l_mask = ~r_mask
        l_keys = key_s[l_mask]
        base_l = dense[l_mask] * span
        # lower bound is EXCLUSIVE ((ts-L, ts], matching `v.ts > p.ts - L`):
        # first key strictly greater than l_key - lookback
        lo = np.searchsorted(r_keys,
                             np.maximum(l_keys - lookback_us + 1, base_l),
                             side="left")
        hi = np.searchsorted(r_keys, l_keys, side="right")
        eid = g["event_id"].to_numpy()[order][l_mask]
        return pa.table({
            "event_id": pa.array(eid, pa.int64()),
            "user_id": pa.array(uid_s[l_mask], pa.int64()),
            "ts": pa.array(ts_s[l_mask], pa.int64()).cast(pa.timestamp("us")),
            "n_in_window": pa.array(hi - lo, pa.int64()),
        })

    return bucketed_merge_arrow(both, ["user_id"], merge, num_buckets)


# --------------------------------------------------------------------------
# tumbling-window aggregate
# --------------------------------------------------------------------------

#: user-hash subbuckets for the two-level distinct fold (1 = single-level).
#: Tests force both paths and pin them equal (the GATES_DRIVER_BELOW pattern).
TUMBLING_USER_SUBBUCKETS = 16


def tumbling_agg(
    events: "ray.data.Dataset",
    window_us: int = _US_PER_HOUR,
    num_buckets: int = 64,
    hop_us: int | None = None,
    user_subbuckets: int | None = None,
) -> "ray.data.Dataset":
    """Per (time window, event_type): event count, DISTINCT user count,
    min/max value, exact-cents value sum. Tumbling by default; pass
    ``hop_us`` (a divisor of ``window_us``) for HOPPING windows — each
    event then contributes to its ``window/hop`` covering windows (the
    explosion happens inside the per-block partial, BEFORE the Arrow
    group-by shrink, so the shuffle still carries per-(window, type, user)
    partials, amplified only by the overlap factor).

    Distributed shape: blocks pre-aggregate to per-(window, type, user)
    partials with Arrow ``group_by`` (SIMD hash — a pandas groupby here was
    the dominant cost when key cardinality approaches row count and the
    partial barely shrinks), then a TWO-LEVEL distinct fold: shuffle 1 is
    keyed on (window, type, user-hash subbucket) — all partials of one user
    share a subbucket (``stages.salt.key_salt``), so each shuffle group
    computes an exact per-subbucket distinct-user count and collapses to ONE
    row — and shuffle 2 sums the ≤``user_subbuckets`` tiny per-subbucket
    rows per (window, type). A hot window (10^9 distinct users in one hour)
    therefore costs max-subbucket per task, not all-users-in-one-task, and
    the second shuffle moves only windows × types × subbuckets rows.
    ``user_subbuckets=1`` keeps the single-shuffle fold (exercised and
    pinned output-equal by tests); both paths produce bitwise-identical
    results (integer-cents sums, min/max, and the end-only /100 division
    are associative-exact)."""
    if hop_us is not None and (hop_us <= 0 or window_us % hop_us):
        raise ValueError("hop_us must be a positive divisor of window_us")
    subb = TUMBLING_USER_SUBBUCKETS if user_subbuckets is None else user_subbuckets
    if subb < 1:
        raise ValueError("user_subbuckets must be >= 1")

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        if hop_us is not None:
            r = window_us // hop_us
            idx = np.repeat(np.arange(len(ts)), r)
            j = np.tile(np.arange(r, dtype=np.int64), len(ts))
            win = (ts[idx] // hop_us - j) * hop_us
            t = t.take(pa.array(idx))
            ts = ts[idx]
        else:
            win = ts // window_us * window_us
        tt = pa.table({
            "win_us": pa.array(win, pa.int64()),
            "event_type": t["event_type"],
            "user_id": t["user_id"],
            "cents": pa.array(_cents(t["value"].to_numpy()), pa.int64()),
            "value": t["value"],
        })
        a = tt.group_by(["win_us", "event_type", "user_id"],
                        use_threads=False).aggregate(
            [("cents", "count"), ("cents", "sum"),
             ("value", "min"), ("value", "max")])
        cols = {
            "win_us": a["win_us"], "event_type": a["event_type"],
            "user_id": a["user_id"], "n": a["cents_count"],
            "cents": a["cents_sum"], "mn": a["value_min"],
            "mx": a["value_max"],
        }
        if subb > 1:
            # per-KEY salt after the shrink: all partials of one user share
            # a subbucket, so per-subbucket distinct-user counts stay exact
            cols["__subb"] = pa.array(key_salt(a["user_id"], subb))
        return pa.table(cols)

    partials = events.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None)

    def _project(f: pa.Table, n_col: str, users_col: str, cents_col: str,
                 mn_col: str, mx_col: str) -> pa.Table:
        return pa.table({
            "window_start": f["win_us"].cast(pa.timestamp("us")),
            "event_type": f["event_type"],
            "n_events": f[n_col].cast(pa.int64()),
            "n_users": f[users_col].cast(pa.int64()),
            "min_value": f[mn_col],
            "max_value": f[mx_col],
            "sum_value": pa.array(
                f[cents_col].to_numpy(zero_copy_only=False) / 100.0,
                pa.float64()),
        })

    def merge(g: pa.Table) -> pa.Table:
        u = g.group_by(["win_us", "event_type", "user_id"],
                       use_threads=False).aggregate(
            [("n", "sum"), ("cents", "sum"), ("mn", "min"), ("mx", "max")])
        f = u.group_by(["win_us", "event_type"], use_threads=False).aggregate(
            [("n_sum", "sum"), ("user_id", "count"),
             ("cents_sum", "sum"), ("mn_min", "min"), ("mx_max", "max")])
        return _project(f, "n_sum_sum", "user_id_count", "cents_sum_sum",
                        "mn_min_min", "mx_max_max")

    if subb == 1:
        return bucketed_merge_arrow(partials, ["win_us", "event_type"],
                                    merge, num_buckets)

    def merge_subbucket(g: pa.Table) -> pa.Table:
        # exact within the subbucket: one user's partials all land here
        u = g.group_by(["win_us", "event_type", "user_id"],
                       use_threads=False).aggregate(
            [("n", "sum"), ("cents", "sum"), ("mn", "min"), ("mx", "max")])
        f = u.group_by(["win_us", "event_type"], use_threads=False).aggregate(
            [("n_sum", "sum"), ("user_id", "count"),
             ("cents_sum", "sum"), ("mn_min", "min"), ("mx_max", "max")])
        return pa.table({
            "win_us": f["win_us"], "event_type": f["event_type"],
            "n": f["n_sum_sum"], "nu": f["user_id_count"],
            "cents": f["cents_sum_sum"], "mn": f["mn_min_min"],
            "mx": f["mx_max_max"],
        })

    def merge_final(g: pa.Table) -> pa.Table:
        f = g.group_by(["win_us", "event_type"], use_threads=False).aggregate(
            [("n", "sum"), ("nu", "sum"), ("cents", "sum"),
             ("mn", "min"), ("mx", "max")])
        return _project(f, "n_sum", "nu_sum", "cents_sum", "mn_min", "mx_max")

    per_subbucket = bucketed_merge_arrow(
        partials, ["win_us", "event_type", "__subb"], merge_subbucket,
        num_buckets)
    return bucketed_merge_arrow(per_subbucket, ["win_us", "event_type"],
                                merge_final, num_buckets)


# --------------------------------------------------------------------------
# deterministic hash-stratified sampling
# --------------------------------------------------------------------------

#: per-stratum keep thresholds over the md5 32-bit fraction space;
#: ``floor(rate * 2^32)`` — integers so engine and SQL compare identically
SAMPLE_THRESHOLDS = {"en": 2_147_483_648}   # 0.5
SAMPLE_DEFAULT_THRESHOLD = 1_073_741_824    # 0.25


def hash_sample(
    docs: "ray.data.Dataset",
    thresholds: dict[str, int] | None = None,
    default_threshold: int = SAMPLE_DEFAULT_THRESHOLD,
) -> "ray.data.Dataset":
    """Deterministic stratified sampling: keep a document iff the first 32
    bits of ``md5(str(doc_id))`` fall under its stratum's threshold. The
    same row is kept on every run, every engine, every cluster size —
    reproducible corpus subsets without a shuffle or an RNG seed protocol.
    Stateless map-only; filter+project fused in one stage (empty-block
    schema rule)."""
    th = dict(SAMPLE_THRESHOLDS if thresholds is None else thresholds)

    def f(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hv = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[:4], "big")
             for i in ids),
            np.int64, len(ids),
        )
        ix = pc.fill_null(
            pc.index_in(t["lang"], value_set=pa.array(list(th.keys()),
                                                      type=t["lang"].type)),
            len(th))
        vals = np.append(np.fromiter(th.values(), np.int64, len(th)),
                         default_threshold)
        cut = vals[ix.to_numpy(zero_copy_only=False).astype(np.int64)]
        return t.filter(pa.array(hv < cut))

    return docs.map_batches(f, batch_format="pyarrow", batch_size=None)


def window_funnel(
    events: "ray.data.Dataset",
    steps: tuple[str, ...],
    window_us: int = 48 * _US_PER_HOUR,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Funnel analysis per user — the earliest-completion variant of
    ClickHouse's ``windowFunnel`` (the reference engine's native funnel
    primitive, which Ray Data lacks): ``t_1 = min ts`` of step 1, then
    greedily ``t_{k+1} = min ts ≥ t_k`` of step k+1 (equal timestamps may
    progress); ``funnel_level`` = deepest k whose ``t_k − t_1 ≤ window``.
    This greedy-from-earliest definition is deterministic AND
    SQL-expressible (chained min-over-filtered joins), so the driver gets
    a full rows+schema+hash oracle — unlike CH's scan semantics.

    Output: one row per user that performed step 1 —
    ``(user_id, funnel_level, t_first)``.

    Distributed shape: filter to the step types (map-only, tagging each
    row with its step index), hash-bucket by user, then a fully
    vectorized per-bucket pass: ONE lexsort to composite
    (dense-user × span + ts) keys, and per funnel stage ONE
    ``np.searchsorted`` of the survivors' previous timestamps into that
    stage's key array — no per-user Python loop (the ``range_join_count``
    discipline). Only (user_id, ts, event_type) shuffle."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    if len(set(steps)) != len(steps):
        # index_in returns the FIRST matching position, so a repeated type
        # would silently alias two steps to one index → wrong funnel levels
        raise ValueError(f"funnel steps must be distinct, got {steps!r}")

    def tag(t: pa.Table) -> pa.Table:
        ix = pc.index_in(t["event_type"], value_set=pa.array(list(steps)))
        t = t.filter(pc.is_valid(ix))
        st = pc.drop_null(ix).cast(pa.int8())
        return pa.table({"user_id": t["user_id"], "ts": t["ts"],
                         "step": st})

    tagged = events.map_batches(tag, batch_format="pyarrow", batch_size=None)

    def merge(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy()
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        st = g["step"].to_numpy()
        order = np.lexsort((ts, uid))
        uid_s, ts_s, st_s = uid[order], ts[order], st[order]
        uniq, dense = np.unique(uid_s, return_inverse=True)
        ts0 = ts_s.min() if len(ts_s) else 0
        span = (ts_s.max() - ts0 + 1) if len(ts_s) else 1
        if len(uniq) and len(uniq) > (2 ** 62) // span:
            raise OverflowError(
                f"{len(uniq)} users × {span} μs span overflows the composite "
                "key — raise num_buckets"
            )
        key_s = dense * span + (ts_s - ts0)
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "funnel_level": pa.array([], pa.int64()),
            "t_first": pa.array([], pa.timestamp("us")),
        })
        if len(uniq) == 0:
            return empty
        # step 1: first event per user among step-0 rows
        m0 = st_s == 0
        d0, k0 = dense[m0], key_s[m0]
        if len(d0) == 0:  # bucket holds later-step events only
            return empty
        pos = np.searchsorted(d0, np.arange(len(uniq)), side="left")
        have = (pos < len(d0)) & (d0[np.minimum(pos, len(d0) - 1)]
                                  == np.arange(len(uniq)))
        users = np.flatnonzero(have)          # dense indices with a t1
        if users.size == 0:
            return empty
        t_key = k0[pos[users]]                # composite key of t1
        t1_key = t_key.copy()
        level = np.ones(users.size, np.int64)
        alive = np.ones(users.size, bool)
        for k in range(1, len(steps)):
            mk = st_s == k
            dk, kk = dense[mk], key_s[mk]
            idx = np.flatnonzero(alive)
            if idx.size == 0:
                break
            # first step-k event with composite key >= previous step's key;
            # landing past the user's range means no such event
            p = np.searchsorted(kk, t_key[idx], side="left")
            ok = (p < len(kk))
            ok[ok] = dk[np.minimum(p[ok], len(dk) - 1)] == users[idx[ok]]
            nxt = np.full(idx.size, -1, np.int64)
            nxt[ok] = kk[p[ok]]
            within = ok & (nxt - t1_key[idx] <= window_us)
            level[idx[within]] = k + 1
            t_key[idx[within]] = nxt[within]
            alive[idx[~within]] = False
        t1_us = (t1_key - users * span) + ts0
        return pa.table({
            "user_id": pa.array(uniq[users], pa.int64()),
            "funnel_level": pa.array(level, pa.int64()),
            "t_first": pa.array(t1_us, pa.int64()).cast(pa.timestamp("us")),
        })

    return bucketed_merge_arrow(tagged, ["user_id"], merge, num_buckets)


def json_field_agg(
    events: "ray.data.Dataset",
    field: str = "k",
    group_col: str = "event_type",
    props_col: str = "props",
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """Semi-structured extraction + aggregate: parse the JSON ``props_col``,
    pull integer ``$.field``, and aggregate per ``group_col`` — count,
    non-null count, sum, min, max. Rows whose props are missing/unparsable
    or lack the field count toward ``n`` but not the stats (SQL
    ``json_extract`` NULL semantics).

    Scale shape: the parse is inherently per-row (stdlib ``json`` — no
    Arrow kernel exists for arbitrary JSON), but it happens INSIDE the
    per-block partial which immediately shrinks to one row per group per
    block; the shuffle moves only those partials. The whole
    partial-and-merge path is Arrow ``group_by`` end-to-end: int64 values
    never round-trip through pandas float64 (which silently rounds above
    2^53), NULL group keys form their own group exactly as SQL's
    ``GROUP BY`` does, and the group column keeps its native type."""
    import json as _json

    def partial(t: pa.Table) -> pa.Table:
        vs: list[int | None] = []
        for p in t[props_col].to_pylist():
            v = None
            if p is not None:
                try:
                    x = _json.loads(p).get(field)
                except (ValueError, AttributeError):
                    x = None
                if isinstance(x, int) and not isinstance(x, bool):
                    v = x
            vs.append(v)
        base = pa.table({
            group_col: t[group_col],
            "v": pa.array(vs, pa.int64()),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        })
        g = base.group_by([group_col], use_threads=False).aggregate(
            [("one", "sum"), ("v", "count"), ("v", "sum"),
             ("v", "min"), ("v", "max")])
        return pa.table({
            group_col: g[group_col],
            "n": g["one_sum"],
            "n_with": g["v_count"].cast(pa.int64()),
            "sum_v": pc.fill_null(g["v_sum"], 0),
            "min_v": g["v_min"],
            "max_v": g["v_max"],
        })

    parts = events.map_batches(partial, batch_format="pyarrow",
                               batch_size=None)

    def merge(g: pa.Table) -> pa.Table:
        a = g.group_by([group_col], use_threads=False).aggregate(
            [("n", "sum"), ("n_with", "sum"), ("sum_v", "sum"),
             ("min_v", "min"), ("max_v", "max")])
        return pa.table({
            group_col: a[group_col],
            "n": a["n_sum"],
            "n_with": a["n_with_sum"],
            "sum_v": a["sum_v_sum"],
            "min_v": a["min_v_min"],
            "max_v": a["max_v_max"],
        })

    return bucketed_merge_arrow(parts, [group_col], merge, num_buckets)


def temperature_sample(
    docs: "ray.data.Dataset",
    part_col: str = "source",
    id_col: str = "doc_id",
    alpha: float = 0.3,
    target_frac: float = 0.5,
) -> "ray.data.Dataset":
    """Temperature-based source mixing: sample each partition with a
    keep-fraction proportional to ``n_s^alpha`` (the multilingual /
    multi-source rebalancing rule of LLM data prep — alpha < 1 upsamples
    small sources relative to their share, alpha = 1 is proportional).

    ``f_s = min(1, target_frac · N · n_s^α / Σ n_t^α / n_s)``, rounded
    half-up to 1e-6 so the oracle's POW/SUM compute the identical cut;
    a row is kept iff the first 32 bits of ``md5(str(id))`` fall under
    ``floor(f_s · 2^32)`` — the same deterministic, engine/cluster/layout
    independent pick as :func:`hash_sample`.

    Scale shape: one ``group_count`` over ``part_col`` (tiny), thresholds
    broadcast by closure, then a stateless map-only filter — no shuffle
    of the corpus.
    """
    from ..stages.reduce import group_count, to_arrow_single

    counts = to_arrow_single(group_count(
        docs.map_batches(lambda t: pa.table({part_col: t[part_col]}),
                         batch_format="pyarrow"),
        [part_col], out_col="n")).to_pandas()
    n = counts["n"].to_numpy(np.float64)
    ws = np.power(n, alpha)
    wsum = float(ws.sum())
    n_total = float(n.sum())
    fs = np.minimum(1.0, target_frac * n_total * ws / wsum / n)
    fs = np.floor(fs * 1e6 + 0.5) / 1e6
    cuts = {p: int(np.floor(f * 4294967296.0))
            for p, f in zip(counts[part_col], fs)}

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hv = np.fromiter(
            (int.from_bytes(
                hashlib.md5(str(i).encode()).digest()[:4], "big")
             for i in ids),
            np.int64, len(ids),
        )
        ix = pc.fill_null(
            pc.index_in(t[part_col], value_set=pa.array(list(cuts.keys()),
                                                        type=t[part_col].type)),
            len(cuts))
        vals = np.append(np.fromiter(cuts.values(), np.int64, len(cuts)), 0)
        cut = vals[ix.to_numpy(zero_copy_only=False).astype(np.int64)]
        return t.filter(pa.array(hv < cut))

    return docs.map_batches(f, batch_format="pyarrow", batch_size=None)


def cap_per_key(
    ds: "ray.data.Dataset",
    key: str,
    k: int,
    id_col: str,
) -> "ray.data.Dataset":
    """Deterministic per-key downsampling: keep at most ``k`` rows per key,
    chosen by md5 of the row id — a uniform 'random' pick that reproduces
    on any engine, cluster size or block layout (the per-domain /
    per-user capping step of web-corpus curation).

    Composition: add the hash column in a stateless map, then the existing
    ``top_k_by_key`` partial-reduce (per-block head shrinks before the
    shuffle; bucket merge re-heads). Output carries the hash as ``samp_h``
    so the pick is auditable."""
    import hashlib

    def add_h(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(str(x).encode()).hexdigest()
             for x in t[id_col].to_pylist()]
        return t.append_column("samp_h", pa.array(h, pa.string()))

    from ..stages.window import top_k_by_key

    hashed = ds.map_batches(add_h, batch_format="pyarrow")
    return top_k_by_key(hashed, key, ["samp_h", id_col], k,
                        descending=False)


# --------------------------------------------------------------------------
# driver queries + DuckDB oracles
# --------------------------------------------------------------------------

def q_events_cap_per_user(sf_dir: str):
    """Keep at most 3 events per user, md5-deterministic — same rows on any
    engine or layout."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])
    return cap_per_key(ev, "user_id", k=3, id_col="event_id")


SQL_CAP_PER_USER = """
WITH h AS (
  SELECT user_id, event_id,
         md5(CAST(event_id AS VARCHAR)) AS samp_h
  FROM events),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY samp_h, event_id) AS rn
  FROM h)
SELECT event_id, user_id, samp_h FROM r WHERE rn <= 3
"""


def q_events_sessionize(sf_dir: str):
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "value"])
    return sessionize(ev)


def q_events_asof_join(sf_dir: str):
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    return asof_join(_pick_type(ev, "purchase"), _pick_type(ev, "view"))


def q_events_range_join(sf_dir: str):
    """Views per user in the hour before each purchase (interval join)."""
    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "event_type"])
    return range_join_count(_pick_type(ev, "purchase"),
                            _pick_type(ev, "view"))


def q_events_hourly_windows(sf_dir: str):
    ev = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "user_id", "value"])
    return tumbling_agg(ev)


_HOP_WINDOW_US = 2 * _US_PER_HOUR
_HOP_US = _US_PER_HOUR


def q_events_hopping_windows(sf_dir: str):
    """2-hour windows hopping every hour (overlap factor 2)."""
    ev = read_table(sf_dir, "events",
                    columns=["ts", "event_type", "user_id", "value"])
    return tumbling_agg(ev, window_us=_HOP_WINDOW_US, hop_us=_HOP_US)


def q_doc_sample_stratified(sf_dir: str):
    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang", "source", "n_chars"])
    return hash_sample(docs)


def q_doc_sample_temperature(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"])
    return temperature_sample(docs, alpha=0.3, target_frac=0.5)


def q_events_json_agg(sf_dir: str):
    """Per event_type stats of the integer $.k field inside the JSON
    props column — see ``json_field_agg``."""
    ev = read_table(sf_dir, "events", columns=["event_type", "props"])
    return json_field_agg(ev, field="k", group_col="event_type")


_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 48 * _US_PER_HOUR


def q_events_funnel(sf_dir: str):
    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])
    return window_funnel(ev, _FUNNEL_STEPS, _FUNNEL_WINDOW_US)


SQL_FUNNEL = f"""
WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
            WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts >= s1.t1
       GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts >= s2.t2
       GROUP BY e.user_id)
SELECT s1.user_id,
       CASE WHEN s3.t3 IS NOT NULL
                 AND epoch_us(s3.t3) - epoch_us(s1.t1) <= {_FUNNEL_WINDOW_US}
            THEN 3
            WHEN s2.t2 IS NOT NULL
                 AND epoch_us(s2.t2) - epoch_us(s1.t1) <= {_FUNNEL_WINDOW_US}
            THEN 2
            ELSE 1 END AS funnel_level,
       s1.t1 AS t_first
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


STREAM_QUERIES = {
    "events_sessionize": q_events_sessionize,
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
    "events_hourly_windows": q_events_hourly_windows,
    "events_hopping_windows": q_events_hopping_windows,
    "events_cap_per_user": q_events_cap_per_user,
    "doc_sample_stratified": q_doc_sample_stratified,
    "doc_sample_temperature": q_doc_sample_temperature,
    "events_funnel": q_events_funnel,
    "events_json_agg": q_events_json_agg,
}

SQL_SESSIONIZE = f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {SESSION_GAP_US}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM o
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM s GROUP BY user_id, session_id
"""

SQL_ASOF = """
SELECT p.event_id, p.user_id, p.ts, v.ts AS matched_ts,
       CASE WHEN v.ts IS NULL THEN NULL
            ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS gap_us
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT user_id, ts FROM events
                WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND v.ts <= p.ts
"""

SQL_RANGE_JOIN = """
SELECT p.event_id, p.user_id, p.ts,
       (SELECT COUNT(*) FROM events v
        WHERE v.event_type = 'view' AND v.user_id = p.user_id
          AND v.ts > p.ts - INTERVAL 1 HOUR AND v.ts <= p.ts) AS n_in_window
FROM events p WHERE p.event_type = 'purchase'
"""

SQL_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value, MAX(value) AS max_value,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
"""

SQL_HOPPING = f"""
WITH e AS (
  SELECT event_type, user_id, value,
         unnest(list_transform(range(0, {_HOP_WINDOW_US // _HOP_US}),
                               j -> (epoch_us(ts) // {_HOP_US} - j)
                                    * {_HOP_US})) AS win_us
  FROM events
)
SELECT make_timestamp(win_us) AS window_start, event_type,
       COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       MIN(value) AS min_value, MAX(value) AS max_value,
       SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM e GROUP BY 1, 2
"""

SQL_JSON_AGG = """
WITH e AS (
  SELECT event_type,
         CASE WHEN json_valid(props)
                   AND json_type(json_extract(props, '$.k'))
                       IN ('BIGINT', 'UBIGINT')
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS v
  FROM events
)
SELECT event_type, count(*) AS n, count(v) AS n_with,
       CAST(COALESCE(sum(v), 0) AS BIGINT) AS sum_v,
       min(v) AS min_v, max(v) AS max_v
FROM e GROUP BY event_type
"""


SQL_SAMPLE = f"""
SELECT doc_id, lang, source, n_chars FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
      < CASE WHEN lang = 'en' THEN {SAMPLE_THRESHOLDS['en']}
             ELSE {SAMPLE_DEFAULT_THRESHOLD} END
"""

SQL_SAMPLE_TEMPERATURE = """
WITH n AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
w AS (SELECT source, n, POW(n, 0.3) AS ws FROM n),
tot AS (SELECT sum(n) AS n_total, sum(ws) AS wsum FROM w),
f AS (SELECT source,
             FLOOR(LEAST(1.0, 0.5 * (SELECT n_total FROM tot) * ws
                                / (SELECT wsum FROM tot) / n)
                   * 1e6 + 0.5) / 1e6 AS fs
      FROM w),
th AS (SELECT source, CAST(FLOOR(fs * 4294967296.0) AS BIGINT) AS cut FROM f)
SELECT d.doc_id, d.source
FROM documents d JOIN th USING (source)
WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS UBIGINT)
      < th.cut
"""

STREAM_ORACLE = {
    "events_sessionize": SQL_SESSIONIZE,
    "events_asof_join": SQL_ASOF,
    "events_range_join": SQL_RANGE_JOIN,
    "events_hourly_windows": SQL_HOURLY,
    "events_hopping_windows": SQL_HOPPING,
    "events_cap_per_user": SQL_CAP_PER_USER,
    "doc_sample_stratified": SQL_SAMPLE,
    "doc_sample_temperature": SQL_SAMPLE_TEMPERATURE,
    "events_funnel": SQL_FUNNEL,
    "events_json_agg": SQL_JSON_AGG,
}
