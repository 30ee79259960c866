"""The five anomaly-detection methods as Ray Data pipelines.

Each function takes an ``(id, timestamp, value)``-shaped ``ray.data.Dataset``
(the reference's canonical contract, ``readme.md:106-110``), a
:class:`DetectorParams`, and a deterministic ``now`` anchor (the reference
polls relative to ``NOW()``; batch re-expression anchors to the max observed
timestamp so runs are reproducible), and returns a lazy violations Dataset
with the copy-log schema ``(id, timestamp, value, anomaly_type, note)``
(``copy_log.datasource:3-8``).

Execution shape (SURVEY.md §2.2–2.6):

* window + predicate filters are vectorized ``pyarrow.compute`` kernels inside
  ``map_batches`` over zero-copy Arrow batches — stateless tasks;
* per-id stats (z-score avg/stddevPop, IQR quartiles) are tiny grouped
  aggregates (one row per sensor) **broadcast** to the detect scan — no
  all-to-all shuffle of raw rows;
* ordered-window semantics (lag, latest-per-key) shuffle only the filtered
  detect window / per-block partials.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Union

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Mean, Std

from ..config import DetectorParams
from ..functions import scalar
from ..stages.join import broadcast_join
from ..stages.reduce import distinct_rows, latest_by_key
from ..stages.window import lag_shift

NowLike = Union[str, _dt.datetime, np.datetime64, pd.Timestamp]


def _to_dt64(now: NowLike) -> np.datetime64:
    return np.datetime64(pd.Timestamp(now), "us")


def _cutoff(now: NowLike, seconds: float) -> np.datetime64:
    return _to_dt64(now) - np.timedelta64(int(seconds * 1_000_000), "us")


def timestamp_delta_seconds(ts: pd.Series, prev: pd.Series) -> pd.Series:
    """(ts - prev) in seconds as float64, computed as exact microsecond int
    difference / 1e6 — bitwise-reproducible against a SQL engine's
    ``date_diff('microsecond', ...) / 1000000.0`` (pandas
    ``.dt.total_seconds()`` goes through nanoseconds, which overflows double
    precision for month-scale deltas)."""
    a = ts.to_numpy(dtype="datetime64[us]").astype("int64")
    b = prev.to_numpy(dtype="datetime64[us]")
    nat = np.isnat(b)
    d = (a - b.astype("int64")).astype("float64") / 1e6
    d[nat] = np.nan
    return pd.Series(d, index=ts.index)


def _window_filter(ds, lo: np.datetime64, hi: np.datetime64 | None = None,
                   sensor_id: int | None = None):
    """`timestamp > lo [AND timestamp <= hi] [AND id = sensor]` as one
    vectorized Arrow filter (reference window filters, SURVEY.md §2.2 F4/F5)."""

    def f(t: pa.Table) -> pa.Table:
        mask = pc.greater(t["timestamp"], pa.scalar(lo, pa.timestamp("us")))
        if hi is not None:
            mask = pc.and_(mask, pc.less_equal(t["timestamp"], pa.scalar(hi, pa.timestamp("us"))))
        if sensor_id is not None:
            mask = pc.and_(mask, pc.equal(t["id"], pa.scalar(sensor_id)))
        return t.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")


#: Output contract = copy_log schema (``copy_log.datasource:3-8``), with the
#: id/value widening documented in :data:`..sources.readers.INCOMING_DATA_SCHEMA`.
LOG_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("timestamp", pa.timestamp("us")),
        ("value", pa.float64()),
        ("anomaly_type", pa.string()),
        ("note", pa.string()),
    ]
)


def _finalize_tbl(t: pa.Table, anomaly_type: str, notes) -> pa.Table:
    """Arrow-native projection to the copy-log contract — no pandas hop.
    Typed even when empty. Stages that filter AND format do both in ONE
    ``map_batches`` call: Ray skips the UDF on empty input blocks and emits
    schema-less placeholders, so a separate format stage downstream of a
    filter would lose the schema whenever a block filters to nothing."""
    return pa.table(
        {
            "id": t["id"].cast(pa.int64()),
            "timestamp": t["timestamp"].cast(pa.timestamp("us")),
            "value": t["value"].cast(pa.float64()),
            "anomaly_type": pa.array([anomaly_type] * t.num_rows, pa.string()),
            "note": (notes if isinstance(notes, (pa.Array, pa.ChunkedArray))
                     else pa.array(list(notes), pa.string())),
        },
        schema=LOG_SCHEMA,
    )


# ---------------------------------------------------------------------------
# 1. out-of-range  (copy_out_of_range.pipe:24-47; endpoint out_of_range.pipe)
# ---------------------------------------------------------------------------

def out_of_range(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
    latest_only: bool = False,
) -> "ray.data.Dataset":
    """``(value < min OR value > max) AND timestamp > NOW() - detect_window``
    (``copy_out_of_range.pipe:32``, correctly parenthesized — quirk Q1 in
    SURVEY.md §2.9 resolved in the copy pipe's favor). With
    ``latest_only=True`` keep only the newest detection per sensor
    (``ORDER BY timestamp DESC LIMIT 1 BY id``, ``copy_out_of_range.pipe:46-47``).
    """
    lo = _cutoff(now, params.detect_window_seconds)
    mn, mx = params.min_value, params.max_value
    if mn is None and mx is None:
        # the reference's required-parameter guard (out_of_range.pipe:28):
        # {{ error('You must define at least one of min_value or max_value') }}
        raise ValueError("You must define at least one of min_value or max_value")

    if mn is not None and mx is not None:
        note = scalar.note_out_of_range(mn, mx)
    elif mn is not None:  # one-sided: only the configured bound is reported
        note = f"min:{scalar.ch_float_str(mn)}"
    else:
        note = f"max:{scalar.ch_float_str(mx)}"

    def detect(t: pa.Table) -> pa.Table:
        if mn is not None and mx is not None:
            oob = pc.or_(pc.less(t["value"], pa.scalar(mn)),
                         pc.greater(t["value"], pa.scalar(mx)))
        elif mn is not None:  # one-sided, out_of_range.pipe:20-26
            oob = pc.less(t["value"], pa.scalar(mn))
        else:
            oob = pc.greater(t["value"], pa.scalar(mx))
        mask = pc.and_(oob, pc.greater(t["timestamp"], pa.scalar(lo, pa.timestamp("us"))))
        if params.sensor_id is not None:
            mask = pc.and_(mask, pc.equal(t["id"], pa.scalar(params.sensor_id)))
        bad = t.filter(mask)
        return _finalize_tbl(bad, "out-of-range", [note] * bad.num_rows)

    hits = ds.map_batches(detect, batch_format="pyarrow")
    if latest_only:
        hits = latest_by_key(hits, ["id"], ["timestamp", "value"])
    return hits


# ---------------------------------------------------------------------------
# 2. timeout  (copy_timeout.pipe:17-41; endpoint timeout.pipe)
# ---------------------------------------------------------------------------

def timeout(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
) -> "ray.data.Dataset":
    """Latest report per sensor (``ORDER BY timestamp DESC LIMIT 1 BY id``,
    ``copy_timeout.pipe:21-22``) filtered to those older than
    ``NOW() - timeout_seconds`` (``copy_timeout.pipe:41``).

    The latest-per-key scan is the engine's partial-argmax reduction
    (:func:`..stages.reduce.latest_by_key`): full history is scanned block-
    parallel but the shuffle moves ≤ one row per (sensor, block)."""
    cut = _cutoff(now, params.timeout_seconds)
    latest = latest_by_key(ds, ["id"], ["timestamp", "value"])

    def stale(t: pa.Table) -> pa.Table:
        mask = pc.less(t["timestamp"], pa.scalar(cut, pa.timestamp("us")))
        if params.sensor_id is not None:
            mask = pc.and_(mask, pc.equal(t["id"], pa.scalar(params.sensor_id)))
        bad = t.filter(mask)
        return _finalize_tbl(bad, "timeout", [scalar.NOTE_TIMEOUT] * bad.num_rows)

    return latest.map_batches(stale, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# 3. rate-of-change  (copy_rate_of_change.pipe:26-59)
# ---------------------------------------------------------------------------

def rate_of_change(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
) -> "ray.data.Dataset":
    """Per-sensor slope between consecutive reports inside the detect window:
    ``slope = (value - previous_value) / (timestamp - previous_timestamp)``
    with ``lagInFrame`` semantics (``copy_rate_of_change.pipe:30-41``), flagged
    when ``ABS(slope) > max_slope`` (``:58``).

    The lag is computed *within the filtered window* (ClickHouse applies the
    window function after WHERE), so only the window shuffles. First row per
    sensor has no previous → excluded (quirk Q5: the reference's epoch-0
    default produces a near-zero slope that the filter drops)."""
    lo = _cutoff(now, params.detect_window_seconds)
    win = _window_filter(ds, lo, sensor_id=params.sensor_id)
    lagged = lag_shift(win, "id", "timestamp", ["timestamp", "value"])

    def slope_filter(t: pa.Table) -> pa.Table:
        # Arrow-native: first-row-per-sensor (no previous) drops via is_valid;
        # the μs-int delta matches timestamp_delta_seconds bitwise
        t = t.filter(pc.is_valid(t["previous_timestamp"]))
        if t.num_rows == 0:
            return _finalize_tbl(t, "rate-of-change", [])
        a = t["timestamp"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
        b = (t["previous_timestamp"].cast(pa.timestamp("us"))
             .cast(pa.int64()).to_numpy())
        dt_s = (a - b).astype("float64") / 1e6
        vdiff = (t["value"].to_numpy(zero_copy_only=False)
                 - t["previous_value"].to_numpy(zero_copy_only=False))
        with np.errstate(divide="ignore", invalid="ignore"):
            slope = vdiff / dt_s
        # Δt==0 (duplicate (id, ts)) is masked explicitly — IEEE slope=±inf
        # vs SQL NULL would otherwise make the flag data-dependent (ADVICE r1)
        keep = (np.abs(slope) > params.max_slope) & (dt_s != 0)
        sub = t.filter(pa.array(keep))
        notes = [scalar.note_rate_of_change(s, params.max_slope, v)
                 for s, v in zip(slope[keep], vdiff[keep])]
        return _finalize_tbl(sub, "rate-of-change", notes)

    return lagged.map_batches(slope_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# 4. z-score  (copy_z_score.pipe:24-56)
# ---------------------------------------------------------------------------

def per_id_mean_std(
    ds: "ray.data.Dataset",
    now: NowLike,
    stats_window_minutes: int,
    exact_cents: bool = False,
) -> pd.DataFrame:
    """The stats CTE (``copy_z_score.pipe:30-37``): per-id ``avg`` and
    ``stddevPop`` over the stats window. Ray's grouped aggregates pre-combine
    per block, so the shuffle moves one partial per (id, block); the result is
    one row per sensor — the broadcast side of the join.

    ``exact_cents=True`` computes both moments from exact int64 sums of
    ``floor(value*100 + 0.5)`` (valid when values carry ≤2 decimals, as the
    oracle tables do). Integer sums are order-independent, so the result is
    bitwise-reproducible against any SQL engine evaluating
    ``(sc/n)/100`` / ``sqrt(ss/n - (sc/n)^2)/100`` — unlike float summation,
    whose last-ulp depends on reduction order."""
    hi = _to_dt64(now)
    lo = _cutoff(now, stats_window_minutes * 60)
    win = _window_filter(ds, lo, hi)
    if not exact_cents:
        agg = win.groupby("id").aggregate(
            Mean("value", alias_name="average"),
            Std("value", ddof=0, alias_name="std_dev"),  # stddevPop, z_score.pipe:18
        )
        stats = agg.to_pandas()
        # Std(ddof=0) of a single-row group: Ray returns NaN/None; stddevPop = 0.
        stats["std_dev"] = stats["std_dev"].astype(float).fillna(0.0)
        return stats

    def partial(df: pd.DataFrame) -> pa.Table:
        c = np.floor(df["value"].to_numpy(dtype="float64") * 100.0 + 0.5).astype("int64")
        # squared-cents sums can exceed int64 (SQL engines promote to
        # HUGEINT; numpy silently wraps) — take the exact object-int path
        # when |c|²·n is anywhere near the limit, else stay vectorized.
        risky = c.size and float(np.abs(c).max()) ** 2 * c.size > 4e18
        sq = (c.astype(object) * c.astype(object)) if risky else c * c
        g = pd.DataFrame({"id": df["id"].to_numpy(), "sc": c, "ss": sq})
        out = (
            g.groupby("id", sort=False)
            .agg(sc=("sc", "sum"), ss=("ss", "sum"), n=("sc", "size"))
            .reset_index()
        )
        out["ss"] = [str(int(x)) for x in out["ss"]]  # exact across blocks
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = win.map_batches(partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("id", sort=False)[["sc", "n"]].sum().reset_index()
    ss_map = parts.groupby("id", sort=False)["ss"].apply(
        lambda s: sum(int(x) for x in s)
    )
    mean_c = agg["sc"].to_numpy(dtype="float64") / agg["n"].to_numpy(dtype="float64")
    # float(exact int) first, then divide — the SQL HUGEINT/BIGINT order
    ss_n = np.array([float(ss_map[i]) for i in agg["id"]]) / agg["n"].to_numpy(
        dtype="float64"
    )
    var_c = ss_n - mean_c * mean_c
    return pd.DataFrame(
        {
            "id": agg["id"],
            "average": mean_c / 100.0,
            "std_dev": np.sqrt(np.maximum(var_c, 0.0)) / 100.0,
        }
    )


def z_score(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
) -> "ray.data.Dataset":
    """``zscore = (value - avg) / stddevPop`` per sensor over the stats window,
    flagged when ``zscore < -t OR zscore > t`` (``copy_z_score.pipe:38,55``).

    A zero stddev is masked explicitly (never flagged): a value equal to the
    constant window yields NaN under IEEE (quirk Q4, never flagged anyway),
    and a sub-cent difference against an exact-cents zero-variance window
    would otherwise produce ±inf — flagged by IEEE but NULL-dropped by SQL
    engines. Masking pins the semantics on both sides (ADVICE r1)."""
    stats = per_id_mean_std(ds, now, params.stats_window_minutes,
                            exact_cents=params.exact_cents)
    hi = _to_dt64(now)
    lo = _cutoff(now, params.detect_window_seconds)
    win = _window_filter(ds, lo, hi, sensor_id=params.sensor_id)
    joined = broadcast_join(win, stats, on=["id"], how="inner")
    t = params.zscore_threshold

    def score(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows == 0:
            return _finalize_tbl(tbl, "z-score", [])
        val = tbl["value"].to_numpy(zero_copy_only=False)
        avg = tbl["average"].to_numpy(zero_copy_only=False)
        sd = tbl["std_dev"].to_numpy(zero_copy_only=False)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (val - avg) / sd
        keep = ((z < -t) | (z > t)) & (sd != 0)
        sub = tbl.filter(pa.array(keep))
        avg_r = np.round(avg[keep], 2)  # ROUND(...,2), copy_z_score.pipe:39-40
        std_r = np.round(sd[keep], 2)
        notes = [scalar.note_z_score(zz, t, a, s)
                 for zz, a, s in zip(z[keep], avg_r, std_r)]
        return _finalize_tbl(sub, "z-score", notes)

    return joined.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# 5. interquartile-range  (copy_iqr.pipe:45-82; window semantics per iqr.pipe
#    — quirk Q3: copy_iqr anchors windows at toDate(NOW()); we follow the
#    endpoint pipe's NOW()-relative windows, the documented intent)
# ---------------------------------------------------------------------------

def per_id_quartiles(
    ds: "ray.data.Dataset",
    now: NowLike,
    stats_window_minutes: int,
    iqr_multiplier: float,
) -> pd.DataFrame:
    """The IQR stats CTE (``copy_iqr.pipe:45-56``): per-id
    ``quantileExact(0.25/0.5/0.75)`` with ClickHouse nearest-rank semantics
    (sorted[floor(level*n)]) and ``IQR = (q3-q1) * multiplier``.

    Exact quantiles need the group's values; the stats window is a bounded
    suffix (10 min of data per sensor), so a per-id ``map_groups`` sort is
    cheap. At unbounded scale the validation engine swaps in the mergeable
    t-digest accumulator (:mod:`..state.tdigest`)."""
    hi = _to_dt64(now)
    lo = _cutoff(now, stats_window_minutes * 60)
    win = _window_filter(ds, lo, hi)

    def quartiles_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # sort once by (id, value); group boundaries give each id's sorted
        # slice — per-id quantile picks are O(1) index lookups, no per-id
        # Python grouping
        g = g.sort_values(["id", "value"], kind="mergesort")
        ids = g["id"].to_numpy()
        v = g["value"].to_numpy(dtype="float64")
        starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
        ends = np.r_[starts[1:], ids.size]
        ns = ends - starts
        q1 = v[starts + np.minimum((0.25 * ns).astype(np.int64), ns - 1)]
        q2 = v[starts + np.minimum((0.5 * ns).astype(np.int64), ns - 1)]
        q3 = v[starts + np.minimum((0.75 * ns).astype(np.int64), ns - 1)]
        iqr_v = (q3 - q1) * iqr_multiplier
        return pd.DataFrame(
            {"id": ids[starts], "lower_quartile": q1, "mid_quartile": q2,
             "upper_quartile": q3, "iqr": iqr_v,
             "lower_raw": q1 - iqr_v, "upper_raw": q3 + iqr_v}
        )

    from ..stages.reduce import grouped_agg

    # exact quantiles can't pre-reduce: the 'partial' is a projection and the
    # bucket merge sees each id's full window (bounded: a stats-window suffix)
    return grouped_agg(
        win.select_columns(["id", "value"]),
        ["id"],
        lambda df: df,
        quartiles_of_bucket,
    ).to_pandas()


def iqr(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
) -> "ray.data.Dataset":
    """Values outside ``[q1 - IQR·k, q3 + IQR·k]`` per sensor
    (``copy_iqr.pipe:64-65``), reported with ROUND(bounds, 2) in the note
    (``:62-63,80``) and a ``SELECT DISTINCT`` over the joined rows (``:58``)."""
    stats = per_id_quartiles(ds, now, params.stats_window_minutes, params.iqr_multiplier)
    hi = _to_dt64(now)
    lo = _cutoff(now, params.detect_window_seconds)
    win = _window_filter(ds, lo, hi, sensor_id=params.sensor_id)
    joined = broadcast_join(win, stats, on=["id"], how="inner")

    def fence(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _finalize_tbl(t, "interquartile-range", [])
        val = t["value"].to_numpy(zero_copy_only=False)
        lo_raw = t["lower_raw"].to_numpy(zero_copy_only=False)
        hi_raw = t["upper_raw"].to_numpy(zero_copy_only=False)
        keep = (val > hi_raw) | (val < lo_raw)
        sub = t.filter(pa.array(keep))
        lo_b = np.round(lo_raw[keep], 2)
        hi_b = np.round(hi_raw[keep], 2)
        notes = [scalar.note_iqr(l, h) for l, h in zip(lo_b, hi_b)]
        return _finalize_tbl(sub, "interquartile-range", notes)

    hits = joined.map_batches(fence, batch_format="pyarrow")
    return distinct_rows(hits, ["id", "timestamp", "value", "anomaly_type", "note"])


# ---------------------------------------------------------------------------
# Log assembly  (five copy pipes → copy_log_duplicates → dedup → copy_log;
#  SURVEY.md §3.2)
# ---------------------------------------------------------------------------

def copy_log_duplicates(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
    shared_scan: bool = True,
) -> "ray.data.Dataset":
    """One scheduled tick of all five copy pipes unioned into the common log
    schema (``content/copies-pipes.md:25-46``). Contains designed duplicates
    across overlapping runs (quirk Q6) — deduplicate with :func:`dedup_log`.

    With ``shared_scan`` (default), the stats-window suffix — the superset
    every window-bounded detector needs — is filtered once and **materialized**
    (it is small relative to history: minutes vs. months), so four detectors
    share one scan instead of re-reading the source each. The timeout detector
    keeps its own full-history scan (latest-per-key needs all of it, and its
    partial-argmax reduction makes that cheap)."""
    if shared_scan:
        lo = _cutoff(now, max(params.stats_window_minutes * 60,
                              params.detect_window_seconds))
        win = _window_filter(ds, lo).materialize()
    else:
        win = ds
    # z-score and IQR eagerly collect their per-id stats (broadcast sides);
    # overlap those two collections in threads before assembling the DAG
    import threading

    boxes: dict[str, Any] = {}

    def _z() -> None:
        try:
            boxes["z"] = z_score(win, params, now)
        except Exception as e:
            boxes["z_err"] = e

    def _i() -> None:
        try:
            boxes["i"] = iqr(win, params, now)
        except Exception as e:
            boxes["i_err"] = e

    tz, ti = threading.Thread(target=_z, daemon=True), threading.Thread(target=_i, daemon=True)
    tz.start(); ti.start(); tz.join(); ti.join()
    for k in ("z_err", "i_err"):
        if k in boxes:
            raise boxes[k]
    parts = [
        out_of_range(win, params, now, latest_only=True),
        timeout(ds, params, now),
        rate_of_change(win, params, now),
        boxes["z"],
        boxes["i"],
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def dedup_log(log: "ray.data.Dataset") -> "ray.data.Dataset":
    """``SELECT * FROM copy_log_duplicates LIMIT 1 BY timestamp, id,
    anomaly_type`` (``dedup_log.pipe:1-9``) — the materialized dedup into
    ``copy_log`` (ReplacingMergeTree key ``timestamp,id,anomaly_type``,
    ``copy_log.datasource:10-12``)."""
    return distinct_rows(log, ["timestamp", "id", "anomaly_type"])


def copy_log(
    ds: "ray.data.Dataset",
    params: DetectorParams,
    now: NowLike,
) -> "ray.data.Dataset":
    return dedup_log(copy_log_duplicates(ds, params, now))


# ---------------------------------------------------------------------------
# Read endpoints (SURVEY.md §2.2 F9, §2.6 W2/W5, §2.5 A4/A5)
# ---------------------------------------------------------------------------

def most_recent(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Most recent report per sensor, listed ``ORDER BY id ASC``
    (``most_recent.pipe:14-15``)."""
    return latest_by_key(ds, ["id"], ["timestamp", "value"]).sort("id")


def get_data(
    ds: "ray.data.Dataset",
    now: NowLike,
    minutes: int = 30,
    sensor_id: int | None = None,
) -> "ray.data.Dataset":
    """Raw window read, newest first (``get_data.pipe:11-20``)."""
    lo = _cutoff(now, minutes * 60)
    return _window_filter(ds, lo, sensor_id=sensor_id).sort("timestamp", descending=True)


def anomaly_types_seen(log: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distinct anomaly types in the log (``get_anomalies.pipe:24-30``)."""
    return log.groupby("anomaly_type").count()
