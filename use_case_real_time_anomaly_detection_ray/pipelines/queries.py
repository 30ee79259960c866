"""Named query catalog + DuckDB oracle SQL for the driver's correctness gate.

Each entry pairs a Ray Data pipeline (callable taking ``sf_dir``) with an
ANSI-SQL equivalent over the same parquet tables (views pre-registered by the
driver: region nation customer supplier part orders lineitem events documents
embeddings). Column names match exactly between both sides.

The anomaly queries view the driver's ``events`` table through the reference's
``(id, timestamp, value)`` contract (``user_id → id``, ``ts → timestamp``),
anchor ``NOW()`` at ``max(ts)`` (deterministic batch re-expression of the
reference's polling windows), and use parameters scaled to that table's
day-scale cadence; the reference defaults assume second-scale sensors
(``DetectorParams`` docstring).

Float discipline: columns that depend on a *sum order* (avg/stddev) are rounded
to 2 decimals on both sides; columns that are pure element selections or
single arithmetic expressions (slopes, IQR bounds) are emitted raw — they are
bitwise-reproducible.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..config import DetectorParams
from ..sources.readers import parquet_column_max, read_events_as_incoming
from ..stages.join import broadcast_join
from ..stages.reduce import distinct_rows, group_count, latest_by_key
from . import anomaly

# --------------------------------------------------------------------------
# parameters for the events table (≈ hour-scale reporting cadence, values in
# [0, ~330], 15 sensors over ~30 days)
# --------------------------------------------------------------------------

EVENTS_PARAMS = DetectorParams(
    min_value=-100.0,
    max_value=100.0,
    detect_window_seconds=7 * 86400,      # 7-day detect window
    stats_window_minutes=14 * 1440,       # 14-day stats window
    zscore_threshold=2.0,
    iqr_multiplier=1.5,
    max_slope=0.005,                      # value-units per second at hour cadence
    timeout_seconds=600,                  # stale if silent 10 min past max(ts)
    exact_cents=True,                     # events values carry 2 decimals
)

_P = EVENTS_PARAMS
_DETECT_S = _P.detect_window_seconds
_STATS_S = _P.stats_window_minutes * 60
_NOW = "(SELECT max(ts) FROM events)"
_DWIN = f"ts > {_NOW} - INTERVAL {_DETECT_S} SECOND"
_SWIN = f"ts > {_NOW} - INTERVAL {_STATS_S} SECOND AND ts <= {_NOW}"


def _round2_halfup(x):
    """floor(x*100 + 0.5)/100 — deterministic 2-decimal rounding shared with
    the oracle SQL (same expression), immune to half-even vs half-away."""
    return np.floor(np.asarray(x, dtype="float64") * 100.0 + 0.5) / 100.0


def _now(sf_dir: str):
    return parquet_column_max(os.path.join(sf_dir, "events.parquet"), "ts")


def _events(sf_dir: str) -> "ray.data.Dataset":
    return read_events_as_incoming(sf_dir)


# --------------------------------------------------------------------------
# the five detectors (+ copy-log assembly) over events
# --------------------------------------------------------------------------

def q_out_of_range(sf_dir: str):
    return anomaly.out_of_range(_events(sf_dir), _P, _now(sf_dir))


SQL_OUT_OF_RANGE = f"""
SELECT user_id AS id, ts AS timestamp, value,
       'out-of-range' AS anomaly_type,
       'min:-100 max:100' AS note
FROM events
WHERE (value < -100 OR value > 100) AND {_DWIN}
"""


def q_out_of_range_latest(sf_dir: str):
    """Copy-pipe variant: newest detection per sensor
    (``copy_out_of_range.pipe:46-47``)."""
    return anomaly.out_of_range(_events(sf_dir), _P, _now(sf_dir), latest_only=True)


SQL_OUT_OF_RANGE_LATEST = f"""
WITH hits AS (
  SELECT user_id AS id, ts AS timestamp, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
  FROM events
  WHERE (value < -100 OR value > 100) AND {_DWIN}
)
SELECT id, timestamp, value,
       'out-of-range' AS anomaly_type, 'min:-100 max:100' AS note
FROM hits WHERE rn = 1
"""


def q_timeout(sf_dir: str):
    return anomaly.timeout(_events(sf_dir), _P, _now(sf_dir))


SQL_TIMEOUT = f"""
WITH latest AS (
  SELECT user_id AS id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
  FROM events
)
SELECT id, ts AS timestamp, value,
       'timeout' AS anomaly_type,
       'timestamp is time of last report' AS note
FROM latest
WHERE rn = 1 AND ts < {_NOW} - INTERVAL {_P.timeout_seconds} SECOND
"""


def q_rate_of_change(sf_dir: str):
    """Numeric variant for the oracle: raw slope / value_diff doubles (the
    formatted ``note`` lives in the copy-log pipeline; formatting depends on
    round-half mode which differs between engines)."""
    ds = _events(sf_dir)
    now = _now(sf_dir)
    lo = anomaly._cutoff(now, _P.detect_window_seconds)
    win = anomaly._window_filter(ds, lo)
    from ..stages.window import lag_shift

    lagged = lag_shift(win, "id", "timestamp", ["timestamp", "value"])

    def slope(df: pd.DataFrame) -> pa.Table:
        dt_s = anomaly.timestamp_delta_seconds(df["timestamp"], df["previous_timestamp"])
        with np.errstate(divide="ignore", invalid="ignore"):
            s = (df["value"] - df["previous_value"]) / dt_s
        # dt==0 rows (duplicate (id, ts)) are masked EXPLICITLY on both sides:
        # IEEE gives slope=±inf here while SQL engines yield NULL — pin the
        # semantics instead of leaving them data-dependent
        keep = (np.abs(s) > _P.max_slope) & (dt_s != 0)
        out = df[keep][["id", "timestamp", "value"]].copy()
        out["slope"] = s[keep]
        out["value_diff"] = (df["value"] - df["previous_value"])[keep]
        return pa.Table.from_pandas(out, preserve_index=False)

    return lagged.map_batches(slope, batch_format="pandas")


SQL_RATE_OF_CHANGE = f"""
WITH win AS (
  SELECT user_id AS id, ts, value FROM events WHERE {_DWIN}
), lagged AS (
  SELECT id, ts, value,
         lag(ts) OVER (PARTITION BY id ORDER BY ts ASC) AS prev_ts,
         lag(value) OVER (PARTITION BY id ORDER BY ts ASC) AS prev_value
  FROM win
)
SELECT id, ts AS timestamp, value,
       (value - prev_value) / (date_diff('microsecond', prev_ts, ts) / 1000000.0) AS slope,
       (value - prev_value) AS value_diff
FROM lagged
WHERE prev_ts IS NOT NULL
  AND date_diff('microsecond', prev_ts, ts) <> 0
  AND abs((value - prev_value) / (date_diff('microsecond', prev_ts, ts) / 1000000.0)) > {_P.max_slope}
"""


def q_z_score(sf_dir: str):
    """Numeric variant: zscore/average/std_dev rounded to 2 (sum-order
    dependent floats)."""
    ds = _events(sf_dir)
    now = _now(sf_dir)
    stats = anomaly.per_id_mean_std(ds, now, _P.stats_window_minutes, exact_cents=True)
    hi = anomaly._to_dt64(now)
    lo = anomaly._cutoff(now, _P.detect_window_seconds)
    win = anomaly._window_filter(ds, lo, hi)
    joined = broadcast_join(win, stats, on=["id"], how="inner")
    t = _P.zscore_threshold

    def score(df: pd.DataFrame) -> pa.Table:
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (df["value"] - df["average"]) / df["std_dev"]
        # std_dev==0 masked explicitly (IEEE ±inf vs SQL NULL — same hazard
        # as the rate-of-change dt==0 case; pinned on both sides)
        keep = ((z < -t) | (z > t)) & (df["std_dev"] != 0)
        out = df[keep][["id", "timestamp", "value"]].copy()
        # half-up-to-2-decimals on both engine and oracle: exact .005 ties are
        # common here (averages are small-denominator rationals), and numpy
        # (half-even) disagrees with SQL round() (half-away) on them
        out["zscore"] = _round2_halfup(z[keep])
        out["average"] = _round2_halfup(df["average"][keep])
        out["std_dev"] = _round2_halfup(df["std_dev"][keep])
        return pa.Table.from_pandas(out, preserve_index=False)

    return joined.map_batches(score, batch_format="pandas")


# stats via exact integer "cents" sums — order-independent, bitwise-identical
# to the engine's per_id_mean_std(exact_cents=True); see its docstring.
SQL_Z_SCORE = f"""
WITH cents AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE {_SWIN}
), moments AS (
  SELECT user_id, sum(c) AS sc, sum(c * c) AS ss, count(*) AS n
  FROM cents GROUP BY user_id
), stats AS (
  SELECT user_id AS id,
         (sc / n) / 100.0 AS average,
         sqrt(greatest(ss / n - (sc / n) * (sc / n), 0.0)) / 100.0 AS std_dev
  FROM moments
), win AS (
  SELECT user_id AS id, ts, value FROM events WHERE {_DWIN} AND ts <= {_NOW}
)
SELECT w.id AS id, w.ts AS timestamp, w.value AS value,
       floor((w.value - s.average) / s.std_dev * 100 + 0.5) / 100 AS zscore,
       floor(s.average * 100 + 0.5) / 100 AS average,
       floor(s.std_dev * 100 + 0.5) / 100 AS std_dev
FROM win w JOIN stats s ON w.id = s.id
WHERE s.std_dev <> 0
  AND ((w.value - s.average) / s.std_dev < -{_P.zscore_threshold}
   OR  (w.value - s.average) / s.std_dev > {_P.zscore_threshold})
"""


def q_iqr(sf_dir: str):
    """Numeric variant: raw lower/upper bounds (pure element selection +
    one multiply/add — bitwise reproducible)."""
    ds = _events(sf_dir)
    now = _now(sf_dir)
    stats = anomaly.per_id_quartiles(ds, now, _P.stats_window_minutes, _P.iqr_multiplier)
    hi = anomaly._to_dt64(now)
    lo = anomaly._cutoff(now, _P.detect_window_seconds)
    win = anomaly._window_filter(ds, lo, hi)
    joined = broadcast_join(win, stats, on=["id"], how="inner")

    def fence(df: pd.DataFrame) -> pa.Table:
        keep = (df["value"] > df["upper_raw"]) | (df["value"] < df["lower_raw"])
        out = df[keep][["id", "timestamp", "value"]].copy()
        out["lower_bound"] = df["lower_raw"][keep]
        out["upper_bound"] = df["upper_raw"][keep]
        return pa.Table.from_pandas(out, preserve_index=False)

    hits = joined.map_batches(fence, batch_format="pandas")
    return distinct_rows(hits, ["id", "timestamp", "value", "lower_bound", "upper_bound"])


# ClickHouse quantileExact = sorted[least(floor(level*n), n-1)] (0-based);
# DuckDB lists are 1-based, hence the +1.
_IQR_STATS = f"""
  SELECT user_id AS id,
         lst[CAST(least(floor(0.25 * n), n - 1) AS INT) + 1] AS q1,
         lst[CAST(least(floor(0.75 * n), n - 1) AS INT) + 1] AS q3
  FROM (
    SELECT user_id, list(value ORDER BY value ASC) AS lst, count(*) AS n
    FROM events WHERE {_SWIN} GROUP BY user_id
  )
"""

SQL_IQR = f"""
WITH stats AS ({_IQR_STATS}),
bounds AS (
  SELECT id, q1 - (q3 - q1) * {_P.iqr_multiplier} AS lower_bound,
             q3 + (q3 - q1) * {_P.iqr_multiplier} AS upper_bound
  FROM stats
), win AS (
  SELECT user_id AS id, ts, value FROM events WHERE {_DWIN} AND ts <= {_NOW}
)
SELECT DISTINCT w.id AS id, w.ts AS timestamp, w.value AS value,
       b.lower_bound AS lower_bound, b.upper_bound AS upper_bound
FROM win w JOIN bounds b ON w.id = b.id
WHERE w.value > b.upper_bound OR w.value < b.lower_bound
"""


def q_copy_log(sf_dir: str):
    """Full scheduled-copy tick: five detectors → union → dedup by
    ``(timestamp, id, anomaly_type)`` (SURVEY.md §3.2). The ``note`` column is
    dropped for the oracle (float formatting is engine-specific); the golden
    fixture tests cover notes byte-for-byte."""
    log = anomaly.copy_log(_events(sf_dir), _P, _now(sf_dir))
    return log.map_batches(
        lambda t: t.select(["id", "timestamp", "value", "anomaly_type"]),
        batch_format="pyarrow",
    )


SQL_COPY_LOG = f"""
WITH oor AS ({SQL_OUT_OF_RANGE_LATEST.strip()}),
tmo AS ({SQL_TIMEOUT.strip()}),
roc AS ({SQL_RATE_OF_CHANGE.strip()}),
zs AS ({SQL_Z_SCORE.strip()}),
iq AS ({SQL_IQR.strip()}),
unioned AS (
  SELECT id, timestamp, value, anomaly_type FROM oor
  UNION ALL SELECT id, timestamp, value, 'timeout' FROM tmo
  UNION ALL SELECT id, timestamp, value, 'rate-of-change' FROM roc
  UNION ALL SELECT id, timestamp, value, 'z-score' FROM zs
  UNION ALL SELECT id, timestamp, value, 'interquartile-range' FROM iq
)
SELECT DISTINCT id, timestamp, value, anomaly_type FROM unioned
"""


def q_most_recent(sf_dir: str):
    return anomaly.most_recent(_events(sf_dir))


SQL_MOST_RECENT = """
WITH latest AS (
  SELECT user_id AS id, ts, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, value DESC) AS rn
  FROM events
)
SELECT id, ts AS timestamp, value FROM latest WHERE rn = 1
"""


def q_sensor_ids_ds(sf_dir: str):
    """Sensor-id catalog (``ui_ids.pipe:8-12``) with per-id report counts."""
    ds = _events(sf_dir)
    return group_count(ds, ["id"], out_col="n_reports")


SQL_SENSOR_IDS = """
SELECT user_id AS id, count(*) AS n_reports FROM events GROUP BY user_id
"""


def q_get_data(sf_dir: str):
    return anomaly.get_data(_events(sf_dir), _now(sf_dir), minutes=7 * 1440)


SQL_GET_DATA = f"""
SELECT user_id AS id, ts AS timestamp, value
FROM events WHERE ts > {_NOW} - INTERVAL {7 * 1440 * 60} SECOND
"""


def q_anomaly_types(sf_dir: str):
    log = anomaly.copy_log(_events(sf_dir), _P, _now(sf_dir))
    return log.groupby("anomaly_type").count().map_batches(
        lambda t: t.rename_columns(["anomaly_type", "n"]), batch_format="pyarrow"
    )


SQL_ANOMALY_TYPES = f"""
WITH log AS ({SQL_COPY_LOG.strip()})
SELECT anomaly_type, count(*) AS n FROM log GROUP BY anomaly_type
"""


def q_top_values_per_sensor(sf_dir: str):
    """Per-sensor top-3 values (``LIMIT n BY id`` throttle, SURVEY.md §2.6 W3),
    tiebroken by newest timestamp."""
    from ..stages.window import top_k_by_key

    return top_k_by_key(_events(sf_dir), "id", ["value", "timestamp"], k=3)


SQL_TOP_VALUES_PER_SENSOR = """
SELECT id, timestamp, value FROM (
  SELECT user_id AS id, ts AS timestamp, value,
         row_number() OVER (PARTITION BY user_id ORDER BY value DESC, ts DESC) AS rn
  FROM events
) WHERE rn <= 3
"""


def q_monitor_logs(sf_dir: str):
    """``monitor_logs`` endpoint: ``SELECT DISTINCT *`` over the compiled log
    (``monitor_logs.pipe:12-21``; note column dropped as in q_copy_log)."""
    log = q_copy_log(sf_dir)
    return distinct_rows(log, ["id", "timestamp", "value", "anomaly_type"])


SQL_MONITOR_LOGS = f"""
WITH log AS ({SQL_COPY_LOG.strip()})
SELECT DISTINCT id, timestamp, value, anomaly_type FROM log
"""


def q_daily_stats(sf_dir: str):
    """Tumbling event-time window (1 day) per sensor: count + exact-cents mean
    (ray_guide 'Streaming-shaped workloads': tumbling windows as
    groupby(key, bucket) aggregates)."""
    ds = _events(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["timestamp"].dt.floor("D")
        c = np.floor(df["value"].to_numpy(dtype="float64") * 100.0 + 0.5).astype("int64")
        g = pd.DataFrame({"id": df["id"].to_numpy(), "day": day.to_numpy(), "c": c})
        return g.groupby(["id", "day"], sort=False).agg(
            n=("c", "size"), sc=("c", "sum")
        ).reset_index()

    from ..stages.reduce import grouped_agg

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["id", "day"], sort=False).agg(
            n=("n", "sum"), sc=("sc", "sum")
        ).reset_index()
        agg["mean_value"] = np.floor(
            (agg["sc"] / agg["n"]) / 100.0 * 100.0 + 0.5
        ) / 100.0
        return agg.drop(columns=["sc"])

    return grouped_agg(ds.select_columns(["id", "timestamp", "value"]),
                       ["id", "day"], partial, merge)


SQL_DAILY_STATS = """
SELECT user_id AS id, date_trunc('day', ts) AS day, count(*) AS n,
       floor((sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / count(*)) / 100.0 * 100 + 0.5) / 100 AS mean_value
FROM events GROUP BY user_id, date_trunc('day', ts)
"""


def q_simple_z_score(sf_dir: str):
    """``simple_z_score.pipe:33-76``: same stats-CTE machinery as ``z_score``
    but with the endpoint's defaults — ``zscore_multiplier=3`` and a short
    detect window — plus the ``multiIf`` low/high label (``:68``) and the
    multiplier echoed as a column (``:60``). Exercises
    ``DetectorParams.with_()`` parameterization end-to-end."""
    p = _P.with_(zscore_threshold=3.0, detect_window_seconds=86400)
    ds = _events(sf_dir)
    now = _now(sf_dir)
    stats = anomaly.per_id_mean_std(ds, now, p.stats_window_minutes, exact_cents=True)
    hi = anomaly._to_dt64(now)
    lo = anomaly._cutoff(now, p.detect_window_seconds)
    win = anomaly._window_filter(ds, lo, hi)
    joined = broadcast_join(win, stats, on=["id"], how="inner")
    m = p.zscore_threshold
    schema = pa.schema(
        [("id", pa.int64()), ("timestamp", pa.timestamp("us")),
         ("value", pa.float64()), ("zscore", pa.float64()),
         ("test", pa.string()), ("average", pa.float64()),
         ("std_dev", pa.float64()), ("zscore_multiplier", pa.float64())]
    )

    def score(df: pd.DataFrame) -> pa.Table:
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (df["value"] - df["average"]) / df["std_dev"]
        keep = ((z < -m) | (z > m)) & (df["std_dev"] != 0)
        out = df[keep][["id", "timestamp", "value"]].copy()
        zk = z[keep]
        out["zscore"] = _round2_halfup(zk)
        out["test"] = np.where(zk < -m, "low", "high").astype(object)  # multiIf, :68
        out["average"] = _round2_halfup(df["average"][keep])
        out["std_dev"] = _round2_halfup(df["std_dev"][keep])
        out["zscore_multiplier"] = float(m)
        # explicit schema: hit sets are often empty per block, and a typed
        # empty table keeps the result's columns stable
        return pa.Table.from_pandas(out, schema=schema, preserve_index=False)

    return joined.map_batches(score, batch_format="pandas")


_SIMPLE_DWIN = f"ts > {_NOW} - INTERVAL 86400 SECOND"

SQL_SIMPLE_Z_SCORE = f"""
WITH cents AS (
  SELECT user_id, CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events WHERE {_SWIN}
), moments AS (
  SELECT user_id, sum(c) AS sc, sum(c * c) AS ss, count(*) AS n
  FROM cents GROUP BY user_id
), stats AS (
  SELECT user_id AS id,
         (sc / n) / 100.0 AS average,
         sqrt(greatest(ss / n - (sc / n) * (sc / n), 0.0)) / 100.0 AS std_dev
  FROM moments
), win AS (
  SELECT user_id AS id, ts, value FROM events
  WHERE {_SIMPLE_DWIN} AND ts <= {_NOW}
)
SELECT w.id AS id, w.ts AS timestamp, w.value AS value,
       floor((w.value - s.average) / s.std_dev * 100 + 0.5) / 100 AS zscore,
       CASE WHEN (w.value - s.average) / s.std_dev < -3 THEN 'low' ELSE 'high' END AS test,
       floor(s.average * 100 + 0.5) / 100 AS average,
       floor(s.std_dev * 100 + 0.5) / 100 AS std_dev,
       3.0 AS zscore_multiplier
FROM win w JOIN stats s ON w.id = s.id
WHERE s.std_dev <> 0
  AND ((w.value - s.average) / s.std_dev < -3
   OR  (w.value - s.average) / s.std_dev > 3)
"""


_GET_ANOMALIES_HOURS = 72


def q_get_anomalies(sf_dir: str):
    """``get_anomalies.pipe:8-19``: the compiled anomaly log filtered to the
    last N hours (``addHours(NOW(), -hours)``), optional sensor /
    anomaly-type filters exposed as parameters (pytest covers them; the
    driver query uses the windowed read)."""
    return get_anomalies(sf_dir, hours=_GET_ANOMALIES_HOURS)


def get_anomalies(sf_dir: str, hours: int = 24, sensor_id: int | None = None,
                  anomaly_type: str | None = None):
    log = q_copy_log(sf_dir)
    lo = anomaly._cutoff(_now(sf_dir), hours * 3600)

    def f(t: pa.Table) -> pa.Table:
        mask = pa.compute.greater(t["timestamp"], pa.scalar(lo, pa.timestamp("us")))
        if sensor_id is not None:
            mask = pa.compute.and_(mask, pa.compute.equal(t["id"], pa.scalar(sensor_id)))
        if anomaly_type is not None:
            mask = pa.compute.and_(
                mask, pa.compute.equal(t["anomaly_type"], pa.scalar(anomaly_type)))
        return t.filter(mask)

    return log.map_batches(f, batch_format="pyarrow")


SQL_GET_ANOMALIES = f"""
WITH log AS ({SQL_COPY_LOG.strip()})
SELECT id, timestamp, value, anomaly_type FROM log
WHERE timestamp > {_NOW} - INTERVAL {_GET_ANOMALIES_HOURS * 3600} SECOND
"""


ANOMALY_QUERIES: dict[str, Callable[[str], Any]] = {
    "daily_stats": q_daily_stats,
    "top_values_per_sensor": q_top_values_per_sensor,
    "monitor_logs": q_monitor_logs,
    "out_of_range": q_out_of_range,
    "out_of_range_latest": q_out_of_range_latest,
    "timeout": q_timeout,
    "rate_of_change": q_rate_of_change,
    "z_score": q_z_score,
    "simple_z_score": q_simple_z_score,
    "iqr": q_iqr,
    "copy_log": q_copy_log,
    "get_anomalies": q_get_anomalies,
    "most_recent": q_most_recent,
    "sensor_ids": q_sensor_ids_ds,
    "get_data": q_get_data,
    "anomaly_types": q_anomaly_types,
}

ANOMALY_ORACLE: dict[str, str] = {
    "daily_stats": SQL_DAILY_STATS,
    "top_values_per_sensor": SQL_TOP_VALUES_PER_SENSOR,
    "monitor_logs": SQL_MONITOR_LOGS,
    "out_of_range": SQL_OUT_OF_RANGE,
    "out_of_range_latest": SQL_OUT_OF_RANGE_LATEST,
    "timeout": SQL_TIMEOUT,
    "rate_of_change": SQL_RATE_OF_CHANGE,
    "z_score": SQL_Z_SCORE,
    "simple_z_score": SQL_SIMPLE_Z_SCORE,
    "iqr": SQL_IQR,
    "copy_log": SQL_COPY_LOG,
    "get_anomalies": SQL_GET_ANOMALIES,
    "most_recent": SQL_MOST_RECENT,
    "sensor_ids": SQL_SENSOR_IDS,
    "get_data": SQL_GET_DATA,
    "anomaly_types": SQL_ANOMALY_TYPES,
}
