"""Reference-shaped ``incoming_data`` generator + wide-CSV source.

Re-implements the reference's data generators with seeded NumPy (FIXTURES.md
§2) for 1:1 conformance testing of the detector math:

* :func:`generate_incoming_data` — the live generator's per-sensor random
  walk (``data-generator/anomaly-dataset-live.py:45-105`` + presets
  ``settings.yaml:1-35``): init in [1400, 1600], normal jitter ±2, step
  changes ±[20, 50], out-of-bounds injections beyond [200, 2000], sensor
  presets (1 = no-outliers control, 2 = trend-up, 3 = trend-down —
  ``settings.yaml:23-35``), and sensor 5 stopping at a seeded iteration in
  [100, 150] (``anomaly-dataset-live.py:179-180,199-202``).
* :func:`write_wide_csv` / :func:`read_wide_csv` — the file generator's wide
  layout (one timestamp column + one column per sensor, 1 s cadence —
  ``data-generator/anomaly-dataset-to-file.py:96-112,170-180``) and its
  unpivot back to the canonical ``(id, timestamp, value)`` contract.
* NDJSON fixtures — the Events-API payload shape
  (``anomaly-dataset-live.py:157-164``), read via
  :func:`..readers.read_ndjson_incoming`.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.csv as pacsv

import ray.data

EPOCH = np.datetime64("2024-01-01T00:00:00", "us")


def generate_incoming_data(
    num_sensors: int = 10,
    num_iterations: int = 300,
    seed: int = 42,
    value_min: float = 200.0,
    value_max: float = 2000.0,
    init_lo: float = 1400.0,
    init_hi: float = 1600.0,
    jitter: float = 2.0,               # settings.yaml: value_max_change
    step_pct: float = 0.0004,          # settings.yaml: percent_step_change
    oob_pct: float = 0.0003,           # settings.yaml: percent_out_of_bounds
    step_lo: float = 20.0,
    step_hi: float = 50.0,
) -> pd.DataFrame:
    """One row per (iteration, reporting sensor): ``id, timestamp, value``.

    Sensor roles follow the reference presets: sensor 1 never emits
    outliers/steps (control), sensor 2 trends up, sensor 3 trends down,
    sensor 5 stops reporting at a seeded iteration in [100, 150]."""
    rng = np.random.default_rng(seed)
    stop_at = int(rng.integers(100, 151))  # anomaly-dataset-live.py:179-180
    values = rng.uniform(init_lo, init_hi, size=num_sensors)
    rows_id, rows_ts, rows_val = [], [], []
    trend = np.zeros(num_sensors)
    trend[2] = +1.0  # sensor 2 trends up   (settings.yaml:23-29)
    trend[3] = -1.0  # sensor 3 trends down (settings.yaml:30-35)
    for it in range(num_iterations):
        ts = EPOCH + np.timedelta64(it, "s")
        jit = rng.normal(0.0, jitter, size=num_sensors)
        for s in range(num_sensors):
            if s == 5 and it >= stop_at:   # sensor 5 stops
                continue
            v = values[s] + jit[s] + trend[s] * 2.0
            if s != 1:  # sensor 1 = clean control
                r = rng.random()
                if r < oob_pct:  # out-of-bounds injection
                    v = (value_min - rng.uniform(20, 200)
                         if rng.random() < 0.5
                         else value_max + rng.uniform(20, 1000))
                elif r < oob_pct + step_pct:  # step change ±[20,50]
                    v += rng.uniform(step_lo, step_hi) * (1 if rng.random() < 0.5 else -1)
            values[s] = v if s != 1 else values[s] + jit[s]
            rows_id.append(s)
            rows_ts.append(ts)
            rows_val.append(round(float(v), 2))
    return pd.DataFrame(
        {"id": pd.array(rows_id, dtype="int64"),
         "timestamp": pd.array(rows_ts).astype("datetime64[us]"),
         "value": pd.array(rows_val, dtype="float64")}
    )


def write_wide_csv(df: pd.DataFrame, path: str) -> None:
    """Pivot canonical rows to the file generator's wide CSV: ``timestamp,
    sensor_0, ..., sensor_N`` (``anomaly-dataset-to-file.py:96-112``)."""
    wide = df.pivot_table(index="timestamp", columns="id", values="value",
                          aggfunc="first")
    wide.columns = [f"sensor_{int(c)}" for c in wide.columns]
    wide.reset_index().to_csv(path, index=False)


def read_wide_csv(path: str) -> "ray.data.Dataset":
    """Read the wide CSV and unpivot back to ``(id, timestamp, value)`` —
    one vectorized melt per batch (the reference's rename-adapter idea,
    ``readme.md:106-112``, applied to the wide layout)."""
    ds = ray.data.read_csv(path)

    def melt(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        sensor_cols = [c for c in df.columns if c.startswith("sensor_")]
        out = df.melt(id_vars=["timestamp"], value_vars=sensor_cols,
                      var_name="sensor", value_name="value").dropna(subset=["value"])
        out["id"] = out["sensor"].str.removeprefix("sensor_").astype("int64")
        out["timestamp"] = pd.to_datetime(out["timestamp"]).astype("datetime64[us]")
        return pa.Table.from_pandas(
            out[["id", "timestamp", "value"]], preserve_index=False
        )

    return ds.map_batches(melt, batch_format="pyarrow")


def write_ndjson(df: pd.DataFrame, path: str) -> None:
    """Events-API NDJSON payload shape (``anomaly-dataset-live.py:157-164``,
    ``config/sample_report.json:1``)."""
    with open(path, "w") as f:
        for t in df.itertuples():
            ts = pd.Timestamp(t.timestamp).strftime("%Y-%m-%d %H:%M:%S")
            f.write(f'{{"timestamp": "{ts}", "id": {int(t.id)}, "value": {t.value}}}\n')
