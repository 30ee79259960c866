"""Source coverage: reference-shaped walk generator, wide-CSV round-trip,
NDJSON ingest, schema contract — and detector conformance on the generated
walk (the reference's de-facto validation corpus, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from use_case_real_time_anomaly_detection_ray.config import DetectorParams
from use_case_real_time_anomaly_detection_ray.pipelines import anomaly
from use_case_real_time_anomaly_detection_ray.sources import incoming
from use_case_real_time_anomaly_detection_ray.sources.readers import (
    INCOMING_DATA_SCHEMA,
    read_ndjson_incoming,
)


@pytest.fixture(scope="module")
def walk():
    return incoming.generate_incoming_data(num_iterations=300, seed=42)


def test_walk_shape_and_roles(walk):
    assert list(walk.columns) == ["id", "timestamp", "value"]
    # sensor 5 stops somewhere in [100, 150) iterations
    last5 = walk[walk.id == 5]["timestamp"].max()
    stop_iter = int((last5 - pd.Timestamp("2024-01-01")).total_seconds())
    assert 99 <= stop_iter <= 150
    # trends: sensor 2 ends higher than it starts, sensor 3 lower
    for sid, sign in [(2, 1), (3, -1)]:
        s = walk[walk.id == sid].sort_values("timestamp")["value"]
        assert np.sign(s.iloc[-1] - s.iloc[0]) == sign
    assert walk.duplicated(["id", "timestamp"]).sum() == 0


def test_walk_deterministic(walk):
    again = incoming.generate_incoming_data(num_iterations=300, seed=42)
    pd.testing.assert_frame_equal(walk, again)


def test_detectors_on_walk(walk, ray_session):
    """End-to-end conformance on the reference-shaped corpus: the stopped
    sensor produces a timeout, detectors run clean on second-cadence data."""
    ds = ray.data.from_pandas(walk).map_batches(
        lambda t: t.cast(INCOMING_DATA_SCHEMA), batch_format="pyarrow"
    )
    now = walk["timestamp"].max()
    p = DetectorParams(detect_window_seconds=301, stats_window_minutes=10,
                       timeout_seconds=10, max_slope=3.0)
    tmo = anomaly.timeout(ds, p, now).to_pandas()
    assert 5 in set(tmo["id"])  # the stopped sensor
    log = anomaly.copy_log(ds, p, now).to_pandas()
    assert set(log["anomaly_type"]) <= {
        "out-of-range", "timeout", "rate-of-change", "z-score", "interquartile-range"
    }
    # the clean control sensor (id=1) never hits out-of-range
    assert not ((log["id"] == 1) & (log["anomaly_type"] == "out-of-range")).any()


def test_wide_csv_roundtrip(walk, tmp_path, ray_session):
    path = str(tmp_path / "wide.csv")
    incoming.write_wide_csv(walk, path)
    back = incoming.read_wide_csv(path).to_pandas()
    a = walk.sort_values(["id", "timestamp"]).reset_index(drop=True)
    b = back.sort_values(["id", "timestamp"]).reset_index(drop=True)
    assert len(a) == len(b)
    pd.testing.assert_series_equal(a["value"], b["value"], check_exact=False)


def test_ndjson_ingest(walk, tmp_path, ray_session):
    path = str(tmp_path / "events.ndjson")
    sub = walk.head(100)
    incoming.write_ndjson(sub, path)
    ds = read_ndjson_incoming(path)
    got = ds.to_pandas()
    assert len(got) == 100
    assert got["id"].tolist() == sub["id"].tolist()
    np.testing.assert_allclose(got["value"], sub["value"])
    assert str(got["timestamp"].dtype).startswith("datetime64")
