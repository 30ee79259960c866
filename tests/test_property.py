"""Property-based tests (hypothesis, derandomized): the shuffle-minimizing
reduce stages must agree with their single-machine pandas semantics on
arbitrary inputs — including duplicate keys, ties, empty groups and skew."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings, strategies as st

import ray.data

from use_case_real_time_anomaly_detection_ray.stages.reduce import (
    distinct_rows,
    group_count,
    latest_by_key,
)

SETTINGS = dict(max_examples=10, deadline=None, derandomize=True)


@st.composite
def keyed_frames(draw):
    n = draw(st.integers(1, 120))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    n_keys = draw(st.integers(1, 12))
    return pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n),
            "ts": rng.integers(0, 50, n),
            "v": rng.integers(-5, 5, n).astype("float64"),
        }
    )


def _ds(df):
    cut = max(1, len(df) // 3)
    return ray.data.from_pandas([df.iloc[:cut], df.iloc[cut:]]) if len(df) > cut \
        else ray.data.from_pandas(df)


@settings(**SETTINGS)
@given(keyed_frames())
def test_group_count_matches_pandas(df):
    got = (group_count(_ds(df), ["k"], out_col="n").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = (df.groupby("k").size().rename("n").reset_index()
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype({"k": "int64", "n": "int64"}),
                                  want.astype({"k": "int64", "n": "int64"}))


@settings(**SETTINGS)
@given(keyed_frames())
def test_latest_by_key_matches_pandas(df):
    got = (latest_by_key(_ds(df), ["k"], ["ts", "v"]).to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "ts", "v"], kind="mergesort")
            .drop_duplicates("k", keep="last")
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "ts", "v"]].astype(want.dtypes.to_dict()), want[["k", "ts", "v"]]
    )


@settings(**SETTINGS)
@given(keyed_frames())
def test_distinct_rows_matches_pandas(df):
    got = (distinct_rows(_ds(df), ["k", "ts"]).to_pandas()
           .sort_values(["k", "ts"]).reset_index(drop=True))
    want = (df.sort_values(["k", "ts", "v"], kind="mergesort")
            .drop_duplicates(["k", "ts"], keep="first")
            .sort_values(["k", "ts"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "ts", "v"]].astype(want.dtypes.to_dict()), want[["k", "ts", "v"]]
    )


@settings(**SETTINGS)
@given(keyed_frames())
def test_top_k_by_key_matches_pandas(df):
    from use_case_real_time_anomaly_detection_ray.stages.window import top_k_by_key

    got = (top_k_by_key(_ds(df), "k", ["ts", "v"], k=3).to_pandas()
           .sort_values(["k", "ts", "v"]).reset_index(drop=True))
    want = (df.sort_values(["ts", "v"], ascending=[False, False], kind="mergesort")
            .groupby("k", sort=False).head(3)
            .sort_values(["k", "ts", "v"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["k", "ts", "v"]].astype(want.dtypes.to_dict()), want[["k", "ts", "v"]]
    )


@settings(**SETTINGS)
@given(keyed_frames())
def test_lag_shift_matches_pandas(df):
    from use_case_real_time_anomaly_detection_ray.stages.window import lag_shift

    # make (k, ts) unique so the lag order is total and both sides agree
    df = df.drop_duplicates(["k", "ts"]).reset_index(drop=True)
    got = (lag_shift(_ds(df), "k", "ts", ["v"]).to_pandas()
           .sort_values(["k", "ts"]).reset_index(drop=True))
    want = df.sort_values(["k", "ts"], kind="mergesort").reset_index(drop=True)
    want["previous_v"] = want.groupby("k")["v"].shift(1)
    got_prev = got["previous_v"].astype("float64")
    pd.testing.assert_series_equal(got_prev, want["previous_v"],
                                   check_names=False)
    pd.testing.assert_frame_equal(
        got[["k", "ts", "v"]].astype(want[["k", "ts", "v"]].dtypes.to_dict()),
        want[["k", "ts", "v"]],
    )


@pytest.fixture(autouse=True)
def _session(ray_session):
    yield


@st.composite
def event_frames(draw):
    n = draw(st.integers(1, 150))
    rng = np.random.default_rng(draw(st.integers(0, 2**16)))
    return pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.integers(0, draw(st.integers(1, 8)), n),
        # small ts range forces duplicate timestamps and boundary gaps
        "ts_us": rng.integers(0, 40, n) * 7,
        "value": rng.integers(0, 500, n) / 100.0,
    })


def _sessions_reference(df, gap):
    """Brute-force per-user loop — the semantics the distributed op must match."""
    rows = []
    for uid, g in df.sort_values(["user_id", "ts_us", "event_id"]).groupby("user_id"):
        sid, start, last, cnt, cents = 0, None, None, 0, 0
        for _, r in g.iterrows():
            if last is None or r.ts_us - last > gap:
                if start is not None:
                    rows.append((uid, sid, start, last, cnt, cents / 100.0))
                sid += 1
                start, cnt, cents = r.ts_us, 0, 0
            last = r.ts_us
            cnt += 1
            cents += int(np.floor(r.value * 100 + 0.5))
        rows.append((uid, sid, start, last, cnt, cents / 100.0))
    out = pd.DataFrame(rows, columns=["user_id", "session_id", "start_us",
                                      "end_us", "n_events", "sum_value"])
    return out.astype({"user_id": "int64", "session_id": "int64",
                       "start_us": "int64", "end_us": "int64",
                       "n_events": "int64", "sum_value": "float64"})


@settings(**SETTINGS)
@given(event_frames(), st.integers(1, 60))
def test_sessionize_matches_reference(ray_session, df, gap):
    import pyarrow as pa

    from use_case_real_time_anomaly_detection_ray.pipelines.streamops import (
        sessionize,
    )

    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "ts": pa.array(df["ts_us"], pa.int64()).cast(pa.timestamp("us")),
        "value": pa.array(df["value"], pa.float64()),
    })
    cut = max(1, len(df) // 3)
    ds = ray.data.from_arrow([t.slice(0, cut), t.slice(cut)])
    got = (sessionize(ds, gap_us=gap).to_pandas()
           .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    got["start_us"] = got.pop("session_start").astype("datetime64[us]").astype("int64")
    got["end_us"] = got.pop("session_end").astype("datetime64[us]").astype("int64")
    want = (_sessions_reference(df, gap)
            .sort_values(["user_id", "session_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[["user_id", "session_id", "start_us", "end_us", "n_events",
             "sum_value"]].astype({"n_events": "int64"}),
        want.astype({"n_events": "int64"}))
