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
