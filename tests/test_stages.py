"""Stage-primitive tests against pandas oracles (synthetic micro-tables)."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from use_case_real_time_anomaly_detection_ray.stages.join import (
    broadcast_join,
    broadcast_semi_anti,
    bucketed_join,
)
from use_case_real_time_anomaly_detection_ray.stages.reduce import (
    distinct_rows,
    group_count,
    latest_by_key,
)
from use_case_real_time_anomaly_detection_ray.stages.window import lag_shift, top_k_by_key


@pytest.fixture()
def micro():
    rng = np.random.default_rng(42)
    n = 500
    return pd.DataFrame(
        {
            "id": rng.integers(0, 7, n),
            # unique timestamps: with ties, the row *after* a tie has an
            # ambiguous previous_* under any stable sort
            "ts": rng.permutation(100_000)[:n],
            "value": rng.normal(50, 10, n).round(3),
        }
    )


def _ds(df, blocks=5):
    return ray.data.from_pandas([d for _, d in df.groupby(np.arange(len(df)) % blocks)])


def test_latest_by_key(micro):
    got = (
        latest_by_key(_ds(micro), ["id"], ["ts", "value"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = (
        micro.sort_values(["id", "ts", "value"], kind="mergesort")
        .drop_duplicates("id", keep="last")
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["id", "ts", "value"]], want[["id", "ts", "value"]])


def test_distinct_rows(micro):
    dup = pd.concat([micro, micro.head(100)], ignore_index=True)
    got = distinct_rows(_ds(dup), ["id", "ts", "value"]).to_pandas()
    want = dup.drop_duplicates(["id", "ts", "value"])
    assert len(got) == len(want)


def test_group_count(micro):
    got = group_count(_ds(micro), ["id"], out_col="n").to_pandas().sort_values("id")
    want = micro.groupby("id").size().reset_index(name="n").sort_values("id")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"n": "int64"}), want.reset_index(drop=True)
    )


def test_lag_shift_matches_pandas(micro):
    got = lag_shift(_ds(micro), "id", "ts", ["ts", "value"]).to_pandas()
    got = got.sort_values(["id", "ts", "value"]).reset_index(drop=True)
    want = micro.sort_values(["ts"], kind="mergesort")
    want = want.groupby("id", group_keys=False).apply(
        lambda g: g.assign(previous_ts=g["ts"].shift(1), previous_value=g["value"].shift(1))
    )
    want = want.sort_values(["id", "ts", "value"]).reset_index(drop=True)
    # rows sharing (id, ts) may swap previous_* assignment between engines;
    # compare on rows with unique (id, ts)
    uniq = ~want.duplicated(["id", "ts"], keep=False)
    pd.testing.assert_frame_equal(
        got.loc[uniq, ["id", "ts", "previous_ts", "previous_value"]].reset_index(drop=True),
        want.loc[uniq, ["id", "ts", "previous_ts", "previous_value"]].reset_index(drop=True),
        check_dtype=False,
    )


def test_top_k_by_key(micro):
    got = top_k_by_key(_ds(micro), "id", "value", k=3).to_pandas()
    want = micro.sort_values("value", ascending=False).groupby("id").head(3)
    assert len(got) == len(want)
    assert sorted(got["value"]) == sorted(want["value"])


def test_broadcast_join(micro):
    small = pd.DataFrame({"id": range(7), "name": [f"s{i}" for i in range(7)]})
    got = broadcast_join(_ds(micro), small, on=["id"]).to_pandas()
    want = micro.merge(small, on="id")
    assert len(got) == len(want)
    assert set(got.columns) == {"id", "ts", "value", "name"}


def test_broadcast_semi_anti(micro):
    keys = pd.DataFrame({"id": [0, 1, 2]})
    semi = broadcast_semi_anti(_ds(micro), keys, on=["id"]).to_pandas()
    anti = broadcast_semi_anti(_ds(micro), keys, on=["id"], anti=True).to_pandas()
    assert set(semi["id"]) <= {0, 1, 2}
    assert set(anti["id"]).isdisjoint({0, 1, 2})
    assert len(semi) + len(anti) == len(micro)


def test_bucketed_join(micro):
    right = pd.DataFrame({"id": range(7), "w": np.arange(7) * 1.5})
    got = bucketed_join(_ds(micro), _ds(right, blocks=2), on=["id"], num_buckets=4).to_pandas()
    want = micro.merge(right, on="id")
    assert len(got) == len(want)
    assert np.isclose(got["w"].sum(), want["w"].sum())


def test_bucketed_merge_null_int_keys_colocate(ray_session):
    """The bucket hash must depend on the key TYPE only, never per-block
    null_count: a key value present both in a null-free block and a
    null-carrying block must land in ONE merge group (regression: the int
    fast path used to apply only to null-free blocks, splitting key 42's
    rows across two hash functions)."""
    import pyarrow as pa

    import ray as _ray
    from use_case_real_time_anomaly_detection_ray.stages.reduce import (
        bucketed_merge,
        to_arrow_single,
    )

    t1 = pa.table({"k": pa.array([42, 7, 42], pa.int64()),
                   "v": pa.array([1.0, 2.0, 3.0])})
    t2 = pa.table({"k": pa.array([42, None, 7], pa.int64()),
                   "v": pa.array([4.0, 5.0, 6.0])})
    ds = _ray.data.from_arrow([t1, t2])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("k", sort=False, dropna=False)["v"].sum().reset_index()

    out = to_arrow_single(bucketed_merge(ds, ["k"], merge, num_buckets=8)).to_pandas()
    # every key reduced in exactly one group => one output row per key
    assert len(out) == out["k"].nunique(dropna=False)
    got = {(-1 if pd.isna(k) else int(k)): v for k, v in zip(out["k"], out["v"])}
    assert got[42] == 1.0 + 3.0 + 4.0
    assert got[7] == 2.0 + 6.0
    assert got[-1] == 5.0
