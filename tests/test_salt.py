"""Salted aggregation: equivalence to unsalted on a skewed key distribution
(SURVEY.md §5 'property tests for ... salted vs unsalted groupby
equivalence')."""

import numpy as np
import pandas as pd

import ray.data

from use_case_real_time_anomaly_detection_ray.stages.salt import salted_group_mean


def test_salted_mean_matches_pandas(ray_session):
    rng = np.random.default_rng(21)
    n = 20_000
    # hot key: 60% of rows land on key 0 (the monorepo shape)
    keys = np.where(rng.random(n) < 0.6, 0, rng.integers(1, 50, n))
    df = pd.DataFrame({"k": keys, "v": rng.normal(100, 10, n)})
    ds = ray.data.from_pandas([df.iloc[:7000], df.iloc[7000:14000], df.iloc[14000:]])
    got = (
        salted_group_mean(ds, ["k"], "v", num_salts=8)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = df.groupby("k").agg(n=("v", "size"), mean=("v", "mean")).reset_index()
    assert got["n"].tolist() == want["n"].tolist()
    np.testing.assert_allclose(got["mean"], want["mean"], rtol=1e-12)
