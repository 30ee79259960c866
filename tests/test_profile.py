"""StatsAccumulator actor-pool profile vs numpy on the lineitem table."""

import numpy as np
import pyarrow.parquet as pq

from use_case_real_time_anomaly_detection_ray.pipelines.profile import column_profile
from use_case_real_time_anomaly_detection_ray.sources.readers import read_table

COLS = ["l_quantity", "l_extendedprice"]


def test_column_profile_matches_numpy(sf_dir, ray_session):
    ds = read_table(sf_dir, "lineitem", columns=COLS)
    prof = column_profile(ds, COLS).set_index("column")
    raw = pq.read_table(f"{sf_dir}/lineitem.parquet", columns=COLS)
    for c in COLS:
        v = raw[c].to_numpy().astype("float64")
        row = prof.loc[c]
        assert row["n"] == v.size and row["nulls"] == 0
        assert np.isclose(row["mean"], v.mean())
        assert np.isclose(row["std_pop"], v.std(ddof=0))
        assert row["vmin"] == v.min() and row["vmax"] == v.max()
        spread = v.max() - v.min()
        for q, col in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75")]:
            assert abs(row[col] - np.quantile(v, q)) < 0.02 * spread, (c, q)


def test_exact_cents_profile_survives_int64_overflow(ray_session):
    """Sum of squared cents exceeding int64 must stay exact (a SQL engine
    promotes to HUGEINT; numpy silently wraps — seen at sf0.1 on
    l_extendedprice)."""
    import numpy as np
    import pandas as pd

    import ray.data

    from use_case_real_time_anomaly_detection_ray.pipelines.profile import (
        column_profile_exact_cents,
    )

    n = 200_000
    v = np.full(n, 99_999_999.99)  # cents ~1e10, squared ~1e20 per row
    df = pd.DataFrame({"x": v})
    ds = ray.data.from_pandas([df.iloc[:n // 2], df.iloc[n // 2:]])
    out = column_profile_exact_cents(ds, ["x"])
    assert out["mean"].iloc[0] == 99_999_999.99
    assert out["std_pop"].iloc[0] == 0.0  # constant column; overflow would wreck this
