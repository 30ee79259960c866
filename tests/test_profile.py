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
