"""Every anomaly query vs its DuckDB oracle on sf0.001 — the same comparison
the driver runs at sf0.01 (row count + schema + order-insensitive values)."""

import numpy as np
import pandas as pd
import pytest

from use_case_real_time_anomaly_detection_ray.pipelines.queries import (
    ANOMALY_ORACLE,
    ANOMALY_QUERIES,
)
from use_case_real_time_anomaly_detection_ray.pipelines.tqueries import (
    TEXT_ORACLE,
    TEXT_QUERIES,
)
from use_case_real_time_anomaly_detection_ray.pipelines.vqueries import (
    VALIDATION_ORACLE,
    VALIDATION_QUERIES,
)

ANOMALY_QUERIES = {**ANOMALY_QUERIES, **VALIDATION_QUERIES,
                   **{k: TEXT_QUERIES[k] for k in TEXT_ORACLE}}
ANOMALY_ORACLE = {**ANOMALY_ORACLE, **VALIDATION_ORACLE, **TEXT_ORACLE}


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(ANOMALY_QUERIES))
def test_query_matches_oracle(name, sf_dir, duck):
    got = ANOMALY_QUERIES[name](sf_dir)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    want = duck.sql(ANOMALY_ORACLE[name]).df()
    got, want = _normalize(got), _normalize(want)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            np.testing.assert_allclose(
                got[c].to_numpy(), want[c].to_numpy(), rtol=0, atol=0,
                err_msg=f"{name}.{c}",
            )
        else:
            pd.testing.assert_series_equal(
                got[c], want[c], check_names=False, check_dtype=False,
                obj=f"{name}.{c}",
            )
