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


def _collect(obj) -> pd.DataFrame:
    import ray.data as _rd

    if isinstance(obj, _rd.Dataset):
        # Dataset.to_pandas() of an all-empty-blocks result drops the columns;
        # concat the Arrow blocks instead (schema survives empties)
        from use_case_real_time_anomaly_detection_ray.stages.reduce import (
            to_arrow_single,
        )

        return to_arrow_single(obj).to_pandas()
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return obj


@pytest.mark.parametrize("name", sorted(ANOMALY_QUERIES))
def test_query_matches_oracle(name, sf_dir, duck):
    got = _collect(ANOMALY_QUERIES[name](sf_dir))
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


def test_out_of_range_requires_a_bound(sf_dir):
    """Mirror of out_of_range.pipe:28 error(): a range check with neither
    bound configured must raise, and one-sided bounds must work."""
    from use_case_real_time_anomaly_detection_ray.pipelines import anomaly
    from use_case_real_time_anomaly_detection_ray.pipelines.queries import (
        EVENTS_PARAMS, _events, _now,
    )

    ds = _events(sf_dir)
    now = _now(sf_dir)
    with pytest.raises(ValueError, match="min_value or max_value"):
        anomaly.out_of_range(
            ds, EVENTS_PARAMS.with_(min_value=None, max_value=None), now
        )
    lo_only = _collect(
        anomaly.out_of_range(ds, EVENTS_PARAMS.with_(max_value=None), now)
    )
    hi_only = _collect(
        anomaly.out_of_range(ds, EVENTS_PARAMS.with_(min_value=None), now)
    )
    both = _collect(anomaly.out_of_range(ds, EVENTS_PARAMS, now))
    assert (lo_only["value"] < EVENTS_PARAMS.min_value).all()
    assert (hi_only["value"] > EVENTS_PARAMS.max_value).all()
    assert len(lo_only) + len(hi_only) == len(both)
    assert set(lo_only["note"]) <= {"min:-100"}
    assert set(hi_only["note"]) <= {"max:100"}


def test_get_anomalies_optional_filters(sf_dir):
    """get_anomalies.pipe:12-19: optional sensor_id / anomaly_type filters."""
    from use_case_real_time_anomaly_detection_ray.pipelines.queries import (
        get_anomalies,
    )

    full = _collect(get_anomalies(sf_dir, hours=24 * 30))
    one_type = _collect(
        get_anomalies(sf_dir, hours=24 * 30, anomaly_type="timeout")
    )
    assert set(one_type["anomaly_type"]) <= {"timeout"}
    assert len(one_type) == (full["anomaly_type"] == "timeout").sum()
    sid = int(full["id"].iloc[0])
    one_sensor = _collect(get_anomalies(sf_dir, hours=24 * 30, sensor_id=sid))
    assert set(one_sensor["id"]) == {sid}
    assert len(one_sensor) == (full["id"] == sid).sum()
