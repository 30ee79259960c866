"""Unit tests for ClickHouse-compatible scalar helpers (SURVEY.md §2.8)."""

import numpy as np

from use_case_real_time_anomaly_detection_ray.functions import scalar


def test_ch_float_str_integral():
    assert scalar.ch_float_str(3.0) == "3"
    assert scalar.ch_float_str(2000.0) == "2000"
    assert scalar.ch_float_str(-5.0) == "-5"


def test_ch_float_str_fractional():
    assert scalar.ch_float_str(1390.79) == "1390.79"
    assert scalar.ch_float_str(0.5) == "0.5"
    assert scalar.ch_float_str(float("nan")) == "nan"
    assert scalar.ch_float_str(float("inf")) == "inf"


def test_note_formats_match_reference_examples():
    # content/copies-pipes.md:58-63 examples
    assert scalar.note_out_of_range(200, 2000) == "min:200 max:2000"
    assert scalar.note_iqr(1286.0, 1509.25) == "lower_bound:1286| upper_bound:1509.25"
    assert (
        scalar.note_rate_of_change(1390.79, 3, 1390.79)
        == "slope:1390.79| max_slope:3| value_diff: 1390.79"
    )
    assert scalar.NOTE_TIMEOUT == "timestamp is time of last report"


def test_note_z_score():
    n = scalar.note_z_score(2.3355182, 2.0, 798.71, 5.38)
    assert n == "z-score: 2.3355 | high | average: 798.71 | std_dev: 5.38"
    n = scalar.note_z_score(-2.71828, 2.0, 10.0, 1.0)
    assert n.startswith("z-score: -2.718 | low")


def test_ch_quantile_exact_nearest_rank():
    # ClickHouse quantileExact = sorted[floor(level*n)] clamped to n-1
    v = [1.0, 2.0, 3.0, 4.0]
    assert scalar.ch_quantile_exact(v, 0.25) == 2.0
    assert scalar.ch_quantile_exact(v, 0.5) == 3.0
    assert scalar.ch_quantile_exact(v, 0.75) == 4.0
    assert scalar.ch_quantile_exact([7.0], 0.75) == 7.0
    v5 = [10.0, 20.0, 30.0, 40.0, 50.0]
    assert scalar.ch_quantile_exact(v5, 0.5) == 30.0
    assert scalar.ch_quantile_exact(v5, 0.25) == 20.0


def test_round_half_even_matches_numpy():
    assert scalar.round_half_even(2.675, 2) == float(np.round(2.675, 2))
