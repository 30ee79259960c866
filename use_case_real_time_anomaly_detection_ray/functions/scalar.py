"""Scalar helpers: ClickHouse-compatible formatting and the per-type ``note``
constructors.

The reference builds a per-anomaly ``note`` string with ``concat(...,
toString(...), ...)`` (``copy_iqr.pipe:80``, ``copy_out_of_range.pipe:44``,
``copy_rate_of_change.pipe:56``, ``copy_z_score.pipe:53``,
``copy_timeout.pipe:38-39``; formats catalog ``content/copies-pipes.md:58-63``).
Formats here are byte-compatible with those examples. Note construction runs
only on already-filtered violation rows (a tiny fraction of the input), never
on the hot path.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np


def ch_float_str(x: float) -> str:
    """ClickHouse ``toString(Float64)``: shortest round-trip repr, integral
    floats printed without a decimal point (``toString(3.0) = '3'``)."""
    x = float(x)
    if math.isnan(x):
        return "nan"
    if math.isinf(x):
        return "inf" if x > 0 else "-inf"
    if x.is_integer() and abs(x) < 1e16:
        return str(int(x))
    return repr(x)


def ch_round(x, ndigits: int = 2):
    """ClickHouse ``ROUND(x, n)`` — banker's rounding on Float64, same as
    numpy's round-half-even (``rate_of_change.pipe:53``)."""
    return np.round(x, ndigits)


def note_out_of_range(min_value: float, max_value: float) -> str:
    """``concat('min:', toString(min_value),' max:', toString(max_value))``
    — copy_out_of_range.pipe:44. Example: ``min:200 max:2000``."""
    return f"min:{ch_float_str(min_value)} max:{ch_float_str(max_value)}"


NOTE_TIMEOUT = "timestamp is time of last report"  # copy_timeout.pipe:38


def note_rate_of_change(slope: float, max_slope: float, value_diff: float) -> str:
    """copy_rate_of_change.pipe:56. Example:
    ``slope:1390.79| max_slope:3| value_diff: 1390.79``."""
    return (
        f"slope:{ch_float_str(round_half_even(slope, 2))}"
        f"| max_slope:{ch_float_str(max_slope)}"
        f"| value_diff: {ch_float_str(round_half_even(value_diff, 2))}"
    )


def note_z_score(zscore: float, threshold: float, average: float, std_dev: float) -> str:
    """copy_z_score.pipe:53: ``concat('z-score: ', substring(toString(zscore),1,6),
    ' | ', multiIf(...), ' | average: ', ..., ' | std_dev: ', ...)``.

    ``average``/``std_dev`` arrive already ROUND(x,2)-ed by the upstream node
    (copy_z_score.pipe:39-40).
    """
    label = "low" if zscore < -threshold else ("high" if zscore > threshold else "ok")
    return (
        f"z-score: {ch_float_str(zscore)[:6]} | {label}"
        f" | average: {ch_float_str(average)} | std_dev: {ch_float_str(std_dev)}"
    )


def note_iqr(lower_bound: float, upper_bound: float) -> str:
    """copy_iqr.pipe:80: ``concat('lower_bound:', toString(ROUND(lower_bound,2)),
    '| upper_bound:', toString(upper_bound))``. Bounds arrive already rounded
    (copy_iqr.pipe:62-63). Example: ``lower_bound:1286| upper_bound:1509.25``."""
    return (
        f"lower_bound:{ch_float_str(round_half_even(lower_bound, 2))}"
        f"| upper_bound:{ch_float_str(upper_bound)}"
    )


def round_half_even(x: float, ndigits: int) -> float:
    """Scalar round-half-even matching numpy/ClickHouse ROUND."""
    return float(np.round(np.float64(x), ndigits))


def ch_quantile_exact_index(n: int, level: float) -> int:
    """ClickHouse ``quantileExact`` picks the element at 0-based index
    ``floor(level * n)`` of the sorted array, clamped to ``n - 1``
    (ClickHouse ``QuantileExact::getImpl``; used by ``copy_iqr.pipe:47-49``).
    This is NOT numpy's default interpolation."""
    if n <= 0:
        raise ValueError("empty array has no quantile")
    return min(int(level * n), n - 1)


def ch_quantile_exact(values: Iterable[float], level: float) -> float:
    arr = np.sort(np.asarray(list(values) if not isinstance(values, np.ndarray) else values))
    return float(arr[ch_quantile_exact_index(arr.size, level)])
