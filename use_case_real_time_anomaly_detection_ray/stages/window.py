"""Per-group ordered-window primitives.

The reference's only window function is
``lagInFrame(x, 1) OVER (PARTITION BY id ORDER BY timestamp ASC ROWS BETWEEN 1
PRECEDING AND 1 PRECEDING)`` (``copy_rate_of_change.pipe:36-41``). Ray Data has
no window functions; the native expression is ``groupby(key).map_groups`` where
the group function sorts by the order column and shifts arrays by one —
a hash-shuffle on the group key, ordered work within the group
(SURVEY.md §2.6 W1). Callers MUST pre-filter to the detect window so the
shuffle moves only the window, never full history.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def lag_shift(
    ds: "ray.data.Dataset",
    key: str | Sequence[str],
    order: str,
    cols: Sequence[str],
    prefix: str = "previous_",
) -> "ray.data.Dataset":
    """For each group (by ``key``), sort ascending by ``order`` and add
    ``prefix + c`` = previous row's value of ``c`` for each ``c`` in ``cols``.

    Semantics match ``lagInFrame`` with a one-row frame: the first row of each
    group has **no** previous row. ClickHouse fills type-default values there
    (epoch-0 / 0.0, quirk Q5 in SURVEY.md §2.9); we emit ``NaN``/``NaT`` so the
    first row can never fake a slope — equivalent to the reference pipeline's
    net behavior, where the epoch-0 default makes ``|slope|`` tiny and the
    ``ABS(slope) > max_slope`` filter drops it (``copy_rate_of_change.pipe:58``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = list(cols)

    def shift_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per hash bucket of keys: sort by (keys, order),
        # shift, and null out the first row of each key run (its "previous"
        # belongs to a different key)
        g = g.sort_values(keys + [order], kind="mergesort").reset_index(drop=True)
        first_of_key = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            same = np.ones(len(g) - 1, dtype=bool)
            for k in keys:
                a = g[k].to_numpy()
                same &= a[1:] == a[:-1]
            first_of_key[1:] = ~same
        for c in cols:
            shifted = g[c].shift(1)
            shifted[first_of_key] = None
            g[prefix + c] = shifted
        return g

    from .reduce import grouped_agg

    return grouped_agg(ds, keys, lambda df: df, shift_bucket)


def top_k_by_key(
    ds: "ray.data.Dataset",
    key: str | Sequence[str],
    order: str | Sequence[str],
    k: int,
    descending: bool | Sequence[bool] = True,
) -> "ray.data.Dataset":
    """``LIMIT k BY key`` after ``ORDER BY order`` — the reference's per-sensor
    throttle (``content/interquartile-range.md:104``, SURVEY.md §2.6 W3).
    Pass multiple order columns for a deterministic tiebreak."""
    keys = [key] if isinstance(key, str) else list(key)
    orders = [order] if isinstance(order, str) else list(order)
    descs = [descending] * len(orders) if isinstance(descending, bool) else list(descending)

    def head_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(orders, ascending=[not d for d in descs], kind="mergesort")
        return g.groupby(keys, sort=False).head(k)

    from .reduce import grouped_agg

    # per-block partial top-k shrinks before the shuffle; bucket merge re-heads
    return grouped_agg(ds, keys, head_bucket, head_bucket)
