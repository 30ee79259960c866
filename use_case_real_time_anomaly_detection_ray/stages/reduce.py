"""Shuffle-minimizing reduction stages.

The scale discipline (SURVEY.md §4): never ship raw rows into a ``groupby``
when a per-block partial can shrink them first. Each helper here runs a
vectorized partial inside ``map_batches`` (one output row per key per block),
then a small ``groupby(key)`` merge over the partials — the all-to-all
exchange moves ``O(keys × blocks)`` rows instead of ``O(rows)``.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data


def _pd_to_arrow(df: pd.DataFrame) -> pa.Table:
    """All stages emit Arrow blocks so unions/iteration never mix block types."""
    return pa.Table.from_pandas(df, preserve_index=False)


def _sort_last_per_key(df: pd.DataFrame, keys: Sequence[str], order: Sequence[str],
                       descending: Sequence[bool]) -> pd.DataFrame:
    """Vectorized 'best row per key': sort by (keys, order) and keep the last
    row of each key run. Deterministic given a deterministic total order."""
    by = list(keys) + list(order)
    # descending=True means "prefer the largest": sort that column ascending
    # and keep the last row of each key run.
    asc = [True] * len(keys) + [bool(d) for d in descending]
    df = df.sort_values(by, ascending=asc, kind="mergesort")
    return df.drop_duplicates(subset=list(keys), keep="last")


def latest_by_key(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    order: Sequence[str],
    descending: Sequence[bool] | None = None,
    batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """``ORDER BY <order> DESC LIMIT 1 BY <keys>`` — the reference's
    latest-per-sensor idiom (``copy_timeout.pipe:21-22``,
    ``most_recent.pipe:14-15``, ``copy_out_of_range.pipe:46-47``).

    Two-phase: per-block partial argmax (≤ one row per key per block) inside
    ``map_batches``, then a tiny ``groupby(keys).map_groups`` over partials.
    The shuffle carries only partials, so a full-history scan stays cheap at
    100 TB as long as the key cardinality is modest (sensor/repo count).

    ``descending=True`` for a column means "prefer the largest value", i.e.
    the kept row maximizes the order columns in priority order.
    """
    keys = list(keys)
    order = list(order)
    if descending is None:
        descending = [True] * len(order)

    def partial(df: pd.DataFrame) -> pa.Table:
        if len(df) > 0:
            df = _sort_last_per_key(df, keys, order, descending)
        return _pd_to_arrow(df)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    def merge(g: pd.DataFrame) -> pa.Table:
        return _pd_to_arrow(_sort_last_per_key(g, keys, order, descending))

    return partials.groupby(keys).map_groups(merge, batch_format="pandas")


def distinct_rows(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """Exact dedup keeping an arbitrary-but-deterministic first row per key —
    the reference's ``LIMIT 1 BY timestamp, id, anomaly_type``
    (``dedup_log.pipe:6``) / ``ReplacingMergeTree`` backstop
    (``copy_log.datasource:10-12``). Same partial-then-merge shape as
    :func:`latest_by_key`."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pa.Table:
        if len(df) > 0:
            df = df.sort_values(keys, kind="mergesort").drop_duplicates(subset=keys, keep="first")
        return _pd_to_arrow(df)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return partials.groupby(keys).map_groups(
        lambda g: _pd_to_arrow(g.sort_values(list(g.columns), kind="mergesort").head(1)),
        batch_format="pandas",
    )


def group_count(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    out_col: str = "n",
    batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """``GROUP BY keys → count(*)`` with per-block pre-aggregation; the basis
    of the uniqueness check (SURVEY.md §2.7 D4)."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _pd_to_arrow(df.assign(**{out_col: pd.Series(dtype="int64")})[keys + [out_col]])
        return _pd_to_arrow(df.groupby(keys, sort=False, observed=True).size().reset_index(name=out_col))

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    def merge(g: pd.DataFrame) -> pa.Table:
        head = g.iloc[[0]][keys].reset_index(drop=True)
        head[out_col] = int(g[out_col].sum())
        return _pd_to_arrow(head)

    return partials.groupby(keys).map_groups(merge, batch_format="pandas")


def to_arrow_single(ds: "ray.data.Dataset") -> pa.Table:
    """Collect a (small!) dataset into one Arrow table on the driver. Only for
    broadcast sides, verdicts, and test outputs — never the main input."""
    import ray as _ray

    tabs = _ray.get(ds.to_arrow_refs())
    if not tabs:
        return pa.table({})
    non_empty = [t for t in tabs if t.num_rows > 0]
    if not non_empty:
        return tabs[0]
    return pa.concat_tables(non_empty, promote_options="default").combine_chunks()
