"""Explicit salted aggregation — the skew-splitting idiom named by the
north_rule ("skew from giant monorepos is handled by salted repartitioning
before the groupby-aggregate stages").

The engine's default aggregations already neutralize skew structurally
(per-block partials collapse a hot key before any exchange —
``stages/reduce.py``). This module provides the *explicit* salted form for
aggregations where a single key's partials are still too many for one
reducer: stage 1 groups by ``(key, salt)`` where ``salt = row_hash % S``
(splitting a hot key across S reducers), stage 2 merges the S sub-aggregates
per key. Correct for any associative merge (sums/moments/min/max — the same
mergeability that makes Welford/t-digest work).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .reduce import bucketed_merge, grouped_agg

_KEY_MIX = np.uint64(0x9E3779B97F4A7C15)


def key_salt(col: "pa.ChunkedArray | pa.Array", num_salts: int) -> np.ndarray:
    """Deterministic per-KEY salt: Fibonacci-mixed hash of an integer key
    column mod ``num_salts`` (int32). All rows of one key share a salt, so
    per-salt DISTINCT / first-seen folds stay exact while a hot aggregation
    key's reducer work splits across ``num_salts`` shuffle groups — the
    subbucket mechanism of ``streamops.tumbling_agg``'s two-level
    distinct-user fold."""
    v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    return ((v * _KEY_MIX) % np.uint64(num_salts)).astype(np.int32)


def salted_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_salts: int = 16,
    num_buckets: int = 64,
    seed: int = 1,
) -> "ray.data.Dataset":
    """Two-stage salted aggregation.

    ``partial_fn``: per-block pandas aggregation grouped by ``keys + ['__salt']``
    (the function receives the frame with ``__salt`` attached and must group by
    ``keys + ['__salt']``). ``merge_fn``: combines sub-aggregates per key (sees
    all (key, salt) partials of its hash bucket; must group by ``keys`` and
    drop ``__salt``)."""
    keys = list(keys)
    rng_seed = np.uint64(seed * 2654435761 % (1 << 31))

    def add_salt(df: pd.DataFrame) -> pa.Table:
        df = df.copy()
        # row-position salt: uniform, cheap, independent of key values
        df["__salt"] = (
            (np.arange(len(df), dtype=np.uint64) * np.uint64(2654435761) + rng_seed)
            % np.uint64(num_salts)
        ).astype(np.int32)
        return pa.Table.from_pandas(partial_fn(df), preserve_index=False)

    partials = ds.map_batches(add_salt, batch_format="pandas", batch_size=None)
    return bucketed_merge(partials, keys, merge_fn, num_buckets)


def salted_group_mean(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    value_col: str,
    num_salts: int = 16,
) -> "ray.data.Dataset":
    """Reference implementation: mean of ``value_col`` per key with hot-key
    salting. Output: ``keys + [n, mean]``."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys + ["__salt"], sort=False).agg(
            n=(value_col, "size"), s=(value_col, "sum")
        ).reset_index()
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(keys, sort=False).agg(n=("n", "sum"), s=("s", "sum")).reset_index()
        agg["mean"] = agg["s"] / agg["n"]
        return agg.drop(columns=["s"])

    return salted_agg(ds, keys, partial, merge, num_salts=num_salts)
