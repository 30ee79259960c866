"""Join strategies.

The reference's only joins are tiny stats-CTE inner joins
(``z_score.pipe:34``, ``copy_iqr.pipe:60``): the right side is one row per
sensor id. The Ray-Data-native equivalent is a **broadcast join** — aggregate
the small side, ``ray.put`` it once, and look it up vectorized inside
``map_batches``; no all-to-all shuffle of the big side (SURVEY.md §2.4 J1/J2).

For big-big joins the engine uses an explicit bucketed hash join
(:func:`bucketed_join`); semi/anti joins broadcast the key set
(:func:`broadcast_semi_anti`).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


class BroadcastStats:
    """A driver-built small table, shipped once via ``ray.put`` and joined
    against every batch with a vectorized pandas merge.

    Used as ``ds.map_batches(BroadcastStats.joiner(ref, on, how), ...)`` —
    each Ray worker deserializes the table once per process (zero-copy from
    the local object store), not once per batch.
    """

    def __init__(self, ref: "ray.ObjectRef", on: Sequence[str], how: str = "inner"):
        self.small: pd.DataFrame = ray.get(ref)
        self.on = list(on)
        self.how = how

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if len(batch) > 0:
            batch = batch.merge(self.small, on=self.on, how=self.how, sort=False)
        else:
            batch = batch.merge(self.small.iloc[0:0], on=self.on, how="left", sort=False)
        return pa.Table.from_pandas(batch, preserve_index=False)


def broadcast(df: pd.DataFrame) -> "ray.ObjectRef":
    """Put a small lookup table in the object store once (per SURVEY.md §2.4:
    broadcast, don't re-ship per batch)."""
    return ray.put(df)


def broadcast_join(
    ds: "ray.data.Dataset",
    small: pd.DataFrame,
    on: Sequence[str],
    how: str = "inner",
    batch_size: int | None = 65536,
    **map_kwargs,
) -> "ray.data.Dataset":
    ref = broadcast(small)
    return ds.map_batches(
        BroadcastStats,
        fn_constructor_args=(ref, list(on), how),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=map_kwargs.pop("concurrency", (1, 8)),
        **map_kwargs,
    )


class _SemiAnti:
    def __init__(self, ref, on, anti):
        keys: pd.DataFrame = ray.get(ref)
        self.on = list(on)
        self.anti = anti
        self.index = pd.MultiIndex.from_frame(keys[self.on]) if len(self.on) > 1 \
            else pd.Index(keys[self.on[0]])

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if len(batch) > 0:
            probe = (pd.MultiIndex.from_frame(batch[self.on]) if len(self.on) > 1
                     else pd.Index(batch[self.on[0]]))
            mask = probe.isin(self.index)
            batch = batch[~mask] if self.anti else batch[mask]
        return pa.Table.from_pandas(batch, preserve_index=False)


def broadcast_semi_anti(
    ds: "ray.data.Dataset",
    keys: pd.DataFrame,
    on: Sequence[str],
    anti: bool = False,
    batch_size: int | None = 65536,
) -> "ray.data.Dataset":
    """Semi (``anti=False``) / anti (``anti=True``) join against a broadcast
    key set — the referential-integrity check's core (SURVEY.md §2.4 J3):
    violations are the anti-join of child keys vs the parent key set."""
    ref = broadcast(keys)
    return ds.map_batches(
        _SemiAnti,
        fn_constructor_args=(ref, list(on), anti),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


def add_hash_bucket(
    ds: "ray.data.Dataset",
    on: Sequence[str],
    num_buckets: int,
    out_col: str = "__bucket",
) -> "ray.data.Dataset":
    """Attach ``hash(on) % num_buckets`` — the explicit co-partitioning key
    for big-big joins and salt-style skew splitting."""
    on = list(on)

    def bucketize(batch: pa.Table) -> pa.Table:
        h = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in on:
            col = batch[c].to_pandas()
            h = h * np.uint64(1000003) + pd.util.hash_array(np.asarray(col)).astype(np.uint64)
        return batch.append_column(out_col, pa.array((h % np.uint64(num_buckets)).astype(np.int32)))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def bucketed_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Sequence[str],
    num_buckets: int = 64,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Explicit partitioned hash join: both sides get ``hash(on) % B`` and are
    co-grouped per bucket; the pairwise merge happens inside ``map_groups``.
    Used only when BOTH sides are large (the reference never needs this; the
    training-data ops do). Prefers ``Dataset.join`` when this Ray version has
    it."""
    on = list(on)
    if hasattr(left, "join"):
        try:
            return left.join(right, join_type=how, num_partitions=num_buckets, on=tuple(on))
        except Exception:
            pass  # fall back to the explicit bucketed implementation
    lb = add_hash_bucket(left, on, num_buckets)
    rb = add_hash_bucket(right, on, num_buckets)
    rb = rb.map_batches(
        lambda t: t.rename_columns([c if c in on or c == "__bucket" else f"__r_{c}"
                                    for c in t.column_names]),
        batch_format="pyarrow",
    )
    tagged_l = lb.map_batches(lambda t: t.append_column("__side", pa.array(np.zeros(t.num_rows, dtype=np.int8))), batch_format="pyarrow")
    tagged_r = rb.map_batches(lambda t: t.append_column("__side", pa.array(np.ones(t.num_rows, dtype=np.int8))), batch_format="pyarrow")
    both = tagged_l.union(tagged_r)

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0].drop(columns=["__side", "__bucket"]).dropna(axis=1, how="all")
        rg = g[g["__side"] == 1].drop(columns=["__side", "__bucket"]).dropna(axis=1, how="all")
        lg = lg[[c for c in lg.columns if not c.startswith("__r_")]]
        rg = rg[on + [c for c in rg.columns if c.startswith("__r_")]]
        rg = rg.rename(columns={c: c[4:] for c in rg.columns if c.startswith("__r_")})
        return pa.Table.from_pandas(lg.merge(rg, on=on, how=how, sort=False), preserve_index=False)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
