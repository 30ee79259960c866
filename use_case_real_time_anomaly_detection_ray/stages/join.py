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

from .reduce import _hash_keys_arrow


#: per-process cache of fetched broadcast objects (a local-plasma ray.get is
#: near-free, but caching also skips deserialization of pandas payloads).
#: BOUNDED FIFO: every brute-force/LSH/IVF/cluster-map call puts a fresh ref,
#: and an unbounded cache would pin each one in every worker for the session
#: lifetime (monotone RSS growth in long-lived sessions).
_BCAST_CACHE: dict = {}
_BCAST_CACHE_MAX = 8


def _fetch(ref):
    if ref not in _BCAST_CACHE:
        while len(_BCAST_CACHE) >= _BCAST_CACHE_MAX:
            _BCAST_CACHE.pop(next(iter(_BCAST_CACHE)))
        _BCAST_CACHE[ref] = ray.get(ref)
    return _BCAST_CACHE[ref]


def _broadcast_merge(batch: pd.DataFrame, ref, on: list[str], how: str) -> pa.Table:
    """Join one batch against the broadcast small table (stateless task —
    instant elasticity; the table is fetched once per worker process)."""
    small: pd.DataFrame = _fetch(ref)
    if len(batch) > 0:
        batch = batch.merge(small, on=on, how=how, sort=False)
    else:
        batch = batch.merge(small.iloc[0:0], on=on, how="left", sort=False)
    return pa.Table.from_pandas(batch, preserve_index=False).replace_schema_metadata(None)


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
    import functools

    ref = broadcast(small)
    map_kwargs.pop("concurrency", None)
    return ds.map_batches(
        functools.partial(_broadcast_merge, ref=ref, on=list(on), how=how),
        batch_format="pandas",
        batch_size=batch_size,
        **map_kwargs,
    )


def _semi_anti_filter(batch: pd.DataFrame, ref, on: list[str], anti: bool) -> pa.Table:
    keys: pd.DataFrame = _fetch(ref)
    if len(batch) > 0:
        index = (pd.MultiIndex.from_frame(keys[on]) if len(on) > 1
                 else pd.Index(keys[on[0]]))
        probe = (pd.MultiIndex.from_frame(batch[on]) if len(on) > 1
                 else pd.Index(batch[on[0]]))
        mask = probe.isin(index)
        batch = batch[~mask] if anti else batch[mask]
    return pa.Table.from_pandas(batch, preserve_index=False).replace_schema_metadata(None)


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
    import functools

    ref = broadcast(keys)
    return ds.map_batches(
        functools.partial(_semi_anti_filter, ref=ref, on=list(on), anti=anti),
        batch_format="pandas",
        batch_size=batch_size,
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
        # shared null-safe hasher (stages.reduce): bucket ids must depend on
        # the key TYPE only — a pandas roundtrip here upcast null-carrying
        # int blocks to float64 and hashed equal keys into different buckets
        # per block (ADVICE r3)
        b = _hash_keys_arrow(batch, on, num_buckets)
        return batch.append_column(out_col, pa.array(b, pa.int32()))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def bucketed_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: Sequence[str],
    num_buckets: int = 64,
    how: str = "inner",
    prefer_native: bool = True,
) -> "ray.data.Dataset":
    """Explicit partitioned hash join: both sides get ``hash(on) % B`` and are
    co-grouped per bucket; the pairwise merge happens inside ``map_groups``.
    Used only when BOTH sides are large (the reference never needs this; the
    training-data ops do). Prefers ``Dataset.join`` when this Ray version has
    it — pass ``prefer_native=False`` for small/iterative joins: the native
    hash-shuffle join spins up ``num_partitions`` aggregator actors, which
    starves small CPU budgets and swamps per-iteration latency."""
    on = list(on)
    if prefer_native and hasattr(left, "join"):
        try:
            return left.join(right, join_type=how, num_partitions=num_buckets, on=tuple(on))
        except Exception:
            pass  # fall back to the explicit bucketed implementation
    # explicit column lists (from the schemas, fetched once) — a bucket whose
    # rows come from only ONE side must still produce the full joined schema
    lsch, rsch = left.schema(), right.schema()
    if lsch is None or rsch is None:
        # a fully-empty side has no schema at all (Ray drops it with the
        # blocks); an inner join with an empty side is empty — return a
        # zero-row dataset that still carries every KNOWN joined column, so
        # downstream selects/groupbys see their columns instead of crashing
        # on a zero-column table (ADVICE r4)
        cols: dict[str, pa.Array] = {}
        for sch in (lsch, rsch):
            if sch is not None:  # ray Schema wrapper: .names / .types
                for name, typ in zip(sch.names, sch.types):
                    cols.setdefault(name, pa.array([], typ))
        return ray.data.from_arrow(pa.table(cols))
    lcols = [c for c in lsch.names]
    rcols = [c for c in rsch.names]
    r_extra = [c for c in rcols if c not in on]
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
        for c in lcols + [f"__r_{c}" for c in r_extra]:
            if c not in g.columns:
                g[c] = pd.NA
        lg = g[g["__side"] == 0][lcols]
        rg = g[g["__side"] == 1][on + [f"__r_{c}" for c in r_extra]]
        rg = rg.rename(columns={f"__r_{c}": c for c in r_extra})
        return pa.Table.from_pandas(lg.merge(rg, on=on, how=how, sort=False), preserve_index=False).replace_schema_metadata(None)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")
