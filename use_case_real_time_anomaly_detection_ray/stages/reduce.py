"""Shuffle-minimizing reduction stages.

The scale discipline (SURVEY.md §4): never ship raw rows into a ``groupby``
when a per-block partial can shrink them first. Each helper here runs a
vectorized partial inside ``map_batches`` (one output row per key per block),
then merges partials grouped by a **hash bucket of the key** — NOT by the key
itself. ``groupby(key).map_groups`` costs one Python call per distinct key
(ruinous at 10^5+ keys); ``groupby(bucket)`` costs one call per bucket, and
the within-bucket merge is a vectorized pandas op. Bucketing by
``hash(key) % B`` keeps all rows of a key in one group (correct) and spreads
keys uniformly (skew-safe — a hot key inflates only its own partials, which
the per-block partial already collapsed).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_BUCKET = "__bucket"


def _pd_to_arrow(df: pd.DataFrame) -> pa.Table:
    """All stages emit Arrow blocks so unions/iteration never mix block types.
    The pandas schema metadata (a dict) is stripped — it is unhashable and
    makes Ray's block-schema dedup log a warning per block."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def _hash_keys_arrow(t: pa.Table, keys: Sequence[str],
                     num_buckets: int) -> np.ndarray:
    """Bucket ids straight from Arrow key columns — no full-table pandas
    conversion (the map side of a shuffle must not pay a pandas roundtrip on
    payload columns it never reads). Non-null integer keys mix via a
    vectorized Fibonacci multiply; everything else hashes just that column
    through ``pd.util.hash_array``. Bucket layout only needs to be
    deterministic within one run, so the int path's different hash function
    (vs the pandas fallback) is immaterial."""
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in keys:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # the hash function must depend on the column TYPE only — never
            # on per-block properties like null_count, or the same key value
            # hashes into different buckets in different blocks and its rows
            # silently never co-locate. Nulls fold to 0 here (a bucket
            # collision with the 0 key, harmless — the vectorized merge
            # still distinguishes null from 0 inside the group).
            if pa.types.is_integer(col.type):
                if col.null_count:
                    col = pc.fill_null(col, 0)
                v = col.to_numpy(zero_copy_only=False).astype(
                    np.uint64, copy=False)
                hv = v * np.uint64(0x9E3779B97F4A7C15)
                hv = hv ^ (hv >> np.uint64(29))
            else:
                hv = pd.util.hash_array(
                    np.asarray(col.to_pandas())
                ).astype(np.uint64)
            h = h * np.uint64(1000003) + hv
    return (h % np.uint64(num_buckets)).astype(np.int32)


def bucketed_merge(
    partials: "ray.data.Dataset",
    keys: Sequence[str],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Shuffle partials by key-hash bucket and apply a *vectorized* merge per
    bucket. ``merge_fn`` sees all partial rows of every key in its bucket."""
    keys = list(keys)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _hash_keys_arrow(t, keys, num_buckets)
        return t.replace_schema_metadata(None).append_column(
            _BUCKET, pa.array(b, pa.int32()))

    bucketed = partials.map_batches(add_bucket, batch_format="pyarrow",
                                    batch_size=None)

    def merge(g: pd.DataFrame) -> pa.Table:
        out = merge_fn(g.drop(columns=[_BUCKET]))
        # merge_fn may return Arrow directly — needed when the output can be
        # empty and pandas type inference would degrade the schema (an empty
        # object column becomes arrow null and breaks downstream unions)
        return out if isinstance(out, pa.Table) else _pd_to_arrow(out)

    return bucketed.groupby(_BUCKET).map_groups(merge, batch_format="pandas")


def bucketed_merge_arrow(
    partials: "ray.data.Dataset",
    keys: Sequence[str],
    merge_fn: Callable[[pa.Table], pa.Table],
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """All-Arrow :func:`bucketed_merge`: the shuffled rows never convert to
    pandas — ``merge_fn`` receives the bucket as a ``pa.Table`` and returns
    one. Use for large row-level shuffles where the pandas round-trip is
    the dominant cost (measured ~4.5× on 30 M int-keyed partials,
    BENCH/BASELINE.md); the pandas variant stays for merges that want
    DataFrame ergonomics on modest bucket sizes."""
    keys = list(keys)

    def add_bucket(t: pa.Table) -> pa.Table:
        b = _hash_keys_arrow(t, keys, num_buckets)
        return t.replace_schema_metadata(None).append_column(
            _BUCKET, pa.array(b, pa.int32()))

    bucketed = partials.map_batches(add_bucket, batch_format="pyarrow",
                                    batch_size=None)

    def merge(g: pa.Table) -> pa.Table:
        return merge_fn(g.drop_columns([_BUCKET]))

    return bucketed.groupby(_BUCKET).map_groups(merge, batch_format="pyarrow")


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
    batch_size: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """``ORDER BY <order> DESC LIMIT 1 BY <keys>`` — the reference's
    latest-per-sensor idiom (``copy_timeout.pipe:21-22``,
    ``most_recent.pipe:14-15``, ``copy_out_of_range.pipe:46-47``).

    Two-phase: per-block partial argmax (≤ one row per key per block) inside
    ``map_batches``, then a bucket-grouped vectorized merge. The shuffle
    carries only partials, so a full-history scan stays cheap at 100 TB.

    ``descending=True`` for a column means "prefer the largest value"."""
    keys = list(keys)
    order = list(order)
    if descending is None:
        descending = [True] * len(order)

    def partial(df: pd.DataFrame) -> pa.Table:
        if len(df) > 0:
            df = _sort_last_per_key(df, keys, order, descending)
        return _pd_to_arrow(df)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return bucketed_merge(
        partials, keys,
        lambda g: _sort_last_per_key(g, keys, order, descending),
        num_buckets,
    )


def distinct_rows(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    batch_size: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Exact dedup keeping a deterministic first row per key — the reference's
    ``LIMIT 1 BY timestamp, id, anomaly_type`` (``dedup_log.pipe:6``) /
    ``ReplacingMergeTree`` backstop (``copy_log.datasource:10-12``)."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pa.Table:
        if len(df) > 0:
            # sort by ALL columns (same total order as the merge): the kept
            # row per key is then min-by-all-columns regardless of which
            # block a duplicate lands in — block-boundary invariant
            df = df.sort_values(list(df.columns), kind="mergesort").drop_duplicates(
                subset=keys, keep="first"
            )
        return _pd_to_arrow(df)

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(list(g.columns), kind="mergesort").drop_duplicates(
            subset=keys, keep="first"
        )

    return bucketed_merge(partials, keys, merge, num_buckets)


def group_count(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    out_col: str = "n",
    batch_size: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """``GROUP BY keys → count(*)`` with per-block pre-aggregation; the basis
    of the uniqueness check (SURVEY.md §2.7 D4)."""
    keys = list(keys)

    def partial(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _pd_to_arrow(
                df.assign(**{out_col: pd.Series(dtype="int64")})[keys + [out_col]]
            )
        return _pd_to_arrow(
            df.groupby(keys, sort=False, observed=True).size().reset_index(name=out_col)
        )

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, observed=True)[out_col].sum().reset_index()

    return bucketed_merge(partials, keys, merge, num_buckets)


def grouped_agg(
    ds: "ray.data.Dataset",
    keys: Sequence[str],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame],
    merge_fn: Callable[[pd.DataFrame], pd.DataFrame],
    batch_size: int | None = None,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """General partial→bucket-merge aggregation: ``partial_fn`` shrinks each
    block to per-key partial rows; ``merge_fn`` combines a bucket's partials
    (vectorized pandas groupby inside)."""

    def partial(df: pd.DataFrame) -> pa.Table:
        return _pd_to_arrow(partial_fn(df))

    partials = ds.map_batches(partial, batch_format="pandas", batch_size=batch_size)
    return bucketed_merge(partials, list(keys), merge_fn, num_buckets)


def to_arrow_single(ds: "ray.data.Dataset") -> pa.Table:
    """Collect a (small!) dataset into one Arrow table on the driver. Only for
    broadcast sides, verdicts, and test outputs — never the main input."""
    import ray as _ray

    tabs = _ray.get(ds.to_arrow_refs())
    # some ops (e.g. groupby aggregates) emit pandas blocks; normalize
    tabs = [t if isinstance(t, pa.Table) else _pd_to_arrow(t) for t in tabs]
    non_empty = [t for t in tabs if t.num_rows > 0]
    if non_empty:
        return pa.concat_tables(non_empty, promote_options="default").combine_chunks()
    # fully-filtered pipelines yield zero blocks or column-less placeholder
    # tables — recover the schema so empty results keep their columns
    with_cols = [t for t in tabs if t.num_columns > 0]
    if with_cols:
        return with_cols[0]
    try:
        base = getattr(ds.schema(), "base_schema", None)
        if isinstance(base, pa.Schema):
            return base.empty_table()
    except Exception:
        pass
    return pa.table({})
