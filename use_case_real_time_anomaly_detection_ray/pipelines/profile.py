"""Per-column statistics profiling — the engine's StatsAccumulator stage.

North-star requirement (BASELINE.json): per-column count / null-rate / mean /
stddev / quantiles via streaming Welford accumulators and t-digest in
``map_batches`` actor pools over zero-copy Arrow (SURVEY.md §2.3). The
reference computes the same moments per query in ClickHouse
(``z_score.pipe:17-18``, ``iqr.pipe:31-33``); here they are computed once,
distributed, and mergeable.

Two variants:

* :func:`column_profile` — the general path: a ``map_batches`` **actor pool**
  (:class:`StatsAccumulator`) emits one Welford+t-digest partial row per
  (column, block); the driver merges partials (associative by construction).
  Quantiles are t-digest approximations.
* :func:`column_profile_exact_cents` — the oracle-comparable path for
  ≤2-decimal data: moments from exact int64 cents sums (bitwise-reproducible
  against SQL; see ``pipelines.anomaly.per_id_mean_std``).
"""

from __future__ import annotations

import json
from collections.abc import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..state import TDigest, Welford


class StatsAccumulator:
    """Actor-pool batch stage: one (column, partial) row per batch.

    State built once per actor in ``__init__`` (the reference's only long-lived
    state is its generator walk; here it is the accumulator configuration —
    SURVEY.md §2.3). Partials are serialized snapshots, merged downstream;
    digests are mergeable by design, so any merge topology gives the same
    answer up to digest resolution."""

    def __init__(self, columns: Sequence[str], compression: float = 200.0):
        self.columns = list(columns)
        self.compression = compression

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [], "mean": [], "m2": [],
                "vmin": [], "vmax": [], "digest": []}
        for c in self.columns:
            col = batch[c]
            nulls = int(col.null_count)
            v = col.drop_null().to_numpy(zero_copy_only=False).astype("float64")
            w = Welford().add_array(v, nulls=nulls)
            td = TDigest(self.compression).add_array(v)
            rows["column"].append(c)
            rows["n"].append(w.n)
            rows["nulls"].append(w.nulls)
            rows["mean"].append(w.mean)
            rows["m2"].append(w.m2)
            rows["vmin"].append(w.vmin if w.n else np.nan)
            rows["vmax"].append(w.vmax if w.n else np.nan)
            rows["digest"].append(json.dumps(td.to_dict()))
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "nulls": pa.array(rows["nulls"], pa.int64()),
                "mean": pa.array(rows["mean"], pa.float64()),
                "m2": pa.array(rows["m2"], pa.float64()),
                "vmin": pa.array(rows["vmin"], pa.float64()),
                "vmax": pa.array(rows["vmax"], pa.float64()),
                "digest": pa.array(rows["digest"], pa.string()),
            }
        )


def column_profile(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    quantiles: Sequence[float] = (0.25, 0.5, 0.75),
    # fixed pool — autoscaling-from-1 never catches up on seconds-long
    # stages. Default 2 leaves CPUs for the upstream read even in a 4-CPU
    # session (a pool == session CPUs starves the read tasks and deadlocks);
    # size to the cluster when calling.
    concurrency: int = 2,
    batch_size: int | None = 65536,
) -> pd.DataFrame:
    """Distributed per-column profile: n / nulls / null_rate / mean /
    std_pop / min / max / t-digest quantiles. One partial per (column, block)
    travels to the driver — O(columns × blocks) rows, never raw data."""
    partials = ds.map_batches(
        StatsAccumulator,
        fn_constructor_args=(list(columns),),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()
    out = []
    for c in columns:
        sub = partials[partials["column"] == c]
        w = Welford()
        td = TDigest()
        for t in sub.itertuples():
            part = Welford(n=int(t.n), nulls=int(t.nulls), mean=float(t.mean),
                           m2=float(t.m2))
            part.vmin = float(t.vmin) if not np.isnan(t.vmin) else np.inf
            part.vmax = float(t.vmax) if not np.isnan(t.vmax) else -np.inf
            w = w.merge(part)
            td = td.merge(TDigest.from_dict(json.loads(t.digest)))
        row = {
            "column": c, "n": w.n, "nulls": w.nulls, "null_rate": w.null_rate,
            "mean": w.mean, "std_pop": w.stddev_pop,
            "vmin": w.vmin if w.n else np.nan, "vmax": w.vmax if w.n else np.nan,
        }
        for q in quantiles:
            row[f"p{int(q * 100)}"] = td.quantile(q)
        out.append(row)
    return pd.DataFrame(out)


def column_profile_exact_cents(
    ds: "ray.data.Dataset",
    columns: Sequence[str],
    batch_size: int | None = 65536,
) -> pd.DataFrame:
    """Oracle-comparable profile for ≤2-decimal numeric columns: moments from
    exact integer cents sums (order-independent ⇒ bitwise-identical to a SQL
    engine evaluating the same formula). Returns
    (column, n, n_null, mean, std_pop, vmin, vmax)."""
    cols = list(columns)

    def partial(t: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [], "sc": [], "ss": [],
                "mn": [], "mx": []}
        for c in cols:
            col = t[c]
            nulls = int(col.null_count)
            v = col.drop_null().to_numpy(zero_copy_only=False).astype("float64")
            cv = np.floor(v * 100.0 + 0.5).astype("int64")
            # sum of squared cents needs >64 bits (a SQL engine promotes the
            # sum to HUGEINT; numpy int64 silently wraps past ~10^18 — seen
            # at sf0.1 on l_extendedprice). Accumulate as exact Python ints
            # and ship the partial as a decimal string.
            co = cv.astype(object)
            rows["column"].append(c)
            rows["n"].append(int(v.size))
            rows["nulls"].append(nulls)
            rows["sc"].append(int(cv.sum()))
            rows["ss"].append(str(int((co * co).sum())))
            rows["mn"].append(float(v.min()) if v.size else np.nan)
            rows["mx"].append(float(v.max()) if v.size else np.nan)
        return pa.table(rows)

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=batch_size).to_pandas()
    agg = parts.groupby("column", sort=False).agg(
        n=("n", "sum"), nulls=("nulls", "sum"), sc=("sc", "sum"),
        mn=("mn", "min"), mx=("mx", "max"),
    )
    ss_tot = {c: sum(int(x) for x in parts[parts["column"] == c]["ss"])
              for c in cols}
    out = []
    for c in cols:
        r = agg.loc[c]
        n = float(r["n"])
        mean_c = float(r["sc"]) / n
        # float(exact int) FIRST, then divide — the same double-conversion
        # order a SQL engine uses for HUGEINT / BIGINT
        var_c = max(float(ss_tot[c]) / n - mean_c * mean_c, 0.0)
        out.append(
            {
                "column": c, "n": int(r["n"]), "n_null": int(r["nulls"]),
                # EXACTLY the oracle's expression (floor(mean_cents + 0.5)/100):
                # a /100*100 float roundtrip is not an identity and can floor a
                # .5-tie one cent lower than SQL
                "mean": np.floor(mean_c + 0.5) / 100.0,
                "std_pop": np.floor(np.sqrt(var_c) + 0.5) / 100.0,
                "vmin": float(r["mn"]), "vmax": float(r["mx"]),
            }
        )
    return pd.DataFrame(out)
