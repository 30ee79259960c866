"""Validation-check queries over the driver test tables, with DuckDB oracles.

The validation engine's own corpus (datagen) is exercised by the golden tests;
these queries run the *same check machinery* (uniqueness via pre-aggregated
group-count, referential via broadcast anti-join, per-column stats via the
profile stage) over the shared parquet tables so the driver can verify them
against SQL (SURVEY.md §2.4 J3, §2.5 A6, §2.7 D4)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..sources.readers import read_table
from ..stages.join import broadcast_semi_anti
from ..stages.reduce import group_count
from .profile import column_profile_exact_cents

# --------------------------------------------------------------------------
# uniqueness: duplicate (l_orderkey, l_linenumber) keys in lineitem
# --------------------------------------------------------------------------

def q_uniqueness_lineitem(sf_dir: str):
    ds = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
    counts = group_count(ds, ["l_orderkey", "l_linenumber"], out_col="n")
    return counts.map_batches(
        lambda t: t.filter(pa.compute.greater(t["n"], 1)), batch_format="pyarrow"
    )


SQL_UNIQUENESS_LINEITEM = """
SELECT l_orderkey, l_linenumber, count(*) AS n
FROM lineitem GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1
"""


def q_uniqueness_summary(sf_dir: str):
    """One row per (table, key): total keys vs duplicated keys — non-empty by
    construction even on clean tables."""
    specs = [
        ("documents", ["doc_id"]),
        ("events", ["event_id"]),
        ("lineitem", ["l_orderkey", "l_linenumber"]),
    ]
    rows = []
    for tname, keys in specs:
        ds = read_table(sf_dir, tname, columns=keys)
        # both scalars fold in ONE pass over the distributed counts (a
        # per-block partial, then a tiny driver sum) — the distinct-key set
        # never reaches the driver and the counts stream is consumed once
        counts = group_count(ds, keys, out_col="n")

        def scalar_partial(t: pa.Table) -> pa.Table:
            dup = pa.compute.sum(
                pa.compute.cast(pa.compute.greater(t["n"], 1), pa.int64())
            ).as_py()
            return pa.table({"n_keys": pa.array([t.num_rows], pa.int64()),
                             "n_dup": pa.array([int(dup or 0)], pa.int64())})

        parts = counts.map_batches(scalar_partial, batch_format="pyarrow").to_pandas()
        n_keys, n_dup = int(parts["n_keys"].sum()), int(parts["n_dup"].sum())
        rows.append(
            {
                "table_name": tname,
                "n_keys": int(n_keys),
                "n_dup_keys": int(n_dup),
            }
        )
    return pd.DataFrame(rows)


SQL_UNIQUENESS_SUMMARY = """
SELECT 'documents' AS table_name, count(*) AS n_keys,
       count(*) FILTER (WHERE n > 1) AS n_dup_keys
FROM (SELECT doc_id, count(*) AS n FROM documents GROUP BY doc_id)
UNION ALL
SELECT 'events', count(*), count(*) FILTER (WHERE n > 1)
FROM (SELECT event_id, count(*) AS n FROM events GROUP BY event_id)
UNION ALL
SELECT 'lineitem', count(*), count(*) FILTER (WHERE n > 1)
FROM (SELECT l_orderkey, l_linenumber, count(*) AS n FROM lineitem
      GROUP BY l_orderkey, l_linenumber)
"""


# --------------------------------------------------------------------------
# referential integrity: child → parent key containment (broadcast anti-join)
# --------------------------------------------------------------------------

_RELATIONS = [
    # (name, child_table, child_key, parent_table, parent_key)
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def q_referential_orphans(sf_dir: str):
    """Anti-join each child key column against the broadcast parent key set;
    report child row count + orphan count per relation (SURVEY.md §2.4 J3)."""
    rows = []
    for name, child, ckey, parent, pkey in _RELATIONS:
        parent_keys = (
            read_table(sf_dir, parent, columns=[pkey])
            .to_pandas()
            .rename(columns={pkey: ckey})
        )
        child_ds = read_table(sf_dir, child, columns=[ckey])
        n_child = child_ds.count()
        orphans = broadcast_semi_anti(child_ds, parent_keys, on=[ckey], anti=True)
        rows.append(
            {
                "relation": name,
                "n_child": int(n_child),
                "n_orphans": int(orphans.count()),
            }
        )
    return pd.DataFrame(rows)


SQL_REFERENTIAL_ORPHANS = """
SELECT 'orders->customer' AS relation, count(*) AS n_child,
       count(*) FILTER (WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)) AS n_orphans
FROM orders
UNION ALL
SELECT 'lineitem->orders', count(*),
       count(*) FILTER (WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
FROM lineitem
UNION ALL
SELECT 'supplier->nation', count(*),
       count(*) FILTER (WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation))
FROM supplier
UNION ALL
SELECT 'nation->region', count(*),
       count(*) FILTER (WHERE n_regionkey NOT IN (SELECT r_regionkey FROM region))
FROM nation
"""


# --------------------------------------------------------------------------
# per-column stats profile (exact-cents variant for oracle comparability)
# --------------------------------------------------------------------------

_PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_column_profile_lineitem(sf_dir: str):
    ds = read_table(sf_dir, "lineitem", columns=_PROFILE_COLS)
    return column_profile_exact_cents(ds, _PROFILE_COLS)


def _profile_sql_one(col: str) -> str:
    return f"""
SELECT '{col}' AS "column",
       count({col}) AS n,
       count(*) - count({col}) AS n_null,
       floor(sum(CAST(floor({col} * 100 + 0.5) AS BIGINT)) / count({col}) + 0.5) / 100 AS mean,
       floor(sqrt(greatest(
           sum(CAST(floor({col} * 100 + 0.5) AS BIGINT) * CAST(floor({col} * 100 + 0.5) AS BIGINT)) / count({col})
           - (sum(CAST(floor({col} * 100 + 0.5) AS BIGINT)) / count({col}))
             * (sum(CAST(floor({col} * 100 + 0.5) AS BIGINT)) / count({col})), 0.0)) + 0.5) / 100 AS std_pop,
       min({col}) AS vmin,
       max({col}) AS vmax
FROM lineitem"""


SQL_COLUMN_PROFILE_LINEITEM = "\nUNION ALL\n".join(
    _profile_sql_one(c) for c in _PROFILE_COLS
)


# --------------------------------------------------------------------------
# pricing summary (TPC-H Q1 shape): the canonical pre-aggregate → tiny-groupby
# pattern over lineitem
# --------------------------------------------------------------------------

def _pricing_leaf(sf_dir: str) -> pd.DataFrame:
    """Shared leaf aggregate of the Q1 shape: per (returnflag, linestatus)
    sums/counts from per-block partials merged over ~6 groups (the wide
    shuffle collapses to a handful of partial rows per block). Both
    ``pricing_summary`` and ``pricing_rollup`` fold from THIS frame so a
    fix to the partial applies to both."""
    cols = ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount"]
    ds = read_table(sf_dir, "lineitem", columns=cols)

    def partial(df: pd.DataFrame) -> pa.Table:
        df = df.assign(
            _disc_price=df["l_extendedprice"] * (1.0 - df["l_discount"]),
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            sum_qty=("l_quantity", "sum"),
            sum_base_price=("l_extendedprice", "sum"),
            sum_disc_price=("_disc_price", "sum"),
            n=("l_quantity", "size"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    parts = ds.map_batches(partial, batch_format="pandas", batch_size=None).to_pandas()
    return parts.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
        sum_qty=("sum_qty", "sum"),
        sum_base_price=("sum_base_price", "sum"),
        sum_disc_price=("sum_disc_price", "sum"),
        n=("n", "sum"),
    ).reset_index()


def q_pricing_summary(sf_dir: str):
    """Per (returnflag, linestatus): counts and sums (see _pricing_leaf)."""
    out = _pricing_leaf(sf_dir).copy()
    # half-up 2-decimal rounding shared with the oracle (sum order may differ
    # in the last ulp; quantities are integral so sum_qty is already exact)
    for c in ("sum_base_price", "sum_disc_price"):
        out[c] = np.floor(out[c] * 100.0 + 0.5) / 100.0
    out["avg_qty"] = np.floor(out["sum_qty"] / out["n"] * 100.0 + 0.5) / 100.0
    return out[["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
                "sum_disc_price", "avg_qty", "n"]]


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
       floor(sum(l_extendedprice * (1.0 - l_discount)) * 100 + 0.5) / 100 AS sum_disc_price,
       floor(sum(l_quantity) / count(*) * 100 + 0.5) / 100 AS avg_qty,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# distribution-drift gates per source partition (PSI + chi-squared)
# --------------------------------------------------------------------------

def q_drift_psi_sources(sf_dir: str):
    """PSI of the n_chars histogram per source vs the corpus histogram —
    the partition-level transposition of the reference's z-score/IQR
    point fences (``copy_z_score.pipe:24-56``); see ``pipelines/drift.py``."""
    from .drift import psi_drift

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    return psi_drift(ds, part_col="source", value_col="n_chars",
                     bin_width=50.0, n_bins=12, threshold=0.1)


SQL_DRIFT_PSI_SOURCES = """
WITH binned AS (
  SELECT source AS part,
         GREATEST(LEAST(CAST(FLOOR(n_chars / 50.0) AS BIGINT), 11), 0) AS bin
  FROM documents
),
c AS (SELECT part, bin, count(*) AS c FROM binned GROUP BY part, bin),
parts AS (SELECT part, sum(c) AS n_p FROM c GROUP BY part),
bins AS (SELECT range AS bin FROM range(12)),
g AS (SELECT bin, sum(c) AS c_g FROM c GROUP BY bin),
tot AS (SELECT sum(c) AS n FROM c),
grid AS (SELECT p.part, p.n_p, b.bin FROM parts p CROSS JOIN bins b),
j AS (SELECT grid.part, grid.n_p, grid.bin,
             COALESCE(c.c, 0) AS c_pb, COALESCE(g.c_g, 0) AS c_b
      FROM grid LEFT JOIN c ON grid.part = c.part AND grid.bin = c.bin
                LEFT JOIN g ON grid.bin = g.bin),
pq AS (SELECT part, n_p,
              (c_pb + 0.5) / (n_p + 0.5 * 12) AS p,
              (c_b + 0.5) / ((SELECT n FROM tot) + 0.5 * 12) AS q
       FROM j),
ct AS (SELECT part, n_p,
              FLOOR((p - q) * LN(p / q) * 1e6 + 0.5) / 1e6 AS t
       FROM pq)
SELECT part AS source, CAST(n_p AS BIGINT) AS n_rows,
       FLOOR(SUM(t) * 1e6 + 0.5) / 1e6 AS psi,
       FLOOR(SUM(t) * 1e6 + 0.5) / 1e6 > 0.1 AS flagged
FROM ct GROUP BY part, n_p
"""


def q_drift_ks_sources(sf_dir: str):
    """Binned-ECDF Kolmogorov–Smirnov distance per source vs the corpus
    ECDF — see ``pipelines/drift.ks_drift``."""
    from .drift import ks_drift

    ds = read_table(sf_dir, "documents", columns=["source", "n_chars"])
    return ks_drift(ds, part_col="source", value_col="n_chars",
                    bin_width=50.0, n_bins=12, threshold=0.1)


SQL_DRIFT_KS_SOURCES = """
WITH binned AS (
  SELECT source AS part,
         GREATEST(LEAST(CAST(FLOOR(n_chars / 50.0) AS BIGINT), 11), 0) AS bin
  FROM documents
),
c AS (SELECT part, bin, count(*) AS c FROM binned GROUP BY part, bin),
parts AS (SELECT part, sum(c) AS n_p FROM c GROUP BY part),
bins AS (SELECT range AS bin FROM range(12)),
g AS (SELECT bin, sum(c) AS c_g FROM c GROUP BY bin),
tot AS (SELECT sum(c) AS n FROM c),
grid AS (SELECT p.part, p.n_p, b.bin FROM parts p CROSS JOIN bins b),
j AS (SELECT grid.part, grid.n_p, grid.bin,
             COALESCE(c.c, 0) AS c_pb, COALESCE(g.c_g, 0) AS c_b
      FROM grid LEFT JOIN c ON grid.part = c.part AND grid.bin = c.bin
                LEFT JOIN g ON grid.bin = g.bin),
cum AS (SELECT part, n_p,
               SUM(c_pb) OVER (PARTITION BY part ORDER BY bin)
                 / CAST(n_p AS DOUBLE) AS cp,
               SUM(c_b) OVER (PARTITION BY part ORDER BY bin)
                 / (SELECT CAST(n AS DOUBLE) FROM tot) AS cq
        FROM j)
SELECT part AS source, CAST(n_p AS BIGINT) AS n_rows,
       FLOOR(MAX(ABS(cp - cq)) * 1e6 + 0.5) / 1e6 AS ks,
       FLOOR(MAX(ABS(cp - cq)) * 1e6 + 0.5) / 1e6 > 0.1 AS flagged
FROM cum GROUP BY part, n_p
"""


def q_drift_chi2_sources(sf_dir: str):
    """Chi-squared of lang frequencies per source vs the corpus
    distribution (df=4 for the 5 langs; fence = 95th pct 9.488)."""
    from .drift import chi2_drift

    ds = read_table(sf_dir, "documents", columns=["source", "lang"])
    return chi2_drift(ds, part_col="source", cat_col="lang", threshold=9.488)


SQL_DRIFT_CHI2_SOURCES = """
WITH c AS (SELECT source AS part, lang AS cat, count(*) AS c
           FROM documents GROUP BY 1, 2),
parts AS (SELECT part, sum(c) AS n_p FROM c GROUP BY part),
cats AS (SELECT cat, sum(c) AS c_g FROM c GROUP BY cat),
tot AS (SELECT sum(c) AS n FROM c),
grid AS (SELECT p.part, p.n_p, g.cat, g.c_g FROM parts p CROSS JOIN cats g),
j AS (SELECT grid.part, grid.n_p, grid.cat, grid.c_g, COALESCE(c.c, 0) AS obs
      FROM grid LEFT JOIN c ON grid.part = c.part AND grid.cat = c.cat),
ct AS (SELECT part, n_p,
              FLOOR((obs - (n_p * c_g) / (SELECT n FROM tot))
                    * (obs - (n_p * c_g) / (SELECT n FROM tot))
                    / ((n_p * c_g) / (SELECT n FROM tot)) * 1e6 + 0.5) / 1e6 AS t
       FROM j)
SELECT part AS source, CAST(n_p AS BIGINT) AS n_rows,
       FLOOR(SUM(t) * 1e6 + 0.5) / 1e6 AS chi2,
       FLOOR(SUM(t) * 1e6 + 0.5) / 1e6 > 9.488 AS flagged
FROM ct GROUP BY part, n_p
"""


# --------------------------------------------------------------------------
# ROLLUP: multi-level aggregates from ONE pass of partials
# --------------------------------------------------------------------------

def q_pricing_rollup(sf_dir: str):
    """ROLLUP(l_returnflag, l_linestatus): leaf, per-flag, and grand-total
    rows — all three levels fold from the SAME leaf frame as
    ``pricing_summary`` (``_pricing_leaf``; one corpus scan; the rollup is
    driver arithmetic over the ~6 leaf groups). NULL grouping keys are
    encoded as '' to keep the value-hash comparable."""
    leaf = _pricing_leaf(sf_dir)[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "n"]
    ]
    per_flag = (leaf.groupby("l_returnflag", sort=False)
                [["sum_qty", "sum_base_price", "n"]].sum().reset_index()
                .assign(l_linestatus=""))
    total = pd.DataFrame([{
        "l_returnflag": "", "l_linestatus": "",
        "sum_qty": leaf["sum_qty"].sum(),
        "sum_base_price": leaf["sum_base_price"].sum(),
        "n": leaf["n"].sum(),
    }])
    out = pd.concat([leaf, per_flag, total], ignore_index=True)
    # half-up 2-decimal rounding shared with the oracle (float sums may
    # differ in the last ulp across addition orders)
    for c in ("sum_qty", "sum_base_price"):
        out[c] = np.floor(out[c] * 100.0 + 0.5) / 100.0
    return out[["l_returnflag", "l_linestatus", "sum_qty",
                "sum_base_price", "n"]]


SQL_PRICING_ROLLUP = """
SELECT COALESCE(l_returnflag, '') AS l_returnflag,
       COALESCE(l_linestatus, '') AS l_linestatus,
       floor(sum(l_quantity) * 100 + 0.5) / 100 AS sum_qty,
       floor(sum(l_extendedprice) * 100 + 0.5) / 100 AS sum_base_price,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# Q3 shape: selective dimension filter -> broadcast semi join -> big-big
# bucketed join -> grouped revenue -> global top-k from per-block partials
# --------------------------------------------------------------------------

_Q3_SEGMENT = "BUILDING"
_Q3_CUTOFF = "1996-06-30"
_Q3_K = 10


def q_q3_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape over the driver tables: BUILDING customers' orders
    placed before the cutoff, revenue from their line items shipped after
    it, top 10 orders by revenue.

    Join strategy by side size: the filtered customer KEY SET broadcasts
    (one selective dimension — `ray.put` once, probed per batch);
    orders⨝lineitem is the genuine big-big join and goes through the
    bucketed hash join; revenue partials pre-aggregate per block before
    the per-order merge; the global top-10 folds per-block top-k partials
    (blocks × k rows to the driver, never the full group table). Revenue
    rounds half-up to 2 decimals on BOTH sides and ranks on the rounded
    value with an orderkey tie-break, so the oracle matches bitwise."""
    import datetime as dt

    cutoff = dt.datetime.fromisoformat(_Q3_CUTOFF)
    from ..stages.reduce import to_arrow_single as _single

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    # to_arrow_single, not .to_pandas(): an all-filtered result must keep
    # its schema (the empty-blocks gotcha) so the semi join still sees the
    # key column and degrades to an empty output
    cust_keys = (
        _single(cust.map_batches(
            lambda t: t.filter(pa.compute.equal(t["c_mktsegment"],
                                                _Q3_SEGMENT))
                       .select(["c_custkey"]),
            batch_format="pyarrow"))
        .to_pandas()
        .rename(columns={"c_custkey": "o_custkey"})
    )
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_orderdate",
                                 "o_orderpriority"])
    orders = orders.map_batches(
        lambda t: t.filter(pa.compute.less(t["o_orderdate"],
                                           pa.scalar(cutoff))),
        batch_format="pyarrow")
    orders = broadcast_semi_anti(orders, cust_keys, on=["o_custkey"])
    orders = orders.map_batches(
        lambda t: t.select(["o_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow")

    line = read_table(sf_dir, "lineitem",
                      columns=["l_orderkey", "l_shipdate", "l_extendedprice",
                               "l_discount"])

    def line_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pa.compute.greater(t["l_shipdate"], pa.scalar(cutoff)))
        rev = (t["l_extendedprice"].to_numpy(zero_copy_only=False)
               * (1.0 - t["l_discount"].to_numpy(zero_copy_only=False)))
        part = pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": pa.array(rev, pa.float64())})
        g = part.group_by(["l_orderkey"], use_threads=False).aggregate(
            [("rev", "sum")])
        return pa.table({"o_orderkey": g["l_orderkey"],
                         "rev": g["rev_sum"]})

    line_pre = line.map_batches(line_partial, batch_format="pyarrow",
                                batch_size=None)
    from ..stages.join import bucketed_join

    # prefer_native=False: the native hash-shuffle join spins up
    # num_partitions aggregator actors, which starves small CPU budgets
    # (the bucketed_join docstring's own warning — measured: the driver
    # sweep at 4 CPUs stalls past 300 s on the native path, 3 s explicit)
    joined = bucketed_join(orders, line_pre, on=["o_orderkey"],
                           prefer_native=False)

    def order_partial(t: pa.Table) -> pa.Table:
        # per-block per-order sums, NO head(k): Ray's dynamic block splitting
        # may slice one join-bucket output into several blocks, so an order's
        # fragments can straddle blocks — a block-local top-k could drop a
        # fragment of a true top-k order (ADVICE r4). Full per-order partials
        # are safe and stay small (≤ orders-in-block rows).
        g = t.group_by(["o_orderkey", "o_orderdate", "o_orderpriority"],
                       use_threads=False).aggregate([("rev", "sum")])
        return pa.table({
            "o_orderkey": g["o_orderkey"], "o_orderdate": g["o_orderdate"],
            "o_orderpriority": g["o_orderpriority"], "rev": g["rev_sum"],
        })

    def topk_merge(g: pa.Table) -> pa.Table:
        # keyed on o_orderkey: every fragment of an order lands here, so the
        # per-order fold is complete and the bucket-local top-k is sound
        df = (g.to_pandas()
              .groupby(["o_orderkey", "o_orderdate", "o_orderpriority"],
                       sort=False)["rev"].sum().reset_index())
        df["revenue"] = np.floor(df["rev"] * 100.0 + 0.5) / 100.0
        df = (df.sort_values(["revenue", "o_orderkey"],
                             ascending=[False, True], kind="mergesort")
              .head(_Q3_K))
        return pa.Table.from_pandas(
            df[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]],
            preserve_index=False).replace_schema_metadata(None)

    from ..stages.reduce import bucketed_merge_arrow, to_arrow_single

    parts = bucketed_merge_arrow(
        joined.map_batches(order_partial, batch_format="pyarrow",
                           batch_size=None),
        ["o_orderkey"], topk_merge)
    out = to_arrow_single(parts).to_pandas()
    if len(out) == 0:
        return pd.DataFrame({
            "o_orderkey": pd.Series([], dtype="int64"),
            "o_orderdate": pd.Series([], dtype="datetime64[us]"),
            "o_orderpriority": pd.Series([], dtype=object),
            "revenue": pd.Series([], dtype="float64"),
        })
    # driver folds buckets × k pre-rounded rows — never the full order table
    out = (out.sort_values(["revenue", "o_orderkey"],
                           ascending=[False, True], kind="mergesort")
           .head(_Q3_K).reset_index(drop=True))
    return out[["o_orderkey", "o_orderdate", "o_orderpriority", "revenue"]]


SQL_Q3_SHIPPING_PRIORITY = f"""
WITH r AS (
  SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
         floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100 + 0.5)
           / 100 AS revenue
  FROM customer c
  JOIN orders o ON c.c_custkey = o.o_custkey
  JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
    AND o.o_orderdate < TIMESTAMP '{_Q3_CUTOFF}'
    AND l.l_shipdate > TIMESTAMP '{_Q3_CUTOFF}'
  GROUP BY 1, 2, 3
)
SELECT * FROM r ORDER BY revenue DESC, o_orderkey ASC LIMIT {_Q3_K}
"""


VALIDATION_QUERIES = {
    "pricing_rollup": q_pricing_rollup,
    "q3_shipping_priority": q_q3_shipping_priority,
    "pricing_summary": q_pricing_summary,
    "drift_psi_sources": q_drift_psi_sources,
    "drift_ks_sources": q_drift_ks_sources,
    "drift_chi2_sources": q_drift_chi2_sources,
    "uniqueness_lineitem": q_uniqueness_lineitem,
    "uniqueness_summary": q_uniqueness_summary,
    "referential_orphans": q_referential_orphans,
    "column_profile_lineitem": q_column_profile_lineitem,
}

VALIDATION_ORACLE = {
    "pricing_rollup": SQL_PRICING_ROLLUP,
    "q3_shipping_priority": SQL_Q3_SHIPPING_PRIORITY,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "drift_psi_sources": SQL_DRIFT_PSI_SOURCES,
    "drift_ks_sources": SQL_DRIFT_KS_SOURCES,
    "drift_chi2_sources": SQL_DRIFT_CHI2_SOURCES,
    "uniqueness_lineitem": SQL_UNIQUENESS_LINEITEM,
    "uniqueness_summary": SQL_UNIQUENESS_SUMMARY,
    "referential_orphans": SQL_REFERENTIAL_ORPHANS,
    "column_profile_lineitem": SQL_COLUMN_PROFILE_LINEITEM,
}
