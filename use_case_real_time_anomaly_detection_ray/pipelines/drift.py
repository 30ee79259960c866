"""Distribution-drift gates: PSI and chi-squared per partition.

The reference flags anomalous *points* by comparing them to a window's
distribution (``tinybird/pipes/copy_z_score.pipe:24-56``,
``copy_iqr.pipe:45-82``); the validation engine's north star extends the
same idea to *partitions*: a partition whose value histogram (PSI) or
category frequencies (chi-squared) diverge from the corpus-wide
distribution is flagged, exactly as the reference's z-score/IQR fences
flag timeseries points. Both are classic public drift statistics
(population stability index; Pearson's chi-squared goodness-of-fit).

Scale shape (zero corpus shuffles beyond one count aggregation):

1. a map-only binning pass tags each row with its histogram bin /
   category — only ``(part, bin)`` leaves the block;
2. ``group_count`` shrinks the corpus to the O(parts × bins) count table
   (per-block pre-aggregation, bucketed merge);
3. the global reference distribution folds from the count table as
   per-block partials (≤ bins rows per block, summed driver-side — a
   bins-sized vector, broadcast by closure);
4. scoring is vectorized over the count table: driver pandas below
   ``DRIFT_DRIVER_BELOW`` count rows, else a part-hash ``bucketed_merge``
   scores every part of a bucket in one pivot (the ``gate_violations``
   discipline — never one Python call per part).

Determinism / oracle parity: each bin's (category's) contribution is
rounded half-up to 1e-6 BEFORE summing, so the real-arithmetic sum lies
on the 1e-6 grid and the final rounded statistic is independent of
addition order — the DuckDB oracle matches bitwise (the BM25 discipline,
``textops.bm25_topk``). PSI uses +0.5 additive smoothing per bin on both
the partition and reference proportions so empty bins are total; the
chi-squared expectation is computed as ``(n_p * C_cat) / N`` in exactly
that association order on both sides.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..stages.reduce import bucketed_merge, group_count, to_arrow_single

# above this many (part, bin) count rows the scoring moves into a
# part-hash bucketed merge (same scale discipline as
# validate.GATES_DRIVER_BELOW); below it a single driver pivot is faster
# and the pull is O(parts × bins) — the aggregate, never the corpus
DRIFT_DRIVER_BELOW = 200_000


def _round6(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1e6 + 0.5) / 1e6


# --------------------------------------------------------------------------
# pure frame scorers — shared by the Dataset operators below and by the
# validation suite's drift gates (validate.drift_gate_violations), so the
# two surfaces compute literally the same statistic
# --------------------------------------------------------------------------

def psi_score_table(cdf: pd.DataFrame, glob_c: np.ndarray, total: float,
                    n_bins: int, threshold: float,
                    part_col: str = "part", bin_col: str = "bin",
                    n_col: str = "c") -> pd.DataFrame:
    """Score a (part, bin, count) frame against the global bin counts."""
    q = (glob_c + 0.5) / (total + 0.5 * n_bins)
    piv = cdf.pivot_table(index=part_col, columns=bin_col, values=n_col,
                          aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(n_bins), fill_value=0)
    obs = piv.to_numpy(np.float64)
    n_p = obs.sum(axis=1)
    p = (obs + 0.5) / (n_p[:, None] + 0.5 * n_bins)
    contrib = _round6((p - q[None, :]) * np.log(p / q[None, :]))
    psi = _round6(contrib.sum(axis=1))
    return pd.DataFrame({
        part_col: piv.index.to_numpy(),
        "n_rows": n_p.astype(np.int64),
        "psi": psi,
        "flagged": psi > threshold,
    })


def ks_score_table(cdf: pd.DataFrame, glob_c: np.ndarray, total: float,
                   n_bins: int, threshold: float,
                   part_col: str = "part", bin_col: str = "bin",
                   n_col: str = "c") -> pd.DataFrame:
    cq = np.cumsum(glob_c) / total
    piv = cdf.pivot_table(index=part_col, columns=bin_col, values=n_col,
                          aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=range(n_bins), fill_value=0)
    obs = piv.to_numpy(np.float64)
    n_p = obs.sum(axis=1)
    cp = np.cumsum(obs, axis=1) / n_p[:, None]
    ks = _round6(np.abs(cp - cq[None, :]).max(axis=1))
    return pd.DataFrame({
        part_col: piv.index.to_numpy(),
        "n_rows": n_p.astype(np.int64),
        "ks": ks,
        "flagged": ks > threshold,
    })


def chi2_score_table(cdf: pd.DataFrame, cats: list, glob_c: np.ndarray,
                     total: float, threshold: float,
                     part_col: str = "part", cat_col: str = "cat",
                     n_col: str = "c") -> pd.DataFrame:
    piv = cdf.pivot_table(index=part_col, columns=cat_col, values=n_col,
                          aggfunc="sum", fill_value=0)
    piv = piv.reindex(columns=cats, fill_value=0)
    obs = piv.to_numpy(np.float64)
    n_p = obs.sum(axis=1)
    e = (n_p[:, None] * glob_c[None, :]) / total
    d = obs - e
    contrib = _round6(d * d / e)
    chi2 = _round6(contrib.sum(axis=1))
    return pd.DataFrame({
        part_col: piv.index.to_numpy(),
        "n_rows": n_p.astype(np.int64),
        "chi2": chi2,
        "flagged": chi2 > threshold,
    })


def _binned_counts(
    ds: "ray.data.Dataset",
    part_col: str,
    value_col: str,
    bin_width: float,
    n_bins: int,
) -> tuple["ray.data.Dataset", np.ndarray, float]:
    """Shared binning head of :func:`psi_drift` / :func:`ks_drift`: clamp
    ``floor(value / bin_width)`` into ``[0, n_bins)`` (nulls/NaN count as
    value 0 → bin 0, matching ``validate.length_hist``'s treatment of
    quarantined content), count per (part, bin), and fold the global bin
    totals. Returns (counts Dataset, global bin-count vector, N)."""

    def add_bin(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = np.nan_to_num(v, nan=0.0)
        b = np.minimum(np.floor(v / bin_width), n_bins - 1)
        b = np.maximum(b, 0.0).astype(np.int64)
        return pa.table({part_col: t[part_col], "bin": pa.array(b)})

    binned = ds.map_batches(add_bin, batch_format="pyarrow")
    counts, glob, total = _counts_and_global(binned, part_col, "bin")
    glob_c = glob.reindex(range(n_bins), fill_value=0).to_numpy(np.float64)
    return counts, glob_c, total


def _counts_and_global(
    binned: "ray.data.Dataset", part_col: str, bin_col: str
) -> tuple["ray.data.Dataset", pd.Series, float]:
    """Count table per (part, bin) plus the global per-bin totals and N.

    The count table materializes once (it is the O(parts × bins)
    aggregate) so the global fold and the scoring pass both re-read
    object-store blocks instead of re-running the corpus scan.
    """
    counts = group_count(binned, [part_col, bin_col], out_col="c").materialize()

    def glob_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({bin_col: t[bin_col].to_pandas(),
                           "c": t["c"].to_pandas()})
        g = df.groupby(bin_col, sort=False)["c"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    gparts = to_arrow_single(
        counts.map_batches(glob_partial, batch_format="pyarrow",
                           batch_size=None)
    ).to_pandas()
    glob = gparts.groupby(bin_col, sort=False)["c"].sum()
    return counts, glob, float(glob.sum())


def _score_counts(
    counts: "ray.data.Dataset",
    part_col: str,
    bin_col: str,
    score_frame,
) -> pd.DataFrame:
    """Run ``score_frame`` (a vectorized (part, bin, c)-frame scorer) on the
    driver below ``DRIFT_DRIVER_BELOW`` count rows, else inside a part-hash
    bucketed merge — both wirings byte-identical (threshold-forced test)."""
    n_rows = counts.count()
    if n_rows <= DRIFT_DRIVER_BELOW:
        cdf = to_arrow_single(counts).to_pandas()
        return score_frame(cdf).sort_values(part_col, ignore_index=True)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # every (part, bin) row of a part lands in one bucket (hash on
        # part only), so the pivot inside score_frame sees complete parts
        return score_frame(g[[part_col, bin_col, "c"]])

    scored = bucketed_merge(counts, [part_col], merge)
    return to_arrow_single(scored).to_pandas().sort_values(
        part_col, ignore_index=True)


# --------------------------------------------------------------------------
# PSI over a fixed-width numeric histogram
# --------------------------------------------------------------------------

def psi_drift(
    ds: "ray.data.Dataset",
    part_col: str,
    value_col: str,
    bin_width: float = 50.0,
    n_bins: int = 12,
    threshold: float = 0.1,
) -> pd.DataFrame:
    """Population stability index of ``value_col``'s histogram per
    ``part_col`` partition against the corpus-wide histogram.

    ``bin = clamp(floor(value / bin_width), 0, n_bins-1)``;
    ``p_b = (c_pb + 0.5) / (n_p + 0.5·B)`` (and ``q_b`` likewise from the
    global counts) so every bin is total;
    ``PSI = Σ_b round6((p_b − q_b) · ln(p_b / q_b))`` — contributions are
    non-negative (same sign factors), so half-up rounding is
    engine/oracle-stable. ``flagged = PSI > threshold`` (0.1 is the
    conventional "shift worth investigating" fence).

    Returns one row per partition: ``(part, n_rows, psi, flagged)``.
    """
    counts, glob_c, total = _binned_counts(ds, part_col, value_col,
                                           bin_width, n_bins)

    def score_frame(cdf: pd.DataFrame) -> pd.DataFrame:
        return psi_score_table(cdf, glob_c, total, n_bins, threshold,
                               part_col=part_col)

    return _score_counts(counts, part_col, "bin", score_frame)


# --------------------------------------------------------------------------
# Kolmogorov–Smirnov over the binned ECDF
# --------------------------------------------------------------------------

def ks_drift(
    ds: "ray.data.Dataset",
    part_col: str,
    value_col: str,
    bin_width: float = 50.0,
    n_bins: int = 12,
    threshold: float = 0.1,
) -> pd.DataFrame:
    """Kolmogorov–Smirnov distance between each partition's binned ECDF and
    the corpus-wide ECDF (evaluated at the bin edges — the exact KS of the
    discretized distributions).

    ``KS = max_b |cum_p(b)/n_p − cum_q(b)/N|`` — a max of exactly-computed
    integer-ratio differences, so it is addition-order-independent by
    construction; the final half-up 1e-6 rounding only pins the printed
    grid. Same count machinery and scale shape as :func:`psi_drift`.
    """
    counts, glob_c, total = _binned_counts(ds, part_col, value_col,
                                           bin_width, n_bins)

    def score_frame(cdf: pd.DataFrame) -> pd.DataFrame:
        return ks_score_table(cdf, glob_c, total, n_bins, threshold,
                              part_col=part_col)

    return _score_counts(counts, part_col, "bin", score_frame)


# --------------------------------------------------------------------------
# chi-squared goodness-of-fit over a categorical column
# --------------------------------------------------------------------------

def chi2_drift(
    ds: "ray.data.Dataset",
    part_col: str,
    cat_col: str,
    threshold: float = 9.488,
) -> pd.DataFrame:
    """Pearson chi-squared of ``cat_col``'s frequencies per ``part_col``
    partition against the corpus-wide category distribution.

    Expected count ``e = (n_p · C_cat) / N`` (that association order on
    both engine and oracle sides); ``χ² = Σ_cat round6((o−e)·(o−e)/e)``
    over the globally-present categories (``C_cat > 0`` ⇒ ``e > 0``),
    zero-observation cells included. The default fence 9.488 is the 95th
    percentile of χ² with 4 degrees of freedom (5 categories).

    Returns one row per partition: ``(part, n_rows, chi2, flagged)``.
    """

    def project(t: pa.Table) -> pa.Table:
        return pa.table({part_col: t[part_col], "cat": t[cat_col]})

    binned = ds.map_batches(project, batch_format="pyarrow")
    counts, glob, total = _counts_and_global(binned, part_col, "cat")
    cats = sorted(glob.index.tolist())
    glob_c = glob.reindex(cats).to_numpy(np.float64)

    def score_frame(cdf: pd.DataFrame) -> pd.DataFrame:
        return chi2_score_table(cdf, cats, glob_c, total, threshold,
                                part_col=part_col)

    return _score_counts(counts, part_col, "cat", score_frame)
