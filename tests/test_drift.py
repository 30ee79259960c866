"""Distribution-drift gates (pipelines/drift.py): planted-drift detection,
brute-force reference parity, and driver-vs-bucketed path equality."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from use_case_real_time_anomaly_detection_ray.pipelines import drift


def _corpus(shifted_part: str = "p9") -> pa.Table:
    """20 partitions × 200 rows drawn from the same discrete histogram;
    one partition shifted up by 300 (PSI) and forced to one category
    (chi2)."""
    rng = np.random.default_rng(7)
    parts, vals, cats = [], [], []
    cat_pool = np.array(["en", "de", "fr", "es", "zh"])
    for p in range(20):
        name = f"p{p}"
        v = rng.integers(0, 550, 200)
        c = cat_pool[rng.integers(0, 5, 200)]
        if name == shifted_part:
            v = np.minimum(v + 300, 599)
            c = np.full(200, "zh")
        parts += [name] * 200
        vals += list(v)
        cats += list(c)
    return pa.table({"part": pa.array(parts), "val": pa.array(vals, pa.int64()),
                     "cat": pa.array(cats)})


def _brute_psi(df: pd.DataFrame, bin_width: float, n_bins: int) -> dict[str, float]:
    b = np.minimum(np.floor(df["val"].to_numpy() / bin_width), n_bins - 1)
    b = np.maximum(b, 0).astype(int)
    glob = np.bincount(b, minlength=n_bins).astype(float)
    n = glob.sum()
    q = (glob + 0.5) / (n + 0.5 * n_bins)
    out = {}
    for part, g in df.assign(bin=b).groupby("part"):
        obs = np.bincount(g["bin"], minlength=n_bins).astype(float)
        p = (obs + 0.5) / (obs.sum() + 0.5 * n_bins)
        ct = np.floor((p - q) * np.log(p / q) * 1e6 + 0.5) / 1e6
        out[part] = float(np.floor(ct.sum() * 1e6 + 0.5) / 1e6)
    return out


def test_psi_flags_planted_shift():
    tab = _corpus()
    ds = ray.data.from_arrow(tab).repartition(8)
    got = drift.psi_drift(ds, "part", "val", bin_width=50.0, n_bins=12,
                          threshold=0.1)
    assert len(got) == 20
    assert set(got.columns) == {"part", "n_rows", "psi", "flagged"}
    assert (got["n_rows"] == 200).all()
    by = got.set_index("part")
    assert bool(by.loc["p9", "flagged"])
    # PSI of the shifted partition dominates every unshifted one
    assert by.loc["p9", "psi"] > 3 * by.drop("p9")["psi"].max()
    want = _brute_psi(tab.to_pandas(), 50.0, 12)
    for part, psi in want.items():
        assert by.loc[part, "psi"] == psi


def test_ks_flags_planted_shift():
    tab = _corpus()
    ds = ray.data.from_arrow(tab).repartition(8)
    got = drift.ks_drift(ds, "part", "val", bin_width=50.0, n_bins=12,
                         threshold=0.1).set_index("part")
    assert bool(got.loc["p9", "flagged"])
    # a +300 shift moves ~6 of 12 bins of mass: KS must be large
    assert got.loc["p9", "ks"] > 0.3
    assert got.loc["p9", "ks"] > 3 * got.drop("p9")["ks"].max()
    # KS is a probability-scale distance
    assert ((got["ks"] >= 0) & (got["ks"] <= 1)).all()


def test_chi2_flags_planted_category_collapse():
    tab = _corpus()
    ds = ray.data.from_arrow(tab).repartition(8)
    got = drift.chi2_drift(ds, "part", "cat", threshold=9.488).set_index("part")
    assert bool(got.loc["p9", "flagged"])
    # an all-one-category partition of 200 rows is a massive chi2
    assert got.loc["p9", "chi2"] > 100
    # unshifted partitions are multinomial draws from the global mix minus
    # the planted skew; all stay far below the planted value
    assert (got.drop("p9")["chi2"] < got.loc["p9", "chi2"] / 5).all()


def test_drift_paths_byte_identical(monkeypatch):
    """Driver pivot vs part-hash bucketed merge — threshold-forced."""
    tab = _corpus()
    ds = ray.data.from_arrow(tab).repartition(8)
    a_psi = drift.psi_drift(ds, "part", "val")
    a_chi = drift.chi2_drift(ds, "part", "cat")
    a_ks = drift.ks_drift(ds, "part", "val")
    monkeypatch.setattr(drift, "DRIFT_DRIVER_BELOW", 0)
    b_psi = drift.psi_drift(ds, "part", "val")
    b_chi = drift.chi2_drift(ds, "part", "cat")
    b_ks = drift.ks_drift(ds, "part", "val")
    pd.testing.assert_frame_equal(a_psi, b_psi)
    pd.testing.assert_frame_equal(a_chi, b_chi)
    pd.testing.assert_frame_equal(a_ks, b_ks)


def test_psi_identical_distribution_near_zero():
    """Every partition sampled from one histogram → tiny PSI, none flagged."""
    rng = np.random.default_rng(11)
    tab = pa.table({
        "part": pa.array([f"p{i % 4}" for i in range(8000)]),
        "val": pa.array(rng.integers(0, 550, 8000), pa.int64()),
    })
    got = drift.psi_drift(ray.data.from_arrow(tab).repartition(4),
                          "part", "val", threshold=0.1)
    assert not got["flagged"].any()
    assert (got["psi"] < 0.05).all()
