"""Validation engine end-to-end: planted violations recovered exactly, gates
match an independent pandas oracle, resume reproduces identical output."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from use_case_real_time_anomaly_detection_ray.config import ValidationConfig
from use_case_real_time_anomaly_detection_ray.datagen import CorpusSpec, generate_corpus
from use_case_real_time_anomaly_detection_ray.functions import scalar
from use_case_real_time_anomaly_detection_ray.pipelines import validate

CFG = ValidationConfig()


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("corpus") / "c")
    exp = generate_corpus(d, CorpusSpec())
    return d, exp


@pytest.fixture(scope="module")
def result(corpus, tmp_path_factory, ray_session):
    cdir, exp = corpus
    odir = str(tmp_path_factory.mktemp("vout") / "o")
    res = validate.run(cdir, odir, CFG)
    return res, exp


def _key(df):
    return set(zip(df["part"].astype(int), df["repo"], df["path"], df["commit"]))


def test_range_exact(result):
    res, exp = result
    got = res.violations[res.violations.check == "range"]
    want = {(r["part"], r["repo"], r["path"], r["commit"]) for r in exp["range"]}
    assert _key(got) == want
    # value = measured content_length; sha256 present on every row violation
    lens = {(r["part"], r["repo"], r["path"], r["commit"]): r["length"] for r in exp["range"]}
    for t in got.itertuples():
        assert t.value == lens[(int(t.part), t.repo, t.path, t.commit)]
        assert len(t.sha256) == 64
        assert t.note == scalar.note_out_of_range(CFG.min_len, CFG.max_len)
        assert t.anomaly_type == "out-of-range"


def test_uniqueness_exact(result):
    res, exp = result
    got = res.violations[res.violations.check == "uniqueness"]
    want = {(u["part"], u["repo"], u["path"], u["commit"]) for u in exp["uniqueness"]}
    assert _key(got) == want
    assert (got["value"] == 2.0).all()


def test_referential_exact(result):
    res, exp = result
    got = res.violations[res.violations.check == "referential"]
    want = {(r["part"], r["repo"]) for r in exp["referential"]}
    assert set(zip(got["part"].astype(int), got["repo"])) == want


def test_staleness_exact(result):
    res, exp = result
    got = res.violations[res.violations.check == "staleness"]
    assert got["repo"].tolist() == [exp["staleness"]["repo"]]
    assert int(got["part"].iloc[0]) == exp["staleness"]["last_part"]
    assert got["note"].iloc[0] == scalar.NOTE_TIMEOUT


def test_drift_flags_exactly_planted_repos(result):
    res, exp = result
    got = res.violations[res.violations.check == "drift_rate"]
    flagged = set(got["repo"])
    assert flagged == {exp["trend_up"], exp["trend_down"],
                       exp["step"]["repo"], exp["spike"]["repo"]}
    # the step repo is flagged exactly at the step part
    step = got[got.repo == exp["step"]["repo"]]
    assert step["part"].astype(int).tolist() == [exp["step"]["part"]]


def test_spike_caught_by_both_gates(result):
    res, exp = result
    spike_repo, spike_part = exp["spike"]["repo"], exp["spike"]["part"]
    for check in ("zscore", "iqr"):
        got = res.violations[res.violations.check == check]
        assert (spike_repo, spike_part) in set(zip(got["repo"], got["part"].astype(int)))


def test_lang_shift_caught_by_both_lang_gates(result):
    """The planted language-profile shift part is flagged by the
    lang-frequency z-score and IQR gates (north_star: lang-frequency
    histograms gated exactly like timeseries points)."""
    res, exp = result
    part, lang = exp["lang_shift"]["part"], exp["lang_shift"]["lang"]
    for check in ("lang_zscore", "lang_iqr"):
        got = res.violations[res.violations.check == check]
        flagged = got[got["part"].astype(int) == part]
        assert any(f"lang:{lang} | " in n for n in flagged["note"]), (check, part)


def test_control_repo_clean(result):
    res, exp = result
    assert (res.violations["repo"] == exp["control"]).sum() == 0


def test_verdicts_shape(result):
    res, exp = result
    v = res.verdicts
    n_parts = exp["spec"]["n_parts"]
    assert len(v) == n_parts * len(CFG.checks)
    assert set(v.status) <= {"pass", "fail"}
    agg = res.violations.groupby(["part", "check"]).size()
    for t in v.itertuples():
        expected_n = int(agg.get((t.part, t.check), 0))
        assert t.n_violations == expected_n
        assert (t.status == "fail") == (expected_n > 0)


def _gates_oracle(cdir, exp, cfg):
    """Independent single-machine oracle: pandas over the raw parquet, same
    gate formulas (SURVEY.md §5 'oracle cross-check of stats with pandas')."""
    parts = validate.discover_parts(cdir)
    frames = []
    for p, files in parts.items():
        for f in files:
            df = pq.read_table(f, columns=["repo", "part", "content"]).to_pandas()
            df["L"] = df["content"].str.len()
            frames.append(df[["repo", "part", "L"]])
    df = pd.concat(frames)
    df = df[(df.L >= cfg.min_len) & (df.L <= cfg.max_len)]
    manifest = set(pq.read_table(os.path.join(cdir, "repos.parquet"))["repo"].to_pylist())
    df = df[df.repo.isin(manifest)]
    out = []
    gmax = max(parts)
    for repo, g in df.groupby("repo"):
        m = g.groupby("part")["L"].mean()
        ps = m.index.to_numpy()
        vals = m.to_numpy()
        if ps.max() < gmax - cfg.stale_parts:
            out.append(("staleness", repo, int(ps.max())))
        avg, std = vals.mean(), vals.std(ddof=0)
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (vals - avg) / std
        for p, zi in zip(ps, z):
            if abs(zi) > cfg.zscore_threshold:
                out.append(("zscore", repo, int(p)))
        srt = np.sort(vals)
        q1 = srt[scalar.ch_quantile_exact_index(srt.size, 0.25)]
        q3 = srt[scalar.ch_quantile_exact_index(srt.size, 0.75)]
        iqr_v = (q3 - q1) * cfg.iqr_multiplier
        for p, mi in zip(ps, vals):
            if mi < q1 - iqr_v or mi > q3 + iqr_v:
                out.append(("iqr", repo, int(p)))
        slope = np.diff(vals) / np.diff(ps)
        for p, s in zip(ps[1:], slope):
            if abs(s) > cfg.max_slope:
                out.append(("drift_rate", repo, int(p)))
    return set(out)


def test_gates_match_pandas_oracle(result, corpus):
    res, exp = result
    cdir, _ = corpus
    want = _gates_oracle(cdir, exp, CFG)
    got = {
        (t.check, t.repo, int(t.part))
        for t in res.violations.itertuples()
        if t.check in ("staleness", "zscore", "iqr", "drift_rate")
    }
    assert got == want


def test_resume_after_crash_is_identical(corpus, tmp_path_factory, ray_session):
    cdir, exp = corpus
    odir = str(tmp_path_factory.mktemp("vres") / "o")
    full = validate.run(cdir, odir, CFG)

    # simulate a crash after 4 partitions: truncate the manifest
    mpath = os.path.join(odir, "manifest.jsonl")
    lines = open(mpath).read().strip().splitlines()
    with open(mpath, "w") as f:
        f.write("\n".join(lines[:4]) + "\n")

    resumed = validate.run(cdir, odir, CFG, resume=True)
    assert sorted(resumed.parts_skipped) == [0, 1, 2, 3]
    assert len(resumed.parts_scanned) == len(lines) - 4

    a = full.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    b = resumed.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(
        full.verdicts.reset_index(drop=True), resumed.verdicts.reset_index(drop=True)
    )


def test_uniqueness_bucketed_merge_path_equal(corpus, ray_session):
    """The >threshold bucketed int-key shuffle merge produces exactly the
    driver-merge output (threshold forced to 0 so the tiny corpus routes
    through the bucketed path)."""
    import ray as _ray

    cdir, exp = corpus
    files = [f for frags in validate.discover_parts(cdir).values() for f in frags]
    cols = validate._UNIQ_KEYS + ["part"]

    def _run(thresh):
        pre = _ray.data.read_parquet(files, columns=cols)
        ds = _ray.data.read_parquet(files, columns=cols)
        out = validate._uniqueness_from_datasets(pre, ds, bucketed_above=thresh)
        return (out.to_pandas()
                .sort_values(validate.VIOLATION_COLS).reset_index(drop=True))

    driver = _run(10**9)
    bucketed = _run(0)
    pd.testing.assert_frame_equal(driver, bucketed)
    want = {(u["part"], u["repo"], u["path"], u["commit"]) for u in exp["uniqueness"]}
    assert _key(bucketed) == want


def test_uniq_from_light_wiring_equal(corpus, tmp_path_factory, ray_session,
                                      monkeypatch):
    """The opt-in RTAD_UNIQ_FROM_LIGHT=1 wiring (uniqueness fed from the
    keyh column of the materialized light table — no second corpus scan)
    produces byte-identical violations/verdicts to the default overlapped
    parquet key-scan wiring."""
    cdir, _ = corpus
    base = validate.run(cdir, str(tmp_path_factory.mktemp("uflA") / "o"), CFG)
    monkeypatch.setenv("RTAD_UNIQ_FROM_LIGHT", "1")
    light = validate.run(cdir, str(tmp_path_factory.mktemp("uflB") / "o"), CFG)
    a = base.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    b = light.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(
        base.verdicts.reset_index(drop=True), light.verdicts.reset_index(drop=True)
    )


def test_rerun_noop_resume(corpus, tmp_path_factory, ray_session):
    cdir, _ = corpus
    odir = str(tmp_path_factory.mktemp("vnoop") / "o")
    first = validate.run(cdir, odir, CFG)
    second = validate.run(cdir, odir, CFG, resume=True)
    assert second.parts_scanned == []
    a = first.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    b = second.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_null_rate_check(tmp_path_factory, ray_session):
    """Planted null-content burst in one part is flagged by null_rate (and
    invisible to the range predicate — SQL NULL comparison semantics);
    clean parts pass."""
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("nullc") / "c")
    spec = CorpusSpec(n_parts=4, rows_per_part=400, n_out_of_range=0,
                      n_duplicates=0, n_dangling=0, null_part=2, null_frac=0.2)
    exp = generate_corpus(d, spec)
    odir = str(tmp_path_factory.mktemp("nullo") / "o")
    res = validate.run(d, odir, CFG)
    nr = res.violations[res.violations.check == "null_rate"]
    assert nr["part"].astype(int).tolist() == [2]
    want_rate = exp["null_rate"]["n_null"] / (
        exp["null_rate"]["n_null"] + 400 - exp["null_rate"]["n_null"])
    assert abs(nr["value"].iloc[0] - exp["null_rate"]["frac"]) < 1e-12
    assert nr["anomaly_type"].iloc[0] == "null-rate"
    # null rows never show up as range violations
    rng_v = res.violations[res.violations.check == "range"]
    assert len(rng_v) == 0
    # verdict row exists and fails only for part 2
    v = res.verdicts[res.verdicts.check == "null_rate"]
    assert (v[v.part == 2].status == "fail").all()
    assert (v[v.part != 2].status == "pass").all()


def test_null_rate_resume_rescans_pre_upgrade_manifests(corpus, tmp_path_factory,
                                                        ray_session):
    """Manifest records written before the null_rate check existed (no
    null_stats metric) are re-scanned on resume, not silently passed."""
    import json

    cdir, _ = corpus
    odir = str(tmp_path_factory.mktemp("vold") / "o")
    full = validate.run(cdir, odir, CFG)
    # simulate a pre-upgrade manifest: strip null_stats from the first record
    mpath = os.path.join(odir, "manifest.jsonl")
    lines = open(mpath).read().strip().splitlines()
    rec0 = json.loads(lines[0])
    rec0["metrics"].pop("null_stats")
    with open(mpath, "w") as f:
        f.write("\n".join([json.dumps(rec0)] + lines[1:]) + "\n")
    resumed = validate.run(cdir, odir, CFG, resume=True)
    assert resumed.parts_scanned == [rec0["part"]]  # re-scanned, not skipped
    a = full.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    b = resumed.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_stats_and_gates_scale_paths_equal(corpus, tmp_path_factory,
                                           ray_session, monkeypatch):
    """Forcing the bucketed stats-partial merge (STATS_BUCKETED_ABOVE=0) and
    the hash-bucketed distributed gates (GATES_DRIVER_BELOW=-1) reproduces
    the driver-path violations/verdicts byte-identically — the scale wirings
    and the fast driver wirings are the same math (VERDICT r3 #3/#4)."""
    cdir, _ = corpus
    base = validate.run(cdir, str(tmp_path_factory.mktemp("scA") / "o"), CFG)
    monkeypatch.setattr(validate, "STATS_BUCKETED_ABOVE", 0)
    monkeypatch.setattr(validate, "GATES_DRIVER_BELOW", -1)
    forced = validate.run(cdir, str(tmp_path_factory.mktemp("scB") / "o"), CFG)
    a = base.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    b = forced.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    pd.testing.assert_frame_equal(base.verdicts.reset_index(drop=True),
                                  forced.verdicts.reset_index(drop=True))


def test_distributed_stats_merge_drops_null_keys_like_pandas(ray_session):
    """The scale-path merge must reproduce pandas groupby's dropna=True: a
    null-keyed partial row (corrupt repo/lang) is dropped on BOTH wirings,
    not kept as an extra stats row by Arrow group_by."""
    import pyarrow as pa

    import ray.data

    parts = pa.table({
        "part": pa.array([0, 0, 0], pa.int64()),
        "repo": pa.array(["r1", None, "r1"], pa.string()),
        "lang": pa.array(["py", "py", None], pa.string()),
        "n": pa.array([1.0, 1.0, 1.0], pa.float64()),
        "s": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "s2": pa.array([100.0, 400.0, 900.0], pa.float64()),
        "mn": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "mx": pa.array([10.0, 20.0, 30.0], pa.float64()),
        "n_all": pa.array([1.0, 1.0, 1.0], pa.float64()),
        "n_null": pa.array([0.0, 0.0, 0.0], pa.float64()),
    })
    stats, lang_stats, null_stats = validate._merge_light_stats_distributed(
        ray.data.from_arrow(parts))
    # pandas dropna semantics: the null-repo row vanishes from stats, the
    # null-lang row from lang_stats; the part-keyed null fold keeps all rows
    assert stats["repo"].tolist() == ["r1"] and stats["n"].tolist() == [2.0]
    assert lang_stats["lang"].tolist() == ["py"]
    assert lang_stats["n"].tolist() == [2.0]
    assert null_stats["n"].tolist() == [3.0]


def test_global_violations_tmp_is_cleared_before_publish(corpus, tmp_path_factory,
                                                         ray_session):
    """A crashed prior run's stale parquet blocks in violations/global.tmp
    must not be published alongside a fresh run's output."""
    import pyarrow.parquet as pq

    cdir, _ = corpus
    out = str(tmp_path_factory.mktemp("staletmp") / "o")
    tmp = os.path.join(out, "violations", "global.tmp")
    os.makedirs(tmp)
    stale = validate._viol_table({
        c: [0] if c == "part" else ([0.0] if c == "value" else
                                    (["STALE"] if c == "check" else [""]))
        for c in validate.VIOLATION_COLS})
    pq.write_table(stale, os.path.join(tmp, "stale_block.parquet"))
    validate.run(cdir, out, CFG)
    gdir = os.path.join(out, "violations", "global")
    files = [f for f in os.listdir(gdir) if f.endswith(".parquet")]
    got = pd.concat([pq.read_table(os.path.join(gdir, f)).to_pandas()
                     for f in files], ignore_index=True)
    assert not (got["check"] == "STALE").any()


def test_drift_gate_checks_flag_planted_shifts(tmp_path_factory, ray_session):
    """Opt-in drift gates: the planted null burst concentrates length mass
    in bin 0 (psi_drift + ks_drift flag that part); the planted lang-profile
    shift breaks the corpus lang mix (chi2_drift flags that part). Resume
    reproduces the verdicts from the manifest's histogram snapshots."""
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("driftc") / "c")
    spec = CorpusSpec(n_parts=6, rows_per_part=400, n_out_of_range=0,
                      n_duplicates=0, n_dangling=0, null_part=2,
                      null_frac=0.3)
    generate_corpus(d, spec)
    cfg = ValidationConfig(
        checks=CFG.checks + ("psi_drift", "ks_drift", "chi2_drift"))
    odir = str(tmp_path_factory.mktemp("drifto") / "o")
    res = validate.run(d, odir, cfg)

    psi = res.violations[res.violations.check == "psi_drift"]
    assert 2 in psi["part"].astype(int).tolist()
    ks = res.violations[res.violations.check == "ks_drift"]
    assert 2 in ks["part"].astype(int).tolist()
    chi = res.violations[res.violations.check == "chi2_drift"]
    assert spec.lang_shift_part in chi["part"].astype(int).tolist()
    # the planted parts carry the LARGEST statistic of their check
    assert int(psi.loc[psi["value"].idxmax(), "part"]) == 2
    assert int(chi.loc[chi["value"].idxmax(), "part"]) == spec.lang_shift_part
    # verdict grid covers the new checks
    v = res.verdicts
    assert {"psi_drift", "ks_drift", "chi2_drift"} <= set(v["check"])
    assert (v[(v.check == "psi_drift") & (v.part == 2)].status == "fail").all()
    # resume: everything skipped, histograms restored from the manifest,
    # violations byte-identical
    res2 = validate.run(d, odir, cfg)
    assert res2.parts_scanned == []
    pd.testing.assert_frame_equal(
        res.violations.sort_values(list(res.violations.columns),
                                   ignore_index=True),
        res2.violations.sort_values(list(res2.violations.columns),
                                    ignore_index=True),
    )


def test_drift_gates_skipped_when_not_requested(corpus, tmp_path_factory,
                                                ray_session):
    """The default check set is unchanged: no drift rows, no histogram
    snapshots, goldens untouched."""
    d, _exp = corpus
    odir = str(tmp_path_factory.mktemp("ndrift") / "o")
    res = validate.run(d, odir, CFG)
    assert not set(res.violations["check"]) & {"psi_drift", "ks_drift",
                                               "chi2_drift"}
    assert not set(res.verdicts["check"]) & {"psi_drift", "ks_drift",
                                             "chi2_drift"}


def test_drift_resume_rescans_on_binning_param_change(tmp_path_factory,
                                                      ray_session):
    """A resume under different drift binning params must rescan, never
    reinterpret old histogram counts on a new grid."""
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("driftpc") / "c")
    generate_corpus(d, CorpusSpec(n_parts=3, rows_per_part=200,
                                  n_out_of_range=0, n_duplicates=0,
                                  n_dangling=0))
    odir = str(tmp_path_factory.mktemp("driftpo") / "o")
    cfg1 = ValidationConfig(checks=CFG.checks + ("psi_drift", "ks_drift"))
    res1 = validate.run(d, odir, cfg1)
    assert res1.parts_skipped == []
    # same params -> resume skips everything
    res2 = validate.run(d, odir, cfg1)
    assert res2.parts_scanned == []
    # changed bin width -> every part rescans under the new grid
    cfg2 = ValidationConfig(checks=cfg1.checks, drift_bin_width=50.0,
                            drift_bins=40)
    res3 = validate.run(d, odir, cfg2)
    assert res3.parts_scanned == [0, 1, 2]
    # and a fresh run under cfg2 agrees with the resumed one
    odir2 = str(tmp_path_factory.mktemp("driftpo2") / "o")
    res4 = validate.run(d, odir2, cfg2)
    cols = list(res3.violations.columns)
    pd.testing.assert_frame_equal(
        res3.violations.sort_values(cols, ignore_index=True),
        res4.violations.sort_values(cols, ignore_index=True))


def test_schema_check_flags_contract_defects(tmp_path_factory, ray_session):
    """A fragment missing a contract column and one with a mistyped column
    are flagged per (part, defect); clean parts pass. Metadata-only: the
    defective CONTENT is never scanned (the mistyped part still validates
    through the other checks on its remaining columns)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("schemac") / "c")
    generate_corpus(d, CorpusSpec(n_parts=3, rows_per_part=200,
                                  n_out_of_range=0, n_duplicates=0,
                                  n_dangling=0))
    # part 1: drop 'lang'; part 2: retype 'commit' to int64
    f1 = os.path.join(d, "part=1", "data.parquet")
    t1 = pq.read_table(f1)
    pq.write_table(t1.drop_columns(["lang"]), f1)
    f2 = os.path.join(d, "part=2", "data.parquet")
    t2 = pq.read_table(f2)
    i = t2.schema.get_field_index("commit")
    t2 = t2.set_column(i, "commit",
                       pa.array(range(t2.num_rows), pa.int64()))
    pq.write_table(t2, f2)

    # full default check set: the malformed partitions are QUARANTINED from
    # the content/key scans, so the run completes despite columns the other
    # checks require being missing/mistyped
    odir = str(tmp_path_factory.mktemp("schemao") / "o")
    res = validate.run(d, odir, CFG)
    assert res.parts_scanned == [0]
    sv = res.violations[res.violations.check == "schema"]
    assert sorted(sv["part"].astype(int)) == [1, 2]
    by = sv.set_index(sv["part"].astype(int))
    assert "missing column 'lang'" in by.loc[1, "note"]
    assert "column 'commit' type int64 != string" in by.loc[2, "note"]
    assert by.loc[1, "anomaly_type"] == "schema"
    v = res.verdicts[res.verdicts.check == "schema"]
    assert set(v[v.status == "fail"]["part"].astype(int)) == {1, 2}
    assert (v[v.part == 0].status == "pass").all()
    # quarantined parts: every non-schema verdict reads "skipped", never
    # a false "pass"
    q = res.verdicts[res.verdicts.part.isin([1, 2])
                     & (res.verdicts.check != "schema")]
    assert (q.status == "skipped").all()
    clean = res.verdicts[res.verdicts.part == 0]
    assert "skipped" not in set(clean.status)


def test_run_with_every_registered_check(tmp_path_factory, ray_session):
    """The full registry is runnable in one pass: every check name the
    catalog declares is accepted by run() and produces a verdict row per
    part."""
    from use_case_real_time_anomaly_detection_ray import checks as reg
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("allc") / "c")
    generate_corpus(d, CorpusSpec(n_parts=3, rows_per_part=300))
    cfg = ValidationConfig(checks=tuple(sorted(reg.REGISTRY)))
    odir = str(tmp_path_factory.mktemp("allo") / "o")
    res = validate.run(d, odir, cfg)
    assert set(res.verdicts["check"]) == set(reg.REGISTRY)
    # one verdict per (part, check)
    assert len(res.verdicts) == 3 * len(reg.REGISTRY)
    assert set(res.verdicts["status"]) <= {"pass", "fail"}


def test_quarantine_supersedes_done_and_rescans_after_repair(
        tmp_path_factory, ray_session):
    """A previously-done part that later fails the contract stops serving
    its stale stats/violations (tombstone supersedes the manifest record);
    once repaired it RESCANS; staleness is measured against the newest
    VALID part; a truncated footer quarantines instead of crashing."""
    import shutil
    import pyarrow.parquet as pq
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("qrc") / "c")
    generate_corpus(d, CorpusSpec(n_parts=3, rows_per_part=200,
                                  n_out_of_range=6, n_duplicates=0,
                                  n_dangling=0))
    odir = str(tmp_path_factory.mktemp("qro") / "o")
    res1 = validate.run(d, odir, CFG)
    assert res1.parts_scanned == [0, 1, 2]
    n_range_p2 = len(res1.violations[(res1.violations.check == "range")
                                     & (res1.violations.part == 2)])

    # corrupt part 2: truncate the file (unreadable footer)
    f2 = os.path.join(d, "part=2", "data.parquet")
    orig = open(f2, "rb").read()
    with open(f2, "wb") as f:
        f.write(orig[: len(orig) // 3])
    res2 = validate.run(d, odir, CFG)
    assert res2.parts_scanned == []           # 0,1 resume; 2 quarantined
    assert res2.parts_quarantined == [2]
    sv = res2.violations[res2.violations.check == "schema"]
    assert sv["part"].astype(int).tolist() == [2]
    assert "unreadable parquet footer" in sv["note"].iloc[0]
    # no stale part-2 results flow: range rows for part 2 are gone and its
    # non-schema verdicts read skipped
    assert len(res2.violations[(res2.violations.check == "range")
                               & (res2.violations.part == 2)]) == 0
    q = res2.verdicts[(res2.verdicts.part == 2)
                      & (res2.verdicts.check != "schema")]
    assert (q.status == "skipped").all()

    # repair the file: the tombstone forces a rescan and results return
    with open(f2, "wb") as f:
        f.write(orig)
    res3 = validate.run(d, odir, CFG)
    assert res3.parts_scanned == [2]
    assert len(res3.violations[(res3.violations.check == "range")
                               & (res3.violations.part == 2)]) == n_range_p2
    assert (res3.verdicts.status != "skipped").all()


def test_all_parts_quarantined_still_reports(tmp_path_factory, ray_session):
    """Every partition failing the contract yields schema-fail verdicts,
    not a crash (the quarantine's whole point)."""
    import pyarrow.parquet as pq
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("aqc") / "c")
    generate_corpus(d, CorpusSpec(n_parts=2, rows_per_part=100))
    for p in (0, 1):
        f = os.path.join(d, f"part={p}", "data.parquet")
        t = pq.read_table(f)
        pq.write_table(t.drop_columns(["lang"]), f)
    odir = str(tmp_path_factory.mktemp("aqo") / "o")
    res = validate.run(d, odir, CFG)
    assert res.parts_quarantined == [0, 1]
    v = res.verdicts
    assert (v[v.check == "schema"].status == "fail").all()
    assert (v[v.check != "schema"].status == "skipped").all()
    assert set(res.violations["check"]) == {"schema"}


def test_q3_empty_filters_return_typed_empty(ray_session, monkeypatch):
    """Filters that eliminate every row yield an empty 4-column frame,
    matching the oracle's empty result (not a KeyError)."""
    from use_case_real_time_anomaly_detection_ray.pipelines import vqueries

    monkeypatch.setattr(vqueries, "_Q3_SEGMENT", "NO_SUCH_SEGMENT")
    out = vqueries.q_q3_shipping_priority("/root/testdata/sf0.001")
    assert list(out.columns) == ["o_orderkey", "o_orderdate",
                                 "o_orderpriority", "revenue"]
    assert len(out) == 0


def test_schema_check_fanout_path_equals_serial(tmp_path_factory, ray_session,
                                                monkeypatch):
    """The Ray-fanned footer-read path (driver loop is O(files) otherwise)
    must emit the identical violation table as the serial path."""
    import pyarrow.parquet as pq
    from use_case_real_time_anomaly_detection_ray.datagen import (
        CorpusSpec, generate_corpus,
    )

    d = str(tmp_path_factory.mktemp("schemaf") / "c")
    generate_corpus(d, CorpusSpec(n_parts=4, rows_per_part=100,
                                  n_out_of_range=0, n_duplicates=0,
                                  n_dangling=0))
    f1 = os.path.join(d, "part=1", "data.parquet")
    pq.write_table(pq.read_table(f1).drop_columns(["lang"]), f1)
    f3 = os.path.join(d, "part=3", "data.parquet")
    with open(f3, "wb") as fh:
        fh.write(b"not a parquet file")  # unreadable footer → quarantine row
    parts = {p: [os.path.join(d, f"part={p}", "data.parquet")]
             for p in range(4)}

    serial = validate.schema_violations(parts)
    monkeypatch.setattr(validate, "SCHEMA_FANOUT_ABOVE", 0)
    fanned = validate.schema_violations(parts)
    assert serial.num_rows == 2
    assert fanned.equals(serial)


def test_bucketed_join_empty_side_keeps_known_schema(ray_session):
    """An all-filtered SCHEMA-LESS side (Ray drops the schema with the
    blocks) degrades to an empty result that still carries every KNOWN
    joined column — the surviving side's schema — instead of a zero-column
    table that crashes downstream selects (ADVICE r4). A zero-row side that
    KEPT its schema joins normally and yields the full joined schema."""
    import pyarrow as pa

    import ray.data
    from use_case_real_time_anomaly_detection_ray.stages.join import (
        bucketed_join,
    )

    left = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "v": pa.array([0.5, 1.5], pa.float64()),
    }))
    right = ray.data.from_arrow(pa.table({
        "id": pa.array([1], pa.int64()),
        "w": pa.array(["x"], pa.string()),
    }))
    # schema-less empty (filter drops blocks AND schema): the right side's
    # extra columns are unknowable — the left schema must still survive
    schemaless = right.filter(lambda r: False)
    assert schemaless.schema() is None
    out = bucketed_join(left, schemaless, on=["id"], prefer_native=False)
    assert out.take_all() == []
    assert set(out.schema().names) == {"id", "v"}
    assert bucketed_join(left, schemaless, on=["id"], prefer_native=False) \
        .select_columns(["id", "v"]).count() == 0
    # zero-row WITH schema: full joined schema, empty result
    empty_typed = right.map_batches(lambda t: t.slice(0, 0),
                                    batch_format="pyarrow")
    out2 = bucketed_join(left, empty_typed, on=["id"], prefer_native=False)
    assert out2.count() == 0
    assert set(out2.schema().names) == {"id", "v", "w"}
