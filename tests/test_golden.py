"""Golden end-to-end diff — the reference's ``exec_test.sh`` discipline
(run, then byte-compare against a committed ``.result`` file;
``tinybird/scripts/exec_test.sh:27,39``). Pins the full validation output
(all checks, notes, sha256 invariants, verdicts) against committed CSVs;
any semantic drift in datagen or any check shows up as a diff here."""

import os
import shutil

import pandas as pd
import pytest

from use_case_real_time_anomaly_detection_ray.config import ValidationConfig
from use_case_real_time_anomaly_detection_ray.datagen import CorpusSpec, generate_corpus
from use_case_real_time_anomaly_detection_ray.pipelines import validate

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SPEC = CorpusSpec(n_parts=6, rows_per_part=800, n_out_of_range=10,
                  n_duplicates=3, n_dangling=3)


def test_golden_end_to_end(tmp_path, ray_session):
    cdir, odir = str(tmp_path / "c"), str(tmp_path / "o")
    generate_corpus(cdir, SPEC)
    res = validate.run(cdir, odir, ValidationConfig())

    got_v = res.violations.sort_values(validate.VIOLATION_COLS).reset_index(drop=True)
    want_v = pd.read_csv(os.path.join(GOLDEN_DIR, "violations_small.csv"),
                         keep_default_na=False)
    want_v["sha256"] = want_v["sha256"].astype(str)
    assert len(got_v) == len(want_v)
    for c in validate.VIOLATION_COLS:
        if c == "value":
            pd.testing.assert_series_equal(
                got_v[c], want_v[c].astype(float), check_names=False, obj=c
            )
        else:
            assert got_v[c].astype(str).tolist() == want_v[c].astype(str).tolist(), c

    got_d = res.verdicts.reset_index(drop=True)
    want_d = pd.read_csv(os.path.join(GOLDEN_DIR, "verdicts_small.csv"))
    pd.testing.assert_frame_equal(got_d, want_d, check_dtype=False)
