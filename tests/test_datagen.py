"""Corpus generator: determinism, schema contract, planted-anomaly bookkeeping."""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

from use_case_real_time_anomaly_detection_ray.datagen import CorpusSpec, generate_corpus
from use_case_real_time_anomaly_detection_ray.sources.readers import CODE_FILES_SCHEMA

TINY = CorpusSpec(n_parts=3, rows_per_part=400, n_out_of_range=5,
                  n_duplicates=2, n_dangling=2, stop_after_part=99)


def _dir_digest(d: str) -> str:
    h = hashlib.sha256()
    for root, _dirs, files in sorted(os.walk(d)):
        for f in sorted(files):
            h.update(f.encode())
            with open(os.path.join(root, f), "rb") as fh:
                h.update(fh.read())
    return h.hexdigest()


def test_deterministic(tmp_path):
    a, b = tmp_path / "a", tmp_path / "b"
    ea = generate_corpus(str(a), TINY)
    eb = generate_corpus(str(b), TINY)
    assert ea == eb
    assert _dir_digest(str(a)) == _dir_digest(str(b))


def test_schema_and_counts(tmp_path):
    d = str(tmp_path / "c")
    exp = generate_corpus(d, TINY)
    t = pq.read_table(os.path.join(d, "part=0", "data.parquet"))
    assert t.schema.equals(CODE_FILES_SCHEMA), t.schema
    assert len(exp["range"]) == TINY.n_out_of_range
    assert len(exp["uniqueness"]) == TINY.n_duplicates
    assert len(exp["referential"]) == TINY.n_dangling
    # expected file round-trips
    with open(os.path.join(d, "expected_violations.json")) as f:
        assert json.load(f)["control"] == exp["control"]
    # every planted range row exists with the recorded length
    for r in exp["range"]:
        part_t = pq.read_table(os.path.join(d, f"part={r['part']}", "data.parquet"))
        df = part_t.to_pandas()
        row = df[(df.repo == r["repo"]) & (df.path == r["path"]) & (df.commit == r["commit"])]
        assert len(row) == 1 and len(row.iloc[0]["content"]) == r["length"]


def test_duplicates_have_distinct_content(tmp_path):
    d = str(tmp_path / "c2")
    exp = generate_corpus(d, TINY)
    for u in exp["uniqueness"]:
        df = pq.read_table(os.path.join(d, f"part={u['part']}", "data.parquet")).to_pandas()
        rows = df[(df.repo == u["repo"]) & (df.path == u["path"]) & (df.commit == u["commit"])]
        assert len(rows) == 2
        assert rows.iloc[0]["content"] != rows.iloc[1]["content"]
