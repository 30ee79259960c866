"""Sources: column-pruned Parquet reads, NDJSON ingest, schema contract.

Mirrors the reference ingest surface (SURVEY.md §2.1): the Events-API NDJSON
ingest with declared schema + JSONPath extraction
(``tinybird/datasources/incoming_data.datasource:3-5``) becomes
``read_json``/``read_parquet`` plus an explicit ``pyarrow.Schema`` cast in the
first ``map_batches``; the declared MergeTree partition/sort keys become
explicit partition-directory layout + pushed-down filters.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import pyarrow as pa

import ray.data

#: The reference's canonical three-column contract
#: (``incoming_data.datasource:3-5``; ``readme.md:106-110``). We widen id to
#: int64 / value to float64 because the oracle tables use those; semantics
#: are unchanged.
INCOMING_DATA_SCHEMA = pa.schema(
    [("id", pa.int64()), ("timestamp", pa.timestamp("us")), ("value", pa.float64())]
)

#: The validation engine's input contract (BASELINE.json input_hint).
CODE_FILES_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        ("part", pa.int32()),
    ]
)

#: The violation-log contract: copy_log schema (``copy_log.datasource:3-8``)
#: extended with the target keys (FIXTURES.md §3).
VIOLATIONS_SCHEMA = pa.schema(
    [
        ("check", pa.string()),
        ("part", pa.int32()),
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("value", pa.float64()),
        ("anomaly_type", pa.string()),
        ("note", pa.string()),
        ("sha256", pa.string()),
    ]
)


def cast_contract(schema: pa.Schema):
    """Return a map_batches fn enforcing a declared schema — the engine-side
    analog of the reference's `.datasource` declared types + JSONPaths."""

    def _cast(batch: pa.Table) -> pa.Table:
        cols = [f.name for f in schema]
        missing = [c for c in cols if c not in batch.column_names]
        if missing:
            raise ValueError(f"schema contract violated, missing columns: {missing}")
        return batch.select(cols).cast(schema)

    return _cast


def read_table(
    sf_dir: str,
    name: str,
    columns: Sequence[str] | None = None,
    compute_heavy: bool = False,
    **kwargs,
) -> "ray.data.Dataset":
    """Column-pruned Parquet read of one driver test table
    (``/root/testdata/sf*/NAME.parquet``). Always pass ``columns`` in
    pipelines — a read that loads all columns for a 2-column transform is
    wrong at 100 TB.

    ``compute_heavy=True`` floors the block count at
    ``min(num_cpus, ceil(n/10k))`` so a small table still parallelizes an
    expensive per-row pipeline (shingling, hashing, embedding math — the
    ADVICE-r2 opt-in). Light scans leave it off: flooring EVERY read at the
    CPU count re-fragmented the multi-stage anomaly pipelines (copy_log at
    32 CPUs: 1.2 s → 2.1 s from 15 → 32 blocks rippling through every
    downstream shuffle)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if "override_num_blocks" not in kwargs:
        # bound the block count to the table's size (~1 block / 50k rows,
        # footer-only metadata read): Ray's default splits a small file into
        # ~2×num_cpus micro-blocks, and each downstream stage then schedules
        # that many near-empty tasks — at 32 CPUs this made a 100k-row
        # multi-stage pipeline 3× slower than at 8. The cap scales with the
        # cluster (≥16, up to 4×CPUs) so big tables keep full parallelism.
        try:
            import math as _math

            import pyarrow.parquet as _pq

            import ray as _ray

            n = _pq.ParquetFile(path).metadata.num_rows
            cap = 16
            ncpu = 4
            if _ray.is_initialized():
                ncpu = int(_ray.cluster_resources().get("CPU", 4))
                cap = max(16, 4 * ncpu)
            floor = (min(ncpu, max(1, _math.ceil(n / 10_000)))
                     if compute_heavy else 1)
            kwargs["override_num_blocks"] = int(max(floor, min(cap, n // 50_000)))
        except Exception:
            pass
    return ray.data.read_parquet(path, columns=list(columns) if columns else None, **kwargs)


def read_events_as_incoming(sf_dir: str, **kwargs) -> "ray.data.Dataset":
    """The driver's ``events`` table viewed through the reference's
    ``(id, timestamp, value)`` contract: ``user_id → id``, ``ts → timestamp``,
    ``value → value`` (the reference documents exactly this rename-adapter
    pattern, ``readme.md:106-112``). Reads only the three needed columns."""
    ds = read_table(sf_dir, "events", columns=["user_id", "ts", "value"], **kwargs)

    def rename(batch: pa.Table) -> pa.Table:
        batch = batch.rename_columns(
            ["id" if c == "user_id" else "timestamp" if c == "ts" else c
             for c in batch.column_names]
        )
        return batch.select(["id", "timestamp", "value"]).cast(INCOMING_DATA_SCHEMA)

    return ds.map_batches(rename, batch_format="pyarrow")


def read_ndjson_incoming(path: str) -> "ray.data.Dataset":
    """NDJSON ingest of ``{timestamp, id, value}`` reports — the Events-API
    shape the generator posts (``data-generator/anomaly-dataset-live.py:157-164``,
    ``config/sample_report.json:1``)."""
    ds = ray.data.read_json(path, file_extensions=None)  # accept .ndjson too
    return ds.map_batches(cast_contract(INCOMING_DATA_SCHEMA), batch_format="pyarrow")


def parquet_column_max(path_or_dir: str, column: str):
    """Max of a column from Parquet row-group statistics only — no data scan.
    Used to derive the deterministic 'NOW()' anchor (max timestamp) cheaply;
    falls back to a DuckDB scan when stats are absent."""
    import pyarrow.parquet as pq

    paths = []
    if os.path.isdir(path_or_dir):
        for root, _dirs, files in os.walk(path_or_dir):
            paths += [os.path.join(root, f) for f in files if f.endswith(".parquet")]
    else:
        paths = [path_or_dir]
    best = None
    ok = True
    for p in paths:
        md = pq.ParquetFile(p).metadata
        try:
            idx = md.schema.to_arrow_schema().get_field_index(column)
        except Exception:
            ok = False
            break
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            best = st.max if best is None else max(best, st.max)
        if not ok:
            break
    if ok and best is not None:
        return best
    import duckdb

    files = [p.replace("'", "''") for p in paths]
    lst = ", ".join(f"'{f}'" for f in files)
    return duckdb.sql(f"SELECT max({column}) FROM read_parquet([{lst}])").fetchone()[0]
