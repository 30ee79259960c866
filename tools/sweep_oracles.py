#!/usr/bin/env python
"""Bitwise oracle sweep: run every `queries()` entry that has an
`oracle_sql()` twin against DuckDB over the same parquet tables and compare
with the driver's semantics (row count + column names + order-insensitive
values, floats bitwise).

Usage::

    python tools/sweep_oracles.py [SF_DIR] [only_query ...]

Defaults to /root/testdata/sf0.01 (the driver's correctness scale). Exits
non-zero on any mismatch. Run from /root/repo (worker imports resolve via the
driver CWD).
"""

from __future__ import annotations

import os
import sys
import warnings

warnings.filterwarnings("ignore")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df):
    import numpy as np
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import pandas as pd

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    qs, osql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')")
    failed = []
    names = [n for n in qs if n in osql and (not only or n in only)]
    for name in names:
        try:
            got = qs[name](sf_dir)
            if not isinstance(got, pd.DataFrame):
                got = got.to_pandas()
            want = con.sql(osql[name]).df()
            g, w = canon(got), canon(want)
            assert list(g.columns) == list(w.columns), \
                f"schema {list(g.columns)} != {list(w.columns)}"
            assert len(g) == len(w), f"rows {len(g)} != {len(w)}"
            pd.testing.assert_frame_equal(g, w, check_exact=True)
            print(f"  ok   {name}: {len(g)} rows bitwise")
        except Exception as e:  # noqa: BLE001 — report every query
            failed.append(name)
            msg = str(e).splitlines()[0] if str(e) else type(e).__name__
            print(f"  FAIL {name}: {msg}")
    rows_only = [n for n in qs if n not in osql and (not only or n in only)]
    if not only:
        print(f"rows-only (no oracle): {sorted(rows_only)}")
    print(f"{len(names) - len(failed)}/{len(names)} oracle queries bitwise at "
          f"{sf_dir}")
    ray.shutdown()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
