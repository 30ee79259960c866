"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares it against the matching ``oracle_sql()[name]`` via DuckDB (row-count +
schema + order-insensitive value-hash → CORRECTNESS_r{N}.json).

Nothing here (or in the library) calls ``ray.init()`` / ``ray.shutdown()`` —
the caller owns the Ray session.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

# Make the library importable regardless of the caller's CWD. (Ray *workers*
# additionally resolve the module via the driver's CWD in local mode, so run
# with CWD=/root/repo — which is where this file lives.)
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: one full scheduled-copy tick — all five anomaly
    detectors over the events stream, unioned and deduplicated into the
    copy-log shape (reference ``tinybird/pipes/copy_*.pipe`` → ``dedup_log``,
    SURVEY.md §3.2)."""
    from use_case_real_time_anomaly_detection_ray.pipelines import anomaly
    from use_case_real_time_anomaly_detection_ray.pipelines.queries import (
        EVENTS_PARAMS,
        _events,
        _now,
    )

    return anomaly.copy_log(_events(SF0001), EVENTS_PARAMS, _now(SF0001))


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from use_case_real_time_anomaly_detection_ray.pipelines.queries import ANOMALY_QUERIES
    from use_case_real_time_anomaly_detection_ray.pipelines.streamops import (
        STREAM_QUERIES,
    )
    from use_case_real_time_anomaly_detection_ray.pipelines.tqueries import TEXT_QUERIES
    from use_case_real_time_anomaly_detection_ray.pipelines.vqueries import (
        VALIDATION_QUERIES,
    )

    merged: dict[str, Callable[[str], Any]] = {}
    # The stream queries go FIRST: they are oracle-paired but had never been
    # driver-evaluated (rounds 1-4 capped the CORRECTNESS run at the first 50
    # registry entries), so they get priority in the driver's budget.
    merged.update(STREAM_QUERIES)
    merged.update(ANOMALY_QUERIES)
    merged.update(VALIDATION_QUERIES)
    merged.update(TEXT_QUERIES)
    # Every oracle-paired query precedes every rows-only one, so a prefix cap
    # on the driver's evaluation spends its slots on the hard bitwise checks.
    oracles = oracle_sql()
    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, fn in merged.items() if name in oracles
    }
    out.update({name: fn for name, fn in merged.items() if name not in oracles})
    return {name: _typed_collect(fn) for name, fn in out.items()}


def _typed_collect(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Collect Dataset results into a typed driver table for the compare.

    ``Dataset.to_pandas()`` over a pipeline whose blocks are ALL empty drops
    the schema (column-less DataFrame), so a query that legitimately finds
    zero anomalies at some scale factor would fail the schema gate. The
    fast streaming ``to_pandas`` collect is kept for the (overwhelmingly
    common) non-empty case — collecting through ``to_arrow_refs`` instead
    measured +55 % on copy_log — and only a column-less result re-collects
    through ``to_arrow_single``, which recovers the schema from the dataset
    plan (the re-execution is a fully-filtered pipeline, and the compare is
    off the hot path anyway). Query outputs are small by construction
    (filtered anomaly / verdict / dedup rows), so driver-side collection is
    what the compare does anyway."""
    import functools

    @functools.wraps(fn)
    def wrapped(sf_dir: str) -> Any:
        import ray.data

        from use_case_real_time_anomaly_detection_ray.stages.reduce import (
            to_arrow_single,
        )

        res = fn(sf_dir)
        if isinstance(res, ray.data.Dataset):
            df = res.to_pandas()
            if len(df.columns) == 0:
                # one return type for all callers: the recovered Arrow schema
                # survives the to_pandas conversion (ADVICE r3)
                return to_arrow_single(res).to_pandas()
            return df
        return res

    return wrapped


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (same column names). Non-SQL-expressible
    ops are intentionally absent (driver records a rows-only check)."""
    from use_case_real_time_anomaly_detection_ray.pipelines.queries import ANOMALY_ORACLE
    from use_case_real_time_anomaly_detection_ray.pipelines.streamops import (
        STREAM_ORACLE,
    )
    from use_case_real_time_anomaly_detection_ray.pipelines.tqueries import TEXT_ORACLE
    from use_case_real_time_anomaly_detection_ray.pipelines.vqueries import (
        VALIDATION_ORACLE,
    )

    out: dict[str, str] = {}
    out.update(ANOMALY_ORACLE)
    out.update(VALIDATION_ORACLE)
    out.update(TEXT_ORACLE)
    out.update(STREAM_ORACLE)
    return out
