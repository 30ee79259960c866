"""CLI entrypoints — the ``ray job submit`` surface (north_rule).

Usage::

    # full validation run (resumable)
    python -m use_case_real_time_anomaly_detection_ray validate CORPUS_DIR OUT_DIR
    # one scheduled-copy anomaly tick over an (id,timestamp,value) parquet table
    python -m use_case_real_time_anomaly_detection_ray anomaly INPUT.parquet OUT_DIR
    # generate a corpus
    python -m use_case_real_time_anomaly_detection_ray datagen OUT_DIR --parts 8

Owns a Ray session (guarded — a pre-initialised session is reused, so this
also works under ``ray job submit`` where the cluster already exists).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="use_case_real_time_anomaly_detection_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    v = sub.add_parser("validate", help="run the full validation suite")
    v.add_argument("corpus_dir")
    v.add_argument("out_dir")
    v.add_argument("--no-resume", action="store_true")

    a = sub.add_parser("anomaly", help="one copy-log tick over an (id,timestamp,value) table")
    a.add_argument("input_parquet")
    a.add_argument("out_dir")

    g = sub.add_parser("datagen", help="generate a synthetic code corpus")
    g.add_argument("out_dir")
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--parts", type=int, default=8)
    g.add_argument("--rows-per-part", type=int, default=2000)

    args = ap.parse_args(argv)

    if args.cmd == "datagen":
        from .datagen import CorpusSpec, generate_corpus

        exp = generate_corpus(
            args.out_dir,
            CorpusSpec(seed=args.seed, n_parts=args.parts,
                       rows_per_part=args.rows_per_part),
        )
        print(json.dumps({k: (len(v) if isinstance(v, list) else v)
                          for k, v in exp.items() if k != "spec"}, default=str))
        return 0

    ray = _ensure_ray()
    try:
        if args.cmd == "validate":
            from .config import ValidationConfig
            from .pipelines import validate

            res = validate.run(args.corpus_dir, args.out_dir, ValidationConfig(),
                               resume=not args.no_resume)
            print(json.dumps({
                "parts_scanned": res.parts_scanned,
                "parts_skipped": res.parts_skipped,
                "n_violations": int(len(res.violations)),
                "n_failed_verdicts": int((res.verdicts["status"] == "fail").sum()),
                "out_dir": res.out_dir,
            }))
        elif args.cmd == "anomaly":
            import ray.data

            from .config import DetectorParams
            from .pipelines import anomaly
            from .sources.readers import parquet_column_max

            now = parquet_column_max(args.input_parquet, "timestamp")
            ds = ray.data.read_parquet(args.input_parquet)
            log = anomaly.copy_log(ds, DetectorParams(), now)
            os.makedirs(args.out_dir, exist_ok=True)
            log.write_parquet(args.out_dir)
            print(json.dumps({"out_dir": args.out_dir}))
    finally:
        # only shut down a session we created ourselves
        if os.environ.get("RAY_ADDRESS", "local") == "local":
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
