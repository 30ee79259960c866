"""CLI entrypoints — the ``ray job submit`` surface (north_rule).

Usage::

    # full validation run (resumable)
    python -m use_case_real_time_anomaly_detection_ray validate CORPUS_DIR OUT_DIR
    # one scheduled-copy anomaly tick over an (id,timestamp,value) parquet table
    python -m use_case_real_time_anomaly_detection_ray anomaly INPUT.parquet OUT_DIR
    # near-dedup a (doc_id, text) table into partitioned parquet
    python -m use_case_real_time_anomaly_detection_ray dedup DOCS.parquet OUT_DIR --method minhash
    # curate training data: redact PII -> quality gate -> pack into chunks
    python -m use_case_real_time_anomaly_detection_ray curate DOCS.parquet OUT_DIR --budget 512
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
    """Returns (ray, created): ``created`` is True only when THIS process
    started the session — a pre-existing session (ray job submit, pytest
    fixture) is reused and must NOT be shut down by the CLI."""
    import ray

    created = not ray.is_initialized()
    if created:
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray, created


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

    d = sub.add_parser("dedup", help="near-dedup a (doc_id, text) parquet table")
    d.add_argument("input_parquet", help="file or directory of parquet")
    d.add_argument("out_dir")
    d.add_argument("--method", choices=["minhash", "simhash", "exact"],
                   default="minhash")
    d.add_argument("--threshold", type=float, default=0.7,
                   help="minhash Jaccard threshold")
    d.add_argument("--max-hamming", type=int, default=3,
                   help="simhash Hamming radius")

    c = sub.add_parser(
        "curate",
        help="training-data curation: redact PII -> quality filter -> "
             "pack into token-budget chunks -> partitioned parquet")
    c.add_argument("input_parquet", help="(doc_id, text) file or directory")
    c.add_argument("out_dir")
    c.add_argument("--min-quality", type=float, default=0.5)
    c.add_argument("--budget", type=int, default=512,
                   help="tokens per training chunk")
    c.add_argument("--buckets", type=int, default=16,
                   help="packing buckets (also the output partition count)")

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

    ray, created = _ensure_ray()
    try:
        if args.cmd == "validate":
            from .config import ValidationConfig
            from .pipelines import validate

            res = validate.run(args.corpus_dir, args.out_dir, ValidationConfig(),
                               resume=not args.no_resume)
            print(json.dumps({
                "parts_scanned": res.parts_scanned,
                "parts_skipped": res.parts_skipped,
                "parts_quarantined": res.parts_quarantined,
                "n_violations": int(len(res.violations)),
                "n_failed_verdicts": int((res.verdicts["status"] == "fail").sum()),
                "out_dir": res.out_dir,
            }))
        elif args.cmd == "dedup":
            import ray.data

            from .pipelines import textops

            ds = ray.data.read_parquet(args.input_parquet,
                                       columns=["doc_id", "text"])
            if args.method == "minhash":
                out = textops.minhash_dedup(ds, threshold=args.threshold)
            elif args.method == "simhash":
                out = textops.simhash_dedup(ds, max_hamming=args.max_hamming)
            else:
                out = textops.exact_dedup(ds)
            if os.path.isdir(args.out_dir) and any(
                f.endswith(".parquet") for f in os.listdir(args.out_dir)
            ):
                # write_parquet appends; counting a dirty directory would mix
                # runs (and possibly schemas) silently
                print(json.dumps({"error": f"out_dir {args.out_dir} already "
                                           "contains parquet files"}))
                return 2
            os.makedirs(args.out_dir, exist_ok=True)
            out = out.materialize()
            # one file per block → partitioned, restart-friendly output
            out.write_parquet(args.out_dir)
            # counts from the (distributed) materialized result — the output
            # table never lands on the driver
            n_docs = out.count()
            import pyarrow.compute as _pc

            if "keep" in out.schema().names:
                kept = out.map_batches(
                    lambda t: t.filter(_pc.equal(t["keep"], True)),
                    batch_format="pyarrow",
                ).count()
            else:
                kept = n_docs
            print(json.dumps({"out_dir": args.out_dir,
                              "n_docs": int(n_docs), "n_kept": int(kept)}))
        elif args.cmd == "curate":
            import ray.data

            from .pipelines import textops

            if os.path.isdir(args.out_dir) and any(
                f.endswith(".parquet")
                for _dp, _dn, fs in os.walk(args.out_dir) for f in fs
            ):  # output nests under docs/ and chunks/ — walk, don't listdir
                print(json.dumps({"error": f"out_dir {args.out_dir} already "
                                           "contains parquet files"}))
                return 2
            ds = ray.data.read_parquet(args.input_parquet,
                                       columns=["doc_id", "text"])
            n_in = ds.count()
            # 1. scrub PII (actor pool, compiled patterns)
            red = textops.redact_pii(ds)

            # 2. quality-gate the REDACTED text — quality is per-row
            # derivable, so score+filter FUSE into one map (never split a
            # filter from its format stage: Ray skips UDFs on empty blocks)
            min_q = args.min_quality

            def quality_gate(t):
                import pyarrow as _pa

                from .functions import text as _T

                q = [_T.quality_features(x)
                     for x in t["text_redacted"].to_pylist()]
                score = [
                    0.25 * (10 <= f["n_words"] <= 100_000)
                    + 0.25 * (f["stop_ratio"] >= 0.01)
                    + 0.25 * (f["punct_ratio"] <= 0.2)
                    + 0.25 * (2.0 <= f["mean_word_len"] <= 12.0)
                    for f in q
                ]
                return t.filter(_pa.array([s >= min_q for s in score]))

            kept = red.map_batches(quality_gate, batch_format="pyarrow")
            n_kept = kept.count()

            # 3. pack survivors into token-budget chunks (metadata shuffle —
            # the text column never moves; the assignment is a light sidecar
            # the trainer joins by doc_id at load time)
            packed = textops.pack_chunks(
                kept, budget=args.budget, num_buckets=args.buckets,
                text_col="text_redacted").materialize()
            os.makedirs(args.out_dir, exist_ok=True)
            nb = args.buckets

            def tag_bucket(t):
                import numpy as _np
                import pyarrow as _pa

                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.append_column(
                    "bucket",
                    _pa.array(ids.astype(_np.int64) % nb, _pa.int64()))

            # docs/ and chunks/ share the bucket layout (doc_id % buckets),
            # one directory per bucket → a failed run resumes per partition
            # and a bucket's text sits beside its chunk map
            kept.map_batches(tag_bucket, batch_format="pyarrow") \
                .write_parquet(os.path.join(args.out_dir, "docs"),
                               partition_cols=["bucket"])
            packed.write_parquet(os.path.join(args.out_dir, "chunks"),
                                 partition_cols=["bucket"])
            from .stages.reduce import distinct_rows

            n_chunks = distinct_rows(
                packed.map_batches(
                    lambda t: t.select(["bucket", "chunk_seq"]),
                    batch_format="pyarrow"),
                ["bucket", "chunk_seq"],
            ).count()
            print(json.dumps({
                "out_dir": args.out_dir,
                "n_docs_in": int(n_in),
                "n_docs_kept": int(n_kept),
                "n_chunks": int(n_chunks),
                "budget": args.budget,
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
        if created and os.environ.get("RAY_ADDRESS", "local") == "local":
            ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
