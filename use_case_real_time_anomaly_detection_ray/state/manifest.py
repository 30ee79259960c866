"""Per-partition checkpoint manifest with lineage — the engine's resume unit.

The reference has no checkpointing (stateless queries; SURVEY.md §4) but its
at-least-once + dedup model (61 s overlap windows, quirk Q6) is exactly the
idempotency contract we need: re-validating a partition must be safe. The
manifest is an append-only JSONL; one record per completed partition carrying
lineage (input fragment paths), metrics (row counts), and the partition's
accumulator snapshot (per-repo moments) so gate checks can be recomputed on
resume without rescanning content. Resume = skip partitions whose latest
record has ``status == "done"`` (last record wins, so a crashed half-write is
simply re-validated — the reference's overlap-then-dedup discipline).
"""

from __future__ import annotations

import json
import os
from typing import Any


class Manifest:
    FILENAME = "manifest.jsonl"

    def __init__(self, out_dir: str):
        self.path = os.path.join(out_dir, self.FILENAME)
        os.makedirs(out_dir, exist_ok=True)

    def records(self) -> dict[int, dict[str, Any]]:
        """Latest record per partition (last record wins)."""
        recs: dict[int, dict[str, Any]] = {}
        if not os.path.exists(self.path):
            return recs
        with open(self.path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue  # torn tail write from a crash — ignore
                recs[int(r["part"])] = r
        return recs

    def done_parts(self) -> dict[int, dict[str, Any]]:
        return {p: r for p, r in self.records().items() if r.get("status") == "done"}

    def mark_done(
        self,
        part: int,
        fragments: list[str],
        n_rows: int,
        stats_snapshot: list[dict[str, Any]],
        metrics: dict[str, Any] | None = None,
    ) -> None:
        rec = {
            "part": int(part),
            "status": "done",
            "fragments": fragments,
            "n_rows": int(n_rows),
            "stats": stats_snapshot,
            "metrics": metrics or {},
        }
        # append + flush: a crash mid-line leaves a torn tail that records()
        # skips, so the partition is simply re-validated next run
        self._append_lines([json.dumps(rec) + "\n"])

    def mark_done_many(self, records: list[dict[str, Any]]) -> None:
        """Append many done-records with ONE flush+fsync (48 per-record
        fsyncs are a fixed per-run driver cost; durability semantics are
        unchanged — a torn tail line is skipped and only its partition
        re-validates). Each dict takes the same kwargs as :meth:`mark_done`."""
        lines = []
        for kw in records:
            lines.append(json.dumps({
                "part": int(kw["part"]),
                "status": "done",
                "fragments": kw["fragments"],
                "n_rows": int(kw["n_rows"]),
                "stats": kw["stats_snapshot"],
                "metrics": kw.get("metrics") or {},
            }) + "\n")
        self._append_lines(lines)

    def mark_quarantined_many(self, parts: list[int]) -> None:
        """Supersede a partition's done-record with a quarantine tombstone
        (last record wins, so ``done_parts`` stops returning it): a part
        whose file later fails the schema contract must not keep serving
        its pre-corruption stats, and must RESCAN once repaired."""
        self._append_lines([
            json.dumps({"part": int(p), "status": "quarantined"}) + "\n"
            for p in parts
        ])

    def _append_lines(self, lines: list[str]) -> None:
        with open(self.path, "a") as f:
            f.writelines(lines)
            f.flush()
            os.fsync(f.fileno())
