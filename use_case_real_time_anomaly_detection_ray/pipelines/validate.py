"""The validation engine: schema + constraint checks over the code corpus.

Re-expresses the reference's five detection methods as constraint checks over
``(repo, path, commit, lang, content, part)`` rows (SURVEY.md §7 transposition
table), Ray-Data-first:

========================  =====================================================
reference method          target check (anomaly_type kept from the reference)
========================  =====================================================
out-of-range              ``range``: content_length outside [min_len, max_len]
                          (``copy_out_of_range.pipe:32``)
timeout                   ``staleness``: repo's newest part older than
                          ``stale_parts`` behind the corpus head
                          (``copy_timeout.pipe:21-41``)
rate-of-change            ``drift_rate``: slope of per-(repo,part) mean
                          content_length between consecutive parts
                          (``copy_rate_of_change.pipe:29,58``)
z-score                   ``zscore``: per-(repo,part) metric scored against the
                          repo's own mean/stddevPop (``copy_z_score.pipe:24-56``)
IQR                       ``iqr``: same metric vs quantileExact fences
                          (``copy_iqr.pipe:45-82``)
dedup LIMIT 1 BY          ``uniqueness`` on (repo,path,commit)
                          (``dedup_log.pipe:6``)
(north-star addition)     ``referential``: repo must exist in the repos manifest
========================  =====================================================

Execution shape (why this scales; SURVEY.md §4):

* **One content pass per partition.** The heavy columns (``content``) are read
  once in the derive stage, which computes ``content_length`` + ``sha256`` and
  *drops content immediately* — everything downstream moves ~100-byte rows.
* **No raw-row shuffle for stats.** Per-(repo, part) moments are pre-aggregated
  inside each ``map_batches`` call (one row per repo per block); the monorepo
  skew (one repo ≈ 30 % of rows) collapses before any exchange, which is the
  salted-repartition concern handled by construction.
* **Gates run on the aggregate**, a (repos × parts)-row table, via
  ``groupby(repo).map_groups`` — each repo's series fits trivially in memory.
* **Uniqueness/referential scan keys only** (column-pruned read, no content),
  so they can re-run over the whole corpus cheaply on every resume; the
  content-heavy per-partition work is checkpointed in the manifest and skipped.
* **Resumable output**: violations land in ``out/violations/part=K/`` per
  partition plus ``out/violations/global/``; the manifest records lineage +
  per-repo accumulator snapshots per partition.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from ..config import ValidationConfig
from ..functions import scalar
from ..state.manifest import Manifest
from ..stages.reduce import to_arrow_single

VIOLATION_COLS = ["check", "part", "repo", "path", "commit", "value",
                  "anomaly_type", "note", "sha256"]


def _viol_table(rows: dict[str, list]) -> pa.Table:
    n = len(rows["check"])
    return pa.table(
        {
            "check": pa.array(rows["check"], pa.string()),
            "part": pa.array(rows["part"], pa.int32()),
            "repo": pa.array(rows["repo"], pa.string()),
            "path": pa.array(rows.get("path", [""] * n), pa.string()),
            "commit": pa.array(rows.get("commit", [""] * n), pa.string()),
            "value": pa.array(rows["value"], pa.float64()),
            "anomaly_type": pa.array(rows["anomaly_type"], pa.string()),
            "note": pa.array(rows["note"], pa.string()),
            "sha256": pa.array(rows.get("sha256", [""] * n), pa.string()),
        }
    )


def discover_parts(corpus_dir: str) -> dict[int, list[str]]:
    """Partition list from the directory layout (``part=K/``) — the engine's
    unit of validation and resume; no data scan needed."""
    parts: dict[int, list[str]] = {}
    for name in sorted(os.listdir(corpus_dir)):
        if name.startswith("part="):
            k = int(name.split("=", 1)[1])
            pdir = os.path.join(corpus_dir, name)
            parts[k] = sorted(
                os.path.join(pdir, f) for f in os.listdir(pdir) if f.endswith(".parquet")
            )
    return parts


# ---------------------------------------------------------------------------
# Phase 1 — per-partition content pass: derive + range violations + moments
# ---------------------------------------------------------------------------

_ALLOC_TUNED = False


def _tune_allocator() -> None:
    """Once per worker process: keep jemalloc dirty pages warm for 60 s so
    consecutive decode tasks reuse faulted-in pages instead of re-faulting
    fresh zero pages (the guest kernel serializes page-fault zeroing enough
    that 16 concurrent decoders triple their system time otherwise)."""
    global _ALLOC_TUNED
    if not _ALLOC_TUNED:
        try:
            pa.jemalloc_set_decay_ms(60_000)
        except Exception:
            pass  # non-jemalloc pool — nothing to tune
        _ALLOC_TUNED = True


def derive_light(batch: pa.Table) -> pa.Table:
    """content → (content_length, sha256), then DROP content. The only stage
    that touches the heavy column; sha256 is the per-row invariant carried to
    the violation log (BASELINE.json input_hint).

    Hashing reads each row as a zero-copy memoryview slice of the Arrow data
    buffer (no per-row str materialization / re-encode) — hashlib does the
    per-row C work."""
    _tune_allocator()
    content = batch["content"].combine_chunks()
    if isinstance(content, pa.ChunkedArray):
        content = content.chunk(0) if content.num_chunks else pa.array([], pa.large_string())
    lengths = pc.utf8_length(content).cast(pa.int64())
    bin_arr = content.cast(pa.large_binary())
    offs = np.frombuffer(bin_arr.buffers()[1], dtype=np.int64,
                         count=len(bin_arr) + 1, offset=bin_arr.offset * 8)
    data_mv = memoryview(bin_arr.buffers()[2])
    digests = [
        hashlib.sha256(data_mv[offs[i]:offs[i + 1]]).hexdigest()
        for i in range(len(bin_arr))
    ]
    out = batch.drop_columns(["content"])
    out = out.append_column("content_length", lengths)
    out = out.append_column("sha256", pa.array(digests, pa.string()))
    return out


def make_derive_fused(min_len: int, max_len: int, use_polars: bool = False,
                      with_keyh: bool = False):
    """Fused derive + range predicate: the phase-1 content pass used by
    :func:`run`. Same per-row work as :func:`derive_light` (utf8 length +
    sha256 over a zero-copy memoryview of every row), but the materialized
    "light" table it emits is SPARSE: ``path`` / ``commit`` / ``sha256`` are
    carried only for rows failing the range predicate (null elsewhere, so
    their string buffers hold just the violators), and the full 32-byte
    digest is folded to a per-row ``sha64`` int (first 8 bytes) that the
    stats pass XORs into a per-partition content fingerprint for the
    manifest. The dense version carried ~64 B of hex + ~80 B of key strings
    per row — re-reading that 2.6 GB table out of the object store
    re-faulted every plasma mmap page on this guest (the kernel serializes
    page-fault zeroing), which made BOTH downstream consumers
    (range filter, combined stats) scale at ~0.65; the sparse layout is
    ~5× smaller, so consumer scans are object-store-bandwidth-trivial."""

    def fn(batch: pa.Table) -> pa.Table:
        _tune_allocator()
        content = batch["content"].combine_chunks()
        if isinstance(content, pa.ChunkedArray):
            content = (content.chunk(0) if content.num_chunks
                       else pa.array([], pa.large_string()))
        lengths = pc.utf8_length(content).cast(pa.int64())
        bin_arr = content.cast(pa.large_binary())
        n = len(bin_arr)
        offs = np.frombuffer(bin_arr.buffers()[1], dtype=np.int64,
                             count=n + 1, offset=bin_arr.offset * 8)
        data_mv = memoryview(bin_arr.buffers()[2])
        digests = [
            hashlib.sha256(data_mv[offs[i]:offs[i + 1]]).digest()
            for i in range(n)
        ]
        # first 8 bytes of each digest as one int per row (int64 view —
        # Ray's sort/groupby machinery overflows on uint64 columns)
        sha64 = (
            np.frombuffer(b"".join(digests), dtype=np.uint64)[::4]
            .view(np.int64).copy()
            if n else np.empty(0, dtype=np.int64)
        )
        mask = pc.or_kleene(
            pc.less(lengths, pa.scalar(min_len, pa.int64())),
            pc.greater(lengths, pa.scalar(max_len, pa.int64())),
        )
        mask = pc.fill_null(mask, False)
        none_str = pa.scalar(None, type=pa.string())
        if pc.any(mask).as_py():
            mask_np = mask.to_numpy(zero_copy_only=False)
            hexes = [digests[i].hex() if mask_np[i] else None
                     for i in range(n)]
            sha_col = pa.array(hexes, pa.string())
            path_col = pc.if_else(mask, batch["path"].combine_chunks()
                                  .cast(pa.string()), none_str)
            commit_col = pc.if_else(mask, batch["commit"].combine_chunks()
                                    .cast(pa.string()), none_str)
        else:
            sha_col = pa.nulls(n, pa.string())
            path_col = pa.nulls(n, pa.string())
            commit_col = pa.nulls(n, pa.string())
        cols = {
            "part": batch["part"],
            "repo": batch["repo"],
            "lang": batch["lang"],
            "content_length": lengths,
            "sha64": pa.array(sha64, pa.int64()),
            "path": path_col,
            "commit": commit_col,
            "sha256": sha_col,
        }
        if with_keyh:
            # per-row 64-bit hash of the FULL (repo,path,commit) key triple,
            # computed here where the key strings are already decoded — the
            # ``RTAD_UNIQ_FROM_LIGHT=1`` wiring feeds uniqueness (keyh, part)
            # straight from the materialized light table, deleting its second
            # corpus scan (int64 bit-view: Ray's shuffle machinery overflows
            # on uint64). Off by default: the overlapped column-pruned
            # parquet key scan hides entirely under this content pass and
            # measures faster at every CPU count (see BENCH/BASELINE.md).
            keyh = _triple_hash(batch, _UNIQ_KEYS, use_polars).view(np.int64)
            cols["keyh"] = pa.array(keyh, pa.int64())
        return pa.table(cols)

    return fn


class _DerivePool:
    """Actor-pool wrapper for :func:`make_derive_fused` — used above ~16
    session CPUs to pin decode work to a bounded set of worker processes
    (warm resident arenas; see the call site in :func:`run`)."""

    def __init__(self, min_len: int, max_len: int, use_polars: bool = False,
                 with_keyh: bool = False):
        self._fn = make_derive_fused(min_len, max_len, use_polars, with_keyh)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._fn(batch)


def range_violations(light: "ray.data.Dataset", cfg: ValidationConfig) -> "ray.data.Dataset":
    """Row-level range check — the out-of-range predicate applied to
    ``content_length`` (``copy_out_of_range.pipe:32``), note byte-format
    ``min:.. max:..`` (``:44``)."""
    note = scalar.note_out_of_range(cfg.min_len, cfg.max_len)

    def check(t: pa.Table) -> pa.Table:
        L = t["content_length"]
        mask = pc.or_(pc.less(L, pa.scalar(cfg.min_len, pa.int64())),
                      pc.greater(L, pa.scalar(cfg.max_len, pa.int64())))
        bad = t.filter(mask)
        n = bad.num_rows
        return _viol_table(
            {
                "check": ["range"] * n,
                "part": bad["part"].to_pylist(),
                "repo": bad["repo"].to_pylist(),
                "path": bad["path"].to_pylist(),
                "commit": bad["commit"].to_pylist(),
                "value": bad["content_length"].cast(pa.float64()).to_pylist(),
                "anomaly_type": ["out-of-range"] * n,
                "note": [note] * n,
                "sha256": bad["sha256"].to_pylist(),
            }
        )

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    kw: dict[str, Any] = (
        {"concurrency": max(8, ncpu // 2)} if ncpu > 16 else {}
    )
    return light.map_batches(check, batch_format="pyarrow", **kw)


def _moments_partial_fn(min_len: int, max_len: int):
    """Per-block (part, repo) moment partials — the in-map pre-aggregation
    that makes the stats exchange O(repos × blocks), immune to monorepo skew.

    Out-of-range rows are *quarantined* from the distribution stats: they are
    already reported by the range check, and letting a single 3000-char outlier
    drag a 70-row partition mean would double-report one defect as a fake
    drift/z-score finding. (The reference has the same separation: its z-score
    stats window and its out-of-range check are independent pipes.)"""

    def partial(df: pd.DataFrame) -> pa.Table:
        L = df["content_length"].astype("float64")
        ok = (L >= min_len) & (L <= max_len)
        df, L = df[ok], L[ok]
        g = df.assign(_l=L, _l2=L * L).groupby(["part", "repo"], sort=False).agg(
            n=("_l", "size"), s=("_l", "sum"), s2=("_l2", "sum"),
            mn=("_l", "min"), mx=("_l", "max"),
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    return partial





def combined_light_stats(
    light: "ray.data.Dataset", cfg: ValidationConfig
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """moments + lang-histogram + null-rate inputs in ONE pass over the
    materialized light table (they were three separate scans; the per-pass
    fixed cost is what keeps the 4→16 scaling below the ceiling — ADVICE
    r2/VERDICT #4). One per-block groupby over (part, repo, lang) carries
    all the sufficient statistics; the driver derives the three frames from
    the tiny merged partials. Returns (stats, lang_stats, null_stats) with
    the shapes the gate stages consume: (part, repo, n, s, s2, mn, mx) /
    (part, lang, n) / (part, n, n_null)."""
    min_len, max_len = cfg.min_len, cfg.max_len

    def partial(t: pa.Table) -> pa.Table:
        """Arrow-native per-block partial: the pandas version materialized
        every repo/lang value as a Python str (object-array conversion),
        which at 15 M rows cost more core-seconds than the aggregation
        itself. ``pa.Table.group_by`` keeps the strings in Arrow buffers."""
        L = t["content_length"].cast(pa.float64())
        ok = pc.fill_null(
            pc.and_kleene(
                pc.greater_equal(L, pa.scalar(float(min_len))),
                pc.less_equal(L, pa.scalar(float(max_len))),
            ),
            False,
        )
        lq = pc.if_else(ok, L, pa.scalar(None, pa.float64()))
        nn = pc.or_kleene(pc.is_null(L), pc.equal(L, pa.scalar(0.0)))
        base = pa.table({
            "part": t["part"], "repo": t["repo"], "lang": t["lang"],
            "_l": lq, "_l2": pc.multiply(lq, lq),
            "_ok": ok.cast(pa.int64()),
            "_nn": pc.fill_null(nn, True).cast(pa.int64()),
        })
        g = base.group_by(["part", "repo", "lang"], use_threads=False).aggregate(
            [("_ok", "count"), ("_ok", "sum"), ("_l", "sum"), ("_l2", "sum"),
             ("_l", "min"), ("_l", "max"), ("_nn", "sum")]
        )
        # select by the AGGREGATE names pyarrow emits ("<col>_<fn>") — a
        # positional rename silently mislabels every stat if the keys-vs-
        # aggregates column order differs across pyarrow versions
        g = pa.table({
            "part": g["part"], "repo": g["repo"], "lang": g["lang"],
            "n_all": g["_ok_count"], "n": g["_ok_sum"],
            "s": g["_l_sum"], "s2": g["_l2_sum"],
            "mn": g["_l_min"], "mx": g["_l_max"], "n_null": g["_nn_sum"],
        })
        if "sha64" in t.column_names:
            # XOR-fold of the per-row content digests per part — associative,
            # so the per-block fold here and the per-part fold on the driver
            # compose into the partition's content fingerprint (manifest
            # lineage). XOR's identity is 0, so the fold rides on the FIRST
            # output row of each part (0 elsewhere) and the driver XORs.
            parts_np = t["part"].to_numpy()
            sha_np = t["sha64"].to_numpy()
            out_parts = g["part"].to_numpy()
            sha_col = np.zeros(g.num_rows, dtype=np.int64)
            for p in np.unique(parts_np):
                idx = int(np.argmax(out_parts == p))
                sha_col[idx] = np.bitwise_xor.reduce(sha_np[parts_np == p])
            g = g.append_column("sha_xor", pa.array(sha_col, pa.int64()))
        return g

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    kw: dict[str, Any] = (
        {"concurrency": max(8, ncpu // 2)} if ncpu > 16 else {}
    )  # bound worker-process rotation past the physical-core count
    parts_ds = light.map_batches(partial, batch_format="pyarrow",
                                 batch_size=None, **kw).materialize()
    if parts_ds.count() > STATS_BUCKETED_ABOVE:
        return _merge_light_stats_distributed(parts_ds)
    parts = parts_ds.to_pandas()
    if len(parts) == 0:
        return (
            pd.DataFrame(columns=["part", "repo", "n", "s", "s2", "mn", "mx"]),
            pd.DataFrame(columns=["part", "lang", "n"]),
            pd.DataFrame(columns=["part", "n", "n_null"]),
        )
    stats = parts.groupby(["part", "repo"], sort=False).agg(
        n=("n", "sum"), s=("s", "sum"), s2=("s2", "sum"),
        mn=("mn", "min"), mx=("mx", "max"),
    ).reset_index()
    stats = stats[stats["n"] > 0].reset_index(drop=True)  # all-quarantined groups
    lang_stats = (parts.groupby(["part", "lang"], sort=False)["n_all"].sum()
                  .reset_index().rename(columns={"n_all": "n"}))
    null_aggs: dict[str, Any] = dict(n=("n_all", "sum"), n_null=("n_null", "sum"))
    if "sha_xor" in parts.columns:
        null_aggs["sha_xor"] = (
            "sha_xor", lambda s: np.bitwise_xor.reduce(s.to_numpy(dtype="int64"))
        )
    null_stats = (parts.groupby("part", sort=False)
                  .agg(**null_aggs)
                  .reset_index())
    return stats, lang_stats, null_stats


#: Moment-partial row count above which the (part, repo, lang) stats merge
#: routes through the all-Arrow bucketed shuffle instead of a driver-side
#: pandas groupby. The partial set is O(distinct keys × blocks-touched) —
#: at 10^6 repos × 10^5 blocks it is driver-OOM territory (VERDICT r3 #3);
#: below the bound the driver merge is faster (no shuffle fixed cost).
STATS_BUCKETED_ABOVE = 5_000_000


def _merge_light_stats_distributed(
    parts_ds: "ray.data.Dataset",
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """Scale-path merge of the per-block moment partials: same all-Arrow
    bucketed shape as :func:`_dup_hashes_distributed` — bucket by the
    null-safe key hash (``stages.reduce._hash_keys_arrow``), merge each
    bucket with ``pa.Table.group_by`` inside ``map_groups`` — so the driver
    receives only the three MERGED frames (O(parts × repos / langs) rows,
    exactly what the driver path produces). Bitwise-equal to the driver
    merge regardless of partial order: every sum is over integer-valued
    float64 (content lengths and counts), exact under reassociation, and
    null-keyed partial rows are dropped to match pandas ``groupby``'s
    ``dropna=True`` on the driver path (Arrow ``group_by`` would otherwise
    keep a null-key group the driver merge silently drops).

    The ``sha_xor`` lineage fold groups by ``part`` alone, so each part's
    rows land wholly in one bucket and the in-bucket XOR fold is complete
    (XOR is associative/commutative)."""
    from ..stages.reduce import bucketed_merge_arrow

    has_sha = "sha_xor" in parts_ds.schema().names

    def grouped(keys: list[str], merge) -> pd.DataFrame:
        def merge_nonnull(g: pa.Table) -> pa.Table:
            mask = None
            for k in keys:
                v = pc.is_valid(g[k])
                mask = v if mask is None else pc.and_(mask, v)
            return merge(g.filter(mask))

        out = bucketed_merge_arrow(parts_ds, keys, merge_nonnull)
        return to_arrow_single(out).to_pandas()

    def merge_stats(g: pa.Table) -> pa.Table:
        a = g.group_by(["part", "repo"], use_threads=False).aggregate(
            [("n", "sum"), ("s", "sum"), ("s2", "sum"),
             ("mn", "min"), ("mx", "max")]
        )
        return pa.table({"part": a["part"], "repo": a["repo"],
                         "n": a["n_sum"], "s": a["s_sum"], "s2": a["s2_sum"],
                         "mn": a["mn_min"], "mx": a["mx_max"]})

    def merge_lang(g: pa.Table) -> pa.Table:
        a = g.group_by(["part", "lang"], use_threads=False).aggregate(
            [("n_all", "sum")]
        )
        return pa.table({"part": a["part"], "lang": a["lang"],
                         "n": a["n_all_sum"]})

    def merge_null(g: pa.Table) -> pa.Table:
        a = g.group_by(["part"], use_threads=False).aggregate(
            [("n_all", "sum"), ("n_null", "sum")]
        )
        cols = {"part": a["part"], "n": a["n_all_sum"],
                "n_null": a["n_null_sum"]}
        if has_sha:
            parts_np = g["part"].to_numpy()
            sha = g["sha_xor"].to_numpy()
            out_parts = a["part"].to_numpy()
            vals = np.zeros(len(out_parts), np.int64)
            for i, p in enumerate(out_parts):
                vals[i] = np.bitwise_xor.reduce(sha[parts_np == p])
            cols["sha_xor"] = pa.array(vals, pa.int64())
        return pa.table(cols)

    stats = grouped(["part", "repo"], merge_stats)
    stats = stats[stats["n"] > 0].reset_index(drop=True)
    lang_stats = grouped(["part", "lang"], merge_lang)
    null_stats = grouped(["part"], merge_null)
    return stats, lang_stats, null_stats


def null_rate_violations(null_stats: pd.DataFrame, cfg: ValidationConfig) -> pa.Table:
    """Flag partitions whose null/empty-content fraction exceeds
    ``max_null_rate``. Null rows are invisible to the range predicate (SQL
    NULL comparisons drop them), so this is the check that catches a corrupt
    ingest batch of empty payloads."""
    rows: dict[str, list] = {c: [] for c in VIOLATION_COLS}
    for r in null_stats.itertuples():
        rate = (float(r.n_null) / float(r.n)) if r.n else 0.0
        if rate > cfg.max_null_rate:
            rows["check"].append("null_rate")
            rows["part"].append(int(r.part))
            rows["repo"].append("")
            rows["path"].append("")
            rows["commit"].append("")
            rows["value"].append(rate)
            rows["anomaly_type"].append("null-rate")
            rows["note"].append(
                f"null_rate:{scalar.round_half_even(rate, 4)} "
                f"max:{cfg.max_null_rate}"
            )
            rows["sha256"].append("")
    return _viol_table(rows)


def lang_gate_violations(lang_stats: pd.DataFrame, cfg: ValidationConfig) -> pa.Table:
    """z-score + quantileExact-IQR gates over each language's per-part
    frequency series (freq = lang rows / part rows). Same detector math and
    note formats as the content-length gates, with a ``lang:<x> | `` prefix;
    check names ``lang_zscore`` / ``lang_iqr``."""
    rows: dict[str, list] = {c: [] for c in VIOLATION_COLS}
    if len(lang_stats) == 0:
        return _viol_table(rows)
    totals = lang_stats.groupby("part")["n"].sum()
    df = lang_stats.assign(freq=lang_stats["n"] / lang_stats["part"].map(totals))
    t, k = cfg.zscore_threshold, cfg.iqr_multiplier

    def emit(check, part, lang, value, atype, note):
        rows["check"].append(check)
        rows["part"].append(int(part))
        rows["repo"].append("")
        rows["path"].append("")
        rows["commit"].append("")
        rows["value"].append(float(value))
        rows["anomaly_type"].append(atype)
        rows["note"].append(f"lang:{lang} | {note}")
        rows["sha256"].append("")

    # every language's series is reindexed over ALL observed parts with freq=0
    # fill: total disappearance of a language from a part (the histogram
    # analog of a timeout) must be scoreable, and the mean/quantile baselines
    # must cover absent parts too (ADVICE r1)
    all_parts = np.asarray(sorted(totals.index), dtype="int64")
    for lang, g in df.groupby("lang", sort=True):
        fmap = dict(zip(g["part"].astype("int64"), g["freq"].astype("float64")))
        parts_arr = all_parts
        f = np.array([fmap.get(int(p), 0.0) for p in parts_arr], dtype="float64")
        avg = float(f.mean())
        std = float(np.sqrt(np.maximum((f * f).mean() - avg * avg, 0.0)))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (f - avg) / std
        avg_r, std_r = scalar.round_half_even(avg, 4), scalar.round_half_even(std, 4)
        for part, fi, zi in zip(parts_arr, f, z):
            if zi < -t or zi > t:
                emit("lang_zscore", part, lang, fi, "z-score",
                     scalar.note_z_score(zi, t, avg_r, std_r))
        srt = np.sort(f)
        q1 = float(srt[scalar.ch_quantile_exact_index(srt.size, 0.25)])
        q3 = float(srt[scalar.ch_quantile_exact_index(srt.size, 0.75)])
        iqr_v = (q3 - q1) * k
        lo_b, hi_b = q1 - iqr_v, q3 + iqr_v
        for part, fi in zip(parts_arr, f):
            if fi < lo_b or fi > hi_b:
                emit("lang_iqr", part, lang, fi, "interquartile-range",
                     scalar.note_iqr(scalar.round_half_even(lo_b, 4),
                                     scalar.round_half_even(hi_b, 4)))
    return _viol_table(rows)


#: expected column contract of the code corpus (BASELINE.json input_hint:
#: ``repo:string, path:string, commit:string, lang:string, content:string``)
SCHEMA_CONTRACT: dict[str, tuple] = {
    "repo": (pa.string(), pa.large_string()),
    "path": (pa.string(), pa.large_string()),
    "commit": (pa.string(), pa.large_string()),
    "lang": (pa.string(), pa.large_string()),
    "content": (pa.string(), pa.large_string()),
}


#: fan the per-fragment footer reads out through Ray above this many
#: fragments — a serial driver loop over tens of millions of files would be
#: a driver-bound O(files) pre-pass dominating wall clock (ADVICE r4); below
#: it, task overhead exceeds the footer reads. Both paths are pinned
#: output-equal by a forced-path test.
SCHEMA_FANOUT_ABOVE = 256


def _schema_check_fragment(part: int, frag: str,
                           rows: dict[str, list]) -> None:
    """Footer-check one fragment, appending violation rows (shared by the
    serial and Ray-fanned paths so their outputs are identical)."""

    def emit(n_defects: int, note: str) -> None:
        rows["check"].append("schema")
        rows["part"].append(int(part))
        rows["repo"].append("")
        rows["path"].append(os.path.basename(frag))
        rows["commit"].append("")
        rows["value"].append(float(n_defects))
        rows["anomaly_type"].append("schema")
        rows["note"].append(note)
        rows["sha256"].append("")

    try:
        sch = pq.read_schema(frag)
    except Exception as e:  # truncated/corrupt footer: quarantine, never
        # crash — the most common real corruption is a file torn mid-write,
        # and one such file must not kill the run
        emit(1, f"schema: unreadable parquet footer ({e})")
        return
    have = {n: sch.field(n).type for n in sch.names}
    defects = []
    for col, ok_types in SCHEMA_CONTRACT.items():
        if col not in have:
            defects.append(f"missing column '{col}'")
        elif have[col] not in ok_types:
            defects.append(f"column '{col}' type {have[col]} != string")
    if defects:
        emit(len(defects), "schema: " + "; ".join(defects))


def _schema_check_batch(t: pa.Table) -> pa.Table:
    rows: dict[str, list] = {c: [] for c in VIOLATION_COLS}
    for part, frag in zip(t["part"].to_pylist(), t["frag"].to_pylist()):
        _schema_check_fragment(part, frag, rows)
    return _viol_table(rows)


def schema_violations(parts: dict[int, list[str]]) -> pa.Table:
    """Schema-contract check — the literal "schema" half of "schema +
    constraint validation" (BASELINE.json north_rule): every partition's
    parquet footer must carry the contract columns with string types.
    Metadata-only (``pq.read_schema`` per fragment — no data scan), so it
    runs on EVERY part each run like referential, needing no manifest
    snapshot; one violation row per (part, defect), value = defect count
    of that fragment's schema. Above ``SCHEMA_FANOUT_ABOVE`` fragments the
    footer reads fan out as a Ray map over the fragment list (the I/O is
    per-file and embarrassingly parallel); the output is sorted by
    (part, path) so both paths emit identical tables."""
    items = [(part, frag) for part in sorted(parts) for frag in parts[part]]
    if len(items) <= SCHEMA_FANOUT_ABOVE:
        rows: dict[str, list] = {c: [] for c in VIOLATION_COLS}
        for part, frag in items:
            _schema_check_fragment(part, frag, rows)
        out = _viol_table(rows)
    else:
        from ..stages.reduce import to_arrow_single

        frag_ds = ray.data.from_arrow(pa.table({
            "part": pa.array([p for p, _ in items], pa.int32()),
            "frag": pa.array([f for _, f in items], pa.string()),
        }))
        # from_arrow yields ONE block (textops precedent) — split it, or
        # the "fan-out" runs every footer read in a single task
        nb = max(2, -(-len(items) // max(1, SCHEMA_FANOUT_ABOVE)))
        out = to_arrow_single(
            frag_ds.repartition(nb)
            .map_batches(_schema_check_batch, batch_format="pyarrow"))
    return out.sort_by([("part", "ascending"), ("path", "ascending"),
                        ("note", "ascending")])


def length_hist(light: "ray.data.Dataset", cfg: ValidationConfig) -> pd.DataFrame:
    """Per-(part, bin) counts of ``content_length`` for the drift gates —
    one Arrow group-by pass over the materialized light table emitting
    O(parts × drift_bins) rows per block; the driver folds the tiny
    partials. Null lengths (quarantined content) count as length 0, i.e.
    bin 0 — a corrupt all-null batch then shows up as mass concentration
    exactly where the PSI/KS fences look."""
    w, nb = float(cfg.drift_bin_width), int(cfg.drift_bins)

    def partial(t: pa.Table) -> pa.Table:
        L = pc.fill_null(t["content_length"].cast(pa.float64()), 0.0)
        Lnp = L.to_numpy(zero_copy_only=False)
        b = np.maximum(np.minimum(np.floor(Lnp / w), nb - 1), 0).astype(np.int64)
        base = pa.table({"part": t["part"], "bin": pa.array(b)})
        g = base.group_by(["part", "bin"], use_threads=False).aggregate(
            [("bin", "count")])
        return pa.table({"part": g["part"], "bin": g["bin"],
                         "n": g["bin_count"].cast(pa.int64())})

    parts = light.map_batches(partial, batch_format="pyarrow",
                              batch_size=None).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame(columns=["part", "bin", "n"])
    return parts.groupby(["part", "bin"], sort=False)["n"].sum().reset_index()


def drift_gate_violations(
    hist: pd.DataFrame, lang_stats: pd.DataFrame, cfg: ValidationConfig
) -> pa.Table:
    """Partition-level distribution-drift gates: PSI and binned-ECDF KS over
    the content-length histogram, chi-squared over the lang frequencies —
    the whole-distribution generalization of the reference's per-point
    z-score/IQR fences (``copy_z_score.pipe:24-56``), scored by the SAME
    ``pipelines/drift.py`` functions the standalone drift operators use."""
    from .drift import chi2_score_table, ks_score_table, psi_score_table

    rows: dict[str, list] = {c: [] for c in VIOLATION_COLS}

    def emit(check: str, part: int, value: float, note: str) -> None:
        rows["check"].append(check)
        rows["part"].append(int(part))
        rows["repo"].append("")
        rows["path"].append("")
        rows["commit"].append("")
        rows["value"].append(float(value))
        rows["anomaly_type"].append("distribution-drift")
        rows["note"].append(note)
        rows["sha256"].append("")

    wants_hist = {"psi_drift", "ks_drift"} & set(cfg.checks)
    if wants_hist and len(hist):
        nb = int(cfg.drift_bins)
        glob = hist.groupby("bin", sort=False)["n"].sum()
        glob_c = glob.reindex(range(nb), fill_value=0).to_numpy(np.float64)
        total = float(glob_c.sum())
        if "psi_drift" in cfg.checks:
            sc = psi_score_table(hist, glob_c, total, nb, cfg.psi_threshold,
                                 n_col="n")
            for r in sc[sc["flagged"]].itertuples():
                emit("psi_drift", r.part, r.psi,
                     f"psi:{scalar.round_half_even(r.psi, 4)} "
                     f"max:{cfg.psi_threshold} bins:{nb} "
                     f"width:{cfg.drift_bin_width}")
        if "ks_drift" in cfg.checks:
            sc = ks_score_table(hist, glob_c, total, nb, cfg.ks_threshold,
                                n_col="n")
            for r in sc[sc["flagged"]].itertuples():
                emit("ks_drift", r.part, r.ks,
                     f"ks:{scalar.round_half_even(r.ks, 4)} "
                     f"max:{cfg.ks_threshold} bins:{nb} "
                     f"width:{cfg.drift_bin_width}")
    if "chi2_drift" in cfg.checks and len(lang_stats):
        glob = lang_stats.groupby("lang", sort=False)["n"].sum()
        cats = sorted(glob.index.tolist())
        glob_c = glob.reindex(cats).to_numpy(np.float64)
        total = float(glob_c.sum())
        sc = chi2_score_table(lang_stats, cats, glob_c, total,
                              cfg.chi2_threshold, cat_col="lang", n_col="n")
        for r in sc[sc["flagged"]].itertuples():
            emit("chi2_drift", r.part, r.chi2,
                 f"chi2:{scalar.round_half_even(r.chi2, 4)} "
                 f"max:{cfg.chi2_threshold} cats:{len(cats)}")
    return _viol_table(rows)


def finish_moments(agg: pd.DataFrame) -> pd.DataFrame:
    n = agg["n"].to_numpy(dtype="float64")
    mean = agg["s"].to_numpy(dtype="float64") / n
    var = np.maximum(agg["s2"].to_numpy(dtype="float64") / n - mean * mean, 0.0)
    out = agg.copy()
    out["mean_len"] = mean
    out["std_len"] = np.sqrt(var)
    return out


# ---------------------------------------------------------------------------
# Phase 2 — key-only corpus scan: uniqueness + referential
# ---------------------------------------------------------------------------

#: Partial-row threshold above which the duplicate-hash merge routes through
#: the bucketed int-key shuffle (``stages.reduce.bucketed_merge``) instead of
#: a driver-side pandas groupby. At 10^12 keys the partials are O(distinct
#: keys × blocks-touched) and would OOM the driver otherwise.
UNIQ_BUCKETED_ABOVE = 5_000_000

_UNIQ_KEYS = ["repo", "path", "commit"]


def _polars_available() -> bool:
    try:
        import polars  # noqa: F401

        return True
    except Exception:
        return False


def _triple_hash(t: pa.Table, keys: list[str], use_polars: bool) -> np.ndarray:
    """Vectorized 64-bit hash of the full key tuple per row. Hashing the FULL
    triple (not one column) keeps the prefilter selective even when one key
    component (e.g. a commit sha spanning many files) repeats across rows —
    a single-column prefilter would fetch essentially the whole key set
    (ADVICE r1). Collisions only cost extra verify work, never wrong output.

    Fast path: polars ``hash_rows`` — Rust row hashing zero-copy from Arrow
    (the pandas path materializes every key as a Python string and hashes
    object-by-object, ~10× slower at corpus scale). ``use_polars`` is decided
    ONCE on the driver and shipped with the stage (ADVICE r2): a per-worker
    try/except would let stage-1 partial hashes disagree with the stage-2
    filter on a heterogeneous cluster and silently miss duplicates — here a
    worker missing polars fails loudly instead."""
    if use_polars:
        import polars as pl

        return pl.from_arrow(t.select(keys)).hash_rows(seed=0).to_numpy()
    h = np.zeros(t.num_rows, dtype=np.uint64)
    for c in keys:
        h = h * np.uint64(1000003) + pd.util.hash_array(
            np.asarray(t[c].to_pandas())
        ).astype(np.uint64)
    return h


def uniqueness_violations(
    corpus_dir: str, cfg: ValidationConfig
) -> "ray.data.Dataset":
    """Duplicate (repo, path, commit) keys — the dedup-key machinery of
    ``dedup_log.pipe:6`` turned into a constraint (SURVEY.md §2.7 D4).
    Column-pruned read (keys only, never content); hash-condense + pre-count
    per block, then a keyed merge. Violation value = duplicate count."""
    files = [f for frags in discover_parts(corpus_dir).values() for f in frags]
    return _uniqueness_from_datasets(*_uniq_reads(files))


def _uniq_reads(files: list[str]):
    """The two key-only scans of the uniqueness check (one recipe, both call
    sites): column-pruned, one block per file so the read fuses with the
    hash/filter stage — raw key strings never enter the object store (only
    16-byte hash partials do)."""
    cols = _UNIQ_KEYS + ["part"]

    def mk():
        return ray.data.read_parquet(files, columns=cols,
                                     override_num_blocks=len(files))

    return mk(), mk()


class _HashPartialPool:
    """Key-scan stage 1: (repo,path,commit,part) block → per-block
    (hash, n, part_min) partials. Callable both as a stateless fn (small
    sessions) and as an actor-pool class (large sessions). The hash
    implementation choice is probed on the driver and passed in."""

    def __init__(self, use_polars: bool):
        self.use_polars = use_polars

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        df = pd.DataFrame({"h": _triple_hash(t, _UNIQ_KEYS, self.use_polars),
                           "part": t["part"].to_numpy()})
        g = df.groupby("h", sort=False).agg(
            n=("part", "size"), part=("part", "min")
        ).reset_index()
        return pa.table({"h": pa.array(g["h"].to_numpy(), pa.uint64()),
                         "n": pa.array(g["n"].to_numpy(), pa.int64()),
                         "part": pa.array(g["part"].to_numpy().astype("int64"))})


def _prehashed_partial(t: pa.Table) -> pa.Table:
    """Key-scan stage 1 over a light table that ALREADY carries the per-row
    triple hash (``keyh``, computed inside the fused derive pass): a pure
    int64 group-count per block — no string decode, no re-hash. The two
    int64 columns it touches are ~6% of the light table's bytes, so reading
    them back out of the object store is page-fault-trivial (the fat-string
    variant of this feed was measured 2-3× slower than a parquet re-read
    and reverted; the sparse layout flips that)."""
    if t.num_rows == 0:
        return pa.table({"h": pa.array([], pa.uint64()),
                         "n": pa.array([], pa.int64()),
                         "part": pa.array([], pa.int64())})
    g = pa.table({"h": t["keyh"], "part": t["part"]}).group_by(
        ["h"], use_threads=False
    ).aggregate([("part", "count"), ("part", "min")])
    return pa.table({
        "h": pa.array(g["h"].to_numpy().view(np.uint64), pa.uint64()),
        "n": g["part_count"].cast(pa.int64()),
        "part": g["part_min"].cast(pa.int64()),
    })


def _dup_hashes_distributed(
    partials: "ray.data.Dataset", num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Scale-path merge of (h, n) key-hash partials → hashes with global
    count > 1, ALL-ARROW end to end. The generic pandas ``bucketed_merge``
    measured 46 s on a 30.7 M-row partial set (two full pandas conversions
    plus per-row re-hashing of a column that already IS a 64-bit hash); this
    path buckets with ``h & (num_buckets-1)`` (one SIMD kernel — h is
    uniformly mixed) and merges with Arrow ``group_by`` inside
    ``map_groups``: 10 s on the same input, and only the 16-byte (h, n)
    pairs ever shuffle (``part`` is dropped — the duplicate-hash set is the
    only consumer downstream; the exact recount rebuilds counts/parts from
    the fetched key strings)."""

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pc.bit_wise_and(t["h"], np.uint64(num_buckets - 1)).cast(pa.int32())
        return pa.table({"h": t["h"], "n": t["n"]}).append_column("bucket", b)

    def merge(g: pa.Table) -> pa.Table:
        a = g.group_by(["h"], use_threads=False).aggregate([("n", "sum")])
        return a.filter(pc.greater(a["n_sum"], 1)).select(["h"])

    bucketed = partials.map_batches(add_bucket, batch_format="pyarrow",
                                    batch_size=None)
    return bucketed.groupby("bucket").map_groups(merge, batch_format="pyarrow")


class _FetchCandidatesPool:
    """Key-scan stage 2: keep rows whose triple-hash is in the (broadcast)
    duplicate-hash set."""

    def __init__(self, dup_hashes: pa.Array, use_polars: bool):
        self.dup_hashes = dup_hashes
        self.use_polars = use_polars

    def __call__(self, t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        h = pa.array(_triple_hash(t, _UNIQ_KEYS, self.use_polars), pa.uint64())
        return t.filter(pc.is_in(h, value_set=self.dup_hashes))


def _uniqueness_from_datasets(
    pre: "ray.data.Dataset", ds: "ray.data.Dataset",
    bucketed_above: int = UNIQ_BUCKETED_ABOVE,
    n_rows_hint: int | None = None,
    pre_hashed: bool = False,
) -> "ray.data.Dataset":
    """Core of the uniqueness check over pre-built datasets.

    Hash-condense then verify (two cheap passes, no wide-row shuffle):
     1. per block, reduce each (repo, path, commit) triple to a 64-bit hash
        and pre-count → 16-byte (hash, n, part) partials instead of ~100-byte
        string triples;
     2. find hashes with global count > 1 — driver pandas groupby below
        ``bucketed_above`` partial rows, the bucketed int-key shuffle merge
        (``stages.reduce.bucketed_merge``) above it; only the (tiny)
        duplicate-hash set ever reaches the driver on the bucketed path;
     3. a second column-pruned scan filtered by the duplicate-hash set fetches
        the actual key strings, and an exact per-key recount eliminates 64-bit
        hash collisions (at 10^12 keys step 2 would use the 128-bit variant;
        collisions only cost extra verify work, never wrong output)."""
    keys = _UNIQ_KEYS
    # above the physical-core count, CAP the key-scan task concurrency —
    # unbounded stateless tasks rotate across every spawned worker process
    # and re-fault fresh arenas (the guest serializes page-fault zeroing).
    # A concurrency cap on plain tasks bounds the rotation without the
    # actor-pool spin-up that serialized against the concurrent
    # range/moments scans (measured: pools put the uniqueness tail at 10 s
    # @32 CPUs vs ~4 s capped-tasks); at ≤16 CPUs uncapped fused tasks win.
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    use_polars = _polars_available()  # decided once, on the driver
    heavy_kwargs: dict[str, Any] = (
        {"concurrency": min(8, max(4, ncpu // 4))} if ncpu > 16 else {}
    )
    import sys as _sys
    import time as _time

    _prof = os.environ.get("RTAD_PROFILE") == "1"
    _t = [_time.perf_counter()]

    def _umark(label: str) -> None:
        if _prof:
            now = _time.perf_counter()
            print(f"[uniq] {label}: {now - _t[0]:.2f}s", file=_sys.stderr,
                  flush=True)
            _t[0] = now

    partials = pre.map_batches(
        _prehashed_partial if pre_hashed else _HashPartialPool(use_polars),
        batch_format="pyarrow", batch_size=None, **heavy_kwargs,
    )
    if n_rows_hint is not None:
        # partial count ≤ input rows; the caller already knows the row count,
        # so skip the materialize-to-count barrier and let the partial stage
        # stream straight into whichever merge the bound selects (partials
        # are consumed exactly once either way)
        n_partials = n_rows_hint
    else:
        partials = partials.materialize()
        n_partials = partials.count()

    def merge_dups(g: pd.DataFrame) -> pd.DataFrame:
        a = g.groupby("h", sort=False).agg(
            n=("n", "sum"), part=("part", "min")
        ).reset_index()
        return a[a["n"] > 1]

    if n_partials > bucketed_above:
        # scale path: (h, n) pairs shuffle by hash-bucket of the int key —
        # all-Arrow (:func:`_dup_hashes_distributed`); the driver sees only
        # confirmed-duplicate hashes
        dup_h = to_arrow_single(_dup_hashes_distributed(partials))["h"]
        _umark("partials+bucketed_merge")
    else:
        dup_h = pa.array(
            merge_dups(to_arrow_single(partials).to_pandas())["h"]
            .to_numpy().astype("uint64"),
            pa.uint64(),
        )
        _umark("partials+driver_merge")
    if len(dup_h) == 0:
        return ray.data.from_arrow(_viol_table({c: [] for c in VIOLATION_COLS}))

    dup_hashes = dup_h.combine_chunks() if isinstance(
        dup_h, pa.ChunkedArray) else dup_h

    fetch_stage = ds.map_batches(
        _FetchCandidatesPool(dup_hashes, use_polars),
        batch_format="pyarrow", batch_size=None, **heavy_kwargs,
    )
    cand = to_arrow_single(fetch_stage).to_pandas()
    _umark("fetch_candidates")
    exact = cand.groupby(keys, sort=False).agg(
        n=("part", "size"), part=("part", "min")
    ).reset_index()
    bad = exact[exact["n"] > 1]
    tab = _viol_table(
        {
            "check": ["uniqueness"] * len(bad),
            "part": bad["part"].astype(int).tolist(),
            "repo": bad["repo"].tolist(),
            "path": bad["path"].tolist(),
            "commit": bad["commit"].tolist(),
            "value": bad["n"].astype(float).tolist(),
            "anomaly_type": ["uniqueness"] * len(bad),
            "note": [f"count:{int(n)}" for n in bad["n"]],
        }
    )
    return ray.data.from_arrow(tab)


def referential_violations(
    stats: pd.DataFrame, manifest_repos: set[str]
) -> pa.Table:
    """repo → repos-manifest integrity (north_star; SURVEY.md §2.4 J3). Runs
    on the already-aggregated (part, repo) table — an anti-join against the
    broadcast parent key set; value = offending row count."""
    bad = stats[~stats["repo"].isin(manifest_repos)]
    return _viol_table(
        {
            "check": ["referential"] * len(bad),
            "part": bad["part"].astype(int).tolist(),
            "repo": bad["repo"].tolist(),
            "value": bad["n"].astype(float).tolist(),
            "anomaly_type": ["referential"] * len(bad),
            "note": [f"repo not in manifest; rows:{int(x)}" for x in bad["n"]],
        }
    )


# ---------------------------------------------------------------------------
# Phase 3 — distribution gates on the (repo, part) aggregate
# ---------------------------------------------------------------------------

def gate_violations(
    stats: pd.DataFrame,
    cfg: ValidationConfig,
    global_max_part: int,
    manifest_repos: set[str] | None = None,
) -> "ray.data.Dataset":
    """z-score / IQR / drift-rate / staleness over each repo's per-part metric
    series (mean content_length), distributed ``groupby(repo).map_groups``.

    Per-repo semantics mirror the reference detectors exactly:
    * zscore: ``(m - avg) / stddevPop`` with IEEE div-by-zero (quirk Q4),
      flag ``|z| > t`` (``copy_z_score.pipe:38,55``)
    * iqr: ClickHouse ``quantileExact`` fences ± IQR·k (``copy_iqr.pipe:47-65``)
    * drift_rate: slope between consecutive parts, first part skipped
      (quirk Q5; ``copy_rate_of_change.pipe:30-41,58``)
    * staleness: newest part older than the cutoff (``copy_timeout.pipe:41``),
      note verbatim ``timestamp is time of last report``
    """
    stats_f = finish_moments(stats)
    if manifest_repos is not None:
        # gates only judge repos that exist; dangling repos are the
        # referential check's finding
        stats_f = stats_f[stats_f["repo"].isin(manifest_repos)]
    t = cfg.zscore_threshold
    k = cfg.iqr_multiplier
    max_slope = cfg.max_slope
    stale_parts = cfg.stale_parts

    def score_repo(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values("part", kind="mergesort")
        repo = g["repo"].iloc[0]
        m = g["mean_len"].to_numpy(dtype="float64")
        parts = g["part"].to_numpy(dtype="int64")
        rows: dict[str, list] = {c: [] for c in VIOLATION_COLS}

        def emit(check, part, value, atype, note):
            rows["check"].append(check)
            rows["part"].append(int(part))
            rows["repo"].append(repo)
            rows["path"].append("")
            rows["commit"].append("")
            rows["value"].append(float(value))
            rows["anomaly_type"].append(atype)
            rows["note"].append(note)
            rows["sha256"].append("")

        # --- staleness (timeout) ---
        if int(parts.max()) < global_max_part - stale_parts:
            emit("staleness", int(parts.max()), float(parts.max()),
                 "timeout", scalar.NOTE_TIMEOUT)

        # --- zscore gate ---
        avg = float(m.mean())
        std = float(np.sqrt(np.maximum((m * m).mean() - avg * avg, 0.0)))
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (m - avg) / std
        avg_r, std_r = scalar.round_half_even(avg, 2), scalar.round_half_even(std, 2)
        for part, mi, zi in zip(parts, m, z):
            if zi < -t or zi > t:
                emit("zscore", part, mi, "z-score",
                     scalar.note_z_score(zi, t, avg_r, std_r))

        # --- iqr gate (ClickHouse quantileExact semantics) ---
        if m.size:
            srt = np.sort(m)
            q1 = float(srt[scalar.ch_quantile_exact_index(srt.size, 0.25)])
            q3 = float(srt[scalar.ch_quantile_exact_index(srt.size, 0.75)])
            iqr_v = (q3 - q1) * k
            lo_b, hi_b = q1 - iqr_v, q3 + iqr_v
            for part, mi in zip(parts, m):
                if mi < lo_b or mi > hi_b:
                    emit("iqr", part, mi, "interquartile-range",
                         scalar.note_iqr(scalar.round_half_even(lo_b, 2),
                                         scalar.round_half_even(hi_b, 2)))

        # --- drift rate (lag within the series, first element skipped) ---
        if m.size >= 2:
            d_m = np.diff(m)
            d_p = np.diff(parts).astype("float64")
            slope = d_m / d_p
            for part, s_i, dv in zip(parts[1:], slope, d_m):
                if abs(s_i) > max_slope:
                    emit("drift_rate", part, s_i, "rate-of-change",
                         scalar.note_rate_of_change(s_i, max_slope, dv))

        return _viol_table(rows)

    def score_bucket(g: pd.DataFrame) -> pa.Table:
        tabs = [score_repo(gr) for _, gr in g.groupby("repo", sort=True)]
        ne = [x for x in tabs if x.num_rows]
        return (pa.concat_tables(ne) if ne
                else _viol_table({c: [] for c in VIOLATION_COLS}))

    if len(stats_f) <= GATES_DRIVER_BELOW:
        # driver fast path: the series table is (repos × parts) rows — a Ray
        # groupby here costs ~0.4 s of pure overhead at any CPU count (a
        # fixed cost that caps scaling efficiency); the identical score_repo
        # runs per repo in-process instead
        out = score_bucket(stats_f)
        return ray.data.from_arrow(out)
    # scale path: hash-bucket the repos and score every repo of a bucket in
    # ONE task (the stages.reduce discipline) — groupby(repo).map_groups
    # costs a Python task per distinct repo, ruinous at 10^5+ repos
    # (VERDICT r3 #4); each bucket task runs the same score_bucket the
    # driver path runs, so both wirings emit identical rows
    from ..stages.reduce import bucketed_merge

    sds = ray.data.from_arrow(
        pa.Table.from_pandas(stats_f.reset_index(drop=True),
                             preserve_index=False)
    )
    return bucketed_merge(sds, ["repo"], score_bucket)


#: stats-row count below which the gates run as a plain driver loop; above
#: it the hash-bucketed distributed path scores all repos of a bucket per
#: task — at 10^6 repos that is the right shape.
GATES_DRIVER_BELOW = 200_000


# ---------------------------------------------------------------------------
# Orchestration: run / resume
# ---------------------------------------------------------------------------

@dataclass
class RunResult:
    violations: pd.DataFrame
    verdicts: pd.DataFrame
    parts_scanned: list[int]
    parts_skipped: list[int]
    out_dir: str
    parts_quarantined: list[int] = field(default_factory=list)


def _stats_to_snapshot(stats: pd.DataFrame, part: int) -> list[dict[str, Any]]:
    sub = stats[stats["part"] == part]
    return [
        {"repo": r.repo, "n": int(r.n), "s": float(r.s), "s2": float(r.s2),
         "mn": float(r.mn), "mx": float(r.mx)}
        for r in sub.itertuples()
    ]


def _snapshot_to_stats(records: dict[int, dict]) -> pd.DataFrame:
    rows = []
    for part, rec in records.items():
        for s in rec.get("stats", []):
            rows.append({"part": part, "repo": s["repo"], "n": s["n"], "s": s["s"],
                         "s2": s["s2"], "mn": s["mn"], "mx": s["mx"]})
    return pd.DataFrame(rows, columns=["part", "repo", "n", "s", "s2", "mn", "mx"])


def run(
    corpus_dir: str,
    out_dir: str,
    cfg: ValidationConfig = ValidationConfig(),
    resume: bool = True,
) -> RunResult:
    """Full validation run with checkpoint/resume (see module docstring for the
    phase structure). Idempotent per partition: re-running overwrites
    ``out/violations/part=K/`` atomically and appends a superseding manifest
    record (last record wins)."""
    import sys
    import time as _time

    prof = os.environ.get("RTAD_PROFILE") == "1"
    _marks: list[tuple[str, float]] = [("start", _time.perf_counter())]

    def _mark(label: str) -> None:
        _marks.append((label, _time.perf_counter()))
        if prof:
            print(f"[validate] {label}: {_marks[-1][1] - _marks[-2][1]:.2f}s",
                  file=sys.stderr, flush=True)

    from .. import checks as check_registry

    unknown = [c for c in cfg.checks if c not in check_registry.REGISTRY]
    if unknown:
        raise ValueError(f"unknown checks {unknown}; registered: "
                         f"{sorted(check_registry.REGISTRY)}")
    os.makedirs(out_dir, exist_ok=True)
    parts = discover_parts(corpus_dir)
    # ---- phase 0: schema contract (metadata-only, runs FIRST) -------------
    # a partition violating the column contract is QUARANTINED: excluded
    # from the content/key scans (its malformed columns would crash them —
    # one corrupt partition must never kill the run), flagged by the schema
    # check, and its other per-part verdicts read "skipped". It writes no
    # manifest record, so a repaired file rescans on the next run.
    schema_tbl = (
        schema_violations(parts)
        if "schema" in cfg.checks
        else _viol_table({c: [] for c in VIOLATION_COLS})
    )
    quarantined: set[int] = (
        set(schema_tbl["part"].to_pylist()) if schema_tbl.num_rows else set()
    )
    # gates must never measure staleness against a partition that
    # contributed no data: the newest VALID part is the clock
    valid_parts = [p for p in parts if p not in quarantined]
    global_max_part = max(valid_parts) if valid_parts else max(parts)
    manifest = Manifest(out_dir)
    done = manifest.done_parts() if resume else {}
    if quarantined:
        # a previously-done part that NOW fails the contract must not keep
        # serving its pre-corruption stats/violations as if current —
        # supersede its manifest record so a repaired file rescans
        stale_done = sorted(p for p in quarantined if p in done)
        if stale_done:
            manifest.mark_quarantined_many(stale_done)
        done = {p: rec for p, rec in done.items() if p not in quarantined}
    if "null_rate" in cfg.checks:
        # a manifest written before the null_rate check existed lacks the
        # per-part null_stats snapshot — treat those parts as NOT done so
        # they are re-scanned (resume only skips work that was fully done
        # under the CURRENT check set; silently passing them would defeat
        # the very check meant to catch all-null partitions)
        done = {p: rec for p, rec in done.items()
                if "null_stats" in rec.get("metrics", {})}
    drift_on = bool({"psi_drift", "ks_drift"} & set(cfg.checks))
    hist_meta = {"w": float(cfg.drift_bin_width), "nb": int(cfg.drift_bins)}
    if drift_on:
        # same discipline as null_rate: a manifest written before the drift
        # gates existed lacks the per-part length histogram — rescan. The
        # snapshot also pins the BINNING PARAMS: a resume under a different
        # bin width/count must rescan, not reinterpret old counts on a new
        # grid (silently wrong PSI/KS otherwise)
        done = {p: rec for p, rec in done.items()
                if "length_hist" in rec.get("metrics", {})
                and rec["metrics"].get("length_hist_meta") == hist_meta}
    todo = sorted(p for p in parts if p not in done and p not in quarantined)
    skipped = sorted(p for p in parts if p in done)

    # ---- phase 2 (uniqueness) scheduling ----------------------------------
    # Fresh run (every part TODO): the fused derive pass already computed the
    # per-row key-triple hash (``keyh`` in the sparse light table), so the
    # uniqueness partials consume two int64 columns out of the object store
    # — the entire second corpus scan disappears, and the remaining int
    # group-count overlaps the range/moments consumers of the same
    # materialized table. (An earlier variant fed the key STRINGS from the
    # then-fat light table and was reverted — re-reading 2.6 GB of plasma
    # re-faulted every mmap page; with hashing fused into derive the feed is
    # ~6% of those bytes.)
    # Resume run: light only covers TODO parts but uniqueness must span the
    # corpus, so the key-only parquet scan runs, overlapped with phase 1 in
    # a background thread (different columns, no dependency — ~the whole
    # key-scan latency hides behind the content pass).
    import threading

    # Fresh-run alternative wiring (RTAD_UNIQ_FROM_LIGHT=1, opt-in): derive
    # also emits a per-row key-triple hash and uniqueness feeds off the
    # materialized light table, deleting the second corpus scan. Measured
    # SLOWER here at every CPU count (p192 @16: 894k vs 965k files/s;
    # @4: 396k vs 436k) because the overlapped column-pruned key scan hides
    # entirely under the content pass while the light feed serializes after
    # it — kept as a wiring for storage-constrained deployments where a
    # second scan has real cost (object stores billed per byte read).
    uniq_from_light = (len(done) == 0 and len(todo) > 0
                       and os.environ.get("RTAD_UNIQ_FROM_LIGHT") == "1")
    uniq_result: dict[str, Any] = {}
    uniq_pre = None
    uniq_hint: int | None = None
    # dataset CONSTRUCTION happens on the main thread (read_parquet's
    # lazy fsspec imports are not thread-safe on first touch); only
    # execution runs in the background thread
    uniq_files = [f for p, frags in parts.items() if p not in quarantined
                  for f in frags]
    uniq_keys_ds = None
    if not uniq_files:
        pass  # every partition quarantined: uniqueness has nothing to scan
    elif uniq_from_light:
        _, uniq_keys_ds = _uniq_reads(uniq_files)  # candidate-fetch side only
    else:
        uniq_pre, uniq_keys_ds = _uniq_reads(uniq_files)

    def _run_uniqueness() -> None:
        if not uniq_files:
            uniq_result["table"] = _viol_table({c: [] for c in VIOLATION_COLS})
            return
        try:
            # collected as ARROW: the pandas view is derived at join time,
            # and the arrow table feeds the streamed global write directly
            uniq_result["table"] = to_arrow_single(
                _uniqueness_from_datasets(uniq_pre, uniq_keys_ds,
                                          n_rows_hint=uniq_hint,
                                          pre_hashed=uniq_from_light)
            )
        except Exception as e:  # surfaced at join time
            uniq_result["error"] = e

    # RTAD_SEQ_UNIQ=1 runs the key-only scan AFTER the content pass instead
    # of overlapped — a measurement knob for boxes where concurrent streams
    # contend rather than pipeline
    seq_uniq = os.environ.get("RTAD_SEQ_UNIQ") == "1"
    uniq_thread = threading.Thread(target=_run_uniqueness, daemon=True)
    if not seq_uniq and not uniq_from_light:
        uniq_thread.start()

    # ---- phase 1: content pass over TODO partitions ----------------------
    new_stats = pd.DataFrame(columns=["part", "repo", "n", "s", "s2", "mn", "mx"])
    part_rows: dict[int, int] = {p: r.get("n_rows", 0) for p, r in done.items()}
    if todo:
        files = [f for p in todo for f in parts[p]]
        # one block per input file → the read op fuses with derive, so the
        # heavy content bytes never enter the object store; only the light
        # projection (~2% of bytes) is materialized
        ds = ray.data.read_parquet(files, override_num_blocks=len(files))
        import ray as _ray

        ncpu = int(_ray.cluster_resources().get("CPU", 8))
        if ncpu > 16 or os.environ.get("RTAD_DERIVE_POOL") == "1":
            # Beyond the physical-core count, stateless decode tasks rotate
            # across every spawned worker process and each process re-faults
            # a fresh arena (this guest serializes page-fault zeroing) —
            # measured 13-23 s vs 5-6 s at 32 CPUs (52 s with merely a
            # concurrency CAP: capping in-flight tasks does not pin them to
            # a bounded process set). A FIXED actor pool pins the heavy
            # decode to warm processes (the "state" is the resident
            # allocator arena).
            light = ds.map_batches(_DerivePool, batch_format="pyarrow",
                                   batch_size=None,
                                   fn_constructor_args=(cfg.min_len,
                                                        cfg.max_len,
                                                        _polars_available(),
                                                        uniq_from_light),
                                   concurrency=min(16, max(8, ncpu // 2)))
        else:
            light = ds.map_batches(make_derive_fused(cfg.min_len, cfg.max_len,
                                                     _polars_available(),
                                                     uniq_from_light),
                                   batch_format="pyarrow", batch_size=None)
        # materialize once: range violations + moments both consume it
        light = light.materialize()
        _mark("derive+materialize")
        if uniq_from_light:
            # uniqueness partials feed off the in-memory (keyh, part) columns
            # — no second corpus read; overlaps the range/moments consumers
            uniq_pre = light.select_columns(["keyh", "part"])
            uniq_hint = light.count()
            if not seq_uniq:
                uniq_thread.start()
        # range violations and moments are independent consumers of the
        # materialized light table — overlap them in threads
        rv_box: dict[str, Any] = {}

        def _run_range() -> None:
            try:
                rv_box["t"] = to_arrow_single(range_violations(light, cfg)).to_pandas()
            except Exception as e:
                rv_box["e"] = e

        rv_thread = threading.Thread(target=_run_range, daemon=True)
        rv_thread.start()
        # the drift histogram is another independent consumer of the
        # materialized light table — overlap it too (a serialized fourth
        # pass would reintroduce exactly the fixed per-pass cost the fused
        # scan below exists to avoid)
        hist_box: dict[str, Any] = {}

        def _run_hist() -> None:
            try:
                hist_box["t"] = length_hist(light, cfg)
            except Exception as e:
                hist_box["e"] = e

        hist_thread = None
        if drift_on:
            hist_thread = threading.Thread(target=_run_hist, daemon=True)
            hist_thread.start()
        # moments + lang histogram + null rates fused into one scan (three
        # separate passes before; the fixed per-pass cost capped 4→16 scaling)
        new_stats, new_lang, new_null = combined_light_stats(light, cfg)
        if hist_thread is not None:
            hist_thread.join()
            if "e" in hist_box:
                raise hist_box["e"]
        new_hist = hist_box.get("t", pd.DataFrame(columns=["part", "bin", "n"]))
        rv_thread.join()
        if "e" in rv_box:
            raise rv_box["e"]
        rv = rv_box["t"]
        _mark("range+moments")
        import shutil
        from concurrent.futures import ThreadPoolExecutor

        def _write_part(p: int) -> tuple[int, int]:
            """Atomic per-partition violations write (parquet releases the
            GIL, so the 48 writes overlap in threads instead of serializing
            on the driver — a fixed per-run cost at any CPU count)."""
            pv = rv[rv["part"] == p] if len(rv) else rv
            pdir = os.path.join(out_dir, "violations", f"part={p}")
            tmp = pdir + ".tmp"
            os.makedirs(tmp, exist_ok=True)
            pq.write_table(
                pa.Table.from_pandas(pv.reset_index(drop=True), preserve_index=False)
                if len(pv) else _viol_table({c: [] for c in VIOLATION_COLS}),
                os.path.join(tmp, "violations.parquet"),
            )
            if os.path.exists(pdir):
                shutil.rmtree(pdir)
            os.replace(tmp, pdir)
            return p, len(pv)

        with ThreadPoolExecutor(max_workers=8) as ex:
            n_viol = dict(ex.map(_write_part, todo))
        # manifest records append (one batched fsync) AFTER the data is
        # durably in place (a record must never precede its partition's files)
        recs = []
        for p in todo:
            n_rows = int(new_stats[new_stats["part"] == p]["n"].sum())
            part_rows[p] = n_rows
            lang_snap = [
                {"lang": r.lang, "n": int(r.n)}
                for r in new_lang[new_lang["part"] == p].itertuples()
            ]
            nrow = new_null[new_null["part"] == p]
            null_snap = (
                {"n": int(nrow["n"].iloc[0]), "n_null": int(nrow["n_null"].iloc[0]),
                 # XOR fingerprint of every row's content sha256 (first 8
                 # bytes) — the per-partition lineage record of the per-row
                 # hash invariant
                 "sha_xor": int(nrow["sha_xor"].iloc[0])
                 if "sha_xor" in nrow.columns else 0}
                if len(nrow) else {"n": 0, "n_null": 0, "sha_xor": 0}
            )
            metrics = {"n_range_violations": n_viol[p],
                       "lang_counts": lang_snap,
                       "null_stats": null_snap}
            if drift_on:
                metrics["length_hist"] = [
                    {"bin": int(r.bin), "n": int(r.n)}
                    for r in new_hist[new_hist["part"] == p].itertuples()
                ]
                metrics["length_hist_meta"] = hist_meta
            recs.append(dict(
                part=p, fragments=parts[p], n_rows=n_rows,
                stats_snapshot=_stats_to_snapshot(new_stats, p),
                metrics=metrics,
            ))
        manifest.mark_done_many(recs)

    _mark("per-part writes+manifest")

    # ---- resume: merge stats snapshots of DONE partitions -----------------
    old_stats = _snapshot_to_stats(done)
    non_empty = [s for s in (old_stats, new_stats) if len(s)]
    stats = (
        pd.concat(non_empty, ignore_index=True) if non_empty else new_stats
    )
    old_lang = pd.DataFrame(
        [
            {"part": p, "lang": d["lang"], "n": d["n"]}
            for p, rec in done.items()
            for d in rec.get("metrics", {}).get("lang_counts", [])
        ],
        columns=["part", "lang", "n"],
    )
    lang_non_empty = [x for x in (old_lang, new_lang if todo else old_lang.iloc[0:0])
                      if len(x)]
    lang_stats = (
        pd.concat(lang_non_empty, ignore_index=True)
        if lang_non_empty
        else pd.DataFrame(columns=["part", "lang", "n"])
    )
    old_null = pd.DataFrame(
        [
            {"part": p, **rec.get("metrics", {}).get("null_stats",
                                                     {"n": 0, "n_null": 0})}
            for p, rec in done.items()
        ],
        columns=["part", "n", "n_null"],
    )
    null_non_empty = [x for x in (old_null, new_null if todo else old_null.iloc[0:0])
                      if len(x)]
    null_stats = (
        pd.concat(null_non_empty, ignore_index=True)
        if null_non_empty
        else pd.DataFrame(columns=["part", "n", "n_null"])
    )
    old_hist = pd.DataFrame(
        [
            {"part": p, "bin": d["bin"], "n": d["n"]}
            for p, rec in done.items()
            for d in rec.get("metrics", {}).get("length_hist", [])
        ],
        columns=["part", "bin", "n"],
    )
    hist_non_empty = [x for x in (old_hist, new_hist if todo else old_hist.iloc[0:0])
                      if len(x)]
    hist = (
        pd.concat(hist_non_empty, ignore_index=True)
        if hist_non_empty
        else pd.DataFrame(columns=["part", "bin", "n"])
    )

    # ---- phase 2: join the concurrent key-only scan -----------------------
    if seq_uniq:
        uniq_thread.start()
    uniq_thread.join()
    if "error" in uniq_result:
        raise uniq_result["error"]
    uniq_tbl = uniq_result["table"]
    uniq = uniq_tbl.to_pandas()
    _mark("uniqueness")
    manifest_repos = set(
        pq.read_table(os.path.join(corpus_dir, "repos.parquet"))["repo"].to_pylist()
    )
    ref_tbl = referential_violations(stats, manifest_repos)
    ref = ref_tbl.to_pandas()

    # ---- phase 3: gates ----------------------------------------------------
    gates_ds = gate_violations(stats, cfg, global_max_part,
                               manifest_repos).materialize()
    gates = to_arrow_single(gates_ds).to_pandas()
    if "lang_zscore" in cfg.checks or "lang_iqr" in cfg.checks:
        lang_tbl = lang_gate_violations(lang_stats, cfg)
        allowed = [c for c in ("lang_zscore", "lang_iqr") if c in cfg.checks]
        lang_tbl = lang_tbl.filter(
            pc.is_in(lang_tbl["check"], value_set=pa.array(allowed, pa.string()))
        )
    else:
        lang_tbl = _viol_table({c: [] for c in VIOLATION_COLS})
    lang_gates = lang_tbl.to_pandas()
    null_tbl = (
        null_rate_violations(null_stats, cfg)
        if "null_rate" in cfg.checks
        else _viol_table({c: [] for c in VIOLATION_COLS})
    )
    null_gates = null_tbl.to_pandas()
    drift_tbl = (
        drift_gate_violations(hist, lang_stats, cfg)
        if drift_on or "chi2_drift" in cfg.checks
        else _viol_table({c: [] for c in VIOLATION_COLS})
    )
    drift_gates = drift_tbl.to_pandas()
    schema_v = schema_tbl.to_pandas()  # computed in phase 0
    _mark("gates")

    # ---- assemble ----------------------------------------------------------
    extra = [f for f in (lang_gates, null_gates, drift_gates, schema_v)
             if len(f)]
    gates = pd.concat([gates, *extra], ignore_index=True) if extra else gates
    range_paths = [
        os.path.join(out_dir, "violations", f"part={p}", "violations.parquet")
        for p in sorted(parts) if p not in quarantined
    ]
    range_frames = [pq.read_table(rp).to_pandas() for rp in range_paths
                    if os.path.exists(rp)]
    range_df = (
        # quarantined parts never scanned, so never wrote a per-part file
        pd.concat(range_frames, ignore_index=True)
        if range_frames
        else _viol_table({c: [] for c in VIOLATION_COLS}).to_pandas()
    )
    frames = [f for f in (range_df, uniq, ref, gates) if len(f)]
    violations = (
        pd.concat(frames, ignore_index=True)[VIOLATION_COLS]
        if frames
        else _viol_table({c: [] for c in VIOLATION_COLS}).to_pandas()
    )
    # global (non-per-part) violations are WRITTEN from a Dataset union —
    # blocks stream straight to parquet without a second driver-side concat
    # copy, so an adversarial all-violating corpus lands in the object
    # store, not driver RAM (VERDICT r3 #6). The returned DataFrame above
    # remains the (by-design small) driver surface.
    gdir = os.path.join(out_dir, "violations", "global")
    tmp = gdir + ".tmp"
    # a crashed prior run leaves uuid-named parquet blocks in the .tmp dir;
    # write_parquet APPENDS new uuid files next to them, so the publish
    # below would ship stale rows — start from an empty staging dir
    import shutil as _shutil

    _shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pieces = [gates_ds] + [
        ray.data.from_arrow(t)
        for t in (uniq_tbl, ref_tbl, lang_tbl, null_tbl, drift_tbl,
                  schema_tbl)
        if t.num_rows
    ]
    global_ds = pieces[0].union(*pieces[1:]) if len(pieces) > 1 else pieces[0]
    if global_ds.count():
        global_ds.write_parquet(tmp)
    else:
        pq.write_table(_viol_table({c: [] for c in VIOLATION_COLS}),
                       os.path.join(tmp, "violations.parquet"))
    if os.path.exists(gdir):
        import shutil

        shutil.rmtree(gdir)
    os.replace(tmp, gdir)

    # ---- verdicts: one per (part, check) ----------------------------------
    vio_counts = (
        violations.groupby(["part", "check"]).size().rename("n_violations").reset_index()
        if len(violations)
        else pd.DataFrame(columns=["part", "check", "n_violations"])
    )
    grid = pd.MultiIndex.from_product(
        [sorted(parts), list(cfg.checks)], names=["part", "check"]
    ).to_frame(index=False)
    verdicts = grid.merge(vio_counts, on=["part", "check"], how="left")
    verdicts["n_violations"] = verdicts["n_violations"].fillna(0).astype("int64")
    verdicts["status"] = np.where(verdicts["n_violations"] > 0, "fail", "pass")
    if quarantined:
        # a quarantined part's non-schema checks never ran — saying "pass"
        # would be a lie; "skipped" is the honest verdict
        qmask = verdicts["part"].isin(quarantined) & (verdicts["check"] != "schema")
        verdicts.loc[qmask, "status"] = "skipped"
    verdicts["n_checked"] = verdicts["part"].map(lambda p: part_rows.get(p, 0)).astype("int64")
    verdicts = verdicts[["part", "check", "status", "n_checked", "n_violations"]]
    _mark("assemble")
    pq.write_table(
        pa.Table.from_pandas(verdicts, preserve_index=False),
        os.path.join(out_dir, "verdicts.parquet"),
    )
    return RunResult(
        violations=violations.reset_index(drop=True),
        verdicts=verdicts,
        parts_scanned=todo,
        parts_skipped=skipped,
        out_dir=out_dir,
        parts_quarantined=sorted(quarantined),
    )
