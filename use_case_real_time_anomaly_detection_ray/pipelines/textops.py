"""Training-data text operators as Ray Data pipelines: exact dedup,
MinHash-LSH / SimHash / n-gram-Jaccard near-dedup, language ID, quality
scoring, token counting, document fingerprinting.

Execution shapes (ray_guide 'Aggregation at scale' patterns):

* exact dedup — content-hash column in a vectorized ``map_batches``, then the
  partial-reduce keep-min-id (same machinery as the reference's
  ``LIMIT 1 BY`` dedup, ``dedup_log.pipe:6``);
* MinHash-LSH — per-batch signatures → explode to (band, band_hash, doc) rows
  → ``groupby(band, band_hash)`` buckets → candidate pairs → exact-Jaccard
  verify → union-find clustering. The signature stage runs as stateless tasks
  with a per-process permutation-table cache (:func:`minhash_explode`);
* the pair-verify step broadcasts the shingle sets of candidate docs only
  (candidates ≪ corpus); at larger candidate volumes swap in the bucketed
  join (``stages.join.bucketed_join``) — noted per function.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions import text as T
from ..stages.join import _fetch
from ..stages.reduce import grouped_agg, latest_by_key, to_arrow_single


def _bucket_pairs(exploded: "ray.data.Dataset", bucket_keys: list[str],
                  id_col: str) -> pd.DataFrame:
    """(a, b) candidate pairs of ids sharing an exact LSH bucket, computed per
    key-hash group (vectorized within the group — one Python call per hash
    bucket, not per LSH bucket; most LSH buckets are singletons and are
    filtered out vectorized before any pair loop runs)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(bucket_keys + [id_col])
        sz = g.groupby(bucket_keys, sort=False)[id_col].transform("size")
        dup = g[sz > 1].sort_values(bucket_keys + [id_col], kind="mergesort")
        a_out, b_out = [], []
        for _, grp in dup.groupby(bucket_keys, sort=False):
            ids = grp[id_col].tolist()
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
        return pd.DataFrame({"a": a_out, "b": b_out})

    pairs = grouped_agg(exploded, bucket_keys, lambda df: df, merge)
    return pairs.to_pandas()

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
                    bands: int, shingle_k: int) -> pa.Table:
    """Shingle + MinHash signature per row, exploded into (band, band_hash,
    id) rows for the LSH bucket groupby."""
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
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n), pa.int32()),
            "band_hash": pa.array((bh >> np.uint64(1)).astype(np.int64).ravel(),
                                  pa.int64()),
            id_col: batch[id_col].take(pa.array(idx)),
        }
    )


def lsh_candidate_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> pd.DataFrame:
    """(a, b) candidate pairs sharing ≥1 LSH bucket. The bucket groupby is the
    only shuffle and moves (band, hash, id) triples — never text."""
    import functools

    exploded = ds.map_batches(
        functools.partial(minhash_explode, id_col=id_col, text_col=text_col,
                          num_perm=num_perm, bands=bands, shingle_k=shingle_k),
        batch_format="pyarrow",
    )
    cand = _bucket_pairs(exploded, ["band", "band_hash"], id_col)
    return cand.drop_duplicates(["a", "b"]).reset_index(drop=True)


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

    Convergence is detected from ``sum(labels)``: labels only ever decrease,
    so a stable sum (one tiny aggregate per round) means a fixed point."""
    import ray.data as rd

    from ..stages.reduce import bucketed_merge

    if isinstance(pairs, pd.DataFrame):
        pairs = rd.from_arrow(
            pa.table({"a": pa.array(pairs["a"]), "b": pa.array(pairs["b"])})
        )

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

    def _label_sum(lab) -> int:
        """Fixpoint detector: wrapping sum of per-row label hashes (type
        generic — works for string ids too). Labels are per-node monotone
        non-increasing, so the label MULTISET is stable iff the assignment
        is; an order-independent hash sum detects that."""
        import polars as pl

        tot = 0
        for t in ray.get(lab.to_arrow_refs()):
            if not isinstance(t, pa.Table):
                t = pa.Table.from_pandas(t, preserve_index=False)
            if t.num_rows:
                h = pl.from_arrow(t.select(["label"])).hash_rows(seed=0).sum()
                tot = (tot + int(h)) & ((1 << 64) - 1)
        return tot

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
    return labels


def _assign_clusters_distributed(
    ds: "ray.data.Dataset", id_col: str, labels: "ray.data.Dataset",
) -> "ray.data.Dataset":
    """Scale-path (id, cluster_id, keep) assignment, join-free: union the id
    stream with the propagated label stream, bucket by key hash, and fill
    each id's cluster from its (co-located) label row — ids in no pair keep
    themselves. Everything stays distributed; nothing proportional to the
    corpus touches the driver."""
    from ..stages.reduce import bucketed_merge

    def ids_stream(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        return pa.table({"key": ids,
                         "val": ids,
                         "kind": pa.nulls(len(ids), pa.int8()).fill_null(0)})

    def lab_stream(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["node"].combine_chunks(),
                         "val": t["label"].combine_chunks(),
                         "kind": pa.nulls(t.num_rows, pa.int8()).fill_null(1)})

    stream = ds.select_columns([id_col]).map_batches(
        ids_stream, batch_format="pyarrow"
    ).union(labels.map_batches(lab_stream, batch_format="pyarrow"))

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        labm = g[g["kind"] == 1].groupby("key")["val"].min()
        ids = g[g["kind"] == 0]["key"]
        cluster = ids.map(labm).fillna(ids)
        return pd.DataFrame(
            {
                id_col: ids.to_numpy(),
                "cluster_id": cluster.to_numpy(),
                "keep": ids.to_numpy() == cluster.to_numpy(),
            }
        )

    return bucketed_merge(stream, ["key"], assign)


def _assign_clusters(ds: "ray.data.Dataset", id_col: str,
                     cluster_map: dict) -> "ray.data.Dataset":
    """Distributed (id, cluster_id, keep) assignment. Only the cluster map —
    docs that belong to some verified near-dup pair, ≪ corpus — is broadcast
    (``ray.put`` once, fetched once per worker process); the full id column
    never touches the driver and the result stays a streaming Dataset."""
    ref = ray.put(cluster_map)

    def assign(t: pa.Table) -> pa.Table:
        cl = _fetch(ref)
        ids = t[id_col].to_pylist()
        cluster = [cl.get(i, i) for i in ids]
        return pa.table(
            {
                id_col: t[id_col],
                "cluster_id": pa.array(cluster, t[id_col].type),
                "keep": pa.array([c == i for i, c in zip(ids, cluster)], pa.bool_()),
            }
        )

    return ds.select_columns([id_col]).map_batches(assign, batch_format="pyarrow")


def _candidate_shingles(
    ds: "ray.data.Dataset", id_col: str, text_col: str,
    cand_ids: set, shingle_k: int,
) -> dict:
    """Shingle sets for candidate docs ONLY, via a filtered distributed pass
    (``is_in`` against the broadcast candidate-id set) — the corpus text never
    reaches the driver; the gathered table is O(|candidates|)."""
    id_arr = pa.array(list(cand_ids))

    def shingles_of(t: pa.Table) -> pa.Table:
        mask = pa.compute.is_in(t[id_col], value_set=id_arr)
        sub = t.filter(mask)
        return pa.table(
            {
                id_col: sub[id_col],
                "sh": pa.array(
                    [T.word_shingles(x, shingle_k).tolist()
                     for x in sub[text_col].to_pylist()],
                    pa.list_(pa.uint64()),
                ),
            }
        )

    shing = to_arrow_single(
        ds.map_batches(shingles_of, batch_format="pyarrow")
    )
    return {i: np.asarray(sh, dtype=np.uint64)
            for i, sh in zip(shing[id_col].to_pylist(), shing["sh"].to_pylist())}


def minhash_dedup(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    distributed_cluster_above: int = CLUSTER_DISTRIBUTED_ABOVE,
) -> "ray.data.Dataset":
    """Full MinHash-LSH dedup: a Dataset of (id, cluster_id, keep) for every
    doc. Verification recomputes exact Jaccard for candidate pairs from the
    candidate-only shingle fetch (:func:`_candidate_shingles`); clustering is
    driver union-find + broadcast map for small verified-pair sets, and
    fully distributed label propagation (:func:`propagate_clusters`) above
    ``distributed_cluster_above`` pairs — no full-corpus driver
    materialization on either path."""
    cand = lsh_candidate_pairs(ds, id_col, text_col, num_perm, bands, shingle_k)
    if len(cand):
        smap = _candidate_shingles(
            ds, id_col, text_col, set(cand["a"]) | set(cand["b"]), shingle_k
        )
        jac = np.array(
            [T.jaccard(smap[a], smap[b]) for a, b in zip(cand["a"], cand["b"])]
        )
        verified = cand[jac >= threshold]
    else:
        verified = cand
    if len(verified) > distributed_cluster_above:
        return _assign_clusters_distributed(ds, id_col, propagate_clusters(verified))
    return _assign_clusters(ds, id_col, _clusters_from_pairs(verified))


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
) -> "ray.data.Dataset":
    """Near-dup clusters via SimHash banding: 4 bands of 16 bits — any pair
    within Hamming distance ≤3 shares at least one band exactly (pigeonhole);
    verify candidates by true Hamming distance. Returns a Dataset of
    (id, cluster_id, keep).

    The (id, simhash) projection — 16 bytes/doc, the only thing derived from
    text — is materialized ONCE in the object store (distributed, spillable)
    and reused for the band explode, the candidate-only hash fetch, and the
    cluster assignment, so the corpus text is hashed exactly once and never
    reaches the driver."""
    tbl = simhash_table(ds, id_col, text_col).materialize()

    def explode(t: pa.Table) -> pa.Table:
        n = t.num_rows
        h = t["simhash"].to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        idx = np.repeat(np.arange(n), 4)
        bands = np.tile(np.arange(4, dtype=np.int32), n)
        keys = ((h[idx] >> (np.uint64(16) * bands.astype(np.uint64)))
                & np.uint64(0xFFFF)).astype(np.int32)
        return pa.table({"band": pa.array(bands, pa.int32()),
                         "key": pa.array(keys, pa.int32()),
                         id_col: t[id_col].take(pa.array(idx))})

    cand = _bucket_pairs(
        tbl.map_batches(explode, batch_format="pyarrow"), ["band", "key"], id_col
    ).drop_duplicates(["a", "b"])
    if len(cand):
        cand_arr = pa.array(list(set(cand["a"]) | set(cand["b"])))
        sub = to_arrow_single(
            tbl.map_batches(
                lambda t: t.filter(pa.compute.is_in(t[id_col], value_set=cand_arr)),
                batch_format="pyarrow",
            )
        )
        hmap = dict(zip(sub[id_col].to_pylist(), sub["simhash"].to_pylist()))
        mask64 = (1 << 64) - 1
        hd = np.array([T.hamming64(hmap[a] & mask64, hmap[b] & mask64)
                       for a, b in zip(cand["a"], cand["b"])])
        verified = cand[hd <= max_hamming]
    else:
        verified = cand
    if len(verified) > distributed_cluster_above:
        return _assign_clusters_distributed(tbl, id_col, propagate_clusters(verified))
    return _assign_clusters(tbl, id_col, _clusters_from_pairs(verified))


def ngram_jaccard_pairs(
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    **lsh_kwargs,
) -> pd.DataFrame:
    """(a, b, jaccard) for pairs with exact word-n-gram Jaccard ≥ threshold,
    candidate-pruned by MinHash-LSH (the scale path — no O(n²) scan). Shingle
    sets are fetched for candidate docs only (:func:`_candidate_shingles`);
    the returned pair list is small by construction."""
    cand = lsh_candidate_pairs(ds, id_col, text_col, shingle_k=shingle_k, **lsh_kwargs)
    if not len(cand):
        return pd.DataFrame(columns=["a", "b", "jaccard"])
    smap = _candidate_shingles(
        ds, id_col, text_col, set(cand["a"]) | set(cand["b"]), shingle_k
    )
    jac = np.array([T.jaccard(smap[a], smap[b]) for a, b in zip(cand["a"], cand["b"])])
    out = cand.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


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
