"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the (pre-normalized) query matrix is
broadcast once (``ray.put``), each batch does one numpy matmul against it
(vectorized, zero-copy Arrow list column → contiguous ndarray), and per-batch
top-k partials are merged driver-side (O(queries × k × blocks) rows — never
the score matrix). Scale path: LSH-bucketed variant (random-hyperplane signs
prune which base vectors each query scores), plus embedding-cosine
near-duplicate pairs via distributed block-pair scoring.

All stages run as STATELESS TASKS with a per-process broadcast cache
(``stages.join._fetch``) — an autoscaling actor pool starting at 1 actor never
catches up on a seconds-long stage (measured 0.51→1.03 scaling efficiency
going pool→tasks, BENCH/BASELINE.md).
"""

from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..stages.join import _fetch

import logging

_LOG = logging.getLogger(__name__)

#: Rows per LSH (band, sig) segment above which pair scoring truncates to
#: the smallest ids with a logged drop — one segment of 10^5 identical
#: embeddings would otherwise matmul O(seg²) (~80 GB) inside a single task.
#: Mirrors ``textops.MAX_LSH_BUCKET``.
MAX_ANN_SEGMENT = 20_000

#: Row-chunk for the within-segment cosine matmul: peak memory is
#: O(chunk × segment) = ~80 MB at the segment cap instead of O(segment²).
_ANN_SCORE_CHUNK = 512


def _list_col_to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Arrow list<float> (or Ray's tensor extension array) → (n, d) float64
    ndarray without per-row Python on the parquet path."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    try:
        values = np.asarray(col.values, dtype=np.float64)  # list<float>: zero-copy flat
        return values.reshape(len(col), -1)
    except AttributeError:
        # Ray ArrowTensorArray (from_pandas with ndarray cells) has no .values
        return np.stack([np.asarray(x, dtype=np.float64) for x in col.to_pylist()])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_partial(t: pa.Table, qref, id_col: str, emb_col: str, k: int) -> pa.Table:
    """Stateless per-batch scorer: cosine against the broadcast normalized
    query matrix, emitting this batch's per-query top-k partial."""
    query_ids, qn = _fetch(qref)
    if t.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    base = _list_col_to_matrix(t[emb_col])
    bn = _normalize(base)
    ids = np.asarray(t[id_col].to_pylist())
    cos = qn @ bn.T  # (m, batch)
    k = min(k, cos.shape[1])
    idx = np.argpartition(-cos, kth=k - 1, axis=1)[:, :k]
    out_q, out_id, out_cos = [], [], []
    for qi in range(cos.shape[0]):
        out_q.extend([query_ids[qi]] * k)
        out_id.extend(ids[idx[qi]].tolist())
        out_cos.extend(cos[qi, idx[qi]].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_cos, pa.float64()),
        }
    )


def _merge_topk(partials: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver merge of per-block top-k partials; ties on cosine break by
    ascending vec_id (deterministic)."""
    return (
        partials.sort_values(["query_id", "cosine", "vec_id"],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )


def brute_force_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k per query: batch-local top-k partials → driver merge
    (partials are (queries × k × blocks) rows — never the full score matrix)."""
    qref = ray.put((np.asarray(query_ids),
                    _normalize(np.asarray(query_matrix, dtype=np.float64))))
    partials = ds.map_batches(
        functools.partial(_topk_partial, qref=qref, id_col=id_col,
                          emb_col=emb_col, k=k),
        batch_format="pyarrow",
    ).to_pandas()
    return _merge_topk(partials, k)


def embedding_self_topk(
    ds: "ray.data.Dataset",
    n_queries: int = 5,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Self-search: the first ``n_queries`` vectors (by id) query the whole
    table."""
    head = (
        ds.sort(id_col).limit(n_queries).to_pandas()
    )
    qids = head[id_col].to_numpy()
    qm = np.stack([np.asarray(e, dtype=np.float64) for e in head[emb_col]])
    return brute_force_topk(ds, qids, qm, k=k, id_col=id_col, emb_col=emb_col)


# --------------------------------------------------------------------------
# LSH-bucketed variant (scale path)
# --------------------------------------------------------------------------

def _lsh_partial(t: pa.Table, bref, id_col: str, emb_col: str, k: int,
                 n_planes: int, n_bands: int) -> pa.Table:
    """Stateless per-batch LSH scorer: band-signature each base vector, then
    for every query score only the rows sharing ≥1 band bucket with it
    (multi-band OR-construction) and emit that batch's per-query top-k
    partial. All scoring stays inside the task — the driver only merges
    (queries × k × blocks) partial rows."""
    query_ids, qn, qsig, planes, weights = _fetch(bref)
    if t.num_rows == 0:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         "vec_id": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    m = _list_col_to_matrix(t[emb_col])
    sig = (m @ planes > 0).reshape(len(m), n_bands, n_planes) @ weights
    ids = np.asarray(t[id_col].to_pylist())
    # (n, queries): does base row share any band bucket with the query?
    match = (sig[:, None, :] == qsig[None, :, :]).any(axis=2)
    out_q, out_id, out_cos = [], [], []
    for qi in range(qn.shape[0]):
        rows = np.flatnonzero(match[:, qi])
        if rows.size == 0:
            continue
        bn = _normalize(m[rows])
        cos = qn[qi] @ bn.T
        kk = min(k, rows.size)
        top = np.argpartition(-cos, kth=kk - 1)[:kk]
        out_q.extend([query_ids[qi]] * kk)
        out_id.extend(ids[rows[top]].tolist())
        out_cos.extend(cos[top].tolist())
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_id, pa.int64()),
            "cosine": pa.array(out_cos, pa.float64()),
        }
    )


def lsh_bucket_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    n_bands: int = 1,
    seed: int = 13,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: ``n_bands`` random-hyperplane signature bands of
    ``n_planes`` bits each; only base vectors sharing ≥1 band bucket with a
    query are scored — expected scan fraction ≈ n_bands/2^n_planes, per-pair
    recall 1-(1-p^r)^L. The scale path where the brute-force matmul is
    infeasible; tune (r, L) to the recall/scan trade-off (r=8, L=1 scans
    ~0.4%; r=4, L=8 scans ~40% with recall ~0.9 on near-orthogonal data).
    Scoring happens inside ``map_batches`` (per-block top-k partials, same
    merge as :func:`brute_force_topk`); nothing but partials reaches the
    driver. Deterministic given the seed."""
    q = np.asarray(query_matrix, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(q.shape[1], n_bands * n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)
    qsig = (q @ planes > 0).reshape(len(q), n_bands, n_planes) @ weights
    bref = ray.put((np.asarray(query_ids), _normalize(q), qsig, planes, weights))
    partials = ds.map_batches(
        functools.partial(_lsh_partial, bref=bref, id_col=id_col,
                          emb_col=emb_col, k=k, n_planes=n_planes,
                          n_bands=n_bands),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["query_id", "vec_id", "cosine"])
    return _merge_topk(partials, k)


# --------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (exact, distributed block-pair scan)
# --------------------------------------------------------------------------

@ray.remote
def _block_pair_scores(ta: pa.Table, tb: pa.Table | None, threshold: float,
                       id_col: str, emb_col: str) -> pa.Table:
    """Score one block (self mode, ``tb is None``) or one block pair for
    cosine ≥ threshold; emit (a, b, cosine) with a < b. Runs as a Ray task —
    blocks stream from the object store, pairs (tiny) return to the driver."""
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if ta.num_rows == 0 or (tb is not None and tb.num_rows == 0):
        return empty
    ma = _normalize(_list_col_to_matrix(ta[emb_col]))
    ia = np.asarray(ta[id_col].to_pylist())
    if tb is None:
        cos = ma @ ma.T
        ai, bi = np.nonzero(np.triu(cos >= threshold, k=1))
        ib = ia
    else:
        mb = _normalize(_list_col_to_matrix(tb[emb_col]))
        ib = np.asarray(tb[id_col].to_pylist())
        cos = ma @ mb.T
        ai, bi = np.nonzero(cos >= threshold)
    a = ia[ai]
    b = ib[bi]
    c = cos[ai, bi]
    swap = a > b
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    keep = a2 != b2
    return pa.table({"a": pa.array(a2[keep], pa.int64()),
                     "b": pa.array(b2[keep], pa.int64()),
                     "cosine": pa.array(c[keep], pa.float64())})


def _lsh_cosine_pairs(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str,
    emb_col: str,
    n_planes: int,
    n_bands: int,
    seed: int,
    num_buckets: int = 64,
) -> pd.DataFrame:
    """LSH-bucketed cosine near-dup pairs: each vector lands in ``n_bands``
    buckets (one per band of ``n_planes`` random-hyperplane signs) and the
    all-pairs matmul runs only WITHIN a bucket — the scan cost drops from
    O(n²) to Σ bucket², with per-pair recall 1-(1-p^r)^L for per-plane
    agreement p = 1-θ/π. The cosine of a reported pair is computed from the
    same float64 normalize + dot as the exact block-pair path, so values are
    bitwise identical; only recall (not precision) is approximate.

    One bucketed shuffle of (band, sig, id, embedding) rows — embeddings ship
    ``n_bands`` times; choose fewer/wider bands for cheap shuffles at high
    thresholds (e.g. 16×8 at 0.95), more/narrower bands for near-exhaustive
    recall at low thresholds (e.g. 32×2 at 0.4)."""
    from ..stages.join import add_hash_bucket

    head = ds.take(1)
    if not head:
        return pd.DataFrame(columns=["a", "b", "cosine"])
    dim = len(np.asarray(head[0][emb_col]))
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, n_bands * n_planes))
    pref = ray.put(planes)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def explode(t: pa.Table) -> pa.Table:
        m = _list_col_to_matrix(t[emb_col])
        s = (m @ _fetch(pref) > 0).reshape(len(m), n_bands, n_planes)
        sig = s @ weights  # (n, n_bands) int64
        n = len(m)
        idx = pa.array(np.repeat(np.arange(n), n_bands))
        return pa.table({
            "band": pa.array(np.tile(np.arange(n_bands, dtype=np.int32), n)),
            "sig": pa.array(sig.ravel(), pa.int64()),
            id_col: t[id_col].take(idx),
            emb_col: t[emb_col].take(idx),
        })

    exploded = ds.select_columns([id_col, emb_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    bucketed = add_hash_bucket(exploded, ["band", "sig"], num_buckets)
    empty = pa.table({"a": pa.array([], pa.int64()),
                      "b": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return empty
        band = t["band"].to_numpy()
        sig = t["sig"].to_numpy()
        # tertiary id key → deterministic segment truncation under skew
        ids_all = np.asarray(t[id_col].to_pylist())
        order = np.lexsort((ids_all, sig, band))
        band, sig = band[order], sig[order]
        m = _list_col_to_matrix(t[emb_col])[order]
        ids = ids_all[order]
        seg = np.flatnonzero(
            np.r_[True, (band[1:] != band[:-1]) | (sig[1:] != sig[:-1])]
        )
        seg = np.r_[seg, len(band)]
        a_out, b_out, c_out = [], [], []
        for s0, s1 in zip(seg[:-1], seg[1:]):
            if s1 - s0 < 2:
                continue
            if s1 - s0 > MAX_ANN_SEGMENT:
                # mass near-duplication: an unbounded segment would matmul
                # O(seg²) in ONE task (10^5 identical embeddings → 80 GB).
                # Keep the smallest ids (deterministic via the id sort key)
                # and log the drop, mirroring textops.MAX_LSH_BUCKET.
                _LOG.warning(
                    "ANN LSH segment truncated: %d of %d rows dropped "
                    "(MAX_ANN_SEGMENT=%d) — pairs among dropped rows are "
                    "not candidates this pass",
                    s1 - s0 - MAX_ANN_SEGMENT, s1 - s0, MAX_ANN_SEGMENT,
                )
                s1 = s0 + MAX_ANN_SEGMENT
            mm = _normalize(m[s0:s1])
            n_seg = s1 - s0
            ia = ids[s0:s1]
            # row-chunked scoring bounds peak memory at O(chunk × segment)
            # instead of O(segment²); per-element dot products (and thus the
            # reported cosines) are bitwise identical to the full matmul
            for i0 in range(0, n_seg, _ANN_SCORE_CHUNK):
                i1 = min(i0 + _ANN_SCORE_CHUNK, n_seg)
                cos = mm[i0:i1] @ mm.T  # (chunk, n_seg)
                upper = (np.arange(n_seg)[None, :]
                         > np.arange(i0, i1)[:, None])
                al, bi = np.nonzero((cos >= threshold) & upper)
                if not al.size:
                    continue
                c = cos[al, bi]
                a, b = ia[al + i0], ia[bi]
                swap = a > b
                a_out.append(np.where(swap, b, a))
                b_out.append(np.where(swap, a, b))
                c_out.append(c)
        if not a_out:
            return empty
        return pa.table({"a": pa.array(np.concatenate(a_out), pa.int64()),
                         "b": pa.array(np.concatenate(b_out), pa.int64()),
                         "cosine": pa.array(np.concatenate(c_out), pa.float64())})

    pairs = bucketed.groupby("__bucket").map_groups(score, batch_format="pyarrow")
    out = pairs.to_pandas()  # ≤ n_bands × the answer — the result, not the corpus
    if not len(out):
        return pd.DataFrame(columns=["a", "b", "cosine"])
    return (out.drop_duplicates(["a", "b"])
            .sort_values(["a", "b"], kind="mergesort").reset_index(drop=True))


def cosine_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    method: str = "block_pairs",
    n_planes: int = 8,
    n_bands: int = 16,
    seed: int = 13,
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).

    ``method="block_pairs"`` — EXACT and distributed: the (id, embedding)
    projection is materialized as object-store blocks, and every block pair
    is scored by an independent Ray task (the Dataset API has no
    self-cross-join, so this drops to raw tasks by design). The driver holds
    block *refs* and the resulting pair list — never an embedding matrix.
    O(B²/2) tasks over B blocks: exact-but-quadratic.

    ``method="lsh_bucketed"`` — the scale path (:func:`_lsh_cosine_pairs`):
    random-hyperplane band buckets bound the pair grid to Σ bucket²; cosine
    values of reported pairs are bitwise identical to the exact path
    (pinned by ``tests/test_textops.py::test_lsh_cosine_pairs_match_exact``),
    recall is 1-(1-p^r)^L per pair."""
    if method == "lsh_bucketed":
        return _lsh_cosine_pairs(ds, threshold, id_col, emb_col,
                                 n_planes, n_bands, seed)
    refs = ds.select_columns([id_col, emb_col]).to_arrow_refs()
    tasks = []
    for i in range(len(refs)):
        tasks.append(_block_pair_scores.remote(refs[i], None, threshold,
                                               id_col, emb_col))
        for j in range(i + 1, len(refs)):
            tasks.append(_block_pair_scores.remote(refs[i], refs[j], threshold,
                                                   id_col, emb_col))
    parts = [t.to_pandas() for t in ray.get(tasks) if t.num_rows]
    if not parts:
        return pd.DataFrame(columns=["a", "b", "cosine"])
    out = pd.concat(parts, ignore_index=True)
    return (out.drop_duplicates(["a", "b"])
            .sort_values(["a", "b"], kind="mergesort").reset_index(drop=True))


# --------------------------------------------------------------------------
# IVF variant (scale path #2): coarse k-means centroids + probe-list search
# --------------------------------------------------------------------------

def _train_centroids(sample: np.ndarray, n_centroids: int, seed: int,
                     n_iter: int = 10, init: str = "random") -> np.ndarray:
    """Seeded Lloyd iterations on a (small, driver-side) training sample of
    normalized vectors — the IVF coarse quantizer. Deterministic.

    ``init="random"`` is the seeded draw the IVF recall pins were measured
    with; ``init="farthest"`` is RNG-free greedy farthest-point traversal
    (k-means++-flavored) — used by :func:`kmeans_clusters`, where a merged
    pair of true clusters matters more than it does for probe lists."""
    sample = _normalize(sample)
    n = sample.shape[0]
    k = min(n_centroids, n)
    if init == "farthest":
        idx = [0]
        sims = sample @ sample[0]
        for _ in range(k - 1):
            nxt = int(np.argmin(sims))  # least similar to every chosen seed
            idx.append(nxt)
            sims = np.maximum(sims, sample @ sample[nxt])
        cent = sample[idx].copy()
    else:
        rng = np.random.default_rng(seed)
        cent = sample[rng.choice(n, size=k, replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(sample @ _normalize(cent).T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
    return _normalize(cent)


def _ivf_partial(t: pa.Table, bref, id_col: str, emb_col: str, k: int) -> pa.Table:
    """Stateless per-batch IVF scorer: assign each base vector to its nearest
    centroid; for every query, score only base rows whose centroid is in that
    query's probe list; emit this batch's per-query top-k partial."""
    query_ids, qn, cent, probes = _fetch(bref)
    empty = pa.table({"query_id": pa.array([], pa.int64()),
                      "vec_id": pa.array([], pa.int64()),
                      "cosine": pa.array([], pa.float64())})
    if t.num_rows == 0:
        return empty
    m = _list_col_to_matrix(t[emb_col])
    bn = _normalize(m)
    ids = np.asarray(t[id_col].to_pylist())
    assign = np.argmax(bn @ cent.T, axis=1)
    out_q, out_id, out_cos = [], [], []
    for qi in range(qn.shape[0]):
        rows = np.flatnonzero(np.isin(assign, probes[qi]))
        if rows.size == 0:
            continue
        cos = qn[qi] @ bn[rows].T
        kk = min(k, rows.size)
        top = np.argpartition(-cos, kth=kk - 1)[:kk]
        out_q.extend([query_ids[qi]] * kk)
        out_id.extend(ids[rows[top]].tolist())
        out_cos.extend(cos[top].tolist())
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "vec_id": pa.array(out_id, pa.int64()),
                     "cosine": pa.array(out_cos, pa.float64())})


def ivf_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    train_step: int = 7,
    train_max: int = 4096,
    seed: int = 17,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """IVF approximate top-k: a coarse k-means quantizer (trained on a
    deterministic ``id % train_step == 0`` sample, capped at ``train_max``)
    partitions the base vectors into ``n_centroids`` inverted lists; each
    query scores only its ``n_probe`` nearest lists — an
    ``n_probe/n_centroids`` scan fraction. Scoring runs inside
    ``map_batches`` with per-block top-k partials (same merge as
    :func:`brute_force_topk`); only centroids + probe lists broadcast.
    With ``n_probe == n_centroids`` the result is exactly brute force.
    Deterministic given the seed."""

    def sample_batch(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy()
        return t.filter(pa.array(ids % train_step == 0))

    sample_tbl = ds.map_batches(sample_batch, batch_format="pyarrow") \
                   .limit(train_max).to_pandas()
    if len(sample_tbl) == 0:
        # id space has no multiple of train_step — fall back to a plain head
        sample_tbl = ds.limit(train_max).to_pandas()
    sample = np.stack([np.asarray(e, dtype=np.float64)
                       for e in sample_tbl[emb_col]])
    cent = _train_centroids(sample, n_centroids, seed)
    q = _normalize(np.asarray(query_matrix, dtype=np.float64))
    n_probe = min(n_probe, cent.shape[0])
    probes = np.argsort(-(q @ cent.T), axis=1, kind="mergesort")[:, :n_probe]
    bref = ray.put((np.asarray(query_ids), q, cent, probes))
    partials = ds.map_batches(
        functools.partial(_ivf_partial, bref=bref, id_col=id_col,
                          emb_col=emb_col, k=k),
        batch_format="pyarrow",
    ).to_pandas()
    if not len(partials):
        return pd.DataFrame(columns=["query_id", "vec_id", "cosine"])
    return _merge_topk(partials, k)


# --------------------------------------------------------------------------
# distributed spherical k-means (embedding clustering for curation/balancing)
# --------------------------------------------------------------------------

def kmeans_clusters(
    ds: "ray.data.Dataset",
    n_clusters: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    seed: int = 7,
    train_max: int = 10_000,
) -> "ray.data.Dataset":
    """Distributed spherical (cosine) k-means: (vec_id, cluster, cosine).

    Initialization is the deterministic sample-trained Lloyd quantizer of
    the IVF index (:func:`_train_centroids` — bounded driver sample).
    Each refinement round broadcasts the k×d centroid matrix, assigns every
    block's vectors by one matmul, and emits per-block (cluster, count,
    vector-sum) partials — k rows per block regardless of block size; the
    driver folds blocks×k rows into the next centroids (empty clusters keep
    their previous position). The normalized working set is projected and
    materialized ONCE, so refinement rounds re-read object-store blocks
    instead of re-decoding parquet — the standard iterative-algorithm
    trade; the final pass emits each vector's cluster and cosine.

    Determinism: fixed seed, fixed iteration count, and a block-ordered
    driver fold — same input layout → bit-identical output (pinned against
    a single-process numpy Lloyd in pytest)."""

    # probe the embedding width once so every stage (including empty blocks)
    # emits the same FixedSizeList schema
    probe = ds.limit(1).to_pandas()
    if len(probe) == 0:
        raise ValueError("kmeans_clusters: empty embeddings dataset")
    d = len(np.asarray(probe[emb_col].iloc[0]))

    def _nvec_array(m: np.ndarray) -> pa.FixedSizeListArray:
        return pa.FixedSizeListArray.from_arrays(
            pa.array(m.ravel(), pa.float64()), d)

    def project(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "_nvec": _nvec_array(np.empty((0, d)))})
        m = _normalize(_list_col_to_matrix(t[emb_col]))
        return pa.table({id_col: t[id_col], "_nvec": _nvec_array(m)})

    work = ds.map_batches(project, batch_format="pyarrow").materialize()

    sample_tbl = work.limit(train_max).to_pandas()
    sample = np.stack([np.asarray(e, np.float64) for e in sample_tbl["_nvec"]])
    cent = _train_centroids(sample, n_clusters, seed, init="farthest")
    k = cent.shape[0]

    for _ in range(n_iter):
        cref = ray.put(cent)

        def partial(t: pa.Table, cref=cref) -> pa.Table:
            c = _fetch(cref)
            if t.num_rows == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "vsum": _nvec_array(np.empty((0, d)))})
            m = _list_col_to_matrix(t["_nvec"])
            assign = np.argmax(m @ c.T, axis=1)
            counts = np.bincount(assign, minlength=k)
            sums = np.zeros((k, d), np.float64)
            np.add.at(sums, assign, m)
            nz = np.flatnonzero(counts)
            return pa.table({
                "cluster": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
                "vsum": _nvec_array(sums[nz]),
            })

        folded = work.map_batches(partial, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
        new_cent = cent.copy()
        counts = np.zeros(k, np.int64)
        sums = np.zeros((k, d), np.float64)
        for cl, n, vs in zip(folded["cluster"], folded["n"], folded["vsum"]):
            counts[cl] += n
            sums[cl] += np.asarray(vs, np.float64)
        nz = counts > 0
        new_cent[nz] = sums[nz] / counts[nz, None]
        cent = _normalize(new_cent)

    cref = ray.put(cent)

    def assign_block(t: pa.Table, cref=cref) -> pa.Table:
        c = _fetch(cref)
        if t.num_rows == 0:
            return pa.table({id_col: t[id_col],
                             "cluster": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        m = _list_col_to_matrix(t["_nvec"])
        scores = m @ c.T
        a = np.argmax(scores, axis=1)
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(a, pa.int64()),
            "cosine": pa.array(scores[np.arange(len(a)), a], pa.float64()),
        })

    return work.map_batches(assign_block, batch_format="pyarrow")
