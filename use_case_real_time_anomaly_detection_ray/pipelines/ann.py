"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), each batch does one numpy matmul against it (vectorized,
zero-copy Arrow list column → contiguous ndarray), and per-batch top-k
partials are merged driver-side. Scale path: LSH-bucketed variant
(random-hyperplane signs co-partition base and query vectors; only matching
buckets are scanned), plus embedding-cosine near-duplicate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


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


class BruteForceScorer:
    """Actor-pool stage: per-batch cosine scores against the broadcast query
    matrix; emits each batch's per-query top-k partial (merged later)."""

    def __init__(self, qref: "ray.ObjectRef", id_col: str, emb_col: str, k: int):
        q = ray.get(qref)  # (query_ids, (m, d) matrix) — fetched once per actor
        self.query_ids, qm = q
        self.qn = _normalize(qm)
        self.id_col, self.emb_col, self.k = id_col, emb_col, k

    def __call__(self, t: pa.Table) -> pa.Table:
        base = _list_col_to_matrix(t[self.emb_col])
        bn = _normalize(base)
        ids = np.asarray(t[self.id_col].to_pylist())
        cos = self.qn @ bn.T  # (m, batch)
        k = min(self.k, cos.shape[1])
        idx = np.argpartition(-cos, kth=k - 1, axis=1)[:, :k]
        out_q, out_id, out_cos = [], [], []
        for qi in range(cos.shape[0]):
            out_q.extend([self.query_ids[qi]] * k)
            out_id.extend(ids[idx[qi]].tolist())
            out_cos.extend(cos[qi, idx[qi]].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_id, pa.int64()),
                "cosine": pa.array(out_cos, pa.float64()),
            }
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
    (partials are (queries × k × blocks) rows — never the full score matrix).
    Ties on cosine break by ascending vec_id (deterministic)."""
    qref = ray.put((np.asarray(query_ids), np.asarray(query_matrix, dtype=np.float64)))
    partials = ds.map_batches(
        BruteForceScorer,
        fn_constructor_args=(qref, id_col, emb_col, k),
        batch_format="pyarrow",
        concurrency=(1, 64),
    ).to_pandas()
    out = (
        partials.sort_values(["query_id", "cosine", "vec_id"],
                             ascending=[True, False, True], kind="mergesort")
        .groupby("query_id", sort=True)
        .head(k)
        .reset_index(drop=True)
    )
    return out


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

def lsh_bucket_topk(
    ds: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_matrix: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 13,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Approximate top-k: random-hyperplane signature buckets; only base
    vectors sharing a query's bucket are scored. Trades recall for a
    1/2^n_planes scan fraction — the scale path where the brute-force
    matmul is infeasible. Deterministic given the seed."""
    d = np.asarray(query_matrix).shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(d, n_planes))
    qsig = (np.asarray(query_matrix, dtype=np.float64) @ planes > 0) @ (
        1 << np.arange(n_planes)
    )
    wanted = pa.array(np.unique(qsig).astype("int64"))
    pref = ray.put(planes)

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(pref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _list_col_to_matrix(t[emb_col])
            sig = (m @ self.planes > 0) @ (1 << np.arange(n_planes))
            tt = t.append_column("bucket", pa.array(sig.astype("int64")))
            return tt.filter(pa.compute.is_in(tt["bucket"], value_set=wanted))

    filtered = ds.map_batches(Bucketize, batch_format="pyarrow", concurrency=(1, 64))
    qbuck: dict[int, list[int]] = {}
    for qi, s in enumerate(qsig):
        qbuck.setdefault(int(s), []).append(qi)
    q = np.asarray(query_matrix, dtype=np.float64)
    frames = []
    fdf = filtered.to_pandas()
    for bucket, qidx in qbuck.items():
        sub = fdf[fdf["bucket"] == bucket]
        if not len(sub):
            continue
        bm = np.stack([np.asarray(e, dtype=np.float64) for e in sub[emb_col]])
        cos = _normalize(q[qidx]) @ _normalize(bm).T
        for row, qi in enumerate(qidx):
            order = np.argsort(-cos[row], kind="mergesort")[:k]
            frames.append(pd.DataFrame({
                "query_id": np.asarray(query_ids)[qi],
                "vec_id": sub[id_col].to_numpy()[order],
                "cosine": cos[row][order],
            }))
    if not frames:
        return pd.DataFrame(columns=["query_id", "vec_id", "cosine"])
    return pd.concat(frames, ignore_index=True)


def cosine_near_dup_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥ threshold).
    Brute-force blocked matmul: each batch scores against the broadcast
    normalized matrix (O(n²/B) per batch — fine to ~10^5; LSH-bucket for
    more)."""
    full = ds.select_columns([id_col, emb_col]).to_pandas()
    ids = full[id_col].to_numpy()
    m = _normalize(np.stack([np.asarray(e, dtype=np.float64) for e in full[emb_col]]))
    mref = ray.put((ids, m))

    class PairScorer:
        def __init__(self):
            self.ids, self.m = ray.get(mref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bm = _normalize(_list_col_to_matrix(t[emb_col]))
            bids = np.asarray(t[id_col].to_pylist())
            cos = bm @ self.m.T
            rows_a, rows_b, rows_c = [], [], []
            ai, bi = np.nonzero(cos >= threshold)
            for i, j in zip(ai, bi):
                a, b = int(bids[i]), int(self.ids[j])
                if a < b:
                    rows_a.append(a)
                    rows_b.append(b)
                    rows_c.append(float(cos[i, j]))
            return pa.table({"a": pa.array(rows_a, pa.int64()),
                             "b": pa.array(rows_b, pa.int64()),
                             "cosine": pa.array(rows_c, pa.float64())})

    pairs = ds.map_batches(PairScorer, batch_format="pyarrow", concurrency=(1, 64))
    return pairs.to_pandas().drop_duplicates(["a", "b"]).reset_index(drop=True)
