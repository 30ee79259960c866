"""Training-data operator queries over ``documents`` / ``embeddings`` with
DuckDB oracles where SQL can express the semantics. Oracle-paired beyond the
obvious: language ID (``SQL_DOC_LANG_ID`` transcribes the heuristic), n-gram
Jaccard pairs (exhaustive 3-gram cross-join), MinHash dedup clusters
(exact-Jaccard verification makes the output connected components over true
Jaccard pairs — a recursive-CTE closure), and the embedding near-dup pairs on
the LSH-bucketed scale path. The rest (SimHash, fingerprints, sketch ANN,
media) are rows-only: the driver records the weaker check and correctness is
pinned by unit tests against exact oracles / pinned recall bounds instead."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.text import _LANG_MARKERS, STOPWORDS
from ..sources.readers import read_table
from . import ann, textops

_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in sorted(STOPWORDS)) + "]"


def _markers_sql(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang])) + "]"


def _docs(sf_dir: str):
    return read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      compute_heavy=True)


def _embs(sf_dir: str):
    return read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                      compute_heavy=True)


# --------------------------------------------------------------------------
# exact dedup (oracle)
# --------------------------------------------------------------------------

def q_doc_exact_dedup(sf_dir: str):
    return textops.exact_dedup(_docs(sf_dir))


SQL_DOC_EXACT_DEDUP = """
SELECT min(doc_id) AS doc_id, md5(text) AS text_md5
FROM documents GROUP BY md5(text)
"""


# --------------------------------------------------------------------------
# text stats + quality (oracle)
# --------------------------------------------------------------------------

def q_doc_text_stats(sf_dir: str):
    return textops.text_stats(_docs(sf_dir))


SQL_DOC_TEXT_STATS = f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
         len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens_bpe
  FROM documents
)
SELECT doc_id, n_chars,
       len(w) AS n_words,
       n_punct,
       len(list_filter(w, x -> list_contains({_STOP_SQL}, lower(x)))) AS n_stop,
       n_tokens_bpe,
       len(list_filter(w, x -> list_contains({_STOP_SQL}, lower(x)))) / CAST(len(w) AS DOUBLE) AS stop_ratio,
       n_punct / CAST(n_chars AS DOUBLE) AS punct_ratio,
       list_sum(list_transform(w, x -> length(x))) / CAST(len(w) AS DOUBLE) AS mean_word_len
FROM f
"""


def q_doc_streaming_dedup(sf_dir: str):
    """Cross-tick streaming dedup over the shared-actor index: sources in
    ascending order are the arrival ticks (in production each tick is the
    batch that actually arrived; here the split is derived so the oracle
    can reproduce it) — see ``textops.streaming_dedup``."""
    # read ONCE and materialize: each tick then filters object-store blocks
    # instead of re-scanning the parquet S times (one scan per source)
    full = read_table(sf_dir, "documents",
                      columns=["doc_id", "text", "source"]).materialize()
    srcs = sorted(
        full.map_batches(
            lambda t: pa.table({"source": t["source"].unique()}),
            batch_format="pyarrow",
        ).to_pandas()["source"].unique()
    )

    def tick_ds(src: str):
        return full.map_batches(
            lambda t, _s=src: t.filter(pa.compute.equal(t["source"], _s))
                               .drop_columns(["source"]),
            batch_format="pyarrow")

    return textops.streaming_dedup([(s, tick_ds(s)) for s in srcs])


SQL_DOC_STREAMING_DEDUP = """
WITH r AS (
  SELECT doc_id, source, md5(text) AS text_md5,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY source, doc_id) AS rn
  FROM documents
)
SELECT doc_id, text_md5, source AS tick FROM r WHERE rn = 1
"""


def q_doc_repetition(sf_dir: str):
    """Gopher-style repetition scores (duplicate-word + top-bigram
    fractions) — see ``textops.repetition_scores``."""
    return textops.repetition_scores(_docs(sf_dir))


SQL_DOC_REPETITION = """
WITH f AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w
  FROM documents
), ws AS (
  SELECT doc_id, w, len(w) AS n_words, len(list_distinct(w)) AS n_distinct
  FROM f
), bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || chr(10) || w[i + 1])) AS b
  FROM ws WHERE n_words >= 2
), bc AS (
  SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b
), bt AS (
  SELECT doc_id, max(c) AS top_c, sum(c) AS n_bi FROM bc GROUP BY doc_id
), s AS (
  SELECT ws.doc_id, ws.n_words,
         CASE WHEN ws.n_words = 0 THEN 0.0
              ELSE FLOOR((1.0 - ws.n_distinct / CAST(ws.n_words AS DOUBLE))
                         * 1e6 + 0.5) / 1e6 END AS dup_word_frac,
         COALESCE(FLOOR(bt.top_c / CAST(bt.n_bi AS DOUBLE) * 1e6 + 0.5) / 1e6,
                  0.0) AS top_bigram_frac
  FROM ws LEFT JOIN bt ON ws.doc_id = bt.doc_id
)
SELECT doc_id, n_words, dup_word_frac, top_bigram_frac,
       (dup_word_frac > 0.6 OR top_bigram_frac > 0.04) AS flagged
FROM s
"""


def q_doc_shared_passages(sf_dir: str):
    """Cross-doc duplicated 8-gram passages — see
    ``textops.shared_passages``."""
    return textops.shared_passages(_docs(sf_dir), k=8, min_docs=2)


SQL_DOC_SHARED_PASSAGES = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w) - 8 + 2),
                               i -> array_to_string(list_slice(w, i, i + 7),
                                                    ' '))) AS gram
  FROM w WHERE len(w) >= 8
)
SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
"""


def q_doc_lm_perplexity(sf_dir: str):
    """Corpus-trained bigram-LM perplexity (CCNet-style quality filter) —
    see ``textops.lm_perplexity``."""
    return textops.lm_perplexity(_docs(sf_dir))


SQL_DOC_LM_PERPLEXITY = """
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), bi AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(w)),
                               i -> w[i] || chr(10) || w[i + 1])) AS bg
  FROM w WHERE len(w) >= 2
), bc AS (
  SELECT bg, count(*) AS cbg FROM bi GROUP BY bg
), pc AS (
  SELECT split_part(bg, chr(10), 1) AS w1, sum(cbg) AS cw1 FROM bc GROUP BY 1
), v AS (
  SELECT count(DISTINCT u) AS vs FROM (SELECT unnest(w) AS u FROM w)
), db AS (
  SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY doc_id, bg
), sc AS (
  SELECT db.doc_id, db.c,
         FLOOR(LN((bc.cbg + 0.5)
                  / (pc.cw1 + 0.5 * (SELECT vs FROM v))) * 1e6 + 0.5)
           / 1e6 AS lp
  FROM db JOIN bc USING (bg)
          JOIN pc ON pc.w1 = split_part(db.bg, chr(10), 1)
)
SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
       FLOOR(EXP(-SUM(c * lp) / SUM(c)) * 1e6 + 0.5) / 1e6 AS ppl
FROM sc GROUP BY doc_id
"""


_CHUNK_SIZE, _CHUNK_OVERLAP = 200, 50
_CHUNK_STRIDE = _CHUNK_SIZE - _CHUNK_OVERLAP


def q_doc_chunks(sf_dir: str):
    """Overlapping 200/50 character chunking — see
    ``textops.chunk_documents``."""
    return textops.chunk_documents(_docs(sf_dir), size=_CHUNK_SIZE,
                                   overlap=_CHUNK_OVERLAP)


SQL_DOC_CHUNKS = f"""
SELECT doc_id,
       CAST(s / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       substr(text, CAST(s AS BIGINT) + 1, {_CHUNK_SIZE}) AS chunk,
       length(substr(text, CAST(s AS BIGINT) + 1, {_CHUNK_SIZE})) AS n_chars
FROM (SELECT doc_id, text, unnest(range(0, length(text), {_CHUNK_STRIDE})) AS s
      FROM documents WHERE length(text) > 0)
WHERE s = 0 OR s - {_CHUNK_STRIDE} + {_CHUNK_SIZE} < length(text)
"""


def q_doc_quality(sf_dir: str):
    return textops.quality_score(_docs(sf_dir))


SQL_DOC_QUALITY = f"""
WITH f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS w,
         len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
  FROM documents
), s AS (
  SELECT doc_id,
         len(w) AS n_words,
         len(list_filter(w, x -> list_contains({_STOP_SQL}, lower(x)))) / CAST(len(w) AS DOUBLE) AS stop_ratio,
         n_punct / CAST(n_chars AS DOUBLE) AS punct_ratio,
         list_sum(list_transform(w, x -> length(x))) / CAST(len(w) AS DOUBLE) AS mean_word_len
  FROM f
)
SELECT doc_id,
       0.25 * CAST(n_words BETWEEN 10 AND 100000 AS DOUBLE)
     + 0.25 * CAST(stop_ratio >= 0.01 AS DOUBLE)
     + 0.25 * CAST(punct_ratio <= 0.2 AS DOUBLE)
     + 0.25 * CAST(mean_word_len BETWEEN 2.0 AND 12.0 AS DOUBLE) AS quality
FROM s
"""


# --------------------------------------------------------------------------
# similarity search (oracle via list_cosine_similarity)
# --------------------------------------------------------------------------

_ANN_QUERIES, _ANN_K = 5, 10


def q_ann_topk(sf_dir: str):
    out = ann.embedding_self_topk(_embs(sf_dir), n_queries=_ANN_QUERIES, k=_ANN_K)
    out = out.copy()
    # shared half-up rounding at 1e-6 absorbs accumulation-order ulps between
    # numpy matmul and the SQL engine's sequential dot product
    out["cosine"] = np.floor(out["cosine"] * 1e6 + 0.5) / 1e6
    return out


SQL_ANN_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe
  FROM embeddings ORDER BY vec_id LIMIT {_ANN_QUERIES}
), scored AS (
  -- DOUBLE[] casts force double accumulation (float32 lists otherwise score
  -- in float32, off by ~1e-8 from the engine's float64 matmul)
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(q.qe AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) AS cos
  FROM q CROSS JOIN embeddings e
), ranked AS (
  SELECT query_id, vec_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
  FROM scored
)
SELECT query_id, vec_id, floor(cos * 1000000 + 0.5) / 1000000 AS cosine
FROM ranked WHERE rn <= {_ANN_K}
"""


# --------------------------------------------------------------------------
# sketch-based ops — rows-only (no SQL equivalent; unit-tested vs exact oracles)
# --------------------------------------------------------------------------

def q_doc_minhash_dedup(sf_dir: str):
    """MinHash-LSH dedup with exact-Jaccard verification. Because the verify
    step recomputes the TRUE word-3-gram Jaccard for every candidate, the
    cluster output equals connected components over all pairs with exact
    Jaccard ≥ 0.5 whenever LSH recall holds — which SQL *can* express
    (recursive-CTE transitive closure). 32 bands × 2 rows puts the per-pair
    miss at ≤1e-4 at j=0.5 and ~1e-22 at the data's minimum true pair
    (j≈0.89); verified bitwise at sf0.001/0.01 vs the SQL oracle and at
    sf0.1 vs an exact inverted-index + union-find computation."""
    return textops.minhash_dedup(_docs(sf_dir), threshold=0.5,
                                 num_perm=64, bands=32)


# exhaustive oracle: exact-Jaccard pairs (same tokenization as the engine)
# → symmetric edge list + self-loops → transitive closure via a recursive
# CTE → cluster_id = min reachable doc_id, keep = (doc_id == cluster_id).
# Components here are tiny cliques, so the closure is small and converges in
# 2-3 recursion rounds.
SQL_DOC_MINHASH_DEDUP = r"""
WITH RECURSIVE w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
    CASE WHEN len(w) >= 3
         THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
         ELSE []::VARCHAR[] END AS sh
  FROM w
), pairs AS (
  -- jaccard(empty, empty) = 1.0, matching the engine (empty-shingle docs
  -- share identical all-max MinHash signatures and always co-bucket); an
  -- unguarded 0/0 is NULL in DuckDB and would silently drop those pairs
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM s x JOIN s y ON x.doc_id < y.doc_id
  WHERE CASE WHEN len(x.sh) + len(y.sh) = 0 THEN 1.0
             ELSE len(list_intersect(x.sh, y.sh))
                  / CAST(len(x.sh) + len(y.sh)
                         - len(list_intersect(x.sh, y.sh)) AS DOUBLE)
        END >= 0.5
), edges AS (
  SELECT a AS u, b AS v FROM pairs
  UNION ALL SELECT b, a FROM pairs
  UNION ALL SELECT doc_id, doc_id FROM documents
), r(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM r JOIN edges e ON r.v = e.u
)
SELECT u AS doc_id, min(v) AS cluster_id, (u = min(v)) AS keep
FROM r GROUP BY u
"""


def q_doc_simhash_dedup(sf_dir: str):
    return textops.simhash_dedup(_docs(sf_dir), max_hamming=6)


def q_doc_ngram_dup_pairs(sf_dir: str):
    """Exact word-3-gram Jaccard pairs ≥ 0.3, LSH-pruned with 32 bands of 2
    rows (recall at the data's minimum true pair, j≈0.89, is
    1-(1-j²)^32 ≈ 1-1e-22 — verified bitwise against the exhaustive SQL
    cross-join at sf0.001/0.01/0.1)."""
    return textops.ngram_jaccard_pairs(_docs(sf_dir), threshold=0.3,
                                       num_perm=64, bands=32)


# exhaustive oracle: DuckDB cross-join over distinct word-3-gram sets (same
# RE2-pinned tokenization as the engine; the engine hashes shingles to 64-bit
# and computes |∩|/|∪| over the hash sets — identical counts absent 31-bit
# collisions, which the three-scale bitwise sweep rules out for this corpus)
SQL_DOC_NGRAM_DUP_PAIRS = r"""
WITH w AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                     x -> x <> '') AS w
  FROM documents
), s AS (
  SELECT doc_id,
    CASE WHEN len(w) >= 3
         THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
         ELSE []::VARCHAR[] END AS sh
  FROM w
), p AS (
  SELECT x.doc_id AS a, y.doc_id AS b,
         len(list_intersect(x.sh, y.sh)) AS i,
         len(x.sh) + len(y.sh) - len(list_intersect(x.sh, y.sh)) AS u
  FROM s x JOIN s y ON x.doc_id < y.doc_id
)
SELECT a, b,
       CASE WHEN u = 0 THEN 1.0 ELSE i / CAST(u AS DOUBLE) END AS jaccard
FROM p
WHERE (CASE WHEN u = 0 THEN 1.0 ELSE i / CAST(u AS DOUBLE) END) >= 0.3
"""


def q_doc_lang_id(sf_dir: str):
    return textops.lang_id_table(_docs(sf_dir))


# SQL transcription of functions.text.lang_id: CJK short-circuit, then argmax
# marker hit rate over the first 2000 lowercased whitespace words with
# first-in-order tie-break (en > de > es > fr); score = floor(x*1e4+0.5)/1e4,
# the identical double expression the engine evaluates.
_WIN_EN = "s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr"
_WIN_DE = "s_de > 0 AND s_de >  s_en AND s_de >= s_es AND s_de >= s_fr"
_WIN_ES = "s_es > 0 AND s_es >  s_en AND s_es >  s_de AND s_es >= s_fr"
_WIN_FR = "s_fr > 0 AND s_fr >  s_en AND s_fr >  s_de AND s_fr >  s_es"

SQL_DOC_LANG_ID = f"""
WITH f AS (
  SELECT doc_id,
         len(regexp_extract_all(substring(text, 1, 4000), '[一-鿿]')) AS cjk,
         least(length(text), 4000) AS head_len,
         list_transform(list_slice(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> ''), 1, 2000),
                        x -> lower(x)) AS w
  FROM documents
), c AS (
  SELECT doc_id, cjk, head_len, len(w) AS nw,
         len(list_filter(w, x -> list_contains({_markers_sql('en')}, x))) AS c_en,
         len(list_filter(w, x -> list_contains({_markers_sql('de')}, x))) AS c_de,
         len(list_filter(w, x -> list_contains({_markers_sql('es')}, x))) AS c_es,
         len(list_filter(w, x -> list_contains({_markers_sql('fr')}, x))) AS c_fr
  FROM f
), sc AS (
  SELECT doc_id, cjk, head_len,
         CASE WHEN nw = 0 THEN 0.0 ELSE c_en / CAST(nw AS DOUBLE) END AS s_en,
         CASE WHEN nw = 0 THEN 0.0 ELSE c_de / CAST(nw AS DOUBLE) END AS s_de,
         CASE WHEN nw = 0 THEN 0.0 ELSE c_es / CAST(nw AS DOUBLE) END AS s_es,
         CASE WHEN nw = 0 THEN 0.0 ELSE c_fr / CAST(nw AS DOUBLE) END AS s_fr
  FROM c
)
SELECT doc_id,
  CASE
    WHEN head_len > 0 AND cjk > 0.05 * head_len THEN 'zh'
    WHEN {_WIN_EN} THEN 'en'
    WHEN {_WIN_DE} THEN 'de'
    WHEN {_WIN_ES} THEN 'es'
    WHEN {_WIN_FR} THEN 'fr'
    ELSE 'und'
  END AS lang_pred,
  CASE
    WHEN head_len > 0 AND cjk > 0.05 * head_len
      THEN floor(cjk / CAST(head_len AS DOUBLE) * 10000 + 0.5) / 10000
    WHEN {_WIN_EN} THEN floor(s_en * 10000 + 0.5) / 10000
    WHEN {_WIN_DE} THEN floor(s_de * 10000 + 0.5) / 10000
    WHEN {_WIN_ES} THEN floor(s_es * 10000 + 0.5) / 10000
    WHEN {_WIN_FR} THEN floor(s_fr * 10000 + 0.5) / 10000
    ELSE 0.0
  END AS lang_score
FROM sc
"""


def q_doc_fingerprints(sf_dir: str):
    return textops.fingerprint_table(_docs(sf_dir))


def q_ann_lsh_topk(sf_dir: str):
    """Multi-band LSH ANN (4-bit × 8 bands: ~40% scan on near-orthogonal
    data) — rows-only; recall@10 vs the exact oracle is pinned by
    ``tests/test_textops.py::test_ann_recall_pinned_on_driver_tables`` and
    recorded in COVERAGE.md."""
    emb = _embs(sf_dir)
    head = emb.sort("vec_id").limit(_ANN_QUERIES).to_pandas()
    qm = np.stack([np.asarray(e, dtype=np.float64) for e in head["embedding"]])
    return ann.lsh_bucket_topk(emb, head["vec_id"].to_numpy(), qm, k=_ANN_K,
                               n_planes=4, n_bands=8)


def q_ann_ivf_topk(sf_dir: str):
    """IVF scale-path ANN (coarse k-means + probe lists) — rows-only;
    exactness at n_probe == n_centroids is pinned by
    ``tests/test_textops.py::test_ivf_full_probe_equals_bruteforce``.
    n_probe=4 of 8 lists: recall@10 vs exact brute force = 0.82/0.74/0.86
    at sf0.001/0.01/0.1 (n_probe=3 dipped to 0.54 at sf0.01 — VERDICT r3
    #5); all three scales pinned ≥0.6 by
    ``test_ann_recall_pinned_on_driver_tables``."""
    emb = _embs(sf_dir)
    head = emb.sort("vec_id").limit(_ANN_QUERIES).to_pandas()
    qm = np.stack([np.asarray(e, dtype=np.float64) for e in head["embedding"]])
    return ann.ivf_topk(emb, head["vec_id"].to_numpy(), qm, k=_ANN_K,
                        n_centroids=8, n_probe=4)


def q_emb_near_dup_pairs(sf_dir: str):
    # test-table embeddings are near-orthogonal (max pairwise cosine ≈0.51);
    # 0.4 keeps the result non-empty so the check exercises real rows.
    # Threshold membership is decided on the ROUNDED cosine on both sides
    # (scan with a small margin, then filter rounded >= 0.4): comparing raw
    # values would let an accumulation-order ulp flip a boundary pair in or
    # out between numpy matmul and the SQL sequential dot product.
    # Runs the LSH-BUCKETED scale path: 32 bands × 2 planes → per-pair miss
    # probability (1-p²)^32 ≤ 7e-8 at cosine 0.4 (p = 1-θ/π ≥ 0.63), and the
    # reported cosines are bitwise equal to the exact path — verified against
    # the exhaustive SQL cross-join at sf0.001/0.01/0.1.
    out = ann.cosine_near_dup_pairs(_embs(sf_dir), threshold=0.4 - 1e-4,
                                    method="lsh_bucketed",
                                    n_planes=2, n_bands=32).copy()
    out["cosine"] = np.floor(out["cosine"] * 1e6 + 0.5) / 1e6
    return out[out["cosine"] >= 0.4].reset_index(drop=True)


# exact all-pairs oracle — the engine's block-pair scan is exact too, so the
# outputs must agree row-for-row (the distributed structure is the only
# difference)
SQL_EMB_NEAR_DUP_PAIRS = """
SELECT x.vec_id AS a, y.vec_id AS b,
       floor(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                    CAST(y.embedding AS DOUBLE[])) * 1000000 + 0.5)
         / 1000000 AS cosine
FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
WHERE floor(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                                   CAST(y.embedding AS DOUBLE[])) * 1000000 + 0.5)
        / 1000000 >= 0.4
"""


def q_doc_vocab_topk(sf_dir: str):
    """Corpus vocabulary: 100 most frequent whitespace tokens (exact
    distributed top-k — per-token-bucket counts, per-bucket top-k, tiny
    global fold; see :func:`textops.vocab_topk`)."""
    return textops.vocab_topk(_docs(sf_dir), k=100)


SQL_DOC_VOCAB_TOPK = """
SELECT tok AS token, COUNT(*) AS n FROM (
  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents)
GROUP BY tok ORDER BY n DESC, token ASC LIMIT 100
"""


def q_doc_tfidf_top(sf_dir: str):
    """Per-document top-5 tf-idf terms (``tf * ln(N/df)`` rounded half-up
    to 1e-6, ranked on the rounded score, ties by term ascending). The df
    table is vocabulary-sized — broadcast below
    ``textops.TFIDF_BROADCAST_VOCAB`` distinct terms, bucketed two-shuffle
    co-location above (both wirings pinned byte-identical in pytest)."""
    return textops.tfidf_top_terms(_docs(sf_dir), m=5)


SQL_DOC_TFIDF_TOP = """
WITH tf AS (
  SELECT doc_id, tok AS term, COUNT(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                  x -> x <> '')) AS tok
        FROM documents)
  GROUP BY doc_id, tok),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf,
         floor(tf.tf * ln(n.n_docs / df.df) * 1000000 + 0.5) / 1000000 AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored)
SELECT doc_id, term, tf, tfidf FROM ranked WHERE rk <= 5
ORDER BY doc_id, tfidf DESC, term
"""


def q_doc_heavy_tokens(sf_dir: str):
    """Heavy hitters: tokens above 0.2 % corpus frequency with EXACT counts
    via two-pass lossy counting (per-block pruned Counter partials →
    candidate superset → exact broadcast-restricted recount; identical to
    the single-pass exact wiring, pinned in pytest)."""
    return textops.heavy_hitters(_docs(sf_dir), phi=0.002, method="sketch")


SQL_DOC_HEAVY_TOKENS = """
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_tot FROM toks)
SELECT tok AS token, COUNT(*) AS n
FROM toks, tot
GROUP BY tok, tot.n_tot
HAVING COUNT(*) > tot.n_tot * 0.002
ORDER BY n DESC, token ASC
"""


#: fixed BM25 demo query — 'dup' is the corpus's one rare token, so the
#: ranking actually exercises the idf spread
_BM25_QUERY = "hash join dup"


def q_doc_bm25_topk(sf_dir: str):
    """Okapi BM25 top-10 docs for a fixed query (k1=1.2, b=0.75, Lucene
    idf). Zero-shuffle scale shape: scalar global stats (N, avgdl, per-
    query-term df) fold from per-block partials, then every block scores
    locally and emits its top-10; per-term contributions round to 1e-6
    before summing so the score is addition-order-independent and matches
    DuckDB bitwise."""
    return textops.bm25_topk(_docs(sf_dir), _BM25_QUERY, k=10)


SQL_DOC_BM25_TOPK = """
WITH docs AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                             x -> x <> '') AS w
  FROM documents),
dl AS (SELECT doc_id, len(w) AS dl FROM docs),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
          FROM dl),
q(term) AS (VALUES ('dup'), ('hash'), ('join')),
tf AS (SELECT doc_id, tok AS term, COUNT(*) AS tf
       FROM (SELECT doc_id, unnest(w) AS tok FROM docs)
       GROUP BY doc_id, tok),
qtf AS (SELECT tf.* FROM tf JOIN q USING (term)),
df AS (SELECT term, COUNT(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT qtf.doc_id,
         floor(SUM(
           floor(ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                 * qtf.tf * 2.2
                 / (qtf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))
                 * 1000000 + 0.5) / 1000000
         ) * 1000000 + 0.5) / 1000000 AS score
  FROM qtf
  JOIN df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  GROUP BY qtf.doc_id)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_emb_kmeans(sf_dir: str):
    """Distributed spherical k-means over the embeddings table: per-vector
    (cluster, cosine-to-centroid). Rows-only by nature (iterative
    refinement is not SQL-expressible); pinned in pytest against a
    single-process numpy Lloyd run bit-for-bit on a one-block layout and
    by inertia/determinism checks on multi-block layouts."""
    return ann.kmeans_clusters(_embs(sf_dir), n_clusters=8, n_iter=4)


def q_doc_contamination(sf_dir: str):
    """Decontamination scan: the 'benchmark' is the two lowest-id docs
    (picked identically in SQL, so the query is self-contained); every doc
    sharing a word 3-gram with them is flagged with its overlap count."""
    import pyarrow.compute as _pc

    from ..stages.reduce import to_arrow_single

    bench_tbl = to_arrow_single(_docs(sf_dir).map_batches(
        lambda t: t.filter(_pc.less(t["doc_id"], 2)),
        batch_format="pyarrow"))
    bench = bench_tbl["text"].to_pylist()
    return textops.contamination_check(_docs(sf_dir), bench, k=3)


SQL_DOC_CONTAMINATION = """
WITH w AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                             x -> x <> '') AS w
  FROM documents),
s AS (
  SELECT doc_id,
    CASE WHEN len(w) >= 3
         THEN list_distinct(list_transform(generate_series(1, len(w) - 2),
                            i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
         WHEN len(w) > 0 THEN [array_to_string(w, ' ')]
         ELSE []::VARCHAR[] END AS sh
  FROM w),
bench AS (
  SELECT list_distinct(flatten(list(sh))) AS bsh FROM s WHERE doc_id < 2)
SELECT doc_id,
       len(list_intersect(sh, bench.bsh)) AS n_overlap,
       len(sh) AS n_shingles,
       len(list_intersect(sh, bench.bsh)) > 0 AS contaminated
FROM s CROSS JOIN bench
"""


def q_doc_pack_chunks(sf_dir: str):
    """Token-budget sequence packing (budget 512, 16 modulo-buckets):
    every doc assigned to the training chunk its first token lands in.
    Only (doc_id, n_tokens) pairs shuffle — text never moves; all-integer
    output so the SQL window-function oracle matches bitwise."""
    return textops.pack_chunks(_docs(sf_dir), budget=512, num_buckets=16)


SQL_DOC_PACK_CHUNKS = """
WITH t AS (
  SELECT doc_id, doc_id % 16 AS bucket,
         len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                         x -> x <> '')) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, bucket, n_tokens,
         -- SUM(BIGINT) is HUGEINT in DuckDB; the engine emits int64
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY bucket ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS token_offset
  FROM t)
SELECT doc_id, bucket, n_tokens, token_offset,
       token_offset // 512 AS chunk_seq
FROM c ORDER BY bucket, doc_id
"""


def q_doc_redact(sf_dir: str):
    """PII scrub (emails/IPv4/phones/hex secrets → typed placeholders) as a
    compiled-regex actor-pool stage; per-doc category counts ride along.
    RE2-compatible patterns make the DuckDB regexp_replace oracle agree
    byte-for-byte."""
    return textops.redact_pii(_docs(sf_dir))


def _redact_sql() -> str:
    """Nested-SELECT transcription of the redaction pass: one layer per
    pattern, each counting on the SAME intermediate the engine counts on
    (category i sees the text after categories < i replaced)."""
    from .textops import REDACT_PATTERNS

    sql = "SELECT doc_id, text FROM documents"
    for i, (name, pat, repl) in enumerate(REDACT_PATTERNS):
        # standard-SQL string literals: only quotes escape; backslashes in
        # the pattern pass through verbatim to RE2
        esc = pat.replace("'", "''")
        prev_counts = ", ".join(
            f"n_{REDACT_PATTERNS[j][0]}" for j in range(i))
        prev = (prev_counts + ", ") if prev_counts else ""
        sql = (f"SELECT doc_id, {prev}"
               f"len(regexp_extract_all(text, '{esc}')) AS n_{name}, "
               f"regexp_replace(text, '{esc}', '{repl}', 'g') AS text "
               f"FROM ({sql})")
    all_counts = ", ".join(f"n_{name}" for name, _, _ in REDACT_PATTERNS)
    return (f"SELECT doc_id, text AS text_redacted, {all_counts} "
            f"FROM ({sql})")


SQL_DOC_REDACT = _redact_sql()


def q_doc_distinct_hll(sf_dir: str):
    """Distinct-token cardinality estimate from the mergeable HyperLogLog
    sketch (p=14, ±0.81 % typical) — rows-only by nature (an estimator has
    no SQL-reproducible value); accuracy is pinned vs exact distinct counts
    at three corpus scales in pytest."""
    return textops.distinct_tokens_hll(_docs(sf_dir), p=14)


def q_media_decode_features(sf_dir: str):
    """Multimodal decode through the driver surface: deterministic synthetic
    assets in REAL public formats (BMP, PNG, GIF and JPEG images, PCM16
    WAV audio, Y4M and Motion-JPEG MP4 video, cycled per row) →
    fixed-pool :class:`RealDecoder` stage → per-asset value features. The
    decoders are spec-conformant pure numpy/stdlib (``stages/codecs.py``,
    byte-exact round-trip-tested); PNG, GIF, JPEG and MP4 are real
    compressed-codec paths (stdlib-zlib DEFLATE with all five scanline
    filters; variable-width LSB-first LZW; canonical-Huffman baseline
    DCT; ISO BMFF sample-table demux); only codecs with no stdlib
    decompressor (MP3, AVC/HEVC tracks) remain gated behind
    ``NotImplementedError``."""
    from ..stages.multimodal import decode_features, synth_media_table

    ds = ray.data.from_arrow(synth_media_table(n=64, seed=42, fmt="mixed"))
    return decode_features(ds, decoder="real").map_batches(
        lambda t: t.select(["asset_id", "media_type", "width", "height",
                            "pix_mean", "pix_std"]),
        batch_format="pyarrow",
    )


def q_media_frame_sample(sf_dir: str):
    """flat_map-shaped video frame sampling (1 asset row → n frame rows)
    with REAL container demux: every sampled frame is seeked to (O(1) per
    frame — Y4M stride arithmetic / MP4 sample-table offsets) and its luma
    decoded; ``frame_mean`` is the actual pixel mean. Half the assets are
    Y4M streams, half Motion-JPEG MP4s."""
    import pyarrow as _pa

    from ..stages.multimodal import sample_frames, synth_media_table

    y4m = synth_media_table(n=16, seed=7, fmt="y4m")
    mp4 = synth_media_table(n=16, seed=8, fmt="mp4")
    mp4 = mp4.set_column(0, "asset_id",
                         _pa.array(range(1000, 1016), _pa.int64()))
    ds = ray.data.from_arrow(_pa.concat_tables([y4m, mp4]))
    return sample_frames(ds, every_k=2, decode=True)


TEXT_QUERIES = {
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_text_stats": q_doc_text_stats,
    "doc_repetition": q_doc_repetition,
    "doc_streaming_dedup": q_doc_streaming_dedup,
    "doc_chunks": q_doc_chunks,
    "doc_shared_passages": q_doc_shared_passages,
    "doc_lm_perplexity": q_doc_lm_perplexity,
    "doc_quality": q_doc_quality,
    "ann_topk": q_ann_topk,
    "doc_ngram_dup_pairs": q_doc_ngram_dup_pairs,
    "doc_minhash_dedup": q_doc_minhash_dedup,
    "doc_lang_id": q_doc_lang_id,
    "doc_vocab_topk": q_doc_vocab_topk,
    "doc_tfidf_top": q_doc_tfidf_top,
    "doc_heavy_tokens": q_doc_heavy_tokens,
    "doc_bm25_topk": q_doc_bm25_topk,
    "doc_redact": q_doc_redact,
    "doc_pack_chunks": q_doc_pack_chunks,
    "doc_contamination": q_doc_contamination,
    "emb_near_dup_pairs": q_emb_near_dup_pairs,
    # rows-only (no SQL-expressible oracle; exact pytest self-oracles):
    "doc_simhash_dedup": q_doc_simhash_dedup,
    "doc_distinct_hll": q_doc_distinct_hll,
    "doc_fingerprints": q_doc_fingerprints,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "emb_kmeans": q_emb_kmeans,
    "media_decode_features": q_media_decode_features,
    "media_frame_sample": q_media_frame_sample,
}

TEXT_ORACLE = {
    "doc_exact_dedup": SQL_DOC_EXACT_DEDUP,
    "doc_text_stats": SQL_DOC_TEXT_STATS,
    "doc_repetition": SQL_DOC_REPETITION,
    "doc_streaming_dedup": SQL_DOC_STREAMING_DEDUP,
    "doc_chunks": SQL_DOC_CHUNKS,
    "doc_shared_passages": SQL_DOC_SHARED_PASSAGES,
    "doc_lm_perplexity": SQL_DOC_LM_PERPLEXITY,
    "doc_quality": SQL_DOC_QUALITY,
    "doc_lang_id": SQL_DOC_LANG_ID,
    "doc_vocab_topk": SQL_DOC_VOCAB_TOPK,
    "doc_tfidf_top": SQL_DOC_TFIDF_TOP,
    "doc_heavy_tokens": SQL_DOC_HEAVY_TOKENS,
    "doc_bm25_topk": SQL_DOC_BM25_TOPK,
    "doc_redact": SQL_DOC_REDACT,
    "doc_pack_chunks": SQL_DOC_PACK_CHUNKS,
    "doc_contamination": SQL_DOC_CONTAMINATION,
    "doc_ngram_dup_pairs": SQL_DOC_NGRAM_DUP_PAIRS,
    "doc_minhash_dedup": SQL_DOC_MINHASH_DEDUP,
    "ann_topk": SQL_ANN_TOPK,
    "emb_near_dup_pairs": SQL_EMB_NEAR_DUP_PAIRS,
}
