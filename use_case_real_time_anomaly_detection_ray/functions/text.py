"""Deterministic text primitives for the training-data operators: tokenizing,
shingling, MinHash, SimHash, rolling-hash fingerprints, language/quality
heuristics.

All hashing is process-independent (blake2b / explicit polynomial hashes —
never Python's seeded ``hash()``), so distributed stages reproduce bit-for-bit
across workers and runs.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

# ASCII-whitespace tokenization (NOT \S+): the DuckDB oracles split on RE2's
# \s = [ \t\n\r\f] (ASCII-only, no \v), while Python's \S is Unicode-aware —
# an NBSP/U+2028 in a document would silently diverge token counts between
# engine and oracle. This set mirrors RE2 exactly.
WORD_RE = re.compile(r"[^ \t\n\r\f]+")
TOKEN_RE = re.compile(r"\w+|[^\w\s]")  # BPE-ish: words + punctuation marks
PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS = frozenset(
    "the a an of to and in is on for with as by at or be are this that it from".split()
)

_M31 = (1 << 31) - 1  # Mersenne prime modulus for all universal hashing


def words(text: str) -> list[str]:
    return WORD_RE.findall(text)


def token_count(text: str) -> int:
    """Whitespace token count — oracle-equivalent to
    ``len(regexp_split_to_array(trim(text), '\\s+'))``."""
    return len(words(text))


def bpe_ish_count(text: str) -> int:
    """Sub-word-ish token estimate: words + punctuation
    (``regexp_extract_all(text, '\\w+|[^\\w\\s]')``)."""
    return len(TOKEN_RE.findall(text))


def hash64(s: str) -> int:
    """Stable 64-bit hash (blake2b-8)."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


def hash32(s: str) -> int:
    """Stable 32-bit hash (blake2b-4) — keeps MinHash mod-mults uint64-safe."""
    return int.from_bytes(hashlib.blake2b(s.encode("utf-8"), digest_size=4).digest(), "big")


#: per-process word → 31-bit hash cache (vocabulary-bounded; shingle
#: hashing touches each word ONCE per process instead of running blake2b per
#: 3-gram occurrence). Insertions stop past the cap — lookups then fall
#: through to direct hashing, so memory stays bounded on open vocabularies.
_WH32: dict[str, int] = {}
_WH32_MAX = 2_000_000


def _word_h32(word: str) -> int:
    h = _WH32.get(word)
    if h is None:
        h = hash32(word) & _M31
        if len(_WH32) < _WH32_MAX:
            _WH32[word] = h
    return h


#: multiplier for the rolling shingle combine — any constant in (1, 2^31-1);
#: values stay < 2^31 so each `acc * P + h` step fits uint64 before the mod.
_SHINGLE_P = np.uint64(1_000_003)


def word_ngrams_str(text: str, k: int = 3) -> set[str]:
    """Distinct lowercased word k-grams as SPACE-JOINED STRINGS — the exact
    semantics of the SQL oracles' shingle CTE (docs shorter than ``k``
    words collapse to one joined gram; empty docs have none). Use where
    engine/oracle parity matters more than hashing speed (contamination
    checks); :func:`word_shingles` is the hashed fast path for MinHash."""
    w = words(text.lower())
    if not w:
        return set()
    if len(w) < k:
        return {" ".join(w)}
    return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed word k-shingles as SORTED unique uint64 values < 2^31 (the
    Mersenne-31 universal-hash domain). The shingle hash is a polynomial
    fold of per-word 31-bit hashes (cached per process) — vectorized over
    all positions, no per-3-gram digest. Distinct 3-grams collide with the
    same ~2^-31 probability as direct hashing; collisions only perturb the
    estimated Jaccard (the three-scale oracle sweeps pin the actual
    corpora)."""
    w = words(text.lower())
    if not w:
        return np.empty(0, np.uint64)
    hw = np.fromiter((_word_h32(x) for x in w), dtype=np.uint64, count=len(w))
    m = np.uint64(_M31)
    if len(w) < k:
        acc = np.uint64(0)
        for h in hw:
            acc = (acc * _SHINGLE_P + h) % m
        return np.array([acc], dtype=np.uint64)
    n_sh = len(w) - k + 1
    acc = np.zeros(n_sh, dtype=np.uint64)
    for j in range(k):
        acc = (acc * _SHINGLE_P + hw[j:j + n_sh]) % m
    return np.unique(acc)


class MinHasher:
    """n-permutation MinHash over hashed shingles: ``min((a·x + b) mod p)`` per
    permutation, vectorized. Seeded once; identical across workers."""

    def __init__(self, num_perm: int = 64, seed: int = 7):
        rng = np.random.default_rng(seed)
        # the classic universal family h(x) = (a·x + b) mod p over p = 2^31-1:
        # a, b, x all < 2^31 so a·x + b < 2^62 — single uint64 multiply, and
        # the mod wraps ~2^31 times (well-mixed; a larger p would barely wrap
        # and bias MinHash toward over-similarity)
        self.a = rng.integers(1, _M31, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _M31, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm

    def signature(self, shingle_hashes: np.ndarray) -> np.ndarray:
        return self.signatures([shingle_hashes])[0]

    def signatures(self, shingle_sets: list[np.ndarray]) -> np.ndarray:
        """Batch-vectorized: one (num_perm,) signature per document. All
        documents' shingles are concatenated and hashed in one
        (num_perm × total) matrix op; per-document minima come from
        ``np.minimum.reduceat`` at the segment boundaries — no per-document
        Python loop."""
        n_docs = len(shingle_sets)
        sigs = np.full((n_docs, self.num_perm), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        sizes = np.array([s.size for s in shingle_sets], dtype=np.int64)
        nonempty = np.flatnonzero(sizes > 0)
        if nonempty.size == 0:
            return sigs
        flat = np.concatenate([shingle_sets[j] for j in nonempty]).astype(np.uint64)
        starts = np.r_[0, np.cumsum(sizes[nonempty])[:-1]]
        m = np.uint64(_M31)
        # one permutation at a time: the full (num_perm × total) matrix would
        # be hundreds of MB per batch; per-perm the working set is one flat row
        mins = np.empty((self.num_perm, nonempty.size), dtype=np.uint64)
        for i in range(self.num_perm):
            hashed = (self.a[i] * flat + self.b[i]) % m
            mins[i] = np.minimum.reduceat(hashed, starts)
        sigs[nonempty] = mins.T
        return sigs


def _modmul_vec(a, x: np.ndarray, b=np.uint64(0)) -> np.ndarray:
    """``(a*x + b) mod 2^31-1`` for a, b, x < 2^31: product < 2^62, uint64-safe."""
    a = np.uint64(a)
    b = np.uint64(b)
    m = np.uint64(_M31)
    x = np.asarray(x, dtype=np.uint64)
    return (a * x + b) % m


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0


#: per-process word → ±1 bit-vector cache for SimHash (one blake2b + bit
#: expansion per distinct word per process; same bound discipline as _WH32).
_WBITS: dict[str, np.ndarray] = {}


def _word_bits(word: str) -> np.ndarray:
    b = _WBITS.get(word)
    if b is None:
        h = hash64(word)
        bits = ((h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        b = bits * 2 - 1  # ±1 — bit set → +1, clear → −1
        if len(_WBITS) < _WH32_MAX:
            _WBITS[word] = b
    return b


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (count-weighted). Identical output
    to the direct formulation (±1·count sums per bit); per-word bit vectors
    are cached per process and the accumulation is one stacked
    matrix-vector product per doc instead of a per-word numpy loop."""
    w = words(text.lower())
    if not w:
        return 0
    from collections import Counter

    items = Counter(w)
    mat = np.stack([_word_bits(word) for word in items])
    cnt = np.fromiter(items.values(), dtype=np.int64, count=len(items))
    acc = cnt @ mat
    return int.from_bytes(
        np.packbits((acc > 0).astype(np.uint8), bitorder="little").tobytes(),
        "little",
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def rolling_fingerprints(text: str, k: int = 8, window: int = 4) -> np.ndarray:
    """Winnowed Karp-Rabin fingerprints: k-char rolling hashes, min per window
    (document fingerprinting à la MOSS)."""
    data = np.frombuffer(text.lower().encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    n = data.size
    if n < k:
        return np.array([hash32(text.lower())], dtype=np.uint64) if n else np.empty(0, np.uint64)
    base, m = np.uint64(257), np.uint64((1 << 31) - 1)  # Mersenne-31: cur*base < 2^40
    # fully vectorized: h[i] = sum base^(k-1-j) * data[i+j] mod m; compute the
    # first window then roll: h[i] = (h[i-1] - data[i-1]*base^(k-1))*base + data[i+k-1]
    pow_k = np.uint64(1)
    for _ in range(k - 1):
        pow_k = pow_k * base % m
    h = np.empty(n - k + 1, dtype=np.uint64)
    cur = np.uint64(0)
    for j in range(k):
        cur = (cur * base + data[j]) % m
    h[0] = cur
    for i in range(1, n - k + 1):
        cur = (h[i - 1] + m - data[i - 1] * pow_k % m) % m
        cur = (cur * base + data[i + k - 1]) % m
        h[i] = cur
    if h.size <= window:
        return np.array([h.min()], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    return np.unique(sliding_window_view(h, window).min(axis=1))


# --------------------------------------------------------------------------
# language-ID + quality heuristics (n-gram/stopword based, deterministic)
# --------------------------------------------------------------------------

_LANG_MARKERS: dict[str, frozenset] = {
    "en": frozenset("the and of to in is that it for on with as are was".split()),
    "de": frozenset("der die das und ist nicht ein eine zu mit von auf für".split()),
    "es": frozenset("el la los las de que y en un una es por con para".split()),
    "fr": frozenset("le la les de et un une est que pour dans sur avec".split()),
}


def _round4_halfup(x: float) -> float:
    """floor(x*1e4 + 0.5)/1e4 — the same expression the SQL oracle evaluates,
    deterministic given an identical double (Python round() is half-even and
    disagrees on ties)."""
    import math

    return math.floor(x * 10000.0 + 0.5) / 10000.0


def lang_id(text: str) -> tuple[str, float]:
    """Heuristic language ID: argmax marker-stopword hit rate (first language
    in ``_LANG_MARKERS`` order wins ties — only a strictly greater score
    displaces the leader); CJK codepoint share short-circuits to ``zh``.
    Returns (lang, score in [0,1]); oracle-reproducible (SQL in
    ``pipelines.tqueries.SQL_DOC_LANG_ID``)."""
    if not text:
        return "und", 0.0
    cjk = sum(1 for ch in text[:4000] if "一" <= ch <= "鿿")
    if cjk > 0.05 * min(len(text), 4000):
        return "zh", _round4_halfup(cjk / min(len(text), 4000))
    w = [x.lower() for x in words(text)[:2000]]
    if not w:
        return "und", 0.0
    best, best_score = "und", 0.0
    for lang, markers in _LANG_MARKERS.items():
        score = sum(1 for x in w if x in markers) / len(w)
        if score > best_score:
            best, best_score = lang, score
    return (best, _round4_halfup(best_score)) if best_score > 0 else ("und", 0.0)


def quality_features(text: str) -> dict:
    """Length / punctuation / stopword ratios — the quality-scoring features
    (each a single division: oracle-reproducible)."""
    n_chars = len(text)
    w = words(text)
    n_words = len(w)
    n_punct = len(PUNCT_RE.findall(text))
    n_stop = sum(1 for x in w if x.lower() in STOPWORDS)
    mean_word_len = (sum(len(x) for x in w) / n_words) if n_words else 0.0
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "n_punct": n_punct,
        "n_stop": n_stop,
        "punct_ratio": n_punct / n_chars if n_chars else 0.0,
        "stop_ratio": n_stop / n_words if n_words else 0.0,
        "mean_word_len": mean_word_len,
    }
