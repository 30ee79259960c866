"""Merging t-digest (Dunning & Ertl) — the scale path for per-group quantiles.

The reference's ``quantileExact`` (``copy_iqr.pipe:47-49``) needs the whole
group in memory; at 10^12 rows the engine accumulates one digest per
(group, block) inside ``map_batches`` and merges digests — they are mergeable
by construction. The exact path (:func:`..functions.scalar.ch_quantile_exact`)
remains the default below ``ValidationConfig.exact_quantile_limit`` rows and is
what conformance fixtures assert against; the digest path is the documented
approximation (SURVEY.md §2.5 A3).

Pure numpy implementation of the *merging* variant: buffer points, then merge
sorted (mean, weight) pairs into centroids bounded by the k1 scale function.
"""

from __future__ import annotations

import math

import numpy as np


class TDigest:
    __slots__ = ("compression", "_means", "_weights", "_buf", "_buf_w")

    def __init__(self, compression: float = 200.0):
        self.compression = float(compression)
        self._means = np.empty(0, dtype="float64")
        self._weights = np.empty(0, dtype="float64")
        self._buf: list[np.ndarray] = []
        self._buf_w: list[np.ndarray] = []

    # -- ingest ------------------------------------------------------------

    def add_array(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype="float64")
        v = v[~np.isnan(v)]
        if v.size:
            self._buf.append(v)
            self._buf_w.append(np.ones_like(v))
            if sum(b.size for b in self._buf) > 8192:
                self._flush()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        other._flush()
        if other._means.size:
            self._buf.append(other._means)
            self._buf_w.append(other._weights)
        self._flush()
        return self

    # -- internals ---------------------------------------------------------

    def _k(self, q: float) -> float:
        # k1 scale function: delta/(2*pi) * asin(2q - 1)
        return self.compression / (2.0 * math.pi) * math.asin(2.0 * q - 1.0)

    def _flush(self) -> None:
        if not self._buf and self._means.size == 0:
            return
        means = np.concatenate([self._means] + self._buf) if self._buf else self._means
        weights = np.concatenate([self._weights] + self._buf_w) if self._buf_w else self._weights
        self._buf, self._buf_w = [], []
        if means.size == 0:
            return
        order = np.argsort(means, kind="mergesort")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_means: list[float] = []
        out_weights: list[float] = []
        cur_m, cur_w = means[0], weights[0]
        w_so_far = 0.0
        k_limit = self._k(min((w_so_far + cur_w) / total, 1.0))
        k_left = self._k(0.0)
        for m, w in zip(means[1:], weights[1:]):
            q_new = (w_so_far + cur_w + w) / total
            if self._k(min(q_new, 1.0)) - k_left <= 1.0:
                cur_m += (m - cur_m) * (w / (cur_w + w))
                cur_w += w
            else:
                out_means.append(cur_m)
                out_weights.append(cur_w)
                w_so_far += cur_w
                k_left = self._k(w_so_far / total)
                cur_m, cur_w = m, w
        out_means.append(cur_m)
        out_weights.append(cur_w)
        self._means = np.asarray(out_means)
        self._weights = np.asarray(out_weights)

    # -- queries -----------------------------------------------------------

    @property
    def n(self) -> float:
        self._flush()
        return float(self._weights.sum())

    def quantile(self, q: float) -> float:
        self._flush()
        if self._means.size == 0:
            return float("nan")
        if self._means.size == 1:
            return float(self._means[0])
        w = self._weights
        cum = np.cumsum(w) - 0.5 * w  # centroid centers
        target = q * w.sum()
        i = np.searchsorted(cum, target)
        if i == 0:
            return float(self._means[0])
        if i >= self._means.size:
            return float(self._means[-1])
        # linear interpolation between adjacent centroid centers
        c0, c1 = cum[i - 1], cum[i]
        m0, m1 = self._means[i - 1], self._means[i]
        frac = (target - c0) / (c1 - c0) if c1 > c0 else 0.0
        return float(m0 + (m1 - m0) * frac)

    # -- (de)serialization for manifest snapshots --------------------------

    def to_dict(self) -> dict:
        self._flush()
        return {
            "compression": self.compression,
            "means": self._means.tolist(),
            "weights": self._weights.tolist(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TDigest":
        t = cls(compression=d["compression"])
        t._means = np.asarray(d["means"], dtype="float64")
        t._weights = np.asarray(d["weights"], dtype="float64")
        return t
