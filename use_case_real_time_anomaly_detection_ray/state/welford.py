"""Streaming Welford moments — the mergeable accumulator behind every
mean/stddevPop the validation engine computes (SURVEY.md §2.3).

The reference recomputes ``avg``/``stddevPop`` per query inside ClickHouse
(``z_score.pipe:17-18``); at 10^12 rows the engine instead accumulates
per-block partials in ``map_batches`` actor pools and merges them — Welford's
parallel-merge form (Chan et al.) is associative and numerically stable, so
partials can be combined in any order/topology.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np


@dataclass
class Welford:
    """count / null-count / mean / M2 / min / max, mergeable."""

    n: int = 0
    nulls: int = 0
    mean: float = 0.0
    m2: float = 0.0
    vmin: float = math.inf
    vmax: float = -math.inf

    def add_array(self, values: np.ndarray, nulls: int = 0) -> "Welford":
        """Fold a vector in (vectorized: one pass of numpy reductions, then a
        single merge — not a Python loop)."""
        v = np.asarray(values, dtype="float64")
        v = v[~np.isnan(v)]
        self.nulls += nulls
        if v.size == 0:
            return self
        other = Welford(
            n=int(v.size),
            mean=float(v.mean()),
            m2=float(((v - v.mean()) ** 2).sum()),
            vmin=float(v.min()),
            vmax=float(v.max()),
        )
        return self.merge(other)

    def merge(self, other: "Welford") -> "Welford":
        """Chan/Welford parallel combine."""
        if other.n == 0:
            self.nulls += other.nulls
            return self
        if self.n == 0:
            self.n, self.mean, self.m2 = other.n, other.mean, other.m2
            self.vmin, self.vmax = other.vmin, other.vmax
            self.nulls += other.nulls
            return self
        n = self.n + other.n
        delta = other.mean - self.mean
        self.m2 = self.m2 + other.m2 + delta * delta * self.n * other.n / n
        self.mean = self.mean + delta * other.n / n
        self.n = n
        self.nulls += other.nulls
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        return self

    @property
    def variance_pop(self) -> float:
        """Population variance — matches ClickHouse ``stddevPop``
        (``z_score.pipe:18``), NOT the sample estimator."""
        return self.m2 / self.n if self.n > 0 else float("nan")

    @property
    def stddev_pop(self) -> float:
        return math.sqrt(max(self.variance_pop, 0.0)) if self.n > 0 else float("nan")

    @property
    def null_rate(self) -> float:
        total = self.n + self.nulls
        return self.nulls / total if total else 0.0

    def to_dict(self) -> dict:
        return {
            "n": self.n, "nulls": self.nulls, "mean": self.mean, "m2": self.m2,
            "min": None if self.n == 0 else self.vmin,
            "max": None if self.n == 0 else self.vmax,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Welford":
        w = cls(n=int(d["n"]), nulls=int(d.get("nulls", 0)), mean=float(d["mean"]),
                m2=float(d["m2"]))
        w.vmin = math.inf if d.get("min") is None else float(d["min"])
        w.vmax = -math.inf if d.get("max") is None else float(d["max"])
        return w
