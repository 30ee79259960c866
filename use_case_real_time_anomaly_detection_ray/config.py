"""Typed configuration mirroring the reference's templated query parameters.

The reference exposes each knob as a Jinja-templated endpoint parameter with a
default (``{{ Int16(detect_window_seconds, 600, ...) }}`` —
``tinybird/pipes/out_of_range.pipe:13-15``; catalog ``readme.md:44-60``) or as a
hardcoded ``{% set ... %}`` in the scheduled copy pipes
(``tinybird/pipes/copy_out_of_range.pipe:24-27``). We mirror names and defaults.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class ColumnMap:
    """Maps the reference's canonical three-column contract (``id Int16,
    timestamp DateTime, value Float32`` — ``readme.md:106-110``) onto an
    arbitrary input table (the reference offers the same adapter idea as a
    rename Pipe, ``readme.md:106-112``)."""

    id: str = "id"
    timestamp: str = "timestamp"
    value: str = "value"

    def rename_exprs(self) -> dict[str, str]:
        return {self.id: "id", self.timestamp: "timestamp", self.value: "value"}


@dataclass(frozen=True)
class DetectorParams:
    """Parameters of the five detection methods.

    Defaults follow the scheduled copy pipes (the conformance target,
    SURVEY.md §3.2): ``copy_out_of_range.pipe:24-27`` (min 200 / max 2000 /
    61 s window), ``copy_z_score.pipe:26-29`` (threshold 2, stats 10 min),
    ``copy_iqr.pipe:52-55`` (multiplier 1.5), ``copy_rate_of_change.pipe:26-28``
    (max_slope 3), ``copy_timeout.pipe:33`` (timeout 10 s).
    """

    # None = bound not configured (one-sided checks allowed; BOTH None makes
    # the range check raise, mirroring out_of_range.pipe:28 error()).
    min_value: float | None = 200.0
    max_value: float | None = 2000.0
    detect_window_seconds: int = 61
    stats_window_minutes: int = 10
    zscore_threshold: float = 2.0
    iqr_multiplier: float = 1.5
    max_slope: float = 3.0
    timeout_seconds: int = 10
    # Optional per-sensor filter, reference `AND id = {{sensor_id}}`
    # (out_of_range.pipe:30-32 and every other endpoint).
    sensor_id: int | None = None
    # Compute z-score stats from exact integer "cents" sums (valid for
    # ≤2-decimal values; bitwise-reproducible across engines — see
    # pipelines.anomaly.per_id_mean_std).
    exact_cents: bool = False

    def with_(self, **kw) -> "DetectorParams":
        return replace(self, **kw)


@dataclass(frozen=True)
class ValidationConfig:
    """Knobs of the code-corpus validation engine (SURVEY.md §7 transposition
    table). The names deliberately mirror :class:`DetectorParams`, because each
    check re-expresses one reference detection method over
    ``(repo, path, commit, lang, content)`` rows."""

    # range check <- out-of-range (copy_out_of_range.pipe:32)
    min_len: int = 200
    max_len: int = 2000
    # null/empty-content rate per partition (SURVEY.md §7 transposition:
    # "also null/empty-content rate vs threshold")
    max_null_rate: float = 0.02
    # staleness <- timeout (copy_timeout.pipe:21-22,41): a repo whose latest
    # partition ordinal is older than `stale_parts` behind the newest is stale.
    stale_parts: int = 2
    # drift rate <- rate-of-change (copy_rate_of_change.pipe:29,58): slope of a
    # repo's mean content_length across consecutive partitions.
    max_slope: float = 3.0
    # distribution gates <- z-score / IQR (copy_z_score.pipe:55, copy_iqr.pipe:64-65)
    zscore_threshold: float = 2.0
    iqr_multiplier: float = 1.5
    # partition-level distribution-drift gates (opt-in checks psi_drift /
    # ks_drift over the content-length histogram, chi2_drift over the lang
    # frequencies — pipelines/drift.py scorers; the fences generalize the
    # z-score/IQR point fences to whole-partition distributions)
    drift_bin_width: float = 100.0
    drift_bins: int = 20
    psi_threshold: float = 0.25
    ks_threshold: float = 0.2
    chi2_threshold: float = 9.488
    # shuffle hygiene
    salt_buckets: int = 16
    # exact quantiles below this many rows per group; t-digest above
    exact_quantile_limit: int = 1_000_000
    checks: tuple[str, ...] = (
        "schema",
        "range",
        "null_rate",
        "staleness",
        "drift_rate",
        "zscore",
        "iqr",
        "lang_zscore",
        "lang_iqr",
        "uniqueness",
        "referential",
    )


#: Anomaly-type vocabulary, exactly the reference's
#: (``content/copies-pipes.md:56``).
ANOMALY_TYPES = (
    "interquartile-range",
    "out-of-range",
    "rate-of-change",
    "timeout",
    "z-score",
)

#: Target-only additions for the validation engine (BASELINE.json north_star).
EXTRA_ANOMALY_TYPES = ("uniqueness", "referential", "schema",
                       "distribution-drift", "null-rate")
