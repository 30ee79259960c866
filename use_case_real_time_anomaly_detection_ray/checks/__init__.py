"""Check protocol + registry — the engine's user-extension surface.

The reference's extension model is "add a Pipe file and it becomes a check"
(``readme.md:44-60``; each ``tinybird/pipes/copy_*.pipe`` is one detection
method). The engine's equivalent: implement :class:`Check` and register it;
:func:`use_case_real_time_anomaly_detection_ray.pipelines.validate.run`
consumes the registry through ``ValidationConfig.checks``.

Each built-in check maps to one reference method (SURVEY.md §7); the
implementations live in ``pipelines/validate.py`` as pipeline stages — this
module is the declarative catalog binding names ↔ anomaly types ↔ stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Literal

Kind = Literal["row", "key", "gate", "schema"]


@dataclass(frozen=True)
class Check:
    """Declarative description of one constraint check.

    * ``kind="row"``   — per-row predicate over the content pass (range).
    * ``kind="key"``   — key-space scan (uniqueness, referential).
    * ``kind="gate"``  — distribution gate over the (repo, part) aggregate
      (z-score, IQR, drift-rate, staleness).
    * ``kind="schema"`` — metadata-only contract check over parquet footers.
    """

    name: str
    anomaly_type: str
    kind: Kind
    reference: str  # file:line citation into /root/reference
    params: tuple[str, ...] = ()


REGISTRY: dict[str, Check] = {
    c.name: c
    for c in [
        Check("schema", "schema", "schema",
              "BASELINE.json north_rule ('schema + constraint validation'); "
              "input_hint column contract",
              ()),
        Check("range", "out-of-range", "row",
              "tinybird/pipes/copy_out_of_range.pipe:32",
              ("min_len", "max_len")),
        Check("null_rate", "null-rate", "gate",
              "SURVEY.md §7: range-check companion (null/empty-content rate "
              "vs threshold per partition)",
              ("max_null_rate",)),
        Check("staleness", "timeout", "gate",
              "tinybird/pipes/copy_timeout.pipe:21-41",
              ("stale_parts",)),
        Check("drift_rate", "rate-of-change", "gate",
              "tinybird/pipes/copy_rate_of_change.pipe:30-58",
              ("max_slope",)),
        Check("zscore", "z-score", "gate",
              "tinybird/pipes/copy_z_score.pipe:24-56",
              ("zscore_threshold",)),
        Check("iqr", "interquartile-range", "gate",
              "tinybird/pipes/copy_iqr.pipe:45-82",
              ("iqr_multiplier",)),
        Check("lang_zscore", "z-score", "gate",
              "tinybird/pipes/copy_z_score.pipe:24-56 (metric: lang frequency)",
              ("zscore_threshold",)),
        Check("lang_iqr", "interquartile-range", "gate",
              "tinybird/pipes/copy_iqr.pipe:45-82 (metric: lang frequency)",
              ("iqr_multiplier",)),
        Check("psi_drift", "distribution-drift", "gate",
              "tinybird/pipes/copy_z_score.pipe:24-56 (point fence -> "
              "partition-histogram PSI fence)",
              ("drift_bin_width", "drift_bins", "psi_threshold")),
        Check("chi2_drift", "distribution-drift", "gate",
              "tinybird/pipes/copy_iqr.pipe:45-82 (point fence -> "
              "categorical chi-squared fence)",
              ("chi2_threshold",)),
        Check("ks_drift", "distribution-drift", "gate",
              "tinybird/pipes/copy_z_score.pipe:24-56 (point fence -> "
              "binned-ECDF Kolmogorov-Smirnov fence)",
              ("drift_bin_width", "drift_bins", "ks_threshold")),
        Check("uniqueness", "uniqueness", "key",
              "tinybird/pipes/dedup_log.pipe:6 (key machinery)",
              ()),
        Check("referential", "referential", "key",
              "BASELINE.json north_star (no reference analog)",
              ()),
    ]
}


def get(name: str) -> Check:
    return REGISTRY[name]


def anomaly_type_of(name: str) -> str:
    return REGISTRY[name].anomaly_type
