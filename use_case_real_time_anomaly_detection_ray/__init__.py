"""Ray-Data-native anomaly-detection + data-validation engine.

A from-scratch re-expression of the semantics of
``tinybirdco/use-case-real-time-anomaly-detection`` (a Tinybird/ClickHouse
data project, read-only reference at ``/root/reference``) on top of
``ray.data.Dataset`` pipelines:

* the five detection methods (out-of-range, rate-of-change, timeout,
  z-score, IQR — reference ``tinybird/pipes/copy_*.pipe``) as vectorized
  Arrow batch transforms over any ``(id, timestamp, value)``-shaped table
  (:mod:`.pipelines.anomaly`);
* a schema + constraint validation engine over a Parquet corpus of
  source-code repositories ``(repo, path, commit, lang, content)``
  (:mod:`.pipelines.validate`, :mod:`.checks`) with per-partition verdicts,
  violation logs, checkpoint/resume and lineage;
* large-scale training-data operators: dedup (exact / MinHash-LSH /
  SimHash / n-gram Jaccard), similarity search, text analysis, multimodal
  plumbing (:mod:`.pipelines.textops`, :mod:`.pipelines.ann`).

Nothing here calls ``ray.init()`` — the caller owns the Ray session.
"""

from .config import DetectorParams, ColumnMap, ValidationConfig

__all__ = [
    "DetectorParams",
    "ColumnMap",
    "ValidationConfig",
]

__version__ = "0.1.0"
