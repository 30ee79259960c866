from . import anomaly  # noqa: F401
