from . import join, reduce, window  # noqa: F401
