from .welford import Welford  # noqa: F401
from .tdigest import TDigest  # noqa: F401
