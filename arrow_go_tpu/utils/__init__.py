from .metrics import Metrics, metrics, trace  # noqa: F401
