from . import bitmap, reductions, selection  # noqa: F401
