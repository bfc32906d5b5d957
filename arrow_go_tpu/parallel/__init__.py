from .mesh import SHARD_AXIS, make_mesh, replicated, row_sharding  # noqa: F401
from . import join  # noqa: F401
from . import aggregate, shuffle, sort  # noqa: F401
