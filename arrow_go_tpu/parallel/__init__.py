from .mesh import SHARD_AXIS, make_mesh, replicated, row_sharding  # noqa: F401
from . import join  # noqa: F401
from . import aggregate, dist, overlap, shuffle, sort  # noqa: F401
from .api import (distributed_group_by, distributed_hash_join,  # noqa: F401
                  distributed_sort)
