"""Device mesh management for the distributed tier.

The reference's only scale-out mechanism is Flight RPC host fan-out
(SURVEY.md §5 'Distributed communication backend'); the TPU-native design
replaces it with a jax.sharding.Mesh over ICI: tables hash-partition across
a 1-D 'shards' axis, exchanges ride XLA collectives inside shard_map.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..jaxenv import jax

from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(f"need {n_devices} devices, have {len(devs)}")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (SHARD_AXIS,))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Rows partitioned across shards (the engine's 'data parallel')."""
    return NamedSharding(mesh, P(SHARD_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
