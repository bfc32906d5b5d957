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


# ---------------------------------------------------------------------------
# multi-host (DCN) — the cross-slice analog of the reference's multi-node
# Flight endpoint fan-out (SURVEY.md §5): jax's distributed runtime makes
# every host's local chips part of ONE global mesh; the shard_map exchanges
# in shuffle.py/aggregate.py/join.py/sort.py then ride ICI within a slice
# and DCN across slices with no code change.
# ---------------------------------------------------------------------------

def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Join this host to a multi-host jax runtime (idempotent). On TPU
    pods the three arguments are auto-detected from the environment; on
    CPU/GPU fleets pass them explicitly (reference analog: the Flight
    client fanning out to FlightInfo endpoints across hosts — here the
    runtime itself becomes multi-host and collectives replace RPC)."""
    # Do NOT call jax.process_count() here — it initializes the XLA
    # backend, after which distributed.initialize() unconditionally fails.
    # Probe the distributed client state directly instead.
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return   # already initialized
    except Exception:
        pass
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError) as e:
        if "before" in str(e) and "backend" in str(e).lower():
            # XLA backend already up. Single-process intent: harmless
            # no-op. Explicit multi-host args: surface the error — a
            # silent no-op here would drop the user to 1 host.
            if kwargs:
                raise RuntimeError(
                    "initialize_multihost must run before any jax call "
                    "initializes the backend") from e
            return
        msg = str(e).lower()
        if "already" in msg or "single" in msg or "auto" in msg:
            return   # single-process run or already initialized
        raise


def global_mesh() -> Mesh:
    """1-D mesh over ALL devices of ALL participating hosts
    (jax.devices() is global after initialize_multihost)."""
    return Mesh(np.array(jax.devices()), (SHARD_AXIS,))


def local_row_range(mesh: Mesh, n_rows: int) -> Sequence[int]:
    """[start, stop) of the global row range owned by this host's
    addressable shards — what a per-host ingest pipeline (Flight DoPut,
    parquet scan) should load before handing to shard_map."""
    devs = list(mesh.devices.flat)
    n = len(devs)
    per = -(-n_rows // n)
    mine = [i for i, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if not mine:
        return (0, 0)
    return (min(mine) * per, min(n_rows, (max(mine) + 1) * per))
