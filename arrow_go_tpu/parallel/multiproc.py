"""Multi-process distributed execution (the DCN tier, runnable on CPU).

Everything else in parallel/ runs on a mesh whose devices share one OS
process. This module crosses the process boundary — the property the
reference's entire distributed story is built on (every Flight test
spins a real loopback gRPC server and the archery scenarios are driven
cross-process: reference arrow/internal/flight_integration/scenario.go:94,
cmd/arrow-flight-integration-{client,server}). The TPU-native analog is
jax's distributed runtime: N processes join one coordinator
(`jax.distributed.initialize`), their local devices form ONE global
mesh, and the same shard_map exchanges that ride ICI within a process
ride the cross-process transport (Gloo on CPU fleets, DCN on pods)
without any operator change — SURVEY.md §7 phase 7.

Worker-side helpers (called inside a spawned process):
  init_worker()       join the coordinator, return the global mesh
  global_put()        full host array -> row-sharded global array
  collect()           global array -> full host array on every process

Parent-side helpers:
  worker_env()        child env: CPU platform + K virtual local devices
  launch()            spawn N workers of a script, wait, propagate rc
"""
from __future__ import annotations

import os
import socket
import subprocess
import sys
from typing import List, Optional, Sequence

import numpy as np

from .mesh import SHARD_AXIS, initialize_multihost

# ---------------------------------------------------------------------------
# worker side
# ---------------------------------------------------------------------------


def init_worker(process_id: int, num_processes: int, port: int,
                host: str = "localhost"):
    """Join this process to the distributed runtime and return the
    global 1-D mesh over every process's devices. Must run before any
    other jax call initializes a backend."""
    initialize_multihost(coordinator_address=f"{host}:{port}",
                         num_processes=num_processes,
                         process_id=process_id)
    import jax
    from jax.sharding import Mesh
    return Mesh(np.array(jax.devices()), (SHARD_AXIS,))


def global_put(mesh, data: np.ndarray):
    """Full host array (identical on every process) -> row-sharded
    global jax.Array: each process materializes only its addressable
    shards (the multi-process form of api._shard_columns' device_put)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    sh = NamedSharding(mesh, P(SHARD_AXIS))
    return jax.make_array_from_callback(data.shape, sh,
                                        lambda idx: data[idx])


def collect(arr) -> np.ndarray:
    """Global (possibly non-fully-addressable) array -> full host
    ndarray, identical on every process (cross-process allgather)."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


# ---------------------------------------------------------------------------
# parent side
# ---------------------------------------------------------------------------


def free_port() -> int:
    s = socket.socket()
    s.bind(("", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def worker_env(local_devices: int) -> dict:
    """Child environment: pure-CPU jax with `local_devices` virtual
    devices. Strips the container's TPU plugin hook (sitecustomize
    registers the axon backend at interpreter start, which would
    initialize a backend before jax.distributed.initialize can run)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append(f"--xla_force_host_platform_device_count={local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    return env


def launch(script: str, num_processes: int, local_devices: int,
           extra_args: Sequence[str] = (), timeout: float = 600.0,
           pin_cores: Optional[Sequence[int]] = None,
           capture: bool = False) -> List[subprocess.CompletedProcess]:
    """Spawn `num_processes` workers of `script`, each receiving
    `--process-id I --num-processes N --port PORT` plus extra_args.
    pin_cores[i] pins worker i to one CPU core (honest scaling
    measurements). Raises on any non-zero exit."""
    port = free_port()
    env = worker_env(local_devices)
    procs = []
    for i in range(num_processes):
        cmd = [sys.executable, script, "--process-id", str(i),
               "--num-processes", str(num_processes),
               "--port", str(port), *extra_args]
        if pin_cores is not None:
            cmd = ["taskset", "-c", str(pin_cores[i % len(pin_cores)])] + cmd
        procs.append(subprocess.Popen(
            cmd, env=env,
            stdout=subprocess.PIPE if capture else None,
            stderr=subprocess.STDOUT if capture else None,
            text=True))
    done = []
    failed = None
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        done.append(subprocess.CompletedProcess(p.args, p.returncode, out))
        if p.returncode != 0 and failed is None:
            failed = (i, out)
    if failed is not None:
        i, out = failed
        raise RuntimeError(
            f"worker {i} exited {done[i].returncode}:\n{out or ''}")
    return done
