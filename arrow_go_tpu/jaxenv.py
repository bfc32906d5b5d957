"""Central jax import + configuration for the framework.

Enables 64-bit types (a data engine needs exact int64/uint64 Arrow
semantics; on TPU these lower to 32-bit pairs) and decides whether Pallas
kernels run compiled (TPU) or interpreted (CPU test mesh).
"""
from __future__ import annotations

import os

import jax

# honor JAX_PLATFORMS even when a container sitecustomize already
# initialized a backend before user code ran (env alone is latched by
# then; the config update still switches)
_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

#: True when pallas kernels must run in interpret mode (non-TPU backend).
def on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def pallas_interpret() -> bool:
    if os.environ.get("AGT_FORCE_PALLAS_INTERPRET"):
        return True
    return not on_tpu()


__all__ = ["jax", "jnp", "on_tpu", "pallas_interpret"]
