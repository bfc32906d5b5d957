"""Masked reductions: sum / min / max / count / mean / any / all.

TPU-native counterpart of arrow/math (SIMD Sum, reference
arrow/math/_lib/{int64,uint64,float64}.c) and internal/utils min/max
(_lib/min_max.c). Two implementations per op, mirroring the reference's
asm/noasm dual paths (ci runs both — SURVEY.md §4):

- ``impl="xla"``  — jnp expression, XLA-fused (the "noasm" oracle)
- ``impl="pallas"`` — hand-written Pallas kernel streaming HBM->VMEM with
  in-kernel validity-word expansion (the "asm" path)

Both accept (values[P], validity_words[P/32] | None, n) with P statically
padded; ``n`` may be a traced scalar, so one compilation serves all row
counts in a bucket.
"""
from __future__ import annotations

import functools
from typing import Optional

import numpy as np

from ..jaxenv import jax, jnp, pallas_interpret
from . import bitmap

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
WORDS_PER_LANE_ROW = LANE // 32  # 4


def _identity(op: str, dtype) -> jnp.ndarray:
    if op == "sum":
        return jnp.zeros((), dtype)
    if op == "prod":
        return jnp.ones((), dtype)
    if op == "min":
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.array(jnp.inf, dtype)
        return jnp.array(jnp.iinfo(dtype).max, dtype)
    if op == "max":
        if jnp.issubdtype(dtype, jnp.floating):
            return jnp.array(-jnp.inf, dtype)
        return jnp.array(jnp.iinfo(dtype).min, dtype)
    raise ValueError(op)


def _combine(op: str):
    return {"sum": jnp.add, "prod": jnp.multiply,
            "min": jnp.minimum, "max": jnp.maximum}[op]


def _acc_dtype(op: str, dtype):
    """Accumulator dtype: Arrow sums accumulate in the value type for 64-bit
    types; narrow ints widen to 64-bit (matches reference arrow/math which
    only exposes 64-bit sums; compute 'sum' widens)."""
    d = jnp.dtype(dtype)
    if op in ("min", "max", "prod"):
        return d
    if d.kind == "b":
        return jnp.dtype(jnp.int64)
    if d.kind == "i":
        return jnp.dtype(jnp.int64)
    if d.kind == "u":
        return jnp.dtype(jnp.uint64)
    if d == jnp.float16:
        return jnp.dtype(jnp.float32)
    return d


# ---------------------------------------------------------------------------
# XLA path
# ---------------------------------------------------------------------------

def _mask_of(values: jax.Array, validity: Optional[jax.Array], n) -> jax.Array:
    P = values.shape[0]
    m = jnp.arange(P, dtype=jnp.int32) < jnp.asarray(n, jnp.int32)
    if validity is not None:
        m = m & bitmap.expand_words(validity, P)
    return m


def reduce_xla(values: jax.Array, validity: Optional[jax.Array], n,
               op: str, mask: Optional[jax.Array] = None) -> jax.Array:
    """mask: optional precomputed bool mask (DeviceColumn.validity_mask
    cache) — word expansion costs ~2.5x the reduce itself on TPU, so
    callers holding a column pass the cached expansion."""
    acc = _acc_dtype(op, values.dtype)
    fns = {"sum": jnp.sum, "prod": jnp.prod, "min": jnp.min, "max": jnp.max}
    if op not in fns:
        raise ValueError(op)
    if mask is None and validity is None and isinstance(n, int) \
            and n == values.shape[0]:
        # all-valid fast path, no mask materialization — the analog of the
        # reference's BitBlockCounter full-block branch
        # (internal/bitutils/bit_block_counter.go:59) and of arrow/math's
        # unmasked Sum (arrow/math/float64.go:34)
        return fns[op](values.astype(acc))
    if mask is None:
        mask = _mask_of(values, validity, n)
    # `where=` lowers to a fused masked reduce — measured 2.8x faster on
    # TPU than materializing where(mask, v, ident) for emulated f64
    # (benchmarks/roofline_probe2.py: 185 -> 511 GB/s on v5e)
    return fns[op](values.astype(acc), where=mask,
                   initial=_identity(op, acc))


def count_valid(values: jax.Array, validity: Optional[jax.Array], n) -> jax.Array:
    if validity is None:
        return jnp.asarray(n, jnp.int64)
    P = values.shape[0]
    words = validity & bitmap.length_words(P, n)
    return bitmap.popcount_words(words).astype(jnp.int64)


# ---------------------------------------------------------------------------
# Pallas path
# ---------------------------------------------------------------------------

def _block_rows(P: int, itemsize: int) -> int:
    """Rows-of-128 per grid step; target ~512KB VMEM per input block."""
    rows_total = P // LANE
    target = max((512 * 1024) // (LANE * max(itemsize, 1)), 8)
    br = min(rows_total, target)
    # grid must divide evenly: shrink to a divisor
    while rows_total % br:
        br -= 1
    return max(br, 1)


def _reduce_kernel(op: str, acc_dtype, n_ref, x_ref, w_ref, out_ref):
    """Grid-sequential masked reduction. x: (BR,128) values; w: (BR,4) words;
    n: (1,1) row count in SMEM; out: (1,1) accumulator (same block each step)."""
    i = pl.program_id(0)
    br = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        out_ref[...] = jnp.full((1, 1), _identity(op, acc_dtype), acc_dtype)

    # rebuild the global row index of each element in this block
    row0 = i * br
    lane = jax.lax.broadcasted_iota(jnp.int32, (br, LANE), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (br, LANE), 0) + row0
    gidx = row * LANE + lane
    mask = gidx < n_ref[0, 0]
    if w_ref is not None:
        w = w_ref[...]  # (br, 4) int32-bitcast validity words
        # expand each word across its 32 lanes via broadcast+concat (mosaic
        # cannot shape-cast (br,4,32)->(br,128))
        w128 = jnp.concatenate(
            [jnp.broadcast_to(w[:, j:j + 1], (br, 32)) for j in range(4)], axis=1)
        # arithmetic >> then &1 still extracts the bit; avoids uint32 in-kernel
        bit = (w128 >> (lane % 32)) & 1
        mask = mask & (bit == 1)
    vals = x_ref[...].astype(acc_dtype)
    vals = jnp.where(mask, vals, _identity(op, acc_dtype))
    part = _reduce_all(op, vals).reshape(1, 1)
    out_ref[...] = _combine(op)(out_ref[...], part)


def _reduce_all(op: str, vals: jax.Array) -> jax.Array:
    return {"sum": jnp.sum, "prod": jnp.prod,
            "min": jnp.min, "max": jnp.max}[op](vals)


@functools.partial(jax.jit, static_argnames=("op", "has_validity"))
def _reduce_pallas_call(values, validity, n, *, op: str, has_validity: bool):
    P = values.shape[0]
    acc = _acc_dtype(op, values.dtype)
    x2 = values.reshape(P // LANE, LANE)
    br = _block_rows(P, values.dtype.itemsize)
    grid = (P // LANE) // br

    n_smem = jnp.asarray(n, jnp.int32).reshape(1, 1)
    # scalar n rides SMEM; value blocks stream through VMEM
    in_specs = [pl.BlockSpec((1, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((br, LANE), lambda i: (i, 0))]
    args = [n_smem, x2]
    if has_validity:
        w2 = jax.lax.bitcast_convert_type(validity, jnp.int32).reshape(
            P // LANE, WORDS_PER_LANE_ROW)
        in_specs.append(pl.BlockSpec((br, WORDS_PER_LANE_ROW), lambda i: (i, 0)))
        args.append(w2)
        kernel = lambda n_r, x_r, w_r, o_r: _reduce_kernel(op, acc, n_r, x_r, w_r, o_r)
    else:
        kernel = lambda n_r, x_r, o_r: _reduce_kernel(op, acc, n_r, x_r, None, o_r)

    # pallas kernels are pure 32-bit programs; trace them with x64 off so
    # index maps/constants stay i32 (mosaic cannot legalize i64)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((1, 1), acc),
            interpret=pallas_interpret(),
        )(*args)
    return out[0, 0]


def _pallas_supported_dtype(d) -> bool:
    """Mosaic TPU kernels handle <=32-bit lane types; 64-bit stays on the
    XLA path (XLA emulates i64/f64 on TPU; in-kernel 64-bit does not lower)."""
    d = jnp.dtype(d)
    return d.kind in "iuf" and d.itemsize <= 4


def reduce_pallas(values: jax.Array, validity: Optional[jax.Array], n,
                  op: str) -> jax.Array:
    if values.ndim != 1 or values.shape[0] % LANE:
        return reduce_xla(values, validity, n, op)
    if not _pallas_supported_dtype(values.dtype) or not _pallas_supported_dtype(
            _acc_dtype(op, values.dtype)):
        return reduce_xla(values, validity, n, op)
    if validity is None:
        return _reduce_pallas_call(values, None, n, op=op, has_validity=False)
    return _reduce_pallas_call(values, validity, n, op=op, has_validity=True)


def reduce(values: jax.Array, validity: Optional[jax.Array], n, op: str,
           impl: str = "pallas", mask: Optional[jax.Array] = None) -> jax.Array:
    """Masked reduction entry point. impl: 'pallas' | 'xla'."""
    if impl == "pallas" and mask is None:
        return reduce_pallas(values, validity, n, op)
    return reduce_xla(values, validity, n, op, mask=mask)


def mean(values: jax.Array, validity: Optional[jax.Array], n,
         impl: str = "xla") -> jax.Array:
    s = reduce(values, validity, n, "sum", impl).astype(jnp.float64)
    c = count_valid(values, validity, n).astype(jnp.float64)
    return s / jnp.maximum(c, 1)
