"""Decimal128 device arithmetic over (lo: uint64, hi: uint64) limb pairs.

Reference semantics: arrow/decimal128/decimal128.go (two's-complement
128-bit add/sub/mul/cmp/negate). TPU has no int128; XLA emulates u64, and
multiplication splits into 32-bit limbs so every partial product fits
u64 without losing carries (SURVEY.md §7 hard parts).

Columns arrive as jax arrays of shape (P, 2) uint64, [:, 0] = lo,
[:, 1] = hi (little-endian limb order, matching device/block.py).
"""
from __future__ import annotations

from ..jaxenv import jax, jnp

U64 = jnp.uint64
MASK32 = jnp.uint64(0xFFFFFFFF)


def _split(v):
    return v & MASK32, v >> jnp.uint64(32)


def add128(a, b):
    """(P,2) + (P,2) -> (P,2) with carry, wrapping (two's complement)."""
    lo = a[:, 0] + b[:, 0]
    carry = (lo < a[:, 0]).astype(U64)
    hi = a[:, 1] + b[:, 1] + carry
    return jnp.stack([lo, hi], axis=1)


def neg128(a):
    lo = ~a[:, 0] + jnp.uint64(1)
    # ~a.lo + 1 wraps to 0 only when a.lo == 0 -> carry into hi
    carry = (a[:, 0] == 0).astype(U64)
    hi = ~a[:, 1] + carry
    return jnp.stack([lo, hi], axis=1)


def sub128(a, b):
    return add128(a, neg128(b))


def mul128(a, b):
    """Low 128 bits of the product (wrapping), via 32-bit limbs."""
    a0, a1 = _split(a[:, 0])
    a2, a3 = _split(a[:, 1])
    b0, b1 = _split(b[:, 0])
    b2, b3 = _split(b[:, 1])
    # partial products contributing to limbs 0..3 (32-bit limbs)
    p0 = a0 * b0
    p1 = a0 * b1 + a1 * b0
    p2 = a0 * b2 + a1 * b1 + a2 * b0
    p3 = a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0
    l0 = p0 & MASK32
    c = p0 >> jnp.uint64(32)
    t1 = p1 + c
    l1 = t1 & MASK32
    c = t1 >> jnp.uint64(32)
    t2 = p2 + c
    l2 = t2 & MASK32
    c = t2 >> jnp.uint64(32)
    t3 = p3 + c
    l3 = t3 & MASK32
    lo = l0 | (l1 << jnp.uint64(32))
    hi = l2 | (l3 << jnp.uint64(32))
    return jnp.stack([lo, hi], axis=1)


def cmp128(a, b):
    """Signed compare: -1 / 0 / 1 as int32."""
    sa = jax.lax.bitcast_convert_type(a[:, 1], jnp.int64)
    sb = jax.lax.bitcast_convert_type(b[:, 1], jnp.int64)
    hi_lt = sa < sb
    hi_gt = sa > sb
    lo_lt = a[:, 0] < b[:, 0]
    lo_gt = a[:, 0] > b[:, 0]
    out = jnp.where(hi_lt, -1, jnp.where(hi_gt, 1,
                    jnp.where(lo_lt, -1, jnp.where(lo_gt, 1, 0))))
    return out.astype(jnp.int32)


def is_negative(a):
    return jax.lax.bitcast_convert_type(a[:, 1], jnp.int64) < 0


def from_int64(v):
    """int64 column -> (P,2) decimal limbs (sign-extended)."""
    lo = jax.lax.bitcast_convert_type(v, U64)
    hi = jax.lax.bitcast_convert_type(v >> jnp.int64(63), U64)
    return jnp.stack([lo, hi], axis=1)


def scale_by_pow10(a, k: int):
    """a * 10^k (k >= 0 static) — decimal rescale (reference Rescale)."""
    out = a
    ten = None
    for _ in range(k):
        # multiply by 10 = (x << 3) + (x << 1)
        x8 = jnp.stack([out[:, 0] << jnp.uint64(3),
                        (out[:, 1] << jnp.uint64(3))
                        | (out[:, 0] >> jnp.uint64(61))], axis=1)
        x2 = jnp.stack([out[:, 0] << jnp.uint64(1),
                        (out[:, 1] << jnp.uint64(1))
                        | (out[:, 0] >> jnp.uint64(63))], axis=1)
        out = add128(x8, x2)
    return out
