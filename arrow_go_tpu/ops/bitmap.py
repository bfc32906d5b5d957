"""Device-side packed-bitmap ops (uint32 validity words).

TPU-native counterpart of the reference's SIMD bitmap kernels
(arrow/bitutil/_lib/bitmap_ops.c AND/OR word ops, CountSetBits). Words are
uint32, LSB-first within a word, word w bit b <-> row w*32+b.
"""
from __future__ import annotations

from typing import Optional

from ..jaxenv import jax, jnp

WORD_BITS = 32


def expand_words(words: jax.Array, padded: int) -> jax.Array:
    """packed uint32 words -> bool mask of shape (padded,)."""
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    bits = (words[:, None] >> shifts[None, :]) & jnp.uint32(1)
    return bits.reshape(-1)[:padded].astype(jnp.bool_)


def pack_mask(mask: jax.Array) -> jax.Array:
    """bool mask -> packed uint32 words (zero-pads to a word boundary)."""
    P = mask.shape[0]
    if P % WORD_BITS:
        mask = jnp.concatenate(
            [mask, jnp.zeros(WORD_BITS - P % WORD_BITS, mask.dtype)])
    m = mask.reshape(-1, WORD_BITS).astype(jnp.uint32)
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    return jnp.sum(m << shifts[None, :], axis=1, dtype=jnp.uint32)


def popcount_words(words: jax.Array) -> jax.Array:
    """Total set bits (device scalar int32)."""
    return jnp.sum(jax.lax.population_count(words).astype(jnp.int32))


def words_and(a: Optional[jax.Array], b: Optional[jax.Array]) -> Optional[jax.Array]:
    """Null-intersection of two packed validity buffers (the executor-kernel
    contract NullHandling=Intersection, reference compute/exec/kernel.go:457)."""
    if a is None:
        return b
    if b is None:
        return a
    return a & b


def words_or(a: jax.Array, b: jax.Array) -> jax.Array:
    return a | b


def words_xor(a: jax.Array, b: jax.Array) -> jax.Array:
    return a ^ b


def words_not(a: jax.Array, padded: int) -> jax.Array:
    """NOT with padding bits kept zero."""
    inv = ~a
    return inv & _pad_guard(a.shape[0], padded)


def _pad_guard(nwords: int, padded: int) -> jax.Array:
    """Word mask that zeroes bits >= padded (all-ones when padded==nwords*32)."""
    idx = jnp.arange(nwords, dtype=jnp.int32) * WORD_BITS
    full = jnp.uint32(0xFFFFFFFF)
    rem = padded - idx
    rem = jnp.clip(rem, 0, WORD_BITS)
    return jnp.where(rem >= WORD_BITS, full,
                     (jnp.uint32(1) << rem.astype(jnp.uint32)) - jnp.uint32(1))


def length_words(padded: int, length) -> jax.Array:
    """Packed words of the row mask i < length."""
    nwords = padded // WORD_BITS
    idx = jnp.arange(nwords, dtype=jnp.int32) * WORD_BITS
    length = jnp.asarray(length, jnp.int32)
    rem = jnp.clip(length - idx, 0, WORD_BITS)
    full = jnp.uint32(0xFFFFFFFF)
    return jnp.where(rem >= WORD_BITS, full,
                     (jnp.uint32(1) << rem.astype(jnp.uint32)) - jnp.uint32(1))
