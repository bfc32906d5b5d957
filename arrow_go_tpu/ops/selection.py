"""Selection kernels: filter and take over device columns.

TPU-native counterpart of the reference's vector_selection kernels
(arrow/compute/internal/kernels/vector_selection.go — primitiveFilterImpl
bit-run batching, getTakeIndices at :102, take-with-bounds-check). The
XLA-static-shape answer to dynamic output sizes (SURVEY.md §7 hard parts)
is count-then-materialize: ONE stable sort on the selection flag
compacts selected rows to the front (XLA TPU scatter is serial —
benchmarks/roofline_probe4.py), yielding the dense index vector plus a
device-scalar count; trimming to the true length happens only at a host
boundary.

Null-selection semantics match the reference's FilterOptions
(DropNulls / EmitNulls, vector_selection.go:34) and TakeOptions bounds
checking.
"""
from __future__ import annotations

from typing import Optional, Tuple

from ..jaxenv import jax, jnp
from . import bitmap

INT_IDX = jnp.int32


def filter_indices(mask: jax.Array, mask_validity: Optional[jax.Array], n,
                   null_selection: str = "drop") -> Tuple[jax.Array, jax.Array]:
    """Boolean mask -> (dense indices[P], count).

    null_selection='drop': null mask slots select nothing (reference
    SelectionDropNulls); 'emit_null': null mask slots emit a null row —
    encoded here as index -1 (consumers map -1 -> null output row).
    Slots beyond the dense prefix hold unselected row indices (safe
    gather indices in [0, P)); `count` is the number of selected rows.
    """
    P = mask.shape[0]
    valid = bitmap.length_words(P, n)
    if mask_validity is not None:
        mv = bitmap.expand_words(mask_validity & valid, P)
    else:
        mv = bitmap.expand_words(valid, P)
    m = mask & mv
    if null_selection == "emit_null":
        sel = (mask | ~mv) & bitmap.expand_words(valid, P)
        is_null_slot = ~mv & sel
    else:
        sel = m
        is_null_slot = jnp.zeros_like(sel)

    count = jnp.sum(sel.astype(INT_IDX))
    src = jnp.arange(P, dtype=INT_IDX)
    src = jnp.where(is_null_slot, -1, src)
    # stable front-compaction (blocked per-block sort + Pallas stitch on
    # TPU — 3.7x the old full-height sort, roofline_probe10; XLA scatter
    # stays out: serial, 113ms/16M, probe4)
    from .compaction import compact_flagged
    (out,) = compact_flagged(sel, (src,))
    return out, count


def filter_with_payload(mask: jax.Array, mask_validity: Optional[jax.Array],
                        n, cols, null_selection: str = "drop"):
    """Filter that carries value columns THROUGH the compaction sort
    instead of gathering afterwards — a random 16M gather costs ~144 ms
    on v5e while extra sort operands are nearly free
    (benchmarks/roofline_probe4.py), so for a handful of columns this is
    the faster single-fused kernel. Returns (compacted cols tuple,
    null-row mask over the padded domain, count)."""
    P = mask.shape[0]
    valid = bitmap.length_words(P, n)
    if mask_validity is not None:
        mv = bitmap.expand_words(mask_validity & valid, P)
    else:
        mv = bitmap.expand_words(valid, P)
    m = mask & mv
    if null_selection == "emit_null":
        sel = (mask | ~mv) & bitmap.expand_words(valid, P)
        is_null_slot = ~mv & sel
    else:
        sel = m
        is_null_slot = jnp.zeros_like(sel)
    count = jnp.sum(sel.astype(INT_IDX))
    from .compaction import compact_flagged
    if null_selection == "emit_null":
        res = compact_flagged(sel, (is_null_slot.astype(INT_IDX),)
                              + tuple(cols))
        return tuple(res[1:]), res[0] == 1, count
    # drop-nulls: the null-row lane is identically zero — skip it
    res = compact_flagged(sel, tuple(cols))
    return res, jnp.zeros(P, jnp.bool_), count


def gather(values: jax.Array, indices: jax.Array) -> jax.Array:
    """Bounds-safe gather (negative/overflow indices clamp; validity handles
    their nullness)."""
    safe = jnp.clip(indices, 0, values.shape[0] - 1)
    return jnp.take(values, safe, axis=0)


def take_validity(validity: Optional[jax.Array], indices: jax.Array,
                  count, P_out: int) -> Optional[jax.Array]:
    """Gather packed validity through an index vector; -1 indices and slots
    beyond `count` become invalid."""
    in_range = (indices >= 0) & (jnp.arange(indices.shape[0], dtype=INT_IDX)
                                 < jnp.asarray(count, INT_IDX))
    if validity is None:
        mask = in_range
    else:
        P_in_words = validity.shape[0]
        word = jnp.clip(indices, 0, P_in_words * 32 - 1)
        bits = (validity[word // 32] >> (word % 32).astype(jnp.uint32)) & jnp.uint32(1)
        mask = in_range & (bits == 1)
    return bitmap.pack_mask(mask[:P_out])


def take_indices_checked(indices: jax.Array, indices_validity: Optional[jax.Array],
                         n_idx, n_src) -> jax.Array:
    """Bounds check for take (reference take w/ BoundsCheck): any in-range
    row with index outside [0, n_src) is flagged; returns count of violations
    as a device scalar (host raises)."""
    P = indices.shape[0]
    row = jnp.arange(P, dtype=INT_IDX) < jnp.asarray(n_idx, INT_IDX)
    if indices_validity is not None:
        row = row & bitmap.expand_words(indices_validity, P)
    bad = row & ((indices < 0) | (indices >= jnp.asarray(n_src, indices.dtype)))
    return jnp.sum(bad.astype(jnp.int32))
