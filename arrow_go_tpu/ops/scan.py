"""Pallas sequential-scan kernels: bandwidth-bound cumulative ops.

The engine's forward fills ride u64-packed cumulative maxima
([owner:32][payload:32] packs, parallel/join.py) — on v5e the XLA
lowering of the chunked u64 cummax costs ~15.2 ms at 16M rows
(roofline_probe9) against an HBM roofline of ~0.35 ms. This kernel
scans in ONE pass: per 8192-row block, a Hillis-Steele scan along
lanes (7 rolls) + a row-prefix scan along sublanes (6 rolls), with the
cross-block carry held in VMEM scratch across the sequential grid.
Measured ~2.5 ms at 16M (roofline_probe11) — 6x.

u64 values travel as (hi, lo) u32 lane pairs (the v5e X64-rewrite
cannot feed s64/u64 through a pallas custom call); the combine is
lexicographic (hi, then lo), which equals u64 max on the packs.
Multiple lo lanes share one hi lane (the join's two fills share their
owner-base high word) — each lo selects independently, which agrees
with per-pack u64 max everywhere the packs can tie (ties only happen
against all-zero unset slots).

Non-TPU backends fall back to ops/groupagg.chunked_cummax on the
combined u64.
"""
from __future__ import annotations

from typing import List, Sequence

from ..jaxenv import jax, jnp, on_tpu

BLOCK_ROWS = 64           # 64 x 128 = 8192 elements per grid step


def _combine(ah, al, bh, bl):
    """(a > b) lexicographic pick on (hi, lo) u32 pairs, elementwise."""
    take_a = (ah > bh) | ((ah == bh) & (al >= bl))
    return jnp.where(take_a, ah, bh), jnp.where(take_a, al, bl)


def cummax_u64_lanes(hi: jax.Array, los: Sequence[jax.Array]
                     ) -> List[jax.Array]:
    """Inclusive running max of the packs (hi, lo_i) in flat order.

    hi: uint32[P]; los: uint32[P] each. Returns [hi_fill, lo_i_fill...]
    where element j of each output is the lane value at the position of
    the running (hi, lo_i)-lexicographic maximum over [0, j].
    P must be a multiple of 8192 for the kernel path.
    """
    P = hi.shape[0]
    los = list(los)
    if (not on_tpu()) or P % (BLOCK_ROWS * 128) or P < 4 * BLOCK_ROWS * 128:
        from .groupagg import chunked_cummax
        outs_h = None
        res = []
        for lo in los:
            pack = ((hi.astype(jnp.uint64) << jnp.uint64(32))
                    | lo.astype(jnp.uint64))
            f = chunked_cummax(pack)
            if outs_h is None:
                outs_h = (f >> jnp.uint64(32)).astype(jnp.uint32)
            res.append(f.astype(jnp.uint32))
        return [outs_h] + res

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_lo = len(los)
    rows = P // 128
    nb = rows // BLOCK_ROWS
    R = BLOCK_ROWS

    def scan_block(h, ls):
        """Inclusive flat-order scan of one (R, 128) block."""
        col = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 0)
        # lane scan (within each row)
        d = 1
        while d < 128:
            sh = pltpu.roll(h, jnp.int32(d), axis=1)
            sls = [pltpu.roll(x, jnp.int32(d), axis=1) for x in ls]
            ok = col >= d
            nh_list = []
            for i, x in enumerate(ls):
                ch, cl = _combine(h, x, sh, sls[i])
                nh_list.append((ch, cl))
            # hi is shared: all pairs agree on hi (see module docstring)
            h = jnp.where(ok, nh_list[0][0], h)
            ls = [jnp.where(ok, cl, x)
                  for (ch, cl), x in zip(nh_list, ls)]
            d *= 2
        # row-prefix scan over row totals (last lane of each row)
        th = jnp.broadcast_to(h[:, 127:128], (R, 128))
        tls = [jnp.broadcast_to(x[:, 127:128], (R, 128)) for x in ls]
        d = 1
        while d < R:
            sh = pltpu.roll(th, jnp.int32(d), axis=0)
            sls = [pltpu.roll(x, jnp.int32(d), axis=0) for x in tls]
            ok = row >= d
            pairs = [_combine(th, x, sh, sls[i])
                     for i, x in enumerate(tls)]
            th = jnp.where(ok, pairs[0][0], th)
            tls = [jnp.where(ok, cl, x)
                   for (ch, cl), x in zip(pairs, tls)]
            d *= 2
        # exclusive: shift totals down one row; row 0 keeps identity 0
        ph = jnp.where(row >= 1, pltpu.roll(th, jnp.int32(1), axis=0),
                       jnp.uint32(0))
        pls = [jnp.where(row >= 1, pltpu.roll(x, jnp.int32(1), axis=0),
                         jnp.uint32(0)) for x in tls]
        outs = [_combine(ph, pl_, h, x) for pl_, x in zip(pls, ls)]
        h_out = outs[0][0]
        ls_out = [o[1] for o in outs]
        return h_out, ls_out

    def kernel(*refs):
        h_in = refs[0]
        lo_ins = refs[1:1 + n_lo]
        h_out = refs[1 + n_lo]
        lo_outs = refs[2 + n_lo:2 + 2 * n_lo]
        carry = refs[2 + 2 * n_lo]          # (8, 128) VMEM, row 0..n_lo
        k = pl.program_id(0)

        h = h_in[...].astype(jnp.uint32)
        ls = [x[...].astype(jnp.uint32) for x in lo_ins]
        h, ls = scan_block(h, ls)

        live = k > 0
        # carry rows hold the value replicated across all 128 lanes, so
        # the read broadcasts in sublanes only (lane+sublane broadcast
        # is not implemented in Mosaic)
        ch = jnp.broadcast_to(
            jnp.where(live, carry[0:1, :], jnp.uint32(0)), (R, 128))
        cls = [jnp.broadcast_to(
            jnp.where(live, carry[1 + i:2 + i, :], jnp.uint32(0)),
            (R, 128)) for i in range(n_lo)]
        outs = [_combine(ch, cl, h, x) for cl, x in zip(cls, ls)]
        h_fin = outs[0][0]
        ls_fin = [o[1] for o in outs]
        h_out[...] = h_fin
        for i in range(n_lo):
            lo_outs[i][...] = ls_fin[i]
        # update carry with this block's final element (bottom-right)
        carry[0:1, :] = jnp.broadcast_to(
            h_fin[R - 1:R, 127:128], (1, 128))
        for i in range(n_lo):
            carry[1 + i:2 + i, :] = jnp.broadcast_to(
                ls_fin[i][R - 1:R, 127:128], (1, 128))

    in2d = [hi.reshape(rows, 128)] + [lo.reshape(rows, 128) for lo in los]
    spec = pl.BlockSpec((R, 128), lambda k: (k, 0))
    # pallas kernels are pure 32-bit programs; trace with x64 off so
    # index maps/constants stay i32 (mosaic cannot legalize i64)
    with jax.enable_x64(False):
        outs = pl.pallas_call(
            kernel,
            grid=(nb,),
            in_specs=[spec] * (1 + n_lo),
            out_specs=[spec] * (1 + n_lo),
            out_shape=[jax.ShapeDtypeStruct((rows, 128), jnp.uint32)
                       for _ in range(1 + n_lo)],
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.uint32)],
        )(*in2d)
    return [o.reshape(-1) for o in outs]
