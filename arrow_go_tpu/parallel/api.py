"""Table-level entry points for the distributed tier.

The kernels in parallel/dist.py speak raw sharded arrays; these wrappers
speak the engine's data model: Table/RecordBatch in, host RecordBatch
out. Columns shard row-wise over the mesh (`jax.device_put` with a
NamedSharding), string keys ride as their ingest dictionary codes, and
group results come back decoded. This is the surface a reference user
reaches for ("run this GROUP BY across chips") without touching
shard_map (reference analog: the Flight endpoint fan-out a client would
hand-roll; SURVEY.md §5 distributed backend).
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, from_numpy, take_host
from ..array.record import RecordBatch, Table
from ..compute.errors import ArrowInvalid, ArrowNotImplemented
from ..device.block import DeviceColumn, batch_to_device
from . import dist
from .mesh import make_mesh, row_sharding

from jax.sharding import Mesh


def _as_batch(data) -> RecordBatch:
    if isinstance(data, Table):
        return RecordBatch(data.schema,
                           [data.column(i).combine()
                            for i in range(data.num_columns)],
                           data.num_rows)
    return data


def _shard_columns(rb: RecordBatch, names: Sequence[str], mesh: Mesh):
    """Columns -> row-sharded device arrays padded to a D multiple.
    Returns (arrays, per-column masks, combined valid mask,
    DeviceColumns for decode, n_rows). Resharding happens
    device-to-device (`jax.device_put` with the mesh sharding) — values
    never round-trip through the host."""
    D = mesh.devices.size
    sh = row_sharding(mesh)
    db = batch_to_device(rb)
    n = rb.num_rows
    P = -(-max(n, 1) // (128 * D)) * (128 * D)
    arrays, masks, cols = [], [], []
    valid = None
    for nm in names:
        c = db.column(nm)
        if not isinstance(c, DeviceColumn) or c.values.ndim != 1:
            raise ArrowNotImplemented(
                f"distributed ops need flat device columns ({nm})")
        v = c.values
        if P > c.padded:
            v = jnp.pad(v, (0, P - c.padded))
        else:
            v = v[:P]
        arrays.append(jax.device_put(v, sh))
        m = c.validity_mask()
        m = jnp.pad(m, (0, P - m.shape[0])) if P > m.shape[0] else m[:P]
        masks.append(jax.device_put(m, sh))
        valid = m if valid is None else (valid & m)
        cols.append(c)
    if valid is None:
        valid = jnp.arange(P) < n
    return arrays, masks, jax.device_put(valid, sh), cols, n


def _decode_key(vals: np.ndarray, col: DeviceColumn,
                mask: Optional[np.ndarray] = None) -> Array:
    """Decode exchanged values back to a host Array; mask (True = valid)
    restores nulls that rode the exchange as a separate bool column."""
    if col.type.id == dt.TypeId.DICTIONARY:
        codes = np.clip(vals.astype(np.int64), 0,
                        max(len(col.dictionary) - 1, 0))
        if mask is not None:
            codes = np.where(mask, codes, -1)
        return take_host(col.dictionary, codes)
    return from_numpy(vals.astype(col.type.np_dtype), mask, col.type)


def distributed_group_by(data, keys, aggregations: Sequence[Tuple[str, str]],
                         mesh: Optional[Mesh] = None,
                         cap: Optional[int] = None) -> RecordBatch:
    """GROUP BY across the mesh (pre-aggregating, skew-proof). Output
    column order matches compute.group_by: keys then '<col>_<agg>'."""
    rb = _as_batch(data)
    if isinstance(keys, str):
        keys = [keys]
    mesh = mesh or make_mesh()
    val_names: List[str] = []
    agg_specs = []
    for cname, agg in aggregations:
        if cname not in val_names:
            val_names.append(cname)
        agg_specs.append((val_names.index(cname), agg))
    key_arrays, _, valid, key_cols, n = _shard_columns(rb, keys, mesh)
    val_arrays, val_masks, _, val_cols, _ = _shard_columns(
        rb, val_names, mesh)

    D = mesh.devices.size
    if cap is None:
        cap = max(128, key_arrays[0].shape[0] // D)
    fn = dist.make_distributed_group_by(mesh, cap, len(keys),
                                        tuple(agg_specs), len(val_names))
    keys_out, aggs_out, valids_out, ngroups, overflow = fn(
        *key_arrays, *val_arrays, valid, *val_masks)
    if bool(overflow):
        raise ArrowInvalid("distributed group_by capacity overflow; "
                           "raise cap")
    ng = np.asarray(jax.device_get(ngroups))
    L = np.asarray(keys_out[0]).shape[0] // D
    keep = np.concatenate([np.arange(d * L, d * L + int(ng[d]))
                           for d in range(D)]) if ng.sum() else \
        np.zeros(0, np.int64)

    out_cols: List[Array] = []
    names: List[str] = []
    for nm, kc, ka in zip(keys, key_cols, keys_out):
        vals = np.asarray(jax.device_get(ka))[keep]
        out_cols.append(_decode_key(vals, kc))
        names.append(nm)
    for (cname, agg), ao, vo in zip(aggregations, aggs_out, valids_out):
        vals = np.asarray(jax.device_get(ao))[keep]
        mask = np.asarray(jax.device_get(vo))[keep]
        out_cols.append(from_numpy(vals, None if mask.all() else mask))
        names.append(f"{cname}_{agg}")
    return RecordBatch.from_arrays(out_cols, names)


def distributed_hash_join(left, right, keys, mesh: Optional[Mesh] = None,
                          cap_shuffle: Optional[int] = None,
                          cap_out: Optional[int] = None,
                          hot_k: int = 0, hot_thresh: int = 0,
                          left_suffix: str = "",
                          right_suffix: str = "_right") -> RecordBatch:
    """Inner join across the mesh (multi-column keys; hot_k>0 turns on
    the hot-key broadcast path for Zipf-skewed probe keys)."""
    lrb, rrb = _as_batch(left), _as_batch(right)
    if isinstance(keys, str):
        keys = [keys]
    mesh = mesh or make_mesh()
    D = mesh.devices.size
    lpay = [f.name for f in lrb.schema.fields if f.name not in keys]
    rpay = [f.name for f in rrb.schema.fields if f.name not in keys]

    lk, _, lvalid, lk_cols, _ = _shard_columns(lrb, keys, mesh)
    lp, lp_masks, _, lp_cols, _ = _shard_columns(lrb, lpay, mesh)
    rk, _, rvalid, rk_cols, _ = _shard_columns(rrb, keys, mesh)
    rp, rp_masks, _, rp_cols, _ = _shard_columns(rrb, rpay, mesh)
    # nullable payloads: each payload's validity rides the exchange as an
    # extra bool payload column and is rebuilt into output nulls below
    lp = lp + lp_masks
    rp = rp + rp_masks
    # string keys must share ONE code space across both sides
    for nm, lc, rc in zip(keys, lk_cols, rk_cols):
        if (lc.type.id == dt.TypeId.DICTIONARY) != \
                (rc.type.id == dt.TypeId.DICTIONARY):
            raise ArrowInvalid(f"join key {nm}: both sides must be "
                               "strings or both numeric")
        if lc.type.id == dt.TypeId.DICTIONARY:
            if lc.dictionary.to_pylist() != rc.dictionary.to_pylist():
                raise ArrowNotImplemented(
                    f"join key {nm}: dictionary code spaces differ; "
                    "unify dictionaries before a distributed join")
    if cap_shuffle is None:
        cap_shuffle = max(256, lk[0].shape[0] // D)
    if cap_out is None:
        # per-shard pair capacity: key-hash concentration means one shard
        # can own many keys' full fan-out; default generously to 8x the
        # GLOBAL row count (callers at large scale pass an explicit cap;
        # overflow raises with a clear message rather than truncating)
        cap_out = 8 * lk[0].shape[0]
    fn = dist.make_distributed_join(
        mesh, cap_shuffle, cap_out, n_keys=len(keys),
        n_lpay=len(lp), n_rpay=len(rp), hot_k=hot_k,
        hot_thresh=hot_thresh,
        cap_hot=max(cap_shuffle // 4, 64) if hot_k else 0,
        cap_hot_out=cap_out if hot_k else 0)
    out = fn(*lk, *lp, lvalid, *rk, *rp, rvalid)
    if bool(out[-1]):
        raise ArrowInvalid("distributed join capacity overflow; raise caps")

    def collect(keys_o, lp_o, rp_o, counts):
        cn = np.asarray(jax.device_get(counts))
        L = np.asarray(keys_o[0] if keys_o else lp_o[0]).shape[0] // D
        keep = np.concatenate([np.arange(d * L, d * L + int(cn[d]))
                               for d in range(D)]) if cn.sum() else \
            np.zeros(0, np.int64)
        nlp, nrp = len(lpay), len(rpay)
        cols, names = [], []
        for nm, kc, ka in zip(keys, lk_cols, keys_o):
            cols.append(_decode_key(np.asarray(jax.device_get(ka))[keep], kc))
            names.append(nm)
        for i, (nm, pc_) in enumerate(zip(lpay, lp_cols)):
            vals = np.asarray(jax.device_get(lp_o[i]))[keep]
            mask = np.asarray(jax.device_get(lp_o[nlp + i]))[keep]
            cols.append(_decode_key(vals, pc_,
                                    None if mask.all() else mask))
            names.append(nm + left_suffix)
        for i, (nm, pc_) in enumerate(zip(rpay, rp_cols)):
            vals = np.asarray(jax.device_get(rp_o[i]))[keep]
            mask = np.asarray(jax.device_get(rp_o[nrp + i]))[keep]
            cols.append(_decode_key(vals, pc_,
                                    None if mask.all() else mask))
            names.append(nm + (right_suffix if nm + left_suffix in names
                               else ""))
        return cols, names

    if hot_k:
        (ok, olp, orp, _rm, n_out, hk, hlp, hrp, _hrm, hn,
         bk, blp, brp, _brm, bn, _ov) = out
        c1, names = collect(ok, olp, orp, n_out)
        c2, _ = collect(hk, hlp, hrp, hn)
        c3, _ = collect(bk, blp, brp, bn)
        from ..array.concat import concat_arrays
        cols = [concat_arrays([a, b, c]) for a, b, c in zip(c1, c2, c3)]
        return RecordBatch.from_arrays(cols, names)
    ok, olp, orp, _rm, n_out, _ov = out
    cols, names = collect(ok, olp, orp, n_out)
    return RecordBatch.from_arrays(cols, names)


def distributed_sort(data, keys, mesh: Optional[Mesh] = None,
                     cap: Optional[int] = None,
                     descending=()) -> RecordBatch:
    """Multi-key sort across the mesh: range partition on the primary
    key + per-shard multi-key sort; reading shards in order is the
    global order. Null-key rows are dropped (the exchange contract;
    sort them explicitly on host if needed). Returns the sorted rows
    as one host RecordBatch."""
    rb = _as_batch(data)
    if isinstance(keys, str):
        keys = [keys]
    mesh = mesh or make_mesh()
    D = mesh.devices.size
    pay = [f.name for f in rb.schema.fields if f.name not in keys]
    karrs, _, valid, kcols, n = _shard_columns(rb, keys, mesh)
    parrs, pmasks, _, pcols, _ = _shard_columns(rb, pay, mesh)
    # nullable payloads: validity rides as extra bool payload columns
    parrs = parrs + pmasks
    if cap is None:
        cap = karrs[0].shape[0]          # worst case: all rows one shard
    fn = dist.make_distributed_sort_multi(
        mesh, cap, n_keys=len(keys), n_payload=len(parrs),
        descending=tuple(descending))
    keys_out, pay_out, counts, overflow = fn(*karrs, valid, *parrs)
    if bool(overflow):
        raise ArrowInvalid("distributed sort capacity overflow; raise cap")
    cn = np.asarray(jax.device_get(counts))
    L = np.asarray(keys_out[0]).shape[0] // D
    keep = np.concatenate([np.arange(d * L, d * L + int(cn[d]))
                           for d in range(D)]) if cn.sum() else \
        np.zeros(0, np.int64)
    cols, names = [], []
    for nm, kc, ka in zip(keys, kcols, keys_out):
        cols.append(_decode_key(np.asarray(jax.device_get(ka))[keep], kc))
        names.append(nm)
    npay = len(pay)
    for i, (nm, pc_) in enumerate(zip(pay, pcols)):
        vals = np.asarray(jax.device_get(pay_out[i]))[keep]
        mask = np.asarray(jax.device_get(pay_out[npay + i]))[keep]
        cols.append(_decode_key(vals, pc_, None if mask.all() else mask))
        names.append(nm)
    return RecordBatch.from_arrays(cols, names)
