"""Hash join over record batches (single chip).

North-star config #5 machinery (BASELINE.json): the local join kernel under
the distributed hash join. Device algorithm: encode both sides' keys into
ONE shared code space (sort-based encode over the concatenated key column),
then run the SORT-MERGE core (parallel/join.py: one combined sort of
[build; probe], prefix-sum match counts, scatter-fill pair expansion) —
every step is static-shape XLA; output cardinality is fetched once at
the host boundary to size the result bucket (count-then-materialize).

Supported: inner, left outer, right outer, full outer, left semi,
left anti; multi-column keys; null keys never match (SQL semantics).
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, take_host
from ..array.record import RecordBatch, Table
from ..device.block import DeviceBatch, batch_to_device, row_mask
from ..ops import bitmap, hashing
from .errors import ArrowInvalid, ArrowNotImplemented

_HOWS = ("inner", "left outer", "right outer", "full outer",
         "left semi", "left anti", "right semi", "right anti")


_codes_progs = {}


def _key_codes(left: DeviceBatch, right: DeviceBatch,
               left_keys: Sequence[str], right_keys: Sequence[str]):
    """Shared-space dense codes for both sides (-1 = null/padding).
    The encode runs as ONE jitted program per key-type signature —
    eagerly it is ~40 separate dispatches, which dominates wall time
    on dispatch-latency-bound links (the remote-TPU tunnel)."""
    lvs, rvs, lms, rms, types = [], [], [], [], []
    for lname, rname in zip(left_keys, right_keys):
        lc, rc = left.column(lname), right.column(rname)
        if lc.type.id == dt.TypeId.DICTIONARY or \
                rc.type.id == dt.TypeId.DICTIONARY:
            lv, rv = _shared_dict_codes(lc, rc)
            t = dt.int32
        else:
            if lc.values.dtype != rc.values.dtype:
                raise ArrowInvalid(
                    f"join key dtype mismatch: {lc.type} vs {rc.type}")
            lv, rv = lc.values, rc.values
            t = lc.type
        lvs.append(lv)
        rvs.append(rv)
        lms.append(_valid(lc))
        rms.append(_valid(rc))
        types.append(t)

    sig = tuple(str(t) for t in types)
    prog = _codes_progs.get(sig)
    if prog is None:
        key_types = tuple(types)

        def raw(lvs_, rvs_, lms_, rms_):
            PL = lvs_[0].shape[0]
            combined = None
            for lv_, rv_, lm_, rm_, t_ in zip(lvs_, rvs_, lms_, rms_,
                                              key_types):
                both = jnp.concatenate([lv_, rv_])
                words = bitmap.pack_mask(jnp.concatenate([lm_, rm_]))
                res = hashing.encode_codes(both, t_, words,
                                           both.shape[0], order="key")
                card = res.n_unique.astype(jnp.int64) + 1
                part = jnp.where(res.codes >= 0,
                                 res.codes.astype(jnp.int64), -1)
                if combined is None:
                    combined = part
                else:
                    combined = jnp.where((combined >= 0) & (part >= 0),
                                         combined * card + part, -1)
            return combined[:PL], combined[PL:]

        prog = jax.jit(raw)
        _codes_progs[sig] = prog
    return prog(tuple(lvs), tuple(rvs), tuple(lms), tuple(rms))


def _valid(c):
    return c.validity_mask()


def _shared_dict_codes(lc, rc):
    """Map both dictionary columns into one shared code space.

    Vectorized over the two dictionaries' FLAT bytes
    (utils/rowhash.factorize_segments over [left dict; right dict]) —
    O(dictionary bytes), no per-value Python (the memo loop this
    replaces cost one interpreter iteration per distinct key: 16M
    iterations for a 16M-distinct string side). Dictionaries with null
    entries (or non-binary layouts) take the exact memo fallback."""
    if lc.type.id != dt.TypeId.DICTIONARY or \
            rc.type.id != dt.TypeId.DICTIONARY:
        raise ArrowInvalid("join keys must both be strings/dictionary")
    from ..utils import rowhash
    ld, rd = lc.dictionary, rc.dictionary
    codes = None
    if not ld.null_count and not rd.null_count:
        try:
            d1, s1, l1 = rowhash.binary_segments(ld)
            d2, s2, l2 = rowhash.binary_segments(rd)
            # segments are contiguous (Arrow offsets / flattened views):
            # rebuild ONE contiguous stream so the native memo applies
            base1 = int(s1[0]) if len(s1) else 0
            end1 = int(s1[-1] + l1[-1]) if len(s1) else 0
            base2 = int(s2[0]) if len(s2) else 0
            end2 = int(s2[-1] + l2[-1]) if len(s2) else 0
            data = np.concatenate([d1[base1:end1], d2[base2:end2]])
            starts = np.concatenate([s1 - base1,
                                     s2 - base2 + (end1 - base1)])
            lens = np.concatenate([l1, l2])
            from .. import native
            offs = (np.concatenate([starts, starts[-1:] + lens[-1:]])
                    if len(starts) else np.zeros(1, np.int64))
            nres = native.factorize_offsets(data, offs)
            if nres is not None:
                codes = nres[0]
            else:
                rres = rowhash.factorize_segments(data, starts, lens)
                codes = None if rres is None else rres[0]
        except NotImplementedError:
            codes = None
    if codes is not None:
        k1 = len(ld)
        m1 = jnp.asarray(codes[:k1]) if k1 else jnp.zeros(1, jnp.int32)
        m2 = (jnp.asarray(codes[k1:]) if len(rd)
              else jnp.zeros(1, jnp.int32))
        lv = jnp.take(m1, jnp.clip(lc.values, 0, max(k1 - 1, 0)))
        rv = jnp.take(m2, jnp.clip(rc.values, 0, max(len(rd) - 1, 0)))
        return lv, rv

    memo = {}

    def remap(col):
        vals = col.dictionary.to_pylist()
        m = np.empty(max(len(vals), 1), dtype=np.int32)
        for i, v in enumerate(vals):
            if v not in memo:
                memo[v] = len(memo)
            m[i] = memo[v]
        return jnp.take(jnp.asarray(m),
                        jnp.clip(col.values, 0,
                                 max(len(vals) - 1, 0)))

    return remap(lc), remap(rc)


_state_jit = None
_expand_jit = None


def _jit_state():
    global _state_jit
    if _state_jit is None:
        from ..parallel.join import join_sorted_state
        _state_jit = jax.jit(join_sorted_state, static_argnames=("how",))
    return _state_jit


def _jit_expand():
    global _expand_jit
    if _expand_jit is None:
        from ..parallel.join import join_expand
        _expand_jit = jax.jit(join_expand, static_argnums=(1,))
    return _expand_jit


#: probe rows per chunk when the probe side streams through the join
#: core (memory-bounded execution: expansion buffers scale with the
#: CHUNK, not the table, so a 134M-row probe cannot blow HBM — the
#: reference's ChunkSize-bounded span property, compute/executor.go:757)
PROBE_CHUNK_DEFAULT = 1 << 23

#: join types where probe-side chunking is an exact decomposition
#: (each left row's output depends only on itself and the build side)
_CHUNKABLE = ("inner", "left outer", "left semi", "left anti")


def hash_join(left, right, keys=None, *, left_keys=None, right_keys=None,
              join_type: str = "inner",
              left_suffix: str = "", right_suffix: str = "_right",
              probe_chunk: Optional[int] = None,
              output_columns: Optional[Sequence[str]] = None) -> RecordBatch:
    """Join two record batches / tables.

    `output_columns` projects the join output: only the named columns
    (pre- or post-suffix names both match) are materialized — each
    dropped column saves an out_n-row gather in the emission program.

    When the probe (left) side exceeds `probe_chunk` rows (default 8M)
    and the join type decomposes over probe rows, the probe streams
    through the build side chunk by chunk: device memory is bounded by
    the chunk's expansion buffers instead of the full pair count.

    DeviceBatch inputs compose device-resident: the joined columns stay
    in HBM and a DeviceBatch returns (inner/outer types; pass the
    result straight to filter/group_by/expressions — values never leave
    the device between operators)."""
    if join_type not in _HOWS:
        raise ArrowNotImplemented(f"join type {join_type!r}")
    from ..device.block import DeviceBatch
    device_io = isinstance(left, DeviceBatch) or isinstance(right,
                                                            DeviceBatch)
    if device_io:
        if join_type not in ("inner", "left outer", "right outer",
                             "full outer"):
            raise ArrowNotImplemented(
                "device-batch join supports inner/outer types")
        if keys is not None:
            if isinstance(keys, str):
                keys = [keys]
            left_keys = right_keys = list(keys)
        if isinstance(left_keys, str):
            left_keys = [left_keys]
        if isinstance(right_keys, str):
            right_keys = [right_keys]
        ldb = (left if isinstance(left, DeviceBatch)
               else batch_to_device(_as_batch(left)))
        rdb = (right if isinstance(right, DeviceBatch)
               else batch_to_device(_as_batch(right)))
        return _join_device(ldb, rdb, left_keys, right_keys, join_type,
                            left_suffix, right_suffix, device_out=True,
                            output_columns=output_columns)
    left = _as_batch(left)
    right = _as_batch(right)
    chunk = probe_chunk or PROBE_CHUNK_DEFAULT
    if left.num_rows > chunk and join_type in _CHUNKABLE:
        from ..array.concat import concat_arrays
        parts = []
        for lo in range(0, left.num_rows, chunk):
            parts.append(hash_join(
                left.slice(lo, min(chunk, left.num_rows - lo)), right,
                keys, left_keys=left_keys, right_keys=right_keys,
                join_type=join_type, left_suffix=left_suffix,
                right_suffix=right_suffix, probe_chunk=chunk,
                output_columns=output_columns))
        cols = [concat_arrays([p.columns[i] for p in parts])
                for i in range(parts[0].num_columns)]
        return RecordBatch.from_arrays(cols, list(parts[0].schema.names))
    if keys is not None:
        if isinstance(keys, str):
            keys = [keys]
        left_keys = right_keys = list(keys)
    if isinstance(left_keys, str):
        left_keys = [left_keys]
    if isinstance(right_keys, str):
        right_keys = [right_keys]

    ldb, rdb = batch_to_device(left), batch_to_device(right)
    lcodes, rcodes = _key_codes(ldb, rdb, left_keys, right_keys)
    PL, PR = ldb.padded, rdb.padded

    lvalid = row_mask(PL, ldb.length) & (lcodes >= 0)
    rvalid = row_mask(PR, rdb.length) & (rcodes >= 0)

    # common join types ride the sort-merge core (parallel/join.py —
    # probe4: searchsorted costs ~430ms/16M queries on v5e, the merged
    # sort ~50ms). Count-then-materialize: one cheap cap=1 pass sizes
    # the output, then the real expansion runs at the padded capacity.
    from ..parallel.join import local_join_semi
    if join_type in ("left semi", "left anti"):
        verdict = local_join_semi(lcodes, lvalid, rcodes, rvalid, join_type)
        mask = verdict if join_type == "left semi" else \
            (verdict | ~(lcodes >= 0)) & row_mask(PL, ldb.length)
        return _project(_select_left(
            left, mask & row_mask(PL, ldb.length), ldb.length),
            output_columns)
    if join_type in ("right semi", "right anti"):
        how_swapped = ("left semi" if join_type == "right semi"
                       else "left anti")
        verdict = local_join_semi(rcodes, rvalid, lcodes, lvalid,
                                  how_swapped)
        mask = verdict if join_type == "right semi" else \
            (verdict | ~(rcodes >= 0)) & row_mask(PR, rdb.length)
        return _project(_select_left(
            right, mask & row_mask(PR, rdb.length), rdb.length),
            output_columns)

    return _join_device(ldb, rdb, left_keys, right_keys, join_type,
                        left_suffix, right_suffix, device_out=False,
                        host_left=left, host_right=right,
                        codes=(lcodes, rcodes),
                        output_columns=output_columns)


def _join_device(ldb, rdb, left_keys, right_keys, join_type,
                 left_suffix, right_suffix, device_out,
                 host_left=None, host_right=None, codes=None,
                 output_columns=None):
    """Inner/outer join core over DeviceBatches — TWO jitted phases
    sharing the sorted state: phase 1 sorts + counts once (the old
    count-then-materialize ran the FULL join twice), the host reads
    `total` to size the output bucket, phase 2 expands at that cap."""
    from ..device.block import pad_length
    if codes is None:
        lcodes, rcodes = _key_codes(ldb, rdb, left_keys, right_keys)
    else:
        lcodes, rcodes = codes
    PL, PR = ldb.padded, rdb.padded
    lvalid = row_mask(PL, ldb.length) & (lcodes >= 0)
    rvalid = row_mask(PR, rdb.length) & (rcodes >= 0)
    st = _jit_state()(lcodes, lvalid, rcodes, rvalid, how=join_type)
    PRr = rdb.padded
    # outer joins also emit NULL-KEY rows of their outer side (they match
    # nothing but stay in the output with a null opposite side). ONE
    # device_get fetches total + both null counts (each int() is a full
    # round trip on dispatch-latency-bound links)
    outer_left = join_type in ("left outer", "full outer")
    outer_right = join_type in ("right outer", "full outer")
    null_left = row_mask(PL, ldb.length) & ~(lcodes >= 0)
    null_right = row_mask(PR, rdb.length) & ~(rcodes >= 0)
    total, n_null_l, n_null_r = (
        int(x) for x in jax.device_get((
            st.total,
            jnp.sum(null_left.astype(jnp.int32)) if outer_left else 0,
            jnp.sum(null_right.astype(jnp.int32)) if outer_right else 0)))
    out_n = total + n_null_l + n_null_r
    cap = pad_length(max(out_n, 1))
    li, ri_rank, _ = _jit_expand()(st, cap)
    rperm = st.rperm
    # the gather-free core returns ri as key-sorted right RANKS. The
    # hot (no null-key outer rows) path defers rank->row resolution
    # into the fused output-gather program — the eager where/take here
    # cost an extra dispatch round trip per join on the remote tunnel.
    if n_null_l or n_null_r:
        ri = jnp.where(ri_rank >= 0,
                       jnp.take(rperm, jnp.clip(ri_rank, 0,
                                                max(PRr - 1, 0))),
                       -1)
        if n_null_l:
            rows = jnp.nonzero(null_left, size=PL, fill_value=-1
                               )[0].astype(jnp.int32)
            li = jax.lax.dynamic_update_slice(li, rows[:n_null_l],
                                              (total,))
        if n_null_r:
            rows = jnp.nonzero(null_right, size=PR, fill_value=-1
                               )[0].astype(jnp.int32)
            ri = jax.lax.dynamic_update_slice(ri, rows[:n_null_r],
                                              (total + n_null_l,))
        rperm = None
    else:
        ri = ri_rank
    return _emit_join_output(
        ldb if host_left is None else host_left,
        rdb if host_right is None else host_right,
        ldb, rdb, li, ri, out_n, left_keys, right_keys,
        join_type, left_suffix, right_suffix, device_out=device_out,
        rperm=rperm, output_columns=output_columns)


_gather_prog = None


def _jit_gather_prog():
    """ONE jitted program gathering EVERY device output column of a join
    through the pair indices — the eager per-column `_take_device` chain
    it replaces cost ~50 ops x ~5 ms eager-dispatch overhead (~300 ms
    for 6 columns at 4M out-rows; the fused program is ~40 ms)."""
    global _gather_prog
    if _gather_prog is None:
        import functools
        from ..ops import selection

        @functools.partial(jax.jit, static_argnames=("trim_to",))
        def raw(li, ri, rperm, l_inputs, r_inputs, out_n, *, trim_to):
            if rperm is not None:
                # ri arrives as key-sorted right RANKS: resolve to
                # original right rows here, inside the one program
                ri = jnp.where(
                    ri >= 0,
                    jnp.take(rperm,
                             jnp.clip(ri, 0, max(rperm.shape[0] - 1, 0))),
                    -1)
            def one(idx, v, w):
                P_out = idx.shape[0]
                g = selection.gather(v, idx)[:trim_to]
                words = selection.take_validity(w, idx, out_n, P_out)
                return g, words[:(trim_to + 31) // 32]
            outs_l = tuple(one(li, v, w) for v, w in l_inputs)
            outs_r = tuple(one(ri, v, w) for v, w in r_inputs)
            return outs_l, outs_r

        _gather_prog = raw
    return _gather_prog


def _emit_join_output(left, right, ldb, rdb, li, ri, out_n,
                      left_keys, right_keys, join_type,
                      left_suffix, right_suffix,
                      device_out: bool = False, rperm=None,
                      output_columns=None) -> RecordBatch:
    """Gather output columns through the device pair indices. Device
    columns gather on device (all fused into one program); HostColumn
    passthroughs (nested types) gather via the vectorized host kernels."""
    from ..device.block import (DeviceBatch, DeviceColumn, HostColumn,
                                batch_from_device, pad_length)
    from .nested_selection import take_host_vec

    li_host = ri_host = None
    trim_to = min(pad_length(max(out_n, 1)), li.shape[0])
    want = None if output_columns is None else set(output_columns)
    # suffix decisions use the FULL (unprojected) left name set so a
    # column's output name does not depend on what else was projected
    full_left = {f.name + left_suffix for f in left.schema.fields}

    def _right_name(f):
        return f.name + (right_suffix
                         if (f.name + left_suffix) in full_left else "")

    def _want_l(f):
        return want is None or (f.name + left_suffix) in want

    def _want_r(f):
        return want is None or _right_name(f) in want

    # batch all device-column gathers into one program call (projected
    # columns only — each dropped column saves an out_n-row gather)
    dev_specs = {"l": [], "r": []}   # side -> [(db, i)]
    for i, c in enumerate(ldb.columns):
        if not isinstance(c, HostColumn) and _want_l(ldb.schema.fields[i]):
            dev_specs["l"].append(i)
    for i, c in enumerate(rdb.columns):
        if not isinstance(c, HostColumn) and _want_r(rdb.schema.fields[i]):
            dev_specs["r"].append(i)
    outs_l, outs_r = _jit_gather_prog()(
        li, ri, rperm,
        tuple((ldb.columns[i].values, ldb.columns[i].validity)
              for i in dev_specs["l"]),
        tuple((rdb.columns[i].values, rdb.columns[i].validity)
              for i in dev_specs["r"]),
        out_n, trim_to=trim_to)
    dev_results = {}
    for i, (v, w) in zip(dev_specs["l"], outs_l):
        c = ldb.columns[i]
        dev_results[("l", i)] = DeviceColumn(v, w, out_n, c.type,
                                             c.dictionary)
    for i, (v, w) in zip(dev_specs["r"], outs_r):
        c = rdb.columns[i]
        dev_results[("r", i)] = DeviceColumn(v, w, out_n, c.type,
                                             c.dictionary)

    def out_col(db, batch, i, idx, idx_host_name):
        nonlocal li_host, ri_host
        c = db.columns[i]
        if isinstance(c, HostColumn):
            if idx_host_name == "l":
                if li_host is None:
                    li_host = np.asarray(jax.device_get(li))[:out_n].astype(np.int64)
                hidx = li_host
            else:
                if ri_host is None:
                    rr = np.asarray(jax.device_get(ri))[:out_n]
                    if rperm is not None:
                        # ri holds key-sorted ranks on the hot path —
                        # resolve on the host for HostColumn gathers
                        rp = np.asarray(jax.device_get(rperm))
                        rr = np.where(
                            rr >= 0,
                            rp[np.clip(rr, 0, max(len(rp) - 1, 0))], -1)
                    ri_host = rr.astype(np.int64)
                hidx = ri_host
            return take_host_vec(batch.columns[i], hidx)
        return dev_results[(idx_host_name, i)]

    out_cols = []
    fields = []
    names: List[str] = []
    rkey_set = set(right_keys)
    for i, f in enumerate(left.schema.fields):
        if not _want_l(f):
            continue
        out_cols.append(out_col(ldb, left, i, li, "l"))
        names.append(f.name + left_suffix)
        fields.append(f.with_name(names[-1]))
    for i, f in enumerate(right.schema.fields):
        if f.name in rkey_set and join_type == "inner" and \
                f.name in set(left_keys):
            continue
        if not _want_r(f):
            continue
        nm = _right_name(f)
        out_cols.append(out_col(rdb, right, i, ri, "r"))
        names.append(nm)
        fields.append(f.with_name(nm))
    if device_out:
        # device-resident composition: columns stay in HBM
        if not all(isinstance(c, DeviceColumn) for c in out_cols):
            raise ArrowNotImplemented(
                "device-batch join output requires device-resident "
                "columns (nested columns ride host batches)")
        return DeviceBatch(dt.Schema(fields), list(out_cols), out_n)
    # assemble: device columns ride one DeviceBatch -> host batch
    host_cols = []
    for f, c in zip(fields, out_cols):
        if isinstance(c, DeviceColumn):
            db1 = DeviceBatch(dt.Schema([f]), [c], out_n)
            host_cols.append(batch_from_device(db1).columns[0])
        else:
            host_cols.append(c)
    return RecordBatch.from_arrays(host_cols, names)


def _project(batch: RecordBatch, cols) -> RecordBatch:
    if cols is None:
        return batch
    want = set(cols)
    keep = [i for i, f in enumerate(batch.schema.fields) if f.name in want]
    return RecordBatch(dt.Schema([batch.schema.fields[i] for i in keep]),
                       [batch.columns[i] for i in keep], batch.num_rows)


def _select_left(batch: RecordBatch, mask, n) -> RecordBatch:
    keep = np.asarray(jax.device_get(mask))[:n]
    idx = np.nonzero(keep)[0]
    cols = [take_host(c, idx) for c in batch.columns]
    return RecordBatch(batch.schema, cols, len(idx))


def _as_batch(x) -> RecordBatch:
    if isinstance(x, Table):
        return RecordBatch(x.schema,
                           [x.column(i).combine() for i in range(x.num_columns)],
                           x.num_rows)
    return x
