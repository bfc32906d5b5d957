"""run_end_encode / run_end_decode kernels (reference
arrow/compute/vector_run_ends.go:45-90 + internal/kernels/
vector_run_end_encode.go; logical REE access arrow/encoded/ree_utils.go)."""
from __future__ import annotations

import numpy as np

from ..jaxenv import jax, jnp
from .. import dtypes as dt
from ..array.arrays import Array, ArrayData, make_array, RunEndEncodedArray
from ..device.block import DeviceColumn, from_device, row_mask, to_device
from ..memory.buffer import Buffer
from ..memory import bitutil
from .errors import ArrowInvalid, ArrowNotImplemented


def run_end_encode(values, run_end_type: dt.DataType = dt.int32) -> Array:
    """Array -> run-end-encoded array. Run detection happens on device
    (adjacent-difference scan); materialization on host."""
    from ..array.record import ChunkedArray
    if isinstance(values, ChunkedArray):
        values = values.combine()
    col = values if isinstance(values, DeviceColumn) else to_device(values)
    P, n = col.padded, col.length
    v = col.values
    valid = col.validity_mask()

    if n == 0:
        t = dt.run_end_encoded(run_end_type, values.type)
        from ..array.builders import make_builder
        return make_builder(t).finish()

    prev_v = jnp.concatenate([v[:1], v[:-1]])
    prev_valid = jnp.concatenate([valid[:1], valid[:-1]])
    same = (v == prev_v) & (valid == prev_valid)
    # null == null counts as same run
    same = jnp.where(~valid & ~prev_valid, True, same)
    start = ~same
    start = start.at[0].set(True)
    start = start & row_mask(P, n)

    starts_np = np.nonzero(np.asarray(jax.device_get(start)))[0]
    run_ends = np.append(starts_np[1:], n).astype(run_end_type.np_dtype)
    host = from_device(col) if not isinstance(values, Array) else values

    from ..array.builders import make_builder, NumericBuilder
    vt = host.type
    vb = make_builder(vt)
    for s in starts_np:
        x = host[int(s)]
        if x is None:
            vb.append_null()
        else:
            vb.append(x)
    vals_arr = vb.finish()
    re_b = NumericBuilder(run_end_type)
    for e in run_ends:
        re_b.append(int(e))
    re_arr = re_b.finish()
    t = dt.run_end_encoded(run_end_type, vt)
    return make_array(ArrayData(t, n, [], [re_arr.data, vals_arr.data],
                                null_count=0))


def run_end_decode(values) -> Array:
    if not isinstance(values, RunEndEncodedArray):
        raise ArrowInvalid("run_end_decode expects a run-end encoded array")
    return values.decode()
