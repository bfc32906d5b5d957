"""Blocked-compaction unit tests (ops/compaction.py).

On the CPU test mesh compact_flagged takes the global-sort fallback, so
these tests pin the SEMANTICS (stable front-compaction, padded-domain
tail convention, dtype round-trips through the 32-bit lane codec); the
blocked Pallas path itself is exercised bit-exactly on real TPU by
ci/tpu_smoke.py (filter/group-by checks at n=65536 > 4*BLOCK) and by
benchmarks/roofline_probe10.py's correctness fence.
"""
import numpy as np
import pytest

from arrow_go_tpu.jaxenv import jnp
from arrow_go_tpu.ops import compaction


DTYPES = ["bool", "int8", "uint16", "int32", "uint32", "int64", "uint64",
          "float16", "float32", "float64"]


def _rand(rng, dt, n):
    if dt == "bool":
        return rng.random(n) > 0.4
    if dt.startswith("float"):
        return (rng.standard_normal(n)).astype(dt)
    info = np.iinfo(dt)
    return rng.integers(info.min, int(info.max) + 1, n, dtype=np.dtype(dt))


@pytest.mark.parametrize("dt", DTYPES)
def test_compact_flagged_matches_numpy(dt):
    rng = np.random.default_rng(7)
    n = 5000
    keep = rng.random(n) > 0.5
    a = _rand(rng, dt, n)
    (out,) = compaction.compact_flagged(jnp.asarray(keep),
                                        (jnp.asarray(a),))
    c = int(keep.sum())
    got = np.asarray(out)
    assert got.dtype == a.dtype
    assert got.shape[0] == n
    np.testing.assert_array_equal(got[:c], a[keep])


def test_compact_flagged_stability_and_multi_payload():
    rng = np.random.default_rng(3)
    n = 4096
    keep = rng.random(n) > 0.7
    ids = np.arange(n, dtype=np.int32)
    vals = rng.standard_normal(n)
    out_i, out_v = compaction.compact_flagged(
        jnp.asarray(keep), (jnp.asarray(ids), jnp.asarray(vals)))
    c = int(keep.sum())
    np.testing.assert_array_equal(np.asarray(out_i)[:c], ids[keep])
    np.testing.assert_array_equal(np.asarray(out_v)[:c], vals[keep])
    # kept order strictly increasing == stability
    assert np.all(np.diff(np.asarray(out_i)[:c]) > 0)


def test_lane_codec_roundtrip_all_dtypes():
    rng = np.random.default_rng(11)
    n = 257
    for dt in DTYPES:
        a = _rand(rng, dt, n)
        lanes, dec = compaction._to_lanes(jnp.asarray(a))
        # simulate the stitch: every lane becomes i32
        lanes_i32 = [l.astype(jnp.int32) for l in lanes]
        back = np.asarray(dec(lanes_i32))
        assert back.dtype == a.dtype, dt
        np.testing.assert_array_equal(back, a, err_msg=dt)


def test_f64_bits_inverse_on_host():
    from arrow_go_tpu.ops.sort import f64_bits, f64_from_bits
    v = np.array([0.0, -0.0, 1.0, -1.0, 0.5, 3.25, np.inf, -np.inf,
                  np.nan, 2.0**90, -(2.0**-90), 1/3, 1e15 + 0.5])
    bits = f64_bits(jnp.asarray(v))
    back = np.asarray(f64_from_bits(bits))
    same = (back == v) | (np.isnan(back) & np.isnan(v))
    assert same.all()
