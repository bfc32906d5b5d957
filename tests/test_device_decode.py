"""Device parquet-page decode kernels vs the host decoders (the
asm-vs-noasm dual-run pattern: ops/decode.py device programs must be
bit-exact against parquet/encodings.py numpy oracles)."""
import numpy as np
import pytest

from arrow_go_tpu.jaxenv import jnp
from arrow_go_tpu.ops import decode as dd
from arrow_go_tpu.parquet import encodings as enc
from arrow_go_tpu.parquet import format as fmt

rng = np.random.default_rng(42)


@pytest.mark.parametrize("bw", [1, 2, 3, 5, 7, 8, 12, 16, 20, 24, 31, 32])
def test_bitunpack_device_all_widths(bw):
    n = 1000
    hi = 2**bw
    vals = rng.integers(0, min(hi, 2**63), n).astype(np.uint32) \
        if bw < 32 else rng.integers(0, 2**32, n, dtype=np.uint64
                                     ).astype(np.uint32)
    packed = enc._pack_bits(vals, bw)
    got = np.asarray(dd.bitunpack_device(
        jnp.asarray(dd.words_from_bytes(packed)), bw, n))
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("bw", [1, 3, 8, 12, 20])
def test_rle_hybrid_decode_device(bw):
    n = 5000
    # mix of long constant runs (RLE) and noise (bit-packed groups)
    vals = np.empty(n, np.uint32)
    pos = 0
    while pos < n:
        run = int(rng.integers(1, 400))
        run = min(run, n - pos)
        if rng.random() < 0.5:
            vals[pos:pos + run] = rng.integers(0, 2**bw)
        else:
            vals[pos:pos + run] = rng.integers(0, 2**bw, run)
        pos += run
    stream = enc.rle_encode(vals, bw)
    oracle = enc.rle_decode(stream, n, bw)
    got = np.asarray(dd.rle_decode_device(stream, n, bw))
    np.testing.assert_array_equal(got, oracle)
    np.testing.assert_array_equal(got, vals)


def test_rle_decode_device_zero_width():
    assert np.asarray(dd.rle_decode_device(b"", 7, 0)).tolist() == [0] * 7


@pytest.mark.parametrize("npdt", [np.int8, np.int16, np.int32, np.int64,
                                  np.float32, np.float64])
def test_plain_decode_device(npdt):
    n = 777
    if np.dtype(npdt).kind == "f":
        vals = rng.standard_normal(n).astype(npdt)
    else:
        info = np.iinfo(npdt)
        vals = rng.integers(info.min, info.max, n).astype(npdt)
    raw = vals.tobytes()
    got = np.asarray(dd.plain_decode_device(
        jnp.asarray(np.frombuffer(raw, np.uint8)), npdt, n))
    np.testing.assert_array_equal(got, vals)


@pytest.mark.parametrize("npdt", [np.float32, np.float64])
def test_byte_stream_split_decode_device(npdt):
    n = 513
    k = np.dtype(npdt).itemsize
    vals = rng.standard_normal(n).astype(npdt)
    raw = enc.byte_stream_split_encode(vals.view(np.uint8).reshape(n, k))
    oracle = enc.byte_stream_split_decode(raw, n, k)
    got = np.asarray(dd.byte_stream_split_decode_device(
        jnp.asarray(np.frombuffer(raw, np.uint8)), npdt, n))
    np.testing.assert_array_equal(got.view(np.uint8).ravel(),
                                  np.asarray(oracle).view(np.uint8).ravel())
    np.testing.assert_array_equal(got, vals)


def test_dict_decode_device():
    dictionary = jnp.asarray(np.array([10.5, 20.5, 30.5]))
    codes = jnp.asarray(np.array([2, 0, 1, 1, 2], np.uint32))
    got = np.asarray(dd.dict_decode_device(codes, dictionary))
    np.testing.assert_array_equal(got, [30.5, 10.5, 20.5, 20.5, 30.5])


def test_levels_stream_decode_device():
    """def-levels as written by our writer (v1: 4-byte length + hybrid)."""
    levels = (rng.random(4096) < 0.9).astype(np.uint32)
    stream = enc.levels_encode_v1(levels, 1)
    oracle, used = enc.levels_decode_v1(stream, len(levels), 1)
    got = np.asarray(dd.rle_decode_device(stream[4:used], len(levels), 1))
    np.testing.assert_array_equal(got, oracle)


def test_device_delta_binary_packed_decode():
    """DELTA_BINARY_PACKED pages decode in HBM (variable-width bit-unpack
    + chunked prefix sum) — bit-exact vs pyarrow-written files with
    nulls, multi-page, snappy."""
    pa = pytest.importorskip("pyarrow")
    import io
    import pyarrow.parquet as papq
    from arrow_go_tpu import parquet as pq
    from arrow_go_tpu.parquet.device_read import read_column_device
    from arrow_go_tpu.device.block import from_device
    rng2 = np.random.default_rng(3)
    n = 20000
    vals64 = np.cumsum(rng2.integers(-1000, 1000, n)).astype(np.int64)
    mask = rng2.random(n) < 0.9
    vals32 = rng2.integers(-10**6, 10**6, n).astype(np.int32)
    pt = pa.table({
        "a": pa.array([int(v) if m else None
                       for v, m in zip(vals64, mask)], pa.int64()),
        "b": pa.array(vals32, pa.int32())})
    buf = io.BytesIO()
    papq.write_table(pt, buf, use_dictionary=False, data_page_size=4096,
                     column_encoding={"a": "DELTA_BINARY_PACKED",
                                      "b": "DELTA_BINARY_PACKED"},
                     compression="snappy")
    pf = pq.ParquetFile(buf.getvalue())
    for col in ("a", "b"):
        dev = read_column_device(pf, 0, col)
        assert from_device(dev).to_pylist() == pt.column(col).to_pylist()
