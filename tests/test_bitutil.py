import numpy as np

from arrow_go_tpu.memory import bitutil


def test_pack_unpack_roundtrip(rng):
    for n in [0, 1, 7, 8, 9, 63, 64, 65, 1000]:
        bools = rng.random(n) < 0.5
        packed = bitutil.pack_bits(bools)
        assert np.array_equal(bitutil.unpack_bits(packed, n), bools)


def test_unpack_with_offset(rng):
    bools = rng.random(100) < 0.5
    packed = bitutil.pack_bits(bools)
    for off in [0, 1, 7, 8, 13, 64]:
        got = bitutil.unpack_bits(packed, 100 - off, off)
        assert np.array_equal(got, bools[off:])


def test_count_set_bits(rng):
    bools = rng.random(1000) < 0.3
    packed = bitutil.pack_bits(bools)
    for off, ln in [(0, 1000), (3, 900), (8, 992), (17, 100), (995, 5), (0, 0)]:
        assert bitutil.count_set_bits(packed, off, ln) == int(bools[off:off + ln].sum())


def test_get_set_clear():
    buf = np.zeros(4, dtype=np.uint8)
    bitutil.set_bit(buf, 10)
    assert bitutil.get_bit(buf, 10)
    assert not bitutil.get_bit(buf, 11)
    bitutil.clear_bit(buf, 10)
    assert not bitutil.get_bit(buf, 10)


def test_bitmap_ops(rng):
    a = rng.random(200) < 0.5
    b = rng.random(200) < 0.5
    pa_, pb = bitutil.pack_bits(a), bitutil.pack_bits(b)
    assert np.array_equal(bitutil.unpack_bits(bitutil.bitmap_and(pa_, pb, 200), 200), a & b)
    assert np.array_equal(bitutil.unpack_bits(bitutil.bitmap_or(pa_, pb, 200), 200), a | b)
    assert np.array_equal(bitutil.unpack_bits(bitutil.bitmap_not(pa_, 200), 200), ~a)


def test_bitmap_and_offset(rng):
    a = rng.random(64) < 0.5
    b = rng.random(64) < 0.5
    pa_, pb = bitutil.pack_bits(a), bitutil.pack_bits(b)
    out = bitutil.bitmap_and(pa_, pb, 50, 3, 9)
    assert np.array_equal(bitutil.unpack_bits(out, 50), a[3:53] & b[9:59])


def test_bits_to_indices(rng):
    bools = rng.random(300) < 0.2
    packed = bitutil.pack_bits(bools)
    assert np.array_equal(bitutil.bits_to_indices(packed, 300), np.nonzero(bools)[0])


def test_bit_runs():
    bools = np.array([1, 1, 0, 0, 0, 1, 0, 1, 1, 1], dtype=bool)
    runs = list(bitutil.bit_runs(bitutil.pack_bits(bools), 10))
    assert [(r.value, r.length) for r in runs] == [
        (True, 2), (False, 3), (True, 1), (False, 1), (True, 3)]
