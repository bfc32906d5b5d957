"""Canonical + randomized record-batch fixtures (the role of the
reference's arrow/internal/arrdata/arrdata.go:39-1159 Records map and
internal/testing/gen/random_array_gen.go seeded generators)."""
import decimal as pydec

import numpy as np

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt


def canonical_batches():
    """One record batch per major type family."""
    out = {}
    out["primitives"] = agt.record_batch({
        "i8": agt.array([1, None, -3, 4], dt.int8),
        "i16": agt.array([1, 2, None, 4], dt.int16),
        "i32": agt.array([None, 2, 3, 4], dt.int32),
        "i64": agt.array([1, 2, 3, None], dt.int64),
        "u8": agt.array([255, None, 0, 1], dt.uint8),
        "u16": agt.array([65535, 1, None, 2], dt.uint16),
        "u32": agt.array([1, None, 2, 3], dt.uint32),
        "u64": agt.array([2**63, 1, 2, None], dt.uint64),
        "f32": agt.array([1.5, None, float("inf"), -0.0], dt.float32),
        "f64": agt.array([None, 2.5, float("-inf"), 1e300], dt.float64),
        "b": agt.array([True, None, False, True]),
    })
    out["binary"] = agt.record_batch({
        "s": agt.array(["", "héllo", None, "x" * 100]),
        "bin": agt.array([b"\x00\x01", None, b"", b"\xff"], dt.binary),
        "ls": agt.array(["a", None, "b", "c"], dt.large_string),
        "fsb": agt.array([b"abcd", None, b"0123", b"zzzz"],
                         dt.fixed_size_binary(4)),
    })
    out["temporal"] = agt.record_batch({
        "ts_us": agt.array([1, None, 3, 4], dt.timestamp("us", "UTC")),
        "ts_ms": agt.array([None, 2, 3, 4], dt.timestamp("ms")),
        "d32": agt.array([1, 2, None, 4], dt.date32),
        "t32": agt.array([1, None, 3, 4], dt.time32("ms")),
        "t64": agt.array([1, 2, 3, None], dt.time64("us")),
        "dur": agt.array([None, -2, 3, 4], dt.duration("ns")),
    })
    out["decimal"] = agt.record_batch({
        "d128": agt.array([pydec.Decimal("1.23"), None,
                           pydec.Decimal("-99999999999.99"),
                           pydec.Decimal("0.01")], dt.decimal128(20, 2)),
        "d64": agt.array([pydec.Decimal("5.5"), pydec.Decimal("-1.0"),
                          None, pydec.Decimal("0.0")], dt.decimal64(10, 1)),
    })
    out["nested"] = agt.record_batch({
        "lst": agt.array([[1, 2], None, [], [3, None]], dt.list_(dt.int64)),
        "st": agt.array([{"x": 1, "y": "a"}, None, {"x": None, "y": "c"},
                         {"x": 4, "y": None}],
                        dt.struct({"x": dt.int64, "y": dt.string})),
        "fsl": agt.array([[1.0, 2.0], None, [3.0, 4.0], [5.0, 6.0]],
                         dt.fixed_size_list(dt.float64, 2)),
        "m": agt.array([{"k": 1}, None, {}, {"a": None, "b": 2}],
                       dt.map_(dt.string, dt.int64)),
    })
    out["dictionary"] = agt.record_batch({
        "d": agt.array(["apple", "pear", None, "apple"],
                       dt.dictionary(dt.int32, dt.string)),
        "di": agt.array([7, 9, 7, None], dt.dictionary(dt.int16, dt.int64)),
    })
    return out


_RANDOM_TYPES = [
    dt.int8, dt.int16, dt.int32, dt.int64, dt.uint8, dt.uint32, dt.uint64,
    dt.float32, dt.float64, dt.bool_, dt.string, dt.binary,
    dt.date32, dt.timestamp("us"), dt.time64("us"),
    dt.decimal128(20, 3), dt.fixed_size_binary(3),
    dt.list_(dt.int64), dt.list_(dt.string),
    dt.struct({"a": dt.int32, "b": dt.string}),
    dt.dictionary(dt.int32, dt.string),
]


def random_array(rng: np.random.Generator, t: dt.DataType, n: int):
    null_p = rng.choice([0.0, 0.1, 0.4])
    mask = rng.random(n) >= null_p

    def val(i):
        if t.is_integer:
            info = np.iinfo(t.np_dtype)
            return int(rng.integers(max(info.min, -10**9),
                                    min(info.max, 10**9)))
        if t.is_floating:
            return float(np.round(rng.standard_normal() * 100, 3))
        if t.id == dt.TypeId.BOOL:
            return bool(rng.random() < 0.5)
        if t.id == dt.TypeId.STRING:
            ln = int(rng.integers(0, 12))
            return "".join(chr(rng.integers(97, 123)) for _ in range(ln))
        if t.id == dt.TypeId.BINARY:
            return bytes(rng.integers(0, 256, int(rng.integers(0, 8)),
                                      dtype=np.uint8))
        if t.id == dt.TypeId.DATE32:
            return int(rng.integers(-10000, 20000))
        if t.id == dt.TypeId.TIMESTAMP:
            return int(rng.integers(0, 10**15))
        if t.id == dt.TypeId.TIME64:
            return int(rng.integers(0, 86400 * 10**6))
        if t.is_decimal:
            return pydec.Decimal(int(rng.integers(-10**9, 10**9))) / 1000
        if t.id == dt.TypeId.FIXED_SIZE_BINARY:
            return bytes(rng.integers(0, 256, t.byte_width, dtype=np.uint8))
        if t.id == dt.TypeId.LIST:
            k = int(rng.integers(0, 4))
            inner = random_array(rng, t.value_type, k)
            return inner.to_pylist()
        if t.id == dt.TypeId.STRUCT:
            return {f.name: random_array(rng, f.type, 1).to_pylist()[0]
                    for f in t.fields()}
        if t.id == dt.TypeId.DICTIONARY:
            return ["red", "green", "blue", "cyan"][int(rng.integers(0, 4))]
        raise NotImplementedError(str(t))

    vals = [val(i) if mask[i] else None for i in range(n)]
    return agt.array(vals, t)


def random_batch(seed: int, n: int = 50, n_cols: int = 5):
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(_RANDOM_TYPES), size=n_cols, replace=True)
    cols, names = [], []
    for i, p in enumerate(picks):
        t = _RANDOM_TYPES[int(p)]
        cols.append(random_array(rng, t, n))
        names.append(f"c{i}_{t.name}")
    return agt.RecordBatch.from_arrays(cols, names)


def pyarrow_comparable(pt):
    """pyarrow Table -> pydict with temporal columns as raw ints (our
    to_pylist exposes storage values)."""
    import pyarrow as pa
    out = {}
    for name, col in zip(pt.column_names, pt.columns):
        t = col.type
        if pa.types.is_timestamp(t) or pa.types.is_time64(t) or \
                pa.types.is_duration(t) or pa.types.is_date64(t):
            col = col.cast(pa.int64())
        elif pa.types.is_time32(t) or pa.types.is_date32(t):
            col = col.cast(pa.int32())
        out[name] = col.to_pylist()
    return out
