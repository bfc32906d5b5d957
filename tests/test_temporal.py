"""Temporal rounding kernels vs the pyarrow oracle (reference
arrow/compute/internal/kernels/rounding.go:830+ semantics)."""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_go_tpu as agt
from arrow_go_tpu import dtypes as dt
from arrow_go_tpu.compute import call_function
from arrow_go_tpu.compute.temporal import (ceil_temporal, floor_temporal,
                                           round_temporal)
from arrow_go_tpu.device.block import from_device
from arrow_go_tpu.interop.pyarrow_interop import array_to_pyarrow

OURS = {"floor": floor_temporal, "ceil": ceil_temporal,
        "round": round_temporal}
ORACLE = {"floor": pc.floor_temporal, "ceil": pc.ceil_temporal,
          "round": pc.round_temporal}

# a spread of interesting instants (us precision), pre- and post-epoch
US = [
    0,
    1,
    -1,
    86_400_000_000 * 3 + 5_123_456,            # 1970-01-04 ~midnight+5s
    1_700_000_000_000_000 + 987_654,           # 2023-11-14
    -86_400_000_000 * 400 - 7,                 # 1968-11-27
    31_536_000_000_000 * 53 + 12345,           # ~2023
    -1_000_000_000_000_000,                    # 1938
]


def _ours_vs_oracle(values, typ, pa_typ, mode, **opts):
    arr = agt.array(values, typ)
    got = from_device(OURS[mode](arr, **opts))
    want = ORACLE[mode](pa.array(values, pa_typ), **opts)
    assert array_to_pyarrow(got).cast(pa_typ).equals(want), (
        mode, opts, array_to_pyarrow(got).to_pylist(), want.to_pylist())


@pytest.mark.parametrize("mode", ["floor", "ceil", "round"])
@pytest.mark.parametrize("unit,multiple", [
    ("nanosecond", 1), ("microsecond", 7), ("millisecond", 3),
    ("second", 1), ("second", 13), ("minute", 5), ("hour", 2),
    ("day", 1), ("day", 10), ("week", 1), ("week", 2),
    ("month", 1), ("month", 5), ("quarter", 1), ("quarter", 2),
    ("year", 1), ("year", 10),
])
def test_timestamp_us_parity(mode, unit, multiple):
    _ours_vs_oracle(US + [None], dt.timestamp("us"), pa.timestamp("us"),
                    mode, multiple=multiple, unit=unit)


@pytest.mark.parametrize("mode", ["floor", "ceil", "round"])
def test_timestamp_s_coarse_tick(mode):
    # rounding unit finer than the tick: computed in ns, floor-div back
    secs = [0, 1, 59, 61, -61, 3600 * 25 + 3]
    _ours_vs_oracle(secs, dt.timestamp("s"), pa.timestamp("s"),
                    mode, multiple=90, unit="second")
    _ours_vs_oracle(secs, dt.timestamp("s"), pa.timestamp("s"),
                    mode, multiple=1, unit="hour")


def test_week_starts_sunday():
    _ours_vs_oracle(US, dt.timestamp("us"), pa.timestamp("us"),
                    "floor", multiple=1, unit="week",
                    week_starts_monday=False)


def test_ceil_is_strictly_greater():
    day_us = 86_400_000_000
    vals = [0, day_us, day_us * 2 + 1]
    _ours_vs_oracle(vals, dt.timestamp("us"), pa.timestamp("us"),
                    "ceil", multiple=1, unit="day",
                    ceil_is_strictly_greater=True)


def test_calendar_based_origin_hour():
    day_us = 86_400_000_000
    vals = [day_us * 5 + 3_600_000_000 * 7 + 123, day_us * 5]
    _ours_vs_oracle(vals, dt.timestamp("us"), pa.timestamp("us"),
                    "floor", multiple=7, unit="hour",
                    calendar_based_origin=True)


@pytest.mark.parametrize("mode", ["floor", "ceil", "round"])
def test_date32(mode):
    days = [0, 1, -1, 365, 1000, 20000, -400, None]
    _ours_vs_oracle(days, dt.date32, pa.date32(), mode,
                    multiple=1, unit="month")
    _ours_vs_oracle(days, dt.date32, pa.date32(), mode,
                    multiple=2, unit="week")


def test_time_types():
    ms = [0, 1, 999, 3_600_000 + 7, 86_399_999]
    _ours_vs_oracle(ms, dt.time32("ms"), pa.time32("ms"), "floor",
                    multiple=15, unit="minute")
    us = [0, 59_999_999, 3_600_000_001]
    _ours_vs_oracle(us, dt.time64("us"), pa.time64("us"), "round",
                    multiple=2, unit="second")


def test_registered_functions():
    arr = agt.array([0, 86_400_000_001, None], dt.timestamp("us"))
    out = call_function("floor_temporal", [arr], {"unit": "day"})
    assert out.to_pylist()[1] == 86_400_000_000  # 1970-01-02T00:00 in us
    out2 = call_function("ceil_temporal", [arr], {"unit": "day"})
    assert out2.null_count == 1
    # run_end_encode/decode + is_not_null now registered
    ree = call_function("run_end_encode", [agt.array([1, 1, 2], dt.int64)])
    back = call_function("run_end_decode", [ree])
    assert back.to_pylist() == [1, 1, 2]
    notnull = call_function("is_not_null", [arr])
    assert notnull.to_pylist() == [True, True, False]


def test_named_timezone_host_path():
    # DST boundary: 2023-03-12 America/New_York (clocks jump 2am->3am)
    vals = [1_678_600_000_000_000, 1_678_654_800_000_000, None]
    t = dt.timestamp("us", tz="America/New_York")
    arr = agt.array(vals, t)
    got = from_device(floor_temporal(arr, multiple=1, unit="day"))
    want = pc.floor_temporal(
        pa.array(vals, pa.timestamp("us", tz="America/New_York")),
        multiple=1, unit="day")
    assert array_to_pyarrow(got).cast(
        pa.timestamp("us", tz="America/New_York")).equals(want)


def test_fixed_offset_timezone():
    vals = [0, 86_400_000_000 - 1, None]
    t = dt.timestamp("us", tz="+05:30")
    arr = agt.array(vals, t)
    got = from_device(floor_temporal(arr, multiple=1, unit="day"))
    want = pc.floor_temporal(
        pa.array(vals, pa.timestamp("us", tz="+05:30")),
        multiple=1, unit="day")
    assert array_to_pyarrow(got).cast(
        pa.timestamp("us", tz="+05:30")).equals(want)
