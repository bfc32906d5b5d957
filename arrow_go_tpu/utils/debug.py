"""Debug assertions (the reference's `assert` build tag —
arrow/internal/debug/assert_on.go:25 toggles debug.Assert; CI runs the
parquet suite with `-tags assert`).

Python analog: `AGT_ASSERT=1` turns `debug_assert` into a real check;
otherwise it compiles to a no-op attribute lookup so hot paths pay
nothing. `ci/test.sh`-style runs can export it the way the reference CI
passes the tag. `AGT_DEBUG=1` additionally enables `debug_log`
(arrow/internal/debug/log_on.go:31 analog).
"""
from __future__ import annotations

import os
import sys

_ASSERT = os.environ.get("AGT_ASSERT", "") not in ("", "0")
_DEBUG = os.environ.get("AGT_DEBUG", "") not in ("", "0")


if _ASSERT:
    def debug_assert(cond, msg: str = "debug assertion failed") -> None:
        if not cond:
            raise AssertionError(msg)
else:
    def debug_assert(cond, msg: str = "") -> None:  # noqa: ARG001
        pass


if _DEBUG:
    def debug_log(*args) -> None:
        print("[agt-debug]", *args, file=sys.stderr, flush=True)
else:
    def debug_log(*args) -> None:  # noqa: ARG001
        pass
