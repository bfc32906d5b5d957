#!/usr/bin/env bash
# Dual-mode test matrix (reference ci/scripts/test.sh runs every suite
# twice — with asm and with the `noasm` tag — to prove SIMD/fallback
# parity; our analog proves native-C++/pure-python and pallas/interpret
# parity on the virtual CPU mesh).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== mode 1: default (native C++ codecs + pallas kernels) =="
python -m pytest tests/ -q

echo "== mode 2: AGT_DISABLE_NATIVE=1 (pure-python codec fallbacks) =="
AGT_DISABLE_NATIVE=1 python -m pytest tests/ -q

echo "== mode 3: AGT_FORCE_PALLAS_INTERPRET=1 (pallas interpret mode) =="
AGT_FORCE_PALLAS_INTERPRET=1 python -m pytest tests/ -q

echo "== mode 4: AGT_ASSERT=1 (debug asserts, the reference's -tags assert) =="
AGT_ASSERT=1 python -m pytest tests/test_device_ops.py tests/test_parquet.py \
    tests/test_parquet_device_read.py tests/test_compute.py -q

# mode 5 (opt-in, needs a real chip): compiled-TPU kernel smoke vs
# analytic oracles — the reference's "with asm" half of the dual runs.
# Usage: AGT_TPU_SMOKE=1 ci/test.sh  (or run ci/tpu_smoke.py directly)
if [[ "${AGT_TPU_SMOKE:-}" == "1" ]]; then
  echo "== mode 5: TPU smoke (one executable, compiled kernels vs oracles) =="
  python ci/tpu_smoke.py
fi

echo "== mode 6: multi-process distributed (2 OS processes, jax.distributed) =="
python ci/multiproc_run.py --procs 2 --rows 8192
