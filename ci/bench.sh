#!/usr/bin/env bash
# Benchmark harness (reference ci/scripts/bench.sh runs `go test -bench=.`
# repo-wide). `bench.py` is the headline single-line metric the driver
# records; `benchmarks/suite.py` is the full north-star config sweep
# (sum/filter/take/sort/group-by/hash-join/parquet-scan).
set -euo pipefail
cd "$(dirname "$0")/.."

python bench.py
python benchmarks/suite.py "$@"
