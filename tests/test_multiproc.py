"""Multi-process distributed tier: the data plane crosses a REAL OS
process boundary (2 spawned workers joined by jax.distributed over
localhost, Gloo transport under the shard_map collectives).

Reference analog: every Flight test runs against a real loopback gRPC
server and the archery scenarios are cross-process
(arrow/internal/flight_integration/scenario.go:94). The in-worker
numpy-oracle checks cover group-by (with value nulls), multi-key join,
Zipf hot-key broadcast join, multi-key sort, and the chunk-pipelined
streamed shuffle — the bugs this catches (host-local array leakage,
per-process PRNG divergence, addressable-shard assumptions) cannot
appear on a single-process virtual mesh.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_distributed_tier():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "ci", "multiproc_run.py"),
         "--procs", "2", "--rows", "8192"],
        capture_output=True, text=True, timeout=550,
        env={**os.environ, "PYTHONPATH": REPO})
    assert r.returncode == 0, r.stdout + "\n" + r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines()
            if ln.startswith('{"multiproc"')][-1]
    res = json.loads(line)
    assert res["procs"] == 2
    assert set(res["checks"]) == {"group_by", "join_multikey",
                                  "join_zipf_hotkey", "sort_multikey",
                                  "streamed_shuffle"}
