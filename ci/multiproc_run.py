"""Multi-process distributed harness (CI mode 6 / MULTIHOST artifact).

Launches N OS processes that join one jax distributed runtime over
localhost (CPU devices, Gloo transport) and drive the FULL
parallel/dist.py tier across the real process boundary — the property
the reference proves with real loopback gRPC servers in every Flight
test (arrow/internal/flight_integration/scenario.go:94). SURVEY.md §7
phase 7 ("2-host scaling via DCN + jax distributed init") executes here.

Default: 2 processes x 4 local devices (one 8-shard global mesh), all
five workloads verified in-worker against numpy oracles.

--scaling additionally measures 1-process vs 2-process wall time at
FIXED total work with one pinned core per process (the only honest
efficiency bound a 2-core host can produce): the 1-process run gets 1
core and 8 local devices; the 2-process run gets 2 cores and 4 local
devices each. Ideal speedup = 2.0.

Usage:
  python ci/multiproc_run.py                 # correctness, 2 procs
  python ci/multiproc_run.py --procs 4       # 4 procs x 2 devices
  python ci/multiproc_run.py --scaling       # + pinned-core efficiency
  python ci/multiproc_run.py --out MULTIHOST_r04.json
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multiproc_worker.py")
TOTAL_DEVICES = 8


def run_once(num_processes: int, rows: int, bench: bool = False,
             pin: bool = False, timeout: float = 600.0):
    from arrow_go_tpu.parallel import multiproc
    local = TOTAL_DEVICES // num_processes
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    extra = ["--rows", str(rows), "--out", out_path]
    if bench:
        extra.append("--bench")
    pin_cores = list(range(num_processes)) if pin else None
    t0 = time.perf_counter()
    multiproc.launch(WORKER, num_processes, local, extra_args=extra,
                     timeout=timeout, pin_cores=pin_cores, capture=True)
    wall = time.perf_counter() - t0
    with open(out_path) as f:
        res = json.load(f)
    os.unlink(out_path)
    res["wall_s"] = round(wall, 2)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--rows", type=int, default=1 << 14)
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    artifact = {"harness": "multiproc_run", "total_devices": TOTAL_DEVICES}

    res = run_once(args.procs, args.rows)
    assert res["ok"], res
    assert res["processes"] == args.procs
    assert res["global_devices"] == TOTAL_DEVICES
    artifact["correctness"] = res
    print(f"{args.procs}-process tier OK: "
          f"{', '.join(res['checks'])} verified across "
          f"{res['processes']} processes x {res['local_devices']} devices",
          flush=True)

    if args.scaling:
        # fixed total work, one pinned core per process
        rows = max(args.rows, 1 << 16)
        r1 = run_once(1, rows, bench=True, pin=True)
        r2 = run_once(2, rows, bench=True, pin=True)
        g1, g2 = r1["bench"]["group_by_ms"], r2["bench"]["group_by_ms"]
        j1, j2 = r1["bench"]["join_ms"], r2["bench"]["join_ms"]
        artifact["scaling"] = {
            "rows": rows, "pinned_cores_per_process": 1,
            "group_by_ms": {"p1": g1, "p2": g2},
            "join_ms": {"p1": j1, "p2": j2},
            "speedup_group_by": round(g1 / g2, 3),
            "speedup_join": round(j1 / j2, 3),
            "efficiency_group_by": round(g1 / (2 * g2), 3),
            "efficiency_join": round(j1 / (2 * j2), 3),
        }
        print(f"scaling (1 core/proc, fixed work): group_by "
              f"{g1:.1f}ms -> {g2:.1f}ms (speedup "
              f"{artifact['scaling']['speedup_group_by']}x), join "
              f"{j1:.1f}ms -> {j2:.1f}ms (speedup "
              f"{artifact['scaling']['speedup_join']}x)", flush=True)

    artifact["ok"] = True
    if args.out:
        with open(args.out, "w") as f:
            json.dump(artifact, f, indent=1)
    print(json.dumps({"multiproc": "ok", "procs": args.procs,
                      "checks": list(res["checks"])}), flush=True)


if __name__ == "__main__":
    main()
