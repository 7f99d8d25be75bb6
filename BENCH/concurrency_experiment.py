"""Measure jobs/validate --concurrency: serial vs K-threaded partition loop.

The claim under test (jobs/validate.py --concurrency): at many small
partitions the per-partition DRIVER gaps (planning, sink commit, manifest IO)
dominate and serialize a single-threaded loop; K in-flight partitions overlap
those gaps and keep the executors busy. This is the 10^5-Iceberg-partition
regime scaled down: the sf0.001 fixture has 90 one-file date partitions whose
per-partition compute is tiny, so the driver tail is the majority cost —
exactly where concurrency must pay off.

Methodology (memory: scaling-bench-methodology): fresh JVM per run (session
confs like scheduler.mode are construction-time), interleaved reps so a noisy
window hits both configs, min-wall per config (neighbor steal only inflates).

Usage: python BENCH/concurrency_experiment.py [--parts 40] [--reps 2]
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = """
import sys, time
sys.path.insert(0, {repo!r})
from lyra_spark.fixtures import materialize
fx = materialize("0.001", {fixture!r})
from jobs.validate import main
t0 = time.perf_counter()
rc = main([
    "--table", fx + "/transcripts",
    "--tools-dim", fx + "/tools_dim.parquet",
    "--checkpoint", {ckpt!r},
    "--run-id", "bench",
    "--out", {out!r},
    "--master", "local[8]",
    "--limit-partitions", {parts!r},
    "--concurrency", {conc!r},
])
print("WALL_S", time.perf_counter() - t0, "RC", rc)
"""


def run_once(fixture: str, parts: int, conc: int) -> float:
    work = tempfile.mkdtemp(prefix=f"conc{conc}_")
    try:
        code = RUNNER.format(
            repo=REPO,
            fixture=fixture,
            ckpt=os.path.join(work, "ckpt"),
            out=os.path.join(work, "viol"),
            parts=str(parts),
            conc=str(conc),
        )
        t0 = time.perf_counter()
        res = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
        )
        _ = time.perf_counter() - t0  # subprocess wall incl. JVM startup (unused)
        for line in res.stdout.splitlines():
            if line.startswith("WALL_S"):
                toks = line.split()
                assert toks[3] == "0", f"validate rc != 0: {res.stdout[-2000:]} {res.stderr[-2000:]}"
                return float(toks[1])  # in-process wall excludes JVM startup
        raise RuntimeError(f"no WALL_S in output: {res.stdout[-2000:]} {res.stderr[-2000:]}")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parts", type=int, default=40)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--levels", default="1,4")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    fixture = os.path.join(REPO, ".fixtures", "sf0.001")
    walls: dict[int, list[float]] = {k: [] for k in levels}
    for rep in range(args.reps):
        for k in levels:  # interleave so a noisy window hits both configs
            w = run_once(fixture, args.parts, k)
            walls[k].append(w)
            print(f"rep={rep} concurrency={k} wall={w:.2f}s", file=sys.stderr)
    best = {k: min(v) for k, v in walls.items()}
    base = best[levels[0]]
    out = {
        "experiment": "cli_partition_concurrency",
        "partitions": args.parts,
        "master": "local[8]",
        "walls_s": {str(k): [round(x, 2) for x in v] for k, v in walls.items()},
        "min_wall_s": {str(k): round(v, 2) for k, v in best.items()},
        "speedup_vs_serial": {str(k): round(base / v, 2) for k, v in best.items()},
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
