"""Scaling-efficiency evidence (BASELINE.json:2,14; BENCH/BASELINE.md).

No real cluster exists in this sandbox, so per the driver instruction the
N→4N-executor criterion is evidenced by running the SAME job on the SAME
input at two parallelism levels on this 32-core box: local[8] (=N) and
local[32] (=4N). Each level runs in a FRESH subprocess (fresh JVM — local
mode pins master at session creation).

    python BENCH/run_scaling.py [--sf 0.3] [--repeat 2]

Writes BENCH/BASELINE.md with throughput at both levels and
efficiency = (thr_32 / thr_8) / 4.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[4])
from lyra_spark.session import get_spark
from lyra_spark.presets import validate_transcripts

cores = int(sys.argv[1])
fx = sys.argv[2]
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores, app_name=f"scaling_{cores}")
tdf = spark.read.parquet(os.path.join(fx, "transcripts"))
dim = spark.read.parquet(os.path.join(fx, "tools_dim.parquet"))
n = tdf.count()
tdf.limit(5).count()  # warm codegen/IO paths

def run():
    res = validate_transcripts(tdf, dim)
    res.violations.write.mode("overwrite").format("noop").save()
    res.verdicts.write.mode("overwrite").format("noop").save()
    res.unpersist()

run()  # warm-up run (JIT, shuffle services)
times = []
for _ in range(int(sys.argv[3])):
    t0 = time.perf_counter()
    run()
    times.append(time.perf_counter() - t0)
best = min(times)
print(json.dumps({"cores": cores, "rows": n, "sec": round(best, 3), "turns_per_sec": round(n / best, 1)}))
"""


def wait_for_quiet_host(max_load: float = 4.0, timeout_s: int = 600) -> float:
    """This sandbox shares a host with invisible neighbors; a timed run under
    load-average spikes measures the neighbors, not us. Block until the 1-min
    load is tolerable (or timeout) and return the load we started at."""
    import time

    t0 = time.time()
    while time.time() - t0 < timeout_s:
        load1 = float(open("/proc/loadavg").read().split()[0])
        if load1 <= max_load:
            return load1
        time.sleep(15)
    return float(open("/proc/loadavg").read().split()[0])


def run_level(cores: int, fx: str, repeat: int) -> dict:
    load = wait_for_quiet_host()
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cores), fx, str(repeat), REPO],
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    res["load_at_start"] = load
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="0.3", help="transcript scale (0.1 → ~600k turns; 0.3 → ~1.9M synthetic)")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2, help="interleaved level rounds; best kept")
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from lyra_spark import fixtures

    # allow larger-than-driver scales by extending the ladder
    if args.sf not in fixtures.N_CONVS:
        fixtures.N_CONVS[args.sf] = int(float(args.sf) * 100_000)
    fx = fixtures.materialize(args.sf, os.path.join(REPO, ".fixtures", f"sf{args.sf}"))

    # interleave levels across rounds; keep the best of each (least-contended)
    best: dict[int, dict] = {}
    for _ in range(args.rounds):
        for cores in (8, 32):
            r = run_level(cores, fx, args.repeat)
            if cores not in best or r["sec"] < best[cores]["sec"]:
                best[cores] = r
            print(json.dumps(r))
    r8, r32 = best[8], best[32]
    eff = (r32["turns_per_sec"] / r8["turns_per_sec"]) / 4

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Methodology (driver instruction; no real cluster in sandbox): same full
validation suite (row rules + uniqueness + referential + monotone + verdicts)
on the SAME input at two parallelism levels, fresh JVM per level, best of
{args.repeat} timed runs after one warm-up, levels interleaved over
{args.rounds} rounds keeping each level's least-contended round (this host is
shared; timed runs start only when 1-min load ≤ 4).

| level | cores | input turns | wall (s) | turns/sec |
|---|---|---|---|---|
| N  | 8  | {r8["rows"]:,} | {r8["sec"]} | {r8["turns_per_sec"]:,} |
| 4N | 32 | {r32["rows"]:,} | {r32["sec"]} | {r32["turns_per_sec"]:,} |

**Scaling efficiency (thr_4N / thr_N) / 4 = {eff:.3f}** (required ≥ 0.8, BASELINE.json:14)

Confs in both: AQE on (skew-join + partition coalescing), Arrow on,
shuffle.partitions = cores, explicit broadcast of the tools dimension,
salted uniqueness aggregation.
"""
    out_path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(out_path, "w") as f:
        f.write(md)
    print(json.dumps({"n8": r8, "n32": r32, "efficiency": round(eff, 3)}))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
