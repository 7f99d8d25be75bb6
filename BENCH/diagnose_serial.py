"""Locate the SERIAL (single-threaded) portion of the suite wall.

Evidence (BENCH/BASELINE.md round-3 pairs): 16c walls sit at ~33 s across 2x
host-weather swings while 4c walls track weather — and a 1-process busy loop
on this host is weather-insensitive. Amdahl decomposition of those pairs puts
~20 s of the suite on a single thread. This script names it:

  * Python-side sub-phase walls (plan build / sink write / verdict / noop)
  * per-Spark-job wall vs the SUM of its stages' task times — a job whose
    task-time is ~0 but whose wall is seconds is driver/serial time
  * gaps BETWEEN jobs (pure driver time: Catalyst, AQE re-planning, Python)

    python BENCH/diagnose_serial.py [--fx .fixtures/sf4.0] [--cores 16]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time, shutil
sys.path.insert(0, sys.argv[3])
from lyra_spark.session import get_spark
from lyra_spark.presets import transcript_ruleset, run_suite
from lyra_spark.fused import inline_referential_rule
from lyra_spark.rules import RuleSet

cores = int(sys.argv[1])
fx = sys.argv[2]
evdir = f"/dev/shm/lyra_ev_{os.getpid()}"
os.makedirs(evdir, exist_ok=True)
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"serialdiag_{cores}",
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{os.getpid()}",
                              "spark.driver.memory": f"{2 * cores}g",
                              "spark.eventLog.enabled": "true",
                              "spark.eventLog.compress": "false",
                              "spark.eventLog.rolling.enabled": "false",
                              "spark.eventLog.dir": evdir})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet(os.path.join(fx, "transcripts"))
dim = spark.read.parquet(os.path.join(fx, "tools_dim.parquet"))
n = tdf.count()
rules = RuleSet(transcript_ruleset().rules + [inline_referential_rule(dim)])
out = f"/dev/shm/lyra_serial_viol_{os.getpid()}"

def once(tag):
    t = {}
    t0 = time.perf_counter()
    viol, verd = run_suite(tdf, dim, out, ruleset=rules,
                           input_path=os.path.join(fx, "transcripts"))
    t["suite_to_verd"] = round(time.perf_counter() - t0, 3)
    t1 = time.perf_counter()
    verd.write.mode("overwrite").format("noop").save()
    t["verd_noop"] = round(time.perf_counter() - t1, 3)
    t["total"] = round(time.perf_counter() - t0, 3)
    print(json.dumps({"tag": tag, **t}), flush=True)

once("warm1")
once("warm2")
once("timed")
spark.stop()
# parse the event log: per-job wall, per-job task-time sum, inter-job gaps
import glob
ev = sorted(glob.glob(os.path.join(evdir, "*")))[-1]
if os.path.isdir(ev):  # Spark 4 rolling event-log v2: a dir of events_* files
    parts = sorted(glob.glob(os.path.join(ev, "events_*")))
else:
    parts = [ev]
jobs, stages = {}, {}
def _lines():
    for p in parts:
        with open(p) as f:
            yield from f
if True:
    for line in _lines():
        e = json.loads(line)
        k = e.get("Event")
        if k == "SparkListenerJobStart":
            names = " | ".join(sorted({s.get("Stage Name", "")[:38] for s in e["Stage Infos"]}))
            jobs[e["Job ID"]] = {"t0": e["Submission Time"], "stages": [s["Stage ID"] for s in e["Stage Infos"]],
                                 "desc": ((e.get("Properties") or {}).get("spark.job.description", "") or names)[:80]}
        elif k == "SparkListenerJobEnd":
            jobs[e["Job ID"]]["t1"] = e["Completion Time"]
        elif k == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            ti = e.get("Task Info", {})
            tm = e.get("Task Metrics") or {}
            stages.setdefault(sid, {"task_ms": 0, "cpu_ms": 0, "gc_ms": 0, "n": 0})
            stages[sid]["task_ms"] += ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            stages[sid]["cpu_ms"] += tm.get("Executor CPU Time", 0) // 1_000_000
            stages[sid]["gc_ms"] += tm.get("JVM GC Time", 0)
            stages[sid]["n"] += 1
rows = []
prev_end = None
for jid in sorted(jobs):
    j = jobs[jid]
    if "t1" not in j:
        continue
    wall = (j["t1"] - j["t0"]) / 1000
    tsum = sum(stages.get(s, {}).get("task_ms", 0) for s in j["stages"]) / 1000
    csum = sum(stages.get(s, {}).get("cpu_ms", 0) for s in j["stages"]) / 1000
    gsum = sum(stages.get(s, {}).get("gc_ms", 0) for s in j["stages"]) / 1000
    ntask = sum(stages.get(s, {}).get("n", 0) for s in j["stages"])
    gap = (j["t0"] - prev_end) / 1000 if prev_end is not None else 0.0
    prev_end = j["t1"]
    rows.append({"job": jid, "gap_before": round(gap, 2), "wall": round(wall, 2),
                 "task_sum": round(tsum, 2), "cpu_sum": round(csum, 2),
                 "gc_sum": round(gsum, 2), "ntask": ntask, "desc": j["desc"]})
print(json.dumps({"jobs": rows}), flush=True)
shutil.rmtree(out, ignore_errors=True)
shutil.rmtree(evdir, ignore_errors=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fx", default=os.path.join(REPO, ".fixtures", "sf4.0"))
    ap.add_argument("--cores", default="16")
    args = ap.parse_args()
    out = subprocess.run(
        [sys.executable, "-c", CHILD, args.cores, args.fx, REPO],
        capture_output=True, text=True)
    print(out.stderr[-2000:] if out.returncode else "", file=sys.stderr)
    for line in out.stdout.splitlines():
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        if "jobs" in d:
            print(f"\n{'job':>4} {'gap(s)':>7} {'wall(s)':>8} {'tasksum':>8} {'cpusum':>8} {'gcsum':>7} {'ntask':>6}  desc")
            tot_gap = tot_wall = 0.0
            for r in d["jobs"]:
                print(f"{r['job']:>4} {r['gap_before']:>7.2f} {r['wall']:>8.2f} "
                      f"{r['task_sum']:>8.2f} {r.get('cpu_sum', 0):>8.2f} "
                      f"{r.get('gc_sum', 0):>7.2f} {r['ntask']:>6}  {r['desc']}")
                tot_gap += r["gap_before"]
                tot_wall += r["wall"]
            print(f"total job wall {tot_wall:.1f}s, total inter-job gap {tot_gap:.1f}s")
        else:
            print(json.dumps(d))


if __name__ == "__main__":
    main()
