"""Per-stage scaling diagnosis (VERDICT.md round-1 item 1).

Times each stage of the full suite separately at two core counts (fresh JVM
per level) so the non-scaling stage is NAMED, not guessed:

  scan        bare parquet scan -> count (input decode; host I/O control)
  row_rules   row-rule pass only -> noop sink (map-only, should scale ~linearly)
  conv        conv-scoped checks (1 exchange + windows) -> noop sink
  union_noop  full fused violation union -> noop sink (compute w/o real sink)
  sink        write_violations to parquet (the real sink)
  verdicts    verdict aggregation from written violations -> noop
  suite       full run_suite (production shape; the BASELINE.md number)

    python BENCH/diagnose_stages.py [--fx .fixtures/sf4.0] [--levels 4,16] [--repeat 2]
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
from lyra_spark.fused import inline_referential_rule, conv_scoped_violations, validate_transcripts_fused
from lyra_spark.engine import row_violations, compute_verdicts
from lyra_spark.rules import RuleSet
from lyra_spark import io as lio

cores = int(sys.argv[1])
fx = sys.argv[2]
repeat = int(sys.argv[4])
# heap scales with cores (2g/core): going N -> 4N executors on a real cluster
# multiplies AGGREGATE memory by 4; a fixed heap across levels would starve
# the 4N level into spills the real cluster would never see
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"diag_{cores}",
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{os.getpid()}",
                              "spark.driver.memory": f"{2 * cores}g"})
tdf = spark.read.parquet(os.path.join(fx, "transcripts"))
dim = spark.read.parquet(os.path.join(fx, "tools_dim.parquet"))
rules = RuleSet(transcript_ruleset().rules + [inline_referential_rule(dim)])
out = f"/dev/shm/lyra_diag_{os.getpid()}"
cols = ["conv_id", "turn_idx", "part_date", "rule_id", "observed_value"]

def noop(df):
    df.write.mode("overwrite").format("noop").save()

def st_scan():
    tdf.count()

def st_row_rules():
    noop(row_violations(tdf, rules))

def st_conv():
    noop(conv_scoped_violations(tdf))

def st_union_noop():
    res = validate_transcripts_fused(tdf, dim, rules)
    noop(res.violations)

def st_sink():
    res = validate_transcripts_fused(tdf, dim, rules)
    lio.write_violations(res.violations, out)

def st_verdicts():
    # assumes st_sink ran: aggregate from written files
    viol = spark.read.parquet(out)
    rule_ids = [r.rule_id for r in rules.checks] + ["uniq_conv_turn", "ts_monotone"]
    noop(compute_verdicts(tdf, viol, rule_ids, "part_date"))

def st_suite():
    viol, verd = run_suite(tdf, dim, out, ruleset=rules)
    noop(verd)

stages = [("scan", st_scan), ("row_rules", st_row_rules), ("conv", st_conv),
          ("union_noop", st_union_noop), ("sink", st_sink),
          ("verdicts", st_verdicts), ("suite", st_suite)]

# one warm-up sweep (JIT, page cache), then best-of-repeat per stage
for name, fn in stages:
    fn()
res = {}
for name, fn in stages:
    times = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        fn()
        times.append(round(time.perf_counter() - t0, 3))
    res[name] = min(times)
shutil.rmtree(out, ignore_errors=True)
print(json.dumps({"cores": cores, "stages": res}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fx", default=os.path.join(REPO, ".fixtures", "sf4.0"))
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]

    results = {}
    for cores in levels:
        out = subprocess.run(
            [sys.executable, "-c", CHILD, str(cores), args.fx, REPO, str(args.repeat)],
            capture_output=True, text=True, check=True)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        results[cores] = r["stages"]
        print(json.dumps(r))

    lo, hi = levels[0], levels[-1]
    ratio = hi / lo
    print(f"\nstage            {lo}c(s)   {hi}c(s)  speedup  efficiency")
    for name in results[lo]:
        a, b = results[lo][name], results[hi][name]
        sp = a / b if b else float("inf")
        print(f"{name:15s} {a:8.2f} {b:8.2f} {sp:7.2f}x {sp / ratio:9.3f}")


if __name__ == "__main__":
    main()
