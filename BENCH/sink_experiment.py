"""One-off: time write_violations variants in isolation (sink-tail diagnosis).

Stages the sf4 violation union ONCE to an unpartitioned parquet, then times
ONLY the sink under each shaping variant at a given core count, reporting
wall, write-stage task count, and output file count.

    python BENCH/sink_experiment.py --cores 16 --fx .fixtures/sf4.0
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import glob, json, os, sys, time, shutil
sys.path.insert(0, sys.argv[3])
from lyra_spark.session import get_spark
from lyra_spark.presets import transcript_ruleset
from lyra_spark.fused import inline_referential_rule, validate_transcripts_fused
from lyra_spark.rules import RuleSet
from lyra_spark import io as lio
from pyspark.sql import functions as F

cores = int(sys.argv[1])
fx = sys.argv[2]
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"sinkexp_{cores}",
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{os.getpid()}",
                              "spark.driver.memory": f"{2 * cores}g"})
spark.sparkContext.setLogLevel("ERROR")
tdf = spark.read.parquet(os.path.join(fx, "transcripts"))
dim = spark.read.parquet(os.path.join(fx, "tools_dim.parquet"))
rules = RuleSet(transcript_ruleset().rules + [inline_referential_rule(dim)])
stage = f"/dev/shm/lyra_sinkexp_stage_{os.getpid()}"
out = f"/dev/shm/lyra_sinkexp_out_{os.getpid()}"

res = validate_transcripts_fused(tdf, dim, rules)
res.violations.write.mode("overwrite").parquet(stage)
viol = spark.read.parquet(stage)
n = viol.count()
print(json.dumps({"staged_rows": n}), flush=True)

variants = {
    "rebalance_auto": dict(buckets_per_partition=None),
    "repart_date": dict(buckets_per_partition=1),
    "bkt8": dict(buckets_per_partition=8),
}

def nfiles(d):
    return len(glob.glob(os.path.join(d, "*", "*.parquet")))

for name, kw in variants.items():
    walls = []
    for r in range(3):
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.perf_counter()
        lio.write_violations(viol, out, **kw)
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"variant": name, "cores": cores, "walls": walls,
                      "files": nfiles(out)}), flush=True)
shutil.rmtree(stage, ignore_errors=True)
shutil.rmtree(out, ignore_errors=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fx", default=os.path.join(REPO, ".fixtures", "sf4.0"))
    ap.add_argument("--cores", default="16,4")
    args = ap.parse_args()
    for cores in args.cores.split(","):
        subprocess.run([sys.executable, "-c", CHILD, cores, args.fx, REPO], check=True)


if __name__ == "__main__":
    main()
