"""One-off: sink variants round 2 + verdict-stage decomposition.

    python BENCH/sink_experiment2.py --cores 16,4
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import glob, json, os, sys, time, shutil
sys.path.insert(0, sys.argv[3])
from lyra_spark.session import get_spark
from lyra_spark.presets import transcript_ruleset
from lyra_spark.fused import inline_referential_rule, validate_transcripts_fused
from lyra_spark.rules import RuleSet
from lyra_spark.engine import compute_verdicts
from pyspark.sql import functions as F

cores = int(sys.argv[1])
fx = sys.argv[2]
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=cores,
                  app_name=f"sinkexp2_{cores}",
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
schema = viol.schema
print(json.dumps({"staged_rows": viol.count()}), flush=True)

def timeit(name, fn, n=3):
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({"step": name, "cores": cores, "walls": walls}), flush=True)

def write(shaped):
    shutil.rmtree(out, ignore_errors=True)
    (shaped.sortWithinPartitions("part_date", "conv_id", "turn_idx", "rule_id", "observed_value")
        .write.mode("overwrite").partitionBy("part_date").parquet(out))

# sink variants
N = spark.sparkContext.defaultParallelism
timeit("sink_repart_N", lambda: write(viol.repartition(N, "part_date")))
spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64KB")
timeit("sink_rebalance_small_min", lambda: write(viol.hint("rebalance", "part_date")))
spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1MB")

# verdict decomposition (sink left from last write: repart variant rewrites once more)
write(viol.repartition(N, "part_date"))
rule_ids = [r.rule_id for r in rules.checks] + ["uniq_conv_turn", "ts_monotone"]

def noop(df):
    df.write.mode("overwrite").format("noop").save()

vread = spark.read.schema(schema).parquet(out)
timeit("verd_readback_count", lambda: spark.read.schema(schema).parquet(out).count())
timeit("verd_violagg", lambda: noop(vread.groupBy("part_date", "rule_id").agg(F.count(F.lit(1)).alias("violation_count"))))
timeit("verd_rowcounts", lambda: noop(tdf.groupBy("part_date").agg(F.count(F.lit(1)).alias("row_count"))))
timeit("verd_full", lambda: noop(compute_verdicts(tdf, spark.read.schema(schema).parquet(out), rule_ids, "part_date")))
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
