"""Stage attribution for the dedup_clusters scaling shortfall.

Splits the end-to-end wall into (a) the PAIR stage — signature, banded LSH
candidate join, exact-Jaccard verify, edge materialization (exactly the
eager localCheckpoint connected_components starts with) — and (b) the CC
stage — the alternating-star rounds plus the final node join. Fresh JVM
per core level, sequential (run with nothing else on the box).

    python BENCH/diagnose_pipeline.py [--n-docs 550000] [--levels 4,16] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import glob, json, os, sys, time
sys.path.insert(0, sys.argv[3])
from pyspark.sql import functions as F
from lyra_spark.session import get_spark
from lyra_spark.pipeline.dedup import minhash_near_duplicates, connected_components

cores = int(sys.argv[1])
fx = sys.argv[2]
reps = int(sys.argv[4])
in_bytes = sum(os.path.getsize(f) for f in glob.glob(os.path.join(fx, "*.parquet")))
shuf = max(cores, in_bytes * 8 // (100 << 20) + 1)
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=shuf,
                  app_name=f"diag_pipeline_{cores}",
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{os.getpid()}",
                              "spark.driver.memory": f"{2 * cores}g"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(fx)
docs.count()

for rep in range(reps):
    t0 = time.perf_counter()
    pairs = minhash_near_duplicates(docs, threshold=0.85)
    edges = pairs.select(
        F.col("id_a").cast("long").alias("u"), F.col("id_b").cast("long").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    n_edges = edges.count()
    t1 = time.perf_counter()
    cc = connected_components(edges.select(F.col("u").alias("id_a"), F.col("v").alias("id_b")))
    cc.write.mode("overwrite").format("noop").save()
    t2 = time.perf_counter()
    print(json.dumps({"cores": cores, "rep": rep, "n_edges": n_edges,
                      "pair_sec": round(t1 - t0, 3), "cc_sec": round(t2 - t1, 3),
                      "total_sec": round(t2 - t0, 3)}), flush=True)
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=550_000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pipeline_scaling import synth_docs  # noqa: E402

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    fx = synth_docs(args.n_docs, os.path.join(REPO, ".fixtures", f"docs_scaling_{args.n_docs}"))
    for cores in (int(x) for x in args.levels.split(",")):
        subprocess.run(
            [sys.executable, "-c", CHILD, str(cores), fx, REPO, str(args.reps)],
            check=True,
        )


if __name__ == "__main__":
    main()
