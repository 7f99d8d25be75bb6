"""Scaling-efficiency evidence for the LLM-pipeline dedup operator
(MinHash-LSH near-dup clustering), companion to BENCH/run_scaling.py which
gates the validation suite.

Same v2 methodology (see run_scaling.py's docstring and the pairs below):
both level JVMs stay alive, timed runs alternate N,4N adjacent in time,
every pair is bracketed by busy-loop + memory-bandwidth probes, efficiency
is scored on the min-wall (steal only ever inflates walls), and heap scales
with cores. Input is a deterministically synthesized document corpus
(seeded xxhash64 word draws + planted near-dup twins) — generated once at
full parallelism BEFORE the levels launch, then read-only.

    python BENCH/pipeline_scaling.py [--n-docs 200000] [--levels 4,16] [--pairs 3]

Writes BENCH/PIPELINE_SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from run_scaling import Level, probe_bandwidth, probe_parallel  # noqa: E402

CHILD_DEDUP = r"""
import glob, json, os, sys, time
sys.path.insert(0, sys.argv[3])
from lyra_spark.session import get_spark
from lyra_spark.pipeline.dedup import dedup_clusters

cores = int(sys.argv[1])
fx = sys.argv[2]
# Data-sized shuffle partitions, identical at both levels (run_scaling.py
# lesson: cores-sized shuffling hands the N level 4x-larger sort partitions
# and measures memory capacity, not scaling). The explode/join intermediates
# run ~8x the input bytes (64-long signatures + banded rows + shingle sets).
in_bytes = sum(os.path.getsize(f) for f in glob.glob(os.path.join(fx, "*.parquet")))
shuf = max(cores, in_bytes * 8 // (100 << 20) + 1)
spark = get_spark(master=f"local[{cores}]", shuffle_partitions=shuf,
                  app_name=f"pipeline_scaling_{cores}",
                  extra_conf={"spark.local.dir": f"/dev/shm/spark-local-{os.getpid()}",
                              "spark.driver.memory": f"{2 * cores}g"})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(fx)
n = docs.count()

def run():
    dedup_clusters(docs, threshold=0.85).write.mode("overwrite").format("noop").save()

def sweep():
    # localCheckpoint blocks from the previous run are garbage the moment the
    # run's action completes, but Spark's ContextCleaner frees them only on a
    # driver GC cycle — sweep explicitly so later runs in this long-lived JVM
    # aren't measured under an ever-growing storage pool.
    import gc
    gc.collect()
    for r in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
        try:
            r.unpersist(True)
        except Exception:
            pass
    spark.sparkContext._jvm.System.gc()

print(json.dumps({"ready": True, "rows": n}), flush=True)
for line in sys.stdin:
    if line.strip() == "QUIT":
        break
    # sweep INSIDE this child's turn, before t0, so its cost lands in neither
    # this run's wall nor a concurrently-timed sibling level's
    sweep()
    t0 = time.perf_counter()
    run()
    print(json.dumps({"sec": round(time.perf_counter() - t0, 3)}), flush=True)
"""


def synth_docs(n_docs: int, path: str) -> str:
    """Deterministic corpus: ~40-80 seeded pseudo-words per doc from a 50k
    vocab; every 10th doc gets a twin with its first two words changed
    (2 changed 3-shingles of ~w-2 → jaccard ≈ (w-4)/w ≥ 0.9 at w ≥ 40)."""
    marker = os.path.join(path, "_SYNTH_OK")
    if os.path.exists(marker):
        return path
    from pyspark.sql import functions as F

    from lyra_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32, app_name="synth_docs")
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))

    def words(prefix_differs: bool):
        n_words = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(1)), F.lit(41)) + F.lit(40)
        def word(i):
            w = F.concat(F.lit("w"), F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(7)), F.lit(50000)))
            if prefix_differs:
                return F.when(i < 2, F.concat(F.lit("x"), F.pmod(F.xxhash64(F.col("doc_id"), i, F.lit(13)), F.lit(50000)))).otherwise(w)
            return w
        return F.array_join(F.transform(F.sequence(F.lit(0), n_words - 1), word), " ")

    originals = base.select("doc_id", words(False).alias("text"))
    # twins reuse the ORIGINAL doc_id inside the word hash so their tails match
    twins = base.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id"), words(True).alias("twin_text"), (F.col("doc_id") + n_docs).alias("twin_id")
    ).select(F.col("twin_id").alias("doc_id"), F.col("twin_text").alias("text"))
    originals.unionByName(twins).repartition(32).write.mode("overwrite").parquet(path)
    open(marker, "w").write("ok")
    spark.stop()
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=200_000)
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--warmups", type=int, default=3)
    # the probe gate is relative to the host's CURRENT operating band (the
    # busy-loop ceiling drifts day to day: ~400 M-it/s when this harness was
    # written, ~350-370 in later sessions); the per-pair probe readings are
    # published in the artifact either way, so the gate only filters
    # obviously-storm-struck pairs rather than defining "quiet"
    ap.add_argument("--min-probe", type=float, default=345.0)
    ap.add_argument("--min-bw", type=float, default=30.0)
    ap.add_argument("--max-attempts", type=int, default=40)
    ap.add_argument("--wait-secs", type=float, default=45.0)
    ap.add_argument("--calibrate", action="store_true",
                    help="one 16c timed run, print wall, exit (corpus sizing)")
    args = ap.parse_args()
    lo, hi = (int(x) for x in args.levels.split(","))
    assert hi == 4 * lo

    fx = synth_docs(args.n_docs, os.path.join(REPO, ".fixtures", f"docs_scaling_{args.n_docs}"))

    if args.calibrate:
        b = Level(hi, fx, CHILD_DEDUP)
        b.run_once()
        w = b.run_once()
        print(json.dumps({"calibrate_16c_sec": w, "rows": b.rows}), flush=True)
        b.close()
        return

    a, b = Level(lo, fx, CHILD_DEDUP), Level(hi, fx, CHILD_DEDUP)
    rows = a.rows
    print(json.dumps({"rows": rows, "levels": [lo, hi]}), flush=True)
    for w in range(args.warmups):
        print(json.dumps({"warmup": w, lo: a.run_once(), hi: b.run_once()}), flush=True)

    pairs = []
    attempts = 0
    while len(pairs) < args.pairs and attempts < args.max_attempts:
        attempts += 1
        p0, bw0 = probe_parallel(hi), probe_bandwidth(hi)
        if p0 < args.min_probe or bw0 < args.min_bw:
            print(json.dumps({"skipped": True, "probe_mips": p0, "bw_gbps": bw0}), flush=True)
            time.sleep(args.wait_secs)
            continue
        sa = a.run_once()
        p1, bw1 = probe_parallel(hi), probe_bandwidth(hi)
        sb = b.run_once()
        p2, bw2 = probe_parallel(hi), probe_bandwidth(hi)
        pairs.append({"probe_mips": min(p0, p1, p2), "bw_gbps": min(bw0, bw1, bw2),
                      f"sec_{lo}": sa, f"sec_{hi}": sb,
                      "eff": round((sa / sb) / (hi / lo), 3)})
        print(json.dumps(pairs[-1]), flush=True)
    a.close()
    b.close()
    if not pairs:
        print(json.dumps({"error": "host never met the weather gate"}))
        return

    # Attribution bounds, same session (methodology of run_scaling.py): the
    # ALU-bound Spark control is the best any plan can scale through this
    # exact stack right now; the host stream-copy ceiling is what a purely
    # memory-bound job would get. A dedup suite mixing hashing (ALU) with
    # shuffles (memory) should land between them.
    from run_scaling import CHILD_ALU  # noqa: E402
    ac, bc = Level(lo, None, CHILD_ALU), Level(hi, None, CHILD_ALU)
    ac.run_once(), bc.run_once()  # warm (JIT, codegen)
    alu = [(ac.run_once(), bc.run_once()) for _ in range(3)]
    ac.close(), bc.close()
    alu_lo, alu_hi = min(p[0] for p in alu), min(p[1] for p in alu)
    alu_eff = round((alu_lo / alu_hi) / (hi / lo), 3)
    bw_lo = max(probe_bandwidth(lo) for _ in range(3))
    bw_hi = max(probe_bandwidth(hi) for _ in range(3))
    host_bw_eff = round((bw_hi / bw_lo) / (hi / lo), 3)
    print(json.dumps({"alu_eff": alu_eff, "alu_walls": [alu_lo, alu_hi],
                      "host_bw": [bw_lo, bw_hi], "host_bw_eff": host_bw_eff}), flush=True)

    best_lo = min(p[f"sec_{lo}"] for p in pairs)
    best_hi = min(p[f"sec_{hi}"] for p in pairs)
    eff = round((best_lo / best_hi) / (hi / lo), 3)
    thr_lo, thr_hi = round(rows / best_lo, 1), round(rows / best_hi, 1)

    lines = [
        "# Pipeline-operator scaling: MinHash-LSH near-dup clustering",
        "",
        "Companion to `BENCH/BASELINE.md` (the validation-suite gate). Same",
        "methodology — alternating co-resident levels, probe-bracketed pairs,",
        "min-wall scoring, 2 g/core heap, data-sized shuffle partitions — applied",
        "to `pipeline.dedup.dedup_clusters` (signature -> banded LSH candidates ->",
        "exact-Jaccard verify -> connected components) end-to-end.",
        "",
        f"Input: {rows:,} synthetic docs (~40-80 words, 50k vocab, 10% planted",
        "near-dup twins), generated by `BENCH/pipeline_scaling.py synth_docs`",
        "(seeded xxhash64 — bit-identical across runs).",
        "",
        f"| probe (M-it/s) | bw (GB/s) | {lo}c wall (s) | {hi}c wall (s) | pair efficiency |",
        "|---|---|---|---|---|",
    ]
    for p in pairs:
        lines.append(
            f"| {p['probe_mips']} | {p['bw_gbps']} | {p[f'sec_{lo}']} | {p[f'sec_{hi}']} | {p['eff']} |"
        )
    lines += [
        "",
        f"**Efficiency (min-wall over {len(pairs)} pairs): {eff}** "
        f"({lo}c {best_lo} s = {thr_lo:,.0f} docs/s; {hi}c {best_hi} s = {thr_hi:,.0f} docs/s; "
        f"required >= 0.8).",
        "",
        "Same-session attribution bounds (methodology of `BENCH/BASELINE.md`):",
        "",
        f"| bound | {lo}-way | {hi}-way | efficiency |",
        "|---|---|---|---|",
        f"| ALU-bound Spark control, SAME stack (1.6e9 × 12 chained xxhash64) | {alu_lo} s | {alu_hi} s | **{alu_eff}** |",
        f"| host stream-copy throughput, NO Spark/JVM (numpy memcpy, best of 3) | {bw_lo} GB/s | {bw_hi} GB/s | **{host_bw_eff}** |",
        "",
        "The ALU control is the ceiling any Spark plan can scale through this",
        "stack in this session's weather; the memcpy row is the floor a purely",
        "memory-bound job gets from this host. A dedup pass mixing hashing",
        "(ALU) with join exchanges (memory) should land between them; at or",
        "above the ALU control means the plan adds no scaling defect of its",
        "own.",
        "",
        "The operator is map-dominated (signature + shingle build) with two",
        "bounded shuffles (band explode-join, candidate verify join); the",
        "components step is scale-adaptive — driver-side vectorized union-find",
        "under a 10⁶-edge bound (the near-dup edge set is ≪ corpus), the",
        "Kiveris alternating-star rounds above it — so no per-round job-",
        "scheduling tail lands on small graphs. This is the shape that must",
        "scale linearly for a 100 TB dedup pass to be feasible.",
        "",
    ]
    out = os.path.join(REPO, "BENCH", "PIPELINE_SCALING.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"efficiency": eff, f"sec_{lo}": best_lo, f"sec_{hi}": best_hi,
                      "docs_per_sec_lo": thr_lo, "docs_per_sec_hi": thr_hi,
                      "report": out}), flush=True)


if __name__ == "__main__":
    main()
