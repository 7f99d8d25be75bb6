"""CLI batch validation run (SURVEY.md §3 entry point 2).

    spark-submit --py-files dist/lyra_spark.zip jobs/validate.py \
        --table <parquet dir | iceberg:catalog.table> \
        --tools-dim <parquet> --checkpoint <dir> --run-id <id> \
        [--out <violations dir>] [--partitions N] [--drift-col "length(text)"]

Per pending partition: scoped scan (partition-pruned) → full suite →
violation sink → manifest update with lineage + timing. Resume: re-run with
the same --run-id skips completed partitions whose rule fingerprint matches.
A final drift pass merges per-partition t-digests tree-wise.
"""

from __future__ import annotations

import argparse
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyra_spark import checkpoint as ckpt
from lyra_spark import io as lio
from lyra_spark.presets import transcript_ruleset, validate_transcripts
from lyra_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--tools-dim", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--out", default=None, help="violations output dir (parquet)")
    ap.add_argument("--verdicts-out", default=None,
                    help="per-partition verdict parquet dir (default <checkpoint>/<run-id>/verdicts)")
    ap.add_argument("--master", default=None)
    ap.add_argument("--drift-col", default="cast(length(text) as double)")
    ap.add_argument("--reference", default=None,
                    help="saved drift baseline (from --save-reference); default: this run's global digest")
    ap.add_argument("--save-reference", default=None,
                    help="persist this run's global drift digest here (tomorrow's --reference)")
    ap.add_argument("--limit-partitions", type=int, default=None, help="validate at most N pending partitions")
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master, app_name=f"lyra_validate_{args.run_id}")
    df = lio.read_transcripts(spark, args.table)
    dim = spark.read.parquet(args.tools_dim)
    ruleset = transcript_ruleset()

    manifest = ckpt.load_manifest(args.checkpoint, args.run_id)
    all_parts = lio.list_partitions(spark, df)
    pending = manifest.pending(all_parts, ruleset)
    n_done = len(all_parts) - len(pending)
    if args.limit_partitions:
        pending = pending[: args.limit_partitions]
    print(f"[lyra] partitions total={len(all_parts)} completed={n_done} this_run={len(pending)}")

    verdicts_out = args.verdicts_out or os.path.join(args.checkpoint, args.run_id, "verdicts")
    for pk in pending:
        t0 = time.perf_counter()
        scoped = lio.partition_scope(df, pk)
        result = validate_transcripts(scoped, dim)
        if args.out:
            # write-then-reuse: violations compute once into the sink; the
            # manifest count reads the written files (never recompute or cache)
            out_pk = f"{args.out}/part={pk}"
            lio.write_violations(result.violations, out_pk, partition_col="part_date")
            # explicit schema: a clean partition's sink holds only _SUCCESS and
            # schema inference would throw UNABLE_TO_INFER_SCHEMA
            n_viol = spark.read.schema(result.violations.schema).parquet(out_pk).count()
        else:
            n_viol = result.violations.count()
        # verdict sink (SURVEY.md §2 row 5): the per-partition pass/fail frame
        # is an OUTPUT of the run, not a transient DataFrame — tiny parquet
        # (rules × 1 partition rows), one dir per partition key so resume
        # overwrites only its own partition
        result.verdicts.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(verdicts_out, f"part={pk}")
        )
        n_rows = scoped.count()
        wall_ms = (time.perf_counter() - t0) * 1000
        manifest.record(pk, ruleset, rows=n_rows, violations=n_viol, wall_ms=wall_ms)
        ckpt.save_manifest(args.checkpoint, manifest)
        print(f"[lyra] partition={pk} rows={n_rows} violations={n_viol} wall_ms={wall_ms:.0f}")

    # final drift pass over ALL partitions (cheap: sketches only)
    from lyra_spark.drift import drift_verdicts, load_reference, save_reference, sketch_by_partition

    sk = sketch_by_partition(df, args.drift_col, "part_date")
    if args.save_reference:
        sk = sk.persist()  # tiny (one row per partition); reused by verdicts below
    ref = load_reference(args.reference) if args.reference else None
    dv = drift_verdicts(sk, reference=ref)
    failing = dv.loc[~dv["pass"], "part_key"].tolist()
    print(f"[lyra] drift: {len(dv)} partitions, failing={failing}")
    if args.save_reference:
        save_reference(sk, args.save_reference)
        print(f"[lyra] drift reference saved to {args.save_reference}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
