"""CLI training-data export: mixture → split → pack → deterministic shards.

    spark-submit --py-files dist/lyra_spark.zip jobs/export.py \
        --corpus <cleaned parquet> --out <export dir> --shards 64 \
        [--mixture src0=0.5,src1=0.5 --mixture-budget 1000000] \
        [--split-weights train=0.98,val=0.01,test=0.01 [--leakage-safe]] \
        [--pack-budget 4096] [--token-col n_chars] [--salt v1]

The last hop after jobs/clean.py: takes the cleaned corpus and materializes
what the trainer reads. Every stage is the deterministic md5-keyed family
(pipeline.sample / pipeline.pack / pipeline.export), so re-running the job on
the same input reproduces every shard byte-for-byte — and a changed --salt
re-draws everything on purpose.

Stage order and what each costs:
  1. mixture  — one tiny per-source aggregate + map-only Bernoulli filter;
  2. split    — map-only (or one digest exchange with --leakage-safe, which
                keys the split on duplicate-cluster representatives so no
                duplicate pair straddles train/test);
  3. shards   — per split: ONE exchange on the uniform shard key, dirs
                out/<split>/shard=K in global-shuffle order;
  4. pack     — SHARD-LOCAL (pack_id, pack_offset) via a window on the
                shard partitioning the shuffle already established (zero
                extra exchange); a pack never straddles two shard files.

Prints a one-line JSON report (docs and tokens per split, shard count).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyra_spark.session import get_spark


def _parse_weights(text: str, flag: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in text.split(","):
        if not part.strip():
            continue
        name, _, val = part.partition("=")
        if not _:
            raise SystemExit(f"{flag} entries must be name=value, got {part!r}")
        try:
            out[name.strip()] = float(val)
        except ValueError:
            raise SystemExit(f"{flag}: value for {name.strip()!r} is not a number: {val!r}") from None
    if not out:
        raise SystemExit(f"{flag}: empty weights")
    return out


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="input (cleaned) documents parquet")
    ap.add_argument("--out", required=True, help="export root dir")
    ap.add_argument("--shards", type=int, required=True,
                    help="shard dirs per split — pick from target file size "
                         "(bytes/shard ≈ corpus/N), never from cluster size")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--token-col", default="n_chars",
                    help="token-count column for --mixture-budget and --pack-budget")
    ap.add_argument("--source-col", default="source")
    ap.add_argument("--mixture", default=None,
                    help="source shares, e.g. books=0.5,web=0.5 — down-samples each "
                         "source to hit --mixture-budget total tokens at these shares")
    ap.add_argument("--mixture-budget", type=lambda s: int(float(s)), default=None,
                    help="total token budget for --mixture (accepts 2e12-style "
                         "scientific notation)")
    ap.add_argument("--split-weights", default=None,
                    help="split weights, e.g. train=0.98,val=0.01,test=0.01")
    ap.add_argument("--leakage-safe", action="store_true",
                    help="key the split on duplicate-cluster representatives "
                         "(normalized-content sha256 min-id) so no duplicate pair "
                         "straddles a split boundary")
    ap.add_argument("--pack-budget", type=int, default=None,
                    help="add SHARD-LOCAL (pack_id, pack_offset): concat-and-chunk "
                         "token packing in shuffle order, restarting per shard so a "
                         "pack never straddles two shard files (global pack identity "
                         "is the pair (shard, pack_id))")
    ap.add_argument("--format", default="parquet", choices=["parquet", "json"],
                    help="shard file format: parquet (default) or json "
                         "(JSON-Lines, for trainers that stream jsonl; same "
                         "layout and determinism)")
    ap.add_argument("--salt", default="",
                    help="re-draws every decision (mixture, split, shuffle) — version "
                         "the export by changing it; same salt = byte-identical rerun")
    ap.add_argument("--master", default=None)
    ap.add_argument("--report", default=None, help="also write the JSON report here")
    args = ap.parse_args(argv)

    if args.shards <= 0:
        raise SystemExit("--shards must be positive")
    if args.mixture and args.mixture_budget is None:
        raise SystemExit("--mixture requires --mixture-budget")
    if args.mixture_budget is not None and not args.mixture:
        raise SystemExit("--mixture-budget requires --mixture")
    if args.mixture_budget is not None and args.mixture_budget <= 0:
        raise SystemExit("--mixture-budget must be positive")
    if args.pack_budget is not None and args.pack_budget <= 0:
        raise SystemExit("--pack-budget must be positive")
    if args.leakage_safe and not args.split_weights:
        raise SystemExit("--leakage-safe requires --split-weights (it keys the split)")

    spark = get_spark(master=args.master, app_name="lyra_export")

    from pyspark.sql import functions as F

    from lyra_spark.pipeline.export import write_shards
    from lyra_spark.pipeline.sample import (
        mixture_sample,
        split_by_hash,
        split_leakage_safe,
    )

    t0 = time.time()
    docs = spark.read.parquet(args.corpus)
    if args.mixture and args.token_col not in docs.columns:
        raise SystemExit(f"--mixture needs --token-col {args.token_col!r} in the corpus")
    if args.mixture and args.source_col not in docs.columns:
        raise SystemExit(f"--mixture needs --source-col {args.source_col!r} in the corpus")
    if "split" in docs.columns:
        # both split paths withColumn("split", ...) — failing fast beats
        # silently overwriting (then dropping) a caller's existing column
        raise SystemExit("corpus already has a 'split' column — rename it before exporting")
    n_in = docs.count()

    if args.mixture:
        docs = mixture_sample(
            docs,
            _parse_weights(args.mixture, "--mixture"),
            budget_tokens=args.mixture_budget,
            token_col=args.token_col,
            source_col=args.source_col,
            id_col=args.id_col,
            salt=args.salt + "|mixture",
        )

    if args.split_weights:
        weights = _parse_weights(args.split_weights, "--split-weights")
        if args.leakage_safe and args.text_col not in docs.columns:
            raise SystemExit(
                f"--leakage-safe needs --text-col {args.text_col!r} in the corpus "
                "(the split key is the content-digest cluster representative)"
            )
        if args.leakage_safe:
            docs = split_leakage_safe(
                docs, weights, text_col=args.text_col, id_col=args.id_col,
                salt=args.salt + "|split",
            )
        else:
            docs = split_by_hash(
                docs, weights, id_col=args.id_col, salt=args.salt + "|split"
            )
        splits = list(weights)
    else:
        docs = docs.withColumn("split", F.lit("all"))
        splits = ["all"]

    # one materialization of the (sampled, split) frame feeds every split's
    # pack + shard write — without it each split re-runs the mixture filter
    # and the leakage-safe digest window
    docs = docs.localCheckpoint(eager=False)

    report: dict = {"docs_in": n_in, "splits": {}, "shards_per_split": args.shards}
    has_tokens = args.token_col in docs.columns
    if args.pack_budget and not has_tokens:
        raise SystemExit(f"--pack-budget needs --token-col {args.token_col!r} in the corpus")
    from lyra_spark.pipeline.export import pack_within_shards, shuffle_index

    for name in splits:
        part = docs.filter(F.col("split") == name).drop("split")
        dest = os.path.join(args.out, f"split={name}")
        write_shards(
            part, dest, args.shards, id_col=args.id_col, salt=args.salt + "|shuffle",
            pack_budget=args.pack_budget, token_col=args.token_col, fmt=args.format,
        )
        # read back with the EXPLICIT output schema (derived from an empty
        # plan, no job): an empty split's sink holds only _SUCCESS and schema
        # inference would raise — and any local-filesystem existence probe
        # (glob) silently reports every split empty on HDFS/S3 paths
        expected = shuffle_index(
            part.limit(0), args.shards, id_col=args.id_col, salt=args.salt + "|shuffle"
        )
        if args.pack_budget:
            expected = pack_within_shards(expected, args.pack_budget, token_col=args.token_col)
        written = spark.read.schema(expected.schema).format(args.format).load(dest)
        aggs = [F.count(F.lit(1)).alias("docs")]
        if has_tokens:
            aggs.append(
                F.sum(F.coalesce(F.col(args.token_col).cast("long"), F.lit(0))).alias("tokens")
            )
        stats = written.agg(*aggs).collect()[0]
        report["splits"][name] = {
            "docs": stats["docs"],
            **({"tokens": stats["tokens"] or 0} if has_tokens else {}),
            "path": dest,
        }

    report["sec"] = round(time.time() - t0, 3)
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
