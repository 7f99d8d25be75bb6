"""CLI corpus-cleaning run: the composed training-data pipeline as a job.

    spark-submit --py-files dist/lyra_spark.zip jobs/clean.py \
        --corpus <parquet dir> --out <cleaned dir> \
        [--min-quality 0.5] [--min-unigram-logprob -9.5] \
        [--near-dup-threshold 0.9] [--line-min-docs 2] \
        [--sig-store <dir>] [--sig-store-out <dir>] [--report <json path>]

Runs clean_corpus (quality filter → exact dedup → C4 line scrub → MinHash-LSH
near-dup representative) over a documents table (doc_id, text, …), writes the
cleaned corpus as parquet, and prints a one-line JSON funnel report (docs in,
docs out, per-stage attrition) — the numbers a data curator actually reviews
before committing a multi-day 100 TB pass.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyra_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="input documents parquet dir/file")
    ap.add_argument("--out", required=True, help="cleaned-corpus parquet dir")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--max-dup-span-fraction", type=float, default=None,
                    help="drop docs whose fraction of 13-word spans shared "
                         "with other documents exceeds this (Lee et al. 2022 "
                         "duplicated-substring cut; e.g. 0.5). Adds one "
                         "(id, span-hash) pass BEFORE the funnel; docs too "
                         "short to have a span are kept")
    ap.add_argument("--dup-span-window", type=int, default=13,
                    help="span width in words for --max-dup-span-fraction")
    ap.add_argument("--min-unigram-logprob", type=float, default=None,
                    help="drop docs whose mean unigram log-probability under "
                         "the corpus's own LM falls below this (e.g. -9.5; "
                         "pick from jobs/profile_corpus.py --unigram "
                         "percentiles). Adds one token-grid pass BEFORE the "
                         "funnel; zero-token docs are dropped too (no score)")
    ap.add_argument("--line-min-docs", type=int, default=2)
    ap.add_argument("--near-dup-threshold", type=float, default=0.9)
    ap.add_argument("--shingle-k", type=int, default=3)
    ap.add_argument("--strip-markup", action="store_true",
                    help="strip HTML tags/entities from the text before the funnel "
                         "(pipeline.text.strip_markup) — map-only, fuses into the scan")
    ap.add_argument("--block-domains", default=None,
                    help="comma-separated domains (or @file with one per line): drop "
                         "docs linking any of them BEFORE the funnel (map-only filter "
                         "for small lists; see pipeline.text.filter_blocked_domains)")
    ap.add_argument("--cap-col", default=None,
                    help="column to cap per group AFTER dedup (RefinedWeb-style "
                         "per-domain/source cap); requires --cap-k")
    ap.add_argument("--cap-k", type=int, default=None, help="max docs kept per --cap-col group")
    ap.add_argument("--sig-store", default=None,
                    help="existing signature-store parquet (pipeline.dedup."
                         "signature_store): docs whose normalized content already "
                         "exists in the base corpus are dropped BEFORE the funnel — "
                         "snapshot ingest never re-cleans what the corpus already "
                         "holds. A digest semi-join: neither side's text shuffles")
    ap.add_argument("--sig-store-out", default=None,
                    help="append the CLEANED snapshot's signature-store rows here, "
                         "keeping the store current for the next ingest. Pass the "
                         "same dir as --sig-store for in-place growth — that also "
                         "makes re-running an ingest idempotent (already-held docs "
                         "are dropped before they can re-append); --sig-store-out "
                         "ALONE double-appends on a re-run")
    ap.add_argument("--master", default=None)
    ap.add_argument("--report", default=None, help="also write the JSON report here")
    args = ap.parse_args(argv)
    if bool(args.cap_col) != (args.cap_k is not None):
        raise SystemExit("--cap-col and --cap-k must be given together")
    if args.cap_k is not None and args.cap_k < 1:
        raise SystemExit("--cap-k must be >= 1")

    # data-sized shuffle partitions (same policy as jobs/validate.py): the
    # dedup exchanges run ~8x the input bytes through explode/join stages.
    # The local glob only sizes LOCAL paths — on a remote corpus (hdfs://,
    # s3a://, ...) it finds nothing, and a silent in_bytes=0 would floor a
    # multi-TB run at 8 shuffle partitions; leave the session default (plus
    # AQE coalescing) instead.
    files = glob.glob(os.path.join(args.corpus, "**", "*.parquet"), recursive=True) or (
        [args.corpus] if os.path.isfile(args.corpus) else []
    )
    in_bytes = sum(os.path.getsize(f) for f in files)
    if files:
        shuf = int(max(8, in_bytes * 8 // (100 << 20) + 1))
        spark = get_spark(master=args.master, shuffle_partitions=shuf, app_name="lyra_clean")
    else:
        print(f"[lyra] corpus {args.corpus!r} not on the local filesystem — "
              "using the session-default shuffle partitions (size them via "
              "spark.sql.shuffle.partitions for multi-TB inputs)")
        spark = get_spark(master=args.master, app_name="lyra_clean")

    from pyspark.sql import functions as F

    from lyra_spark.pipeline.clean import clean_corpus
    from lyra_spark.pipeline.dedup import distinct_by_content
    from lyra_spark.pipeline.text import quality_score

    t0 = time.time()
    docs = spark.read.parquet(args.corpus).filter(F.col(args.text_col).isNotNull())
    n_in = docs.count()

    if args.strip_markup:
        # applied to `docs` HERE (not via clean_corpus's flag) so the funnel
        # report's quality/dedup probes below measure the same stripped text
        # the pipeline saw
        from lyra_spark.pipeline.text import strip_markup

        cols = docs.columns
        docs = (
            strip_markup(docs, args.text_col)
            .drop(args.text_col)
            .withColumnRenamed("text_plain", args.text_col)
            .select(*cols)
        )

    n_blocked = None
    if args.block_domains:
        from lyra_spark.pipeline.text import filter_blocked_domains

        if args.block_domains.startswith("@"):
            with open(args.block_domains[1:]) as fh:
                blocked = [ln.strip() for ln in fh if ln.strip()]
        else:
            blocked = [d.strip() for d in args.block_domains.split(",") if d.strip()]
        docs = filter_blocked_domains(docs, blocked, args.text_col, args.id_col)
        n_blocked = n_in - docs.count()

    n_in_base = None
    if args.sig_store:
        from lyra_spark.pipeline.dedup import incremental_exact_duplicates

        store = spark.read.parquet(args.sig_store)
        dup_ids = incremental_exact_duplicates(docs, store, args.text_col, args.id_col).select(
            F.col("new_id").alias(args.id_col)
        )
        n_in_base = dup_ids.count()  # one row per already-present new doc
        docs = docs.join(dup_ids, args.id_col, "left_anti")

    n_span_kept = None
    if args.max_dup_span_fraction is not None:
        from lyra_spark.pipeline.text import duplicate_span_stats

        # drop-list anti-join: only the offending ids shuffle back, and docs
        # without a defined fraction (too short) pass through untouched
        # gate on the UNROUNDED ratio (SEMANTICS.md 83/85 convention);
        # dup_span_fraction is rounded for display only
        drop = duplicate_span_stats(
            docs, args.text_col, args.id_col, window=args.dup_span_window
        ).filter(
            (F.col("n_dup_spans") / F.col("n_spans")) > args.max_dup_span_fraction
        ).select(args.id_col)
        docs = docs.join(drop, args.id_col, "left_anti")
        n_span_kept = docs.count()

    n_lm_kept = None
    if args.min_unigram_logprob is not None:
        from lyra_spark.pipeline.text import unigram_logprob

        # LM built on the post-blocklist/post-ingest docs (the corpus being
        # cleaned), scores broadcast back as a tiny (id) keep-list complement:
        # only ids shuffle, the text column never does
        try:
            scored = unigram_logprob(docs, args.text_col, args.id_col)
        except ValueError as e:
            # token-free corpus: NO doc has a defined score, so the keep-list
            # would be empty and the stage would silently drop EVERYTHING —
            # fail loudly instead
            raise SystemExit(f"--min-unigram-logprob: {e}") from e
        keep = scored.filter(
            F.col("logprob_per_token") >= args.min_unigram_logprob
        ).select(args.id_col)
        docs = docs.join(keep, args.id_col, "left_semi")
        n_lm_kept = docs.count()

    cleaned = clean_corpus(
        docs,
        text_col=args.text_col,
        id_col=args.id_col,
        min_quality=args.min_quality,
        line_min_docs=args.line_min_docs,
        near_dup_threshold=args.near_dup_threshold,
        shingle_k=args.shingle_k,
    )
    n_uncapped = None
    if args.cap_col:
        from lyra_spark.pipeline.clean import cap_per_group

        # persist: the cap count must not re-run the whole funnel, and the
        # capped write below reuses the same materialization
        cleaned = cleaned.persist()
        n_uncapped = cleaned.count()
        cleaned = cap_per_group(cleaned, args.cap_col, args.cap_k, order_col=args.id_col)
    cleaned.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    n_out = out.count()

    if args.sig_store_out:
        from lyra_spark.pipeline.dedup import signature_store

        # shingle_k must match the run's near-dup configuration — a store
        # signed with a different k band-joins a later snapshot's signatures
        # from a different shingle family and silently never collides
        signature_store(
            out, args.text_col, args.id_col, shingle_k=args.shingle_k
        ).write.mode("append").parquet(args.sig_store_out)

    # funnel attrition for the report: stage counts re-derived from cheap
    # aggregates over the written output plus two light probes (the quality
    # and exact-dedup stages are one agg each; the expensive near-dup work is
    # NOT re-run)
    # ONE quality-scored frame feeds both probes — scoring re-runs the
    # regex-heavy features over all text, so building it twice doubled the
    # probe scan cost on exactly the corpora this job targets
    quality_kept = (
        quality_score(docs, args.text_col)
        .filter(F.col("quality_score") >= args.min_quality)
        .select(docs.columns)
    )
    n_quality = quality_kept.count()
    n_exact = distinct_by_content(quality_kept, args.text_col, args.id_col).count()
    n_scrub_affected = out.filter(F.col("n_lines_removed") > 0).count()

    report = {
        "docs_in": n_in,
        **({"blocked_by_domain": n_blocked} if n_blocked is not None else {}),
        **({"already_in_base": n_in_base} if n_in_base is not None else {}),
        **({"after_dup_span": n_span_kept} if n_span_kept is not None else {}),
        **({"after_unigram_lm": n_lm_kept} if n_lm_kept is not None else {}),
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        # scrub-emptied docs + near-dup cluster members dropped for their
        # representative (the two post-exact stages, combined)
        # scrub-emptied + near-dup drops; cap attrition reported separately
        # so the curator doesn't misattribute it to dedup/scrub
        "removed_after_exact": (n_exact - n_uncapped) if n_uncapped is not None else (n_exact - n_out),
        **({"capped": n_uncapped - n_out} if n_uncapped is not None else {}),
        "docs_with_lines_scrubbed": n_scrub_affected,
        "docs_out": n_out,
        "sec": round(time.time() - t0, 3),
        "out": args.out,
    }
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
