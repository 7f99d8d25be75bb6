"""CLI corpus profile: one command → one JSON report of what a documents
table contains — the survey a data curator runs BEFORE spending a multi-day
100 TB cleaning pass (and the before/after comparison once it lands).

    spark-submit --py-files dist/lyra_spark.zip jobs/profile_corpus.py \
        --corpus <parquet dir> [--report <json path>] [--top-domains 10]

Cost shape: the TEXT is scanned once, and nothing ever shuffles it —
  1. ONE map-only scan derives every per-doc scalar (token counts, quality,
     lang prediction, URL counts) into a lazily-checkpointed scalar frame;
     the global aggregate row AND the language roll-up both read those
     cached scalars, not the corpus;
  2. one hash-aggregate on the 32-byte content digest for the exact-dup rate;
  3. one (id, domain) explode + count for the top linked domains.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lyra_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True, help="documents parquet dir/file")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--top-domains", type=int, default=10)
    ap.add_argument("--profile-cols", default=None,
                    help="comma-separated metadata columns: add profile findings "
                         "(all-null/constant/complete/candidate-key, HLL distinct) "
                         "and exact top-5 frequent values per column to the report")
    ap.add_argument("--skew-cols", default=None,
                    help="comma-separated key columns: add a shuffle-skew "
                         "diagnosis per column (per-key count summary + salt "
                         "recommendation) to the report")
    ap.add_argument("--unigram", action="store_true",
                    help="add unigram-LM log-probability quality stats (mean + "
                         "p1/p10/p50/p90 of per-doc mean log-prob under the "
                         "corpus's own unigram model) — one extra token-grid "
                         "pass over the text; see pipeline.text.unigram_logprob")
    ap.add_argument("--master", default=None)
    ap.add_argument("--report", default=None, help="also write the JSON report here")
    args = ap.parse_args(argv)

    spark = get_spark(master=args.master, app_name="lyra_profile")

    from pyspark.sql import functions as F

    from lyra_spark.pipeline.dedup import _norm
    from lyra_spark.pipeline.text import URL_PATTERN, lang_id, quality_score

    t0 = time.time()
    docs = spark.read.parquet(args.corpus)
    tc = args.text_col

    # job 1: every per-doc scalar in one map-only scan → one aggregate row.
    # n_tokens/n_chars REUSE quality_score's materialized feature columns
    # (coalesced to 0 for NULL text — token_count('')/length('') are 0 too):
    # recomputing them from scratch would split/measure every text twice,
    # since Catalyst does not guarantee CSE across the regex split.
    derived = lang_id(quality_score(docs, tc), tc).select(
        F.col(tc).isNull().cast("int").alias("is_null"),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
        "quality_score",
        "lang_pred",
        F.size(F.regexp_extract_all(F.coalesce(F.col(tc), F.lit("")), F.lit(URL_PATTERN), 0)).alias("n_urls"),
    ).localCheckpoint(eager=False)  # text scanned ONCE; the lang roll-up below reads these cached scalars
    row = derived.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_null").alias("n_null_text"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("percentile_approx(n_tokens, array(0.5, 0.9, 0.99), 10000)").alias("tok_pcts"),
        F.round(F.avg("quality_score"), 4).alias("mean_quality"),
        F.sum((F.col("quality_score") < 0.5).cast("int")).alias("n_low_quality"),
        F.sum((F.col("n_urls") > 0).cast("int")).alias("n_docs_with_urls"),
    )
    stats = row.collect()[0].asDict()
    # percentile_approx over zero rows is NULL — an empty corpus must still
    # produce a report, not a TypeError
    pcts = stats.pop("tok_pcts") or [None, None, None]
    stats["tok_p50"], stats["tok_p90"], stats["tok_p99"] = pcts

    lang_dist = {
        r.lang_pred: r.c
        for r in derived.groupBy("lang_pred").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    # job 2: exact-duplicate rate from the content digest (constant-size agg)
    non_null = docs.filter(F.col(tc).isNotNull())
    dup = non_null.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct(F.sha2(_norm(tc), 256)).alias("n_distinct"),
    ).collect()[0]
    dup_rate = 0.0 if dup.n == 0 else round(1.0 - dup.n_distinct / dup.n, 6)

    # job 3: top linked domains ((id, domain) pairs only — never text)
    from lyra_spark.pipeline.text import domain_stats

    top = [
        {"domain": r.domain, "n_docs": r.n_docs, "n_urls": r.n_urls}
        for r in domain_stats(non_null, tc, args.id_col)
        .orderBy(F.desc("n_urls"), "domain")
        .limit(args.top_domains)
        .collect()
    ]

    # job 4 (opt-in): metadata-column findings + heavy hitters — one agg pass
    # each, never touching text
    findings, top_values = None, None
    if args.profile_cols:
        from lyra_spark.stats import frequent_values, profile_findings

        cols = [c.strip() for c in args.profile_cols.split(",") if c.strip()]
        findings = [r.asDict() for r in profile_findings(docs, cols).collect()]
        top_values = {}
        for r in sorted(frequent_values(docs, cols, k=5).collect(), key=lambda r: (r.column, r.rank)):
            top_values.setdefault(r.column, []).append({"value": r.value, "count": r["count"]})

    # job 5 (opt-in): shuffle-key skew diagnosis — ONE unpivot scan covers
    # every listed column (stats.key_skew_profiles); a per-column loop would
    # re-read the corpus K times
    skew = None
    if args.skew_cols:
        from lyra_spark.stats import key_skew_profiles

        cols = [c.strip() for c in args.skew_cols.split(",") if c.strip()]
        skew = {
            r["column"]: {k: v for k, v in r.asDict().items() if k != "column"}
            for r in key_skew_profiles(docs, cols).collect()
        }

    # job 6 (opt-in): unigram-LM quality distribution — the statistical
    # complement of the heuristic mean_quality above; percentiles locate the
    # low-probability tail a --min-unigram-logprob cleaning cut would remove
    unigram = None
    if args.unigram:
        from lyra_spark.pipeline.text import unigram_logprob

        try:
            lp = unigram_logprob(docs, tc, args.id_col)
        except ValueError as e:
            # a token-free corpus (all-NULL text, no [a-z0-9] runs) has no
            # LM — report the fact instead of stack-tracing out of the CLI
            lp = None
            unigram = {"error": str(e)}
        if lp is not None:
            u = lp.agg(
                F.round(F.avg("logprob_per_token"), 4).alias("mean"),
                F.expr(
                    "percentile_approx(logprob_per_token, array(0.01, 0.1, 0.5, 0.9), 10000)"
                ).alias("p"),
            ).collect()[0]
            unigram = {
                "mean_logprob_per_token": u.mean,
                "logprob_p1_p10_p50_p90": [None if v is None else round(v, 4) for v in (u.p or [None] * 4)],
            }

    report = {
        "n_docs": stats["n_docs"],
        "n_null_text": stats["n_null_text"],
        "total_tokens": stats["total_tokens"],
        "total_chars": stats["total_chars"],
        "tokens_p50_p90_p99": [stats["tok_p50"], stats["tok_p90"], stats["tok_p99"]],
        "mean_quality": stats["mean_quality"],
        "n_low_quality": stats["n_low_quality"],
        "exact_dup_rate": dup_rate,
        "lang_distribution": dict(sorted(lang_dist.items(), key=lambda kv: -kv[1])),
        "n_docs_with_urls": stats["n_docs_with_urls"],
        "top_domains": top,
        **({"column_findings": findings} if findings is not None else {}),
        **({"frequent_values": top_values} if top_values is not None else {}),
        **({"key_skew": skew} if skew is not None else {}),
        **({"unigram_quality": unigram} if unigram is not None else {}),
        "sec": round(time.time() - t0, 3),
    }
    line = json.dumps(report)
    print(line)
    if args.report:
        with open(args.report, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
