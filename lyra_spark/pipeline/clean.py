"""End-to-end corpus cleaning: the composition a real pre-training pipeline
runs (C4 / Gopher / RefinedWeb order), built from this package's operators.

Stage order is the cheap-first funnel that matters at 100 TB:
  1. quality filter        — map-only scoring; drops garbage BEFORE anything
                             shuffles, so every later exchange sees less data;
  2. exact dedup           — keep min-id per normalized content: one digest
                             exchange. MUST precede the line scrub: a line
                             shared only by byte-identical copies of one doc
                             is that doc's content, not corpus boilerplate —
                             counting lines before collapsing exact dups
                             would scrub such docs down to nothing;
  3. line-level scrub      — corpus-wide boilerplate removal (C4): one
                             (id, line-hash) exchange, text never shuffles;
  4. near-dup clustering   — MinHash-LSH pairs → connected components; keep
                             the cluster representative (min doc id). Also
                             mops up docs made newly identical by the scrub
                             (jaccard 1.0 clusters).
Each stage only ever sees the previous stage's survivors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import dedup_clusters, distinct_by_content, scrub_duplicate_lines
from .text import quality_score


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    line_min_docs: int = 2,
    near_dup_threshold: float = 0.9,
    shingle_k: int = 3,
    strip_markup_first: bool = False,
) -> DataFrame:
    """Return the cleaned corpus: one representative document per near-dup
    cluster, boilerplate lines scrubbed, garbage filtered. Output columns:
    the input's, with `text` replaced by the scrubbed text, plus provenance
    (quality_score, n_lines_removed) so downstream audits don't recompute.

    Representative choice is deterministic (min id at both dedup stages), so
    the whole pass is re-runnable to byte-identical output on fixed input.
    """
    in_cols = df.columns

    if strip_markup_first:
        # stage 0 (map-only, fuses into the same scan as the quality score):
        # pages arriving as raw HTML are stripped BEFORE anything measures or
        # hashes text — markup would otherwise poison quality ratios, shingle
        # sets, and line hashes alike (strip_markup preserves line structure,
        # so the line-level scrub below still sees lines)
        from .text import strip_markup

        if "text_plain" in in_cols:
            # strip_markup's withColumn would silently clobber it, the rename
            # would then remove the name, and select(*in_cols) would raise a
            # misleading AnalysisException — fail fast with the real cause
            raise ValueError(
                "strip_markup_first reserves the column name 'text_plain' — "
                "rename the input column first"
            )
        df = strip_markup(df, text_col).drop(text_col).withColumnRenamed(
            "text_plain", text_col
        ).select(*in_cols)

    # quality_score adds feature columns (n_chars, n_tokens, ...); if the
    # input already carries a column by one of those names (e.g. upstream
    # n_chars metadata), withColumns would REPLACE it and select(*in_cols)
    # would leak the clobbered value into the cleaned output — stash such
    # columns around the scoring stage (map-only renames, no plan change)
    feature_cols = {
        "n_chars", "n_tokens", "punct_ratio", "digit_ratio",
        "stopword_ratio", "mean_word_len", "quality_score",
    }
    # quality_score and n_lines_removed are THIS pass's provenance outputs:
    # they replace any same-named input (decision 36 family) — restoring an
    # input quality_score alongside the computed one would duplicate the name
    # and break every later select. Other feature-named inputs are stashed
    # and restored untouched.
    stash = {
        c: f"__orig_{c}"
        for c in in_cols
        if c in feature_cols and c not in (text_col, "quality_score")
    }
    for c in in_cols:
        if c.startswith("__"):
            raise ValueError(f"input must not contain reserved column {c!r}")
    work = df
    for c, s in stash.items():
        work = work.withColumnRenamed(c, s)
    scored = quality_score(work, text_col).filter(
        F.col("quality_score") >= min_quality
    )
    # quality_score AND n_lines_removed are this pass's provenance outputs —
    # excluding both from the restore keeps the promised replace-semantics
    # (restoring an input n_lines_removed alongside the scrub's would emit a
    # duplicate column name and break the final select/union)
    restored = [c for c in in_cols if c not in ("quality_score", "n_lines_removed")]
    scored = scored.select(
        *[F.col(stash.get(c, c)).alias(c) for c in restored], "quality_score"
    )

    exact = distinct_by_content(scored, text_col, id_col)

    scrubbed = scrub_duplicate_lines(exact, text_col, id_col, min_docs=line_min_docs)
    uniq = scrubbed.select(
        *[
            F.col("text_scrubbed").alias(text_col) if c == text_col else F.col(c)
            for c in restored
        ],
        "quality_score",
        "n_lines_removed",
    ).filter(F.length(F.trim(F.col(text_col))) > 0)

    clusters = dedup_clusters(
        uniq, text_col, id_col, threshold=near_dup_threshold, shingle_k=shingle_k
    )
    # keep docs in no cluster AND each cluster's min-id representative, as
    # ONE anti-join against the non-representative ids — the former
    # two-branch union re-evaluated uniq's whole uncached lineage (scoring
    # scan, dedup window, scrub exchanges) twice at corpus scale
    drop = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return uniq.join(drop, id_col, "left_anti")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``k`` rows per group, deterministically (the RefinedWeb /
    C4-style per-domain document cap — one hot domain must not dominate the
    corpus). Rows survive in ascending ``order_col`` order within each group,
    so reruns are byte-identical.

    One exchange keyed on the group; the window row_number caps before
    anything else sees the data, and the sort spills — a 10⁸-doc domain
    never holds more than its spill pages in memory."""
    from pyspark.sql import Window

    if "__rn" in df.columns:
        raise ValueError("input must not contain the reserved column '__rn'")
    w = Window.partitionBy(group_col).orderBy(F.col(order_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
