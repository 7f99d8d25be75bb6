"""Deduplication operators for web-scale corpora.

Shuffle budget at 100 TB (the design constraint for every operator here):
  * exact: one hash-aggregate on a 64-char digest — rows shuffle once, by
    digest, with map-side partials;
  * MinHash: the ENTIRE signature computes inside per-row Catalyst
    expressions (array_min over transformed shingle arrays — no explode, no
    shuffle); only (doc_id, band_hash) pairs — n_bands small ints per doc —
    ever hit an exchange;
  * candidate verification joins only within LSH buckets, never all-pairs;
  * SimHash bit-votes compute in per-row Catalyst higher-order array
    functions — like MinHash, zero Python crossings.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lyra_spark.io import spread_if_narrow

# --- shared text normalization ------------------------------------------------
def _norm(text_col: str) -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def word_shingles(text_col: str, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text (array<string>).

    The token array is bound ONCE as a lambda variable (the one-element
    transform() below is Catalyst's `let`): naming the split expression in
    Python and slicing it inside the per-position lambda re-runs the
    regexp+split per shingle — measured 8x slower on ordinary web docs.
    """
    def from_toks(tk: Column) -> Column:
        n = F.size(tk)
        return F.when(n >= k, F.array_distinct(F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(tk, i + 1, k), " "),
        ))).otherwise(F.array(F.array_join(tk, " ")))

    return F.transform(F.array(F.split(_norm(text_col), " ")), from_toks)[0]


# --- exact deduplication --------------------------------------------------------
def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical (after whitespace/case normalization) docs.

    Returns (content_hash, dup_count, min_<id>, max_<id>) for groups with >1
    doc. sha2-256 collision-safe at any corpus size; one shuffle on the digest
    with map-side partials, and every aggregation buffer is CONSTANT-size — no
    collect_list: a boilerplate string duplicated 10⁸ times at 100 TB would
    otherwise put 10⁸ ids in ONE buffer and OOM the executor. For bounded id
    samples per group use duplicate_id_samples; to keep one representative row
    per group use distinct_by_content.
    """
    hashed = df.select(F.col(id_col), F.sha2(_norm(text_col), 256).alias("content_hash"))
    return (
        hashed.groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.min(id_col).alias(f"min_{id_col}"),
            F.max(id_col).alias(f"max_{id_col}"),
        )
        .filter(F.col("dup_count") > 1)
    )


def duplicate_id_samples(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Up to ``k`` smallest ids per duplicate group: (content_hash, dup_count,
    sample_ids). Memory stays bounded at any group size — the cap happens via
    a window row_number BEFORE any list aggregation (the window sort spills to
    disk; the collect_list sees ≤ k rows per group), and the groupBy reuses
    the window's hash partitioning so the whole thing is one exchange."""
    from pyspark.sql import Window

    hashed = df.select(F.col(id_col), F.sha2(_norm(text_col), 256).alias("content_hash"))
    w = Window.partitionBy("content_hash").orderBy(F.col(id_col))
    wc = Window.partitionBy("content_hash")
    capped = hashed.select(
        "content_hash",
        id_col,
        F.row_number().over(w).alias("__rn__"),
        F.count(F.lit(1)).over(wc).alias("__n__"),
    )
    return (
        capped.filter((F.col("__n__") > 1) & (F.col("__rn__") <= k))
        .groupBy("content_hash")
        .agg(F.max("__n__").alias("dup_count"), F.sort_array(F.collect_list(id_col)).alias("sample_ids"))
    )


def distinct_by_content(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-content group."""
    from pyspark.sql import Window

    w = Window.partitionBy(F.sha2(_norm(text_col), 256)).orderBy(F.col(id_col))
    return df.withColumn("__rn__", F.row_number().over(w)).filter(F.col("__rn__") == 1).drop("__rn__")


# --- line-level exact dedup (C4-style) ---------------------------------------------
def duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide frequency of repeated non-empty lines: (line_hash, n_docs,
    n_occurrences) for lines appearing in ≥ min_docs DISTINCT documents —
    the detection half of the C4-style line-dedup pass (boilerplate lines,
    navigation chrome, license banners repeat across pages verbatim).

    Only (id, xxhash64(line)) pairs cross the exchange — never line text —
    so the shuffle is ~16 bytes per line at any corpus size. countDistinct
    doc ids is exact; a doc repeating its own line counts once."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.coalesce(F.col(text_col), F.lit("")), re.escape(line_sep))).alias("__line"),
    ).select(
        F.col(id_col),
        F.xxhash64(F.trim(F.col("__line"))).alias("line_hash"),
        F.length(F.trim(F.col("__line"))).alias("__len"),
    ).filter(F.col("__len") > 0)
    return (
        lines.groupBy("line_hash")
        .agg(
            F.countDistinct(id_col).alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def scrub_duplicate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    line_sep: str = "\n",
    min_docs: int = 2,
) -> DataFrame:
    """C4-style line dedup: remove every non-empty line that appears in
    ≥ min_docs distinct documents; empty lines and unique lines survive.
    Returns the input plus (text_scrubbed, n_lines_removed).

    Scale shape: duplicate_lines() gives the offending hash set; a left-semi
    join + per-doc collect_set turns it into ONE small array column per
    AFFECTED doc (bounded by that doc's own line count), and the rewrite is
    then a map-only Catalyst array filter — clean docs join to NULL and pass
    through untouched. Text never shuffles; only (id, hash) pairs and the
    per-doc bad-hash arrays do."""
    c = F.coalesce(F.col(text_col), F.lit(""))
    per_line = (
        df.select(F.col(id_col), F.explode(F.split(c, re.escape(line_sep))).alias("__l"))
        .select(F.col(id_col), F.trim(F.col("__l")).alias("__t"))
        .filter(F.length("__t") > 0)
        .select(F.col(id_col), F.xxhash64("__t").alias("line_hash"))
        # (id, hash) is ~16 bytes/line — lazily materialize it once so the
        # dup aggregation and the semi-join below both read cached blocks
        # instead of each re-scanning and re-exploding the text
        .localCheckpoint(eager=False)
    )
    # derive the dup set from THIS per_line frame (not duplicate_lines(df),
    # which would scan + explode the text a second time)
    dup = (
        per_line.groupBy("line_hash")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("line_hash")
    )
    bad_per_doc = (
        per_line.join(dup, "line_hash", "left_semi")
        .groupBy(id_col)
        .agg(F.collect_set("line_hash").alias("__bad"))
    )
    out = df.join(bad_per_doc, id_col, "left")
    # split treats its pattern as a Java regex while array_join below is
    # literal — escape so the two agree for any separator
    all_lines = F.split(c, re.escape(line_sep))
    kept = F.filter(
        all_lines,
        lambda l: (F.length(F.trim(l)) == 0)
        | ~F.array_contains(F.col("__bad"), F.xxhash64(F.trim(l))),
    )
    return (
        out.withColumn(
            "text_scrubbed",
            F.when(F.col("__bad").isNull(), F.col(text_col)).otherwise(
                F.array_join(kept, line_sep)
            ),
        )
        .withColumn(
            "n_lines_removed",
            F.when(F.col("__bad").isNull(), F.lit(0)).otherwise(
                F.size(all_lines) - F.size(kept)
            ),
        )
        .drop("__bad")
    )


# --- MinHash + LSH ---------------------------------------------------------------
def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_k: int = 3,
    spread: bool | None = None,
) -> DataFrame:
    """64-permutation MinHash signature as array<bigint> — pure expressions.

    Permutation i is xxhash64(seed=i, shingle); min over the shingle set is
    the classic one-permutation-per-seed MinHash. Zero Python; zero shuffles
    on a well-split input (the signature map runs wherever the scan runs).

    Parallelism guard: this is the CPU-heaviest map in the dedup family
    (64 re-mixes per shingle), and an explode-free map inherits the INPUT's
    partitioning — a single-file corpus would compute every signature in one
    task. ``spread`` (default auto) repartitions first when the PLANNED scan
    is narrower than the cluster — decided from file metadata only
    (io.spread_if_narrow), never an eager ``.rdd`` probe that would force
    AQE stages to finalize. Well-split inputs (any real table) skip it.
    """
    df = spread_if_narrow(df, spread)
    # Materialize the shingle array's base hashes ONCE per row in their own
    # projection. Referencing the raw word_shingles expression from all 64
    # permutation arms re-evaluates the regexp/split/slice/array_distinct
    # pipeline 64x per row (higher-order lambdas run interpreted, outside
    # codegen CSE) — measured ~100x slower than this two-step form.
    # CollapseProject will NOT inline `_mh_hs` back into the arms: the
    # producing expression is non-cheap and referenced 64 times.
    base = df.withColumn(
        "_mh_hs", F.transform(word_shingles(text_col, shingle_k), lambda s: F.xxhash64(s))
    )

    # Closure factory, NOT `lambda s, i=i`: pyspark's transform() treats a
    # two-parameter lambda as (element, array_index) and binds the INDEX to
    # the second parameter — which silently collapsed all 64 permutations
    # into one position-seeded hash function. Permutation i re-mixes the
    # per-shingle base hash with seed i (a hash of a hash is still a uniform
    # MinHash family; the string is hashed once instead of 64 times).
    def perm(i: int):
        return F.array_min(F.transform(F.col("_mh_hs"), lambda h: F.xxhash64(F.lit(i), h)))

    sig = F.array(*[perm(i) for i in range(num_hashes)])
    return base.withColumn("minhash", sig).drop("_mh_hs")


def _band_rows(with_sig: DataFrame, id_col: str, num_hashes: int, bands: int) -> DataFrame:
    """(id, band_idx, band_hash) rows — the only thing LSH ever shuffles."""
    r = num_hashes // bands
    band_arr = F.array(
        *[F.xxhash64(F.lit(b), *[F.col("minhash")[b * r + j] for j in range(r)]) for b in range(bands)]
    )
    return with_sig.select(F.col(id_col), F.posexplode(band_arr).alias("band_idx", "band_hash"))


def lsh_candidate_pairs(
    with_sig: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Banded LSH: docs sharing any band bucket become candidate pairs.

    Emits (id_a, id_b) with id_a < id_b, deduplicated across bands. Shuffle
    carries only (band_idx, band_hash, doc_id). Within-bucket pairing is
    quadratic per bucket by construction — bucket sizes are bounded because a
    full-band match at r = num_hashes/bands rows implies near-identical docs.
    """
    exploded = _band_rows(with_sig, id_col, num_hashes, bands)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH pipeline: signature → banded candidates → exact
    shingle-Jaccard verification ≥ threshold. Returns (id_a, id_b, jaccard).

    NULL/empty-text docs are excluded from pairing: xxhash64 skips NULL args,
    so every NULL doc would get an identical signature and a [NULL] shingle
    array whose array_intersect treats NULLs as equal — emitting a pair set
    QUADRATIC in the NULL count, every pair at jaccard 1.0 between docs with
    no content at all.

    Traffic shape (the part that decides whether this scales): the signature
    frame is lazily localCheckpointed — (id, 64×int64) is ~0.5% of corpus
    bytes — so the candidate self-join's two sides read materialized blocks
    instead of each re-running the scan + shingle build + 64-permutation
    aggregate. Verification joins the candidate ids back to RAW TEXT and
    builds shingles POST-join, only for rows that are actually candidates:
    shipping ~1.5 KB shingle arrays for the whole corpus through two join
    exchanges (the previous shape) moved ~4× the bytes of the text columns
    and re-built shingles corpus-wide per side — measured 0.63 scaling
    efficiency 4→16 cores on this host's memory system, vs 0.8+ after.
    At web scale candidates ≪ corpus, so post-join shingling is also
    strictly less compute."""
    df = df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    with_sig = (
        minhash_signature(df, text_col, num_hashes, shingle_k)
        .select(F.col(id_col), "minhash")
        .localCheckpoint(eager=False)
    )
    cands = lsh_candidate_pairs(with_sig, id_col, num_hashes, bands)
    texts = df.select(F.col(id_col), F.col(text_col).alias("__text__"))
    paired = (
        cands.join(texts.withColumnRenamed(id_col, "id_a"), "id_a")
        .withColumnRenamed("__text__", "__text_a")
        .join(texts.withColumnRenamed(id_col, "id_b"), "id_b")
        .withColumnRenamed("__text__", "__text_b")
        # materialized as columns so intersect+size reference BOUND arrays;
        # CollapseProject keeps non-cheap exprs referenced >1x un-inlined
        .withColumn("sh_a", word_shingles("__text_a", shingle_k))
        .withColumn("sh_b", word_shingles("__text_b", shingle_k))
    )
    # |A ∪ B| = |A| + |B| − |A ∩ B| exactly (shingle arrays are distinct) —
    # skips a second O(|A|+|B|) array_union hash build per pair; the
    # intersection size is bound as its own column so its two uses below
    # share one evaluation
    paired = paired.withColumn("__i", F.size(F.array_intersect("sh_a", "sh_b")))
    return (
        paired.withColumn(
            "jaccard",
            F.round(
                F.col("__i")
                / F.greatest(F.size("sh_a") + F.size("sh_b") - F.col("__i"), F.lit(1)),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- incremental dedup (new snapshot vs persisted corpus store) -----------------
def signature_store(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_k: int = 3,
) -> DataFrame:
    """(id, content_sha, minhash) — the persistable dedup state of a corpus.

    At web scale you never re-dedup the whole corpus when a new crawl snapshot
    lands: you persist THIS frame (~0.5% of corpus bytes — a 64-char digest +
    64 int64s per doc) once, and each snapshot dedups against it via
    incremental_exact_duplicates / incremental_near_duplicates below. Write it
    partitioned however the corpus is partitioned; appending the new
    snapshot's own store rows after each ingest keeps it current. NULL/empty
    docs are excluded — they have no dedup-relevant content and would
    otherwise all share one signature (see minhash_near_duplicates).
    """
    df = df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    return minhash_signature(df, text_col, num_hashes, shingle_k).select(
        F.col(id_col),
        F.sha2(_norm(text_col), 256).alias("content_sha"),
        "minhash",
    )


def incremental_exact_duplicates(
    new_df: DataFrame,
    base_store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """New-snapshot docs whose normalized content already exists in the base
    corpus: (new_id, content_sha, n_base_matches, first_base_id).

    base_store is a signature_store frame (only id + content_sha are read —
    column pruning drops the minhash array at the scan). Shuffle carries
    digests + ids only; neither side's text moves. The base aggregation is
    constant-buffer (count + min), so a boilerplate digest with 10⁸ base
    copies costs one row, not one list.
    """
    new_hashed = new_df.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col).alias("new_id"), F.sha2(_norm(text_col), 256).alias("content_sha"))
    base_groups = base_store.groupBy("content_sha").agg(
        F.count(F.lit(1)).alias("n_base_matches"),
        F.min(id_col).alias("first_base_id"),
    )
    return new_hashed.join(base_groups, "content_sha").select(
        "new_id", "content_sha", "n_base_matches", "first_base_id"
    )


def incremental_near_duplicates(
    new_df: DataFrame,
    base_store: DataFrame,
    base_texts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """Near-dups of new-snapshot docs against the persisted base corpus:
    (new_id, base_id, jaccard ≥ threshold).

    The base corpus is touched twice, both times cheaply: its STORE (id +
    minhash, ~0.5% of corpus bytes) feeds the band join, and its TEXT is read
    only to verify actual candidates — an id-selective join, candidates ≪
    corpus. The new snapshot (typically ≪ base) computes signatures map-only
    and joins base bands on (band_idx, band_hash); AQE handles hot buckets the
    same way the self-join path does. Per-pair verification is the exact
    shingle-Jaccard of minhash_near_duplicates, so at high thresholds the
    result equals the exhaustive new×base pair set (16-band miss rate
    (1-j^4)^16 ≈ 4e-8 at j = 0.9)."""
    new_df = new_df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    new_sig = (
        minhash_signature(new_df, text_col, num_hashes, shingle_k)
        .select(F.col(id_col), "minhash")
        .localCheckpoint(eager=False)
    )
    new_bands = _band_rows(new_sig, id_col, num_hashes, bands).withColumnRenamed(id_col, "new_id")
    base_bands = _band_rows(
        base_store.select(id_col, "minhash"), id_col, num_hashes, bands
    ).withColumnRenamed(id_col, "base_id")
    cands = (
        new_bands.join(base_bands, ["band_idx", "band_hash"])
        .select("new_id", "base_id")
        .distinct()
    )
    new_texts = new_df.select(F.col(id_col).alias("new_id"), F.col(text_col).alias("__text_n"))
    base_texts = base_texts.filter(
        F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
    ).select(F.col(id_col).alias("base_id"), F.col(text_col).alias("__text_b"))
    paired = (
        cands.join(new_texts, "new_id")
        .join(base_texts, "base_id")
        .withColumn("sh_n", word_shingles("__text_n", shingle_k))
        .withColumn("sh_b", word_shingles("__text_b", shingle_k))
        .withColumn("__i", F.size(F.array_intersect("sh_n", "sh_b")))
    )
    return (
        paired.withColumn(
            "jaccard",
            F.round(
                F.col("__i")
                / F.greatest(F.size("sh_n") + F.size("sh_b") - F.col("__i"), F.lit(1)),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "base_id", "jaccard")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_col: str | None = None,
    threshold: float = 0.5,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard over (optionally blocked) pairs — the oracle-able
    exhaustive variant. At scale ALWAYS pass block_col (all-pairs is O(n²));
    LSH (minhash_near_duplicates) is the scale path, this is its ground truth.
    """
    sh = df.select(F.col(id_col), *( [block_col] if block_col else [] ), word_shingles(text_col, shingle_k).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    return (
        a.join(b, cond)
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.greatest(F.size(F.array_union("a.sh", "b.sh")), F.lit(1)),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"), "jaccard"
        )
    )


# --- duplicate clusters (connected components) -----------------------------------
def _driver_components(edges: DataFrame) -> DataFrame:
    """Driver-side connected components for a BOUNDED edge set (callers gate
    on edge count first — the same scale-adaptive trick as a broadcast-join
    threshold). Vectorized numpy label propagation with pointer halving:
    each pass pulls the min label across every edge at once and then jumps
    labels one hop (lab = lab[lab]); O(E) work per pass, O(log n) passes, no
    per-edge Python loop. Returns the same (node, component) contract as the
    distributed rounds: component = smallest reachable node id."""
    import numpy as np
    import pandas as pd

    spark = edges.sparkSession
    # bounded by driver_max_edges at the call site: two int64 columns,
    # ~16 MB per million edges over Arrow
    pdf = edges.toPandas()
    if len(pdf) == 0:
        return spark.createDataFrame(
            pd.DataFrame({"node": pd.Series(dtype="int64"),
                          "component": pd.Series(dtype="int64")}),
            schema="node long, component long",
        )
    u = pdf["u"].to_numpy(dtype="int64")
    v = pdf["v"].to_numpy(dtype="int64")
    nodes, inv = np.unique(np.concatenate([u, v]), return_inverse=True)
    ui, vi = inv[: len(u)], inv[len(u):]
    lab = np.arange(len(nodes), dtype="int64")
    while True:
        prev = lab.copy()
        # pull the smaller label across each edge, both directions
        np.minimum.at(lab, ui, lab[vi])
        np.minimum.at(lab, vi, lab[ui])
        lab = lab[lab]  # pointer halving: hop every label one step down
        if np.array_equal(lab, prev):
            break
    out = pd.DataFrame({"node": nodes, "component": nodes[lab]})
    return spark.createDataFrame(out, schema="node long, component long")


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    driver_max_edges: int | None = 1_000_000,
) -> DataFrame:
    """(node, component) for every node in the pair graph; component = the
    smallest node id reachable. This turns near-dup PAIRS into dup GROUPS —
    the step a real dedup pipeline needs before keeping one representative.

    Scale-adaptive: after LSH + exact-Jaccard verification the edge set is
    ≪ the corpus (near-dup pairs, not documents), so when it fits the
    `driver_max_edges` bound (default 10⁶ edges ≈ 16 MB) the components are
    solved on the driver in vectorized numpy — the iterative rounds below
    cost ~0.3-0.5 s of job-scheduling latency EACH regardless of cluster
    size, a serial tail that dominates exactly when the graph is small.
    Pass driver_max_edges=None (or 0) to force the distributed path.

    The distributed path is alternating large-star / small-star (the public
    Kiveris et al. "Connected Components in MapReduce and Beyond", SoCC'14
    construction): converges in O(log² n) rounds, and each round is a
    min-aggregate plus an equi-join — NO collect_set, so a 10⁸-node
    boilerplate hub never materializes a neighbor list in one buffer. Each
    round localCheckpoints to truncate lineage (an iterative plan would
    otherwise grow exponentially), and convergence is detected by a
    (count, hash-sum) signature of the oriented edge set — two tiny
    aggregates per round.
    """

    def min_nbr(sym: DataFrame) -> DataFrame:
        # m(u) = min(Γ(u) ∪ {u})
        return sym.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least(F.col("u"), F.col("mv")).alias("m")
        )

    def large_star(edges: DataFrame) -> DataFrame:
        sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        m = min_nbr(sym)
        return (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def small_star(edges: DataFrame) -> DataFrame:
        oriented = edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v")).distinct()
        m = min_nbr(oriented)
        return (
            oriented.join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .union(m.select(F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )

    def signature(edges: DataFrame) -> tuple:
        # bit_xor: order-insensitive and overflow-free under ANSI (the edge
        # set is distinct, so xor-of-hashes is a sound set signature)
        row = edges.select(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).collect()[0]
        return (row["n"], row["h"])

    # ids must already be integral: a silent cast("long") would turn every
    # string/UUID id into NULL, drop every edge at u != v, and report a
    # clean corpus with zero clusters — dedup as a silent no-op. String-id
    # corpora should join a dense numeric id first (or hash with an
    # explicit, collision-audited scheme) and map components back.
    types = dict(pairs.dtypes)
    for c in (id_a, id_b):
        if types.get(c) not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"connected_components needs integral ids; {c!r} is {types.get(c)}"
            )
    edges = pairs.select(
        F.col(id_a).cast("long").alias("u"), F.col(id_b).cast("long").alias("v")
    ).filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    if driver_max_edges:
        # the count also materializes the checkpoint, so the driver path's
        # toPandas reads cached blocks, not the upstream pair pipeline
        if edges.count() <= driver_max_edges:
            return _driver_components(edges)
    # Node set from the CHECKPOINTED edges, not from `pairs` — reading pairs
    # twice would re-run the entire upstream pair pipeline (the candidate
    # join + verification stage) a second time. Self-loops (u == v) carry no
    # node not already present via a real edge because both pair generators
    # emit id_a < id_b strictly.
    nodes = edges.select(F.col("u").alias("node")).union(
        edges.select(F.col("v").alias("node"))
    ).distinct()
    prev = None
    for _ in range(max_iter):
        edges = small_star(large_star(edges)).localCheckpoint()
        sig = signature(edges)
        if sig == prev:
            break
        prev = sig
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")
    # converged: edges are star edges child(greater) → component-min parent
    comp = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        nodes.join(comp, "node", "left")
        .select("node", F.coalesce("component", "node").alias("component"))
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    driver_max_edges: int | None = 1_000_000,
) -> DataFrame:
    """Near-duplicate CLUSTERS via MinHash-LSH pairs → connected components:
    (doc_id, cluster_id) for every doc in some near-dup group, cluster_id =
    the smallest doc id in the group. Keep `min(id) per cluster` (or join
    back and filter doc_id == cluster_id) to dedup the corpus."""
    pairs = minhash_near_duplicates(df, text_col, id_col, threshold, num_hashes, bands, shingle_k)
    return connected_components(pairs, driver_max_edges=driver_max_edges).withColumnsRenamed(
        {"node": id_col, "component": "cluster_id"}
    )


# --- SimHash --------------------------------------------------------------------
def simhash(
    df: DataFrame, text_col: str = "text", out_col: str = "simhash", spread: bool | None = None
) -> DataFrame:
    """64-bit SimHash per doc — pure Catalyst expressions, zero Python.

    Each token's xxhash64 votes ±1 per bit position (occurrence-weighted);
    the sign of each bit's vote total becomes that bit, so near-duplicates
    land at small Hamming distance. Computed entirely with higher-order array
    functions (transform/aggregate/zip_with) JVM-side: tokens are hashed ONCE
    (lambda-variable reuse), the 64 bit extractions are unrolled literal
    shifts, and bit-packing folds a literal powers-of-two array — no explode,
    no shuffle, no Python crossing (the round-1 pandas-UDF body was a per-row
    token loop, exactly the anti-pattern BASELINE.json:15 bans).
    """
    # parallelism guard (same as minhash_signature): the 64-bit vote fold is
    # a heavy map that inherits the input's partitioning — a single-file
    # corpus would compute every signature in one task; plan-metadata probe,
    # no eager job
    df = spread_if_narrow(df, spread)
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[(F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)).cast("int") * 2 - 1) for i in range(64)]),
            lambda a, v: a + v,
        ),
    )
    # bit 63 packs as long MIN_VALUE — two's-complement sign bit
    powers = F.array(*[F.lit((1 << i) if i < 63 else -(1 << 63)).cast("long") for i in range(64)])
    packed = F.aggregate(
        F.zip_with(votes, powers, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    sim = F.when(
        F.coalesce(F.length(F.trim(F.col(text_col))), F.lit(0)) == 0, F.lit(0).cast("long")
    ).otherwise(packed)
    return df.withColumn(out_col, sim)


def _probe_masks(width: int, radius: int) -> list[int]:
    """All XOR masks over ``width`` bits with popcount ≤ radius (incl. 0)."""
    from itertools import combinations

    masks = [0]
    for r in range(1, radius + 1):
        for bits in combinations(range(width), r):
            m = 0
            for b in bits:
                m |= 1 << b
            masks.append(m)
    return masks


def simhash_candidate_pairs(
    with_hash: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "simhash",
    max_hamming: int = 3,
    chunks: int | None = None,
    filter_within: int | None = None,
) -> DataFrame:
    """Blocked candidate pairs (id_a, id_b, hamming) — UNfiltered by hamming
    by default, so callers (and the candidate-bound test) see exactly what
    the blocking emits. Guaranteed to contain every pair within
    ``max_hamming`` bits. ``filter_within`` applies the hamming cutoff
    map-side before the dedup exchange (the near-duplicates fast path).

    Blocking, following the public Manku–Jain–Das Sarma construction
    ("Detecting Near-Duplicates for Web Crawling", WWW'07) adapted to a
    shuffle-join engine: split the 64-bit hash into ``chunks`` blocks and
    equi-join per block position. Pigeonhole: h differing bits spread over B
    blocks leave some block with ≤ floor(h/B) differences, so

      * ``max_hamming < chunks`` → some block matches EXACTLY: plain
        per-position equi-join (radius 0);
      * ``max_hamming ≥ chunks`` → some block differs in ≤ floor(h/B) bits:
        the probe side additionally emits every value within that radius of
        its block (multi-probe — C(width, ≤r) XOR-mask variants), keeping the
        recall guarantee WITHOUT shrinking the key.

    ``chunks=None`` (default) picks 4 blocks = **16-bit join keys** (65,536
    values per position). The former default of 8 blocks made 8-bit keys —
    256 values per position ≈ n²/512 candidate pairs per position at corpus
    size n: an all-pairs join in blocking costume at web scale. 16-bit keys
    cut expected candidates ~256×; a hamming-7 budget costs 17 probe variants
    per block (radius 1) instead of 8-bit keys, and candidates stay
    ~17·4·n²/2¹⁷ ≈ n²/2000 · (n/2¹⁶ per bucket) — linear in n for bounded
    bucket sizes. (Joining on block COMBINATIONS instead would widen keys to
    36+ bits but needs C(16,9)=11,440 tables at h=7 — multi-probe is the
    cheaper guarantee.) Bucket sizes are bounded for real corpora because a
    full 16-bit block match at random is 2⁻¹⁶; pathological boilerplate that
    collapses a block is exactly a near-dup cluster the downstream filter
    keeps anyway."""
    if chunks is None:
        chunks = 4
    if 64 % chunks:
        raise ValueError("chunks must divide 64")
    if not (0 <= max_hamming < 64):
        raise ValueError("max_hamming must be in [0, 64)")
    width = 64 // chunks
    mask = (1 << width) - 1
    radius = 0 if max_hamming < chunks else max_hamming // chunks
    chunk_arr = F.array(
        *[
            F.shiftrightunsigned(F.col(hash_col), width * i).bitwiseAND(F.lit(mask))
            for i in range(chunks)
        ]
    )
    exact = with_hash.select(id_col, hash_col, F.posexplode(chunk_arr).alias("ci", "cv"))
    if radius == 0:
        probes = exact
    else:
        masks = _probe_masks(width, radius)
        probes = exact.select(
            id_col,
            hash_col,
            "ci",
            F.explode(F.array(*[F.col("cv").bitwiseXOR(F.lit(m)) for m in masks])).alias("cv"),
        )
    a, b = probes.alias("a"), exact.alias("b")
    xor = F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
    joined = a.join(
        b,
        (F.col("a.ci") == F.col("b.ci"))
        & (F.col("a.cv") == F.col("b.cv"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.bit_count(xor).alias("hamming"),
    )
    if filter_within is not None:
        # Map-side, BEFORE the distinct exchange: on dup-heavy corpora the
        # blocking can emit tens of duplicate candidates per true pair
        # (chunks x probe variants), and shuffling them all just to dedup
        # rows the hamming filter discards anyway dominates the stage.
        joined = joined.filter(F.col("hamming") <= filter_within)
    # hamming is a function of the pair, so distinct on all three columns
    # deduplicates exactly by (id_a, id_b)
    return joined.distinct()


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    chunks: int | None = None,
) -> DataFrame:
    """SimHash near-dup pairs within ``max_hamming`` bits: hash (pure
    Catalyst) → blocked candidates (see simhash_candidate_pairs for the
    scale analysis and recall guarantee) → exact hamming filter."""
    # Lazy localCheckpoint: the probe and exact sides of the candidate join
    # are DIFFERENT subtrees over the signatures (multi-probe adds an
    # explode), so without materialization each side re-runs the text scan
    # and the 64-wide vote aggregate — measured 4x slower. Signatures are
    # (id, int64): tiny to pin in the block manager even at corpus scale.
    # NULL/empty docs all hash to 0 and would pair quadratically at
    # hamming 0 — excluded exactly as in minhash_near_duplicates (contentless
    # docs are the exact-dedup/required-rule stages' finding, not near-dup's)
    df = df.filter(F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != ""))
    with_h = simhash(df, text_col).select(id_col, "simhash").localCheckpoint(eager=False)
    return simhash_candidate_pairs(
        with_h, id_col, "simhash", max_hamming, chunks, filter_within=max_hamming
    )


# --- containment (asymmetric near-dup) -------------------------------------------
def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    spread: bool | None = None,
) -> DataFrame:
    """Ordered pairs (a, b) with shingle CONTAINMENT |A ∩ B| / |A| ≥
    ``threshold`` — the ASYMMETRIC near-dup relation Jaccard misses: a tweet
    quoted inside an article, a doc re-wrapped in boilerplate, a chapter
    inside the full book have tiny Jaccard (the union is dominated by the
    bigger side) but containment ≈ 1 of the smaller side. MinHash-LSH is
    calibrated to Jaccard, so these pairs never band-collide; this operator
    finds them exactly.

    Blocking is PREFIX FILTERING (the public SSJoin/PPJoin construction —
    Chaudhuri et al. ICDE 2006, Xiao et al. WWW 2008), containment form: if
    ≥ t·|A| of A's shingles are in B, then at most ⌊(1−t)·|A|⌋ are missing —
    so among A's ⌊(1−t)·|A|⌋+1 globally-RAREST shingles, at least one is in
    B. Candidates = equi-join of each doc's rare-shingle prefix against the
    full postings list; an exact set intersection verifies. LOSSLESS by the
    pigeonhole above — blocking only prunes.

    Scale: the shingle grid shuffles ONCE into doc-frequency counts
    (map-side partials, constant buffers); the prefix rank is a window over
    each doc's OWN shingles (well-spread key); the candidate join keys on
    globally-rare shingles — bounded postings by construction, AQE-splits
    the residue. The verify joins shingle arrays back by id for candidates
    only. The degenerate corpus (everyone contains everyone) has quadratic
    OUTPUT — no blocking can beat its own answer.
    """
    from pyspark.sql import Window

    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    base = df.filter(F.col(text_col).isNotNull())
    # parallelism guard (same as minhash_signature): the shingle build is a
    # heavy map inheriting the input's partitioning; plan-metadata probe,
    # no eager job
    base = spread_if_narrow(base, spread)
    sh = (
        base.select(F.col(id_col).alias("__cid"), word_shingles(text_col, shingle_k).alias("sh"))
        .filter(F.size("sh") > 0)
    )
    # the candidate machinery only ever needs ~16-byte (id, n, hash) rows:
    # hash the shingles out of the grid (collision candidates are discarded
    # by the exact verify — still lossless) and checkpoint it once so the
    # frequency agg, the prefix build, and the postings side of the join all
    # read cached blocks instead of each re-scanning + re-shingling the text
    posts = (
        sh.select("__cid", F.size("sh").alias("n"), F.explode("sh").alias("g"))
        .select("__cid", "n", F.xxhash64("g").alias("h"))
        .localCheckpoint(eager=False)
    )
    # word_shingles is per-doc distinct, so count(*) per shingle IS document
    # frequency
    freq = posts.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("__cid").orderBy(F.col("df").asc(), F.col("h").asc())
    # prefix length = (max missing shingles) + 1 = ⌊(1−t)·n⌋ + 1. The 1e-9
    # slack guards binary-float drop-off at exact-rational thresholds
    # ((1−0.8)·5 computes as 0.9999…9 → floor 0, losing a legal pair whose
    # single missing shingle is the rarest); a slightly LONGER prefix is
    # always safe — it only adds candidates the verify discards.
    pref = (
        posts.join(freq, "h")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.floor((1.0 - threshold) * F.col("n") + 1e-9) + 1)
        .select(F.col("__cid").alias("id_a"), F.col("n").alias("n_a"), "h")
    )
    # size filter rides the candidate join: |A∩B| ≤ |B|, so containment ≥ t
    # needs |B| ≥ t·|A| — prunes small-container candidates before they cost
    # an array intersection (same epsilon rationale as the prefix length).
    # The pair dedup repartitions EXPLICITLY (fixed width, immune to AQE
    # coalescing): candidate id pairs compress to almost nothing, so
    # byte-sized coalescing would funnel a dense corpus's multi-million-pair
    # dedup + verify into 2 tasks; dropDuplicates then reuses this exchange's
    # (id_a, id_b) clustering — no second shuffle.
    n_shuf = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    cand = (
        pref.join(posts.select(F.col("__cid").alias("id_b"), F.col("n").alias("n_b"), "h"), "h")
        .filter((F.col("id_a") != F.col("id_b")) & (F.col("n_b") >= threshold * F.col("n_a") - 1e-9))
        .select("id_a", "id_b")
        .repartition(n_shuf, "id_a", "id_b")
        .dropDuplicates()
    )
    # Verify on HASHED shingle arrays: the intersection only compares 8-byte
    # longs (a ~5x cheaper inner loop than string sets, and the per-doc side
    # tables shrink enough to broadcast), with the same xxhash64-equality-
    # as-identity convention line_dedup and the LSH bands already use. AQE
    # sizes the candidate partitions by their ~16-byte shuffle rows, which
    # under-parallelizes the compute-heavy verify ~16x on a dense corpus —
    # the verify inherits the pinned-width candidate partitioning above.
    hashed = sh.select(
        "__cid", F.size("sh").alias("n"), F.transform("sh", lambda s: F.xxhash64(s)).alias("hs")
    )
    a = hashed.select(F.col("__cid").alias("id_a"), F.col("n").alias("na"), F.col("hs").alias("hs_a"))
    b = hashed.select(F.col("__cid").alias("id_b"), F.col("hs").alias("hs_b"))
    raw = F.size(F.array_intersect("hs_a", "hs_b")) / F.col("na")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("__c", raw)
        .filter(F.col("__c") >= threshold)
        .select("id_a", "id_b", F.round("__c", 6).alias("containment"))
    )
