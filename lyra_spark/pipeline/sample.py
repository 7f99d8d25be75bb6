"""Deterministic hash-based splits and samples (train/val/test assignment,
corpus down-sampling, per-stratum rates).

Why hash, not rand(): a training-data split must be (a) reproducible across
reruns and engines, (b) stable under repartitioning and row order, and (c)
consistent for the same id across incremental ingests — `rand(seed)` gives
none of those (it is seeded PER PARTITION, so adding one input file reshuffles
every assignment). Keying the split on a cryptographic hash of the id is the
standard construction (e.g. TensorFlow Extended's `hash_buckets` ExampleGen
splits); md5 is used here NOT for security but because every engine renders it
identically, so the DuckDB oracle can reproduce the assignment bit-for-bit.

Scale shape: every operator below is a map-only Catalyst projection/filter —
zero shuffles, zero Python, whole-stage codegen; filters sit directly on the
scan so Parquet row groups still prune on other predicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 8 hex chars of md5 → uniform 32-bit uint → [0, 1)
_DENOM = float(1 << 32)


def hash_uint32(id_col: str, salt: str = "") -> Column:
    """Deterministic uniform 32-bit uint keyed on (id, salt) — the single
    source of the md5 construction every sampler and the shuffle-export
    build on. DuckDB renders the identical value as
    ``('0x' || substring(md5(CAST(id AS VARCHAR) || salt), 1, 8))::BIGINT``,
    so oracles reproduce draws, shards, and orderings bit-for-bit."""
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")


def hash_fraction(id_col: str, salt: str = "") -> Column:
    """Deterministic uniform draw in [0, 1) keyed on (id, salt):
    ``hash_uint32 / 2^32`` (exact division of an integer-valued double).

    Changing ``salt`` re-draws every id independently — use one salt per
    decision (split vs sample vs shard) so the same doc is not systematically
    co-selected by unrelated passes.
    """
    return hash_uint32(id_col, salt) / F.lit(_DENOM)


def split_by_hash(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split with the given weights (normalized),
    deterministically by id. The LAST split absorbs the floating-point
    remainder, so every non-NULL id gets exactly one split. NULL ids get a
    NULL split — a NULL hash would otherwise silently fall through every
    WHEN into the last-named split (polluting a test/eval split with exactly
    the rows whose identity is broken), and the sibling samplers already
    exclude NULL ids (NULL < rate is never true); surfacing NULL lets the
    caller quarantine instead of hiding the problem in one bucket.
    """
    if not weights:
        raise ValueError("weights must name at least one split")
    import math

    for name, wgt in weights.items():
        # per-weight validation, not just the total: a negative weight builds
        # NON-MONOTONIC cumulative boundaries (the reversed CASE then routes
        # 100% of rows into the first split) and a NaN falls through every
        # WHEN into the last split — both silently
        if not math.isfinite(wgt) or wgt <= 0:
            raise ValueError(f"weight for split {name!r} must be finite and > 0, got {wgt!r}")
    total = float(sum(weights.values()))
    frac = hash_fraction(id_col, salt)
    names = list(weights)
    expr = F.lit(names[-1])
    cum = 0.0
    # build the CASE from the last-but-one boundary down so the first
    # matching WHEN wins, exactly like the cumulative-boundary walk
    arms = []
    for name in names[:-1]:
        cum += weights[name] / total
        arms.append((cum, name))
    for bound, name in reversed(arms):
        expr = F.when(frac < F.lit(bound), F.lit(name)).otherwise(expr)
    expr = F.when(F.col(id_col).isNull(), F.lit(None).cast("string")).otherwise(expr)
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by id (Bernoulli on the
    id hash — repartition-stable, rerun-stable, engine-reproducible)."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_fraction(id_col, salt) < F.lit(float(fraction)))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "",
    default: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the data-mixing primitive (e.g.
    'keep 100% of books, 8% of common-crawl'). Strata not listed keep
    ``default`` of their rows. NULL strata use ``default`` too."""
    rate = F.lit(float(default))
    for value, frac in fractions.items():
        if not (0.0 <= frac <= 1.0):
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        rate = F.when(F.col(strata_col) == F.lit(value), F.lit(float(frac))).otherwise(rate)
    return df.filter(hash_fraction(id_col, salt) < rate)


def weighted_sample_topk(
    df: DataFrame, k: int, weight_col: str, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Exactly-k weighted sampling WITHOUT replacement: the Efraimidis–
    Spirakis (2006) A-Res construction — per-row key u^(1/w) with u the
    deterministic id-hash uniform, keep the k largest keys. Inclusion
    probability is proportional-to-size without replacement, and the draw is
    repartition-/rerun-stable like every sampler here.

    Scale shape: the key is a map-only codegen projection; "k largest" is a
    global top-k, which Spark executes as per-partition TakeOrderedAndProject
    partials (each task ships only k rows) — no full sort, no full shuffle.
    Rows with NULL/non-positive weight or NULL id are excluded (they have no
    defined inclusion probability).

    Cross-engine caveat (why the driver oracle uses the Poisson variant
    below): pow() is a libm call correct to ~1 ulp, not bit-specified, so two
    engines could in principle disagree about a boundary row whose key ties
    the k-th key within rounding — the in-repo test pins this function
    against a numpy reference instead.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if "__wkey__" in df.columns:
        raise ValueError("input must not contain the reserved column '__wkey__'")
    w = F.col(weight_col).cast("double")
    key = F.pow(hash_fraction(id_col, salt), F.lit(1.0) / w)
    # NaN must be excluded EXPLICITLY: Spark orders NaN as the largest double
    # and NaN > 0 is TRUE, so without the isnan filter every NaN-weight row
    # would outrank all legitimate keys and capture the top-k outright.
    return (
        df.filter(F.col(id_col).isNotNull() & w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("__wkey__", key)
        .orderBy(F.col("__wkey__").desc(), F.col(id_col).asc())
        .limit(int(k))
        .drop("__wkey__")
    )


def weighted_sample_poisson(
    df: DataFrame,
    expected: int,
    weight_col: str,
    total_weight: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Probability-proportional-to-size Poisson sampling: include each row
    independently with probability min(1, expected * w / total_weight). The
    sample SIZE is random (mean ``expected``); inclusion is exactly
    proportional to weight, and — unlike the top-k variant — the decision is
    a pure per-row comparison of the md5 uniform against a product/quotient
    of doubles, all correctly-rounded IEEE ops, so any engine reproduces the
    row set bit-for-bit (the DuckDB driver oracle does).

    ``total_weight`` is passed in rather than computed so the operator stays
    map-only (zero shuffles, zero scans beyond the caller's); at scale it
    comes from table statistics or one cheap agg the caller already runs.
    """
    if expected <= 0:
        raise ValueError("expected must be positive")
    if total_weight <= 0:
        raise ValueError("total_weight must be positive")
    w = F.col(weight_col).cast("double")
    p = F.least(F.lit(1.0), F.lit(float(expected)) * w / F.lit(float(total_weight)))
    # explicit NaN exclusion: NaN > 0 is TRUE in Spark and least(1.0, NaN)
    # is 1.0 (NaN sorts largest), so a NaN weight would be included with
    # probability 1 instead of being rejected as undefined
    return df.filter(
        F.col(id_col).isNotNull()
        & w.isNotNull()
        & ~F.isnan(w)
        & (w > 0)
        & (hash_fraction(id_col, salt) < p)
    )


def mixture_rates(
    totals: dict[str, float], targets: dict[str, float], budget_tokens: float
) -> dict[str, float]:
    """Per-source keep-rates that hit a token-budget mixture: rate_s =
    min(1, target_share_s * budget / tokens_s). A source whose corpus is
    smaller than its target allocation saturates at 1.0 (you cannot sample
    more than exists — the shortfall is reported, not silently shifted onto
    other sources). Shares are normalized; arithmetic is the same
    left-associated (share * budget) / total in both engines, so the DuckDB
    oracle reproduces every rate — and therefore every kept row — exactly.
    """
    if budget_tokens <= 0:
        raise ValueError("budget_tokens must be positive")
    share_total = float(sum(targets.values()))
    if share_total <= 0:
        raise ValueError("targets must sum to a positive value")
    rates: dict[str, float] = {}
    for src, share in targets.items():
        tok = float(totals.get(src, 0.0))
        if tok <= 0:
            rates[src] = 0.0
        else:
            rates[src] = min(1.0, (share / share_total) * float(budget_tokens) / tok)
    return rates


def mixture_sample(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    token_col: str = "n_chars",
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Token-budget data mixing: down-sample each source so the corpus hits
    ``budget_tokens`` total with per-source token shares ≈ ``targets`` (the
    Pile/LLaMA-style mixture step, done by sampling whole documents — the
    achieved share is the Bernoulli expectation, exact only in mean).

    Two stages: (1) ONE tiny aggregate — per-source token totals, constant
    agg buffers with map-side partials, O(#sources) rows to the driver (at
    10¹² rows this is the same cheap pass any mixture design already needs);
    (2) a map-only deterministic Bernoulli filter (md5 draw vs the source's
    rate), repartition-/rerun-/engine-stable like every sampler here.

    Sources not named in ``targets`` (and NULL sources) are dropped — a
    mixture is a whitelist. NULL token counts count 0 toward totals but
    their rows still draw normally.
    """
    tok = F.coalesce(F.col(token_col).cast("double"), F.lit(0.0))
    totals = {
        r["s"]: r["t"]
        for r in df.filter(F.col(source_col).isin(*targets))
        .groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(tok).alias("t"))
        .collect()
    }
    rates = mixture_rates(totals, targets, float(budget_tokens))
    # the filter stage IS stratified sampling with computed rates: unlisted
    # and NULL sources keep default=0.0 (dropped), NULL ids never satisfy
    # NULL < rate — one Bernoulli-dispatch implementation, not two
    return stratified_sample(df, rates, source_col, id_col=id_col, salt=salt)


def deterministic_sample_exact_k(
    df: DataFrame, k: int, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """EXACTLY-k uniform sample, deterministic by id: order by the md5 draw,
    keep the k smallest. Complements the siblings — `deterministic_sample`
    is Bernoulli (size only ~n·fraction), `weighted_sample_topk` is
    proportional-to-size but rides on pow() (ulp caveat in its docstring);
    this one is uniform, exact-size, and bit-reproducible in any engine
    (hash + comparison only), so the driver oracle rebuilds the row set
    verbatim.

    Scale shape: map-only key projection + global top-k, which Spark plans
    as TakeOrderedAndProject (each task ships k rows, no full sort/shuffle).
    NULL ids are excluded (no defined draw). Ties are impossible for
    distinct ids (md5 collision on 8 hex chars would break them by id ASC,
    kept as an explicit tiebreak for determinism anyway).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if "__draw__" in df.columns:
        raise ValueError("input must not contain the reserved column '__draw__'")
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__draw__", hash_fraction(id_col, salt))
        .orderBy(F.col("__draw__").asc(), F.col(id_col).asc())
        .limit(int(k))
        .drop("__draw__")
    )


def stratified_sample_exact_k(
    df: DataFrame,
    k: int | dict,
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """EXACTLY-k-per-stratum uniform sample, deterministic by id — the
    evaluation-set primitive ('200 eval docs from EVERY language, however
    lopsided the corpus'). ``k`` is one size for all strata or a per-stratum
    dict (strata not listed are DROPPED in dict form — an eval manifest is a
    whitelist, mixture_sample semantics); a stratum with fewer than k rows
    yields all of them. NULL ids are excluded (no defined draw); NULL strata
    are excluded in both forms (no defined cohort).

    Determinism: the same md5 draw as every sampler here (hash_uint32
    docstring carries the DuckDB rendering), ranked per stratum with id ASC
    as the tiebreak, so any engine rebuilds the exact row set.

    Scale shape: ONE exchange on the stratum key + a per-stratum sort for
    the rank — Spark's window sorts each stratum within its task, spilling
    gracefully for hot strata (sort-based, never an in-memory list). The
    output is bounded at k·|strata| rows. For a hot-stratum corpus where
    even the sort is unwelcome, the rate-based `stratified_sample` (map-only)
    is the approximate alternative.
    """
    from pyspark.sql import Window

    if "__draw__" in df.columns:
        raise ValueError("input must not contain the reserved column '__draw__'")
    if isinstance(k, dict):
        if not k:
            raise ValueError("per-stratum k dict must not be empty")
        for v, kk in k.items():
            if int(kk) <= 0:
                raise ValueError(f"k for stratum {v!r} must be positive")
        cap = F.lit(None).cast("long")
        for v, kk in k.items():
            cap = F.when(F.col(strata_col) == F.lit(v), F.lit(int(kk))).otherwise(cap)
    else:
        if int(k) <= 0:
            raise ValueError("k must be positive")
        cap = F.when(F.col(strata_col).isNotNull(), F.lit(int(k)))
    w = Window.partitionBy(strata_col).orderBy(F.col("__draw__").asc(), F.col(id_col).asc())
    return (
        df.filter(F.col(id_col).isNotNull())
        .withColumn("__draw__", hash_fraction(id_col, salt))
        .withColumn("__cap__", cap)
        .filter(F.col("__cap__").isNotNull())
        .withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") <= F.col("__cap__"))
        .drop("__draw__", "__cap__", "__rn__")
    )


def split_leakage_safe(
    df: DataFrame,
    weights: dict[str, float],
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    out_col: str = "split",
    cluster_col: str | None = None,
) -> DataFrame:
    """Train/val/test split that CANNOT leak duplicates across splits: the
    split is keyed on the duplicate-cluster REPRESENTATIVE, not the doc id,
    so every copy of the same content draws the same uniform and lands in
    the same split. Splitting by doc id — what `split_by_hash` does, and
    what naive pipelines do — puts ~w_train·w_test of each duplicate pair's
    mass across the train/test boundary, and memorized duplicates inflate
    eval scores exactly there.

    Default clustering is exact content identity: representative = min id
    over the normalized-content sha256 group (the `exact_duplicates`
    digest). Pass ``cluster_col`` (e.g. the component id from
    `dedup_clusters`) to make NEAR-duplicates split-atomic too — then this
    function is a zero-shuffle map-only relabel.

    Docs with a NULL digest (NULL text) are NOT mutual duplicates: each is
    its own cluster (keyed by its id) rather than one giant shared-split
    blob — and the window partitions on coalesce(digest, id) so those rows
    never pool into one unbounded NULL group either. A NULL-id doc whose
    CONTENT duplicates a real doc follows its cluster into that cluster's
    split (leakage-safety outranks split_by_hash's NULL-id quarantine here:
    quarantining the copy would still leak its twin's content); only
    NULL-id + NULL-digest docs get a NULL split.

    Scale shape: ONE exchange on the digest (the same shuffle exact dedup
    pays; window groups are duplicate clusters — bounded by a content's copy
    count), then the map-only hash split.
    """
    from pyspark.sql import Window

    from lyra_spark.pipeline.dedup import _norm

    if "__rep__" in df.columns:
        raise ValueError("input must not contain the reserved column '__rep__'")
    if cluster_col is None:
        digest = F.sha2(_norm(text_col), 256)
        # NULL digests fall back to the id key: singleton window groups, so
        # a corpus with 10^9 NULL-text rows never funnels them into one task
        w = Window.partitionBy(F.coalesce(digest, F.col(id_col).cast("string")))
        rep = F.coalesce(F.min(id_col).over(w), F.col(id_col))
    else:
        # singleton docs are absent from a dedup_clusters frame, so a
        # left-joined cluster column is NULL for most of the corpus — they
        # key by their own id instead of all drawing the NULL split
        rep = F.coalesce(F.col(cluster_col), F.col(id_col))
    out = split_by_hash(
        df.withColumn("__rep__", rep), weights, id_col="__rep__", salt=salt, out_col=out_col
    )
    return out.drop("__rep__")
