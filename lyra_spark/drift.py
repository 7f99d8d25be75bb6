"""Distribution-drift checks: KS statistic + PSI on per-partition t-digest
sketches merged tree-wise (BASELINE.json:6).

Scale architecture — raw rows NEVER shuffle for drift:
  stage 1 (map-side): ``mapInPandas`` folds each Arrow batch into a t-digest →
    one (partition_key, blob) row per batch; only ~O(δ) floats leave the scan;
  stage 2: ``applyInPandas`` per partition_key merges batch blobs → one digest
    per Iceberg partition (this IS the combiner tree's middle layer);
  stage 3 (driver): the per-partition digests (hundreds of rows) merge
    pairwise-tree into the global/reference digest; KS and PSI evaluate on the
    digests' CDFs — pure numpy on tiny data.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lyra_spark.sketch.tdigest import TDigest, merge_all

SKETCH_SCHEMA = "part_key string, sketch binary, n long"


def sketch_by_partition(
    df: DataFrame,
    value_col,
    partition_col: str = "part_date",
    delta: int = 200,
) -> DataFrame:
    """Per-partition t-digest blobs of ``value_col`` (an expression string or
    Column). Two-stage: per-Arrow-batch sketch (no raw-row shuffle), then a
    tiny per-partition blob merge."""
    # NULL partitions sentinel to "None" (the same key partition_scope
    # owns): pandas groupby drops NULL keys by default, which would silently
    # exclude the NULL partition's rows from every digest
    # cast("double") like sketch_columns_by_partition: a timestamp/decimal
    # value_col otherwise reaches the pandas worker as a dtype numpy cannot
    # coerce and crashes mid-job where the multi-column sibling succeeds
    val = (F.expr(value_col) if isinstance(value_col, str) else value_col).cast("double")
    src = df.select(
        F.coalesce(F.col(partition_col).cast("string"), F.lit("None")).alias("part_key"),
        val.alias("v"),
    ).filter(F.col("v").isNotNull())

    def batch_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, g in pdf.groupby("part_key", sort=False):
                d = TDigest.from_values(g["v"].to_numpy(dtype=np.float64), delta)
                rows.append((key, d.to_bytes(), len(g)))
            if rows:
                yield pd.DataFrame(rows, columns=["part_key", "sketch", "n"])

    batch_blobs = src.mapInPandas(batch_sketch, schema=SKETCH_SCHEMA)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = merge_all([TDigest.from_bytes(b) for b in pdf["sketch"]])
        return pd.DataFrame(
            {"part_key": [pdf["part_key"].iloc[0]], "sketch": [merged.to_bytes()], "n": [int(pdf["n"].sum())]}
        )

    return batch_blobs.groupBy("part_key").applyInPandas(merge_group, schema=SKETCH_SCHEMA)


MULTI_SKETCH_SCHEMA = "part_key string, column string, sketch binary, n long"


def sketch_columns_by_partition(
    df: DataFrame,
    value_cols: list,
    partition_col: str = "part_date",
    delta: int = 200,
) -> DataFrame:
    """Per-(partition, column) t-digest blobs for SEVERAL columns from ONE
    scan. At 10¹²-row scale the scan IS the cost of drift monitoring —
    sketch_by_partition per column re-reads the table k times for a k-column
    dashboard; this builds all k digests per Arrow batch in a single pass
    (k× less IO, identical digests up to merge order).

    ``value_cols``: list of column names or expression strings; each names
    its output slice (the expression string itself for expressions).
    Output rows are (part_key, column, sketch, n); slice one column with
    ``.filter(col==c).drop("column")`` and every SKETCH_SCHEMA consumer
    (collect_digests, drift_verdicts, save_reference) works unchanged.
    """
    exprs = [(c, F.expr(c).cast("double").alias(f"v{i}")) for i, c in enumerate(value_cols)]
    src = df.select(
        F.coalesce(F.col(partition_col).cast("string"), F.lit("None")).alias("part_key"),
        *[e for _, e in exprs],
    )
    names = [c for c, _ in exprs]

    def batch_sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for key, g in pdf.groupby("part_key", sort=False):
                for i, name in enumerate(names):
                    v = g[f"v{i}"].dropna()
                    if len(v):
                        d = TDigest.from_values(v.to_numpy(dtype=np.float64), delta)
                        rows.append((key, name, d.to_bytes(), len(v)))
            if rows:
                yield pd.DataFrame(rows, columns=["part_key", "column", "sketch", "n"])

    blobs = src.mapInPandas(batch_sketch, schema=MULTI_SKETCH_SCHEMA)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        merged = merge_all([TDigest.from_bytes(b) for b in pdf["sketch"]])
        return pd.DataFrame(
            {
                "part_key": [pdf["part_key"].iloc[0]],
                "column": [pdf["column"].iloc[0]],
                "sketch": [merged.to_bytes()],
                "n": [int(pdf["n"].sum())],
            }
        )

    return blobs.groupBy("part_key", "column").applyInPandas(
        merge_group, schema=MULTI_SKETCH_SCHEMA
    )


def collect_digests(sketches: DataFrame) -> dict[str, TDigest]:
    """Driver-side: part_key → TDigest. Input is one small row per partition."""
    return {r["part_key"]: TDigest.from_bytes(r["sketch"]) for r in sketches.collect()}


def global_digest(digests: dict[str, TDigest]) -> TDigest:
    return merge_all([digests[k] for k in sorted(digests)])


# --- reference persistence (run-over-run drift) ---------------------------
def save_reference(sketches: DataFrame, path: str) -> TDigest:
    """Persist the merged global digest of a run as the drift baseline.

    The file is the production run-over-run contract: today's validation run
    compares each partition against YESTERDAY's saved reference instead of
    this run's own global digest. Atomic write (tmp + replace); the blob is
    the t-digest's own serialization plus a 1-line JSON header."""
    import json
    import os

    digs = collect_digests(sketches)
    if not digs:
        raise ValueError("save_reference: no sketches — an empty reference would "
                         "NaN every KS/PSI and silently pass all drift checks")
    ref = global_digest(digs)
    tmp = path + ".tmp"
    header = json.dumps({"format": "lyra-tdigest-ref", "version": 1, "n": ref.size}).encode()
    with open(tmp, "wb") as f:
        f.write(header + b"\n" + ref.to_bytes())
    os.replace(tmp, path)
    return ref


def load_reference(path: str) -> TDigest:
    with open(path, "rb") as f:
        _header, blob = f.read().split(b"\n", 1)
    return TDigest.from_bytes(blob)


# --- categorical drift (distributed, pure Catalyst) -------------------------
def categorical_psi(
    df: DataFrame,
    col: str,
    partition_col: str = "part_date",
    alpha: float = 0.5,
    null_token: str = "<NULL>",
) -> DataFrame:
    """Per-partition PSI of a CATEGORICAL column's value distribution vs the
    whole table (role/tool/lang drift — the t-digest path covers numeric
    columns only, and quantile sketches are meaningless on nominal values).

    Returns (partition, psi, js, n_rows, n_categories) — PSI plus the
    Jensen–Shannon divergence (natural log, so js ∈ [0, ln 2]) of the same
    smoothed distributions, computed in the SAME aggregate: js is bounded and
    symmetric where PSI explodes on rare categories, so thresholds transfer
    across partitions of very different size. Additive (Laplace) smoothing
    ``alpha`` on BOTH sides over the GLOBAL category set handles categories
    absent from one side (a new role appearing in today's partition is
    precisely the event to flag, not a log(0)).

    Scale shape: everything aggregates COUNTS — one exchange on
    (partition, value) for the grid (map-side partials absorb hot values),
    one global (value) aggregate derived from the same grid (pre-aggregated:
    #partitions × #categories rows, not raw rows), one broadcast-size join on
    value, one final sum per partition. Raw rows shuffle exactly once. The
    category set of a validated enum-ish column is small by definition; a
    high-cardinality column (conv_id) is not a drift target.
    """
    vals = df.select(
        F.coalesce(F.col(col).cast("string"), F.lit(null_token)).alias("__v"),
        # NULL-sentineled partition key (decision 64 family): the dense-grid
        # equi-join below never matches NULL = NULL, so a NULL partition kept
        # by groupBy would get n=0 for EVERY category (pure smoothing mass →
        # a huge spurious PSI row); "\x00NULL" is unprintable and cannot
        # collide with a real partition string
        F.coalesce(F.col(partition_col).cast("string"), F.lit("\x00NULL")).alias("partition"),
    )
    grid = vals.groupBy("partition", "__v").agg(F.count(F.lit(1)).alias("n"))
    grid = grid.localCheckpoint(eager=False)  # reused by all three branches
    glob = grid.groupBy("__v").agg(F.sum("n").alias("gn"))
    # dense (partition × global category) frame so absent categories get n=0
    parts = grid.groupBy("partition").agg(F.sum("n").alias("pn"))
    k = glob.count()  # global category count (small by contract)
    gtot = glob.agg(F.sum("gn")).collect()[0][0] or 0
    dense = parts.crossJoin(F.broadcast(glob)).join(
        grid, ["partition", "__v"], "left"
    ).select(
        "partition",
        "pn",
        "gn",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    a = float(alpha)
    p = (F.col("n") + F.lit(a)) / (F.col("pn") + F.lit(a) * k)
    q = (F.col("gn") + F.lit(a)) / (F.lit(float(gtot)) + F.lit(a) * k)
    term = (p - q) * F.log(p / q)
    m = (p + q) / 2
    js_term = (p * F.log(p / m) + q * F.log(q / m)) / 2
    return (
        dense.groupBy("partition")
        .agg(
            F.sum(term).alias("psi"),
            F.sum(js_term).alias("js"),
            F.max("pn").alias("n_rows"),
            F.count(F.lit(1)).alias("n_categories"),
        )
    )


def categorical_psi_trailing(
    df: DataFrame,
    col: str,
    partition_col: str = "part_date",
    k: int = 7,
    alpha: float = 0.5,
    null_token: str = "<NULL>",
) -> DataFrame:
    """Per-partition PSI + Jensen–Shannon of a categorical column vs the
    TRAILING ``k`` partitions — the production drift monitor shape
    (categorical_psi compares against the whole table, which dilutes a
    regime change the longer history grows; a trailing reference flags it
    the day it lands, the same pattern row_count_anomaly uses for counts).

    Returns (partition, psi, js, n_rows, ref_rows, n_ref_parts,
    n_categories); partitions with no preceding partition emit nothing
    (no reference to compare against), and ``n_ref_parts`` < k marks a
    still-warming window for the caller's threshold logic. Partitions
    order lexicographically — ISO dates sort correctly by construction.

    Scale shape: raw rows shuffle ONCE into the (partition, value) count
    grid; the dense grid (every partition × the GLOBAL category set, absent
    combos at n=0 so the trailing frame is positionally exact), the
    per-value trailing window, the per-partition reference total, and the
    final roll-up all operate on that pre-aggregated grid — ~#partitions ×
    #categories rows, never raw data. Laplace smoothing ``alpha`` on both
    sides over the global category set, exactly as categorical_psi.
    """
    from pyspark.sql import Window

    vals = df.select(
        F.coalesce(F.col(col).cast("string"), F.lit(null_token)).alias("__v"),
        # NULL-sentineled partition key (decision 64 family): the dense-grid
        # equi-join below never matches NULL = NULL, so a NULL partition kept
        # by groupBy would get n=0 for EVERY category (pure smoothing mass →
        # a huge spurious PSI row); "\x00NULL" is unprintable and cannot
        # collide with a real partition string
        F.coalesce(F.col(partition_col).cast("string"), F.lit("\x00NULL")).alias("partition"),
    )
    grid = vals.groupBy("partition", "__v").agg(F.count(F.lit(1)).alias("n"))
    grid = grid.localCheckpoint(eager=False)
    glob = grid.select("__v").distinct()
    kcat = glob.count()  # global category count (small by contract)
    parts = grid.groupBy("partition").agg(F.sum("n").alias("pn"))
    dense = parts.crossJoin(F.broadcast(glob)).join(
        grid, ["partition", "__v"], "left"
    ).select("partition", "pn", "__v", F.coalesce(F.col("n"), F.lit(0)).alias("n"))

    w_val = Window.partitionBy("__v").orderBy("partition").rowsBetween(-int(k), -1)
    trail = dense.select(
        "partition",
        "pn",
        "__v",
        "n",
        F.coalesce(F.sum("n").over(w_val), F.lit(0)).alias("ref_n"),
        F.count(F.lit(1)).over(w_val).alias("n_ref_parts"),
    )
    w_part = Window.partitionBy("partition")
    trail = trail.withColumn("ref_pn", F.sum("ref_n").over(w_part)).filter(
        F.col("n_ref_parts") > 0
    )

    a = float(alpha)
    p = (F.col("n") + F.lit(a)) / (F.col("pn") + F.lit(a) * kcat)
    q = (F.col("ref_n") + F.lit(a)) / (F.col("ref_pn") + F.lit(a) * kcat)
    term = (p - q) * F.log(p / q)
    m = (p + q) / 2
    js_term = (p * F.log(p / m) + q * F.log(q / m)) / 2
    return trail.groupBy("partition").agg(
        F.sum(term).alias("psi"),
        F.sum(js_term).alias("js"),
        F.max("pn").alias("n_rows"),
        F.max("ref_pn").alias("ref_rows"),
        F.max("n_ref_parts").alias("n_ref_parts"),
        F.count(F.lit(1)).alias("n_categories"),
    )


# --- drift metrics (numpy on digests) -------------------------------------
def ks_statistic(a: TDigest, b: TDigest, grid_points: int = 256) -> float:
    """max |CDF_a − CDF_b| on a shared quantile-union grid."""
    qs = np.linspace(0.0, 1.0, grid_points)
    grid = np.unique(np.concatenate([a.quantile(qs), b.quantile(qs)]))
    return float(np.max(np.abs(a.cdf(grid) - b.cdf(grid))))


def ks_exact(
    df: DataFrame, value_col: str, group_col: str, group_a: str, group_b: str
) -> float:
    """EXACT two-sample Kolmogorov–Smirnov statistic between two groups'
    value distributions: max over the distinct-value grid of |ECDF_a −
    ECDF_b|. This is the ground-truth gate the digest-based
    :func:`ks_statistic` is tolerance-checked against (driver query
    `ks_tolerance`); the digests (rows 30-31) are the 10¹²-row path.

    Shape: one hash-agg collapses the data to the distinct-value grid
    (per-value counts for each side — constant buffers), then ONE
    unpartitioned window walks the grid for the running counts. The global
    window is a single task over DISTINCT VALUES — honest for a gate/sample
    mode (same stance as percentile_stats, row 60), and exactly the part the
    sketch path exists to avoid at full scale.
    """
    from pyspark.sql import Window

    v = df.filter(
        F.col(value_col).isNotNull() & F.col(group_col).isin(group_a, group_b)
    ).select(F.col(group_col).alias("g"), F.col(value_col).alias("x"))
    grid = v.groupBy("x").agg(
        F.count(F.when(F.col("g") == group_a, 1)).alias("ca"),
        F.count(F.when(F.col("g") == group_b, 1)).alias("cb"),
    )
    # totals come from a full-frame window over the SAME sort as the running
    # counts — one scan of the input, one sort of the distinct grid, one job
    # (a separate groupBy-collect for the totals would re-scan the table)
    wcum = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.orderBy("x").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ta, tb = F.sum("ca").over(wtot), F.sum("cb").over(wtot)
    # try_divide: an empty group must surface as the ValueError below, not a
    # mid-job ANSI DIVIDE_BY_ZERO (max() ignores the resulting NULL gaps)
    gaps = grid.select(
        F.abs(
            F.try_divide(F.sum("ca").over(wcum), ta.cast("double"))
            - F.try_divide(F.sum("cb").over(wcum), tb.cast("double"))
        ).alias("gap"),
        ta.alias("ta"),
        tb.alias("tb"),
    )
    row = gaps.agg(F.max("gap").alias("ks"), F.max("ta").alias("na"), F.max("tb").alias("nb")).collect()[0]
    na, nb = row["na"] or 0, row["nb"] or 0
    if na == 0 or nb == 0:
        raise ValueError(f"both groups need rows: {group_a}={na}, {group_b}={nb}")
    return float(row["ks"])


def psi(reference: TDigest, current: TDigest, bins: int = 10, eps: float = 1e-6) -> float:
    """Population Stability Index over equi-probable bins from the reference."""
    edges = reference.quantile(np.linspace(0.0, 1.0, bins + 1))
    edges[0], edges[-1] = -np.inf, np.inf
    # interior edges must be strictly increasing for cdf differencing
    interior = np.maximum.accumulate(edges[1:-1])
    ref_cdf = np.concatenate([[0.0], reference.cdf(interior), [1.0]])
    cur_cdf = np.concatenate([[0.0], current.cdf(interior), [1.0]])
    p = np.clip(np.diff(ref_cdf), eps, None)
    q = np.clip(np.diff(cur_cdf), eps, None)
    p, q = p / p.sum(), q / q.sum()
    return float(np.sum((p - q) * np.log(p / q)))


def numeric_drift_trailing(
    df: DataFrame,
    value_col: str,
    partition_col: str,
    k: int = 3,
    ks_threshold: float = 0.10,
    ks_alpha_c: float = 1.95,
) -> pd.DataFrame:
    """Trailing-window NUMERIC drift: each partition's t-digest KS-compared
    against the POOLED digest of the previous ``k`` partitions (in sorted
    partition-key order — dates sort chronologically). The numeric
    counterpart of :func:`categorical_psi_trailing`, and the run-over-run
    monitor shape: a whole-table reference (drift_verdicts) dilutes a regime
    change as history grows, while a trailing window flags it the partition
    it lands.

    Scale shape: the data is touched by ONE distributed sketch pass
    (sketch_by_partition — mapInPandas partial digests, per-partition merge);
    pooling and KS run on the driver over P bounded-size digests with an
    incremental window (append + drop, each a centroid-array merge), so
    driver work is O(P·k·centroids) with zero further jobs — at 10⁵ Iceberg
    partitions this is milliseconds per partition.

    The KS gate is sample-size aware exactly like drift_verdicts: the cut is
    max(ks_threshold, c·√((n+m)/(n·m))) — a fixed threshold on a small
    partition fires on pure sampling noise. The first partition has no
    trailing history and reports ks=NaN, pass=True.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    digests = collect_digests(sketch_by_partition(df, value_col, partition_col))
    keys = sorted(digests)
    rows = []
    window: list[TDigest] = []
    for p in keys:
        if window:
            pooled = merge_all(window)
            ks = ks_statistic(digests[p], pooled)
            n, m = digests[p].size, pooled.size
            cut = max(ks_threshold, ks_alpha_c * math.sqrt((n + m) / (n * m)))
            rows.append(
                {"part_key": p, "ks": ks, "n_ref_parts": len(window),
                 "threshold": cut, "pass": ks < cut}
            )
        else:
            rows.append(
                {"part_key": p, "ks": float("nan"), "n_ref_parts": 0,
                 "threshold": ks_threshold, "pass": True}
            )
        window.append(digests[p])
        if len(window) > k:
            window.pop(0)
    return pd.DataFrame(rows)


def drift_verdicts(
    sketches: DataFrame,
    reference: TDigest | None = None,
    ks_threshold: float = 0.10,
    psi_threshold: float = 0.25,
    psi_min_n: int = 500,
    ks_alpha_c: float = 1.95,
    rule_id: str = "text_len_drift",
    loo_max_partitions: int = 10,
) -> pd.DataFrame:
    """Per-partition KS/PSI vs a reference digest → pass/fail frame.

    If ``reference`` is None, each partition is compared against the merged
    GLOBAL digest of all partitions (self-inclusion reference) — the
    cold-start mode when no historical baseline exists. The global digest is
    merged ONCE, so driver work is O(P) in the partition count (the round-1
    leave-one-out variant re-merged all other digests per partition: O(P²),
    melting the driver at 10⁵ Iceberg partitions). Self-inclusion bias: a
    drifted partition contributes ~n_k/N of the reference mass, diluting its
    own KS/PSI by that factor — negligible for P ≫ 1, but at small P (2-3
    partitions) the dilution can mask real drift, so for
    P < ``loo_max_partitions`` the reference falls back to per-partition
    LEAVE-ONE-OUT merges (O(P²) is free at that size). Production runs should
    pass a persisted baseline (save_reference/load_reference) anyway.

    Thresholds are SAMPLE-SIZE AWARE: a fixed KS cut is statistically wrong
    for small partitions (pure sampling noise gives KS ≈ c/√n), so the KS gate
    is max(ks_threshold, c·√((n+m)/(n·m))) — the two-sample KS critical value
    at α≈0.001 for c=1.95. PSI only gates partitions with ≥ psi_min_n rows
    (binned PSI on tiny samples is dominated by empty-bin noise); it is always
    reported.
    """
    digests = collect_digests(sketches)
    keys = sorted(digests)
    # cold-start reference: leave-one-out below loo_max_partitions (dilution
    # would be material), single self-inclusive global merge above it
    if reference is not None and reference.size == 0:
        raise ValueError("drift_verdicts: empty reference digest — every KS/PSI "
                         "would be NaN and silently pass")
    if not keys:
        # a columns-less pd.DataFrame([]) would KeyError (or silently
        # all-pass) downstream — return the empty frame WITH the contract
        # columns so callers' filters work unchanged
        return pd.DataFrame(
            columns=["part_key", "rule_id", "n", "ks", "ks_crit", "psi", "pass"]
        )
    if reference is None and len(keys) == 1:
        # one partition and no baseline: the only possible reference is the
        # partition itself — ks=0/psi=0 would be a FABRICATED measurement
        # blessing arbitrary drift; report NaN + pass (no history is not
        # drift, decision 49) exactly like numeric_drift_trailing's first row
        k = keys[0]
        return pd.DataFrame([
            {"part_key": k, "rule_id": rule_id, "n": int(max(digests[k].size, 1.0)),
             "ks": float("nan"), "ks_crit": float("nan"), "psi": float("nan"),
             "pass": True}
        ])
    loo = reference is None and 1 < len(keys) < loo_max_partitions
    # the global merge is only needed when NOT leave-one-out (loo rebuilds
    # ref per partition anyway — merging it here would be wasted O(P) work)
    ref = reference if reference is not None else (None if loo else global_digest(digests))
    rows = []
    for k in keys:
        cur = digests[k]
        if loo:
            ref = merge_all([digests[j] for j in keys if j != k])
        ks = ks_statistic(ref, cur)
        p = psi(ref, cur)
        n, m = max(cur.size, 1.0), max(ref.size, 1.0)
        ks_crit = max(ks_threshold, ks_alpha_c * np.sqrt((n + m) / (n * m)))
        ks_fail = ks > ks_crit
        psi_fail = n >= psi_min_n and p > psi_threshold
        rows.append(
            {
                "part_key": k,
                "rule_id": rule_id,
                "n": int(n),
                "ks": ks,
                "ks_crit": ks_crit,
                "psi": p,
                "pass": not (ks_fail or psi_fail),
            }
        )
    return pd.DataFrame(rows)
