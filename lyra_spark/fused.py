"""Fused full-suite validation: minimum-pass plan for the transcript suite.

The composable operators in checks.py each scan the table; correct, but at
100 TB the scan count dominates. This module computes the ENTIRE suite in:

  pass 1 (no shuffle):   row rules + referential — the tools dimension is tiny
                         (50 rows), so instead of a broadcast anti-join it is
                         collected once and compiled INTO the single-pass rule
                         select as an `isin` check (a broadcast join without
                         the join);
  pass 2 (ONE shuffle):  repartition by conv_id feeds BOTH per-conversation
                         checks — duplicate keys via a count window over
                         (conv_id, turn_idx, part_date) and monotone ordering
                         via lag over (conv_id; turn_idx, ts) — one exchange
                         instead of two.

Caveats vs the composable variants (kept, documented):
  * checks.uniqueness_violations (salted two-phase agg) is the right shape
    when duplicate multiplicity itself is skewed; the window variant puts one
    conversation in one task, which the BASELINE accepts for monotone anyway
    (hot conv ≈ 10% of rows — bounded).
  * checks.referential_violations (broadcast anti-join) is the right shape for
    dimensions too big to inline as literals (≳ thousands of values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lyra_spark.checks import MONO_RULE, REF_RULE, UNIQ_RULE
from lyra_spark.engine import ValidationResult, compute_verdicts, row_violations
from lyra_spark.rules import RuleSet, deny, enum
from lyra_spark.schema import KEY_COLUMNS, PARTITION_COLUMN


def inline_referential_rule(df_dim: DataFrame, fk_col: str = "tool", dim_col: str = "tool_name", rule_id: str = REF_RULE):
    """Compile the referential check as an enum rule from the collected dim.

    Legitimate only for genuinely small dimensions — the value list becomes a
    literal in the plan (and an executor-side hash set), exactly what a
    broadcast join would ship, minus the join machinery."""
    values = [r[0] for r in df_dim.select(dim_col).distinct().collect()]
    return enum(fk_col, values, rule_id=rule_id)


def conv_scoped_violations(
    df: DataFrame,
    key_cols: list[str] = KEY_COLUMNS,
    partition_col: str = PARTITION_COLUMN,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    bucket_turns: int = 4096,
    partition_from_ts: bool = True,
) -> DataFrame:
    """Uniqueness + monotone violations off ONE exchange on (conv_id, bucket).

    Skew-proof lag: windowing ``partitionBy(conv_id)`` puts a whole
    conversation in one task — a hot conversation holding 10% of 10^12 turns
    would pin a single executor forever. Instead turns are bucketed
    (``floor(turn_idx / bucket_turns)``) so window partitions are bounded at
    ~``bucket_turns`` rows regardless of skew, and the cross-bucket lag is
    restored from a boundary frame (one row per (conv_id, bucket): the
    bucket's last (turn_idx, ts) under the same ordering) that is ~1/4096th
    of the input — joined back via AQE (broadcast at small scale,
    co-partitioned hash join at 10^12 where the boundary itself is big).
    Both windows share the (conv_id, bucket) hash exchange: HashPartitioning
    on a subset of a window's partition keys satisfies its clustering, so
    Catalyst plans exactly one Exchange for the whole branch.
    """
    bkt = F.floor(F.col(order_col).cast("long") / F.lit(int(bucket_turns)))
    # Single-sort trick: when the Iceberg partition column derives
    # monotonically from ts (part_date = date(ts), the standard layout),
    # ordering by (turn_idx, part_date, ts) is the SAME total order as
    # (turn_idx, ts) — but it makes all three windows' required child
    # orderings prefixes of one sort key (conv, bkt, turn, part, ts), so
    # Catalyst plans ONE sort for the whole window stack instead of three.
    mono_order = [order_col, partition_col, ts_col] if partition_from_ts else [order_col, ts_col]
    w_mono = Window.partitionBy(group_col, "__bkt__").orderBy(*mono_order)
    w_dup = Window.partitionBy(group_col, "__bkt__", order_col, partition_col)
    w_dup_rank = w_dup.orderBy(ts_col)

    keep = [*key_cols, partition_col]
    dfb = df.select(*keep, ts_col, bkt.alias("__bkt__"))

    # Boundary frame: last (turn_idx, ts) of every (conv, bucket) under the
    # mono ordering, lagged to the NEXT non-empty bucket of the same conv.
    # Tiny (≤ rows/bucket_turns) — its per-conv window is skew-free by
    # construction (hot conv of 10^11 turns → ~10^7 boundary rows, windowed
    # in ~2.4e4-row groups... still bounded: boundary is 1/4096 of input).
    w_bnd = Window.partitionBy(group_col).orderBy("__bkt__")
    boundary = (
        dfb.groupBy(group_col, "__bkt__")
        .agg(F.max(F.struct(order_col, ts_col)).alias("__last__"))
        .select(
            group_col,
            "__bkt__",
            F.lag(F.col(f"__last__.{ts_col}")).over(w_bnd).alias("__prev_bucket_ts__"),
        )
    )

    annotated = dfb.select(
        *keep,
        ts_col,
        "__bkt__",
        F.lag(ts_col).over(w_mono).alias("__prev_in_bucket__"),
        F.row_number().over(w_mono).alias("__mono_rn__"),
        F.count(F.lit(1)).over(w_dup).alias("__dup_cnt__"),
        F.row_number().over(w_dup_rank).alias("__dup_rn__"),
    ).join(boundary, [group_col, "__bkt__"], "left").withColumn(
        "__prev_ts__",
        F.when(F.col("__mono_rn__") == 1, F.col("__prev_bucket_ts__")).otherwise(F.col("__prev_in_bucket__")),
    )
    # Emit BOTH violation kinds from the SAME windowed branch (array→filter→
    # explode, as in engine.row_violations): one scan, one exchange, no union.
    mono_fail = F.col("__prev_ts__") > F.col(ts_col)
    dup_fail = (F.col("__dup_cnt__") > 1) & (F.col("__dup_rn__") == 1)
    checks_arr = F.array(
        F.struct(
            F.lit(MONO_RULE).alias("rule_id"),
            F.coalesce(~mono_fail, F.lit(True)).alias("ok"),
            F.col(ts_col).cast("string").alias("observed_value"),
        ),
        F.struct(
            F.lit(UNIQ_RULE).alias("rule_id"),
            (~dup_fail).alias("ok"),
            F.col("__dup_cnt__").cast("string").alias("observed_value"),
        ),
    )
    return annotated.select(
        *keep, F.explode(F.filter(checks_arr, lambda x: ~x["ok"])).alias("v")
    ).select(*keep, F.col("v.rule_id").alias("rule_id"), F.col("v.observed_value").alias("observed_value"))


def validate_transcripts_fused(
    df: DataFrame,
    tools_dim: DataFrame,
    ruleset: RuleSet,
    partition_col: str = PARTITION_COLUMN,
    key_cols: list[str] = KEY_COLUMNS,
    persist: bool = True,
) -> ValidationResult:
    """Full suite in two data passes (see module docstring)."""
    from pyspark.storagelevel import StorageLevel

    if any(r.rule_id == REF_RULE for r in ruleset.rules):
        fused_rules = ruleset  # caller pre-compiled the referential rule
    else:
        fused_rules = RuleSet(ruleset.rules + [inline_referential_rule(tools_dim)])
    row_v = row_violations(df, fused_rules, key_cols, partition_col)
    conv_v = conv_scoped_violations(df, key_cols, partition_col)
    # column order must match for union
    cols = [*key_cols, partition_col, "rule_id", "observed_value"]
    viol = row_v.select(*cols).unionByName(conv_v.select(*cols))
    if persist:
        viol = viol.persist(StorageLevel.MEMORY_AND_DISK)
    rule_ids = [r.rule_id for r in fused_rules.checks] + [UNIQ_RULE, MONO_RULE]
    verd = compute_verdicts(df, viol, rule_ids, partition_col)
    return ValidationResult(violations=viol, verdicts=verd, key_cols=list(key_cols), partition_col=partition_col)
