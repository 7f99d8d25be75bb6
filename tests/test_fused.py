"""Fused two-pass suite ≡ composable multi-pass suite (lyra_spark.fused)."""

import os

from lyra_spark.presets import validate_transcripts
from tests.conftest import normalize_violations


def test_fused_equals_composable(spark, fixtures_sf0001):
    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    dim = spark.read.parquet(os.path.join(fixtures_sf0001, "tools_dim.parquet"))
    fused = validate_transcripts(tdf, dim, fused=True)
    comp = validate_transcripts(tdf, dim, fused=False)
    assert normalize_violations(fused.violations_sorted().toPandas()) == normalize_violations(
        comp.violations_sorted().toPandas()
    )
    fv = {(str(r["part_date"]), r["rule_id"]): (r["pass"], r["violation_count"], r["row_count"]) for r in fused.verdicts.collect()}
    cv = {(str(r["part_date"]), r["rule_id"]): (r["pass"], r["violation_count"], r["row_count"]) for r in comp.verdicts.collect()}
    assert fv == cv
    fused.unpersist()
    comp.unpersist()


def test_fused_plan_shape_conv_checks(spark, fixtures_sf0001):
    """The conv-scoped pass exchanges the FULL-WIDTH data exactly once: all
    three windows (lag, dup-count, dup-rank) stack on the single
    (conv_id, __bkt__) hash exchange. The skew-proof boundary branch is a
    thin 4-column aggregate (tiny output) joined back WITHOUT re-exchanging
    the main side — broadcast at this scale."""
    from lyra_spark.fused import conv_scoped_violations

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    plan = conv_scoped_violations(tdf)._jdf.queryExecution().executedPlan().toString()
    main, _, boundary = plan.partition("BroadcastExchange")
    assert "BroadcastHashJoin" in main, plan[:2000]
    # main side above the join: 3 stacked windows, exactly 1 exchange
    assert main.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert main.count("Window") == 3, plan[:2000]
    # boundary side: thin aggregate + its own small exchanges only
    assert boundary.count("Exchange hashpartitioning") <= 2, plan[:2000]

def test_bucketed_lag_equals_global_window(spark, fixtures_sf0001):
    """Force tiny buckets so every conversation spans many buckets (and the
    injected turn_idx=-1 rows land in bucket -1): the bucketed two-level lag
    must reproduce the global per-conv window exactly."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from lyra_spark.fused import conv_scoped_violations

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    got = (
        conv_scoped_violations(tdf, bucket_turns=7)
        .filter(F.col("rule_id") == "ts_monotone")
        .select("conv_id", "turn_idx", "observed_value")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    want = (
        tdf.select("conv_id", "turn_idx", "ts", F.lag("ts").over(w).alias("prev"))
        .filter(F.col("prev") > F.col("ts"))
        .select("conv_id", "turn_idx", F.col("ts").cast("string").alias("observed_value"))
    )
    assert got.count() > 0
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
