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


def test_fused_plan_has_single_exchange_for_conv_checks(spark, fixtures_sf0001):
    """The conv-scoped pass must contain exactly ONE Exchange (conv_id)."""
    from lyra_spark.fused import conv_scoped_violations

    tdf = spark.read.parquet(os.path.join(fixtures_sf0001, "transcripts"))
    plan = conv_scoped_violations(tdf)._jdf.queryExecution().executedPlan().toString()
    # both unioned branches read the SAME shuffle: 1 real exchange + reuse
    n_exchanges = plan.count("Exchange hashpartitioning")
    n_reused = plan.count("ReusedExchange")
    assert n_exchanges - min(n_exchanges, n_reused) <= 2, plan[:2000]