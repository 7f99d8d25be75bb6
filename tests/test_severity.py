"""Severity wiring: warn rules report but never gate (SEMANTICS.md row 69).

The verdict grid gains a `severity` column exactly when the ruleset declares
non-default severities; `pass` stays factual per (partition, rule);
engine.partition_pass rolls up the partition gate on error-severity rules
only."""

import dataclasses

from lyra_spark import rules as R
from lyra_spark.engine import partition_pass, ruleset_severities, validate
from lyra_spark.rules import RuleSet, ruleset_from_json, ruleset_to_json


def warn(rule):
    return dataclasses.replace(rule, severity="warn")


def _frame(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "2024-01-01", "hello"),
            ("c1", 1, "2024-01-01", None),  # fails text_required (warn)
            ("c2", 0, "2024-01-02", "x" * 5),
            ("c2", 1, "2024-01-02", "x" * 500),  # fails text_len (error)
        ],
        "conv_id string, turn_idx int, part_date string, text string",
    )


def _ruleset():
    return RuleSet(
        [
            warn(R.required("text", rule_id="text_required")),
            R.length("text", max=100, rule_id="text_len"),
        ]
    )


def test_severity_column_appears_only_when_declared(spark):
    df = _frame(spark)
    all_error = RuleSet([R.required("text"), R.length("text", max=100)])
    v1 = validate(df, all_error, partition_col="part_date").verdicts
    assert "severity" not in v1.columns  # historical 5-col schema preserved
    v2 = validate(df, _ruleset(), partition_col="part_date").verdicts
    assert "severity" in v2.columns
    sev = {(r["rule_id"]): r["severity"] for r in v2.collect()}
    assert sev == {"text_required": "warn", "text_len": "error"}


def test_warn_rule_reports_but_does_not_gate(spark):
    res = validate(_frame(spark), _ruleset(), partition_col="part_date")
    # factual per-rule pass: the warn rule still FAILS its grid row
    grid = {(r["part_date"], r["rule_id"]): (r["pass"], r["violation_count"]) for r in res.verdicts.collect()}
    assert grid[("2024-01-01", "text_required")] == (False, 1)
    assert grid[("2024-01-02", "text_len")] == (False, 1)
    # partition gate: warn-only failures pass; error failures fail
    pp = {r["part_date"]: r for r in partition_pass(res.verdicts).collect()}
    assert pp["2024-01-01"]["pass"] is True
    assert pp["2024-01-01"]["warn_violations"] == 1
    assert pp["2024-01-01"]["error_violations"] == 0
    assert pp["2024-01-02"]["pass"] is False
    assert pp["2024-01-02"]["error_violations"] == 1


def test_partition_pass_without_severity_gates_everything(spark):
    all_error = RuleSet([R.required("text", rule_id="text_required")])
    res = validate(_frame(spark), all_error, partition_col="part_date")
    pp = {r["part_date"]: r["pass"] for r in partition_pass(res.verdicts).collect()}
    assert pp == {"2024-01-01": False, "2024-01-02": True}


def test_null_severity_fails_safe(spark):
    # a NULL severity cell (5-col grid unioned into a 6-col one with
    # allowMissingColumns) must gate as "error", never vanish from both sums
    from pyspark.sql import functions as F

    res = validate(_frame(spark), _ruleset(), partition_col="part_date")
    nulled = res.verdicts.withColumn(
        "severity", F.when(F.col("rule_id") == "text_len", F.lit(None)).otherwise(F.col("severity"))
    )
    pp = {r["part_date"]: r for r in partition_pass(nulled).collect()}
    assert pp["2024-01-02"]["pass"] is False
    assert pp["2024-01-02"]["error_violations"] == 1


def test_config_rejects_unknown_severity():
    import pytest

    with pytest.raises(ValueError, match="unknown severity"):
        ruleset_from_json('[{"kind": "required", "column": "text", "severity": "warning"}]')


def test_severity_roundtrips_and_skips_fingerprint():
    rs = _ruleset()
    rs2 = ruleset_from_json(ruleset_to_json(rs))
    assert [r.severity for r in rs2.rules] == ["warn", "error"]
    assert rs2.fingerprint() == rs.fingerprint()
    # severity is metadata: flipping it must NOT invalidate checkpoints
    all_error = RuleSet(
        [R.required("text", rule_id="text_required"), R.length("text", max=100, rule_id="text_len")]
    )
    assert all_error.fingerprint() == rs.fingerprint()
    assert ruleset_severities(all_error) is None
    assert ruleset_severities(rs) == {"text_required": "warn", "text_len": "error"}


def test_metadata_verdicts_carry_severity(spark):
    from lyra_spark.presets import verdicts_from_metadata

    df = _frame(spark)
    rs = _ruleset()
    res = validate(df, rs, partition_col="part_date")
    counts = {"2024-01-01": 2, "2024-01-02": 2}
    verd = verdicts_from_metadata(
        df, res.violations, ["text_required", "text_len"], "part_date", counts,
        severities=ruleset_severities(rs),
    )
    assert "severity" in verd.columns
    pp = {r["part_date"]: r["pass"] for r in partition_pass(verd).collect()}
    assert pp == {"2024-01-01": True, "2024-01-02": False}
