"""Tolerance wiring: Deequ/GE "mostly" semantics — a rule passes a partition
when its violation RATE is within the declared fraction.

The verdict grid gains a `tolerance` column exactly when the ruleset declares
non-zero tolerances (same schema-stability contract as severity); `pass`
becomes violation_count <= tolerance * row_count (the rule IS satisfied
within threshold) while violation_count stays the raw report;
engine.partition_pass gates on the same within-tolerance condition."""

import dataclasses
import os

import pytest

from lyra_spark import rules as R
from lyra_spark.engine import partition_pass, ruleset_tolerances, validate
from lyra_spark.rules import RuleSet, ruleset_from_json, ruleset_to_json


def tol(rule, t):
    return dataclasses.replace(rule, tolerance=t)


def _frame(spark):
    # 2024-01-01: 10 rows, 1 NULL text → rate 0.10
    # 2024-01-02: 10 rows, 3 NULL text → rate 0.30
    rows = []
    for i in range(10):
        rows.append(("c1", i, "2024-01-01", None if i == 0 else "hello"))
    for i in range(10):
        rows.append(("c2", i, "2024-01-02", None if i < 3 else "hello"))
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, part_date string, text string"
    )


def _ruleset(t=0.2):
    return RuleSet([tol(R.required("text", rule_id="text_required"), t)])


def test_tolerance_column_appears_only_when_declared(spark):
    df = _frame(spark)
    strict = RuleSet([R.required("text", rule_id="text_required")])
    v1 = validate(df, strict, partition_col="part_date").verdicts
    assert "tolerance" not in v1.columns  # historical schema preserved
    v2 = validate(df, _ruleset(), partition_col="part_date").verdicts
    assert "tolerance" in v2.columns
    assert {r["tolerance"] for r in v2.collect()} == {0.2}


def test_within_tolerance_passes_above_fails(spark):
    res = validate(_frame(spark), _ruleset(0.2), partition_col="part_date")
    grid = {r["part_date"]: (r["pass"], r["violation_count"]) for r in res.verdicts.collect()}
    # raw counts always reported; pass reflects the rate vs threshold
    assert grid["2024-01-01"] == (True, 1)   # 0.10 <= 0.20
    assert grid["2024-01-02"] == (False, 3)  # 0.30 > 0.20
    pp = {r["part_date"]: r for r in partition_pass(res.verdicts).collect()}
    assert pp["2024-01-01"]["pass"] is True
    assert pp["2024-01-01"]["error_violations"] == 1  # still counted
    assert pp["2024-01-02"]["pass"] is False


def test_zero_tolerance_rule_in_mixed_ruleset_stays_strict(spark):
    rs = RuleSet(
        [
            tol(R.required("text", rule_id="text_required"), 0.5),
            R.length("text", min=1, rule_id="text_len"),  # default 0.0
        ]
    )
    res = validate(_frame(spark), rs, partition_col="part_date")
    grid = {(r["part_date"], r["rule_id"]): r["pass"] for r in res.verdicts.collect()}
    assert grid[("2024-01-02", "text_required")] is True  # 0.3 <= 0.5
    assert grid[("2024-01-01", "text_len")] is True       # no empty strings
    # one planted empty string must fail the 0.0-tolerance rule outright
    df2 = _frame(spark).sparkSession.createDataFrame(
        [("c3", 0, "2024-01-03", "")], "conv_id string, turn_idx int, part_date string, text string"
    )
    res2 = validate(_frame(spark).unionByName(df2), rs, partition_col="part_date")
    grid2 = {(r["part_date"], r["rule_id"]): r["pass"] for r in res2.verdicts.collect()}
    assert grid2[("2024-01-03", "text_len")] is False


def test_null_tolerance_fails_safe_to_strict(spark):
    from pyspark.sql import functions as F

    res = validate(_frame(spark), _ruleset(0.5), partition_col="part_date")
    nulled = res.verdicts.withColumn("tolerance", F.lit(None).cast("double"))
    pp = {r["part_date"]: r["pass"] for r in partition_pass(nulled).collect()}
    assert pp == {"2024-01-01": False, "2024-01-02": False}


def test_config_rejects_bad_tolerance():
    with pytest.raises(ValueError, match="tolerance"):
        ruleset_from_json('[{"kind": "required", "column": "text", "tolerance": 1.5}]')
    with pytest.raises(ValueError, match="tolerance"):
        ruleset_from_json('[{"kind": "required", "column": "text", "tolerance": "high"}]')


def test_tolerance_roundtrips_and_skips_fingerprint():
    rs = _ruleset(0.2)
    rs2 = ruleset_from_json(ruleset_to_json(rs))
    assert [r.tolerance for r in rs2.rules] == [0.2]
    assert rs2.fingerprint() == rs.fingerprint()
    # tolerance is gating metadata: tuning it must NOT invalidate checkpoints
    strict = RuleSet([R.required("text", rule_id="text_required")])
    assert strict.fingerprint() == rs.fingerprint()
    assert ruleset_tolerances(strict) is None
    assert ruleset_tolerances(rs) == {"text_required": 0.2}


def test_metadata_verdicts_carry_tolerance(spark):
    from lyra_spark.presets import verdicts_from_metadata

    df = _frame(spark)
    rs = _ruleset(0.2)
    res = validate(df, rs, partition_col="part_date")
    counts = {"2024-01-01": 10, "2024-01-02": 10}
    verd = verdicts_from_metadata(
        df, res.violations, ["text_required"], "part_date", counts,
        tolerances=ruleset_tolerances(rs),
    )
    assert "tolerance" in verd.columns
    grid = {r["part_date"]: r["pass"] for r in verd.collect()}
    assert grid == {"2024-01-01": True, "2024-01-02": False}
    pp = {r["part_date"]: r["pass"] for r in partition_pass(verd).collect()}
    assert pp == {"2024-01-01": True, "2024-01-02": False}


def test_cli_report_pass_respects_tolerance(tmp_path, spark, fixtures_sf0001):
    """--report partition pass must be the ACTUAL gate (tolerance/severity
    aware), not violations == 0: with a high-tolerance ruleset, partitions
    carrying violations still report pass=true with raw counts intact."""
    import json

    from jobs.validate import main

    rules = tmp_path / "rules.json"
    # the transcript fixture plants NULL-text violations; 50% tolerance
    # forgives them while the raw counts stay in the report
    rules.write_text(json.dumps([
        {"kind": "required", "column": "text", "rule_id": "text_required",
         "tolerance": 0.5},
    ]))
    rpt = tmp_path / "report.json"
    args = [
        "--table", os.path.join(fixtures_sf0001, "transcripts"),
        "--tools-dim", os.path.join(fixtures_sf0001, "tools_dim.parquet"),
        "--checkpoint", str(tmp_path / "ck"),
        "--run-id", "r1",
        "--limit-partitions", "16",
        "--rules", str(rules),
        "--out", str(tmp_path / "viol"),
        "--report", str(rpt),
    ]
    assert main(args) == 0
    rep = json.loads(rpt.read_text())
    # per partition: the gate passes iff every violation is the tolerated
    # text rule (rates are far below 50%); any zero-tolerance dataset-check
    # violation must still fail it
    checked_tolerated = 0
    for p in rep["partitions"]:
        pdir = tmp_path / "viol" / f"part={p['partition']}"
        kinds = set()
        # a clean partition's sink holds only _SUCCESS (schema inference
        # would throw) — only read dirs that contain data files
        if pdir.exists() and any(pdir.rglob("*.parquet")):
            vdf = spark.read.parquet(str(pdir))
            kinds = {r["rule_id"] for r in vdf.select("rule_id").distinct().collect()}
        expected = kinds <= {"text_required"}
        assert p["pass"] is expected, (p, kinds)
        if p["violations"] > 0 and expected:
            checked_tolerated += 1
    # the assertion is vacuous unless some partition actually exercised the
    # tolerance (violations present, gate passed)
    assert checked_tolerated > 0


def test_cli_metric_history_requires_metric_rules(tmp_path, fixtures_sf0001):
    import pytest as _pytest

    from jobs.validate import main

    with _pytest.raises(SystemExit, match="metric-history requires"):
        main([
            "--table", os.path.join(fixtures_sf0001, "transcripts"),
            "--tools-dim", os.path.join(fixtures_sf0001, "tools_dim.parquet"),
            "--checkpoint", str(tmp_path / "ck"),
            "--run-id", "r1",
            "--metric-history", str(tmp_path / "h"),
        ])
