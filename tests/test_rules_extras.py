"""Round-5 rule-surface extras: json_unknown_keys (lyra object().unknown(false)
on a JSON payload column) and the squish/replace/truncate string coercions."""

import pytest
from pyspark.sql import functions as F

from lyra_spark import rules as R
from lyra_spark.compiler import apply_coercions, compile_checks
from lyra_spark.rules import RuleSet, ruleset_from_json, ruleset_to_json


def _passes(spark, ruleset, rows, schema):
    df = spark.createDataFrame(rows, schema)
    dfc = apply_coercions(df, ruleset)
    checks = compile_checks(dfc, ruleset)
    got = dfc.select("id", *[c.passes.alias(c.spec.rule_id) for c in checks]).collect()
    return {r.id: {k: r[k] for k in r.asDict() if k != "id"} for r in got}


def test_json_unknown_keys(spark):
    rows = [
        (1, '{"k": 1}'),                    # known key only
        (2, '{"k": 1, "zz": 2}'),           # unknown top-level key
        (3, None),                          # NULL skips
        (4, 'not json'),                    # invalid JSON fails
        (5, '[1, 2]'),                      # non-object fails
        (6, '{}'),                          # empty object: vacuously fine
        (7, '{"k": {"inner_unknown": 1}}'), # nested keys are NOT top-level
    ]
    rs = RuleSet([R.json_unknown_keys("props", ["k", "v"], rule_id="props_keys")])
    got = {i: d["props_keys"] for i, d in _passes(spark, rs, rows, "id long, props string").items()}
    assert got == {1: True, 2: False, 3: True, 4: False, 5: False, 6: True, 7: True}


def test_json_unknown_keys_config_roundtrip():
    rs = RuleSet([R.json_unknown_keys("props", ["a", "b"])])
    loaded = ruleset_from_json(ruleset_to_json(rs))
    assert loaded.fingerprint() == rs.fingerprint()
    assert loaded.rules[0].p["allowed"] == ("a", "b")


def test_squish_replace_truncate_coercions(spark):
    df = spark.createDataFrame(
        [(1, "  a   b\t\nc  "), (2, "x-y-z"), (3, "abcdefgh"), (4, None)],
        "id long, s string",
    )
    out = {r.id: r.s for r in apply_coercions(
        df, RuleSet([R.transform("s", "squish")])).collect()}
    assert out[1] == "a b c" and out[4] is None

    out = {r.id: r.s for r in apply_coercions(
        df, RuleSet([R.replace("s", "-", "_")])).collect()}
    assert out[2] == "x_y_z"

    # literal mode must NOT interpret regex metacharacters
    df2 = spark.createDataFrame([(1, "a.b")], "id long, s string")
    out = {r.id: r.s for r in apply_coercions(
        df2, RuleSet([R.replace("s", ".", "!")])).collect()}
    assert out[1] == "a!b"
    out = {r.id: r.s for r in apply_coercions(
        df2, RuleSet([R.replace("s", ".", "!", regex=True)])).collect()}
    assert out[1] == "!!!"

    out = {r.id: r.s for r in apply_coercions(
        df, RuleSet([R.truncate("s", 3)])).collect()}
    assert out[3] == "abc" and out[2] == "x-y" and out[4] is None


def test_new_coercions_feed_later_rules_and_preserve_observed(spark):
    """Sequential coercion semantics (decision 8) hold for the new kinds:
    the length CHECK sees the truncated value, observed_value the original."""
    df = spark.createDataFrame([(1, "  toolong  ")], "id long, s string")
    rs = RuleSet([
        R.transform("s", "squish"),
        R.truncate("s", 4),
        R.length("s", max=4, rule_id="s_len"),
        R.enum("s", ["tool"], rule_id="s_enum"),
    ])
    dfc = apply_coercions(df, rs)
    checks = {c.spec.rule_id: c for c in compile_checks(dfc, rs)}
    row = dfc.select(
        checks["s_len"].passes.alias("len_ok"),
        checks["s_enum"].passes.alias("enum_ok"),
        checks["s_enum"].observed.alias("obs"),
    ).collect()[0]
    assert row.len_ok and row.enum_ok
    assert row.obs == "  toolong  "  # original, pre-coercion


def test_new_coercions_config_roundtrip_and_checks_split():
    rs = RuleSet([
        R.transform("s", "squish"),
        R.replace("s", "-", "_"),
        R.truncate("s", 10),
        R.length("s", max=10),
    ])
    loaded = ruleset_from_json(ruleset_to_json(rs))
    assert loaded.fingerprint() == rs.fingerprint()
    assert [r.kind for r in loaded.coercions] == ["transform", "replace", "truncate"]
    assert [r.kind for r in loaded.checks] == ["length"]  # pure coercions never check
    with pytest.raises(ValueError, match="unsupported transform"):
        R.transform("s", "strip_html")
