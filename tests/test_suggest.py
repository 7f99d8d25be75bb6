"""Rule suggestion (lyra_spark.suggest): observed-invariant proposals.

Properties pinned here:
  * exact-mode suggestions on a hand-built frame match the hand-derived set;
  * the suggested ruleset validates its own profiled table with ZERO
    violations (suggestions are observed invariants — the module contract);
  * enum lists are bounded: a high-cardinality column yields no enum and the
    enum pass never builds a list longer than enum_max_card;
  * empty tables and all-null columns suggest nothing (no degenerate rules).
"""

import datetime

import pytest
from pyspark.sql import functions as F

from lyra_spark.engine import row_violations
from lyra_spark.suggest import ruleset_from_suggestions, suggest_rules


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, "a", 10.0, "red", datetime.datetime(2024, 1, 1)),
        (2, "bb", 20.5, "blue", datetime.datetime(2024, 1, 2)),
        (3, "ccc", -1.0, "red", datetime.datetime(2024, 1, 3)),
        (4, None, 7.25, "blue", datetime.datetime(2024, 1, 4)),
    ]
    return spark.createDataFrame(
        rows, "id bigint, name string, score double, color string, ts timestamp"
    )


def test_exact_suggestions_match_hand_derived(frame):
    out = suggest_rules(frame, distinct_mode="exact").collect()
    got = {(r["column"], r["kind"]) for r in out}
    assert got == {
        ("id", "required"), ("id", "unique"), ("id", "range"),
        ("name", "length"), ("name", "enum"),
        ("score", "required"), ("score", "unique"), ("score", "range"),
        ("color", "required"), ("color", "length"), ("color", "enum"),
        ("ts", "required"), ("ts", "unique"), ("ts", "range"),
    }
    by = {(r["column"], r["kind"]): r for r in out}
    assert by[("score", "range")]["lo_num"] == -1.0
    assert by[("score", "range")]["hi_num"] == 20.5
    assert by[("ts", "range")]["lo_str"] == "2024-01-01 00:00:00"
    assert by[("ts", "range")]["hi_str"] == "2024-01-04 00:00:00"
    assert by[("name", "length")]["len_lo"] == 1
    assert by[("name", "length")]["len_hi"] == 3
    assert by[("color", "enum")]["vals"] == "blue|red"
    # name has a NULL: no required/unique despite distinct values
    assert ("name", "required") not in got and ("name", "unique") not in got


def test_suggested_ruleset_validates_cleanly(frame):
    sugg = suggest_rules(frame, distinct_mode="exact")
    ruleset, checks = ruleset_from_suggestions(sugg, int_columns={"id"})
    assert {"check": "uniqueness", "key": ["id"]} in checks
    viol = row_violations(frame, ruleset, key_cols=["id"], partition_col=None)
    assert viol.count() == 0


def test_suggested_ruleset_catches_new_violations(frame, spark):
    ruleset, _ = ruleset_from_suggestions(
        suggest_rules(frame, distinct_mode="exact"), int_columns={"id"}
    )
    bad = spark.createDataFrame(
        [(9, "toolongname", 999.0, "green", None)],
        "id bigint, name string, score double, color string, ts timestamp",
    )
    got = {
        (r["rule_id"])
        for r in row_violations(bad, ruleset, key_cols=["id"], partition_col=None).collect()
    }
    assert "suggested_length_name" in got      # 11 chars > observed max 3
    assert "suggested_range_score" in got      # 999 > observed max 20.5
    assert "suggested_enum_color" in got       # green not in {blue, red}
    assert "suggested_required_ts" in got      # NULL where profile saw none


def test_high_cardinality_column_gets_no_enum(spark):
    df = spark.range(200).select(F.concat(F.lit("v"), F.col("id")).alias("v"))
    kinds = {r["kind"] for r in suggest_rules(df, distinct_mode="exact").collect() if r["column"] == "v"}
    assert "enum" not in kinds
    assert "length" in kinds


def test_empty_and_all_null_suggest_nothing(spark):
    empty = spark.createDataFrame([], "a string, b double")
    assert suggest_rules(empty, distinct_mode="exact").count() == 0
    nulls = spark.createDataFrame([(None, None)], "a string, b double")
    assert suggest_rules(nulls, distinct_mode="exact").count() == 0


def test_approx_mode_runs_and_agrees_on_kinds(frame):
    exact = {(r["column"], r["kind"]) for r in suggest_rules(frame, distinct_mode="exact").collect()}
    approx = {(r["column"], r["kind"]) for r in suggest_rules(frame).collect()}
    # at 4 rows the HLL estimate is exact, so kinds agree
    assert approx == exact


def test_metric_rules_from_suggestions_self_validate(spark, frame):
    """The metric-rule dual: suggested aggregate gates hold on the profiled
    table by construction (zero failures in exact mode), and a drifted table
    fails the right gates."""
    from lyra_spark.metrics import evaluate_metric_rules
    from lyra_spark.suggest import metric_rules_from_suggestions

    sugg = suggest_rules(frame, distinct_mode="exact").collect()
    mrules = metric_rules_from_suggestions(sugg)
    by_id = {r.rule_id: r for r in mrules}
    # required -> completeness, unique -> uniqueness, numeric range -> min+max,
    # enum -> cardinality; temporal range and length have no aggregate dual
    assert by_id["suggested_completeness_id"].metric == "completeness"
    assert by_id["suggested_uniqueness_score"].metric == "uniqueness"
    assert by_id["suggested_min_score"].min == -1.0
    assert by_id["suggested_max_score"].max == 20.5
    assert by_id["suggested_card_color"].max == 2.0
    assert "suggested_min_ts" not in by_id

    mv = evaluate_metric_rules(frame, mrules, partition_col=None)
    assert all(r["pass"] for r in mv.collect())

    drifted = frame.unionByName(
        spark.createDataFrame(
            [(1, "dd", 999.0, "green", None)],
            "id bigint, name string, score double, color string, ts timestamp",
        )
    )
    mv2 = {r["rule_id"]: r["pass"] for r in evaluate_metric_rules(drifted, mrules, partition_col=None).collect()}
    assert mv2["suggested_max_score"] is False      # 999 above observed max
    assert mv2["suggested_card_color"] is False     # green is a 3rd value
    assert mv2["suggested_uniqueness_id"] is False  # duplicate id 1
    assert mv2["suggested_min_score"] is True


def test_metric_rules_slack_widens_bounds(frame):
    from lyra_spark.suggest import metric_rules_from_suggestions

    sugg = suggest_rules(frame, distinct_mode="exact").collect()
    mrules = {r.rule_id: r for r in metric_rules_from_suggestions(sugg, slack=0.1)}
    span = 20.5 - (-1.0)
    assert mrules["suggested_min_score"].min == -1.0 - 0.1 * span
    assert mrules["suggested_max_score"].max == 20.5 + 0.1 * span


def test_metric_rules_approx_profile_skips_uniqueness(frame):
    """An approx (HLL) profile must not harden 'unique' into an exact
    uniqueness(1.0) gate — the distinct estimate is rsd-accurate but the
    exactly-once fraction can sit far below 1.0 with a few dup values."""
    from lyra_spark.suggest import metric_rules_from_suggestions

    sugg = suggest_rules(frame, distinct_mode="exact").collect()
    exact_rules = {r.rule_id for r in metric_rules_from_suggestions(sugg, exact=True)}
    approx_rules = {r.rule_id for r in metric_rules_from_suggestions(sugg, exact=False)}
    assert any(r.startswith("suggested_uniqueness_") for r in exact_rules)
    assert not any(r.startswith("suggested_uniqueness_") for r in approx_rules)
    assert approx_rules < exact_rules  # everything else unchanged


def test_json_keys_suggestion_proposed_and_self_validates(spark):
    """A string column whose every non-NULL value is a JSON object gets a
    json_unknown_keys proposal over the observed key union; a column with
    one non-object value does NOT qualify; and the proposed rule validates
    the profiled frame with zero violations (the self-validation contract)."""
    from lyra_spark.engine import row_violations
    from lyra_spark.suggest import ruleset_from_suggestions, suggest_rules

    rows = [
        (1, '{"k": 1}', '{"a": 1}'),
        (2, '{"k": 2, "v": "x"}', "not json"),
        (3, None, '{"a": 2}'),
    ]
    df = spark.createDataFrame(rows, "id long, props string, mixed string")
    sugg = suggest_rules(df, ["props", "mixed"], distinct_mode="exact").collect()
    kinds = {(r["column"], r["kind"]) for r in sugg}
    assert ("props", "json_keys") in kinds
    assert ("mixed", "json_keys") not in kinds  # one non-object disqualifies
    jrow = next(r for r in sugg if r["column"] == "props" and r["kind"] == "json_keys")
    assert jrow["vals"] == "k|v"  # sorted key union

    rs, _ = ruleset_from_suggestions(sugg)
    jrule = next(r for r in rs if r.kind == "json_unknown_keys")
    assert jrule.p["allowed"] == ("k", "v")
    viol = row_violations(df, type(rs)([jrule]), key_cols=["id"], partition_col=None)
    assert viol.count() == 0  # zero violations on the profiled table


def test_json_keys_suggestion_respects_cardinality_cap(spark):
    """An id-keyed map column (every row a different key) must not propose an
    unbounded key enum — the enum_max_card cap applies to keys too."""
    from lyra_spark.suggest import suggest_rules

    rows = [(i, '{"key%04d": 1}' % i) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, m string")
    sugg = suggest_rules(df, ["m"], enum_max_card=20, distinct_mode="exact").collect()
    assert not any(r["kind"] == "json_keys" for r in sugg)
