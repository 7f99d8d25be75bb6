"""Unit tests for the `format` and `compare` rule kinds (lyra string format
validators and Joi.ref cross-field comparisons) — SURVEY.md §5.3 style: tiny
frames, NULL/edge cases, config round-trip fingerprint parity."""

import pytest

from lyra_spark import rules as R
from lyra_spark.engine import row_violations
from lyra_spark.rules import RuleSet, ruleset_from_json, ruleset_to_json


def run(spark, rows, schema, ruleset):
    df = spark.createDataFrame(rows, schema)
    v = row_violations(df, ruleset, key_cols=["id"], partition_col=None)
    return {(r.id, r.rule_id, r.observed_value) for r in v.collect()}


def failing_ids(spark, rows, schema, ruleset):
    return {i for (i, _, _) in run(spark, rows, schema, ruleset)}


# --- format ---------------------------------------------------------------
def test_format_email(spark):
    got = failing_ids(
        spark,
        [
            (1, "a.b+tag@example.com"),
            (2, "noat.example.com"),
            (3, None),  # NULL skips
            (4, "x@y"),  # TLD-less: the HTML5 pattern here requires a dot
            (5, "x@sub.domain.org"),
            (6, "spaces in@example.com"),
        ],
        "id int, v string",
        RuleSet([R.format_rule("v", "email")]),
    )
    assert got == {2, 4, 6}


def test_format_uuid_ipv4_uri(spark):
    rs = RuleSet(
        [
            R.format_rule("u", "uuid", rule_id="uuid"),
            R.format_rule("ip", "ipv4", rule_id="ip"),
            R.format_rule("url", "uri", rule_id="uri"),
        ]
    )
    got = run(
        spark,
        [
            (1, "123e4567-e89b-12d3-a456-426614174000", "192.168.0.1", "https://x.org/a?b=1"),
            (2, "123e4567e89b12d3a456426614174000", "300.1.1.1", "htp//broken"),
            (3, None, None, None),
            (4, "123E4567-E89B-12D3-A456-426614174000", "0.0.0.0", "ftp://host/file"),
            (5, "123e4567-e89b-12d3-a456-42661417400", "1.2.3", "mailto:a@b.com"),
        ],
        "id int, u string, ip string, url string",
        rs,
    )
    assert {(i, r) for (i, r, _) in got} == {
        (2, "uuid"),
        (2, "ip"),
        (2, "uri"),
        (5, "uuid"),  # 11-char last group
        (5, "ip"),  # only 3 octets
        (5, "uri"),  # mailto: has no ://  (pinned: uri = scheme://non-space)
    }


def test_format_hostname_and_iso(spark):
    rs = RuleSet(
        [
            R.format_rule("h", "hostname", rule_id="host"),
            R.format_rule("d", "iso_date", rule_id="date"),
            R.format_rule("t", "iso_timestamp", rule_id="ts"),
        ]
    )
    got = run(
        spark,
        [
            (1, "sub-1.example.com", "2024-01-31", "2024-01-31T23:59:59Z"),
            (2, "-bad.example.com", "2024/01/31", "2024-01-31 23:59:59.123456+02:00"),
            (3, "example", "2024-02-31", "2024-01-31T23:59"),
        ],
        "id int, h string, d string, t string",
        rs,
    )
    keys = {(i, r) for (i, r, _) in got}
    # 2024-02-31 is SYNTACTICALLY valid (pinned: format checks are syntactic;
    # calendar validity is cast("date")'s job); row 2's space-separated
    # timestamp with fraction+offset is valid ISO-ish per the pinned regex
    assert keys == {(2, "host"), (2, "date"), (3, "ts")}


def test_format_unknown_name_raises():
    with pytest.raises(ValueError, match="unknown format"):
        R.format_rule("v", "phone")


def test_full_match_rejects_trailing_newline(spark):
    # Java's $ matches BEFORE a trailing newline — the compiler must anchor
    # with \A..\z so 'x\n' is a violation, byte-agreeing with an RE2 oracle
    # whose un-flagged $ is end-of-text
    rs = RuleSet(
        [
            R.format_rule("e", "email", rule_id="efmt"),
            R.pattern("p", "[a-z]+", rule_id="pfull"),
        ]
    )
    got = run(
        spark,
        [(1, "a@example.com", "abc"), (2, "a@example.com\n", "abc\n")],
        "id int, e string, p string",
        rs,
    )
    assert {(i, r) for (i, r, _) in got} == {(2, "efmt"), (2, "pfull")}


# --- compare ----------------------------------------------------------------
def test_compare_ops_and_null_skip(spark):
    rs = RuleSet(
        [
            R.compare("lo", "<=", "hi", rule_id="lo_le_hi"),
            R.compare("a", "==", "b", rule_id="a_eq_b"),
        ]
    )
    got = run(
        spark,
        [
            (1, 1.0, 2.0, "x", "x"),
            (2, 3.0, 2.0, "x", "y"),  # both rules fail
            (3, None, 2.0, None, "y"),  # NULL left side skips both
            (4, 1.0, None, "x", None),  # NULL right side skips both
        ],
        "id int, lo double, hi double, a string, b string",
        rs,
    )
    assert got == {(2, "lo_le_hi", "3.0"), (2, "a_eq_b", "x")}


def test_compare_sees_coerced_values(spark):
    # cast coercion rewrites BOTH operands before the comparison (pinned:
    # compare runs post-coercion) — as raw strings "9" > "10" lexically,
    # as ints 9 < 10
    rs = RuleSet(
        [
            R.cast("lo", "int", rule_id="lo_cast"),
            R.cast("hi", "int", rule_id="hi_cast"),
            R.compare("lo", ">", "hi", rule_id="lo_gt_hi"),
        ]
    )
    got = run(spark, [(1, "9", "10")], "id int, lo string, hi string", rs)
    assert got == {(1, "lo_gt_hi", "9")}


def test_compare_unknown_op_raises():
    with pytest.raises(ValueError, match="unknown compare op"):
        R.compare("a", "<>", "b")


# --- config round-trip -------------------------------------------------------
def test_format_compare_config_roundtrip_fingerprint(spark):
    rs = RuleSet(
        [
            R.format_rule("email", "email", rule_id="email_fmt"),
            R.compare("lo", "<=", "hi", rule_id="bounds", when=("role", "==", "user")),
        ]
    )
    rs2 = ruleset_from_json(ruleset_to_json(rs))
    assert rs2.fingerprint() == rs.fingerprint()
    # and the config path rejects typo'd params like every other kind
    with pytest.raises(ValueError, match="unknown parameter"):
        ruleset_from_json('[{"kind": "format", "column": "v", "regex": "x"}]')
    with pytest.raises(ValueError, match="unknown format"):
        ruleset_from_json('[{"kind": "format", "column": "v", "name": "phone"}]')
