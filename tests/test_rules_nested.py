"""Nested struct-path targeting and array rule kinds (items/has/array_size) —
the lyra object({...})/array().items() semantics SURVEY §1.2 deferred,
built in round 5. Pinned: rules.py "nested paths & arrays" note."""

import pytest
from pyspark.sql import functions as F

from lyra_spark import rules as R
from lyra_spark.compiler import apply_coercions, compile_checks
from lyra_spark.rules import RuleSet, ruleset_from_json, ruleset_to_json

SCHEMA = "id long, props struct<k:string,n:long,ds:string>, tags array<string>"
ROWS = [
    (1, {"k": "a", "n": 5, "ds": "2024-01-02"}, ["x", "y"]),
    (2, {"k": "bad", "n": -1, "ds": "notadate"}, []),
    (3, None, None),
    (4, {"k": "a", "n": 2, "ds": None}, ["x", None, "zz"]),
]


def _passes(spark, ruleset, rows=ROWS, schema=SCHEMA):
    df = spark.createDataFrame(rows, schema)
    dfc = apply_coercions(df, ruleset)
    checks = compile_checks(dfc, ruleset)
    got = dfc.select("id", *[c.passes.alias(c.spec.rule_id) for c in checks]).collect()
    return {r.id: {k: r[k] for k in r.asDict() if k != "id"} for r in got}


def test_struct_path_checks(spark):
    """Dotted columns resolve as Catalyst nested fields; a NULL struct makes
    every field NULL -> optional semantics skip (decision 2)."""
    rs = RuleSet([
        R.enum("props.k", ["a", "b"], rule_id="k_enum"),
        R.range_rule("props.n", min=0, rule_id="n_min"),
        R.cast("props.ds", "date", strict=True, rule_id="ds_date"),
    ])
    got = _passes(spark, rs)
    assert got[1] == {"k_enum": True, "n_min": True, "ds_date": True}
    assert got[2] == {"k_enum": False, "n_min": False, "ds_date": False}
    assert got[3] == {"k_enum": True, "n_min": True, "ds_date": True}  # NULL struct skips
    assert got[4] == {"k_enum": True, "n_min": True, "ds_date": True}  # NULL field skips


def test_struct_path_observed_value_is_the_field(spark):
    rs = RuleSet([R.enum("props.k", ["a"], rule_id="k_enum")])
    df = spark.createDataFrame(ROWS, SCHEMA)
    checks = compile_checks(apply_coercions(df, rs), rs)
    [c] = checks
    got = {r.id: r.obs for r in df.select("id", c.observed.alias("obs")).collect()}
    assert got[2] == "bad" and got[3] is None


def test_nested_coercions_raise_except_strict_cast(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    with pytest.raises(ValueError, match="top-level-only"):
        apply_coercions(df, RuleSet([R.transform("props.k", "lower")]))
    with pytest.raises(ValueError, match="top-level-only"):
        apply_coercions(df, RuleSet([R.cast("props.ds", "date")]))  # convert mode rewrites
    # strict cast never rewrites -> allowed, and the df is untouched
    out = apply_coercions(df, RuleSet([R.cast("props.ds", "date", strict=True)]))
    assert out.columns == df.columns


def test_items_forall_semantics(spark):
    """NULL array passes; empty passes (vacuous); NULL elements pass content
    kinds and fail only items(required)."""
    rs = RuleSet([
        R.items("tags", R.length("tags", max=1), rule_id="len1"),
        R.items("tags", R.required("tags"), rule_id="no_null_elems"),
        R.items("tags", R.enum("tags", ["x", "y", "zz"]), rule_id="all_known"),
    ])
    got = _passes(spark, rs)
    assert got[1] == {"len1": True, "no_null_elems": True, "all_known": True}
    assert got[2] == {"len1": True, "no_null_elems": True, "all_known": True}  # empty: vacuous
    assert got[3] == {"len1": True, "no_null_elems": True, "all_known": True}  # NULL array
    assert got[4] == {"len1": False, "no_null_elems": False, "all_known": True}


def test_has_exists_semantics(spark):
    """At least one NON-NULL witness; empty array fails; NULL array passes."""
    rs = RuleSet([R.has("tags", R.enum("tags", ["x"]), rule_id="has_x")])
    got = _passes(spark, rs)
    assert got[1]["has_x"] is True
    assert got[2]["has_x"] is False  # empty: no witness
    assert got[3]["has_x"] is True   # NULL array: optional
    assert got[4]["has_x"] is True
    # a NULL element is never a witness even though content kinds skip NULLs
    rs2 = RuleSet([R.has("tags", R.length("tags", min=0), rule_id="has_any")])
    got2 = _passes(spark, rs2, rows=[(1, None, [None, None])], schema=SCHEMA)
    assert got2[1]["has_any"] is False


def test_array_size_bounds(spark):
    rs = RuleSet([R.array_size("tags", min=1, max=2, rule_id="sz")])
    got = _passes(spark, rs)
    assert {i: got[i]["sz"] for i in (1, 2, 3, 4)} == {1: True, 2: False, 3: True, 4: False}
    with pytest.raises(ValueError, match="min and/or max"):
        R.array_size("tags")


def test_element_rule_validation():
    with pytest.raises(ValueError, match="not allowed"):
        R.items("tags", R.compare("tags", "==", "other"))
    with pytest.raises(ValueError, match="targets"):
        R.items("tags", R.length("not_tags", max=1))
    with pytest.raises(ValueError, match="gate the items"):
        R.items("tags", R.conditional(R.length("tags", max=1), ("id", "==", 1)))


def test_items_has_config_roundtrip_fingerprint_parity():
    """Config-loaded items/has/array_size/nested-path rules fingerprint
    identically to code-built ones (checkpoint stability when a ruleset
    moves from code to config)."""
    code = RuleSet([
        R.enum("props.k", ["a", "b"], rule_id="k_enum"),
        R.items("tags", R.length("tags", max=4), rule_id="tlen"),
        R.has("tags", R.enum("tags", ["x"]), rule_id="thas"),
        R.array_size("tags", min=1, rule_id="tsz"),
    ])
    loaded = ruleset_from_json(ruleset_to_json(code))
    assert loaded.fingerprint() == code.fingerprint()
    assert [r.kind for r in loaded] == ["enum", "items", "has", "array_size"]


def test_items_config_rejects_bad_item():
    with pytest.raises(ValueError, match="item"):
        ruleset_from_json('[{"kind": "items", "column": "tags"}]')
    with pytest.raises(ValueError, match="unknown parameter"):
        ruleset_from_json(
            '[{"kind": "items", "column": "tags", "item": {"kind": "length", "maxx": 3}}]'
        )


def test_array_rules_stay_single_pass(spark):
    """items/has/array_size compile into the same one-projection plan as
    every other rule family: no explode, no shuffle, no Python."""
    rs = RuleSet([
        R.items("tags", R.length("tags", max=3), rule_id="a"),
        R.has("tags", R.enum("tags", ["x"]), rule_id="b"),
        R.array_size("tags", min=0, rule_id="c"),
    ])
    df = spark.createDataFrame(ROWS, SCHEMA)
    checks = compile_checks(df, rs)
    out = df.select(*[c.passes.alias(c.spec.rule_id) for c in checks])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Generate" not in plan  # no explode
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        arrays=st.lists(
            st.one_of(
                st.none(),
                st.lists(st.one_of(st.none(), st.sampled_from(["a", "bb", "ccc", "dddd"])),
                         min_size=0, max_size=5),
            ),
            min_size=1, max_size=12,
        ),
        max_len=st.sampled_from([1, 2, 3]),
    )
    def test_items_has_size_match_python_reference(spark, arrays, max_len):
        """items/has/array_size agree with a direct Python evaluation of the
        pinned semantics on arbitrary arrays (NULL arrays, empty arrays,
        NULL elements, mixed lengths)."""
        rows = list(enumerate(arrays))
        rs = RuleSet([
            R.items("tags", R.length("tags", max=max_len), rule_id="it"),
            R.items("tags", R.required("tags"), rule_id="req"),
            R.has("tags", R.length("tags", max=max_len), rule_id="hs"),
            R.array_size("tags", min=1, max=3, rule_id="sz"),
        ])
        got = _passes(spark, rs, rows=rows, schema="id long, tags array<string>")
        for i, arr in rows:
            if arr is None:
                exp = {"it": True, "req": True, "hs": True, "sz": True}
            else:
                exp = {
                    # NULL elements pass content kinds...
                    "it": all(x is None or len(x) <= max_len for x in arr),
                    # ...and fail only items(required)
                    "req": all(x is not None for x in arr),
                    # has needs a NON-NULL witness; empty array fails
                    "hs": any(x is not None and len(x) <= max_len for x in arr),
                    "sz": 1 <= len(arr) <= 3,
                }
            assert got[i] == exp, (i, arr, got[i], exp)
