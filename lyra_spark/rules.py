"""Declarative rule DSL — the engine's equivalent of lyra's schema-builder AST.

lyra (recalled public API; reference checkout empty — see SURVEY.md §0) builds
schemas as chained rule objects: ``lyra.string().required().pattern(...)``,
``lyra.number().min(0)``, ``lyra.any().valid(...)``. Here each rule is a
``RuleSpec`` dataclass; a ``RuleSet`` is the ordered schema. Compilation to
Catalyst Column expressions happens in lyra_spark/compiler.py — specs stay
engine-agnostic and hashable (rule versioning feeds checkpoint invalidation,
BASELINE.json:6,14).

Pinned semantics (SEMANTICS.md):
  * ``required`` fails on NULL only; empty string is a separate ``nonempty`` rule.
  * Every non-required check SKIPS nulls (lyra optional semantics).
  * ``pattern`` is a FULL match by default (lyra/Joi anchor by default).
  * ``cast`` in convert mode coerces via try_cast — un-castable ⇒ violation, not
    exception; downstream rules see the coerced column. strict mode ⇒ no
    coercion, any value that would need one is a violation.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

# Condition for conditional rules: (column, op, value) with op ∈ {==,!=,in,notin,isnull,notnull}
Cond = tuple[str, str, Any]


@dataclass(frozen=True)
class RuleSpec:
    # `severity` ("error" default / "warn"): round-tripped through config,
    # excluded from the fingerprint. Wired through the verdict grid —
    # engine.partition_pass gates a partition on error-severity rules only;
    # warn rules report (violation rows + counts) but never fail it.
    # `tolerance` (0.0 default): max allowed violation FRACTION per partition
    # before the rule's verdict fails — Deequ `hasCompleteness(_ >= 1-t)` /
    # Great Expectations `mostly`. Like severity it is gating metadata, not
    # predicate semantics: violations still report row-level, and it is
    # excluded from the fingerprint so tuning a threshold never invalidates
    # a resumable run's checkpoint.
    # `message` (None default): lyra .messages()/.label() parity — a human
    # template rendered into the optional `message` violation column.
    # {column}/{rule_id}/{<param>} interpolate at COMPILE time, {value} at
    # RUNTIME (the observed value). Presentation metadata like severity:
    # excluded from the fingerprint, so wording changes never invalidate
    # checkpoints.
    rule_id: str
    kind: str
    column: str
    params: tuple[tuple[str, Any], ...] = ()
    when: Cond | None = None
    severity: str = "error"
    version: str = "1"
    tolerance: float = 0.0
    message: str | None = None

    @property
    def p(self) -> dict[str, Any]:
        return dict(self.params)

    def fingerprint(self) -> str:
        blob = json.dumps(
            [self.rule_id, self.kind, self.column, self.params, self.when, self.version],
            sort_keys=True,
            default=str,
        )
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def _mk(kind: str, column: str, rule_id: str | None = None, when: Cond | None = None, **params: Any) -> RuleSpec:
    rid = rule_id or f"{column}_{kind}"
    items = tuple(sorted((k, v if not isinstance(v, list) else tuple(v)) for k, v in params.items() if v is not None))
    return RuleSpec(rule_id=rid, kind=kind, column=column, params=items, when=when)


# --- presence -----------------------------------------------------------------
def required(column: str, rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra .required(): NULL ⇒ violation."""
    return _mk("required", column, rule_id, when)


def nonempty(column: str, rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """Empty string ⇒ violation (null passes — pair with required)."""
    return _mk("nonempty", column, rule_id, when)


def forbidden(column: str, rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra .forbidden(): any non-NULL value ⇒ violation."""
    return _mk("forbidden", column, rule_id, when)


# --- membership ---------------------------------------------------------------
def enum(column: str, values: Sequence[str], rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra .valid(...): value ∉ allowed set ⇒ violation."""
    return _mk("enum", column, rule_id, when, values=list(values))


def deny(column: str, values: Sequence[str], rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra .invalid(...): value ∈ denied set ⇒ violation."""
    return _mk("deny", column, rule_id, when, values=list(values))


# --- string -------------------------------------------------------------------
# Named string formats (lyra/Joi .email()/.guid()/.uri()/.ip()/.hostname()/
# .isoDate()), compiled to ANCHORED regexes. Patterns are standard public
# forms (HTML5/WHATWG email, RFC 4122 UUID, RFC 1123 hostname labels,
# RFC 3986 scheme) kept inside the Java-regex ∩ RE2 common subset (no
# backrefs, no lookaround) so the engine (Spark rlike) and any RE2-based
# oracle (DuckDB regexp_matches) agree byte-for-byte. Pinned semantics
# (SEMANTICS.md): these are SYNTACTIC checks — `iso_date` accepts 2024-02-31
# (pair with cast("date") for calendar validity); `hostname` skips the
# 253-char total-length cap (needs lookahead — pair with a length rule);
# `uri` means scheme://non-space (web-style absolute URI, not mailto:).
FORMAT_REGEX: dict[str, str] = {
    "email": (
        r"[A-Za-z0-9.!#$%&'*+/=?^_`{|}~-]+@[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
        r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)+"
    ),
    "uuid": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
    "ipv4": (
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
        r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}"
    ),
    "hostname": (
        r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
        r"(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?)*"
    ),
    "uri": r"[A-Za-z][A-Za-z0-9+.-]*://[^\s]+",
    "iso_date": r"\d{4}-\d{2}-\d{2}",
    "iso_timestamp": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d{1,6})?(?:Z|[+-]\d{2}:\d{2})?",
}


def format_rule(
    column: str,
    name: str,
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra string format validators (.email()/.guid()/.uri()/.ip()...) as one
    parameterized kind: value must FULLY match the named format's regex."""
    if name not in FORMAT_REGEX:
        raise ValueError(f"unknown format {name!r} (known: {sorted(FORMAT_REGEX)})")
    return _mk("format", column, rule_id, when, name=name)


COMPARE_OPS = ("==", "!=", "<", "<=", ">", ">=")


def compare(
    column: str,
    op: str,
    other: str,
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra cross-field references (Joi.ref): ``column <op> other_column``
    must hold within the row. Pinned semantics (SEMANTICS.md): the check
    SKIPS when EITHER side is NULL (optional semantics on both operands —
    presence is `required`'s job), and both sides are compared post-coercion
    with Spark's native type comparison (no implicit cross-family casts)."""
    if op not in COMPARE_OPS:
        raise ValueError(f"unknown compare op {op!r} (known: {COMPARE_OPS})")
    return _mk("compare", column, rule_id, when, op=op, other=other)


def pattern(
    column: str,
    regex: str,
    full: bool = True,
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra .pattern(re). Java regex dialect (Spark rlike); full match by default."""
    return _mk("pattern", column, rule_id, when, regex=regex, full=full)


def length(
    column: str,
    min: int | None = None,
    max: int | None = None,
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra string .min/.max/.length — char-length bounds, inclusive."""
    if min is None and max is None:
        raise ValueError("length needs min and/or max — bound-less it checks nothing")
    return _mk("length", column, rule_id, when, min=min, max=max)


# --- numeric / temporal -------------------------------------------------------
def range_rule(
    column: str,
    min: Any = None,
    max: Any = None,
    strict_min: bool = False,
    strict_max: bool = False,
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra .min/.max/.greater/.less for numbers, timestamps, dates."""
    if min is None and max is None:
        raise ValueError("range needs min and/or max — bound-less it checks nothing")
    return _mk(
        "range", column, rule_id, when, min=min, max=max, strict_min=strict_min or None, strict_max=strict_max or None
    )


def integer(column: str, rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra number .integer(): fractional part ⇒ violation."""
    return _mk("integer", column, rule_id, when)


def multiple_of(column: str, k: int, rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra number .multiple(k)."""
    return _mk("multiple_of", column, rule_id, when, k=k)


# --- coercions (rewrite the value before later rules; lyra convert mode) -------
def cast(
    column: str,
    to: str,
    strict: bool = False,
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """Type coercion. convert (default): try_cast, un-castable non-null ⇒
    violation and downstream rules see the coerced column. strict: SAME
    castability predicate, but NO rewrite — downstream rules see the raw
    value (a castable-but-non-canonical value like '012' passes; rejecting
    non-canonical forms needs a pattern rule on top)."""
    return _mk("cast", column, rule_id, when, to=to, strict=strict or None)


def default(column: str, value: Any, rule_id: str | None = None) -> RuleSpec:
    """lyra .default(v): NULL replaced before later rules. Never violates."""
    if value is None:
        # _mk drops None params, which would build a spec missing 'value'
        # and crash the compiler with a bare KeyError mid-pipeline
        raise ValueError("default(None) is meaningless — the column is already NULL")
    return _mk("default", column, rule_id, value=value)


def transform(column: str, fn: str, rule_id: str | None = None) -> RuleSpec:
    """String coercion: fn ∈ {trim, lower, upper, squish}. Never violates.
    ``squish`` = trim + collapse every internal whitespace run to one space
    (the normalization lyra users chain by hand; also what conv-dedup's
    content hash applies)."""
    if fn not in ("trim", "lower", "upper", "squish"):
        raise ValueError(f"unsupported transform {fn!r}")
    return _mk("transform", column, rule_id, fn=fn)


def replace(
    column: str,
    search: str,
    replacement: str,
    regex: bool = False,
    rule_id: str | None = None,
) -> RuleSpec:
    """String coercion: substitute every occurrence of ``search`` (a literal,
    or a Java-regex when ``regex=True``) with ``replacement``. Never
    violates — lyra .replace() parity; downstream rules see the rewritten
    value, observed_value still reports the original (decision 7)."""
    return _mk("replace", column, rule_id, search=search, replacement=replacement,
               regex=bool(regex) or None)


def truncate(column: str, max_len: int, rule_id: str | None = None) -> RuleSpec:
    """String coercion: hard-cap the value at ``max_len`` characters (lyra
    .truncate() — the coercing sibling of the `length` CHECK). Never
    violates."""
    if int(max_len) < 0:
        raise ValueError("max_len must be >= 0")
    return _mk("truncate", column, rule_id, max_len=int(max_len))


# --- nested paths & arrays ----------------------------------------------------
# lyra object({...}) / array().items(...) semantics (SURVEY §1.2's deferred
# generalization hook, built in round 5):
#   * STRUCT PATHS: every CHECK kind accepts a dotted column ("props.k.v") —
#     Catalyst resolves nested fields natively, so a dotted target costs the
#     same single-pass codegen'd expression as a top-level one. Dots always
#     mean nesting (a literal-dot top-level name needs renaming first).
#     COERCIONS stay top-level-only in v1: rewriting a struct field means a
#     withField chain whose raw-value preservation has no clean column home —
#     apply_coercions raises loudly instead of silently no-oping. A STRICT
#     cast (check-only, never rewrites) is allowed on nested paths.
#   * ARRAYS: ``items(col, rule)`` = every element satisfies the element rule
#     (F.forall — one codegen'd expression, no explode, no shuffle);
#     ``has(col, rule)`` = at least one NON-NULL element satisfies it
#     (F.exists); ``array_size(col, min, max)`` bounds F.size. NULL array
#     passes all three (optional semantics, decision 2); an EMPTY array
#     passes items (vacuous ∀) and array_size(min=0) but FAILS has (∃ over
#     nothing) — Joi's rule. NULL ELEMENTS inside items keep element-level
#     optional semantics: they pass every content kind and fail only the
#     ``required`` element rule (items(required) = "no NULL elements").
_ITEM_SUBKINDS = {
    "required", "nonempty", "enum", "deny", "pattern", "format",
    "length", "range", "integer", "multiple_of",
}


def _validate_element_rule(outer: str, column: str, item: "RuleSpec") -> None:
    if not isinstance(item, RuleSpec) or item.kind not in _ITEM_SUBKINDS:
        kind = getattr(item, "kind", item)
        raise ValueError(
            f"{outer}: element rule kind {kind!r} not allowed "
            f"(allowed: {sorted(_ITEM_SUBKINDS)}) — compare needs a row scope, "
            "custom cannot run inside a lambda, cast coercion is ambiguous per-element"
        )
    if item.column != column:
        raise ValueError(f"{outer}: element rule targets {item.column!r}, not {column!r}")
    if item.when is not None:
        raise ValueError(f"{outer}: element rules cannot carry their own 'when' — gate the {outer}")


def items(column: str, item: "RuleSpec", rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra/Joi ``array().items(rule)``: EVERY element of the array column
    satisfies the element rule. Compiles to ``F.forall`` — a single
    codegen'd expression, no explode, no shuffle. NULL array passes; empty
    array passes (vacuous); NULL elements pass content kinds and fail only
    an ``items(required(...))`` element rule."""
    _validate_element_rule("items", column, item)
    return _mk("items", column, rule_id, when, item=(item.kind, item.params))


def has(column: str, item: "RuleSpec", rule_id: str | None = None, when: Cond | None = None) -> RuleSpec:
    """lyra/Joi ``array().has(rule)``: AT LEAST ONE non-NULL element
    satisfies the element rule (``F.exists``). NULL array passes (optional
    semantics); an EMPTY array FAILS — there is no witness."""
    _validate_element_rule("has", column, item)
    return _mk("has", column, rule_id, when, item=(item.kind, item.params))


def array_size(
    column: str,
    min: int | None = None,  # noqa: A002 - mirrors length()'s public names
    max: int | None = None,  # noqa: A002
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra/Joi ``array().min()/.max()/.length()``: bounds on F.size.
    NULL array passes (pair with required)."""
    if min is None and max is None:
        raise ValueError("array_size needs min and/or max")
    return _mk("array_size", column, rule_id, when, min=min, max=max)


def json_unknown_keys(
    column: str, allowed: Sequence[str], rule_id: str | None = None, when: Cond | None = None
) -> RuleSpec:
    """lyra ``object({...}).unknown(false)`` for a JSON-object STRING column
    (the transcript `props`-payload shape): any TOP-LEVEL key outside
    ``allowed`` is a violation. Invalid JSON or a non-object value also
    violates — the expectation "this is an object with known keys" is broken
    either way (pair with required-key checks via derived `get_json_object`
    columns or `from_json` + dotted-path rules). NULL passes (optional
    semantics, decision 2). Compiles to ``json_object_keys`` + ``F.forall``
    — one codegen'd expression, no Python, no shuffle."""
    return _mk("json_unknown_keys", column, rule_id, when, allowed=list(allowed))


# --- conditional & custom -----------------------------------------------------
_ANY_OF_SUBKINDS = {
    "nonempty", "enum", "deny", "pattern", "format", "length",
    "range", "integer", "multiple_of", "compare",
}


def any_of(
    column: str,
    alternatives: Sequence[RuleSpec],
    rule_id: str | None = None,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra/Joi ``alternatives().try()``: the value passes when ANY listed
    CONTENT check accepts it ("an ISO date OR a unix epoch", "uuid OR
    legacy id pattern"). Alternatives are same-column content kinds only:
    presence (required/forbidden) is its own rule, not an alternative;
    custom (a UDF branch inside an OR hides cost) and cast (raw-vs-coerced
    target ambiguity) are excluded; sub-rules carry no own ``when`` — gate
    the any_of itself. NULL passes (optional semantics, like every
    non-required kind). Compiles to a single OR of the alternatives'
    predicates — still one codegen'd expression, zero extra passes."""
    alts = list(alternatives)
    if len(alts) < 2:
        raise ValueError("any_of needs at least two alternatives")
    packed = []
    for a in alts:
        if not isinstance(a, RuleSpec) or a.kind not in _ANY_OF_SUBKINDS:
            kind = getattr(a, "kind", a)
            raise ValueError(
                f"any_of: alternative kind {kind!r} not allowed "
                f"(allowed: {sorted(_ANY_OF_SUBKINDS)})"
            )
        if a.column != column:
            raise ValueError(f"any_of: alternative targets {a.column!r}, not {column!r}")
        if a.when is not None:
            raise ValueError("any_of: alternatives cannot carry their own 'when' — gate the any_of")
        packed.append((a.kind, a.params))
    return _mk("any_of", column, rule_id, when, alts=tuple(packed))


def conditional(rule: RuleSpec, when: Cond) -> RuleSpec:
    """Apply ``rule`` only where ``when`` holds (lyra when/refs)."""
    import dataclasses

    return dataclasses.replace(rule, when=when)


# lyra-style default error messages per kind ({value} renders at runtime).
DEFAULT_MESSAGES: dict[str, str] = {
    "required": '"{column}" is required',
    "forbidden": '"{column}" is not allowed',
    "nonempty": '"{column}" is not allowed to be empty',
    "enum": '"{column}" must be one of {values}',
    "deny": '"{column}" contains a denied value ({value})',
    "pattern": '"{column}" with value {value} fails to match the required pattern',
    "format": '"{column}" must be a valid {name} ({value})',
    "length": '"{column}" length is out of bounds ({value})',
    "range": '"{column}" must be within the allowed range ({value})',
    "integer": '"{column}" must be an integer ({value})',
    "multiple_of": '"{column}" must be a multiple of {k} ({value})',
    "cast": '"{column}" cannot be cast to {to} ({value})',
    "compare": '"{column}" comparison with "{other}" failed ({value})',
    "any_of": '"{column}" does not match any of the allowed alternatives ({value})',
    "items": '"{column}" has an element that fails the item rule',
    "has": '"{column}" is missing a required element',
    "array_size": '"{column}" size is out of bounds',
    "json_unknown_keys": '"{column}" has keys outside {allowed} (or is not a JSON object)',
    "custom": '"{column}" failed custom check {rule_id} ({value})',
}

_RUNTIME_TOKEN = "{value}"


def message_template(spec: RuleSpec) -> list[str]:
    """The rule's message as SEGMENTS split on the runtime ``{value}``
    token, with every COMPILE-TIME placeholder ({column}, {rule_id}, any
    rule parameter by name) interpolated WITHIN each segment. Splitting
    FIRST is load-bearing: a parameter whose interpolated value happens to
    contain the literal string '{value}' (an enum list with that member,
    say) must render as that literal, never as a second runtime splice
    point. The compiler joins the segments with the observed-value column
    (compiler.message_column)."""
    t = spec.message or DEFAULT_MESSAGES.get(spec.kind, '"{column}" failed {rule_id}')
    subs = {"column": spec.column, "rule_id": spec.rule_id}
    for k, v in spec.params:
        subs[k] = list(v) if isinstance(v, tuple) else v
    segments = []
    for seg in t.split(_RUNTIME_TOKEN):
        for k, v in subs.items():
            seg = seg.replace("{" + k + "}", str(v))
        segments.append(seg)
    return segments


def with_message(rule: RuleSpec, message: str) -> RuleSpec:
    """lyra ``.messages('...')``: attach a human error template to a rule.
    Placeholders: {column}, {rule_id}, any parameter name ({values}, {min},
    ...) — interpolated at compile time — and {value}, replaced at runtime
    by the observed value ('<NULL>' when NULL)."""
    import dataclasses

    return dataclasses.replace(rule, message=message)


# Registry of custom vectorized predicates: rule_id → pandas Series→Series[bool].
_CUSTOM_REGISTRY: dict[str, Callable] = {}


def custom(
    column: str,
    fn: Callable,
    rule_id: str,
    when: Cond | None = None,
) -> RuleSpec:
    """lyra .custom(fn) — arbitrary user predicate, ALWAYS vectorized
    (BASELINE.json:6: Arrow/pandas UDF, never per-row Python). ``fn`` maps a
    pandas Series of the column to a boolean Series (True = pass; nulls are
    skipped before fn is applied)."""
    _CUSTOM_REGISTRY[rule_id] = fn
    return _mk("custom", column, rule_id, when)


def get_custom(rule_id: str) -> Callable:
    return _CUSTOM_REGISTRY[rule_id]


# --- rule set -------------------------------------------------------------------
@dataclass
class RuleSet:
    rules: list[RuleSpec] = field(default_factory=list)

    def __post_init__(self) -> None:
        seen: set[str] = set()
        for r in self.rules:
            if r.rule_id in seen:
                raise ValueError(f"duplicate rule_id {r.rule_id!r}")
            seen.add(r.rule_id)

    def __iter__(self):
        return iter(self.rules)

    @property
    def coercions(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind in ("cast", "default", "transform", "replace", "truncate")]

    @property
    def checks(self) -> list[RuleSpec]:
        return [r for r in self.rules if r.kind not in ("default", "transform", "replace", "truncate")]

    def fingerprint(self) -> str:
        h = hashlib.sha256()
        for r in self.rules:
            h.update(r.fingerprint().encode())
        return h.hexdigest()[:16]

    def versions(self) -> dict[str, str]:
        return {r.rule_id: f"{r.version}:{r.fingerprint()}" for r in self.rules}


# --- config-file (de)serialization --------------------------------------------
def ruleset_to_json(ruleset: RuleSet, indent: int = 2) -> str:
    """Serialize a RuleSet to the JSON config format ``ruleset_from_json``
    reads. Round-trips every engine-agnostic field — including ``version``,
    which feeds the checkpoint fingerprint, so a saved-and-reloaded ruleset
    resumes the same run instead of invalidating it. ``custom`` rules
    serialize by rule_id only (the predicate is code, not config — loading
    requires it registered under the same id)."""
    out = []
    for r in ruleset.rules:
        d: dict[str, Any] = {"kind": r.kind, "column": r.column, "rule_id": r.rule_id}
        if r.kind == "any_of":
            d["alternatives"] = [
                {"kind": ak, **{pk: (list(pv) if isinstance(pv, tuple) else pv)
                                for pk, pv in dict(ap).items()}}
                for ak, ap in r.p["alts"]
            ]
        elif r.kind in ("items", "has"):
            ik, ip = r.p["item"]
            d["item"] = {"kind": ik, **{pk: (list(pv) if isinstance(pv, tuple) else pv)
                                        for pk, pv in dict(ip).items()}}
        else:
            d.update({k: (list(v) if isinstance(v, tuple) else v) for k, v in r.params})
        if r.when is not None:
            d["when"] = list(r.when)
        if r.severity != "error":
            d["severity"] = r.severity
        if r.tolerance:
            d["tolerance"] = r.tolerance
        if r.version != "1":
            d["version"] = r.version
        if r.message is not None:
            d["message"] = r.message
        out.append(d)
    return json.dumps(out, indent=indent)


_CONFIG_KINDS = {
    "required", "nonempty", "forbidden", "enum", "deny", "pattern", "length",
    "range", "integer", "multiple_of", "cast", "default", "transform", "custom",
    "replace", "truncate",
    "format", "compare", "any_of", "items", "has", "array_size",
    "json_unknown_keys",
}
_META_KEYS = {"kind", "column", "rule_id", "when", "severity", "version", "tolerance", "message"}


def ruleset_from_json(source: str) -> RuleSet:
    """Build a RuleSet from a JSON config — the deploy surface: rules ship as
    reviewed config files, not code changes. ``source`` is a JSON string or a
    path to one; the format is a list of objects::

        [{"kind": "required", "column": "text", "rule_id": "text_required"},
         {"kind": "range", "column": "turn_idx", "min": 0},
         {"kind": "enum", "column": "role", "values": ["user", "assistant"]},
         {"kind": "pattern", "column": "conv_id", "regex": "c[0-9]+",
          "when": ["role", "==", "tool"]}]

    Unknown kinds and unknown parameter names raise immediately (a typo'd
    rule silently checking nothing is the classic config failure). ``custom``
    rules must already be registered in code under the same rule_id
    (rules.custom) — the config references them, it cannot define them.
    Fingerprints are identical to the equivalently-built in-code ruleset, so
    moving a ruleset from code to config does not invalidate checkpoints.
    """
    import os

    text = source
    if "\n" not in source and not source.lstrip().startswith("["):
        if not os.path.exists(source):
            raise FileNotFoundError(f"rules config not found: {source}")
        with open(source) as f:
            text = f.read()
    items = json.loads(text)
    if not isinstance(items, list):
        raise ValueError("rules config must be a JSON LIST of rule objects")
    rules: list[RuleSpec] = []
    for i, d in enumerate(items):
        if not isinstance(d, dict):
            raise ValueError(f"rule #{i}: expected a JSON object, got {type(d).__name__}")
        kind = d.get("kind")
        if kind not in _CONFIG_KINDS:
            raise ValueError(f"rule #{i}: unknown kind {kind!r} (known: {sorted(_CONFIG_KINDS)})")
        if "column" not in d:
            raise ValueError(f"rule #{i} ({kind}): 'column' is required")
        params = {k: v for k, v in d.items() if k not in _META_KEYS}
        allowed = _KIND_PARAMS[kind]
        unknown = set(params) - allowed
        if unknown:
            raise ValueError(
                f"rule #{i} ({kind}/{d['column']}): unknown parameter(s) {sorted(unknown)}"
                f" — allowed: {sorted(allowed)}"
            )
        when = tuple(d["when"]) if d.get("when") is not None else None
        if when is not None and (len(when) != 3 or when[1] not in ("==", "!=", "in", "notin", "isnull", "notnull")):
            raise ValueError(f"rule #{i}: 'when' must be [column, op, value] with a known op")
        rid = d.get("rule_id") or f"{d['column']}_{kind}"
        if kind == "custom" and rid not in _CUSTOM_REGISTRY:
            raise ValueError(
                f"rule #{i}: custom rule {rid!r} is not registered — custom predicates "
                "are code; register with lyra_spark.rules.custom(...) before loading"
            )
        # Dispatch through the BUILDER functions, never raw RuleSpec: the
        # builders own parameter normalization (defaults recorded, falsy
        # flags dropped, lists→tuples), and fingerprint parity between
        # code-built and config-built rules depends on it.
        try:
            if kind == "custom":
                spec = custom(d["column"], _CUSTOM_REGISTRY[rid], rid, when)
            elif kind == "any_of":
                subs = d.get("alternatives")
                if not isinstance(subs, list) or len(subs) < 2:
                    raise ValueError(
                        f"rule #{i}: any_of needs an 'alternatives' list of >= 2 rule objects"
                    )
                sub_specs = []
                for j, sd in enumerate(subs):
                    if not isinstance(sd, dict) or sd.get("kind") not in _ANY_OF_SUBKINDS:
                        raise ValueError(
                            f"rule #{i} alternative #{j}: kind must be one of "
                            f"{sorted(_ANY_OF_SUBKINDS)}"
                        )
                    sparams = {k2: v2 for k2, v2 in sd.items() if k2 != "kind"}
                    sunknown = set(sparams) - _KIND_PARAMS[sd["kind"]]
                    if sunknown:
                        raise ValueError(
                            f"rule #{i} alternative #{j} ({sd['kind']}): unknown "
                            f"parameter(s) {sorted(sunknown)}"
                        )
                    sub_specs.append(_BUILDERS[sd["kind"]](d["column"], **sparams))
                spec = any_of(d["column"], sub_specs, rule_id=d.get("rule_id"), when=when)
            elif kind in ("items", "has"):
                sd = d.get("item")
                if not isinstance(sd, dict) or sd.get("kind") not in _ITEM_SUBKINDS:
                    raise ValueError(
                        f"rule #{i}: {kind} needs an 'item' rule object with kind in "
                        f"{sorted(_ITEM_SUBKINDS)}"
                    )
                sparams = {k2: v2 for k2, v2 in sd.items() if k2 != "kind"}
                sunknown = set(sparams) - _KIND_PARAMS[sd["kind"]]
                if sunknown:
                    raise ValueError(
                        f"rule #{i} item ({sd['kind']}): unknown parameter(s) {sorted(sunknown)}"
                    )
                sub_spec = _BUILDERS[sd["kind"]](d["column"], **sparams)
                # NOTE: the module-level builders by name — the local parsed
                # list is also called `items` and would shadow the builder
                spec = _ARRAY_WRAPPERS[kind](
                    d["column"], sub_spec, rule_id=d.get("rule_id"), when=when
                )
            elif kind in ("default", "transform", "replace", "truncate"):
                if when is not None:
                    raise ValueError("coercion rules take no 'when'")
                spec = _BUILDERS[kind](d["column"], rule_id=d.get("rule_id"), **params)
            else:
                spec = _BUILDERS[kind](d["column"], rule_id=d.get("rule_id"), when=when, **params)
        except TypeError as e:
            raise ValueError(f"rule #{i} ({kind}/{d['column']}): {e}") from None
        if "severity" in d or "version" in d or "tolerance" in d or "message" in d:
            import dataclasses

            # validate like kinds/params: a typo'd severity ("warning",
            # "WARN") would otherwise silently gate as error — the exact
            # quiet-config failure this loader exists to reject
            if d.get("severity") is not None and d["severity"] not in ("error", "warn"):
                raise ValueError(
                    f"rule #{i}: unknown severity {d['severity']!r} (known: error, warn)"
                )
            tol = d.get("tolerance", spec.tolerance)
            if not isinstance(tol, (int, float)) or isinstance(tol, bool) or not (0.0 <= tol < 1.0):
                raise ValueError(
                    f"rule #{i}: tolerance must be a fraction in [0, 1), got {tol!r}"
                )
            msg = d.get("message", spec.message)
            if msg is not None and not isinstance(msg, str):
                raise ValueError(f"rule #{i}: message must be a string, got {type(msg).__name__}")
            spec = dataclasses.replace(
                spec,
                severity=d.get("severity", spec.severity),
                version=str(d.get("version", spec.version)),
                tolerance=float(tol),
                message=msg,
            )
        rules.append(spec)
    return RuleSet(rules)


_BUILDERS: dict[str, Callable] = {
    "required": required,
    "nonempty": nonempty,
    "forbidden": forbidden,
    "enum": enum,
    "deny": deny,
    "pattern": pattern,
    "length": length,
    "range": range_rule,
    "integer": integer,
    "multiple_of": multiple_of,
    "cast": cast,
    "default": default,
    "transform": transform,
    "format": format_rule,
    "compare": compare,
    "array_size": array_size,
    "json_unknown_keys": json_unknown_keys,
    "replace": replace,
    "truncate": truncate,
}

_ARRAY_WRAPPERS: dict[str, Callable] = {"items": items, "has": has}

# Per-kind legal parameter names, mirroring the builder signatures above — the
# loader's typo guard. Keep in sync when adding a builder.
_KIND_PARAMS: dict[str, set[str]] = {
    "required": set(),
    "nonempty": set(),
    "forbidden": set(),
    "enum": {"values"},
    "deny": {"values"},
    "pattern": {"regex", "full"},
    "length": {"min", "max"},
    "range": {"min", "max", "strict_min", "strict_max"},
    "integer": set(),
    "multiple_of": {"k"},
    "cast": {"to", "strict"},
    "default": {"value"},
    "transform": {"fn"},
    "custom": set(),
    "format": {"name"},
    "compare": {"op", "other"},
    "any_of": {"alternatives"},
    "items": {"item"},
    "has": {"item"},
    "array_size": {"min", "max"},
    "json_unknown_keys": {"allowed"},
    "replace": {"search", "replacement", "regex"},
    "truncate": {"max_len"},
}


def suite_config_from_json(source: str) -> tuple[RuleSet, list[dict]]:
    """Parse a suite config: either the plain rule LIST `ruleset_from_json`
    reads (checks = []), or an OBJECT ``{"rules": [...], "checks": [...]}``
    that also declares the optional dataset checks, so one reviewed file
    ships the whole suite::

        {"rules": [...],
         "checks": [
           {"check": "transitions",
            "allowed": [["user", "assistant"], ["assistant", "user"]],
            "allowed_first": ["system", "user"]},
           {"check": "placement", "ts_col": "ts"}
         ]}

    Only sink-mergeable checks are declarable here (their violations share
    the (key, partition, rule_id, observed) shape): ``transitions`` and
    ``placement`` — the same set the CLI exposes as flags, plus the
    first-turn constraint the flags don't. Core dataset checks
    (uniqueness, referential, monotone) always run and are not config
    toggles. Unknown check names raise at load, like unknown rule kinds.
    """
    import os

    text = source
    if "\n" not in source and not source.lstrip().startswith(("[", "{")):
        if not os.path.exists(source):
            raise FileNotFoundError(f"rules config not found: {source}")
        with open(source) as f:
            text = f.read()
    obj = json.loads(text)
    if isinstance(obj, list):
        return ruleset_from_json(json.dumps(obj)), []
    if not isinstance(obj, dict) or "rules" not in obj:
        raise ValueError("suite config must be a rule list or an object with 'rules'")
    ruleset = ruleset_from_json(json.dumps(obj["rules"]))
    checks: list[dict] = []
    for i, c in enumerate(obj.get("checks", [])):
        if not isinstance(c, dict) or "check" not in c:
            raise ValueError(f"check #{i}: expected an object with a 'check' name")
        name = c["check"]
        allowed_keys = {
            "transitions": {"check", "allowed", "allowed_first"},
            "placement": {"check", "ts_col"},
        }.get(name, {"check"})
        unknown = set(c) - allowed_keys
        if unknown:
            raise ValueError(
                f"check #{i} ({name}): unknown option(s) {sorted(unknown)} — "
                f"allowed: {sorted(allowed_keys - {'check'})}"
            )
        if name == "transitions":
            allowed = c.get("allowed")
            if not allowed:
                raise ValueError(f"check #{i} (transitions): 'allowed' pair list required")
            checks.append(
                {
                    "check": "transitions",
                    "allowed": {tuple(p) for p in allowed},
                    "allowed_first": set(c["allowed_first"]) if c.get("allowed_first") else None,
                }
            )
        elif name == "placement":
            checks.append({"check": "placement", "ts_col": c.get("ts_col", "ts")})
        else:
            raise ValueError(
                f"check #{i}: unknown check {name!r} (known: transitions, placement)"
            )
    return ruleset, checks
