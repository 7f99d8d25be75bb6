"""Fixed schemas for the transcript validation engine (BASELINE.json:15).

The input schema is mandated, never inferred: an Iceberg table (locally:
Hive-partitioned parquet) of multi-turn conversation/agent transcripts.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Primary input (BASELINE.json:15): conversation transcripts.
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        # Hive/Iceberg partition column — local stand-in for iceberg days(ts).
        T.StructField("part_date", T.DateType(), True),
    ]
)

# Broadcast dimension of valid tool names (BASELINE.json:6 referential check).
TOOLS_DIM_SCHEMA = T.StructType(
    [
        T.StructField("tool_name", T.StringType(), False),
        T.StructField("category", T.StringType(), True),
    ]
)

# Violation rows (BASELINE.json:6): byte-match target, stable (conv_id, turn_idx) order.
VIOLATIONS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("observed_value", T.StringType(), True),
    ]
)

# Per-partition × per-rule verdicts (BASELINE.json:6,14).
VERDICTS_SCHEMA = T.StructType(
    [
        T.StructField("part_date", T.DateType(), True),
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("pass", T.BooleanType(), False),
        T.StructField("violation_count", T.LongType(), False),
        T.StructField("row_count", T.LongType(), False),
    ]
)

ROLE_ENUM = ["system", "user", "assistant", "tool"]

KEY_COLUMNS = ["conv_id", "turn_idx"]
PARTITION_COLUMN = "part_date"


def schema_diff(actual: T.StructType, expected: T.StructType) -> list[dict]:
    """Expected-vs-actual schema conformance report — the metadata-level gate
    that runs BEFORE any data is scanned (a missing or retyped column should
    fail the run in milliseconds, not after a 100 TB pass half-completes).

    Returns a list of dicts (column, status, expected_type, actual_type)
    where status ∈ {missing, extra, type_mismatch, nullability_tightened}:
      * missing — expected column absent from the table;
      * extra — table column not in the expected schema (informational: safe
        for validation, but a signal the producer changed);
      * type_mismatch — same name, different dataType;
      * nullability_tightened — expected non-nullable but actual nullable
        (the reverse direction is safe and not reported).
    Pure driver-side metadata comparison: zero jobs, zero scans, determinate
    order (expected columns first, then extras, each name-sorted).
    """
    # TIMESTAMP vs TIMESTAMP_NTZ is a parquet reader-config artifact (Spark
    # infers NTZ for parquet timestamps without a UTC annotation), not schema
    # drift — the engine treats both as the same wall-clock turn timestamp.
    def _norm(dt: T.DataType) -> T.DataType:
        return T.TimestampType() if isinstance(dt, T.TimestampNTZType) else dt

    act = {f.name: f for f in actual.fields}
    exp = {f.name: f for f in expected.fields}
    out: list[dict] = []
    for name in sorted(exp):
        e = exp[name]
        a = act.get(name)
        if a is None:
            out.append(
                {"column": name, "status": "missing",
                 "expected_type": e.dataType.simpleString(), "actual_type": None}
            )
        elif _norm(a.dataType) != _norm(e.dataType):
            out.append(
                {"column": name, "status": "type_mismatch",
                 "expected_type": e.dataType.simpleString(),
                 "actual_type": a.dataType.simpleString()}
            )
        elif (not e.nullable) and a.nullable:
            out.append(
                {"column": name, "status": "nullability_tightened",
                 "expected_type": e.dataType.simpleString(),
                 "actual_type": a.dataType.simpleString()}
            )
    for name in sorted(set(act) - set(exp)):
        out.append(
            {"column": name, "status": "extra", "expected_type": None,
             "actual_type": act[name].dataType.simpleString()}
        )
    return out


def assert_schema(actual: T.StructType, expected: T.StructType) -> None:
    """Raise ValueError listing every blocking difference (missing /
    type_mismatch / nullability_tightened; `extra` columns never block)."""
    blocking = [d for d in schema_diff(actual, expected) if d["status"] != "extra"]
    if blocking:
        lines = ", ".join(
            f"{d['column']}: {d['status']} (expected {d['expected_type']}, got {d['actual_type']})"
            for d in blocking
        )
        raise ValueError(f"schema does not conform: {lines}")
