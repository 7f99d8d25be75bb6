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
