"""In-repo reference oracle — the 'lyra reference validator' stand-in.

A deliberately naive, pure-pandas, row-at-a-time implementation of the
BASELINE.json:6 semantics. The engine's violation rows must match this
oracle's output exactly (SURVEY.md §5.2). Zero Spark. Disputes between engine
and oracle are settled by BASELINE.json:6; decisions are pinned in
SEMANTICS.md.
"""

from __future__ import annotations

import pandas as pd

ROLE_ENUM = {"system", "user", "assistant", "tool"}
RULE_IDS = [
    "text_required",
    "text_nonempty",
    "role_enum",
    "turn_idx_range",
    "uniq_conv_turn",
    "tool_ref",
    "ts_monotone",
]


def _fmt_ts(ts: pd.Timestamp) -> str:
    """Spark's cast(timestamp as string): trailing fraction zeros trimmed."""
    s = ts.strftime("%Y-%m-%d %H:%M:%S")
    if ts.microsecond:
        s += (".%06d" % ts.microsecond).rstrip("0")
    return s


def _is_null(v) -> bool:
    return v is None or (isinstance(v, float) and pd.isna(v))


def oracle_violations(df: pd.DataFrame, tool_names: set[str]) -> pd.DataFrame:
    """Row-at-a-time validation of a transcripts frame.

    Emits (conv_id, turn_idx, part_date, rule_id, observed_value) sorted by
    (conv_id, turn_idx, rule_id, observed_value) — the byte-match target.
    """
    out: list[tuple] = []
    for row in df.itertuples(index=False):
        cid, tix, pd_ = row.conv_id, row.turn_idx, row.part_date
        if _is_null(row.text):
            out.append((cid, tix, pd_, "text_required", None))
        elif row.text == "":
            out.append((cid, tix, pd_, "text_nonempty", ""))
        if not _is_null(row.role) and row.role not in ROLE_ENUM:
            out.append((cid, tix, pd_, "role_enum", row.role))
        if not _is_null(tix) and tix < 0:
            out.append((cid, tix, pd_, "turn_idx_range", str(tix)))
        if not _is_null(row.tool) and row.tool not in tool_names:
            out.append((cid, tix, pd_, "tool_ref", row.tool))

    # uniqueness per (conv_id, turn_idx, part_date) — one violation per dup key
    dup = df.groupby(["conv_id", "turn_idx", "part_date"]).size()
    for (cid, tix, pd_), c in dup[dup > 1].items():
        out.append((cid, tix, pd_, "uniq_conv_turn", str(c)))

    # monotone ts per conversation, ordered by (turn_idx, ts)
    for cid, g in df.sort_values(["turn_idx", "ts"]).groupby("conv_id"):
        prev = None
        for row in g.itertuples(index=False):
            if prev is not None and prev > row.ts:
                out.append((cid, row.turn_idx, row.part_date, "ts_monotone", _fmt_ts(row.ts)))
            prev = row.ts

    res = pd.DataFrame(out, columns=["conv_id", "turn_idx", "part_date", "rule_id", "observed_value"])
    return res.sort_values(
        ["conv_id", "turn_idx", "rule_id", "observed_value"], ignore_index=True, na_position="first"
    )


def oracle_verdicts(df: pd.DataFrame, violations: pd.DataFrame, rule_ids: list[str] = RULE_IDS) -> pd.DataFrame:
    """Per (part_date, rule_id) pass/fail with counts."""
    rows = df.groupby("part_date").size().rename("row_count").reset_index()
    vc = violations.groupby(["part_date", "rule_id"]).size()
    out = []
    for _, r in rows.iterrows():
        for rid in rule_ids:
            c = int(vc.get((r.part_date, rid), 0))
            out.append((r.part_date, rid, c == 0, c, int(r.row_count)))
    return pd.DataFrame(out, columns=["part_date", "rule_id", "pass", "violation_count", "row_count"])
