"""Sessionization + conversation profiles over event/transcript streams.

Batch sessionization is the standard gap-split construction: within each
user's events ordered by time, a new session starts wherever the gap from the
previous event exceeds ``gap``; the session id is the running count of such
starts. Both window functions (the lag and the running sum) share ONE
exchange and ONE sort — partitionBy(user), orderBy(time) — so the whole
operator costs a single shuffle of the fact table, the minimum possible for
any per-user ordering. (The streaming flavor of this is Structured
Streaming's session window; SURVEY.md §2 row 44 keeps streaming out of scope,
and the batch construction below is what backfills and validation runs use.)

conversation_stats is the per-conversation profile a transcript pipeline
reports on: turn counts, wall-clock span, role mix, tool usage, and the
largest intra-conversation silence. The max-gap needs a lag (window) before
the aggregate; the window's partition key prefixes the groupBy key, so
Catalyst plans ONE exchange for both.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def epoch_us(c) -> Column:
    """Microseconds since epoch, accepting TIMESTAMP and TIMESTAMP_NTZ
    (parquet writers emit either; the session TZ is UTC by contract, so the
    NTZ→TZ cast is a stable bijection — and gaps are differences, where any
    fixed offset cancels). The ONE shared ts-normalization helper — asof.py
    and ranges.py reuse it so the NTZ contract can never drift per-operator."""
    col = F.col(c) if isinstance(c, str) else c
    return F.unix_micros(col.cast("timestamp"))


_us = epoch_us  # module-internal alias (historical name)


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_sec: int = 1800,
    order_cols: list[str] | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Add an integer ``session_id`` (0-based per user): a new session starts
    at the first event and wherever ts - prev_ts > gap_sec.

    ``order_cols`` breaks ts ties deterministically (pass the event's unique
    id); rows with NULL user or ts are excluded — they have no defined place
    in a per-user timeline (same contract as the conversation checks,
    SEMANTICS.md §21).
    """
    order = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(user_col).orderBy(*order)
    df = df.filter(F.col(user_col).isNotNull() & F.col(ts_col).isNotNull())
    prev = F.lag(ts_col).over(w)
    new_session = F.when(
        prev.isNull()
        | ((_us(ts_col) - _us(prev)) > F.lit(int(gap_sec) * 1_000_000)),
        F.lit(1),
    ).otherwise(F.lit(0))
    # running sum over the SAME window spec → same exchange, same sort
    sid = F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0)) - 1
    return df.withColumn(out_col, sid.cast("long"))


def conversation_stats(
    df: DataFrame,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
    role_col: str = "role",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation profile: (group, n_turns, n_roles, n_tool_calls,
    first_ts, last_ts, duration_sec, max_gap_sec).

    max_gap is the largest ts step between consecutive turns (ordered by
    ``order_col``); the lag window and the aggregate share one exchange
    (the window key prefixes the groupBy key). NULL-key rows are excluded
    (SEMANTICS.md §21)."""
    w = Window.partitionBy(group_col).orderBy(order_col, ts_col)
    df = df.filter(F.col(group_col).isNotNull() & F.col(order_col).isNotNull())
    # lag over the TIMESTAMPED turns only: a NULL-ts turn would otherwise
    # NULL out BOTH adjacent gaps (any arithmetic with NULL is NULL), leaving
    # max_gap_sec NULL/under-reported while duration_sec shows a real span —
    # the observable silence is between the timestamped neighbors
    prev_ts = F.last(ts_col, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    gap = F.when(F.col(ts_col).isNotNull(), _us(ts_col) - _us(prev_ts))
    lagged = df.select(
        group_col,
        ts_col,
        role_col,
        tool_col,
        gap.alias("__gap_us"),
    )
    return lagged.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct(role_col).alias("n_roles"),
        F.count(tool_col).alias("n_tool_calls"),
        F.min(ts_col).alias("first_ts"),
        F.max(ts_col).alias("last_ts"),
        (
            (_us(F.max(ts_col)) - _us(F.min(ts_col))) / F.lit(1_000_000.0)
        ).alias("duration_sec"),
        (F.max("__gap_us") / F.lit(1_000_000.0)).alias("max_gap_sec"),
    )


def conversation_text(
    df: DataFrame,
    group_cols: list[str] | str = "conv_id",
    order_cols: list[str] | str = "turn_idx",
    text_col: str = "text",
    sep: str = "\n",
    out_col: str = "conv_text",
) -> DataFrame:
    """One document per conversation: the group's turns concatenated in
    ``order_cols`` order — the unit conversation-level dedup, fingerprinting,
    and near-dup clustering operate on (turn-level dedup can't see that two
    TRANSCRIPTS are copies when every individual turn is common).

    Returns (group_cols..., out_col). NULL turn text renders as "" so a NULL
    turn still holds its position in the sequence.

    Scale: ONE exchange (the groupBy). The collect_list buffer is bounded by
    the conversation's OWN turn count — the natural per-group unit a
    transcript table is sized around — never corpus-scale; a pathological
    million-turn conversation spills a task, not the job. sort_array orders
    the (order..., text) structs totally, so duplicate order keys still give
    an engine-stable, re-runnable concatenation.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order_cols = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    # NULL group keys excluded like every per-conversation operator
    # (SEMANTICS.md §21): groupBy would otherwise merge ALL NULL-conv rows
    # into one corpus-scale pseudo-conversation — an OOM-sized collect_list
    # buffer concatenating unrelated users' turns into one garbage document
    cond = None
    for g in group_cols:
        c = F.col(g).isNotNull()
        cond = c if cond is None else (cond & c)
    df = df.filter(cond)
    turn = F.struct(
        *[F.col(c) for c in order_cols],
        F.coalesce(F.col(text_col).cast("string"), F.lit("")).alias("__t"),
    )
    joined = F.array_join(
        F.transform(F.sort_array(F.collect_list(turn)), lambda s: s["__t"]), sep
    )
    return df.groupBy(*group_cols).agg(joined.alias(out_col))
