"""Sessionization + conversation profiles: hand-computed references, NULL-key
exclusion, tie-break determinism, and the one-exchange plan shape."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lyra_spark.sessionize import conversation_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_sessionize_gap_splits(spark):
    rows = [
        # user 1: events at 0s, 10s, 2000s (gap>1800 → new session), 2010s
        (1, 1, _ts(0)), (2, 1, _ts(10)), (3, 1, _ts(2000)), (4, 1, _ts(2010)),
        # user 2: single event
        (5, 2, _ts(5)),
        # NULL user / NULL ts excluded
        (6, None, _ts(0)), (7, 1, None),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: r.session_id
        for r in sessionize(df, gap_sec=1800, order_cols=["event_id"]).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0}


def test_sessionize_exact_gap_is_same_session(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0)), (2, 1, _ts(1800))], "event_id long, user_id long, ts timestamp"
    )
    got = {r.event_id: r.session_id for r in sessionize(df, gap_sec=1800).collect()}
    assert got == {1: 0, 2: 0}  # boundary: strictly greater-than splits


def test_sessionize_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, 1, _ts(0))], "event_id long, user_id long, ts timestamp"
    )
    plan = sessionize(df, order_cols=["event_id"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # lag + running sum share one shuffle/sort


def test_conversation_stats_reference(spark):
    rows = [
        ("c1", 0, _ts(0), "system", None),
        ("c1", 1, _ts(30), "user", None),
        ("c1", 2, _ts(100), "assistant", "search"),
        ("c1", 3, _ts(110), "tool", "search"),
        ("c2", 0, _ts(0), "user", None),
        (None, 0, _ts(0), "user", None),  # NULL key excluded
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, role string, tool string"
    )
    got = {r.conv_id: r for r in conversation_stats(df).collect()}
    c1 = got["c1"]
    assert (c1.n_turns, c1.n_roles, c1.n_tool_calls) == (4, 4, 2)
    assert c1.duration_sec == pytest.approx(110.0)
    assert c1.max_gap_sec == pytest.approx(70.0)
    c2 = got["c2"]
    assert (c2.n_turns, c2.n_tool_calls, c2.max_gap_sec) == (1, 0, None)
    assert set(got) == {"c1", "c2"}


def test_conversation_stats_single_exchange(spark):
    df = spark.createDataFrame(
        [("c1", 0, _ts(0), "user", None)],
        "conv_id string, turn_idx int, ts timestamp, role string, tool string",
    )
    plan = conversation_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # window + groupBy share the conv exchange


def test_conversation_text_ordering_ties_and_nulls(spark):
    from lyra_spark.sessionize import conversation_text

    df = spark.createDataFrame(
        [
            ("c1", 2, "world"),
            ("c1", 1, "hello"),
            ("c1", 3, None),       # NULL turn keeps its slot as ""
            ("c2", 1, "b"),
            ("c2", 1, "a"),        # duplicate turn_idx → text breaks the tie
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {r.conv_id: r.conv_text for r in conversation_text(df).collect()}
    assert got == {"c1": "hello\nworld\n", "c2": "a\nb"}


def test_conversation_dedup_end_to_end(spark):
    """Two conversations made of individually-common turns dedup at the
    CONVERSATION level (turn-level hashing could never pair them)."""
    from lyra_spark.pipeline.dedup import exact_duplicates
    from lyra_spark.sessionize import conversation_text

    rows = []
    for conv, seq in [("a", ["hi", "yes", "bye"]), ("b", ["hi", "yes", "bye"]),
                      ("c", ["hi", "bye", "yes"])]:  # same turns, different order
        rows += [(conv, i, t) for i, t in enumerate(seq)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    conv = conversation_text(df)
    got = exact_duplicates(conv, text_col="conv_text", id_col="conv_id").collect()
    assert len(got) == 1
    assert got[0]["dup_count"] == 2
    assert (got[0]["min_conv_id"], got[0]["max_conv_id"]) == ("a", "b")


def test_conversation_text_matches_python_reference_random(spark):
    """Randomized pin: conversation_text == a pure-python groupby+sort+join,
    including duplicate order keys, NULL text, and multi-column ordering."""
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(400):
        conv = f"c{rnd.randrange(12)}"
        idx = rnd.randrange(6)          # duplicates on purpose
        sub = rnd.randrange(3)          # second order column
        text = rnd.choice([None, "", "x", "yy", "hello world", "a\nb"])
        rows.append((conv, idx, sub, text))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, sub int, text string")
    got = {
        r.conv_id: r.conv_text
        for r in __import__("lyra_spark.sessionize", fromlist=["conversation_text"])
        .conversation_text(df, "conv_id", ["turn_idx", "sub"], "text", sep="|")
        .collect()
    }
    ref = {}
    for conv, idx, sub, text in rows:
        ref.setdefault(conv, []).append((idx, sub, text or ""))
    want = {c: "|".join(t for _, _, t in sorted(v)) for c, v in ref.items()}
    assert got == want


def test_conversation_text_excludes_null_group_keys(spark):
    """NULL conv_id rows must NOT merge into one corpus-scale
    pseudo-conversation (SEMANTICS.md §21 — same contract as sessionize and
    conversation_stats)."""
    from lyra_spark.sessionize import conversation_text

    df = spark.createDataFrame(
        [("c1", 0, "a"), ("c1", 1, "b"), (None, 0, "x"), (None, 1, "y")],
        "conv_id string, turn_idx int, text string",
    )
    out = conversation_text(df).collect()
    assert {r["conv_id"] for r in out} == {"c1"}
    assert out[0]["conv_text"] == "a\nb"


def test_conversation_stats_gap_skips_null_ts(spark):
    """A NULL-ts turn between two timestamped turns must not NULL out
    max_gap_sec — the observable silence is between the timestamped
    neighbors."""
    import datetime

    from lyra_spark.sessionize import conversation_stats

    t = lambda h: datetime.datetime(2024, 1, 1, h, 0, 0)
    df = spark.createDataFrame(
        [("c1", 0, t(10), "user", None),
         ("c1", 1, None, "assistant", None),
         ("c1", 2, t(11), "user", None)],
        "conv_id string, turn_idx int, ts timestamp, role string, tool string",
    )
    row = conversation_stats(df).collect()[0]
    assert row["max_gap_sec"] == 3600.0
    assert row["duration_sec"] == 3600.0
