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
