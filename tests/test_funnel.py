"""Funnel operator: strict ordering, the within-window anchor, chain
breaks, same-timestamp non-chaining, and the single-Exchange plan gate."""

from __future__ import annotations

import datetime as dt

import pytest

from cardinalhq_otel_collector_spark.operators.funnel import funnel


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "u long, step string, ts timestamp")


def test_basic_three_step_completion(spark):
    df = _mk(
        spark,
        [
            (1, "A", _ts("2024-01-01 00:00:00")),
            (1, "B", _ts("2024-01-01 00:10:00")),
            (1, "C", _ts("2024-01-01 00:20:00")),
            (2, "A", _ts("2024-01-01 00:00:00")),
            (2, "C", _ts("2024-01-01 00:10:00")),  # skips B → stuck at 1
            (2, "B", _ts("2024-01-01 00:20:00")),
        ],
    )
    got = {
        r.u: (r.steps_completed, r.step2_ts, r.step3_ts)
        for r in funnel(
            df, steps=["A", "B", "C"], by="u", step_col="step"
        ).collect()
    }
    assert got[1] == (3, _ts("2024-01-01 00:10:00"), _ts("2024-01-01 00:20:00"))
    # user 2's C happens before their B → B completes but C never re-fires
    assert got[2][0] == 2 and got[2][2] is None


def test_earliest_qualifying_not_just_any(spark):
    # a B BEFORE the first A must not count; the earliest B AFTER A wins
    df = _mk(
        spark,
        [
            (1, "B", _ts("2024-01-01 00:00:00")),
            (1, "A", _ts("2024-01-01 01:00:00")),
            (1, "B", _ts("2024-01-01 03:00:00")),
            (1, "B", _ts("2024-01-01 02:00:00")),
        ],
    )
    row = funnel(df, steps=["A", "B"], by="u", step_col="step").collect()[0]
    assert row.step2_ts == _ts("2024-01-01 02:00:00")


def test_same_timestamp_does_not_chain(spark):
    df = _mk(
        spark,
        [
            (1, "A", _ts("2024-01-01 00:00:00")),
            (1, "B", _ts("2024-01-01 00:00:00")),  # ties are NOT after
        ],
    )
    row = funnel(df, steps=["A", "B"], by="u", step_col="step").collect()[0]
    assert row.step2_ts is None and row.steps_completed == 1


def test_within_window_anchored_at_step1(spark):
    df = _mk(
        spark,
        [
            (1, "A", _ts("2024-01-01 00:00:00")),
            (1, "B", _ts("2024-01-01 00:30:00")),
            (1, "C", _ts("2024-01-01 01:00:01")),  # 1s past the window
            (2, "A", _ts("2024-01-01 00:00:00")),
            (2, "B", _ts("2024-01-01 00:30:00")),
            (2, "C", _ts("2024-01-01 01:00:00")),  # exactly at deadline → in
        ],
    )
    got = {
        r.u: r.steps_completed
        for r in funnel(
            df, steps=["A", "B", "C"], by="u", step_col="step",
            within_seconds=3600,
        ).collect()
    }
    assert got == {1: 2, 2: 3}


def test_users_without_step1_are_absent(spark):
    df = _mk(spark, [(9, "B", _ts("2024-01-01 00:00:00"))])
    assert funnel(df, steps=["A", "B"], by="u", step_col="step").count() == 0


def test_needs_two_steps():
    with pytest.raises(ValueError):
        funnel(None, steps=["A"], by="u", step_col="step")


def test_single_exchange_plan(spark):
    # every chained running-min shares one (partitionBy, orderBy) → the
    # physical plan carries exactly ONE shuffle before the final agg's
    df = _mk(spark, [(1, "A", _ts("2024-01-01 00:00:00"))])
    plan = funnel(
        df, steps=["A", "B", "C"], by="u", step_col="step"
    )._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    # one for the window partitioning; the groupBy reuses it (child
    # already hash-partitioned on u) or adds at most one more
    assert n_exchanges <= 2, plan
    assert plan.count("Sort ") <= 2, plan
