"""Batch-10 operators: table diff, reply latency, context trim, ntile."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.context import trim_to_budget
from cardinalhq_otel_collector_spark.operators.diff import table_diff
from cardinalhq_otel_collector_spark.operators.grouping import ntile_buckets
from cardinalhq_otel_collector_spark.operators.sessionize import reply_latency_stats


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ------------------------------------------------------------ table diff

def test_table_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "d")], "k long, v string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c"), (4, None), (5, "e")], "k long, v string"
    )
    got = {(r.k, r.status) for r in table_diff(old, new, ["k"], ["v"]).collect()}
    # 1 removed; 2 unchanged (dropped); 3 NULL->'c' changed; 4 'd'->NULL changed; 5 added
    assert got == {(1, "removed"), (3, "changed"), (4, "changed"), (5, "added")}


def test_table_diff_null_equal_is_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, None)], "k long, v string")
    assert table_diff(old, new, ["k"], ["v"]).count() == 0


# --------------------------------------------------------- reply latency

def test_reply_latency_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 00:00:00"), "user"),
            (2, 1, _ts("2024-01-01 00:00:02"), "assistant"),  # u->a 2s
            (3, 1, _ts("2024-01-01 00:00:03"), "user"),       # a->u 1s
            (4, 2, _ts("2024-01-01 00:00:00"), "assistant"),  # other conv, no gap
        ],
        "event_id long, conv_id long, ts timestamp, role string",
    )
    got = {
        (r.prev_role, r.role): (r.n_gaps, r.min_gap_us, r.max_gap_us, r.mean_gap_us)
        for r in reply_latency_stats(df, "conv_id", "ts", "role", "event_id").collect()
    }
    assert got == {
        ("user", "assistant"): (1, 2_000_000, 2_000_000, 2_000_000.0),
        ("assistant", "user"): (1, 1_000_000, 1_000_000, 1_000_000.0),
    }


# ----------------------------------------------------------- trim budget

def test_trim_keeps_longest_fitting_suffix(spark):
    df = spark.createDataFrame(
        [(1, 0, 100), (1, 1, 100), (1, 2, 150), (1, 3, 100)],
        "conv_id long, turn_idx long, token_n long",
    )
    # suffix totals from the end: t3=100, t2=250, t1=350>300, t0=450>300
    got = sorted(
        r.turn_idx
        for r in trim_to_budget(df, "conv_id", "turn_idx", "token_n", 300).collect()
    )
    assert got == [2, 3]


def test_trim_oversized_single_turn_drops_everything_before(spark):
    df = spark.createDataFrame(
        [(1, 0, 10), (1, 1, 999)], "conv_id long, turn_idx long, token_n long"
    )
    got = [r.turn_idx for r in trim_to_budget(df, "conv_id", "turn_idx", "token_n", 300).collect()]
    assert got == []  # the oversized last turn exceeds the budget alone


# ----------------------------------------------------------------- ntile

def test_ntile_sizes_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "t", float(i % 3)) for i in range(10)], "event_id long, k string, value double"
    )
    rows = ntile_buckets(df, "value", ["k"], k=4, tiebreak_col="event_id").collect()
    sizes = {}
    for r in rows:
        sizes[r.bucket] = sizes.get(r.bucket, 0) + 1
    assert sizes == {1: 3, 2: 3, 3: 2, 4: 2}  # 10 rows into 4: 3,3,2,2
    again = ntile_buckets(df, "value", ["k"], k=4, tiebreak_col="event_id").collect()
    assert {(r.event_id, r.bucket) for r in rows} == {(r.event_id, r.bucket) for r in again}
