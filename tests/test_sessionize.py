from datetime import datetime

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.sessionize import sessionize


def _df(spark):
    rows = [
        # user 1: events at 0s, 100s (in), 2000s (gap>1800 -> new), 2100s
        (1, 1, datetime(2026, 1, 1, 0, 0, 0)),
        (2, 1, datetime(2026, 1, 1, 0, 1, 40)),
        (3, 1, datetime(2026, 1, 1, 0, 33, 20)),
        (4, 1, datetime(2026, 1, 1, 0, 35, 0)),
        # user 2: one event
        (5, 2, datetime(2026, 1, 1, 12, 0, 0)),
        # user 3: exactly-gap-long pause stays in-session (strict >)
        (6, 3, datetime(2026, 1, 1, 0, 0, 0)),
        (7, 3, datetime(2026, 1, 1, 0, 30, 0)),
    ]
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])


def test_sessionize_gap_splits_hand_computed(spark):
    out = sessionize(
        _df(spark), "user_id", "ts", gap_seconds=1800, order_cols=["event_id"]
    )
    got = {r["event_id"]: r["session_idx"] for r in out.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 0, 6: 0, 7: 0}


def test_sessionize_partitioning_independent(spark):
    df = _df(spark)
    a = {
        (r["event_id"], r["session_idx"])
        for r in sessionize(df, "user_id", "ts", 1800, ["event_id"]).collect()
    }
    b = {
        (r["event_id"], r["session_idx"])
        for r in sessionize(
            df.repartition(7), "user_id", "ts", 1800, ["event_id"]
        ).collect()
    }
    assert a == b


def test_sessionize_single_exchange(spark):
    out = sessionize(_df(spark), "user_id", "ts", 1800, ["event_id"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lag and the running sum share one window partitioning: exactly one
    # shuffle on the entity key, and no Python anywhere
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "python" not in plan.lower()


def test_session_stats_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.sessionize import session_stats

    out = session_stats(
        _df(spark), "user_id", "ts", gap_seconds=1800, order_cols=["event_id"]
    )
    got = {
        (r["user_id"], r["session_idx"]): (r["n_events"], r["duration_us"])
        for r in out.collect()
    }
    # user 1: session 0 = events 1,2 (span 100s); session 1 = events 3,4 (100s)
    # user 2: single event (0s); user 3: both events (1800s span)
    assert got == {
        (1, 0): (2, 100_000_000),
        (1, 1): (2, 100_000_000),
        (2, 0): (1, 0),
        (3, 0): (2, 1_800_000_000),
    }


def test_transition_counts_basic(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sessionize import (
        transition_counts,
    )

    T = dt.datetime.fromisoformat
    df = spark.createDataFrame(
        [
            (1, 10, T("2024-01-01 00:00:00"), "a"),
            (2, 10, T("2024-01-01 00:01:00"), "b"),
            (3, 10, T("2024-01-01 00:02:00"), "a"),
            (4, 11, T("2024-01-01 00:00:00"), "a"),
            (5, 11, T("2024-01-01 00:01:00"), "b"),
            # tied timestamps order by event_id: 6 then 7 → c->d
            (6, 12, T("2024-01-01 00:00:00"), "c"),
            (7, 12, T("2024-01-01 00:00:00"), "d"),
        ],
        "event_id long, user_id long, ts timestamp, state string",
    )
    got = {
        (r.from_state, r.to_state): (r.n, r.prob)
        for r in transition_counts(
            df, entity_col="user_id", state_col="state",
            order_cols=["event_id"],
        ).collect()
    }
    assert got[("a", "b")] == (2, 1.0)
    assert got[("b", "a")] == (1, 1.0)
    assert got[("c", "d")] == (1, 1.0)
    assert ("d", "c") not in got
    # probabilities per from_state sum to 1
    import collections

    sums = collections.defaultdict(float)
    for (f, _), (_, p) in got.items():
        sums[f] += p
    assert all(abs(s - 1.0) < 1e-12 for s in sums.values())


def test_transition_counts_single_event_entity_emits_nothing(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sessionize import (
        transition_counts,
    )

    df = spark.createDataFrame(
        [(1, 10, dt.datetime(2024, 1, 1), "a")],
        "event_id long, user_id long, ts timestamp, state string",
    )
    assert transition_counts(
        df, entity_col="user_id", state_col="state", order_cols=["event_id"]
    ).count() == 0


def test_interarrival_stats_hand_computed(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sessionize import (
        interarrival_stats,
    )

    T = dt.datetime.fromisoformat
    df = spark.createDataFrame(
        [
            (1, 10, T("2024-01-01 00:00:00")),
            (2, 10, T("2024-01-01 00:00:10")),
            (3, 10, T("2024-01-01 00:01:10")),
            (4, 11, T("2024-01-01 00:00:00")),  # single event → null gaps
        ],
        "event_id long, user_id long, ts timestamp",
    )
    rows = {
        r.user_id: (r.n_events, r.n_gaps, r.min_gap_us, r.max_gap_us, r.mean_gap_us)
        for r in interarrival_stats(
            df, entity_col="user_id", order_cols=["event_id"]
        ).collect()
    }
    assert rows[10] == (3, 2, 10_000_000, 60_000_000, 35_000_000.0)
    assert rows[11] == (1, 0, None, None, None)


def test_path_mining_hand_computed(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sessionize import path_mining

    base = dt.datetime(2024, 1, 1)
    seq_u1 = ["a", "b", "c", "a", "b", "c"]   # a>b>c ×2, b>c>a, c>a>b
    seq_u2 = ["a", "b"]                        # too short for depth 3
    rows = [
        (i, 1, base + dt.timedelta(minutes=i), s) for i, s in enumerate(seq_u1)
    ] + [
        (100 + i, 2, base + dt.timedelta(minutes=i), s)
        for i, s in enumerate(seq_u2)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, state string"
    )
    got = {
        r.path: (r.n, r.rank)
        for r in path_mining(
            df, entity_col="user_id", state_col="state",
            order_cols=["event_id"], depth=3, k=10,
        ).collect()
    }
    assert got == {
        "a>b>c": (2, 1),
        "b>c>a": (1, 2),
        "c>a>b": (1, 3),
    }
