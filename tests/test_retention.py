from datetime import datetime

from cardinalhq_otel_collector_spark.operators.retention import cohort_retention


def test_cohort_retention_hand_computed(spark):
    # cohort A (week of Jan 5 2026, a Monday): users 1,2 active wk0;
    # user 1 returns wk1 and wk3, user 2 churns.
    # cohort B (week of Jan 12): user 3 active wk0 only.
    rows = [
        (1, datetime(2026, 1, 5, 10)),
        (1, datetime(2026, 1, 7, 10)),    # same week -> one activity row
        (2, datetime(2026, 1, 6, 10)),
        (1, datetime(2026, 1, 13, 10)),   # wk1
        (1, datetime(2026, 1, 28, 10)),   # wk3
        (3, datetime(2026, 1, 12, 10)),   # cohort B wk0
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df).collect()
    }
    assert got == {
        ("2026-01-05", 0): 2,
        ("2026-01-05", 1): 1,
        ("2026-01-05", 3): 1,
        ("2026-01-12", 0): 1,
    }


def test_new_user_curve_hand_computed(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.retention import (
        new_user_curve,
    )

    T = dt.datetime.fromisoformat
    df = spark.createDataFrame(
        [
            (10, T("2024-01-01 08:00:00")),
            (10, T("2024-01-03 08:00:00")),  # returning, not new
            (11, T("2024-01-01 23:59:59")),
            (12, T("2024-01-03 00:00:00")),
            (13, T("2024-01-05 12:00:00")),
        ],
        "user_id long, ts timestamp",
    )
    rows = {
        r.bucket: (r.n_new, r.cum_users)
        for r in new_user_curve(df).collect()
    }
    assert rows == {
        T("2024-01-01 00:00:00"): (2, 2),
        T("2024-01-03 00:00:00"): (1, 3),
        T("2024-01-05 00:00:00"): (1, 4),
    }
    # no bucket for days without first-seen users (sparse, not densified)
    assert len(rows) == 3
