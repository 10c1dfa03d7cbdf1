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
