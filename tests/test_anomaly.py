import math
from datetime import datetime, timedelta

from cardinalhq_otel_collector_spark.operators.anomaly import (
    bucket_counts,
    rolling_zscore,
)


def _events(spark, counts_by_hour, etype="error"):
    """One row per event; counts_by_hour maps hour-index -> n events."""
    rows = []
    eid = 0
    for h, n in counts_by_hour.items():
        for i in range(n):
            rows.append(
                (eid, etype, datetime(2026, 1, 1) + timedelta(hours=h, minutes=i % 60))
            )
            eid += 1
    return spark.createDataFrame(rows, ["event_id", "event_type", "ts"])


def test_bucket_counts_densify_fills_zero(spark):
    # events in hours 0, 1, 4 — densify must create n=0 rows for 2 and 3
    df = _events(spark, {0: 2, 1: 1, 4: 3})
    out = bucket_counts(df, ["event_type"], densify=True)
    got = {
        r["bucket_start"].hour: r["n"]
        for r in out.collect()
    }
    assert got == {0: 2, 1: 1, 2: 0, 3: 0, 4: 3}


def test_bucket_counts_span_is_per_entity(spark):
    # entity b lives only in hour 10 — it must NOT inherit a's 0-4 span
    df = _events(spark, {0: 1, 4: 1}, "a").union(_events(spark, {10: 1}, "b"))
    out = bucket_counts(df, ["event_type"], densify=True)
    spans = {}
    for r in out.collect():
        spans.setdefault(r["event_type"], []).append(r["bucket_start"].hour)
    assert sorted(spans["a"]) == [0, 1, 2, 3, 4]
    assert spans["b"] == [10]


def test_rolling_zscore_hand_computed(spark):
    # baseline [1,2,3] (mean 2, var_samp 1), scored value 5 -> z = 3.0
    counts = spark.createDataFrame(
        [("e", i, v) for i, v in enumerate([1, 2, 3, 5])],
        ["event_type", "bucket", "n"],
    )
    out = rolling_zscore(
        counts, "n", ["event_type"], "bucket",
        lookback=24, min_lookback=3, threshold=2.5,
    )
    rows = {r["bucket"]: r for r in out.collect()}
    # first three rows: baseline shorter than min_lookback -> NULL z, NULL flag
    for b in (0, 1, 2):
        assert rows[b]["zscore"] is None and rows[b]["is_anomaly"] is None
    assert math.isclose(rows[3]["zscore"], 3.0, rel_tol=1e-12)
    assert rows[3]["is_anomaly"] is True


def test_rolling_zscore_excludes_current_and_zero_variance(spark):
    # constant baseline -> zero variance -> NULL even past min_lookback;
    # the scored value itself must not enter the baseline (else variance
    # would be non-zero at bucket 3)
    counts = spark.createDataFrame(
        [("e", i, v) for i, v in enumerate([7, 7, 7, 100, 7])],
        ["event_type", "bucket", "n"],
    )
    out = rolling_zscore(
        counts, "n", ["event_type"], "bucket", lookback=24, min_lookback=2
    )
    rows = {r["bucket"]: r for r in out.collect()}
    assert rows[3]["zscore"] is None  # baseline [7,7,7] has var 0
    # bucket 4's baseline [7,7,7,100] has variance -> scored, and the
    # spike sits in the BASELINE now, so 7 is below the mean
    assert rows[4]["zscore"] is not None and rows[4]["zscore"] < 0


def test_rolling_zscore_trailing_window_only(spark):
    # lookback=2: bucket 3's baseline is rows 1,2 only
    counts = spark.createDataFrame(
        [("e", i, v) for i, v in enumerate([1000, 1, 3, 2])],
        ["event_type", "bucket", "n"],
    )
    out = rolling_zscore(
        counts, "n", ["event_type"], "bucket", lookback=2, min_lookback=2
    )
    rows = {r["bucket"]: r for r in out.collect()}
    # baseline [1,3]: mean 2, var_samp 2, z = (2-2)/sqrt(2) = 0
    assert rows[3]["zscore"] == 0.0
    assert rows[3]["is_anomaly"] is False


def test_anomaly_plan_gates(spark):
    df = _events(spark, {0: 2, 1: 1, 4: 3})
    out = rolling_zscore(
        bucket_counts(df, ["event_type"], densify=True),
        "n", ["event_type"], "bucket_start",
    )
    out.collect()  # finalize the AQE plan before auditing it
    plan = out._jdf.queryExecution().executedPlan().toString()
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    # no Python anywhere; the gap-fill densify is single-lineage — the
    # raw input is scanned ONCE and there is no spine join (a
    # spine+join formulation scans the raw input twice at 100 TB: AQE
    # does not reuse the aggregate exchange between the two references)
    assert "python" not in plan.lower()
    assert logical.count("LogicalRDD") == 1, logical
    assert "Join" not in plan, plan
