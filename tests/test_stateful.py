from datetime import datetime

from cardinalhq_otel_collector_spark.operators.stateful import (
    cumulative_to_delta,
    delta_to_cumulative,
    delta_to_rate,
    fill_start_time,
    interval_last,
)


def _ts(s):
    return datetime.fromisoformat(s)


def _series(spark):
    return spark.createDataFrame(
        [
            ("a", _ts("2026-01-01 00:00:00"), 10.0),
            ("a", _ts("2026-01-01 00:00:10"), 15.0),
            ("a", _ts("2026-01-01 00:00:30"), 15.0),
            ("b", _ts("2026-01-01 00:00:00"), 1.0),
            ("b", _ts("2026-01-01 00:00:10"), 4.0),
        ],
        "series string, ts timestamp, value double",
    )


def test_cumulative_to_delta(spark):
    out = cumulative_to_delta(_series(spark), ["series"], "value")
    got = {(r["series"], r["ts"].second): r["delta"] for r in out.collect()}
    assert got[("a", 0)] is None
    assert got[("a", 10)] == 5.0
    assert got[("a", 30)] == 0.0
    assert got[("b", 10)] == 3.0


def test_delta_to_cumulative_roundtrip(spark):
    df = _series(spark)
    deltas = cumulative_to_delta(df, ["series"], "value")
    from pyspark.sql import functions as F

    deltas = deltas.withColumn("delta", F.coalesce("delta", "value"))
    back = delta_to_cumulative(deltas, ["series"], "delta", out_col="cum")
    for r in back.collect():
        assert r["cum"] == r["value"]


def test_delta_to_rate(spark):
    out = delta_to_rate(_series(spark), ["series"], "value")
    got = {(r["series"], r["ts"].second): r["rate"] for r in out.collect()}
    assert got[("a", 10)] == 0.5   # 5 over 10s
    assert got[("a", 30)] == 0.0
    assert got[("b", 10)] == 0.3


def test_fill_start_time(spark):
    out = fill_start_time(_series(spark), ["series"])
    for r in out.collect():
        expect = _ts("2026-01-01 00:00:00")
        assert r["start_ts"] == expect


def test_interval_last(spark):
    out = interval_last(_series(spark), ["series"], "value", interval="60 seconds")
    got = {r["series"]: r for r in out.collect()}
    assert got["a"]["last_value"] == 15.0 and got["a"]["last_ts"] == _ts("2026-01-01 00:00:30")
    assert got["b"]["last_value"] == 4.0
