from datetime import datetime, timezone

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.aggregate import (
    aggregate_with_override,
    interval_aggregate,
    split_by_flag,
)


def _ts(s):
    return datetime.fromisoformat(s)


def test_rollup_golden_1_2_3_makes_6(spark):
    """The reference's aggregation golden: 3 sum-dps (1,2,3) same tags in one
    10s interval -> exactly one emitted dp with value 6.0
    (processor/aggregationprocessor/metrics_test.go:70-116)."""
    df = spark.createDataFrame(
        [
            ("m", "svc", _ts("2026-01-01 00:00:01"), 1.0, "sum"),
            ("m", "svc", _ts("2026-01-01 00:00:04"), 2.0, "sum"),
            ("m", "svc", _ts("2026-01-01 00:00:09"), 3.0, "sum"),
        ],
        "name string, tag string, ts timestamp, value double, agg_type string",
    )
    out = aggregate_with_override(
        df, keys=["name", "tag"], value_col="value", agg_type_col="agg_type",
        interval="10 seconds",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == 6.0 and r["n"] == 3 and r["agg_type"] == "sum"
    # group-key timestamp = interval START (aggregate.go:64-67)
    assert r["bucket_start"] == _ts("2026-01-01 00:00:00")


def test_agg_type_override_min_max_avg(spark):
    rows = [
        ("a", _ts("2026-01-01 00:00:01"), 1.0, "min"),
        ("a", _ts("2026-01-01 00:00:02"), 5.0, "min"),
        ("b", _ts("2026-01-01 00:00:01"), 1.0, "max"),
        ("b", _ts("2026-01-01 00:00:02"), 5.0, "max"),
        ("c", _ts("2026-01-01 00:00:01"), 1.0, None),  # gauge default = avg
        ("c", _ts("2026-01-01 00:00:02"), 5.0, None),
    ]
    df = spark.createDataFrame(rows, "name string, ts timestamp, value double, agg_type string")
    out = {r["name"]: r for r in aggregate_with_override(
        df, keys=["name"], value_col="value", agg_type_col="agg_type", interval="10 seconds"
    ).collect()}
    assert out["a"]["value"] == 1.0 and out["a"]["agg_type"] == "min"
    assert out["b"]["value"] == 5.0
    assert out["c"]["value"] == 3.0 and out["c"]["agg_type"] == "avg"


def test_interval_boundaries(spark):
    df = spark.createDataFrame(
        [("m", _ts("2026-01-01 00:00:09"), 1.0), ("m", _ts("2026-01-01 00:00:10"), 1.0)],
        "name string, ts timestamp, value double",
    )
    out = interval_aggregate(df, keys=["name"], interval="10 seconds", value_col="value")
    assert out.count() == 2  # 00:00:10 opens the next bucket


def test_split_by_flag(spark):
    df = spark.createDataFrame(
        [(1, True), (2, False), (3, None)], "id int, agg boolean"
    )
    to_agg, passthrough = split_by_flag(df, "agg")
    assert [r["id"] for r in to_agg.collect()] == [1]
    assert sorted(r["id"] for r in passthrough.collect()) == [2, 3]


def test_fan_back_tags_scopes_and_rename(spark):
    """A5 golden (aggregate.go:121-191, metrics_test.go:118-188):
    resource.* -> resource attrs, instrumentation.* -> scope attrs,
    metric.* -> dp attrs, metadata.metric.name renames the metric."""
    from cardinalhq_otel_collector_spark.operators.aggregate import fan_back_tags

    df = spark.createDataFrame(
        [("old.name", "svc-1", "lib-a", "us-east", "new.name", 6.0)],
        "name string, `resource.service.name` string, "
        "`instrumentation.lib` string, `metric.region` string, "
        "`metadata.metric.name` string, value double",
    )
    r = fan_back_tags(df).collect()[0]
    assert r["name"] == "new.name"
    assert r["resource_attrs"] == {"service.name": "svc-1"}
    assert r["scope_attrs"] == {"lib": "lib-a"}
    assert r["dp_attrs"] == {"region": "us-east"}
    assert r["value"] == 6.0
    # prefixed flat columns consumed
    assert "resource.service.name" not in r.asDict()


def test_fan_back_tags_null_metadata_keeps_name(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import fan_back_tags

    df = spark.createDataFrame(
        [("keep.name", None)], "name string, `metadata.metric.name` string"
    )
    assert fan_back_tags(df).collect()[0]["name"] == "keep.name"


def test_interval_stats_null_values_ignored_in_avg(spark):
    """NULL datapoint values: n counts rows, but avg divides by the
    non-null count (F.avg semantics) — NULLs are not treated as 0."""
    import datetime

    from cardinalhq_otel_collector_spark.operators.aggregate import interval_stats

    t = datetime.datetime(2026, 1, 1, 0, 0, 1)
    df = spark.createDataFrame(
        [("k", t, 2.0), ("k", t, None), ("k", t, 4.0)],
        "key string, ts timestamp, value double",
    )
    row = interval_stats(df, keys=["key"], value_col="value", interval="1 hour").collect()[0]
    assert row["n"] == 3
    assert row["sum_value"] == 6.0
    assert row["avg_value"] == 3.0  # 6/2, not 6/3


def test_group_percentiles_interpolation(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import group_percentiles

    df = spark.createDataFrame(
        [("a", float(v)) for v in range(1, 5)] + [("b", 10.0)],
        "k string, value double",
    )
    got = {r.k: (r.n, r.p50, r.p95, r.p99)
           for r in group_percentiles(df, "value", ["k"]).collect()}
    # a: values 1..4 → p50 = 2.5 (linear interp), p95 = 1+3·0.95 = 3.85
    assert got["a"] == (4, 2.5, 3.85, 3.97)
    assert got["b"] == (1, 10.0, 10.0, 10.0)


def test_winsorize_clips_to_group_bounds(spark):
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.operators.aggregate import winsorize

    # group g: values 0..100 -> p05=5, p95=95 (exact interpolation on
    # 101 evenly spaced points); group h: constant, nothing clips
    rows = [("g", float(i)) for i in range(101)] + [("h", 7.0)] * 5
    df = spark.createDataFrame(rows, "k string, v double")
    out = winsorize(df, "v", ["k"], 0.05, 0.95)
    g = [r for r in out.collect() if r.k == "g"]
    assert min(r.v_winsorized for r in g) == 5.0
    assert max(r.v_winsorized for r in g) == 95.0
    # interior values untouched
    assert all(r.v_winsorized == r.v for r in g if 5.0 <= r.v <= 95.0)
    h = [r for r in out.collect() if r.k == "h"]
    assert all(r.v_winsorized == 7.0 for r in h)
