from cardinalhq_otel_collector_spark.datagen import summaries_fixture
from cardinalhq_otel_collector_spark.operators.summary_split import summary_split

I64_MAX = 2**63 - 1


def test_summary_split_goldens(spark):
    """Pin the reference's split semantics
    (summarysplitprocessor/metrics_test.go:28-200)."""
    out = summary_split(summaries_fixture(spark)).collect()
    by_metric = {r["metric"]: r for r in out}

    # naming: 0 -> .min, 1 -> .max, 0.5 -> .quantile.50, 0.999 -> .quantile.99_9
    assert by_metric["http.duration.min"]["value"] == 1.0
    assert by_metric["http.duration.max"]["value"] == 12.0
    assert by_metric["http.duration.quantile.50"]["value"] == 3.0
    assert by_metric["http.duration.quantile.99_9"]["value"] == 9.9
    assert by_metric["http.duration.count"]["value"] == 12.0
    assert by_metric["http.duration.sum"]["value"] == 34.5

    # count clamps at int64 max (metrics.go:118-123)
    assert by_metric["rpc.latency.count"]["value"] == float(I64_MAX)
    # NaN quantile skipped (metrics.go:152-156)
    assert not any(m.startswith("rpc.latency.quantile") and "99" in m for m in by_metric
                   if m != "rpc.latency.quantile.50")
    assert "rpc.latency.quantile.50" in by_metric
    # StartTimestamp := Timestamp when 0 (metrics.go:179-184)
    assert by_metric["rpc.latency.sum"]["start_ts_ms"] == by_metric["rpc.latency.sum"]["ts_ms"]
    # 6 rows for http.duration (count,sum,min,max,2 quantiles) + 3 for rpc.latency
    assert len(out) == 9
