from datetime import datetime

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.functions import (
    clamp_int64,
    deterministic_bucket,
    json_line,
    object_key,
    strftime_partition_key,
    url_encode,
)

I64_MAX = 2**63 - 1


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_partition_key_golden(spark):
    """Byte-exact partition keys, mirroring partition_test.go:120-151."""
    ts = F.to_timestamp(F.lit("2024-01-24 06:40:13"))
    assert (
        _one(spark, strftime_partition_key(ts))
        == "year=2024/month=01/day=24/hour=06/minute=40"
    )
    assert _one(spark, strftime_partition_key(ts, "hour")) == "year=2024/month=01/day=24/hour=06"


def test_object_key_golden(spark):
    ts = F.to_timestamp(F.lit("2024-01-24 06:40:13"))
    key = object_key(ts, "base/path/telemetry", "signal-", "metrics", F.lit("p007"), fmt="gz")
    assert (
        _one(spark, key)
        == "base/path/telemetry/year=2024/month=01/day=24/hour=06/minute=40/signal-metrics_p007.gz"
    )


def test_url_encode(spark):
    assert _one(spark, url_encode(F.lit("a b/c+d"))) == "a+b%2Fc%2Bd"


def test_clamp(spark):
    assert _one(spark, clamp_int64(F.lit(12))) == 12
    big = spark.createDataFrame([(float(2**64),)], "x double")
    assert big.select(clamp_int64(F.col("x")).alias("v")).collect()[0]["v"] == float(I64_MAX)


def test_json_line(spark):
    line = _one(spark, json_line(a=F.lit("x"), n=F.lit(3)))
    assert line == '{"a":"x","n":3}'


def test_deterministic_bucket_uniform(spark):
    df = spark.range(10000).select(deterministic_bucket(F.col("id"), 10).alias("b"))
    counts = {r["b"]: r["n"] for r in df.groupBy("b").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(10))
    assert all(abs(n - 1000) < 150 for n in counts.values())
