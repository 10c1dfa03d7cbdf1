"""Plan-quality gates for the round-2 operators (same obligations as
test_plans.py): JVM-only row paths, broadcast lookups, single-pass shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.authcache import (
    AuthCache,
    ValidateResponse,
)
from cardinalhq_otel_collector_spark.operators.genai import normalize_genai
from cardinalhq_otel_collector_spark.operators.histogram import latency_histogram
from cardinalhq_otel_collector_spark.operators.marshal import sumo_ic_lines
from cardinalhq_otel_collector_spark.operators.similarity import hyperplane_buckets


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_sumo_marshal_is_pure_projection(spark):
    df = spark.createDataFrame([("b", "c")], "body string, cat string").withColumn(
        "ts", F.timestamp_seconds(F.lit(0))
    )
    out = sumo_ic_lines(
        df, source_name=F.lit("n"), source_host=F.lit("h"),
        source_category=F.col("cat"), body=F.col("body"), ts=F.col("ts"),
    )
    plan = _plan(out)
    assert "Python" not in plan and "Exchange" not in plan  # no shuffle, no UDF


def test_genai_normalize_is_jvm_projection(spark):
    df = spark.createDataFrame([("Human", "gpt-4")], "role string, model string")
    plan = _plan(normalize_genai(df, model_col="model"))
    assert "Python" not in plan and "Exchange" not in plan


def test_histogram_is_two_phase_hash_agg(spark):
    df = spark.createDataFrame([(1.0,)], "value double").withColumn(
        "ts", F.timestamp_seconds(F.lit(0))
    ).withColumn("k", F.lit("a"))
    plan = _plan(latency_histogram(df, keys=["k"], value_col="value", bounds=[1.0]))
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert "Python" not in plan


def test_hyperplane_buckets_broadcasts_plane_table(spark):
    emb = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id long, embedding array<double>"
    )
    plan = _plan(hyperplane_buckets(emb, bits=2, n_bands=1, dim=8))
    assert "BroadcastHashJoin" in plan  # plane table broadcast, never shuffled
    assert "Python" not in plan


def test_authcache_enrich_is_broadcast(spark):
    cache = AuthCache(validator=lambda k: ValidateResponse("c1", "one", True))
    cache.authenticate("k1", now=0.0)
    rows = spark.createDataFrame([("k1",)], "api_key string")
    plan = _plan(cache.enrich(rows, now=1.0))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
