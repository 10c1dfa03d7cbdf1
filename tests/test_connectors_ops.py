"""failover / round-robin connectors, genai normalizer, histograms,
grouping, unroll, A5 additional_attributes — operator-level goldens."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.aggregate import aggregate_with_override
from cardinalhq_otel_collector_spark.operators.genai import normalize_genai
from cardinalhq_otel_collector_spark.operators.grouping import assemble_ordered
from cardinalhq_otel_collector_spark.operators.histogram import latency_histogram
from cardinalhq_otel_collector_spark.operators.unroll import unroll_with_index
from cardinalhq_otel_collector_spark.sources.catalog import Catalog
from cardinalhq_otel_collector_spark.sources.connectors import (
    failover_write,
    round_robin_assign,
)


def test_failover_falls_through_to_healthy_sink(spark, tmp_path):
    """failoverconnector (manifest :278): first healthy level wins."""
    df = spark.range(10)
    bad = Catalog(spark, str(tmp_path / "bad"))
    bad.write = lambda *a, **k: (_ for _ in ()).throw(IOError("sink down"))
    good = Catalog(spark, str(tmp_path / "good"))
    winner = failover_write(df, [bad, good], "t")
    assert winner == 1
    assert good.read("t").count() == 10


def test_failover_raises_when_all_levels_fail(spark, tmp_path):
    df = spark.range(3)
    bad = Catalog(spark, str(tmp_path / "b1"))
    bad.write = lambda *a, **k: (_ for _ in ()).throw(IOError("down"))
    with pytest.raises(IOError):
        failover_write(df, [bad, bad], "t")


def test_round_robin_deterministic_and_balanced(spark):
    """roundrobinconnector (manifest :281): md5-mod assignment is stable
    under repartitioning and roughly uniform."""
    df = spark.range(1000).withColumnRenamed("id", "k")
    a = {r["k"]: r["rr_sink"] for r in round_robin_assign(df, 4, "k").collect()}
    b = {
        r["k"]: r["rr_sink"]
        for r in round_robin_assign(df.repartition(7), 4, "k").collect()
    }
    assert a == b
    counts = {}
    for s in a.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {0, 1, 2, 3}
    assert all(150 < c < 350 for c in counts.values())


def test_genai_role_and_model_normalization(spark):
    df = spark.createDataFrame(
        [
            ("Human", "gpt-4-turbo-2024-04-09"),
            ("AI", "claude-3-opus-20240229"),
            ("function", "gemini-1.5-pro-latest"),
            ("weird_role", "llama-3-70b"),
        ],
        "role string, model string",
    )
    rows = normalize_genai(df, role_col="role", model_col="model").collect()
    got = {(r["role_raw"]): (r["role"], r["gen_ai_system"], r["gen_ai_request_model"]) for r in rows}
    assert got["Human"] == ("user", "openai", "gpt-4")
    assert got["AI"] == ("assistant", "anthropic", "claude-3-opus")
    assert got["function"] == ("tool", "gcp.gemini", "gemini-1.5-pro")
    assert got["weird_role"] == ("weird_role", "meta", "llama-3-70b")


def test_latency_histogram_le_buckets(spark):
    df = spark.createDataFrame(
        [(10.0,), (50.0,), (51.0,), (500.0,)], "value double"
    ).withColumn("ts", F.timestamp_seconds(F.lit(1767225600))).withColumn(
        "svc", F.lit("a")
    )
    out = latency_histogram(df, keys=["svc"], value_col="value", bounds=[50.0, 100.0])
    got = {r["le"]: r["bucket_count"] for r in out.collect()}
    # OTLP convention: value <= bound in that bucket (50.0 -> le=50)
    assert got == {"50": 2, "100": 1, "+Inf": 1}


def test_aggregate_override_additional_attributes_golden(spark):
    """A5 golden (aggregationprocessor/config.go:24-31 + the 1+2+3 -> 6.0
    sum shape): emitted aggregate rows carry the configured extra tags."""
    df = spark.createDataFrame(
        [("m", "sum", 1.0), ("m", "sum", 2.0), ("m", "sum", 3.0)],
        "name string, agg_type string, value double",
    ).withColumn("ts", F.timestamp_seconds(F.lit(1767225600)))
    out = aggregate_with_override(
        df, keys=["name"], value_col="value", agg_type_col="agg_type",
        interval="1 hour",
        additional_attributes={"_cardinalhq_aggregated": "true", "tier": "agg"},
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == 6.0 and r["n"] == 3 and r["agg_type"] == "sum"
    assert r["_cardinalhq_aggregated"] == "true" and r["tier"] == "agg"


def test_assemble_ordered_partitioning_independent(spark):
    rows = [("c1", i, f"e{i}") for i in range(20)]
    df1 = spark.createDataFrame(rows, "g string, o int, p string").repartition(1)
    df2 = spark.createDataFrame(list(reversed(rows)), "g string, o int, p string").repartition(5)
    s1 = assemble_ordered(df1, "g", ["o"], "p").collect()[0]["seq"]
    s2 = assemble_ordered(df2, "g", ["o"], "p").collect()[0]["seq"]
    assert s1 == s2 == ",".join(f"e{i}" for i in range(20))


def test_unroll_with_index(spark):
    df = spark.createDataFrame([(1, ["a", "b", "c"])], "id int, xs array<string>")
    rows = unroll_with_index(df, "xs", "x").collect()
    assert [(r["element_idx"], r["x"]) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_failover_permanent_plan_error_raises_immediately(spark, tmp_path):
    """A bad partition column is a PLAN bug (AnalysisException — permanent,
    identical at every level, notifier.go:370-409's 4xx analogue): it must
    surface, not silently fail over to the secondary sink."""
    from pyspark.errors import AnalysisException

    df = spark.range(5)
    primary = Catalog(spark, str(tmp_path / "p"))
    secondary = Catalog(spark, str(tmp_path / "s"))
    with pytest.raises(AnalysisException):
        failover_write(df, [primary, secondary], "t", partition_by=["no_such_column"])
    # nothing was written anywhere — the failover did NOT mask the bug
    import os

    assert not os.path.exists(str(tmp_path / "s" / "t"))
