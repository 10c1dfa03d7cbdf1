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


def test_hyperplane_buckets_plans_no_join(spark):
    """Round 6: the plane weights are constant-folded literals, so the
    bucketing is one hash aggregate — no join of any strategy, and only
    the aggregate's own exchange."""
    emb = spark.createDataFrame(
        [(1, [0.1] * 8)], "vec_id long, embedding array<double>"
    )
    plan = _plan(hyperplane_buckets(emb, bits=2, n_bands=1, dim=8))
    assert "Join" not in plan  # weights are literals, nothing to join
    assert plan.count("HashAggregate") >= 2  # map-side combine
    assert "Python" not in plan


def test_authcache_enrich_is_broadcast(spark):
    cache = AuthCache(validator=lambda k: ValidateResponse("c1", "one", True))
    cache.authenticate("k1", now=0.0)
    rows = spark.createDataFrame([("k1",)], "api_key string")
    plan = _plan(cache.enrich(rows, now=1.0))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pivot_counts_zero_fill_and_fixed_schema(spark):
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.operators.grouping import pivot_counts

    df = spark.createDataFrame(
        [("d1", "x"), ("d1", "x"), ("d2", "y")], "day string, t string"
    )
    out = pivot_counts(df, "day", "t", ["x", "y", "z"])
    # schema is the category list, independent of the data
    assert out.columns == ["day", "x", "y", "z"]
    rows = {r.day: (r.x, r.y, r.z) for r in out.collect()}
    assert rows == {"d1": (2, 0, 0), "d2": (0, 1, 0)}
    # composite row key
    out2 = pivot_counts(
        df.withColumn("g", F.lit(1)), ["g", "day"], "t", ["x"]
    )
    assert out2.columns == ["g", "day", "x"]


def test_token_entropy_hand_computed(spark):
    import math

    from cardinalhq_otel_collector_spark.operators.textstats import token_entropy

    df = spark.createDataFrame(
        [
            (1, "a a a a"),             # degenerate → 0
            (2, "a b c d"),             # uniform over 4 → ln(4)
            (3, "a a b"),               # H = ln3 - (2 ln2)/3
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.entropy) for r in token_entropy(df).collect()}
    assert got[1] == (4, 0.0)
    assert got[2] == (4, round(math.log(4), 6))
    assert got[3] == (3, round(math.log(3) - 2 * math.log(2) / 3, 6))


def test_remove_high_df_tokens_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import (
        remove_high_df_tokens,
    )

    # 4 docs; 'the' in 4/4 (df 1.0), 'cat' in 2/4, 'dog' in 1/4
    df = spark.createDataFrame(
        [
            (1, "the cat sat the"),
            (2, "the cat"),
            (3, "the dog"),
            (4, "the"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.text_filtered, r.n_kept, r.n_removed)
        for r in remove_high_df_tokens(df, max_df_ratio=0.5).collect()
    }
    # 'the' (df 1.0) removed everywhere; order of survivors preserved
    assert out[1] == ("cat sat", 2, 2)
    assert out[2] == ("cat", 1, 1)
    assert out[3] == ("dog", 1, 1)
    # a fully-boilerplate document survives as an EMPTY row, not a drop
    assert out[4] == ("", 0, 1)


def test_scd2_enrich_versioning_and_boundaries(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.enrich import scd2_enrich

    T = dt.datetime.fromisoformat
    facts = spark.createDataFrame(
        [
            (1, "k1", T("2019-06-01 00:00:00")),  # before any version → NULL
            (2, "k1", T("2020-06-01 00:00:00")),  # v1
            (3, "k1", T("2021-01-01 00:00:00")),  # EXACTLY v2.valid_from → v2
            (4, "k1", T("2025-01-01 00:00:00")),  # open-ended current → v2
            (5, "k2", T("2020-06-01 00:00:00")),  # key without dim rows → NULL
        ],
        "fact_id long, k string, ts timestamp",
    )
    dim = spark.createDataFrame(
        [
            ("k1", T("2020-01-01 00:00:00"), T("2021-01-01 00:00:00"), "v1"),
            ("k1", T("2021-01-01 00:00:00"), None, "v2"),
        ],
        "k string, valid_from timestamp, valid_to timestamp, ver string",
    )
    got = {
        r.fact_id: r.dim_ver
        for r in scd2_enrich(facts, dim, key="k", payload=["ver"]).collect()
    }
    assert got == {1: None, 2: "v1", 3: "v2", 4: "v2", 5: None}
