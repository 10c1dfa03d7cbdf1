"""Plan-shape gates for the batch 7-13 operators: the property being
pinned is the SHUFFLE/BROADCAST structure, not the numbers — a
regression that silently turns a broadcast into a shuffle or adds an
Exchange is a 100-TB incident that small-data correctness tests can't
see."""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mixture_has_zero_exchanges(spark):
    from cardinalhq_otel_collector_spark.operators.mixture import materialize_mixture

    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    p = _plan(materialize_mixture(df, {"s": 2}, shards=8))
    assert "Exchange" not in p  # scan -> explode -> project, nothing else


def test_cms_grid_is_broadcast(spark):
    from cardinalhq_otel_collector_spark.operators.cms import cms_counts

    df = spark.createDataFrame([("a",)], "k string")
    p = _plan(cms_counts(df, "k"))
    assert "BroadcastExchange" in p or "BroadcastHashJoin" in p


def test_bloom_big_side_never_shuffles(spark):
    from cardinalhq_otel_collector_spark.operators.bloomjoin import bloom_semi_filter

    big = spark.range(100).select(F.col("id").alias("user_id"))
    small = spark.createDataFrame([(1,)], "user_id long")
    p = _plan(bloom_semi_filter(big, small, "user_id"))
    # the only Exchange allowed is the broadcast of the one-row bit-set
    # (plus the small side's own aggregation); the big side's lineage is
    # scan -> filter with no hash-partitioning Exchange
    for line in p.splitlines():
        if "Exchange hashpartitioning" in line and "user_id" in line:
            raise AssertionError(f"big side shuffled: {line}")
    assert "BroadcastExchange" in p or "BroadcastNestedLoopJoin" in p


def test_time_weighted_single_data_exchange(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import time_weighted

    import datetime as dt

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), 1.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    p = _plan(time_weighted(df, ["user_id"], "ts", "value", "event_id"))
    # lead window and final agg share the user_id partitioning: one
    # data Exchange (the final agg's own partial/final pair adds none
    # because the stream is already partitioned by the group key)
    assert p.count("Exchange") <= 2


def test_merge_and_rle_share_one_exchange_each(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sessionize import run_length_encode

    df = spark.createDataFrame(
        [(1, 1, dt.datetime(2024, 1, 1), "up")],
        "event_id long, user_id long, ts timestamp, state string",
    )
    p = _plan(run_length_encode(df, ["user_id"], "state", "ts", "event_id"))
    assert p.count("Exchange") <= 2


def test_trim_to_budget_one_exchange(spark):
    from cardinalhq_otel_collector_spark.operators.context import trim_to_budget

    df = spark.createDataFrame(
        [(1, 0, 10)], "conv_id long, turn_idx long, token_n long"
    )
    p = _plan(trim_to_budget(df, "conv_id", "turn_idx", "token_n", 100))
    assert p.count("Exchange") == 1


def test_zorder_key_is_pure_projection(spark):
    from cardinalhq_otel_collector_spark.functions import z_order_key

    df = spark.createDataFrame([(1, 2)], "a long, b long")
    p = _plan(df.select(z_order_key(F.col("a"), F.col("b"), 8).alias("z")))
    # "*(" is the WholeStageCodegen stage marker in executedPlan toString
    assert "Exchange" not in p and ("*(" in p or "WholeStageCodegen" in p)


def test_kmv_no_python_and_bounded_exchanges(spark):
    from cardinalhq_otel_collector_spark.operators.sketch import kmv_distinct

    df = spark.createDataFrame([("g", "v")], "g string, v string")
    p = _plan(kmv_distinct(df, "v", ["g"]))
    assert "Python" not in p  # md5/conv, never a UDF
    assert p.count("Exchange") <= 3  # dedup + window + (AQE-reusable) agg
