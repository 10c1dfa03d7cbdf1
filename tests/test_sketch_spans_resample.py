"""Batch-7 operators: KMV distinct sketch, prefix-filter Jaccard join,
interval union, LOCF resample — hand-computed goldens plus the
structural guarantees (exactness below k, no false negatives vs a naive
join, island contiguity, carry-forward across empty steps)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.dedup import prefix_jaccard_pairs
from cardinalhq_otel_collector_spark.operators.resample import locf_resample
from cardinalhq_otel_collector_spark.operators.sketch import kmv_distinct
from cardinalhq_otel_collector_spark.operators.spans import merge_intervals


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# ---------------------------------------------------------------- KMV

def test_kmv_exact_below_k(spark):
    rows = [("g", f"v{i}") for i in range(10) for _ in (0, 1)]  # 10 distinct, dup'd
    df = spark.createDataFrame(rows, "g string, v string")
    out = kmv_distinct(df, "v", ["g"], k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_kept == 10 and r.kth_hash is None and r.est_distinct == 10


def test_kmv_estimate_within_tolerance(spark):
    # 5000 distinct values, k=64: KMV standard error is ~1/sqrt(k-2) ≈ 13%;
    # assert a loose 4-sigma band — the estimator is deterministic, so this
    # pins behavior, not luck.
    df = spark.range(5000).select(F.lit("g").alias("g"), F.col("id").cast("string").alias("v"))
    r = kmv_distinct(df, "v", ["g"], k=64).collect()[0]
    assert r.n_kept == 64 and r.kth_hash is not None
    assert 5000 * 0.5 < r.est_distinct < 5000 * 1.5


def test_kmv_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("g", "a"), ("g", None), ("g", "b")], "g string, v string"
    )
    r = kmv_distinct(df, "v", ["g"], k=8).collect()[0]
    assert r.est_distinct == 2


# ------------------------------------------------- prefix Jaccard join

def _naive_pairs(spark, docs):
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .where(F.col("t") != "")
        .distinct()
    )
    a = toks.select(F.col("doc_id").alias("a"), "t")
    b = toks.select(F.col("doc_id").alias("b"), "t")
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        a.join(b, "t")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("sz").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("sz").alias("nb"))
    return {
        (r.a, r.b, r.inter, r.na + r.nb - r.inter)
        for r in inter.join(sa, "a").join(sb, "b").collect()
        if 2 * r.inter >= 1 * (r.na + r.nb - r.inter)  # tau = 1/2
    }


def test_prefix_jaccard_matches_naive(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown fox leaps"),   # J(1,2) = 4/6 = 0.67
            (3, "lorem ipsum dolor sit amet"),
            (4, "lorem ipsum dolor sit amet"),  # J(3,4) = 1.0
            (5, "completely different words here now"),
            (6, "the quick red fox jumps"),     # J(1,6) = 4/6
        ],
        "doc_id long, text string",
    )
    got = {
        (r.a, r.b, r.inter_size, r.union_size)
        for r in prefix_jaccard_pairs(docs, tau_num=1, tau_den=2).collect()
    }
    assert got == _naive_pairs(spark, docs)
    assert (3, 4, 5, 5) in got  # the identical pair survives at J=1


def test_prefix_jaccard_no_false_positives(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "a b c z y x w v u t")],
        "doc_id long, text string",
    )
    # J = 3/17 < 0.5: the pair may be a candidate (shared rare tokens) but
    # must be verified away.
    assert prefix_jaccard_pairs(docs, tau_num=1, tau_den=2).count() == 0


# ------------------------------------------------------ interval union

def test_merge_intervals_golden(spark):
    df = spark.createDataFrame(
        [
            # user 1: [0,10] + [5,20] merge; [21,30] separate (gap of 1)
            (1, 1, 0, 10),
            (2, 1, 5, 20),
            (3, 1, 21, 30),
            # touching intervals merge ([30,40] + [40,50])
            (4, 2, 30, 40),
            (5, 2, 40, 50),
            # contained interval does not extend the island
            (6, 3, 0, 100),
            (7, 3, 10, 20),
        ],
        "event_id long, user_id long, start_us long, end_us long",
    )
    out = {
        (r.user_id, r.span_start, r.span_end, r.n_merged, r.covered)
        for r in merge_intervals(
            df, ["user_id"], "start_us", "end_us", "event_id"
        ).collect()
    }
    assert out == {
        (1, 0, 20, 2, 20),
        (1, 21, 30, 1, 9),
        (2, 30, 50, 2, 20),
        (3, 0, 100, 2, 100),
    }


def test_merge_intervals_one_exchange(spark):
    df = spark.createDataFrame(
        [(1, 1, 0, 10)], "event_id long, user_id long, start_us long, end_us long"
    )
    plan = (
        merge_intervals(df, ["user_id"], "start_us", "end_us", "event_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # both windows + the final agg's map side share the user_id exchange:
    # exactly one shuffle below the aggregate's own
    assert plan.count("Exchange") <= 2


# ------------------------------------------------------- LOCF resample

def test_locf_fills_gaps_and_carries_forward(spark):
    df = spark.createDataFrame(
        [
            (1, 7, _ts("2024-01-01 00:10:00"), 5.9),   # hour 0 -> 5
            (2, 7, _ts("2024-01-01 00:50:00"), 7.2),   # hour 0 later -> 7 wins
            (3, 7, _ts("2024-01-01 03:10:00"), 9.0),   # hours 1,2 empty -> LOCF 7
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = {
        (r.step_start.hour, r.value)
        for r in locf_resample(
            df, ["user_id"], "ts", "value", 3600, order_tiebreak="event_id"
        ).collect()
    }
    assert out == {(0, 7), (1, 7), (2, 7), (3, 9)}


def test_locf_per_series_isolated_grids(spark):
    df = spark.createDataFrame(
        [
            (1, 1, _ts("2024-01-01 00:00:00"), 1.0),
            (2, 1, _ts("2024-01-01 02:00:00"), 2.0),
            (3, 2, _ts("2024-01-01 05:00:00"), 3.0),  # series 2: single step
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    rows = locf_resample(
        df, ["user_id"], "ts", "value", 3600, order_tiebreak="event_id"
    ).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 3  # hours 0..2, its own bounds
    assert len(by_user[2]) == 1  # hour 5 only — no cross-series grid bleed
    assert all(r.value is not None for r in rows)


# --------------------------------------------------------- count-min

def test_cms_upper_bounds_and_exact_when_sparse(spark):
    from cardinalhq_otel_collector_spark.operators.cms import cms_counts

    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 1
    df = spark.createDataFrame(rows, "k string")
    got = {r.k: r.est_n for r in cms_counts(df, "k", depth=4, width=256).collect()}
    true = {"a": 5, "b": 3, "c": 1}
    assert set(got) == set(true)
    # CMS never under-counts; with 3 keys in 256 cells it is exact
    for k, n in true.items():
        assert got[k] >= n
    assert got == true


def test_cms_collisions_overcount_never_undercount(spark):
    from cardinalhq_otel_collector_spark.operators.cms import cms_counts

    # 500 keys into a tiny 2x8 grid: collisions guaranteed
    df = spark.range(500).select(F.col("id").cast("string").alias("k"))
    got = cms_counts(df, "k", depth=2, width=8).collect()
    assert len(got) == 500
    assert all(r.est_n >= 1 for r in got)
    assert any(r.est_n > 1 for r in got)  # the grid is saturated


# ----------------------------------------------------------- mixture

def test_mixture_weights_and_zero_drop(spark):
    from cardinalhq_otel_collector_spark.operators.mixture import materialize_mixture

    df = spark.createDataFrame(
        [(1, "keep2"), (2, "keep1"), (3, "drop"), (4, "unknown_src")],
        "doc_id long, source string",
    )
    out = materialize_mixture(df, {"keep2": 2, "keep1": 1, "drop": 0}, shards=8).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.copy_idx)
    assert sorted(by_doc[1]) == [1, 2]
    assert by_doc[2] == [1]
    assert 3 not in by_doc and 4 not in by_doc
    assert all(0 <= r.shard < 8 for r in out)


def test_mixture_shard_deterministic(spark):
    from cardinalhq_otel_collector_spark.operators.mixture import materialize_mixture

    df = spark.createDataFrame([(1, "s")], "doc_id long, source string")
    a = materialize_mixture(df, {"s": 3}, shards=16).collect()
    b = materialize_mixture(df, {"s": 3}, shards=16).collect()
    assert {(r.copy_idx, r.shard) for r in a} == {(r.copy_idx, r.shard) for r in b}


# ------------------------------------------------------ time-weighted

def test_time_weighted_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import time_weighted

    df = spark.createDataFrame(
        [
            # v=2 for 10 µs, v=4 for 5 µs, last obs contributes 0
            (1, 1, _ts("2024-01-01 00:00:00"), 2.9),
            (2, 1, _ts("2024-01-01 00:00:00.000010"), 4.0),
            (3, 1, _ts("2024-01-01 00:00:00.000015"), 99.0),
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    r = time_weighted(df, ["user_id"], "ts", "value", "event_id").collect()[0]
    assert r.n_obs == 3
    assert r.weighted_sum == 2 * 10 + 4 * 5
    assert r.duration_us == 15


def test_time_weighted_single_obs_zero(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import time_weighted

    df = spark.createDataFrame(
        [(1, 1, _ts("2024-01-01 00:00:00"), 7.0)],
        "event_id long, user_id long, ts timestamp, value double",
    )
    r = time_weighted(df, ["user_id"], "ts", "value", "event_id").collect()[0]
    assert r.weighted_sum == 0 and r.duration_us == 0 and r.n_obs == 1


# ------------------------------------------------------- MAD outliers

def test_mad_outliers_flags_only_the_spike(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import mad_outliers

    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.2, 9.8, 1000.0]
    df = spark.createDataFrame(
        [(i, "t", v) for i, v in enumerate(vals)], "event_id long, k string, value double"
    )
    out = mad_outliers(df, "value", ["k"]).collect()
    assert [r.event_id for r in out] == [7]
    assert out[0].med == 10.1  # median of the 8 values


def test_mad_outliers_zero_mad_group_flags_any_deviation(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import mad_outliers

    # constant group: MAD=0, a single deviating row is > k*0
    df = spark.createDataFrame(
        [(i, "t", 5.0) for i in range(9)] + [(9, "t", 5.1)],
        "event_id long, k string, value double",
    )
    out = mad_outliers(df, "value", ["k"]).collect()
    assert [r.event_id for r in out] == [9]
