"""Batch-12 operators: source overlap, basket lift, percent rank, RLE."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.dedup import source_overlap
from cardinalhq_otel_collector_spark.operators.grouping import percent_rank_scale
from cardinalhq_otel_collector_spark.operators.sessionize import (
    basket_lift,
    run_length_encode,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


# -------------------------------------------------------- source overlap

def test_source_overlap_exact_counts(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "abcdefghijklmnop"),          # shingles of len 12: 5
            ("s2", "abcdefghijklmnop"),          # identical -> inter = union
            ("s3", "zzzzzzzzzzzzzzzz"),          # disjoint from s1/s2
        ],
        "source string, text string",
    )
    got = {
        (r.a, r.b): (r.inter_size, r.union_size)
        for r in source_overlap(docs).collect()
    }
    assert got[("s1", "s2")] == (5, 5)
    assert ("s1", "s3") not in got  # zero-intersection pairs are absent
    assert ("s2", "s3") not in got


# ----------------------------------------------------------- basket lift

def test_basket_lift_hand_computed(spark):
    # 4 baskets; a in 3, b in 2, {a,b} together in 2 -> lift = 2*4/(3*2) = 1.333
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (4, "c")]
    df = spark.createDataFrame(rows, "bk long, it string")
    got = {(r.a, r.b): r for r in basket_lift(df, "bk", "it").collect()}
    r = got[("a", "b")]
    assert (r.n_ab, r.n_a, r.n_b) == (2, 3, 2)
    assert r.lift_ppm == 2 * 4 * 1_000_000 // (3 * 2)  # 1333333


def test_basket_lift_duplicates_in_basket_count_once(spark):
    rows = [(1, "a"), (1, "a"), (1, "b"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "bk long, it string")
    r = basket_lift(df, "bk", "it").collect()[0]
    assert r.n_ab == 2 and r.n_a == 2  # distinct per basket


# ---------------------------------------------------------- percent rank

def test_percent_rank_peers_share_rank(spark):
    df = spark.createDataFrame(
        [(1, "t", 1.0), (2, "t", 2.0), (3, "t", 2.0), (4, "t", 3.0)],
        "event_id long, k string, value double",
    )
    got = {r.event_id: r.pr for r in percent_rank_scale(df, "value", ["k"]).collect()}
    assert got[1] == 0.0
    assert got[2] == got[3] == 1 / 3  # peers
    assert got[4] == 1.0


# -------------------------------------------------------------------- RLE

def test_rle_collapses_runs(spark):
    rows = [
        (1, 1, _ts("2024-01-01 00:00:01"), "up"),
        (2, 1, _ts("2024-01-01 00:00:02"), "up"),
        (3, 1, _ts("2024-01-01 00:00:03"), "down"),
        (4, 1, _ts("2024-01-01 00:00:04"), "up"),
        (5, 2, _ts("2024-01-01 00:00:05"), "up"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, state string")
    got = {
        (r.user_id, r.run_idx): (r.state, r.run_len, r.first_id, r.last_id)
        for r in run_length_encode(df, ["user_id"], "state", "ts", "event_id").collect()
    }
    assert got == {
        (1, 1): ("up", 2, 1, 2),
        (1, 2): ("down", 1, 3, 3),
        (1, 3): ("up", 1, 4, 4),
        (2, 1): ("up", 1, 5, 5),
    }


# --------------------------------------------------- rolling KMV sketch

def test_kmv_rolling_merges_windows(spark):
    from cardinalhq_otel_collector_spark.operators.sketch import kmv_rolling_distinct

    # day 1: users 0-9; day 5: users 5-14; day 20: users 0-4.
    rows = (
        [(u, _ts("2024-01-01 10:00:00")) for u in range(10)]
        + [(u, _ts("2024-01-05 10:00:00")) for u in range(5, 15)]
        + [(u, _ts("2024-01-20 10:00:00")) for u in range(5)]
    )
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r.day.day: r.est_distinct for r in kmv_rolling_distinct(df, "user_id", "ts", k=64).collect()}
    # windows: day1 sees {0..9}=10; day5 sees day1+day5 = {0..14}=15;
    # day20 sees only itself = 5 (window is 7 days)
    assert got == {1: 10, 5: 15, 20: 5}


def test_kmv_rolling_estimates_match_plain_kmv_on_union(spark):
    from cardinalhq_otel_collector_spark.operators.sketch import (
        kmv_distinct,
        kmv_rolling_distinct,
    )

    # all events within one window -> the rolling estimate for the last
    # day equals the plain sketch over the union (merge property)
    rows = [(u, _ts(f"2024-01-0{d} 10:00:00")) for d in range(1, 6) for u in range(d * 40)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    rolling = {
        r.day.day: r.est_distinct
        for r in kmv_rolling_distinct(df, "user_id", "ts", k=32).collect()
    }
    plain = (
        kmv_distinct(df.select(F.lit("g").alias("g"), "user_id"), "user_id", ["g"], k=32)
        .collect()[0]
        .est_distinct
    )
    assert rolling[5] == plain


# ------------------------------------------------ k-anonymity / gaps / kappa

def test_k_anonymity_flags_small_groups(spark):
    from cardinalhq_otel_collector_spark.operators.validate import (
        k_anonymity_violations,
    )

    rows = [("a", 1)] * 5 + [("b", 1)] * 2 + [("c", 2)] * 1
    df = spark.createDataFrame(rows, "qi1 string, qi2 long")
    got = {(r.qi1, r.qi2): r.n for r in k_anonymity_violations(df, ["qi1", "qi2"], 3).collect()}
    assert got == {("b", 1): 2, ("c", 2): 1}


def test_coverage_gaps_finds_missing_buckets(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.validate import coverage_gaps

    df = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 1, 1, 0, 30)),
            (1, dt.datetime(2024, 1, 1, 3, 10)),  # hours 1, 2 missing
            (2, dt.datetime(2024, 1, 1, 5, 0)),   # single bucket, no gaps
        ],
        "user_id long, ts timestamp",
    )
    got = sorted(
        (r.user_id, r.missing_step.hour)
        for r in coverage_gaps(df, ["user_id"], "ts", 3600).collect()
    )
    assert got == [(1, 1), (1, 2)]


def test_cohen_kappa_perfect_and_chance(spark):
    from cardinalhq_otel_collector_spark.operators.validate import cohen_kappa

    perfect = spark.createDataFrame([("x", "x"), ("y", "y")], "a string, b string")
    r = cohen_kappa(perfect, "a", "b").collect()[0]
    assert r.kappa_ppm == 1_000_000
    # worse than chance: systematic disagreement on a balanced 2-label set
    worst = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")], "a string, b string"
    )
    r = cohen_kappa(worst, "a", "b").collect()[0]
    assert r.n_agree == 0 and r.kappa_ppm < 0


# --------------------------------------- fk audit / seasonality / bm25 / negatives

def test_fk_violations_orphans_and_nulls(spark):
    from cardinalhq_otel_collector_spark.operators.validate import fk_violations

    child = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,)], "pk long")
    got = sorted(r.id for r in fk_violations(child, parent, ["fk"], ["pk"]).collect())
    assert got == [2, 3]  # orphan AND null-key rows are reported


def test_seasonality_cells(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.aggregate import seasonality_profile

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 7, 10, 0), 1.0),   # Sunday -> dow 1
            (dt.datetime(2024, 1, 7, 10, 30), 3.0),
            (dt.datetime(2024, 1, 8, 10, 0), 5.0),   # Monday -> dow 2
        ],
        "ts timestamp, value double",
    )
    got = {(r.dow, r.hod): (r.n, r.median) for r in seasonality_profile(df, "ts", "value").collect()}
    assert got == {(1, 10): (2, 2.0), (2, 10): (1, 5.0)}


def test_bm25_ranks_term_dense_docs_first(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "spark spark spark filler filler"),
            (2, "spark filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    rows = bm25_topk(docs, ["spark"], topk=10).collect()
    assert [r.doc_id for r in rows] == [1, 2]  # doc 3 never matches
    assert rows[0].bm25 > rows[1].bm25 > 0
    assert rows[0].tf_spark == 3 and rows[0].doc_len == 5


def test_negative_samples_deterministic_and_self_free(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import negative_samples

    df = spark.range(50).select(F.col("id").alias("doc_id"))
    a = {(r.doc_id, r.j, r.neg_id) for r in negative_samples(df, "doc_id", k=2, buckets=16).collect()}
    b = {(r.doc_id, r.j, r.neg_id) for r in negative_samples(df, "doc_id", k=2, buckets=16).collect()}
    assert a == b and len(a) > 50
    assert all(d != n for d, _, n in a)


# ------------------------------------------------ ann recall / surprisal

def test_ann_recall_counts(spark):
    from cardinalhq_otel_collector_spark.operators.similarity import ann_recall

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20)], "qid long, vec_id long"
    )
    approx = spark.createDataFrame(
        [(1, 10), (1, 99), (2, 21)], "qid long, vec_id long"
    )
    got = {r.qid: (r.n_exact, r.n_hit) for r in ann_recall(exact, approx).collect()}
    assert got == {1: (3, 1), 2: (1, 0)}


def test_surprisal_uniform_corpus(spark):
    import math

    from cardinalhq_otel_collector_spark.operators.textstats import unigram_surprisal

    # two docs, four distinct tokens each appearing once: p(w) = 1/8...
    # doc tokens: a b c d / e f g h -> every token surprisal ln(8)
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "e f g h")], "doc_id long, text string"
    )
    rows = unigram_surprisal(docs).collect()
    for r in rows:
        assert r.n_tokens == 4
        assert abs(r.mean_surprisal - round(math.log(8), 6)) < 1e-9


def test_surprisal_repetitive_doc_scores_lower(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import unigram_surprisal

    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "quux zoth argle bargle")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.mean_surprisal for r in unigram_surprisal(docs).collect()}
    assert got[1] < got[2]  # boilerplate scores low, rare-token soup high
