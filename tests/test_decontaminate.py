"""Benchmark-decontamination operator (operators/decontaminate.py).

Training-data pipeline op beyond the reference surface: flag/remove
train documents sharing word n-grams with a held-out eval set.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.decontaminate import (
    contamination_hits,
    decontaminate,
    word_ngrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_sliding_window(spark):
    df = _docs(spark, [(1, "a b c d")])
    got = {r.ngram for r in word_ngrams(df, n=3).collect()}
    assert got == {"a b c", "b c d"}


def test_word_ngrams_short_doc_whole_text(spark):
    # A doc shorter than n contributes its full token list once, so an
    # eval doc equal to a short train doc still collides.
    df = _docs(spark, [(1, "a b")])
    got = [r.ngram for r in word_ngrams(df, n=5).collect()]
    assert got == ["a b"]


def test_contamination_hits_counts_distinct_shared_ngrams(spark):
    train = _docs(spark, [(10, "x y z w q"), (11, "p q r s t")])
    ev = _docs(spark, [(1, "x y z w v")])
    got = {
        (r.doc_id, r.eval_id, r.n_hits)
        for r in contamination_hits(train, ev, n=3).collect()
    }
    # train 10 shares "x y z" and "y z w" with eval 1; train 11 nothing.
    assert got == {(10, 1, 2)}


def test_decontaminate_removes_and_audits(spark):
    train = _docs(spark, [(10, "x y z w q"), (11, "p q r s t")])
    ev = _docs(spark, [(1, "x y z w v")])
    clean = decontaminate(train, ev, n=3)
    assert [r.doc_id for r in clean.collect()] == [11]
    audit = decontaminate(train, ev, n=3, keep_contaminated=True)
    rows = {r.doc_id: (r.n_hits, r.n_eval_matches, r.contaminated)
            for r in audit.collect()}
    assert rows == {10: (2, 1, True), 11: (0, 0, False)}


def test_decontaminate_min_hits_threshold(spark):
    train = _docs(spark, [(10, "x y z w q")])
    ev = _docs(spark, [(1, "x y z w v")])
    # 2 shared 3-grams: survives min_hits=3, removed at min_hits=2.
    assert decontaminate(train, ev, n=3, min_hits=3).count() == 1
    assert decontaminate(train, ev, n=3, min_hits=2).count() == 0


def test_plan_broadcasts_eval_side(spark):
    # The eval shingle set must reach the train scan as a broadcast hash
    # join — a shuffle of the train side here would be the 100-TB killer.
    train = _docs(spark, [(10, "x y z w q")])
    ev = _docs(spark, [(1, "x y z w v")])
    plan = contamination_hits(train, ev, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_no_python_udf_in_plan(spark):
    train = _docs(spark, [(10, "x y z w q")])
    ev = _docs(spark, [(1, "x y z w v")])
    plan = decontaminate(train, ev, n=3, keep_contaminated=True)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
