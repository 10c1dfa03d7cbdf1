"""Sequence packing (operators/packing.py): two-phase prefix sum must
equal the global concatenate-and-chunk assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.packing import pack_sequences


def _docs(spark, texts):
    rows = [(i, t, i // 2) for i, t in enumerate(texts)]
    return spark.createDataFrame(rows, "doc_id long, text string, bkt long")


def test_offsets_and_bins_match_global_cumsum(spark):
    # token counts: 3, 2, 4, 1 → starts 0, 3, 5, 9; target 4 → bins 0,0,1,2
    df = _docs(spark, ["a b c", "d e", "f g h i", "j"])
    got = {r.doc_id: (r.n_tokens, r.start_offset, r.bin_id)
           for r in pack_sequences(df, 4, "bkt").collect()}
    assert got == {0: (3, 0, 0), 1: (2, 3, 0), 2: (4, 5, 1), 3: (1, 9, 2)}


def test_bucketing_invariant_to_bucket_span(spark):
    texts = [f"w{i} x y" for i in range(30)]
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = pack_sequences(
        df.withColumn("b", F.floor(F.col("doc_id") / 3)), 7, "b"
    ).orderBy("doc_id").collect()
    b = pack_sequences(
        df.withColumn("b", F.floor(F.col("doc_id") / 11)), 7, "b"
    ).orderBy("doc_id").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_partitioning_does_not_change_result(spark):
    df = _docs(spark, ["a b", "c", "d e f", "g h"])
    one = pack_sequences(df, 3, "bkt").orderBy("doc_id").collect()
    many = pack_sequences(df.repartition(7), 3, "bkt").orderBy("doc_id").collect()
    assert [tuple(r) for r in one] == [tuple(r) for r in many]


def test_big_window_is_bucket_partitioned(spark):
    # The corpus-sized window must be hash-partitioned by the bucket; only
    # the one-row-per-bucket offsets frame may use a global window.
    df = _docs(spark, ["a b", "c d"])
    plan = pack_sequences(df, 3, "bkt")._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bkt" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
