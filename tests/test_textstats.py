from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.textstats import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame([("one two three",)], "text string")
    r = token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 3
    assert r["n_chars"] == 13
    assert r["n_tokens_est"] == max(3, -(-13 // 4))


def test_quality_score_ordering(spark):
    df = spark.createDataFrame(
        [
            ("the quick brown fox jumps over a lazy dog near the riverbank today",),
            ("spam spam spam spam spam spam",),
            ("x",),
        ],
        "text string",
    )
    rows = quality_score(df).collect()
    good, spammy, tiny = rows
    assert good["quality"] > spammy["quality"]
    assert tiny["quality"] == 0.0
    assert spammy["distinct_ratio"] < 0.3


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and a dog is here",),
            ("der hund und die katze das ist gut",),
            ("el perro y la casa es los gatos",),
        ],
        "text string",
    )
    out = [r["lang_guess"] for r in lang_id(df).collect()]
    assert out == ["en", "de", "es"]


def test_doc_fingerprint_robust_to_partitioning(spark):
    df = spark.createDataFrame(
        [(0, "abcdefghijklmnop"), (1, "qrstuvwxyz012345")], "doc_id long, text string"
    )
    a = {r["doc_id"]: (r["winnow_fp"], r["full_fp"]) for r in doc_fingerprint(df).collect()}
    b = {r["doc_id"]: (r["winnow_fp"], r["full_fp"])
         for r in doc_fingerprint(df.repartition(5)).collect()}
    assert a == b
    assert a[0] != a[1]


def test_build_vocab_counts_and_min_count(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import build_vocab

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "c d")],
        "doc_id long, text string",
    )
    got = {r.token: (r.n_total, r.n_docs)
           for r in build_vocab(df, min_count=2).collect()}
    # a: 3 occurrences in 2 docs; c: 2 in 2; b/d below min_count
    assert got == {"a": (3, 2), "c": (2, 2)}


def test_build_vocab_min_count_one_keeps_all(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import build_vocab

    df = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    assert build_vocab(df, min_count=1).count() == 2


def test_tfidf_topk_scores_and_ranking(spark):
    import math

    from cardinalhq_otel_collector_spark.operators.textstats import tfidf_topk

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "c c c")],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.term): (r.tf, r.df_t, r.tfidf, r.term_rank)
           for r in tfidf_topk(df, k=2).collect()}
    ln = lambda x: round(x, 6)
    # doc 1: a tf=2 df=1 → 2·ln3 ; b tf=1 df=2 → ln1.5
    assert got[(1, "a")] == (2, 1, ln(2 * math.log(3)), 1)
    assert got[(1, "b")] == (1, 2, ln(math.log(1.5)), 2)
    # doc 3: only c → rank 1, tf=3 df=2
    assert got[(3, "c")] == (3, 2, ln(3 * math.log(1.5)), 1)


def test_tfidf_tie_breaks_on_term_asc(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import tfidf_topk

    df = spark.createDataFrame(
        [(1, "x y"), (2, "p q")], "doc_id long, text string",
    )
    # Within each doc both terms tie (same tf, same df) → term asc order.
    rows = {(r.doc_id, r.term_rank): r.term for r in tfidf_topk(df, k=2).collect()}
    assert rows[(1, 1)] == "x" and rows[(1, 2)] == "y"
    assert rows[(2, 1)] == "p" and rows[(2, 2)] == "q"


def test_repetition_stats_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (1, "a a a b"),          # 4 words, 2 distinct, top 'a'x3; bigrams: "a a","a a","a b" -> 3 total 2 distinct
            (2, "x y z"),            # all unique
            (3, "w"),                # single word, zero bigrams
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert (r1["n_words"], r1["n_distinct_words"]) == (4, 2)
    assert abs(r1["dup_word_frac"] - 0.5) < 1e-12
    assert abs(r1["top_word_frac"] - 0.75) < 1e-12
    assert abs(r1["dup_bigram_frac"] - (1 - 2 / 3)) < 1e-12
    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.0 and r2["dup_bigram_frac"] == 0.0
    r3 = rows[3]
    assert r3["n_words"] == 1 and r3["dup_bigram_frac"] == 0.0


def test_chunk_documents_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import chunk_documents

    # 10 tokens, chunk 4, overlap 1 (stride 3):
    # n_chunks = 1 + ceil(6/3) = 3 -> [0:4), [3:7), [6:10)
    toks = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    df = spark.createDataFrame([(1, toks), (2, "a b")], ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=4, overlap=1)
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"])
        for r in out.collect()
    }
    assert got == {
        (1, 0): ("t0 t1 t2 t3", 4),
        (1, 1): ("t3 t4 t5 t6", 4),
        (1, 2): ("t6 t7 t8 t9", 4),
        (2, 0): ("a b", 2),  # short doc: one whole-doc chunk
    }


def test_chunk_documents_last_chunk_short_not_empty(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import chunk_documents

    # 5 tokens, chunk 4, stride 3 -> chunks [0:4), [3:5) (2 tokens);
    # a would-be chunk at 6 >= n must not exist
    df = spark.createDataFrame([(1, "a b c d e")], ["doc_id", "text"])
    rows = sorted(
        (r["chunk_idx"], r["n_tokens"])
        for r in chunk_documents(df, chunk_tokens=4, overlap=1).collect()
    )
    assert rows == [(0, 4), (1, 2)]


def test_chunk_documents_zero_shuffle_plan(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    assert "python" not in plan.lower()


def test_normalize_text_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import normalize_text

    df = spark.createDataFrame(
        [
            (1, "Visit https://X.io/a?b=1 NOW"),
            (2, "mail Bob.s+1@Ex.COM   twice  "),
            (3, "plain"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["text_norm"] for r in normalize_text(df).collect()}
    assert got == {1: "visit now", 2: "mail twice", 3: "plain"}


def test_pmi_collocations_hand_computed(spark):
    from math import log

    from cardinalhq_otel_collector_spark.operators.textstats import pmi_collocations

    # corpus: "a b" x3 and "a c" x1 -> bigrams: (a,b)x3, (a,c)x1; N=4
    # unigram occurrences in bigrams: a=4, b=3, c=1
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")], ["doc_id", "text"]
    )
    rows = pmi_collocations(df, k=10, min_count=1).collect()
    got = {(r["w1"], r["w2"]): (r["c12"], r["pmi"]) for r in rows}
    assert set(got) == {("a", "b"), ("a", "c")}
    assert got[("a", "b")][0] == 3
    assert abs(got[("a", "b")][1] - log(3 * 4 / (4 * 3))) < 1e-12  # = 0
    assert abs(got[("a", "c")][1] - log(1 * 4 / (4 * 1))) < 1e-12  # = 0
    # ordering: pmi tie (both 0) breaks on w1, w2 -> (a,b) first
    assert (rows[0]["w1"], rows[0]["w2"]) == ("a", "b")


def test_pmi_topk_is_take_ordered_not_global_sort(spark):
    from cardinalhq_otel_collector_spark.operators.textstats import pmi_collocations

    df = spark.createDataFrame([(1, "a b c a b")], ["doc_id", "text"])
    out = pmi_collocations(df, k=5, min_count=1)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    assert "python" not in plan.lower()
