from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.dedup import (
    char_shingles,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_candidates,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    other = "completely unrelated content about spark shuffles and parquet files"
    return spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, other)], "doc_id long, text string"
    )


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark))
    rows = {r["keep_doc_id"]: r["n_copies"] for r in out.collect()}
    assert rows[0] == 2  # docs 0 and 1 identical, keep min id
    assert rows[2] == 1 and rows[3] == 1
    assert out.count() == 3


def test_char_shingles_count(spark):
    df = spark.createDataFrame([(0, "abcdefghijklm")], "doc_id long, text string")
    sh = char_shingles(df, n=12)
    # len 13 -> positions 1..2 -> 2 distinct shingles
    assert sh.count() == 2


def test_ngram_jaccard(spark):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0          # identical docs
    assert (0, 2) in pairs and pairs[(0, 2)] >= 0.5   # near-dup
    assert not any(3 in p for p in pairs)  # unrelated below threshold


def test_minhash_candidates_supersets_real_pairs(spark):
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(_docs(spark)).collect()}
    assert (0, 1) in cands  # identical docs always collide in every band
    assert (0, 2) in cands or (1, 2) in cands  # near-dup likely shares a band


def test_simhash_shape_and_similarity(spark):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash(_docs(spark)).collect()}
    assert all(len(s) == 16 and set(s) <= {"0", "1"} for s in sigs.values())
    assert sigs[0] == sigs[1]  # identical docs, identical signature
    ham_near = sum(a != b for a, b in zip(sigs[0], sigs[2]))
    ham_far = sum(a != b for a, b in zip(sigs[0], sigs[3]))
    assert ham_near <= ham_far


def test_simhash_candidates(spark):
    cands = {(r["id_a"], r["id_b"]) for r in simhash_candidates(_docs(spark)).collect()}
    assert (0, 1) in cands


def test_dedup_on_testdata_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = exact_dedup(docs)
    assert out.agg(F.sum("n_copies")).collect()[0][0] == docs.count()
