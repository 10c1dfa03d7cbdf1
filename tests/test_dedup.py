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


def test_edit_distance_pairs_blocking_equals_truth(spark):
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.operators.dedup import (
        edit_distance_pairs,
    )

    words = [
        "color", "colour", "colr", "xab", "abx", "zzz", "aa", "a",
        "hash", "dash", "dashs", "hush",
    ]
    df = spark.createDataFrame([(w, i) for i, w in enumerate(words)],
                               "w string, wid long")
    got = {(r.a, r.b) for r in edit_distance_pairs(df, col="w").collect()}
    # ground truth: all-pairs levenshtein on the driver
    import itertools

    def lev(a, b):
        m = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, m[0] = m[0], i
            for j, cb in enumerate(b, 1):
                prev, m[j] = m[j], min(
                    m[j] + 1, m[j - 1] + 1, prev + (ca != cb)
                )
        return m[len(b)]

    truth = {
        tuple(sorted((x, y)))
        for x, y in itertools.combinations(set(words), 2)
        if lev(x, y) <= 1
    }
    assert got == truth
    # sanity: the d=2 deletion-share false positive was filtered
    assert ("abx", "xab") not in got
    # duplicate input strings collapse before pairing
    dup = spark.createDataFrame([("aa", 1), ("aa", 2), ("ab", 3)],
                                "w string, wid long")
    pairs = edit_distance_pairs(dup, col="w").collect()
    assert [(p.a, p.b) for p in pairs] == [("aa", "ab")]


def test_edit_distance_pairs_ids_and_maxdist_guard(spark):
    import pytest

    from cardinalhq_otel_collector_spark.operators.dedup import (
        edit_distance_pairs,
    )

    df = spark.createDataFrame([("cat", 1), ("cut", 2)], "w string, wid long")
    rows = edit_distance_pairs(df, col="w", id_col="wid").collect()
    assert len(rows) == 1 and rows[0].wid_a == 1 and rows[0].wid_b == 2
    with pytest.raises(ValueError):
        edit_distance_pairs(df, col="w", max_dist=2)
