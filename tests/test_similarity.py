import math

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
    norms,
    sign_buckets,
)


def _vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),   # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite
        (4, [0.8, 0.2, 0.0, 0.0]),   # close to 0/1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_norms(spark):
    out = {r["vec_id"]: r["nrm2"] for r in norms(_vecs(spark), dim=4).collect()}
    assert out[0] == 1.0
    assert abs(out[1] - 0.82) < 1e-6  # float32 storage rounding


def test_brute_force_topk_exact(spark):
    df = _vecs(spark)
    q = df.filter(F.col("vec_id") == 0)
    out = brute_force_topk(q, df, k=2, dim=4).collect()
    ranked = sorted(out, key=lambda r: r["nn_rank"])
    assert [r["vec_id"] for r in ranked] == [1, 4]
    expect = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(ranked[0]["cosine"] - round(expect, 6)) < 1e-6
    assert ranked[0]["cosine"] > ranked[1]["cosine"]


def test_lsh_topk_matches_brute_force_within_bucket(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    exact = brute_force_topk(q, emb, k=5)
    approx = lsh_topk(q, emb, k=5, bits=4, n_bands=8)
    exact_sets = {r["qid"]: set() for r in exact.collect()}
    for r in exact.collect():
        exact_sets[r["qid"]].add(r["vec_id"])
    # LSH results must be a subset of the corpus and self-excluded;
    # recall vs exact should be substantial on cluster-structured data
    hits = total = 0
    for r in approx.collect():
        assert r["vec_id"] != r["qid"]
        total += 1
        if r["vec_id"] in exact_sets.get(r["qid"], set()):
            hits += 1
    assert total > 0 and hits / total >= 0.4


def test_sign_buckets_deterministic(spark):
    df = _vecs(spark)
    a = {r["vec_id"]: r["bucket"] for r in sign_buckets(df).collect()}
    b = {r["vec_id"]: r["bucket"] for r in sign_buckets(df.repartition(3)).collect()}
    assert a == b
    assert a[0][0] == "1" and a[3][0] == "0"


def test_ivf_topk_exact_on_separated_clusters(spark):
    """On well-separated clusters, IVF (k=4 centroids, probe=1) must agree
    with brute force EXACTLY — and be reproducible across partitionings."""
    from cardinalhq_otel_collector_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )
    from pyspark.sql import functions as F

    dim = 8
    rows = []
    for c in range(4):
        for m in range(40):
            vec = [0.01 * ((c * 40 + m) % 7)] * dim
            vec[c * 2] = 10.0 + 0.001 * m       # dominant cluster axis
            vec[c * 2 + 1] = 1.0 + 0.002 * m
            rows.append((c * 40 + m, [float(x) for x in vec]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id").isin([0, 45, 90, 135]))

    exact = sorted(
        (r["qid"], r["nn_rank"], r["vec_id"])
        for r in brute_force_topk(q, emb, k=3, dim=dim).collect()
    )
    approx = ivf_topk(q, emb, k=3, n_centroids=4, n_probe=1, dim=dim).collect()
    assert sorted((r["qid"], r["nn_rank"], r["vec_id"]) for r in approx) == exact

    again = ivf_topk(
        q.repartition(3), emb.repartition(7), k=3, n_centroids=4, n_probe=1, dim=dim
    ).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, approx))
