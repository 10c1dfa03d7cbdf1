"""Similarity search over an embedding column (array<float>).

Two tiers:

  brute_force_topk   exact cosine top-k — the correctness baseline. The
                     dot products are computed by exploding positions and
                     summing in DECIMAL, which makes results bit-stable
                     across partitionings and engines (float sums are
                     order-dependent; decimal sums are exact).
  lsh_topk           hyperplane-sign LSH buckets → exact rerank within
                     bucket — the scale path: each query only scans its
                     bucket, so cost is n/2^bits per query instead of n.

No Python on the row path; no higher-order-function lambdas (projection-
collapse miscompilation — see operators/fingerprint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "norms",
    "cosine_scores",
    "brute_force_topk",
    "sign_buckets",
    "hyperplane_table",
    "hyperplane_buckets",
    "lsh_topk",
]


def _pos_explode(df: DataFrame, vec_col: str, dim: int, out: str) -> DataFrame:
    pos = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("i")
    return df.select("*", pos).withColumn(
        out, F.element_at(F.col(vec_col), F.col("i")).cast("double")
    )


def norms(df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id", dim: int = 64) -> DataFrame:
    e = _pos_explode(df.select(id_col, vec_col), vec_col, dim, "v")
    return e.groupBy(id_col).agg(
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,18)")).cast("double").alias("nrm2")
    )


def cosine_scores(
    queries: DataFrame,
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """All-pairs cosine between ``queries`` (small) and ``corpus``.

    queries is broadcast; the per-position products are decimal-summed.
    Output: (qid, vec_id, cosine).
    """
    q = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    c = corpus.select(F.col(id_col), F.col(vec_col))
    pos = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("i")
    joined = c.join(F.broadcast(q), F.col("qid") != F.col(id_col)).select("qid", "qe", id_col, vec_col, pos)
    prods = joined.withColumn(
        "p",
        (
            F.element_at(F.col("qe"), F.col("i")).cast("double")
            * F.element_at(F.col(vec_col), F.col("i")).cast("double")
        ).cast("decimal(38,18)"),
    )
    dots = prods.groupBy("qid", id_col).agg(F.sum("p").cast("double").alias("dot"))
    nq = norms(queries, vec_col, id_col, dim).withColumnRenamed(id_col, "qid").withColumnRenamed("nrm2", "qn")
    nc = norms(corpus, vec_col, id_col, dim)
    return (
        dots.join(F.broadcast(nq), "qid")
        .join(nc, id_col)
        .withColumn("cosine", F.col("dot") / (F.sqrt("qn") * F.sqrt("nrm2")))
        .select("qid", id_col, "cosine")
    )


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    scored = cosine_scores(queries, corpus, vec_col, id_col, dim)
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
    )


def sign_buckets(df: DataFrame, bits: int = 4, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Axis-sign LSH: bucket = sign bits of the first ``bits`` dims — the
    cheapest possible bucketing (one projection, zero joins). Use
    hyperplane_buckets for real recall."""
    cols = [
        F.when(F.element_at(F.col(vec_col), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return df.withColumn("bucket", F.concat(*cols))


def hyperplane_table(spark, bits: int, dim: int) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: weight(plane j, dim i) =
    uniform(-1,1) derived from md5(j|i). No RNG, no seed state — the same
    table materializes on any cluster, any engine."""
    planes = spark.range(bits).select(F.col("id").alias("plane"))
    dims = spark.range(1, dim + 1).select(F.col("id").alias("i"))
    w = (
        F.conv(F.substring(F.md5(F.concat_ws("|", "plane", "i")), 1, 8), 16, 10).cast("double")
        / F.lit(float(1 << 32)) * 2 - 1
    )
    return planes.crossJoin(dims).withColumn("w", w)


def hyperplane_buckets(
    df: DataFrame, bits: int = 4, n_bands: int = 1, vec_col: str = "embedding",
    id_col: str = "vec_id", dim: int = 64,
) -> DataFrame:
    """Random-hyperplane cosine LSH (SimHash for vectors), banded.

    ``n_bands`` independent tables of ``bits`` planes each; a pair is a
    candidate if it collides in ANY band (the standard LSH OR-construction:
    recall grows with bands, candidate count stays O(rows·bands)). Output:
    one row per (row, band) with an integer bucket. One explode +
    broadcast join with the (bands·bits × dim) hyperplane table + two
    groupBys — no all-pairs anything.
    """
    spark = df.sparkSession
    hp = hyperplane_table(spark, bits * n_bands, dim).withColumn(
        "band", (F.col("plane") / bits).cast("int")
    )
    e = _pos_explode(df.select(id_col, vec_col), vec_col, dim, "v")
    dots = (
        e.join(F.broadcast(hp), "i")
        .groupBy(id_col, "band", "plane")
        .agg(F.sum((F.col("v") * F.col("w")).cast("decimal(38,18)")).alias("d"))
    )
    bit = F.when(F.col("d") >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
    return dots.groupBy(id_col, "band").agg(
        F.sum(bit * F.expr(f"shiftleft(1L, cast(plane % {bits} as int))")).alias("bucket")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 3,
    bits: int = 4,
    n_bands: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: banded-LSH candidates → exact cosine rerank.

    The (band, bucket) equi-join replaces the all-pairs cross join: at 10^9
    vectors, bits=16 and a handful of bands, each query reranks only its
    collision set — and the join shuffles on the bucket key, so corpus
    partitions never replicate."""
    qb = hyperplane_buckets(queries, bits, n_bands, vec_col, id_col, dim).select(
        F.col(id_col).alias("qid"), "band", "bucket"
    )
    qv = queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qe"))
    cb = hyperplane_buckets(corpus, bits, n_bands, vec_col, id_col, dim)
    cands = (
        cb.join(F.broadcast(qb), ["band", "bucket"])
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", id_col)
        .distinct()
    )
    pos = F.explode(F.sequence(F.lit(1), F.lit(dim))).alias("i")
    joined = (
        cands.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(qv), "qid")
        .select("qid", "qe", id_col, vec_col, pos)
    )
    prods = joined.withColumn(
        "p",
        (
            F.element_at(F.col("qe"), F.col("i")).cast("double")
            * F.element_at(F.col(vec_col), F.col("i")).cast("double")
        ).cast("decimal(38,18)"),
    )
    dots = prods.groupBy("qid", id_col).agg(F.sum("p").cast("double").alias("dot"))
    nq = norms(queries, vec_col, id_col, dim).withColumnRenamed(id_col, "qid").withColumnRenamed("nrm2", "qn")
    nc = norms(corpus, vec_col, id_col, dim)
    scored = (
        dots.join(F.broadcast(nq), "qid")
        .join(nc, id_col)
        .withColumn("cosine", F.col("dot") / (F.sqrt("qn") * F.sqrt("nrm2")))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col(id_col))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .withColumn("cosine", F.round("cosine", 6))
        .select("qid", id_col, "cosine", "nn_rank")
    )
