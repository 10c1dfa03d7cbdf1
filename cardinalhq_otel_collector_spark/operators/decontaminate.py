"""Benchmark decontamination (training-data pipeline op).

Removes (or flags) training documents that share word n-grams with a
held-out evaluation set — the standard contamination rule from the
public LM-training literature (13-gram overlap). Spark-first shape:

  1. shingle the EVAL set into distinct word n-grams (eval sets are
     small by definition — thousands of docs vs a 100-TB train corpus),
  2. broadcast-join the train shingles against it (no shuffle of the
     train side: the scan streams through a broadcast hash join),
  3. per (train doc, eval doc) count distinct shared n-grams, flag
     docs at or above ``min_hits``.

The only shuffle is the groupBy over HIT rows (collisions only, a tiny
fraction of the corpus); everything else is scan + broadcast join.
All expressions are JVM-native (split/sequence/slice/array_join); no
higher-order-function lambdas (see operators/dedup.py header) and no
Python on the row path.

Word n-grams use single-space tokenization (``split(text, ' ')``) so
the semantics are engine-portable (the DuckDB oracle reproduces them
token-for-token).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_ngrams",
    "contamination_hits",
    "decontaminate",
]


def word_ngrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 13
) -> DataFrame:
    """Distinct word n-grams per document.

    ``slice(tokens, pos, n)`` + ``array_join`` keeps the whole thing one
    projection + explode inside whole-stage codegen. Documents shorter
    than n tokens contribute their full token sequence as a single
    (shorter) shingle — a short doc equal to an eval doc should still
    collide.
    """
    return _word_ngrams_raw(df, text_col, id_col, n).distinct()


def _word_ngrams_raw(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 13
) -> DataFrame:
    """Per-document word n-grams WITHOUT the distinct — duplicates kept.

    The contamination join dedups AFTER the broadcast join (over hit rows
    only), so the corpus-sized side never shuffles at all (guide §2.3:
    shuffle fewer bytes — here, zero)."""
    tokens = F.split(F.col(text_col), " ")
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1)))
    ).alias("pos")
    return (
        df.select(F.col(id_col), tokens.alias("__toks"), pos)
        .select(
            F.col(id_col),
            F.array_join(F.slice(F.col("__toks"), F.col("pos"), n), " ").alias("ngram"),
        )
    )


def contamination_hits(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
) -> DataFrame:
    """Per (train doc, eval doc): how many distinct word n-grams they share.

    The eval shingle set is broadcast — at corpus scale the train side
    never shuffles; only hit rows enter the aggregate. The train shingles
    are deliberately NOT pre-deduplicated: a distinct there is a
    corpus-sized shuffle of every shingle string, while deduplicating
    AFTER the broadcast join (count_distinct per train/eval pair) touches
    hit rows only — same distinct-shared-ngram counts, zero train-side
    shuffle (guide §2.3/§2.4; measured 29.8s → join-local at the sf1.0
    bench).
    """
    tr = _word_ngrams_raw(train, text_col, id_col, n)
    ev = word_ngrams(eval_df, text_col, id_col, n).withColumnRenamed(id_col, eval_id_col)
    return (
        tr.join(F.broadcast(ev), "ngram")
        .groupBy(id_col, eval_id_col)
        .agg(F.count_distinct(F.col("ngram")).alias("n_hits"))
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_contaminated: bool = False,
) -> DataFrame:
    """Train rows annotated with contamination evidence; by default the
    contaminated rows are REMOVED (the production shape). With
    ``keep_contaminated`` every train row is returned with ``n_hits`` /
    ``n_eval_matches`` / ``contaminated`` columns (the audit shape).

    The per-doc rollup joins back on the train id with NO forced
    broadcast: the rollup has one row per contaminated doc, which is
    usually tiny but can reach millions at corpus scale — AQE picks the
    broadcast automatically when it fits, and falls back to a shuffled
    join when it doesn't. (Contrast the eval-shingle join, which is
    always safe to force.)
    """
    hits = contamination_hits(train, eval_df, n, text_col, id_col)
    per_doc = hits.groupBy(id_col).agg(
        F.sum("n_hits").alias("n_hits"),
        F.count(F.lit(1)).alias("n_eval_matches"),
    )
    out = (
        train.join(per_doc, id_col, "left")
        .withColumn("n_hits", F.coalesce(F.col("n_hits"), F.lit(0)))
        .withColumn("n_eval_matches", F.coalesce(F.col("n_eval_matches"), F.lit(0)))
        .withColumn("contaminated", F.col("n_hits") >= min_hits)
    )
    if keep_contaminated:
        return out
    return out.filter(~F.col("contaminated")).drop("contaminated")
