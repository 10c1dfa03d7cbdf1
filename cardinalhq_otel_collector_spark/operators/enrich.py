"""S4 — broadcast-join enrichment against small lookup tables.

The reference's enrichment operators are all lookup-shaped: the chqauth
API-key→tenant cache (extension/chqauthextension/serverauth.go:116-277),
k8sattributes, geoip (manifest :252,:247). There are NO relational
equi-joins of two record streams anywhere in the reference (SURVEY.md §2B),
so the hot path needs exactly one join strategy: **broadcast hash left
join** — no shuffle of the fact stream, survives any scale-up of the big
side as long as lookups stay small.

Unknown keys behave like auth-denied (serverauth.go:181-222): the join is
LEFT, misses produce NULLs, and ``fill_unknown`` pins the policy columns.
TTL semantics of the reference's cache become snapshot-versioned lookup
tables: re-read the lookup DataFrame per batch/run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["enrich", "scd2_enrich"]


def enrich(
    df: DataFrame,
    lookup: DataFrame,
    on: str,
    fill_unknown: dict[str, object] | None = None,
) -> DataFrame:
    """Left broadcast join; misses filled per ``fill_unknown``."""
    out = df.join(F.broadcast(lookup), on=on, how="left")
    for col, val in (fill_unknown or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return out


def scd2_enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    payload: list[str] | None = None,
    prefix: str = "dim_",
) -> DataFrame:
    """Point-in-validity-interval dimension enrichment (SCD Type 2):
    attach the dimension version whose ``[valid_from, valid_to)``
    half-open interval contains the fact timestamp — the versioned twin
    of the TTL identity cache (A16): where the cache answers "what is
    this key NOW", SCD2 answers "what was this key THEN".

    Spark-first shape: this is exactly a backward as-of join on
    ``valid_from`` (the newest version starting at-or-before the fact)
    plus a ``valid_to`` currency filter — so it REUSES asof_join's
    union+window single-shuffle plan instead of an interval join; facts
    never join-explode, and open-ended current versions (NULL
    valid_to) match everything after their start. Left semantics:
    facts without a covering version keep NULL dimension columns.
    """
    from cardinalhq_otel_collector_spark.operators.asof import asof_join

    payload = payload or [
        c for c in dim.columns if c not in (key, valid_from, valid_to)
    ]
    d = dim.select(
        F.col(key),
        F.col(valid_from).alias(ts_col),
        F.unix_micros(F.col(valid_to).cast("timestamp")).alias("__vto_us"),
        *[F.col(c) for c in payload],
    )
    joined = asof_join(
        facts, d, on=ts_col, by=key,
        right_payload=["__vto_us", *payload],
        right_order="__vto_us",
        prefix=prefix,
    )
    in_validity = F.col(f"{prefix}__vto_us").isNull() | (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        < F.col(f"{prefix}__vto_us")
    )
    out = joined
    for c in payload:
        out = out.withColumn(
            f"{prefix}{c}", F.when(in_validity, F.col(f"{prefix}{c}"))
        )
    return out.withColumn(
        f"{prefix}{ts_col}", F.when(in_validity, F.col(f"{prefix}{ts_col}"))
    ).drop(f"{prefix}__vto_us")
