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

__all__ = ["enrich"]


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
