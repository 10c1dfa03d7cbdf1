"""S8 — lineage / metrics checkpointing + idempotent resume.

The reference's post-commit notification path (awss3exporter
internal/notify — queue, workers, retries, drop accounting;
notifier.go:104-434) exists to tell a downstream consumer *which objects
were committed*, and its downstream dedups by (bucket, key)
(docs/superpowers/specs/2026-04-24-awss3-webhook-notifications-design.md:51).
In Spark the equivalent contract is a ``_lineage`` table: one row per
(run_id, stage, sink) recording committed row counts — written AFTER the
sink commit, read BEFORE re-running, which is exactly the at-least-once +
dedup semantics without an HTTP queue. The ``_metrics`` analogue of the
reference's self-metering counters (SURVEY.md §2A A18) rides in the same
table via the ``rows_in``/``rows_out`` columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Catalog

__all__ = ["LineageLog"]

LINEAGE_TABLE = "_lineage"

_SCHEMA = (
    "run_id string, stage string, sink string, rows_in long, rows_out long"
)


class LineageLog:
    def __init__(self, catalog: Catalog):
        self.catalog = catalog

    def read(self) -> DataFrame:
        if not self.catalog.exists(LINEAGE_TABLE):
            return self.catalog.spark.createDataFrame([], _SCHEMA + ", committed_at timestamp")
        return self.catalog.read(LINEAGE_TABLE)

    def committed_stages(self, run_id: str) -> set[str]:
        return {
            r["stage"]
            for r in self.read().filter(F.col("run_id") == run_id).select("stage").distinct().collect()
        }

    def commit(
        self,
        run_id: str,
        stage: str,
        rows_out: int,
        rows_in: int | None = None,
        sink: str | None = None,
    ) -> None:
        spark = self.catalog.spark
        df = spark.createDataFrame(
            [(run_id, stage, sink, rows_in, rows_out)], _SCHEMA
        ).withColumn("committed_at", F.current_timestamp())
        self.catalog.append(df, LINEAGE_TABLE)

    def commit_many(self, run_id: str, stage: str, per_sink_counts: list[tuple[str, int]]) -> None:
        spark = self.catalog.spark
        df = spark.createDataFrame(
            [(run_id, stage, s, None, n) for s, n in per_sink_counts], _SCHEMA
        ).withColumn("committed_at", F.current_timestamp())
        self.catalog.append(df, LINEAGE_TABLE)
