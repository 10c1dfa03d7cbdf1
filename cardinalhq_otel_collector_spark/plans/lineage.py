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

Commits are written DRIVER-SIDE with pyarrow (one small parquet file per
commit, unique name, directory append — the same atomic-visibility story
as a Spark append: the file either exists completely or not at all).
Lineage rows are control-plane-sized (a handful per run — the reference
POSTs them one HTTP request at a time, notifier.go:294-340), and routing
them through a full Spark write job cost 3 jobs of pure driver latency
per pipeline run — measurable serial time in the N→4N scaling account.
Reads stay Spark (the table is queryable like any other).
"""

from __future__ import annotations

import datetime
import os
import uuid

from pyspark.sql import DataFrame
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

    def _append_rows(
        self, rows: list[tuple[str, str, str | None, int | None, int]]
    ) -> None:
        if self.catalog.use_iceberg:
            # Iceberg tables are catalog-tracked: a stray file is invisible
            # without a snapshot commit, so route through the catalog (one
            # tiny append job; the snapshot IS the post-commit notification)
            df = self.catalog.spark.createDataFrame(rows, _SCHEMA).withColumn(
                "committed_at", F.current_timestamp()
            )
            self.catalog.append(df, LINEAGE_TABLE)
            return
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = self.catalog.path(LINEAGE_TABLE)
        os.makedirs(path, exist_ok=True)
        now = datetime.datetime.now(datetime.timezone.utc)
        table = pa.table(
            {
                "run_id": pa.array([r[0] for r in rows], pa.string()),
                "stage": pa.array([r[1] for r in rows], pa.string()),
                "sink": pa.array([r[2] for r in rows], pa.string()),
                "rows_in": pa.array([r[3] for r in rows], pa.int64()),
                "rows_out": pa.array([r[4] for r in rows], pa.int64()),
                # tz=UTC so the column round-trips as TIMESTAMP (LTZ) —
                # matching both the empty-table fallback schema in read()
                # and pre-existing Spark-written _lineage files; a naive
                # pa.timestamp would read back as TIMESTAMP_NTZ and mix
                # logical types within one directory.
                "committed_at": pa.array([now] * len(rows), pa.timestamp("us", tz="UTC")),
            }
        )
        # temp-file + rename for atomic VISIBILITY: a crash mid-write must
        # not leave a truncated parquet part that breaks the next run's
        # resume read — resume-after-crash is this table's whole purpose.
        # Spark's parquet reader ignores dot-prefixed files, and a POSIX
        # rename within one directory is atomic.
        final = os.path.join(path, f"part-{uuid.uuid4().hex}.parquet")
        tmp = os.path.join(path, "." + os.path.basename(final) + ".tmp")
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, final)

    def commit(
        self,
        run_id: str,
        stage: str,
        rows_out: int,
        rows_in: int | None = None,
        sink: str | None = None,
    ) -> None:
        self._append_rows([(run_id, stage, sink, rows_in, rows_out)])

    def commit_many(self, run_id: str, stage: str, per_sink_counts: list[tuple[str, int]]) -> None:
        self._append_rows([(run_id, stage, s, None, n) for s, n in per_sink_counts])
