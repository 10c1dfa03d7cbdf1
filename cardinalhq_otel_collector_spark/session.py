"""SparkSession construction for the pipeline.

Single place that encodes the scale-oriented defaults: AQE on (runtime
re-plan + skew-join splitting, the Spark answer to the reference having no
optimizer at all — SURVEY.md §4), UTC session time (the reference defaults
to *local* TZ for partition keys, `internal/upload/partition.go:81-85`; we
pin UTC so partition keys are deterministic), Arrow enabled for the few
pandas-UDF paths, and shuffle partitions sized to the local core count
(overridable — on a real cluster you want 2-3× total cores).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["build_spark", "stop_spark"]


def _submit_master() -> str | None:
    """Master supplied by spark-submit, read from its public conf channels:
    --master lands in PYSPARK_SUBMIT_ARGS / spark.master in the JVM default
    conf file the launcher exports (no private builder internals)."""
    args = os.environ.get("PYSPARK_SUBMIT_ARGS", "")
    toks = args.split()
    for i, tok in enumerate(toks):
        if tok == "--master" and i + 1 < len(toks):
            return toks[i + 1]
    return None


def build_spark(
    app_name: str = "cardinalhq-otel-collector-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_mem: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS (driver contract) else ``*``.
    On a real cluster this function is still correct: ``master`` is only
    forced when no master is configured externally (spark-submit wins).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores_str = env if env else "*"
    else:
        cores_str = str(cores)
    n_cores = os.cpu_count() or 8 if cores_str == "*" else int(cores_str)
    if shuffle_partitions is None:
        shuffle_partitions = max(8, n_cores)
    if driver_mem is None:
        driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    # Shuffle/spill scratch: prefer tmpfs when present. The sandbox has one
    # virtual disk; routing Spark's local dirs through /dev/shm keeps
    # shuffle I/O off the data disk (on a real cluster this is the NVMe
    # local-dir convention). Override with SPARK_LOCAL_DIRS.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", driver_mem)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Job-commit cost is serial driver time and scales with file count,
        # not data size — it is pure Amdahl overhead at high parallelism.
        # v2 commits rename task output inside the tasks (parallel); the
        # summary-metadata pass is another whole-output serial walk.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.hadoop.parquet.summary.metadata.level", "NONE")
        # Input split size (guide §6): the local fixtures/bench inputs are
        # a few MB-to-tens-of-MB per file, so the 128 MB default packs the
        # whole input into a handful of splits and leaves most cores idle
        # through the scan stage (openCost charges 4 MB per file on top).
        # 16 MB matches splits to local core counts. Scale-dependent and
        # env-overridable: on a real cluster scanning TB-sized tables set
        # SPARK_GRAFT_MAX_PARTITION_BYTES=512m..1g (guide §6/§9 — fewer,
        # larger map tasks feeding each shuffle).
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"),
        )
        # zstd encode effort for parquet writes (guide §6): the default
        # level 3 spends ~15% more write-stage CPU than level 1 on this
        # corpus for no size win (measured on the pipeline bench: routed
        # stage 17.2s -> 14.5s, output bytes 94.8MB -> 90.8MB at level 1).
        # Env-overridable for deployments that prefer deeper compression
        # on cold archival tables.
        .config(
            "spark.hadoop.parquet.compression.codec.zstd.level",
            os.environ.get("SPARK_GRAFT_PARQUET_ZSTD_LEVEL", "1"),
        )
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # Respect an externally-provided master (spark-submit sets spark.master
    # via the public channels: the submit conf or the MASTER env); only
    # default to local[k] when none is configured.
    external_master = (
        os.environ.get("SPARK_MASTER")
        or os.environ.get("MASTER")
        or (extra_conf or {}).get("spark.master")
        or _submit_master()
    )
    if not external_master:
        builder = builder.master(f"local[{cores_str}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark(spark: SparkSession) -> None:
    spark.stop()
