"""Iceberg-backed catalog: the SAME pipeline invariants as the parquet
warehouse, against ``Catalog(use_iceberg=True)``.

The sandbox ships no iceberg-spark-runtime jar, so this module skip-marks
itself; on a cluster (``spark-submit --packages
org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<ver>``) it executes
as-is. What flips with the jar present:

  * ``Catalog.write`` → ``writeTo(...).using("iceberg")`` snapshot commits
    (createOrReplace / append) instead of directory overwrite;
  * ``Catalog.read`` → ``spark.table`` (manifest pruning instead of path
    listing); ``read_partition`` → a filter pruned at the manifest level;
  * lineage commits → catalog-tracked appends (a stray parquet file is
    invisible to an Iceberg table without a snapshot).
"""

from __future__ import annotations

import os
import sys
import tempfile

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _have_iceberg() -> bool:
    import glob

    import pyspark

    jars = glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*.jar"))
    extra = os.environ.get("SPARK_GRAFT_EXTRA_JARS", "")
    return any("iceberg-spark-runtime" in j for j in jars) or "iceberg" in extra


pytestmark = pytest.mark.skipif(
    not _have_iceberg(),
    reason="iceberg-spark-runtime jar not on the classpath (sandbox ships none); "
    "run with --packages org.apache.iceberg:iceberg-spark-runtime to execute",
)


@pytest.fixture(scope="module")
def iceberg_spark():
    from pyspark.sql import SparkSession

    wh = tempfile.mkdtemp(prefix="iceberg_wh_")
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("iceberg-invariants")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", wh)
        .getOrCreate()
    )
    yield spark, wh
    spark.stop()


def test_pipeline_invariants_on_iceberg(iceberg_spark):
    import pyspark.sql.functions as F

    from cardinalhq_otel_collector_spark.datagen import transcripts
    from cardinalhq_otel_collector_spark.plans.pipeline import (
        AGG_TABLE,
        ROUTED_TABLE,
        run_pipeline,
    )
    from cardinalhq_otel_collector_spark.sources.catalog import (
        Catalog,
        iceberg_available,
    )

    spark, wh = iceberg_spark
    assert iceberg_available(spark)
    df = transcripts(spark, n_convs=200)
    ice = Catalog(spark, wh, use_iceberg=True)
    pq = Catalog(spark, tempfile.mkdtemp(prefix="pq_wh_"))
    run_pipeline(spark, df, ice, run_id="ice-1")
    run_pipeline(spark, df, pq, run_id="pq-1")

    # invariant: identical per-sink routed counts + aggregate counts on
    # both storage backends (storage must be semantics-invisible)
    for cat_a, cat_b, table in ((ice, pq, ROUTED_TABLE), (ice, pq, AGG_TABLE)):
        a = {r["sink"]: r["n"] for r in cat_a.read(table).groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()}
        b = {r["sink"]: r["n"] for r in cat_b.read(table).groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert a == b


def test_resume_skips_stages_on_iceberg(iceberg_spark):
    from cardinalhq_otel_collector_spark.datagen import transcripts
    from cardinalhq_otel_collector_spark.plans.pipeline import run_pipeline
    from cardinalhq_otel_collector_spark.sources.catalog import Catalog

    spark, wh = iceberg_spark
    ice = Catalog(spark, wh, use_iceberg=True)
    df = transcripts(spark, n_convs=50)
    run_pipeline(spark, df, ice, run_id="ice-resume")
    second = run_pipeline(spark, df, ice, run_id="ice-resume", resume=True)
    assert second["stages_run"] == []
    assert len(second["stages_skipped"]) == 3
