"""Physical-plan quality gates — the 100TB obligations checked on the
actual executed plans (SURVEY.md §4):

  * filters/projection reach the parquet scan (PushedFilters/ReadSchema)
  * lookup joins go broadcast, never shuffle the fact stream
  * the decorate chain stays whole-stage-codegen JVM (no Python nodes)
  * partitioned reads prune to one sink directory
"""

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.config import PipelineConfig
from cardinalhq_otel_collector_spark.datagen import routing_rules, tool_lookup
from cardinalhq_otel_collector_spark.operators.enrich import enrich
from cardinalhq_otel_collector_spark.plans.pipeline import ROUTED_TABLE, decorate, run_pipeline


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(100).withColumn("k", F.col("id") % 7).write.parquet(p)
    df = spark.read.parquet(p).filter(F.col("id") > 50).select("id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,50)]" in plan
    assert "ReadSchema: struct<id:bigint>" in plan  # column pruning: k dropped


def test_enrich_is_broadcast_join(spark, transcripts_df):
    out = enrich(transcripts_df, tool_lookup(spark), "tool")
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_decorate_chain_is_jvm_only(spark, transcripts_df):
    cfg = PipelineConfig(rules=routing_rules()).validate()
    df = decorate(transcripts_df, cfg, cluster=False)
    plan = _plan(df)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    # after execution the finalized AQE plan must be codegen'd end-to-end
    df.write.format("noop").mode("overwrite").save()
    final = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in final


def test_routed_read_prunes_to_sink_partition(spark, transcripts_df, warehouse):
    run_pipeline(spark, transcripts_df, warehouse, run_id="plans")
    pruned = warehouse.read_partition(ROUTED_TABLE, sink="errors")
    # partition-pruned read: only the errors directory is scanned
    assert pruned.select("sink").distinct().collect()[0]["sink"] == "errors"
    full = warehouse.read(ROUTED_TABLE)
    assert pruned.count() < full.count()
    files = pruned.inputFiles()
    assert files and all("sink=errors" in f for f in files)  # only one dir scanned


def test_aggregate_is_partial_then_final(spark, transcripts_df):
    agg = transcripts_df.groupBy("conv_id").count()
    plan = _plan(agg)
    # two HashAggregate nodes around the exchange = map-side combine
    assert plan.count("HashAggregate") >= 2
