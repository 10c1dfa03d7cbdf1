#!/usr/bin/env python
"""Cluster entry point: run the transcript pipeline via spark-submit.

    spark-submit --py-files cardinalhq_otel_collector_spark.zip \
        spark_submit_job.py \
        --input  <path or table of transcripts (conv_id,turn_idx,role,text,tool,ts)> \
        --warehouse <output warehouse root> \
        --run-id <stable id for idempotent resume> [--resume] \
        [--interval '1 hour'] [--salt 64] [--granularity day]

On a real cluster the master/executor topology comes from spark-submit;
build_spark only fills in SQL-level defaults (AQE, UTC, Arrow) and does
not override an externally configured master. Re-running with the same
--run-id and --resume skips stages already committed in _lineage —
the mid-run crash-resume contract (BASELINE.md).

Synthetic-input mode (--generate N) writes a deterministic N-conversation
transcript table first — for smoke-testing a cluster deployment without
data.
"""

from __future__ import annotations

import argparse
import json

from cardinalhq_otel_collector_spark.config import PipelineConfig
from cardinalhq_otel_collector_spark.datagen import routing_rules, transcripts
from cardinalhq_otel_collector_spark.plans.pipeline import run_pipeline
from cardinalhq_otel_collector_spark.session import build_spark
from cardinalhq_otel_collector_spark.sources.catalog import Catalog


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="transcripts parquet path (or use --generate)")
    ap.add_argument("--generate", type=int, default=0, help="generate N synthetic conversations instead of reading --input")
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--interval", default="1 hour")
    ap.add_argument("--salt", type=int, default=64)
    ap.add_argument("--granularity", default="day", choices=["day", "hour", "minute"])
    ap.add_argument("--iceberg", action="store_true",
                    help="write sinks through the Iceberg catalog (requires the "
                    "iceberg-spark-runtime jar + spark.sql.catalog.local conf)")
    args = ap.parse_args()
    if not args.input and not args.generate:
        ap.error("one of --input / --generate is required")

    spark = build_spark(app_name=f"transcript-pipeline-{args.run_id}")
    df = (
        transcripts(spark, n_convs=args.generate, hot_convs=max(2, args.generate // 1000))
        if args.generate
        else spark.read.parquet(args.input)
    )
    cfg = PipelineConfig(
        rules=routing_rules(),
        agg_interval=args.interval,
        salt_partitions=args.salt,
        partition_granularity=args.granularity,
    )
    summary = run_pipeline(
        spark, df, Catalog(spark, args.warehouse, use_iceberg=args.iceberg),
        config=cfg, run_id=args.run_id, resume=args.resume,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
