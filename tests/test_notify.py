"""Notify payload goldens (§2C-6, internal/notify/payload.go:16-75 +
notifier_test.go:552 TestURLEncoding)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.plans.notify import marshal_batch, notify_records


def test_url_encoding_golden(spark):
    """notifier_test.go:552: 'raw/plus+char file.json' →
    'raw%2Fplus%2Bchar+file.json' (url.QueryEscape semantics)."""
    df = spark.createDataFrame(
        [("b", "raw/plus+char file.json", 10)], "bucket string, key string, size long"
    )
    rec = notify_records(df, event_time=F.lit("2026-01-01T00:00:00Z")).collect()[0][
        "record"
    ]
    assert rec["s3"]["object"]["key"] == "raw%2Fplus%2Bchar+file.json"
    assert rec["s3"]["bucket"]["name"] == "b"  # bucket verbatim
    assert rec["s3"]["object"]["size"] == 10
    assert rec["eventSource"] == "aws:s3"
    assert rec["eventName"] == "ObjectCreated:Put"


def test_envelope_shape(spark):
    """marshalBatch byte shape: {"Records":[...]} with one record per
    event, all stamped with the batch time (payload.go:49-75)."""
    df = spark.createDataFrame(
        [("bkt", "a.json", 1), ("bkt", "b dir/c.json", 2)],
        "bucket string, key string, size long",
    )
    body = marshal_batch(df, event_time=F.lit("2026-01-01T00:00:00Z"))
    env = json.loads(body)
    assert set(env) == {"Records"}
    assert len(env["Records"]) == 2
    keys = sorted(r["s3"]["object"]["key"] for r in env["Records"])
    assert keys == ["a.json", "b+dir%2Fc.json"]
    assert all(r["eventTime"] == "2026-01-01T00:00:00Z" for r in env["Records"])
