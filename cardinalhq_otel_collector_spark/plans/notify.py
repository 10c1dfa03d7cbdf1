"""A15/§2C-6 — post-commit notification payload (S3 event shape).

The reference POSTs committed-object events to a webhook
(exporter/awss3exporter/internal/notify/payload.go:16-75): an AWS
S3-event envelope ``{"Records":[...]}`` whose load-bearing fields are
bucket.name, object.key (URL query-escaped) and object.size. Here the
queue/retry machinery is the ``_lineage`` table (plans/lineage.py); this
module renders the SAME byte shape from committed-file rows so a
lakerunner-style consumer can be pointed at either system.

One ``to_json`` projection per record — records group into one envelope
per micro-batch/run with a plain collect over the (tiny) per-run file
list, mirroring marshalBatch's batch-of-events contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["s3_event_record", "notify_records", "marshal_batch"]

_EVENT_SOURCE = "aws:s3"           # payload.go:17
_EVENT_NAME = "ObjectCreated:Put"  # payload.go:18


def s3_event_record(bucket: Column, key: Column, size: Column, event_time: Column) -> Column:
    """One s3Record struct. The key is URL-encoded (url.QueryEscape —
    Spark's url_encode is the same application/x-www-form-urlencoded
    escaping, '+' for space); the bucket is verbatim (payload.go:55-56)."""
    return F.struct(
        F.lit(_EVENT_SOURCE).alias("eventSource"),
        F.lit(_EVENT_NAME).alias("eventName"),
        event_time.alias("eventTime"),
        F.struct(
            F.struct(bucket.alias("name")).alias("bucket"),
            F.struct(
                F.url_encode(key).alias("key"),
                size.cast("long").alias("size"),
            ).alias("object"),
        ).alias("s3"),
    )


def notify_records(
    df: DataFrame,
    bucket_col: str = "bucket",
    key_col: str = "key",
    size_col: str = "size",
    event_time: Column | None = None,
) -> DataFrame:
    """Add a ``record`` struct column per committed file row. ``event_time``
    defaults to a single batch-serialization timestamp (RFC3339 UTC) —
    marshalBatch stamps the batch time, not per-event upload time
    (payload.go:49-53)."""
    ts = event_time if event_time is not None else F.date_format(
        F.current_timestamp(), "yyyy-MM-dd'T'HH:mm:ssXXX"
    )
    return df.withColumn(
        "record",
        s3_event_record(F.col(bucket_col), F.col(key_col), F.col(size_col), ts),
    )


def marshal_batch(df: DataFrame, **kwargs) -> str:
    """The full envelope for one batch: {"Records":[...]} — byte shape of
    marshalBatch (payload.go:57-75). The per-run committed-file list is
    control-plane sized, so the final assembly is a bounded collect."""
    recs = notify_records(df, **kwargs).select(F.to_json(F.col("record")).alias("j"))
    body = ",".join(r["j"] for r in recs.collect())
    return '{"Records":[' + body + "]}"
