from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.datagen import (
    role_lookup,
    tool_lookup,
    transcripts,
)


def test_schema(transcripts_df):
    assert dict(transcripts_df.dtypes) == {
        "conv_id": "string",
        "turn_idx": "int",
        "role": "string",
        "text": "string",
        "tool": "string",
        "ts": "timestamp",
    }


def test_deterministic(spark, transcripts_df):
    again = transcripts(spark, n_convs=120, hot_convs=2, partitions=3)  # different partitioning
    a = sorted(transcripts_df.collect())
    b = sorted(again.collect())
    assert a == b


def test_unique_turns_and_ordering(transcripts_df):
    n = transcripts_df.count()
    assert transcripts_df.select("conv_id", "turn_idx").distinct().count() == n
    # turn 0 exists for every conversation
    n_convs = transcripts_df.select("conv_id").distinct().count()
    assert transcripts_df.filter(F.col("turn_idx") == 0).count() == n_convs == 120


def test_hot_conversations_are_hot(transcripts_df):
    per_conv = transcripts_df.groupBy("conv_id").count().collect()
    counts = {r["conv_id"]: r["count"] for r in per_conv}
    hot = [counts["conv-00000000"], counts["conv-00000001"]]
    rest = [v for k, v in counts.items() if k not in ("conv-00000000", "conv-00000001")]
    assert min(hot) > 5 * max(rest)


def test_content_mix(transcripts_df):
    text = F.col("text")
    grok = transcripts_df.filter(text.startswith("level=")).count()
    email = transcripts_df.filter(text.rlike("@example.com")).count()
    uuid = transcripts_df.filter(text.rlike("[0-9a-f]{8}-[0-9a-f]{4}-")).count()
    pattern = transcripts_df.filter(text.startswith("connection ")).count()
    free = transcripts_df.filter(
        ~text.startswith("level=") & ~text.rlike("@example.com")
        & ~text.startswith("callback") & ~text.startswith("connection")
    ).count()
    for n in (grok, email, uuid, pattern, free):
        assert n > 0


def test_ts_spans_buckets(transcripts_df):
    hours = transcripts_df.select(F.date_trunc("hour", "ts").alias("h")).distinct().count()
    assert hours >= 3


def test_lookups(spark):
    tools = tool_lookup(spark)
    assert tools.count() == 4
    assert "unknown_tool" not in {r["tool"] for r in tools.collect()}
    roles = role_lookup(spark)
    assert {r["role"] for r in roles.collect()} == {"user", "assistant", "system", "tool"}
