"""Driver contract: entry / queries / oracle_sql.

Every ``queries()`` entry calls the LIBRARY operators
(``cardinalhq_otel_collector_spark.operators.*``) over the driver's parquet
tables; the matching ``oracle_sql()`` string is the same computation in
DuckDB SQL. A regression in any operator turns its CORRECTNESS row red —
the oracle validates this repo's code, not Spark's SQL engine.

Column names/aliases are identical on both sides. Floating-point
aggregates are engine-portable: sums accumulate in DECIMAL (exact) and cast
to DOUBLE at the end; orderings carry explicit integer tiebreakers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf string ('134217728', '128m', '16MB')."""
    s = v.strip().lower().removesuffix("b")
    mult = 1
    for suffix, m in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30)):
        if s.endswith(suffix):
            s, mult = s[: -1], m
            break
    return int(float(s) * mult)


_SCAN_EST_CACHE: dict[tuple[str, str], int] = {}
_SCAN_SIZE_CACHE: dict[tuple[str, str], int] = {}

# unique-ish key per fixture table for the deterministic hash respread
_RESPREAD_KEYS: dict[str, str] = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
}


def _read(
    spark: SparkSession, sf_dir: str, table: str, spread: bool = False
) -> DataFrame:
    path = f"{sf_dir}/{table}.parquet"
    df = spark.read.parquet(path)
    if not spread:
        # Aggregate-first queries collapse their input with map-side
        # partial aggregation before any shuffle, so a pre-exchange only
        # adds cost (measured +0.5-0.8s flat per query at sf1.0);
        # per-row-heavy queries opt in below.
        return df
    # Scan-parallelism guard (optimization guide §2.5 input skew, §6 split
    # size): the small-SF fixtures are single parquet files with ONE row
    # group, so the scan — and every projection/explode/broadcast-probe
    # Catalyst fuses into it — lands on 1-2 cores no matter how many the
    # session has. Re-spread such inputs across the cluster; inputs big
    # enough to split natively (est splits >= parallelism) must NOT pay a
    # needless full-table exchange, so this is a no-op at real scale.
    # Every query here is partitioning-invariant by construction (decimal
    # sums, explicit tiebreakers — module docstring), so the round-robin
    # respread cannot change any result.
    par = spark.sparkContext.defaultParallelism
    key = (sf_dir, table)
    est = _SCAN_EST_CACHE.get(key)
    if est is None:
        import os

        try:
            if os.path.isdir(path):
                size = sum(
                    os.path.getsize(os.path.join(dp, f))
                    for dp, _, fs in os.walk(path)
                    for f in fs
                )
            else:
                size = os.path.getsize(path)
        except OSError:
            size = 1 << 50
        try:
            mpb = _parse_bytes(
                spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
            )
        except ValueError:
            mpb = 128 << 20
        est = int(size // max(mpb, 1)) + 1
        _SCAN_EST_CACHE[key] = est
        _SCAN_SIZE_CACHE[key] = size
    # Trigger only when the native split count is far below the core
    # count: a table that already splits par/4-wide (e.g. the 126 MB
    # lineitem file) loses more to a full-width exchange than it gains
    # in extra parallelism (measured: tpch_q1 2.5s → 3.3s when respread).
    # Tables under 256 KB (region/nation/supplier) skip it — they are
    # broadcast-side dimensions where 64 near-empty tasks is pure
    # overhead. Hash-partition on the table's unique key, NOT round-robin:
    # round-robin pays a local sort of the whole input on the (single)
    # scan task (SPARK-23207), a hash exchange does not, and a
    # deterministic key is retry-safe (guide §2.5).
    if est < max(par // 4, 2) and _SCAN_SIZE_CACHE.get(key, 0) >= (256 << 10):
        split_key = _RESPREAD_KEYS.get(table)
        if split_key is not None:
            df = df.repartition(2 * par, F.col(split_key))
        else:
            df = df.repartition(2 * par)
    return df


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in _TABLES:
        # lineitem is the one fact-sized view (tpch_q1's decimal-heavy
        # aggregation input): the respread wins there (measured 2.4s ->
        # 2.2s); dimension views are broadcast-side and stay plain
        _read(spark, sf_dir, t, spread=(t == "lineitem")).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Shared fixtures: the routing rule table used by the route() queries (the
# same table drives the DuckDB CASE oracle via routing_case_sql()).
# ---------------------------------------------------------------------------

_EVENT_RULES = [
    {"rule_id": 1, "predicate": "event_type = 'error'", "sink": "errors"},
    {"rule_id": 2, "predicate": "k >= 80", "sink": "hot_keys"},
    {"rule_id": 3, "predicate": "value >= 150.0", "sink": "big_values"},
]

_DEC = "decimal(18,6)"


def _parsed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 analogue on the events table: JSON-prop extraction (otlpjson
    connector shape, __spark_entry__ parse stage)."""
    return _read(spark, sf_dir, "events", spread=True).withColumn(
        "k", F.get_json_object("props", "$.k").cast("int")
    )


# ---------------------------------------------------------------------------
# Library-backed queries (full DuckDB oracle each)
# ---------------------------------------------------------------------------


def q_pipeline_route_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1-A8 + S1/S5/S7: parse → route (first-match rules) → per-sink
    interval aggregate (aggregationprocessor aggregate.go:228-294;
    routingconnector manifest :282)."""
    from cardinalhq_otel_collector_spark.operators.aggregate import interval_aggregate
    from cardinalhq_otel_collector_spark.operators.route import route

    routed = route(_parsed_events(spark, sf_dir), _EVENT_RULES)
    agg = interval_aggregate(
        routed.withColumn("_v", F.col("value").cast(_DEC)),
        keys=["sink", "event_type"], interval="1 hour", value_col="_v",
    )
    return agg.select(
        "sink", "event_type", "bucket_start", "n",
        F.col("total").cast("double").alias("total"),
    )


def q_route_fanout_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.route import route

    routed = route(_parsed_events(spark, sf_dir), _EVENT_RULES)
    return routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n"))


def q_interval_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4 interval stats (aggregate.go:204-294)."""
    from cardinalhq_otel_collector_spark.operators.aggregate import interval_stats

    return interval_stats(
        _read(spark, sf_dir, "events"), keys=["event_type"], value_col="value",
        interval="1 hour",
    )


def q_cumulative_to_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.stateful import cumulative_to_delta

    out = cumulative_to_delta(
        _read(spark, sf_dir, "events"), series=["user_id"], value_col="value",
        tiebreak=["event_id"],
    )
    return out.select("event_id", "user_id", "ts", "delta")


def q_delta_to_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.stateful import delta_to_cumulative

    df = _read(spark, sf_dir, "events").withColumn("_v", F.col("value").cast(_DEC))
    out = delta_to_cumulative(df, series=["user_id"], value_col="_v", tiebreak=["event_id"])
    return out.select(
        "event_id", "user_id", "ts", F.col("cumulative").cast("double").alias("cumulative")
    )


def q_delta_to_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.stateful import delta_to_rate

    out = delta_to_rate(
        _read(spark, sf_dir, "events"), series=["user_id"], value_col="value",
        tiebreak=["event_id"],
    )
    return out.select(
        "event_id", "user_id", "ts", (F.round("rate", 6) + 0.0).alias("rate")
    )


def q_metric_start_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.stateful import fill_start_time

    filled = fill_start_time(_read(spark, sf_dir, "events"), series=["user_id"])
    return filled.groupBy("user_id").agg(
        F.min("start_ts").alias("start_ts"), F.count(F.lit(1)).alias("n")
    )


def q_interval_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.stateful import interval_last

    out = interval_last(
        _read(spark, sf_dir, "events"), series=["user_id"], value_col="value",
        interval="1 hour", tiebreak=["event_id"],
    )
    return out.select("user_id", "bucket_start", "last_value")


def q_log_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.sampling import log_dedup

    ev = _read(spark, sf_dir, "events").withColumn(
        "k", F.get_json_object("props", "$.k")
    )
    out = log_dedup(ev, body_col="event_type", interval="1 minute", extra_keys=["k"])
    return out.select("bucket_start", "event_type", "k", "dup_count")


def q_probabilistic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.sampling import probabilistic_sample

    out = probabilistic_sample(_read(spark, sf_dir, "events"), "event_id", 0.25)
    return out.select("event_id", "event_type")


def q_tail_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.sampling import tail_sample

    out = tail_sample(
        _read(spark, sf_dir, "events"), group_col="user_id",
        keep_predicate="event_type = 'error'",
    )
    return out.select("event_id", "user_id", "event_type")


def q_group_by_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.grouping import assemble_ordered

    return assemble_ordered(
        _read(spark, sf_dir, "events"), group_col="user_id",
        order_cols=["ts", "event_id"], payload_col="event_type",
    )


def q_summary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 — the summary explode over lineitem-derived Summary rows
    (summarysplitprocessor/metrics.go:91-198)."""
    from cardinalhq_otel_collector_spark.operators.summary_split import summary_split

    s = _read(spark, sf_dir, "lineitem").groupBy(
        F.col("l_returnflag").alias("flag")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("qsum"),
        F.min("l_quantity").cast("double").alias("qmin"),
        F.max("l_quantity").cast("double").alias("qmax"),
    )
    summaries = s.select(
        F.concat(F.lit("lineitem.qty."), "flag").alias("name"),
        F.col("cnt").alias("count"),
        F.col("qsum").alias("sum"),
        F.array(
            F.struct(F.lit(0.0).alias("q"), F.col("qmin").alias("v")),
            F.struct(F.lit(1.0).alias("q"), F.col("qmax").alias("v")),
        ).alias("quantiles"),
        F.lit(1).cast("long").alias("ts_ms"),
        F.lit(1).cast("long").alias("start_ts_ms"),
    )
    return summary_split(summaries).select("metric", "value")


def q_enrich_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16 broadcast enrichment; unknown keys behave like auth-denied
    (serverauth.go:181-222) → 'unknown'."""
    from cardinalhq_otel_collector_spark.operators.enrich import enrich

    lookup = _read(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    out = enrich(
        _read(spark, sf_dir, "events"), lookup, on="user_id",
        fill_unknown={"segment": "unknown"},
    )
    return out.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast(_DEC)).cast("double").alias("total"),
    )


def q_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k8sattributes/geoip-style chained broadcast lookups."""
    from cardinalhq_otel_collector_spark.operators.enrich import enrich

    nation = _read(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey"
    )
    region = _read(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    out = enrich(enrich(_read(spark, sf_dir, "customer"), nation, on="c_nationkey"),
                 region, on="n_regionkey")
    return out.groupBy(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("total_acctbal"),
    )


def q_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 pass 1 over synthetic log lines: mask → template → count."""
    from cardinalhq_otel_collector_spark.operators.fingerprint import fingerprint

    lines = _read(spark, sf_dir, "events", spread=True).select(
        F.concat(
            F.lit("user "), F.col("user_id").cast("string"),
            F.lit(" did "), F.col("event_type"),
            F.lit(" k="), F.get_json_object("props", "$.k"),
        ).alias("line")
    )
    return fingerprint(lines, text_col="line").groupBy("template").agg(
        F.count(F.lit(1)).alias("n")
    )


def q_sumo_marshal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 — the real sumo_ic line (sumo_marshaler.go:70-146): _source*
    attrs quoted, 'fields' = remaining resource attrs (sorted keys),
    'message' = log attrs + body under 'log'."""
    from cardinalhq_otel_collector_spark.operators.marshal import sumo_ic_lines

    ev = _read(spark, sf_dir, "events", spread=True)
    out = sumo_ic_lines(
        ev,
        source_name=F.lit("events"),
        source_host=F.concat(F.lit("host-"), F.col("user_id").cast("string")),
        source_category=F.col("event_type"),
        body=F.col("props"),
        ts=F.col("ts"),
        fields={"account": F.lit("dev"), "region": F.lit("us-east-1")},
        message_attrs={"user": F.concat(F.lit("u"), F.col("user_id").cast("string"))},
    )
    return out.select("event_id", "line")


def q_partition_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 time-partitioned object keys (internal/upload/partition.go:59-134)."""
    from cardinalhq_otel_collector_spark.functions import object_key

    ev = _read(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        object_key(
            F.col("ts"), "bucket/prefix", "", "events", F.col("event_type"),
            fmt="parquet", granularity="hour",
        ).alias("object_key"),
    )


def q_unroll_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.unroll import unroll

    docs = _read(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    return unroll(docs, "toks", "w").groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens")
    )


def q_otlp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 otlp_json byte shape (marshaler.go:53-58): marshal each event to
    an OTLP/JSON envelope, parse it back — the oracle is the identity
    projection, so any byte-shape drift breaks the round trip."""
    from cardinalhq_otel_collector_spark.operators.marshal import (
        otlp_json_logs,
        parse_otlp_json_logs,
    )

    ev = _read(spark, sf_dir, "events")
    m = otlp_json_logs(
        ev, body=F.col("props"), ts=F.col("ts"),
        attrs={"event_type": F.col("event_type")},
    )
    p = parse_otlp_json_logs(m)
    return p.select(
        "event_id",
        F.col("parsed_body").alias("body"),
        F.col("parsed_ts").cast("timestamp_ntz").alias("ts2"),
        F.element_at("parsed_attrs", "event_type").alias("event_type"),
    )


def _otlp_proto_duck() -> str:
    """Independent DuckDB assembly of the protobuf wire bytes as lowercase
    hex. Tags and field numbers come straight from the public OTLP proto
    definitions (LogsData.resource_logs=1; ResourceLogs.resource=1,
    .scope_logs=2; Resource.attributes=1; ScopeLogs.log_records=2;
    LogRecord.time_unix_nano=1 fixed64, .body=5, .attributes=6;
    AnyValue.string_value=1; KeyValue.key=1, .value=2). Lengths are
    single-byte varints — every nested message in this query is < 128
    bytes, and the final SELECT error()s loudly if data growth ever
    breaks that assumption rather than producing wrong bytes. The
    constant resource attribute (service=events) is a spelled-out hex
    literal; the fixed64 timestamp is little-endian via bit shifts."""

    def hx(n: int) -> str:
        return format(n, "02x")

    # KeyValue{key="service", value=AnyValue{string_value="events"}}
    svc_kv = "0a07" + "73657276696365" + "1208" + "0a06" + "6576656e7473"
    resource_payload = "0a" + hx(len(svc_kv) // 2) + svc_kv  # Resource.attributes=1
    resource_field = "0a" + hx(len(resource_payload) // 2) + resource_payload
    ts_le = " || ".join(
        f"lpad(lower(hex((nanos >> {8 * i}) & 255)), 2, '0')" for i in range(8)
    )

    def ln(expr: str) -> str:  # hex length byte of a hex-string column
        return f"lpad(lower(hex(length({expr}) // 2)), 2, '0')"

    return f"""
WITH e AS (
  SELECT event_id,
         lower(hex(event_type)) AS body_hex,
         octet_length(CAST(event_type AS BLOB)) AS body_len,
         lower(hex('u' || CAST(user_id AS VARCHAR))) AS uv_hex,
         octet_length(CAST('u' || CAST(user_id AS VARCHAR) AS BLOB)) AS uv_len,
         epoch_us(ts) * 1000 AS nanos
  FROM events
),
parts AS (
  SELECT event_id, nanos,
         '0a' || lpad(lower(hex(body_len)), 2, '0') || body_hex AS any_body,
         '0a' || lpad(lower(hex(uv_len)), 2, '0') || uv_hex AS any_user
  FROM e
),
rec AS (
  -- LogRecord: time=1 fixed64 LE ('09'), body=5 ('2a'), attributes=6
  -- ('32', KeyValue payload = 6 key-field bytes + 2 value-field header
  -- bytes + the AnyValue bytes)
  SELECT event_id,
         '09' || {ts_le}
              || '2a' || {ln('any_body')} || any_body
              || '32' || lpad(lower(hex(8 + length(any_user) // 2)), 2, '0')
                      || '0a04' || '75736572'
                      || '12' || {ln('any_user')} || any_user
         AS record
  FROM parts
),
sl AS (SELECT event_id, '12' || {ln('record')} || record AS scope_logs FROM rec),
rl AS (
  SELECT event_id,
         '{resource_field}' || '12' || {ln('scope_logs')} || scope_logs AS rlogs
  FROM sl
)
SELECT event_id,
       CASE WHEN length(rlogs) // 2 < 128
            THEN '0a' || {ln('rlogs')} || rlogs
            ELSE error('oracle varint assumption broken: message >= 128 bytes')
       END AS proto_hex
FROM rl
"""


def q_otlp_proto_marshal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 otlp_proto byte shape (marshaler.go:42-71 proto branch,
    s3_marshaler.go:22-32): byte-level protobuf wire format per event,
    compared as lowercase hex against a DuckDB oracle that assembles the
    IDENTICAL bytes from the wire-format spec (varints, tags, fixed64 LE
    timestamp) with no shared code."""
    from cardinalhq_otel_collector_spark.operators.marshal import otlp_proto_logs

    ev = _read(spark, sf_dir, "events")
    m = otlp_proto_logs(
        ev,
        body=F.col("event_type"),
        ts=F.col("ts"),
        resource_attrs={"service": F.lit("events")},
        attrs={"user": F.concat(F.lit("u"), F.col("user_id").cast("string"))},
    )
    return m.select("event_id", F.lower(F.hex("otlp_proto")).alias("proto_hex"))


def q_genai_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """genainormalizerprocessor analogue (components.go:126,:713): role
    synonyms → canonical, model string → (gen_ai.system, family)."""
    from cardinalhq_otel_collector_spark.operators.genai import normalize_genai

    raw_role = (
        F.when(F.pmod("event_id", F.lit(6)) == 0, "Human")
        .when(F.pmod("event_id", F.lit(6)) == 1, "AI")
        .when(F.pmod("event_id", F.lit(6)) == 2, "bot")
        .when(F.pmod("event_id", F.lit(6)) == 3, "SYSTEM")
        .when(F.pmod("event_id", F.lit(6)) == 4, "function")
        .otherwise("user")
    )
    raw_model = (
        F.when(F.pmod("user_id", F.lit(4)) == 0, "gpt-4-turbo-2024-04-09")
        .when(F.pmod("user_id", F.lit(4)) == 1, "claude-3-opus-20240229")
        .when(F.pmod("user_id", F.lit(4)) == 2, "gemini-1.5-pro-latest")
        .otherwise("llama-3-70b")
    )
    turns = _read(spark, sf_dir, "events").select(
        "event_id", raw_role.alias("role"), raw_model.alias("model")
    )
    out = normalize_genai(turns, role_col="role", model_col="model")
    return out.select(
        "event_id", "role", "role_raw", "gen_ai_system", "gen_ai_request_model"
    )


def q_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spanmetrics explicit-bounds latency histogram (SURVEY §2B)."""
    from cardinalhq_otel_collector_spark.operators.histogram import latency_histogram

    out = latency_histogram(
        _read(spark, sf_dir, "events"), keys=["event_type"], value_col="value",
        bounds=[50.0, 100.0, 200.0, 400.0], interval="1 hour",
    )
    return out.select("event_type", "bucket_start", "bucket_idx", "le", "bucket_count")


def q_red_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.histogram import red_metrics

    return red_metrics(
        _read(spark, sf_dir, "events"), keys=["event_type"], value_col="value",
        error_predicate="value >= 195.0", interval="1 hour",
    )


def q_agg_type_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/A5 — per-series agg-type override + additional_attributes
    (aggregationprocessor/config.go:24-31, aggregate.go:204-226)."""
    from cardinalhq_otel_collector_spark.operators.aggregate import aggregate_with_override

    agg_type = (
        F.when(F.col("event_type") == "click", "sum")
        .when(F.col("event_type") == "view", "avg")
        .when(F.col("event_type") == "error", "max")
        .when(F.col("event_type") == "signup", "min")
        .otherwise("avg")
    )
    ev = _read(spark, sf_dir, "events").withColumn("agg_type", agg_type)
    return aggregate_with_override(
        ev, keys=["event_type"], value_col="value", agg_type_col="agg_type",
        interval="1 hour",
        additional_attributes={"aggregated": "true"},
    )


def q_exceptions_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptionsconnector (manifest :276): error rollup + stable exemplar."""
    from cardinalhq_otel_collector_spark.operators.exceptions import exceptions_rollup

    out = exceptions_rollup(
        _read(spark, sf_dir, "events"), "event_type = 'error'",
        keys=["user_id"], message_col="props", interval="1 hour",
    )
    return out.select("user_id", "bucket_start", "n_exceptions", "exemplar")


def q_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """roundrobinconnector (manifest :281): deterministic md5-mod spread."""
    from cardinalhq_otel_collector_spark.sources.connectors import round_robin_assign

    out = round_robin_assign(_read(spark, sf_dir, "events"), n_ways=5, key_col="event_id")
    return out.groupBy("rr_sink").agg(F.count(F.lit(1)).alias("n"))


# --- training-data pipeline ops over documents/embeddings -------------------


def q_doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.textstats import token_counts

    out = token_counts(_read(spark, sf_dir, "documents"))
    return out.select("doc_id", "n_ws_tokens", F.col("n_chars").alias("n_chars_calc"),
                      "n_tokens_est")


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.textstats import quality_score

    out = quality_score(_read(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_tokens", "distinct_ratio", "punct_ratio", "mean_word_len", "quality"
    )


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.textstats import lang_id

    out = lang_id(_read(spark, sf_dir, "documents"))
    return out.select("doc_id", "hits_en", "hits_de", "hits_es", "hits_fr", "lang_guess")


def q_doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.dedup import exact_dedup

    return exact_dedup(_read(spark, sf_dir, "documents"))


def q_doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.dedup import ngram_jaccard_pairs

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return ngram_jaccard_pairs(docs, threshold=0.02)


def q_doc_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.dedup import minhash_lsh_candidates

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return minhash_lsh_candidates(docs, n_hashes=2, band_size=1)


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.dedup import simhash

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash(docs, bits=16)


def q_doc_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.dedup import simhash_candidates

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return simhash_candidates(docs, bits=16, band_bits=4)


def q_doc_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag train docs sharing word n-grams
    with a held-out eval split (audit shape — every train row returned
    with its contamination evidence)."""
    from cardinalhq_otel_collector_spark.operators.decontaminate import decontaminate

    docs = _read(spark, sf_dir, "documents", spread=True)
    eval_df = docs.filter(F.col("doc_id") < 20)
    train = docs.filter(F.col("doc_id") >= 20)
    out = decontaminate(train, eval_df, n=5, min_hits=1, keep_contaminated=True)
    return out.select("doc_id", "n_hits", "n_eval_matches", "contaminated")


def q_doc_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary with min-count and document frequencies."""
    from cardinalhq_otel_collector_spark.operators.textstats import build_vocab

    return build_vocab(_read(spark, sf_dir, "documents"), min_count=3)


def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: duplicate
    word/bigram mass and most-frequent-token mass (one (doc, token)
    hash aggregate + doc-local bigram window)."""
    from cardinalhq_otel_collector_spark.operators.textstats import repetition_stats

    return repetition_stats(_read(spark, sf_dir, "documents"))


def q_doc_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id) —
    pure projection, identical assignment on any cluster size."""
    from cardinalhq_otel_collector_spark.operators.sampling import assign_split

    docs = _read(spark, sf_dir, "documents")
    return assign_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inactivity-gap sessionization of the event stream: 0-based
    per-user session index with an 8-hour gap (one shuffle on user_id;
    integer-microsecond gap math)."""
    from cardinalhq_otel_collector_spark.operators.sessionize import sessionize

    ev = _read(spark, sf_dir, "events")
    return sessionize(
        ev, "user_id", "ts", gap_seconds=28800, order_cols=["event_id"]
    ).select("event_id", "user_id", "session_idx")


def q_events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rollup (count, span, exact integer-µs duration) on
    top of the 8-hour-gap sessionization."""
    from cardinalhq_otel_collector_spark.operators.sessionize import session_stats

    return session_stats(
        _read(spark, sf_dir, "events"), "user_id", "ts",
        gap_seconds=28800, order_cols=["event_id"],
    )


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: distinct users per (first-active week,
    week offset) — exact integer analytics end to end."""
    from cardinalhq_otel_collector_spark.operators.retention import cohort_retention

    return cohort_retention(_read(spark, sf_dir, "events"))


def q_events_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed rate limiter: first 10 events per (event_type, day),
    deterministic (ts, event_id) order — the batch token bucket."""
    from cardinalhq_otel_collector_spark.operators.sampling import rate_limit

    return rate_limit(
        _read(spark, sf_dir, "events"), ["event_type"], "ts", "day",
        max_per_window=10, order_cols=["event_id"],
    ).select("event_id", "event_type")


def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-3 users per event_type by event count (unique ties)."""
    from cardinalhq_otel_collector_spark.operators.sampling import heavy_hitters

    return heavy_hitters(
        _read(spark, sf_dir, "events"), ["event_type"], "user_id", k=3
    )


def q_doc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-dedup text canonicalization: lowercase, URL/email strip,
    whitespace collapse, trim — pure narrow projection."""
    from cardinalhq_otel_collector_spark.operators.textstats import normalize_text

    return normalize_text(_read(spark, sf_dir, "documents")).select(
        "doc_id", "text_norm"
    )


def q_doc_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PMI collocations (min bigram count 5): all-integer counts
    into one fixed IEEE ln() tree; (pmi desc, w1, w2) unique ordering."""
    from cardinalhq_otel_collector_spark.operators.textstats import pmi_collocations

    return pmi_collocations(
        _read(spark, sf_dir, "documents", spread=True), k=20, min_count=5
    )


def q_doc_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end dedup DECISION over the MinHash-LSH candidate
    pairs: transitive closure of the pair graph → per-component min-id
    canonical; every doc gets (cluster_id, is_canonical). Oracle closes
    the same pairs with a recursive CTE — an independent fixpoint
    formulation of the same components."""
    from cardinalhq_otel_collector_spark.operators.dedup import (
        minhash_lsh_candidates,
        neardup_dedup,
    )

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pairs = minhash_lsh_candidates(docs, n_hashes=2, band_size=1)
    return neardup_dedup(docs, pairs).select(
        "doc_id", "cluster_id", "is_canonical"
    )


def q_doc_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (32-token chunks, 8-token overlap): the
    pre-tokenization splitter; zero-shuffle narrow plan."""
    from cardinalhq_otel_collector_spark.operators.textstats import chunk_documents

    return chunk_documents(
        _read(spark, sf_dir, "documents", spread=True), chunk_tokens=32, overlap=8
    )


def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score spike/drop detection on densified hourly event
    volume per event_type (the statistical stand-in for the reference's
    isolationforestprocessor): trailing-24-bucket baseline, never
    including the scored bucket; z NULL until 12 baseline buckets."""
    from cardinalhq_otel_collector_spark.operators.anomaly import (
        bucket_counts,
        rolling_zscore,
    )

    ev = _read(spark, sf_dir, "events")
    counts = bucket_counts(ev, ["event_type"], "ts", "hour", densify=True)
    return rolling_zscore(
        counts, "n", ["event_type"], "bucket_start",
        lookback=24, min_lookback=12, threshold=3.0,
    ).select("event_type", "bucket_start", "n", "zscore", "is_anomaly")


def q_events_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated p50/p95/p99 of event value per event_type."""
    from cardinalhq_otel_collector_spark.operators.aggregate import group_percentiles

    return group_percentiles(
        _read(spark, sf_dir, "events"), "value", ["event_type"]
    )


def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed time-range join: for every 'error' event, count the same
    user's events in the strictly-preceding 10 minutes. The operator
    blocks on (user_id, 600s-bucket) — a plain hash equi-join — instead
    of Catalyst's inequality-as-post-filter plan; the oracle states the
    naive range predicate directly."""
    from cardinalhq_otel_collector_spark.operators.rangejoin import range_join

    ev = _read(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    pairs = range_join(
        errors, ev, on="ts", by="user_id", lower=-600, upper=0,
        left_cols=["event_id", "ts"], right_cols=["event_id", "value"],
    )
    return pairs.groupBy("event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_preceding"),
        F.min("r_event_id").alias("first_event_id"),
    )


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view -> click -> purchase per user within 7 days of
    the first view (chained running-min windows over ONE shuffle; the
    oracle is the equivalent chain of argmin CTE joins)."""
    from cardinalhq_otel_collector_spark.operators.funnel import funnel

    return funnel(
        _read(spark, sf_dir, "events"),
        steps=["view", "click", "purchase"],
        by="user_id", step_col="event_type",
        within_seconds=7 * 86400,
    )


def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts + conditional probabilities
    over each user's (ts, event_id)-ordered event stream."""
    from cardinalhq_otel_collector_spark.operators.sessionize import transition_counts

    return transition_counts(
        _read(spark, sf_dir, "events"),
        entity_col="user_id", state_col="event_type",
        order_cols=["event_id"],
    )


def q_part_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spelling-variant pairs (Levenshtein distance 1) across the part-name
    vocabulary via SymSpell deletion-neighborhood blocking; the oracle is
    the naive all-pairs levenshtein join on the identical vocab."""
    from cardinalhq_otel_collector_spark.operators.dedup import edit_distance_pairs

    words = (
        _read(spark, sf_dir, "part")
        .select(F.explode(F.split(F.col("p_name"), " ")).alias("w"))
        .filter(F.col("w").rlike("^[a-z]{2,12}$"))
        .distinct()
    )
    return edit_distance_pairs(words, col="w").withColumn(
        "dist", F.levenshtein("a", "b").cast("int")
    )


def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-10-minute per-user event count + floor-value sum as of
    every event (RANGE-frame window over integer-microsecond epoch; the
    oracle is DuckDB's RANGE frame over the same ordering — ANSI peers
    semantics, so tied timestamps need no tiebreak)."""
    from cardinalhq_otel_collector_spark.operators.sliding import sliding_window_agg

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    out = sliding_window_agg(
        ev, by="user_id", window_seconds=600,
        aggs={
            "n_window": F.count(F.lit(1)),
            "sum_floor_value": F.sum(F.floor(F.col("value")).cast("long")),
        },
    )
    return out.select("event_id", "user_id", "n_window", "sum_floor_value")


def q_events_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts + exact cumulative distinct users via the
    first-event reduction (no cumulative-distinct state)."""
    from cardinalhq_otel_collector_spark.operators.retention import new_user_curve

    return new_user_curve(_read(spark, sf_dir, "events"))


def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × event-type crosstab with an EXPLICIT category list (one
    two-phase hash agg; no pivot-discovery pass, schema not
    data-dependent)."""
    from cardinalhq_otel_collector_spark.operators.grouping import pivot_counts

    ev = _read(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
    )
    return pivot_counts(
        ev, "day", "event_type",
        ["view", "click", "purchase", "signup", "error"],
    )


def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token-distribution Shannon entropy (nats, 6-place
    rounded; all ln arguments exact integers)."""
    from cardinalhq_otel_collector_spark.operators.textstats import token_entropy

    return token_entropy(_read(spark, sf_dir, "documents", spread=True))


def q_events_json_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON attribute extraction from the props column (explicit
    schema, vectorized from_json — no inference scan, no Python)."""
    from cardinalhq_otel_collector_spark.operators.parse import parse_json_attrs

    ev = _read(spark, sf_dir, "events", spread=True).select("event_id", "props")
    return parse_json_attrs(ev, "props", {"k": "int"}).select("event_id", "k")


def q_events_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival-gap summary in exact integer microseconds
    (mean = exact int-sum / int-count division)."""
    from cardinalhq_otel_collector_spark.operators.sessionize import (
        interarrival_stats,
    )

    return interarrival_stats(
        _read(spark, sf_dir, "events"),
        entity_col="user_id", order_cols=["event_id"],
    )


def q_doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted Bernoulli sample — keep probability
    min(1, 0.5·n_chars/2000), decided by the Knuth multiplicative hash
    of doc_id (exact integer arithmetic both engines)."""
    from cardinalhq_otel_collector_spark.operators.sampling import weighted_sample

    docs = _read(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(
        docs, key_col="doc_id", weight_col="n_chars",
        rate=0.5, weight_scale=2000.0,
    )


def q_events_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold alert rules (rules-as-data, broadcast NL join by
    design) over hourly per-type event counts."""
    from cardinalhq_otel_collector_spark.operators.alerts import (
        evaluate_threshold_rules,
    )

    ev = _read(spark, sf_dir, "events")
    aggs = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_start")
    ).agg(F.count(F.lit(1)).alias("n"))
    rules = spark.createDataFrame(
        [("r1", "error", ">", 3.0), ("r2", None, ">=", 8.0)],
        "rule_id string, key string, op string, threshold double",
    )
    return evaluate_threshold_rules(
        aggs, rules, key_col="event_type", value_col="n"
    )


def q_events_decimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-3 decimation per user in deterministic
    (ts, event_id) order, first event always kept."""
    from cardinalhq_otel_collector_spark.operators.sampling import decimate

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return decimate(ev, ["user_id"], n=3, order_cols=["event_id"]).select(
        "event_id", "user_id"
    )


def q_events_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step event-type journeys (lead-window path
    mining; unique (n desc, path asc) tie rule)."""
    from cardinalhq_otel_collector_spark.operators.sessionize import path_mining

    return path_mining(
        _read(spark, sf_dir, "events"),
        entity_col="user_id", state_col="event_type",
        order_cols=["event_id"], depth=3, k=10,
    )


def q_doc_remove_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style document-frequency boilerplate pruning at token
    granularity: tokens in more than 78% of all documents are removed
    (the corpus DF distribution is bimodal around that point),
    survivors re-assembled in original order."""
    from cardinalhq_otel_collector_spark.operators.textstats import (
        remove_high_df_tokens,
    )

    return remove_high_df_tokens(
        _read(spark, sf_dir, "documents", spread=True), max_df_ratio=0.78
    )


def q_transcripts_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript structural QA over a transcript-shaped stream derived
    deterministically from events (conv = user, dense turn order by
    (ts, event_id), µs-jittered unique ts), with defects INJECTED at a
    deterministic 1-in-17 rate (turn_idx bumped +1 → both a gap and a
    duplicate) and alternating roles from event-id parity (natural role
    repeats). Counts idx breaks / role repeats / ts regressions per
    conversation."""
    from cardinalhq_otel_collector_spark.operators.validate import (
        transcript_integrity,
    )

    from pyspark.sql import Window

    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = ev.select(
        F.col("user_id").alias("conv_id"),
        (
            F.row_number().over(w) - 1
            + F.when(F.pmod(F.col("event_id"), F.lit(17)) == 0, 1).otherwise(0)
        ).cast("int").alias("turn_idx"),
        F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, "user")
        .otherwise("assistant").alias("role"),
        F.timestamp_micros(
            F.unix_micros(F.col("ts").cast("timestamp")) + F.col("event_id")
        ).alias("ts"),
    )
    return transcript_integrity(transcripts, conv_col="conv_id")


def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-percentile winsorization of event values (clip to the
    per-type exact [p05, p95]; comparison-only clipping, no float
    arithmetic)."""
    from cardinalhq_otel_collector_spark.operators.aggregate import winsorize

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return winsorize(ev, "value", ["event_type"], 0.05, 0.95)


def q_events_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension enrichment: a two-version user dimension (basic →
    pro at 2024-01-15, open-ended current version) built inline with no
    collect, attached per event timestamp via the as-of reuse."""
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.enrich import scd2_enrich

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    users = ev.select("user_id").distinct()
    cut = dt.datetime(2024, 1, 15)
    old = dt.datetime(2020, 1, 1)
    dim = users.select(
        "user_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(old).alias("valid_from"),
                    F.lit(cut).alias("valid_to"),
                    F.lit("basic").alias("tier"),
                ),
                F.struct(
                    F.lit(cut).alias("valid_from"),
                    F.lit(None).cast("timestamp").alias("valid_to"),
                    F.lit("pro").alias("tier"),
                ),
            )
        ).alias("v"),
    ).select("user_id", "v.valid_from", "v.valid_to", "v.tier")
    out = scd2_enrich(ev, dim, key="user_id", payload=["tier"])
    return out.select("event_id", "user_id", "dim_tier", F.col("dim_ts").alias("dim_valid_from"))


def q_doc_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (deterministic term-asc ties)."""
    from cardinalhq_otel_collector_spark.operators.textstats import tfidf_topk

    return tfidf_topk(_read(spark, sf_dir, "documents"), k=3)


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk sequence packing over documents ordered by
    doc_id (bucket = doc_id // 64, monotone, so the two-phase prefix sum
    equals the oracle's single global cumsum)."""
    from cardinalhq_otel_collector_spark.operators.packing import pack_sequences

    docs = _read(spark, sf_dir, "documents").withColumn(
        "bkt", F.floor(F.col("doc_id") / 64)
    )
    return pack_sequences(docs, 512, "bkt")


def q_doc_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) quota cap on the documents corpus — the
    deterministic md5-rank stratified sample."""
    from cardinalhq_otel_collector_spark.operators.sampling import quota_sample

    docs = _read(spark, sf_dir, "documents")
    return quota_sample(docs, ["lang", "source"], quota=5, key_col="doc_id").select(
        "doc_id", "lang", "source"
    )


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: attach the most recent preceding 'view' event to each
    'click' per user (union+window — one shuffle, no range-join blowup).
    Oracle: DuckDB's native ASOF LEFT JOIN, independently implemented."""
    from cardinalhq_otel_collector_spark.operators.asof import asof_join

    ev = _read(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "ts", "value"]
    clicks = ev.filter(F.col("event_type") == "click").select(*cols)
    views = ev.filter(F.col("event_type") == "view").select(*cols)
    return asof_join(
        clicks, views, on="ts", by="user_id",
        right_payload=["event_id", "value"], right_order="event_id",
    )


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.similarity import brute_force_topk

    emb = _read(spark, sf_dir, "embeddings", spread=True)
    q = emb.filter(F.col("vec_id") < 5)
    return brute_force_topk(q, emb, k=3).select("qid", "vec_id", "cosine", "nn_rank")


def q_emb_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cardinalhq_otel_collector_spark.operators.similarity import sign_buckets

    out = sign_buckets(_read(spark, sf_dir, "embeddings"), bits=4)
    return out.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("min_vec_id")
    )


def q_emb_hyperplane_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane cosine LSH bucket assignment (the ANN scale path's
    candidate generator) — deterministic md5-derived hyperplanes."""
    from cardinalhq_otel_collector_spark.operators.similarity import hyperplane_buckets

    return hyperplane_buckets(_read(spark, sf_dir, "embeddings"), bits=4, n_bands=2)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded hyperplane-LSH candidates → exact decimal-summed rerank."""
    from cardinalhq_otel_collector_spark.operators.similarity import lsh_topk

    emb = _read(spark, sf_dir, "embeddings", spread=True)
    q = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(q, emb, k=3, bits=4, n_bands=2)


def q_emb_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: LSH bucket candidates → exact
    cosine ≥ threshold. Threshold 0.4 is corpus-calibrated (the synthetic
    embeddings are near-orthogonal random vectors — max pair cosine ≈0.48;
    a real near-dup corpus uses ≥0.9 with identical plumbing)."""
    from cardinalhq_otel_collector_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    return embedding_neardup_pairs(
        _read(spark, sf_dir, "embeddings"), threshold=0.4, bits=4, n_bands=2
    )


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic k-means coarse quantizer (md5-seeded init,
    fixed Lloyd rounds) → probe nearest buckets → exact rerank."""
    from cardinalhq_otel_collector_spark.operators.similarity import ivf_topk

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(q, emb, k=3, n_centroids=8, n_probe=2, n_iters=2)


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched multimodal decode plumbing (codec stubbed — the
    deterministic md5 feature stand-in IS the oracle contract here)."""
    from cardinalhq_otel_collector_spark.operators.multimodal import decode_features

    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("text").cast("binary").alias("payload"),
    )
    out = decode_features(media)
    return out.select(
        "media_id", "kind", "n_bytes",
        *[F.round(F.element_at("features", i + 1), 6).alias(f"f{i}") for i in range(8)],
    )


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic aggregation parity (engine-level, deliberately raw SQL —
    there is no bespoke operator to exercise here)."""
    _views(spark, sf_dir)
    return spark.sql(_TPCH_Q1_SQL)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL
# ---------------------------------------------------------------------------

_ROUTE_CASE_DUCK = """CASE WHEN (event_type = 'error') THEN 'errors'
                WHEN (k >= 80) THEN 'hot_keys'
                WHEN (value >= 150.0) THEN 'big_values'
                ELSE 'default' END"""

_PIPELINE_ROUTE_AGG_DUCK = f"""
WITH parsed AS (
  SELECT event_id, user_id, event_type, value, ts,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
), routed AS (
  SELECT *, {_ROUTE_CASE_DUCK} AS sink FROM parsed
)
SELECT sink, event_type, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM routed GROUP BY sink, event_type, bucket_start
"""

_ROUTE_FANOUT_DUCK = f"""
WITH parsed AS (
  SELECT *, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events
)
SELECT {_ROUTE_CASE_DUCK} AS sink, COUNT(*) AS n FROM parsed GROUP BY 1
"""

_INTERVAL_AGG_DUCK = """
SELECT event_type, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value), 6) AS avg_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type, bucket_start
"""

_CUM_TO_DELTA_DUCK = """
SELECT event_id, user_id, ts,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
"""

_DELTA_TO_CUM_DUCK = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative
FROM events
"""

_DELTA_TO_RATE_DUCK = """
SELECT event_id, user_id, ts,
       ROUND((value - LAG(value) OVER w)
             / ((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0), 6) + 0.0 AS rate
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

_START_TIME_DUCK = """
SELECT user_id, MIN(ts) AS start_ts, COUNT(*) AS n FROM events GROUP BY user_id
"""

_INTERVAL_LAST_DUCK = """
SELECT user_id, bucket_start, value AS last_value FROM (
  SELECT user_id, date_trunc('hour', ts) AS bucket_start, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t WHERE rn = 1
"""

_LOG_DEDUP_DUCK = """
SELECT date_trunc('minute', ts) AS bucket_start, event_type,
       json_extract_string(props, '$.k') AS k, COUNT(*) AS dup_count
FROM events GROUP BY 1, 2, 3
"""

_PROB_SAMPLE_DUCK = """
SELECT event_id, event_type FROM events
WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < '4000'
"""

_TAIL_SAMPLE_DUCK = """
SELECT e.event_id, e.user_id, e.event_type FROM events e
WHERE EXISTS (SELECT 1 FROM events x
              WHERE x.user_id = e.user_id AND x.event_type = 'error')
"""

_GROUP_BY_CONV_DUCK = """
SELECT user_id, COUNT(*) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
FROM events GROUP BY user_id
"""

_SUMMARY_SPLIT_DUCK = """
WITH s AS (
  SELECT l_returnflag AS flag, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qsum,
         CAST(MIN(l_quantity) AS DOUBLE) AS qmin, CAST(MAX(l_quantity) AS DOUBLE) AS qmax
  FROM lineitem GROUP BY l_returnflag
)
SELECT concat('lineitem.qty.', flag, '.count') AS metric, CAST(cnt AS DOUBLE) AS value FROM s
UNION ALL SELECT concat('lineitem.qty.', flag, '.sum') AS metric, qsum AS value FROM s
UNION ALL SELECT concat('lineitem.qty.', flag, '.min') AS metric, qmin AS value FROM s
UNION ALL SELECT concat('lineitem.qty.', flag, '.max') AS metric, qmax AS value FROM s
"""

_ENRICH_DUCK = """
SELECT COALESCE(c.c_mktsegment, 'unknown') AS segment, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""

_TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l_discount AS DECIMAL(18,6)))) AS DOUBLE) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""

_JOIN_CHAIN_DUCK = """
SELECT r.r_name AS region_name, n.n_name AS nation_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""


# ---------------------------------------------------------------------------
# Frozen oracle literals.
#
# These mirror the library's mask/PII/routing constants but are INLINED as
# literals so the DuckDB oracles import no code from the engine under test
# (a semantic bug inside a shared constant would otherwise pass both
# sides). tests/test_oracle_drift.py asserts literal == library constant,
# so the library cannot change without a deliberate two-sided edit — the
# same freeze-plus-drift-test pattern tests/test_fixtures.py uses for
# fixture bytes.
# ---------------------------------------------------------------------------
_MASKS_ORACLE: list[tuple[str, str]] = [
    (
        "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<id>",
    ),
    ("\\b[0-9a-fA-F]{8,}\\b", "<hex>"),
    ("\\d+", "<num>"),
]

_PII_PATTERNS_ORACLE: list[tuple[str, str, str]] = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    (
        "uuid",
        "[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
        "<UUID>",
    ),
    ("phone", "\\+?1[-. ]\\(?\\d{3}\\)?[-. ]\\d{3,4}(?:[-. ]\\d{4})?", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
]

# First-match-wins CASE over the routing rule table (rule_id order), frozen
# as the SQL text itself rather than generated by operators.route.
_ROUTING_CASE_ORACLE = (
    "CASE WHEN (parsed_level = 'ERROR') THEN 'errors'"
    " WHEN (role = 'tool' AND tool_category = 'search') THEN 'search_tools'"
    " WHEN (has_pii) THEN 'pii_archive' ELSE 'default' END"
)


def _template_mining_duck() -> str:
    """Mirror the library's mask chain (same regexes, same order — frozen
    literals above, drift-tested against operators.fingerprint._MASKS)."""
    expr = "line"
    for pat, mask in _MASKS_ORACLE:
        # DuckDB standard string literals don't process backslashes — the
        # regex goes in verbatim, only quotes need escaping
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{mask}', 'g')"
    return f"""
WITH lines AS (
  SELECT concat('user ', CAST(user_id AS VARCHAR), ' did ', event_type,
                ' k=', json_extract_string(props, '$.k')) AS line
  FROM events
)
SELECT {expr} AS template, COUNT(*) AS n FROM lines GROUP BY 1
"""


_SUMO_DUCK = """
SELECT event_id,
       '{"date": "' || strftime(ts, '%Y-%m-%d %H:%M:%S')
       -- Go time's '.999999999': fractional seconds only when nonzero,
       -- trailing zeros trimmed (extract(microsecond) includes whole
       -- seconds in DuckDB, hence the % 1000000)
       || CASE WHEN extract(microsecond FROM ts) % 1000000 > 0
               THEN '.' || rtrim(lpad(CAST(extract(microsecond FROM ts) % 1000000 AS VARCHAR), 6, '0'), '0')
               ELSE '' END
       || ' +0000 UTC","sourceName":"events","sourceHost":"host-'
       || CAST(user_id AS VARCHAR) || '","sourceCategory":"' || event_type
       || '","fields":{"account":"dev","region":"us-east-1"},"message":'
       || to_json(struct_pack(log := props, "user" := 'u' || CAST(user_id AS VARCHAR)))
       || '}' AS line
FROM events
"""

_PARTITION_KEY_DUCK = """
SELECT event_id,
       concat('bucket/prefix/year=', strftime(ts, '%Y'),
              '/month=', strftime(ts, '%m'),
              '/day=', strftime(ts, '%d'),
              '/hour=', strftime(ts, '%H'),
              '/events_', event_type, '.parquet') AS object_key
FROM events
"""

_UNROLL_DUCK = """
SELECT lang, COUNT(*) AS n_tokens
FROM documents, unnest(string_split(text, ' ')) AS t(w)
GROUP BY lang
"""

_OTLP_ROUNDTRIP_DUCK = """
SELECT event_id, props AS body, ts AS ts2, event_type FROM events
"""


# Frozen oracle literals for genai_normalize / doc_lang_id (public OTel
# GenAI semconv values + the library's marker words) — same de-sharing
# rationale as _MASKS_ORACLE above; drift-tested in tests/test_oracle_drift.py.
_ROLE_SYNONYMS_ORACLE: dict[str, str] = {
    "user": "user", "human": "user", "end_user": "user",
    "assistant": "assistant", "ai": "assistant", "bot": "assistant",
    "model": "assistant", "agent": "assistant",
    "system": "system", "developer": "system", "instruction": "system",
    "tool": "tool", "function": "tool", "tool_call": "tool",
    "tool_result": "tool",
}

_SYSTEM_PREFIXES_ORACLE: list[tuple[str, str]] = [
    ("gpt", "openai"), ("o1", "openai"), ("o3", "openai"),
    ("claude", "anthropic"), ("gemini", "gcp.gemini"), ("palm", "gcp.gemini"),
    ("llama", "meta"), ("mistral", "mistral_ai"), ("mixtral", "mistral_ai"),
]

_LANG_MARKERS_ORACLE: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}


def _genai_duck() -> str:
    role_whens = " ".join(
        f"WHEN lower(trim(role_raw)) = '{syn}' THEN '{canon}'"
        for syn, canon in _ROLE_SYNONYMS_ORACLE.items()
    )
    sys_whens = " ".join(
        f"WHEN starts_with(m, '{p}') THEN '{s}'" for p, s in _SYSTEM_PREFIXES_ORACLE
    )
    return f"""
WITH turns AS (
  SELECT event_id,
         CASE event_id % 6 WHEN 0 THEN 'Human' WHEN 1 THEN 'AI' WHEN 2 THEN 'bot'
              WHEN 3 THEN 'SYSTEM' WHEN 4 THEN 'function' ELSE 'user' END AS role_raw,
         CASE user_id % 4 WHEN 0 THEN 'gpt-4-turbo-2024-04-09'
              WHEN 1 THEN 'claude-3-opus-20240229'
              WHEN 2 THEN 'gemini-1.5-pro-latest' ELSE 'llama-3-70b' END AS model
  FROM events
), lowered AS (
  SELECT event_id, role_raw, lower(trim(model)) AS m FROM turns
)
SELECT event_id,
       CASE {role_whens} ELSE lower(trim(role_raw)) END AS role,
       role_raw,
       CASE {sys_whens} ELSE 'unknown' END AS gen_ai_system,
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(m, '-\\d{{8}}$', ''),
             '-\\d{{4}}(-\\d{{2}})?(-\\d{{2}})?$', ''),
           '[.@]\\d+$', ''),
         '-(latest|preview|turbo|instant|mini|nano)$', '') AS gen_ai_request_model
FROM lowered
"""


_HISTOGRAM_DUCK = """
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
         (CASE WHEN value > 50.0 THEN 1 ELSE 0 END
          + CASE WHEN value > 100.0 THEN 1 ELSE 0 END
          + CASE WHEN value > 200.0 THEN 1 ELSE 0 END
          + CASE WHEN value > 400.0 THEN 1 ELSE 0 END) AS bucket_idx
  FROM events
)
SELECT event_type, bucket_start, bucket_idx,
       CASE bucket_idx WHEN 0 THEN '50' WHEN 1 THEN '100' WHEN 2 THEN '200'
            WHEN 3 THEN '400' ELSE '+Inf' END AS le,
       COUNT(*) AS bucket_count
FROM b GROUP BY 1, 2, 3
"""

_RED_DUCK = """
SELECT event_type, COUNT(*) AS calls,
       -- DuckDB SUM over integers yields HUGEINT (fetched as float64); cast
       -- integer SUMs to BIGINT in every oracle so the hash compare matches
       -- Spark's BIGINT. (round-2 VERDICT adjudication: values bit-identical.)
       CAST(SUM(CASE WHEN value >= 195.0 THEN 1 ELSE 0 END) AS BIGINT) AS errors,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS duration_sum,
       MIN(value) AS duration_min, MAX(value) AS duration_max,
       date_trunc('hour', ts) AS bucket_start
FROM events GROUP BY event_type, bucket_start
"""

_AGG_OVERRIDE_DUCK = """
WITH typed AS (
  SELECT *, CASE event_type WHEN 'click' THEN 'sum' WHEN 'view' THEN 'avg'
            WHEN 'error' THEN 'max' WHEN 'signup' THEN 'min' ELSE 'avg' END AS agg_type
  FROM events
), g AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start,
         MAX(agg_type) AS agg_type, COUNT(value) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s,
         MIN(value) AS mn, MAX(value) AS mx
  FROM typed GROUP BY 1, 2
)
SELECT event_type, bucket_start, agg_type, n,
       CASE agg_type WHEN 'sum' THEN s WHEN 'min' THEN mn WHEN 'max' THEN mx
            ELSE s / n END AS value,
       'true' AS aggregated
FROM g
"""

_EXCEPTIONS_DUCK = """
SELECT user_id, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS n_exceptions, MIN(props) AS exemplar
FROM events WHERE event_type = 'error' GROUP BY 1, 2
"""

_ROUND_ROBIN_DUCK = """
SELECT CAST(CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8) AS BIGINT) % 5 AS INTEGER) AS rr_sink,
       COUNT(*) AS n
FROM events GROUP BY 1
"""

_TOKEN_COUNT_DUCK = """
SELECT doc_id, len(string_split(text, ' ')) AS n_ws_tokens,
       length(text) AS n_chars_calc,
       greatest(len(string_split(text, ' ')),
                CAST(ceil(length(text) / 4.0) AS BIGINT)) AS n_tokens_est
FROM documents
"""

_QUALITY_DUCK = """
WITH c AS (
  SELECT doc_id, text, len(string_split(text, ' ')) AS n,
         len(list_distinct(string_split(text, ' '))) AS nd
  FROM documents
), p AS (
  SELECT doc_id, n,
         CAST(nd AS DOUBLE) / n AS draw,
         CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE)
           / length(text) AS praw,
         CAST(length(text) - n + 1 AS DOUBLE) / n AS mraw
  FROM c
)
SELECT doc_id, n AS n_tokens, ROUND(draw, 4) AS distinct_ratio,
       ROUND(praw, 4) AS punct_ratio, ROUND(mraw, 4) AS mean_word_len,
       ROUND(CASE WHEN n < 5 THEN 0.0
                  ELSE least(1.0, n / 64.0) * draw * (1 - least(1.0, praw * 4)) END,
             4) AS quality
FROM p
"""


def _lang_duck() -> str:
    hit_cols = ", ".join(
        "("
        + " + ".join(
            rf"len(regexp_extract_all(text, '\b{w}\b'))" for w in words
        )
        + f") AS hits_{lang}"
        for lang, words in _LANG_MARKERS_ORACLE.items()
    )
    langs = list(_LANG_MARKERS_ORACLE)
    m = "greatest(" + ", ".join(f"hits_{la}" for la in langs) + ")"
    guess = " ".join(f"WHEN hits_{la} = {m} THEN '{la}'" for la in langs[:-1])
    return f"""
WITH h AS (SELECT doc_id, {hit_cols} FROM documents)
SELECT doc_id, hits_en, hits_de, hits_es, hits_fr,
       CASE {guess} ELSE '{langs[-1]}' END AS lang_guess
FROM h
"""


# Lang-ID confusion oracle: composes the independent lang-ID oracle
# (the marker-hit CASE) with the ground-truth lang column — the
# evaluation is itself oracle-checked end to end (ann_recall pattern).
_LANG_CONFUSION_DUCK = f"""
WITH pred AS (SELECT doc_id, lang_guess FROM ({_lang_duck()}) t)
SELECT d.lang AS truth, p.lang_guess AS pred, COUNT(*) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2
"""

# Theil-Sen oracle: identical strict-(t, id)-ordered pair join,
# identical per-pair slope tree ((dv/dt_us)*3.6e9), exact interpolated
# median round-6.
_THEIL_SEN_DUCK = """
WITH b AS (SELECT user_id, epoch_us(ts) AS t, value AS v, event_id AS id
           FROM events),
p AS (SELECT a.user_id,
        (b.v - a.v) / CAST(b.t - a.t AS DOUBLE) * 3600000000.0 AS s
      FROM b a JOIN b b
        ON a.user_id = b.user_id
       AND (a.t < b.t OR (a.t = b.t AND a.id < b.id))
       AND b.t <> a.t)
SELECT user_id, COUNT(*) AS n_pairs,
       ROUND(quantile_cont(s, 0.5), 6) AS slope_per_hour
FROM p GROUP BY 1
"""

# Identity-stitch oracle: identical md5 device derivation (+1e7
# namespace offset), recursive reachability fixpoint labeled by min
# node (the doc_neardup_dedup closure pattern on a second domain).
_IDENTITY_STITCH_DUCK = """
WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
e AS (SELECT user_id AS a,
        CAST(('0x' || substr(md5('d1|' || CAST(user_id AS VARCHAR)), 1, 13))
             AS BIGINT) % 200 + 10000000 AS b
      FROM u
      UNION
      SELECT user_id,
        CAST(('0x' || substr(md5('d2|' || CAST(user_id AS VARCHAR)), 1, 13))
             AS BIGINT) % 200 + 10000000
      FROM u),
nodes AS (SELECT a AS n FROM e UNION SELECT b FROM e),
und AS (SELECT a AS s, b AS t FROM e UNION SELECT b, a FROM e),
reach(s, t) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.s, u2.t FROM reach r JOIN und u2 ON r.t = u2.s)
SELECT s AS node_id, MIN(t) AS identity_id
FROM reach GROUP BY s
"""

# Pearson oracle: identical DECIMAL(38,4) moment sums cast back to
# double, identical fixed r tree (sqrt is IEEE-correctly-rounded, so
# it is as portable as the four arithmetic ops), round-6.
_PEARSON_DUCK = """
WITH m AS (SELECT user_id, COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(CAST(epoch_us(ts) AS DOUBLE) AS DECIMAL(38,4))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(value * CAST(epoch_us(ts) AS DOUBLE) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(value * value AS DECIMAL(38,4))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(CAST(epoch_us(ts) AS DOUBLE) * CAST(epoch_us(ts) AS DOUBLE)
              AS DECIMAL(38,4))) AS DOUBLE) AS syy
  FROM events GROUP BY 1)
SELECT user_id, n,
  ROUND(CASE WHEN sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                       * (CAST(n AS DOUBLE) * syy - sy * sy)) = 0 THEN NULL
        ELSE (CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)) END, 6) AS r
FROM m
"""

# Min-max oracle: identical per-group bounds, identical two-op scaling
# (NULL for constant groups).
_MINMAX_DUCK = """
WITH b AS (SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
           FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
  CASE WHEN b.hi = b.lo THEN NULL
       ELSE (e.value - b.lo) / (b.hi - b.lo) END AS value_scaled
FROM events e JOIN b USING (event_type)
"""

# Hill oracle: identical top-k value cut (ties share values, so the
# kept multiset — and therefore every ln term — is order-independent),
# identical DECIMAL(28,12)-cast terms, round-6 alpha.
_HILL_DUCK = """
WITH r AS (SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC) AS rk
           FROM events WHERE value > 0),
xk AS (SELECT event_type, value AS x_k FROM r WHERE rk = 50)
SELECT r.event_type,
  ROUND(49.0 / CAST(SUM(CAST(ln(r.value / xk.x_k) AS DECIMAL(28,12)))
               AS DOUBLE), 6) AS alpha
FROM r JOIN xk USING (event_type)
WHERE r.rk < 50
GROUP BY 1
"""

# Z-test oracle: identical integer trial/success counts, identical
# pooled-rate tree, round-6.
_ZTEST_DUCK = """
WITH a AS (SELECT user_id % 2 AS variant, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
           FROM events GROUP BY 1)
SELECT x.variant AS variant_a, y.variant AS variant_b,
  x.n AS n_a, x.c AS c_a, y.n AS n_b, y.c AS c_b,
  ROUND((CAST(x.c AS DOUBLE) / CAST(x.n AS DOUBLE)
         - CAST(y.c AS DOUBLE) / CAST(y.n AS DOUBLE))
        / sqrt(((CAST(x.c AS DOUBLE) + CAST(y.c AS DOUBLE))
                / (CAST(x.n AS DOUBLE) + CAST(y.n AS DOUBLE)))
               * (1.0 - (CAST(x.c AS DOUBLE) + CAST(y.c AS DOUBLE))
                        / (CAST(x.n AS DOUBLE) + CAST(y.n AS DOUBLE)))
               * (1.0 / CAST(x.n AS DOUBLE) + 1.0 / CAST(y.n AS DOUBLE))), 6)
    AS z
FROM a x JOIN a y ON x.variant < y.variant
"""

# Mutual-information oracle: identical integer cells/marginals/total,
# identical per-cell (c/n)*ln(c*n/(cx*cy)) tree cast DECIMAL(28,12)
# before the sum, round-6.
_MI_DUCK = """
WITH p AS (SELECT event_type AS x, user_id % 2 AS y FROM events
           WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
cells AS (SELECT x, y, COUNT(*) AS c FROM p GROUP BY 1, 2),
mx AS (SELECT x, COUNT(*) AS cx FROM p GROUP BY 1),
my AS (SELECT y, COUNT(*) AS cy FROM p GROUP BY 1),
t AS (SELECT COUNT(*) AS n FROM p)
SELECT MAX(t.n) AS n, COUNT(*) AS n_cells,
  ROUND(CAST(SUM(CAST((CAST(c.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                      * ln(CAST(c.c AS DOUBLE) * CAST(t.n AS DOUBLE)
                           / (CAST(mx.cx AS DOUBLE) * CAST(my.cy AS DOUBLE)))
                 AS DECIMAL(28,12))) AS DOUBLE), 6) AS mi_nats
FROM cells c JOIN mx USING (x) JOIN my USING (y), t
"""

# Wilson oracle: identical integer counts, identical score-interval
# tree with the same 1.96 literal (z² written as 1.96*1.96 so the
# product is the identical double), round-6.
_WILSON_DUCK = """
WITH a AS (SELECT user_id % 2 AS variant, COUNT(*) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c
           FROM events GROUP BY 1)
SELECT variant, n, c,
  ROUND(CAST(c AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
  ROUND(((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
          + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
         - 1.96 * sqrt(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + (1.96 * 1.96)
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_lo,
  ROUND(((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
          + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE)))
         + 1.96 * sqrt(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                       / CAST(n AS DOUBLE)
                       + (1.96 * 1.96)
                         / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)), 6) AS wilson_hi
FROM a
"""

# Gini oracle: identical ascending (count, key) rank over the per-key
# counts, identical integer Σ(2i−n−1)x numerator, integer-ppm render.
_GINI_DUCK = """
WITH c AS (SELECT event_type, user_id, COUNT(*) AS x
           FROM events GROUP BY 1, 2),
r AS (SELECT event_type, x,
        row_number() OVER (PARTITION BY event_type
                           ORDER BY x ASC, user_id ASC) AS i
      FROM c),
a AS (SELECT event_type, COUNT(*) AS n_keys,
        CAST(SUM(x) AS BIGINT) AS total_rows,
        CAST(SUM((2 * i - 1) * x) AS BIGINT) AS np
      FROM r GROUP BY 1)
SELECT event_type, n_keys, total_rows,
  CAST((np - n_keys * total_rows) * 1000000
       // (n_keys * total_rows) AS BIGINT) AS gini_ppm
FROM a
"""

# State-dwell oracle: identical lead gaps over (ts, event_id), grouped
# by (entity, state) — exact integer µs.
_STATE_DWELL_DUCK = """
WITH s AS (SELECT user_id, event_type AS state,
             lead(epoch_us(ts)) OVER w - epoch_us(ts) AS gap
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, state, COUNT(*) AS n_spans,
       CAST(SUM(gap) AS BIGINT) AS dwell_us
FROM s WHERE gap IS NOT NULL GROUP BY 1, 2
"""

# c-TF-IDF oracle: identical integer tf/df/N into the identical
# tf * ln(1 + N/df) tree, identical unique (score DESC, token) top-5.
_CTFIDF_DUCK = """
WITH toks AS (SELECT source AS cluster, token
              FROM documents d, unnest(str_split(d.text, ' ')) AS s(token)
              WHERE token <> ''),
tf AS (SELECT cluster, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfc AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT cluster) AS N FROM tf),
sc AS (SELECT tf.cluster, tf.token, tf.tf,
         CAST(tf.tf AS DOUBLE)
           * ln(1.0 + CAST(n.N AS DOUBLE) / CAST(dfc.df AS DOUBLE)) AS s
       FROM tf JOIN dfc USING (token), n),
r AS (SELECT *, row_number() OVER (PARTITION BY cluster
                                   ORDER BY s DESC, token ASC) AS rk
      FROM sc)
SELECT cluster, token, tf, ROUND(s, 6) AS ctfidf
FROM r WHERE rk <= 5
"""

# Error-context oracle: frame-ordered windowed list over the identical
# (ts, event_id) order; empty frames coalesce to '' exactly like
# Spark's collect_list-over-empty-frame -> array_join.
_ERROR_CONTEXT_DUCK = """
WITH c AS (SELECT event_id, user_id, event_type,
             COALESCE(array_to_string(
               list(event_type) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING), ','), '')
               AS context
           FROM events)
SELECT event_id, user_id, context FROM c WHERE event_type = 'error'
"""

_EXACT_DEDUP_DUCK = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""

_JACCARD_DUCK = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 12) AS s
       FROM d, unnest(range(1, greatest(length(text) - 11, 1) + 1)) t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.02
"""

_MINHASH_DUCK = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 12) AS s
       FROM d, unnest(range(1, greatest(length(text) - 11, 1) + 1)) t(i)),
sig AS (SELECT doc_id,
               MIN(md5(concat('0|', s))) AS h0, MIN(md5(concat('1|', s))) AS h1
        FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, concat('b0#', h0) AS band FROM sig
          UNION ALL SELECT doc_id, concat('b1#', h1) AS band FROM sig)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
"""


def _simhash_core_duck(bits: int = 16) -> str:
    votes = ", ".join(
        f"SUM((CAST('0x' || substr(h, {b + 1}, 1) AS INT) % 2) * 2 - 1) AS v{b}"
        for b in range(bits)
    )
    bitstr = " || ".join(
        f"(CASE WHEN v{b} > 0 THEN '1' ELSE '0' END)" for b in range(bits)
    )
    return f"""
tok AS (SELECT doc_id, md5(w) AS h
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
              FROM documents WHERE doc_id < 200)),
v AS (SELECT doc_id, {votes} FROM tok GROUP BY doc_id),
sig AS (SELECT doc_id, {bitstr} AS simhash FROM v)
"""


_SIMHASH_DUCK = f"WITH {_simhash_core_duck()} SELECT doc_id, simhash FROM sig"

_SIMHASH_CAND_DUCK = f"""
WITH {_simhash_core_duck()},
bands AS (
  SELECT doc_id, concat('b', CAST(b.b AS VARCHAR), '#',
                        substr(simhash, CAST(b.b AS INT) * 4 + 1, 4)) AS band
  FROM sig, (SELECT unnest(range(0, 4)) AS b) b
)
SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
FROM bands a JOIN bands b2 ON a.band = b2.band AND a.doc_id < b2.doc_id
"""

# Decontamination oracle: word 5-grams by single-space split, eval =
# doc_id<20, train = doc_id>=20. Authored from the rule, not the
# operator: DuckDB list slicing toks[i:i+4] is 1-based inclusive (5
# tokens), mirroring the spec's "sliding window of 5 tokens"; short docs
# contribute their whole token list once (greatest(len-4,1)).
_DECONTAMINATE_DUCK = """
WITH d AS (SELECT doc_id, str_split(text, ' ') AS toks
           FROM documents),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(toks[CAST(i AS INT):CAST(i AS INT)+4], ' ') AS ng
       FROM d, unnest(range(1, greatest(len(toks)-4, 1)+1)) t(i)),
hits AS (SELECT tr.doc_id, ev.doc_id AS eval_id, COUNT(*) AS n
         FROM sh tr JOIN sh ev ON tr.ng = ev.ng
         WHERE tr.doc_id >= 20 AND ev.doc_id < 20
         GROUP BY 1, 2),
per_doc AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_hits,
                   COUNT(*) AS n_eval_matches
            FROM hits GROUP BY 1)
SELECT t.doc_id,
       COALESCE(p.n_hits, 0) AS n_hits,
       COALESCE(p.n_eval_matches, 0) AS n_eval_matches,
       COALESCE(p.n_hits, 0) >= 1 AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id >= 20) t
LEFT JOIN per_doc p ON p.doc_id = t.doc_id
"""

# As-of oracle: DuckDB's native ASOF LEFT JOIN (greatest right ts <=
# left ts per key) — a genuinely independent implementation of the same
# semantics; testdata has no (user_id, ts) ties on the view side (the
# operator's tie-break is pinned separately in tests/test_asof.py).
_ASOF_DUCK = """
WITH clicks AS (SELECT event_id, user_id, ts, value FROM events
                WHERE event_type = 'click'),
views  AS (SELECT event_id, user_id, ts, value FROM events
           WHERE event_type = 'view')
SELECT c.event_id, c.user_id, c.ts, c.value,
       v.ts AS asof_ts, v.event_id AS asof_event_id, v.value AS asof_value
FROM clicks c ASOF LEFT JOIN views v
  ON c.user_id = v.user_id AND v.ts <= c.ts
"""

# Quota-sample oracle: md5-of-id rank within (lang, source) — md5 of the
# decimal id string is engine-portable (same bytes in DuckDB and Spark),
# so both sides rank identically with no shared code.
_QUOTA_SAMPLE_DUCK = """
SELECT doc_id, lang, source FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
  FROM documents) WHERE rk <= 5
"""

# Vocab oracle: unnest the single-space token split, count totals and
# distinct containing docs, min-count filter.
# Sessionize oracle: lag + running-sum windows in DuckDB over the same
# deterministic (ts, event_id) order; gap compared in integer
# microseconds (epoch_us) exactly like the operator's unix_micros.
# Session-stats oracle: the sessionize lag+running-sum CTEs composed
# with a per-(user, session) rollup; duration as exact epoch_us ints.
_SESSION_STATS_DUCK = """
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
         epoch_us(ts) AS cur_us
  FROM events),
f AS (SELECT event_id, user_id, ts,
        CASE WHEN prev_us IS NULL OR cur_us - prev_us > 28800000000 THEN 1 ELSE 0 END AS ns
      FROM o),
s AS (SELECT user_id, ts,
        CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS session_idx
      FROM f)
SELECT user_id, session_idx, COUNT(*) AS n_events,
  MIN(ts) AS session_start, MAX(ts) AS session_end,
  MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS duration_us
FROM s GROUP BY 1, 2
"""

# Retention oracle: ISO-Monday week buckets (date_trunc('week') in both
# engines), integer day-difference floor-division offsets, distinct-user
# counts — all exact integers.
_RETENTION_DUCK = """
WITH a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events),
c AS (SELECT user_id, MIN(w) AS cohort_week FROM a GROUP BY 1)
SELECT cohort_week,
  CAST((a.w::DATE - c.cohort_week::DATE) // 7 AS INT) AS week_offset,
  COUNT(DISTINCT a.user_id) AS n_users
FROM a JOIN c USING (user_id)
GROUP BY 1, 2
"""

# Rate-limit oracle: identical row_number frame and deterministic
# (ts, event_id) order; keeps the first 10 per (event_type, day).
_RATE_LIMIT_DUCK = """
SELECT event_id, event_type FROM (
  SELECT event_id, event_type,
    row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
                       ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn <= 10
"""

# Heavy-hitters oracle: count + rank with the identical unique tie rule
# (count desc, value asc).
_HEAVY_HITTERS_DUCK = """
SELECT event_type, user_id, CAST(n AS BIGINT) AS n, CAST(rn AS INT) AS rank
FROM (
  SELECT event_type, user_id, COUNT(*) AS n,
    row_number() OVER (PARTITION BY event_type
                       ORDER BY COUNT(*) DESC, user_id ASC) AS rn
  FROM events GROUP BY 1, 2) WHERE rn <= 3
"""

# Range-join oracle: the NAIVE inequality join the bucketed operator
# must equal — integer-microsecond bounds (epoch_us) exactly like the
# operator's unix_micros arithmetic; [ts-600s, ts) half-open.
_RANGE_JOIN_DUCK = """
SELECT l.event_id, l.user_id, COUNT(*) AS n_preceding,
       MIN(r.event_id) AS first_event_id
FROM events l JOIN events r
  ON l.user_id = r.user_id
 AND epoch_us(r.ts) >= epoch_us(l.ts) - 600000000
 AND epoch_us(r.ts) <  epoch_us(l.ts)
WHERE l.event_type = 'error'
GROUP BY 1, 2
"""

# Funnel oracle: the chain of argmin CTEs — earliest view, earliest
# click strictly after it, earliest purchase strictly after that, every
# later step within 7 days of the first view (deadline in exact integer
# microseconds, matching the operator's unix_micros comparison).
_FUNNEL_DUCK = """
WITH s1 AS (SELECT user_id, MIN(ts) AS step1_ts FROM events
            WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS step2_ts
       FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s1.step1_ts
         AND epoch_us(e.ts) <= epoch_us(s1.step1_ts) + 604800000000
       GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS step3_ts
       FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s2.step2_ts
         AND epoch_us(e.ts) <= epoch_us(s1.step1_ts) + 604800000000
       GROUP BY 1)
SELECT s1.user_id, s1.step1_ts, s2.step2_ts, s3.step3_ts,
       CAST(1 + (s2.step2_ts IS NOT NULL)::INT
              + (s3.step3_ts IS NOT NULL)::INT AS INT) AS steps_completed
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""

# Transitions oracle: lag over the identical (ts, event_id) per-user
# order; probability is the exact int/int double division, so the
# doubles are bit-identical across engines.
_TRANSITIONS_DUCK = """
WITH p AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS from_state,
         event_type AS to_state
  FROM events)
SELECT from_state, to_state, COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE)
         / CAST(SUM(COUNT(*)) OVER (PARTITION BY from_state) AS DOUBLE)
         AS prob
FROM p WHERE from_state IS NOT NULL GROUP BY 1, 2
"""

# Edit-distance oracle: naive all-pairs levenshtein on the identical
# part-name vocabulary — the exact small-N check behind the operator's
# deletion-neighborhood blocking (same pattern as doc_ngram_jaccard
# behind the MinHash LSH).
_EDIT_DISTANCE_DUCK = """
WITH w AS (SELECT DISTINCT token AS w
           FROM part p, unnest(str_split(p.p_name, ' ')) AS t(token)
           WHERE regexp_full_match(token, '[a-z]{2,12}'))
SELECT a.w AS a, b.w AS b, CAST(levenshtein(a.w, b.w) AS INT) AS dist
FROM w a JOIN w b ON a.w < b.w AND levenshtein(a.w, b.w) <= 1
"""

# Sliding-window oracle: DuckDB RANGE frame over the identical
# epoch_us ordering — both engines implement ANSI RANGE peers, so tied
# timestamps agree without a tiebreak; floor(value) kept exact by
# casting to BIGINT before the sum.
_SLIDING_WINDOW_DUCK = """
SELECT event_id, user_id,
  COUNT(*) OVER w AS n_window,
  CAST(SUM(CAST(floor(value) AS BIGINT)) OVER w AS BIGINT) AS sum_floor_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
"""

# New-user curve oracle: first-event reduction + prefix sum over the
# day-bucket frame — exact integers end to end.
_NEW_USERS_DUCK = """
WITH f AS (SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1),
b AS (SELECT CAST(date_trunc('day', first_ts) AS TIMESTAMP) AS bucket,
             COUNT(*) AS n_new
      FROM f GROUP BY 1)
SELECT bucket, n_new,
  CAST(SUM(n_new) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
       AS BIGINT) AS cum_users
FROM b
"""

# Pivot oracle: explicit FILTER columns — the same fixed category list
# as the Spark side, counts 0-filled by COUNT semantics.
_PIVOT_DUCK = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
  COUNT(*) FILTER (WHERE event_type = 'view') AS view,
  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
  COUNT(*) FILTER (WHERE event_type = 'error') AS error
FROM events GROUP BY 1
"""

# Entropy oracle: identical algebraic form — integer counts into ln,
# one 6-place rounding of the final double (pmi_collocations
# discipline).
_ENTROPY_DUCK = """
WITH c AS (SELECT doc_id, token AS w, COUNT(*) AS c
           FROM documents d, unnest(str_split(d.text, ' ')) AS t(token)
           GROUP BY 1, 2),
a AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
             SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))) AS clnc
      FROM c GROUP BY 1)
SELECT doc_id, n_tokens,
  ROUND(ln(CAST(n_tokens AS DOUBLE)) - clnc / CAST(n_tokens AS DOUBLE), 6)
    AS entropy
FROM a
"""

# JSON-attrs oracle: DuckDB json_extract_string + typed cast — NULL on
# missing/mistyped, matching from_json PERMISSIVE semantics.
_JSON_ATTRS_DUCK = """
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
FROM events
"""

# Inter-arrival oracle: lag over the identical (ts, event_id) order in
# integer epoch microseconds; mean as the SAME exact int/int double
# division (never AVG, whose internal accumulation is engine-defined).
_INTERARRIVAL_DUCK = """
WITH g AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events)
SELECT user_id, COUNT(*) AS n_events, COUNT(gap) AS n_gaps,
  MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
  CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(gap) AS DOUBLE) AS mean_gap_us
FROM g GROUP BY 1
"""

# Weighted-sample oracle: identical Knuth multiplicative hash (exact
# BIGINT arithmetic) and the identical single-rounded double threshold
# expression 0.5 * 2^32 / 2000.
_WEIGHTED_SAMPLE_DUCK = """
SELECT doc_id, n_chars FROM documents
WHERE (doc_id * 2654435761) % 4294967296
      < least(floor(CAST(n_chars AS DOUBLE) * (0.5 * 4294967296.0 / 2000.0)),
              4294967296.0)
"""

# Alerts oracle: the same rules as literal VALUES, NULL-wildcard OR
# join, CASE over the operator — counts kept integer, threshold double.
_ALERTS_DUCK = """
WITH a AS (SELECT event_type,
                  CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_start,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2),
r(rule_id, key, op, threshold) AS (
  VALUES ('r1', 'error', '>', CAST(3.0 AS DOUBLE)),
         ('r2', CAST(NULL AS VARCHAR), '>=', CAST(8.0 AS DOUBLE)))
SELECT a.event_type, a.bucket_start, a.n, r.rule_id, r.op, r.threshold
FROM a JOIN r ON (r.key IS NULL OR r.key = a.event_type)
WHERE CASE r.op
        WHEN '>'  THEN CAST(a.n AS DOUBLE) >  r.threshold
        WHEN '>=' THEN CAST(a.n AS DOUBLE) >= r.threshold
        ELSE FALSE END
"""

# Decimation oracle: identical row_number frame and (ts, event_id)
# order, keep rows at positions 0, 3, 6, ...
_DECIMATE_DUCK = """
SELECT event_id, user_id FROM (
  SELECT event_id, user_id,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events) WHERE (rn - 1) % 3 = 0
"""

# Path-mining oracle: two lead()s over the identical per-user order,
# full-depth windows only, unique (n desc, path asc) tie rule.
_PATHS_DUCK = """
WITH p AS (
  SELECT event_type AS s0,
         lead(event_type, 1) OVER w AS s1,
         lead(event_type, 2) OVER w AS s2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
c AS (SELECT s0 || '>' || s1 || '>' || s2 AS path, COUNT(*) AS n
      FROM p WHERE s2 IS NOT NULL GROUP BY 1)
SELECT path, n, CAST(rn AS INT) AS rank FROM (
  SELECT path, n,
    row_number() OVER (ORDER BY n DESC, path ASC) AS rn
  FROM c) WHERE rn <= 10
"""

# Boilerplate oracle: DF counts over unnest+generate_subscripts
# positions, the identical <=-ratio keep rule (one double multiply),
# string_agg ORDER BY pos reconstruction (skips the NULL drops),
# COALESCE for all-removed documents.
_BOILERPLATE_DUCK = """
WITH base AS (SELECT doc_id, str_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
      FROM base),
dfq AS (SELECT w, COUNT(DISTINCT doc_id) AS ndocs FROM w GROUP BY 1),
tot AS (SELECT COUNT(*) AS total FROM documents),
k AS (SELECT w.doc_id, w.w, w.pos,
        CAST(ndocs AS DOUBLE) <= CAST(total AS DOUBLE) * 0.78 AS keep
      FROM w JOIN dfq USING (w) CROSS JOIN tot)
SELECT doc_id,
  COALESCE(string_agg(CASE WHEN keep THEN w END, ' ' ORDER BY pos), '')
    AS text_filtered,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_removed
FROM k GROUP BY 1
"""

# Transcript-integrity oracle: the identical construction CTE (dense
# order, 1-in-17 idx bump, parity roles, µs-jittered unique ts) and the
# identical (idx, ts)-ordered window checks — exact integers only.
_TRANSCRIPT_INTEGRITY_DUCK = """
WITH t AS (
  SELECT user_id AS conv_id,
         CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
              - 1 + CASE WHEN event_id % 17 = 0 THEN 1 ELSE 0 END AS INT)
           AS turn_idx,
         CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role,
         make_timestamp(epoch_us(ts) + event_id) AS ts
  FROM events),
f AS (
  SELECT conv_id, turn_idx, role, ts,
         row_number() OVER w - 1 AS pos,
         lag(role) OVER w AS prev_role,
         lag(ts) OVER w AS prev_ts
  FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx, ts))
SELECT conv_id, COUNT(*) AS n_turns,
  SUM(CASE WHEN turn_idx <> pos THEN 1 ELSE 0 END) AS n_idx_breaks,
  SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) AS n_role_repeats,
  SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) AS n_ts_regressions,
  (SUM(CASE WHEN turn_idx <> pos THEN 1 ELSE 0 END) = 0
   AND SUM(CASE WHEN role = prev_role THEN 1 ELSE 0 END) = 0
   AND SUM(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END) = 0) AS is_clean
FROM f GROUP BY 1
"""

# Winsorize oracle: quantile_cont bounds (same exact interpolated
# definition as Spark's percentile), 6-place rounded, comparison-only
# clipping.
_WINSORIZE_DUCK = """
WITH b AS (SELECT event_type,
                  ROUND(quantile_cont(value, 0.05), 6) AS lo,
                  ROUND(quantile_cont(value, 0.95), 6) AS hi
           FROM events GROUP BY 1)
SELECT e.event_id, e.event_type, e.value,
  CASE WHEN e.value < b.lo THEN b.lo
       WHEN e.value > b.hi THEN b.hi
       ELSE e.value END AS value_winsorized
FROM events e JOIN b USING (event_type)
"""

# SCD2 oracle: the identical inline two-version dimension and the
# naive point-in-interval join (half-open, NULL = open-ended).
_SCD2_DUCK = """
WITH u AS (SELECT DISTINCT user_id FROM events),
d AS (SELECT user_id, TIMESTAMP '2020-01-01' AS vf,
             TIMESTAMP '2024-01-15' AS vt, 'basic' AS tier FROM u
      UNION ALL
      SELECT user_id, TIMESTAMP '2024-01-15', NULL, 'pro' FROM u)
SELECT e.event_id, e.user_id, d.tier AS dim_tier, d.vf AS dim_valid_from
FROM events e LEFT JOIN d
  ON e.user_id = d.user_id AND e.ts >= d.vf
 AND (d.vt IS NULL OR e.ts < d.vt)
"""

# Normalization oracle: the same lowercase → url → email → collapse →
# trim chain; DuckDB regexp_replace needs the 'g' flag (Spark's is
# global by default). Patterns are character-class-only, so the Java
# and RE2 dialects agree byte-for-byte.
_NORMALIZE_DUCK = """
SELECT doc_id,
  trim(regexp_replace(regexp_replace(regexp_replace(lower(text),
    'https?://[^ ]+', ' ', 'g'),
    '[a-z0-9._%+-]+@[a-z0-9.-]+', ' ', 'g'),
    '  +', ' ', 'g')) AS text_norm
FROM documents
"""

# KMV oracle: the identical 52-bit md5 hash space (13 hex digits parsed
# with DuckDB's 0x-cast, Spark's conv(...,16,10)), identical bottom-k
# rank cut, and the identical INTEGER division (k-1)*2^52 // h_k — no
# floats anywhere, so the estimate matches bit-for-bit.
_KMV_DUCK = """
WITH h AS (SELECT DISTINCT event_type,
             CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                  AS BIGINT) AS h
           FROM events WHERE user_id IS NOT NULL),
r AS (SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM h),
k AS (SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS max_h
      FROM r WHERE r <= 64 GROUP BY 1)
SELECT event_type, n_kept,
  CASE WHEN n_kept < 64 THEN NULL ELSE max_h END AS kth_hash,
  CASE WHEN n_kept < 64 THEN n_kept
       ELSE (63 * 4503599627370496) // max_h END AS est_distinct
FROM k
"""

# Prefix-Jaccard oracle: naive all-pairs via the shared-token
# formulation — counts common tokens per pair directly (no prefix
# mechanics at all, so it independently checks the filter admits every
# qualifying pair), then the identical integer threshold test.
_PREFIX_JACCARD_DUCK = """
WITH t AS (SELECT DISTINCT doc_id, token
           FROM documents d, unnest(str_split(d.text, ' ')) AS s(token)
           WHERE token <> ''),
s AS (SELECT doc_id, COUNT(*) AS sz FROM t GROUP BY 1),
p AS (SELECT a.doc_id AS a, b.doc_id AS b, COUNT(*) AS inter
      FROM t a JOIN t b ON a.token = b.token AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
SELECT p.a, p.b, CAST(p.inter AS BIGINT) AS inter_size,
       CAST(sa.sz + sb.sz - p.inter AS BIGINT) AS union_size
FROM p JOIN s sa ON sa.doc_id = p.a JOIN s sb ON sb.doc_id = p.b
WHERE 10 * p.inter >= 9 * (sa.sz + sb.sz - p.inter)
"""

# Span-union oracle: the same gaps-and-islands over (start, event_id)
# order — island result is order-insensitive given end >= start, but
# both sides pin the identical total order anyway. Integer µs.
_SPAN_UNION_DUCK = """
WITH iv AS (SELECT user_id, event_id, epoch_us(ts) AS s,
                   epoch_us(ts) + CAST(floor(value) AS BIGINT) * 200000000 AS e
            FROM events),
f AS (SELECT user_id, event_id, s, e,
        CASE WHEN MAX(e) OVER w_prev IS NULL OR s > MAX(e) OVER w_prev
             THEN 1 ELSE 0 END AS ni
      FROM iv
      WINDOW w_prev AS (PARTITION BY user_id ORDER BY s, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
g AS (SELECT user_id, s, e,
        SUM(ni) OVER (PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS island
      FROM f)
SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end,
       COUNT(*) AS n_merged, CAST(MAX(e) - MIN(s) AS BIGINT) AS covered
FROM g GROUP BY user_id, island
"""

# LOCF oracle: identical integer step bucketing (epoch µs // 1e6 //
# 3600), per-step last by (ts, event_id) as a row_number cut, the
# per-series inclusive grid, and IGNORE NULLS carry-forward.
_LOCF_DUCK = """
WITH e AS (SELECT user_id, event_id, ts,
             (epoch_us(ts) // 1000000 // 3600) * 3600 AS step,
             CAST(floor(value) AS BIGINT) AS v
           FROM events),
last_in AS (SELECT user_id, step, v FROM (
    SELECT user_id, step, v,
           row_number() OVER (PARTITION BY user_id, step
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM e) WHERE rn = 1),
b AS (SELECT user_id, MIN(step) AS lo, MAX(step) AS hi FROM e GROUP BY 1),
grid AS (SELECT user_id, CAST(r.s AS BIGINT) AS step
         FROM b, unnest(range(b.lo, b.hi + 3600, 3600)) AS r(s)),
j AS (SELECT g.user_id, g.step, l.v
      FROM grid g LEFT JOIN last_in l
        ON l.user_id = g.user_id AND l.step = g.step)
SELECT user_id, make_timestamp(step * 1000000) AS step_start,
  last_value(v IGNORE NULLS) OVER (
    PARTITION BY user_id ORDER BY step
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value
FROM j
"""

# Count-min oracle: rebuilds the identical 4x256 grid (52-bit md5 of
# "i|key" mod 256 — same hash contract as the KMV oracle) from ALL
# rows, probes it with the distinct keys, takes the identical min.
_CMS_DUCK = """
WITH k AS (SELECT event_type || ':' || CAST(user_id AS VARCHAR) AS key
           FROM events
           WHERE (event_type || ':' || CAST(user_id AS VARCHAR)) IS NOT NULL),
cells AS (SELECT t.i,
            CAST(('0x' || substr(md5(CAST(t.i AS VARCHAR) || '|' || key), 1, 13))
                 AS BIGINT) % 256 AS cell
          FROM k, unnest([0, 1, 2, 3]) AS t(i)),
grid AS (SELECT i, cell, COUNT(*) AS n FROM cells GROUP BY 1, 2),
probes AS (SELECT DISTINCT key FROM k),
pc AS (SELECT key, t.i,
         CAST(('0x' || substr(md5(CAST(t.i AS VARCHAR) || '|' || key), 1, 13))
              AS BIGINT) % 256 AS cell
       FROM probes, unnest([0, 1, 2, 3]) AS t(i))
SELECT pc.key AS k, MIN(g.n) AS est_n
FROM pc JOIN grid g ON g.i = pc.i AND g.cell = pc.cell
GROUP BY 1
"""

# Time-weighted-integral oracle: identical lead() over (ts, event_id),
# identical half-open step weighting, exact BIGINT sums.
_TWA_DUCK = """
WITH s AS (SELECT user_id, epoch_us(ts) AS t,
             CAST(floor(value) AS BIGINT) AS v,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nt
           FROM events)
SELECT user_id, COUNT(*) AS n_obs,
  CAST(SUM(CASE WHEN nt IS NULL THEN 0 ELSE v * (nt - t) END) AS BIGINT)
    AS weighted_sum,
  CAST(MAX(t) - MIN(t) AS BIGINT) AS duration_us
FROM s GROUP BY 1
"""

# Mixture oracle: weights derived from the source NAME (srcN -> N mod
# 4) — an independent formulation of the same literal weight table the
# Spark side carries as a CASE; identical md5 shard hash.
_MIXTURE_DUCK = """
WITH w AS (SELECT doc_id, source,
             CAST(substr(source, 4) AS INT) % 4 AS wt
           FROM documents),
c AS (SELECT doc_id, source, CAST(r.i AS INT) AS copy_idx
      FROM w, unnest(range(1, wt + 1)) AS r(i)
      WHERE wt >= 1)
SELECT doc_id, source, copy_idx,
  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                           || CAST(copy_idx AS VARCHAR)), 1, 13))
       AS BIGINT) % 64 AS shard
FROM c
"""

# MAD oracle: exact interpolated medians rounded to 6 places (the
# group_percentiles discipline), then single-IEEE-op deviation and cut
# on identical operands.
_MAD_DUCK = """
WITH med AS (SELECT event_type, ROUND(quantile_cont(value, 0.5), 6) AS med
             FROM events GROUP BY 1),
dev AS (SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS dv
        FROM events e JOIN med m USING (event_type)),
mad AS (SELECT event_type, ROUND(quantile_cont(dv, 0.5), 6) AS mad
        FROM dev GROUP BY 1)
SELECT d.event_id, d.event_type, d.value, d.med, a.mad
FROM dev d JOIN mad a USING (event_type)
WHERE d.dv > 4.4478 * a.mad
"""

# Exponential-histogram oracle: the identical comparison ladder over
# the identical exact power-of-two double literals (2^-7 .. 2^9) —
# decimal renderings of integer powers of two parse to exact doubles in
# both engines, so every boundary comparison agrees bit-for-bit.
_EXP_HIST_PORTION = " + ".join(
    f"(CASE WHEN value > {2.0**e!r} THEN 1 ELSE 0 END)" for e in range(-7, 10)
)
_EXP_HIST_DUCK = f"""
SELECT event_type,
  CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
  CASE WHEN value IS NULL OR value <= 0 THEN NULL
       ELSE CAST(-8 + {_EXP_HIST_PORTION} AS INT) END AS bucket_idx,
  COUNT(*) AS bucket_count
FROM events GROUP BY 1, 2, 3
"""

# ROLLUP oracle: DuckDB's GROUPING(a, b) emits the same bitmask as
# Spark's grouping_id (verified: 0 detail, 1 right-dim subtotal, 3
# grand total); decimal-accumulated totals per the interval_stats
# discipline.
_ROLLUP_DUCK = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
  CAST(GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP), event_type)
       AS BIGINT) AS grouping_lvl,
  COUNT(*) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events
GROUP BY ROLLUP (CAST(date_trunc('day', ts) AS TIMESTAMP), event_type)
"""

# Bloom oracle: identical bit positions (52-bit md5 of "h{i}|key" mod
# 1024 — the shared hash contract), identical >=18-purchases small
# side, membership of ALL k positions. False positives INCLUDED — the
# filter's deterministic output is the contract, the exact join behind
# it is a separate (already-covered) operator.
_BLOOM_DUCK = """
WITH prem AS (SELECT user_id FROM events WHERE event_type = 'purchase'
              GROUP BY 1 HAVING COUNT(*) >= 18),
bits AS (SELECT DISTINCT
           CAST(('0x' || substr(md5('h' || t.i || '|' || CAST(user_id AS VARCHAR)),
                                1, 13)) AS BIGINT) % 1024 AS p
         FROM prem, unnest([0, 1, 2]) AS t(i))
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE e.user_id IS NOT NULL
  AND CAST(('0x' || substr(md5('h0|' || CAST(e.user_id AS VARCHAR)), 1, 13))
           AS BIGINT) % 1024 IN (SELECT p FROM bits)
  AND CAST(('0x' || substr(md5('h1|' || CAST(e.user_id AS VARCHAR)), 1, 13))
           AS BIGINT) % 1024 IN (SELECT p FROM bits)
  AND CAST(('0x' || substr(md5('h2|' || CAST(e.user_id AS VARCHAR)), 1, 13))
           AS BIGINT) % 1024 IN (SELECT p FROM bits)
"""

# Skew-report oracle: identical integer ppm share and ceil-div salt,
# identical unique (n DESC, keys ASC) top-10 cut.
_SKEW_DUCK = """
WITH c AS (SELECT event_type, user_id, COUNT(*) AS n
           FROM events GROUP BY 1, 2),
t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
SELECT event_type, user_id, n,
  CAST(n * 1000000 // total AS BIGINT) AS share_ppm,
  CAST((n + 9) // 10 AS BIGINT) AS salt_factor
FROM c, t
ORDER BY n DESC, event_type ASC, user_id ASC
LIMIT 10
"""

# Table-diff oracle: the identical deterministic old/new derivations,
# a FULL OUTER JOIN, IS DISTINCT FROM for the null-safe value compare
# (the twin of Spark's eqNullSafe), unchanged keys filtered.
_TABLE_DIFF_DUCK = """
WITH old AS (SELECT event_id, value FROM events WHERE event_id % 50 <> 0),
new AS (SELECT event_id,
          CASE WHEN event_id % 7 = 0 THEN value + 1.0 ELSE value END AS value
        FROM events WHERE event_id % 11 <> 0),
d AS (SELECT COALESCE(o.event_id, n.event_id) AS event_id,
        CASE WHEN o.event_id IS NULL THEN 'added'
             WHEN n.event_id IS NULL THEN 'removed'
             WHEN o.value IS DISTINCT FROM n.value THEN 'changed'
        END AS status
      FROM old o FULL OUTER JOIN new n ON o.event_id = n.event_id)
SELECT event_id, status FROM d WHERE status IS NOT NULL
"""

# Reply-latency oracle: identical role derivation (event-id parity),
# identical lag window over (conv, ts, event_id), exact integer gaps,
# mean as the SAME int/int double division (interarrival discipline).
_REPLY_LATENCY_DUCK = """
WITH t AS (SELECT user_id, event_id, ts,
             CASE WHEN event_id % 2 = 0 THEN 'user' ELSE 'assistant' END AS role
           FROM events),
g AS (SELECT role, lag(role) OVER w AS prev_role,
             epoch_us(ts) - lag(epoch_us(ts)) OVER w AS gap
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT prev_role, role, COUNT(*) AS n_gaps,
  MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
  CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(gap) AS DOUBLE) AS mean_gap_us
FROM g WHERE prev_role IS NOT NULL GROUP BY 1, 2
"""

# Context-trim oracle: identical turn derivation, the identical
# reverse cumulative sum (ORDER BY turn DESC) and the <= 300 cut.
_TRIM_BUDGET_DUCK = """
WITH t AS (SELECT user_id AS conv_id,
             CAST(row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) - 1
                  AS BIGINT) AS turn_idx,
             (event_id % 100) + 1 AS token_n
           FROM events),
s AS (SELECT conv_id, turn_idx, token_n,
        CAST(SUM(token_n) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS BIGINT) AS suffix_tokens
      FROM t)
SELECT conv_id, turn_idx, token_n, suffix_tokens
FROM s WHERE suffix_tokens <= 300
"""

# NTILE oracle: ANSI ntile over the identical total (value, event_id)
# ordering per type — assignments, not just bucket sizes, agree.
_NTILE_DUCK = """
SELECT event_id, event_type, value,
  CAST(ntile(10) OVER (PARTITION BY event_type
                       ORDER BY value ASC, event_id ASC) AS BIGINT) AS bucket
FROM events
"""

# histogram_quantile oracle: identical comparison-ladder buckets,
# integer rank crossing (cum*100 vs total*95 — no float rank), and the
# identical single interpolation tree with the identical bound
# literals; overflow lo==hi collapses to the PromQL clamp.
_HQ_LADDER = (
    "(CASE WHEN value > 10.0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN value > 50.0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN value > 100.0 THEN 1 ELSE 0 END)"
    " + (CASE WHEN value > 250.0 THEN 1 ELSE 0 END)"
)
_HIST_QUANTILE_DUCK = f"""
WITH h AS (SELECT event_type, CAST({_HQ_LADDER} AS INT) AS bucket_idx,
                  COUNT(*) AS n
           FROM events GROUP BY 1, 2),
c AS (SELECT event_type, bucket_idx, n,
        SUM(n) OVER (PARTITION BY event_type ORDER BY bucket_idx
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        SUM(n) OVER (PARTITION BY event_type) AS total
      FROM h),
x AS (SELECT *, cum - n AS prev,
        CASE bucket_idx WHEN 0 THEN 0.0 WHEN 1 THEN 10.0 WHEN 2 THEN 50.0
                        WHEN 3 THEN 100.0 ELSE 250.0 END AS lo,
        CASE bucket_idx WHEN 0 THEN 10.0 WHEN 1 THEN 50.0 WHEN 2 THEN 100.0
                        WHEN 3 THEN 250.0 ELSE 250.0 END AS hi
      FROM c)
SELECT event_type, bucket_idx,
  ROUND(lo + (hi - lo) * ((CAST(total AS DOUBLE) * 0.95 - CAST(prev AS DOUBLE))
                          / CAST(n AS DOUBLE)), 6) AS p950
FROM x
WHERE cum * 100 >= total * 95 AND prev * 100 < total * 95
"""

# PSI oracle: identical ladder buckets on both snapshots, identical
# +1/(total+5) Laplace smoothing, ONE fixed (p_new-p_old)*ln(p_new/
# p_old) tree, round-6 (entropy/pmi discipline).
_PSI_DUCK = f"""
WITH o AS (SELECT CAST({_HQ_LADDER} AS INT) AS bucket, COUNT(*) AS n_old
           FROM events WHERE event_id % 2 = 0 GROUP BY 1),
n AS (SELECT CAST({_HQ_LADDER} AS INT) AS bucket, COUNT(*) AS n_new
      FROM events WHERE event_id % 2 = 1 GROUP BY 1),
t AS (SELECT (SELECT COUNT(*) FROM events WHERE event_id % 2 = 0) AS t_old,
             (SELECT COUNT(*) FROM events WHERE event_id % 2 = 1) AS t_new),
j AS (SELECT COALESCE(o.bucket, n.bucket) AS bucket,
             COALESCE(o.n_old, 0) AS n_old, COALESCE(n.n_new, 0) AS n_new
      FROM o FULL OUTER JOIN n ON o.bucket = n.bucket)
SELECT bucket, CAST(n_old AS BIGINT) AS n_old, CAST(n_new AS BIGINT) AS n_new,
  ROUND((CAST(n_new + 1 AS DOUBLE) / CAST(t_new + 5 AS DOUBLE)
         - CAST(n_old + 1 AS DOUBLE) / CAST(t_old + 5 AS DOUBLE))
        * ln((CAST(n_new + 1 AS DOUBLE) / CAST(t_new + 5 AS DOUBLE))
             / (CAST(n_old + 1 AS DOUBLE) / CAST(t_old + 5 AS DOUBLE))), 6)
    AS psi_term
FROM j, t
"""

# Changes-only oracle: identical lag over (ts, event_id), first row
# kept, IS DISTINCT FROM compare on the floored value.
_CHANGES_ONLY_DUCK = """
WITH s AS (SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v,
             lag(CAST(floor(value) AS BIGINT)) OVER w AS prev,
             row_number() OVER w AS rn
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, v AS value_floor
FROM s WHERE rn = 1 OR v IS DISTINCT FROM prev
"""

# Z-order oracle: the identical 16-step bit interleave as one flat
# OR-chain over >>/<<\/& — engine-exact integer bit math.
_ZORDER_DUCK = "SELECT event_id, (" + " | ".join(
    f"(((user_id >> {i}) & 1) << {2 * i})"
    f" | ((((event_id % 65536) >> {i}) & 1) << {2 * i + 1})"
    for i in range(16)
) + ") AS z FROM events"

# Source-overlap oracle: the identical distinct (source, 12-gram
# shingle) projection, pairwise shared-shingle counts, exact integer
# inter/union.
_SOURCE_OVERLAP_DUCK = """
WITH t AS (SELECT DISTINCT source AS src,
             substr(text, CAST(p.i AS INT), 12) AS sh
           FROM documents d,
                unnest(range(1, greatest(length(d.text) - 11, 1) + 1)) AS p(i)),
s AS (SELECT src, COUNT(*) AS sz FROM t GROUP BY 1),
p AS (SELECT a.src AS a, b.src AS b, COUNT(*) AS inter_size
      FROM t a JOIN t b ON a.sh = b.sh AND a.src < b.src GROUP BY 1, 2)
SELECT p.a, p.b, p.inter_size,
       CAST(sa.sz + sb.sz - p.inter_size AS BIGINT) AS union_size
FROM p JOIN s sa ON sa.src = p.a JOIN s sb ON sb.src = p.b
"""

# Basket-lift oracle: identical distinct (basket, item) pairs, the
# identical integer lift n_ab*total*1e6 // (n_a*n_b).
_BASKET_LIFT_DUCK = """
WITH b AS (SELECT DISTINCT user_id AS bk, event_type AS it FROM events
           WHERE event_type IS NOT NULL),
t AS (SELECT COUNT(DISTINCT bk) AS total FROM b),
i AS (SELECT it, COUNT(*) AS n FROM b GROUP BY 1),
p AS (SELECT x.it AS a, y.it AS b, COUNT(*) AS n_ab
      FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it GROUP BY 1, 2)
SELECT p.a, p.b, p.n_ab, ia.n AS n_a, ib.n AS n_b,
  CAST(p.n_ab * t.total * 1000000 // (ia.n * ib.n) AS BIGINT) AS lift_ppm
FROM p JOIN i ia ON ia.it = p.a JOIN i ib ON ib.it = p.b, t
"""

# Percent-rank oracle: ANSI percent_rank over value alone — tied
# values are peers in both engines, so no tiebreak is needed (or
# allowed: one would change the semantics).
_PERCENT_RANK_DUCK = """
SELECT event_id, event_type, value,
  percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS pr
FROM events
"""

# RLE oracle: identical lag-flag + running-sum islands over the
# identical (ts, event_id) order, identical per-run aggregates.
_RLE_DUCK = """
WITH f AS (SELECT user_id, event_type, event_id, ts,
             CASE WHEN event_type IS NOT DISTINCT FROM lag(event_type) OVER w
                  THEN 0 ELSE 1 END AS nw
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT user_id, event_type, event_id,
        CAST(SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_idx
      FROM f)
SELECT user_id, run_idx, MAX(event_type) AS state, COUNT(*) AS run_len,
       MIN(event_id) AS first_id, MAX(event_id) AS last_id
FROM g GROUP BY 1, 2
"""

# TPC-H Q3 oracle: the classic three-table formulation with the
# identical decimal revenue accumulation and the identical unique
# (revenue DESC, o_orderdate, l_orderkey) top-10 cut.
_TPCH_Q3_DUCK = """
SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
"""

# Rolling-KMV oracle: identical per-day distinct hash sets, identical
# 7-day range merge, identical bottom-k integer estimator.
_KMV_ROLLING_DUCK = """
WITH dh AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
              CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                   AS BIGINT) AS h
            FROM events WHERE user_id IS NOT NULL),
days AS (SELECT DISTINCT d AS day FROM dh),
win AS (SELECT DISTINCT g.day, dh.h
        FROM days g JOIN dh
          ON dh.d BETWEEN g.day - INTERVAL 6 DAY AND g.day),
r AS (SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS r
      FROM win),
k AS (SELECT day, COUNT(*) AS n_kept, MAX(h) AS max_h
      FROM r WHERE r <= 64 GROUP BY 1)
SELECT day, n_kept,
  CASE WHEN n_kept < 64 THEN NULL ELSE max_h END AS kth_hash,
  CASE WHEN n_kept < 64 THEN n_kept
       ELSE (63 * 4503599627370496) // max_h END AS est_distinct
FROM k
"""

# k-anonymity oracle: identical quasi-identifier derivation (the /50
# banding is one IEEE double division + floor — engine-exact), HAVING
# under k.
_K_ANON_DUCK = """
SELECT event_type, CAST(floor(value / 50) AS BIGINT) AS band,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, COUNT(*) AS n
FROM events GROUP BY 1, 2, 3 HAVING COUNT(*) < 3
"""

# Coverage-gaps oracle: identical integer step bucketing and per-entity
# inclusive grid, missing = grid minus observed.
_COVERAGE_GAPS_DUCK = """
WITH o AS (SELECT DISTINCT user_id,
             (epoch_us(ts) // 1000000 // 21600) * 21600 AS s
           FROM events),
b AS (SELECT user_id, MIN(s) AS lo, MAX(s) AS hi FROM o GROUP BY 1),
g AS (SELECT user_id, CAST(r.x AS BIGINT) AS s
      FROM b, unnest(range(b.lo, b.hi + 21600, 21600)) AS r(x))
SELECT g.user_id, make_timestamp(g.s * 1000000) AS missing_step
FROM g LEFT JOIN o ON o.user_id = g.user_id AND o.s = g.s
WHERE o.user_id IS NULL
"""

# Kappa oracle: identical label derivation, exact integer marginal
# mass, identical truncating integer division for the ppm rendering.
_KAPPA_DUCK = """
WITH p AS (SELECT event_type AS a,
             CASE WHEN event_id % 10 = 0 THEN 'view' ELSE event_type END AS b
           FROM events
           WHERE event_type IS NOT NULL),
t AS (SELECT COUNT(*) AS n, COUNT(*) FILTER (WHERE a = b) AS agree FROM p),
ma AS (SELECT a, COUNT(*) AS n FROM p GROUP BY 1),
mb AS (SELECT b, COUNT(*) AS n FROM p GROUP BY 1),
c AS (SELECT CAST(SUM(ma.n * mb.n) AS BIGINT) AS chance
      FROM ma JOIN mb ON ma.a = mb.b)
SELECT t.n AS n_pairs, t.agree AS n_agree, c.chance AS chance_mass,
  CAST(t.agree * t.n - c.chance AS BIGINT) AS kappa_num,
  CAST(t.n * t.n - c.chance AS BIGINT) AS kappa_den,
  CAST((t.agree * t.n - c.chance) * 1000000
       // (t.n * t.n - c.chance) AS BIGINT) AS kappa_ppm
FROM t, c
"""

# FK-orphans oracle: identical corruption rule, NOT EXISTS as the anti
# join.
_FK_ORPHANS_DUCK = """
WITH child AS (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 97 = 0 THEN o_custkey + 1000000
                      ELSE o_custkey END AS o_custkey
               FROM orders)
SELECT c.o_orderkey, c.o_custkey FROM child c
WHERE NOT EXISTS (SELECT 1 FROM customer p WHERE p.c_custkey = c.o_custkey)
"""

# Seasonality oracle: DuckDB dayofweek is 0-based Sunday, Spark's is
# 1-based Sunday — +1 aligns; medians follow the quantile_cont round-6
# discipline.
_SEASONALITY_DUCK = """
SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow, CAST(hour(ts) AS INT) AS hod,
       COUNT(*) AS n, ROUND(quantile_cont(value, 0.5), 6) AS median
FROM events GROUP BY 1, 2
"""

# BM25 oracle: generated from the same Python float constants (repr ->
# identical doubles), the same conditional-count tf/df integers, and
# the same left-associative score tree: ln(1 + (N-df+0.5)/(df+0.5)) *
# (tf*(k1+1)) / (tf + k1*(1 - b + b*(len/(total_len/N)))), summed in
# literal term order, round-6, unique (score DESC, doc_id) top-20 cut.
_BM25_K1, _BM25_B = 1.2, 0.75
_BM25_TERMS = ["spark", "join", "window"]


def _bm25_duck() -> str:
    terms = _BM25_TERMS
    tf_cols = ",\n           ".join(
        f"COUNT(*) FILTER (WHERE token = '{t}') AS tf{i}"
        for i, t in enumerate(terms)
    )
    df_cols = ",\n           ".join(
        f"COUNT(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(terms))
    )
    k1, b, k1p1 = repr(_BM25_K1), repr(_BM25_B), repr(_BM25_K1 + 1.0)
    score = " + ".join(
        f"(ln(1.0 + (CAST(N AS DOUBLE) - CAST(df{i} AS DOUBLE) + 0.5)"
        f" / (CAST(df{i} AS DOUBLE) + 0.5))"
        f" * (CAST(tf{i} AS DOUBLE) * {k1p1})"
        f" / (CAST(tf{i} AS DOUBLE) + {k1} * (1.0 - {b} + {b}"
        f" * (CAST(len AS DOUBLE) / (CAST(total_len AS DOUBLE)"
        f" / CAST(N AS DOUBLE))))))"
        for i in range(len(terms))
    )
    tf_out = ", ".join(f"tf{i} AS tf_{t}" for i, t in enumerate(terms))
    any_hit = " OR ".join(f"tf{i} > 0" for i in range(len(terms)))
    return f"""
WITH toks AS (SELECT doc_id, token
              FROM documents d, unnest(str_split(d.text, ' ')) AS s(token)
              WHERE token <> ''),
pd AS (SELECT doc_id, COUNT(*) AS len,
           {tf_cols}
       FROM toks GROUP BY 1),
st AS (SELECT COUNT(*) AS N, CAST(SUM(len) AS BIGINT) AS total_len,
           {df_cols}
       FROM pd)
SELECT doc_id, {tf_out}, CAST(len AS BIGINT) AS doc_len,
       ROUND({score}, 6) AS bm25
FROM pd, st
WHERE {any_hit}
ORDER BY ({score}) DESC, doc_id ASC
LIMIT 20
"""


_BM25_DUCK = _bm25_duck()

# RRF oracle: composes the BM25 oracle (rounded scores — both engines
# rank the identical rounded column with the doc_id tiebreak) with the
# length-prior top-20, identical explicit two-term 1/(60+r) tree.
_RRF_DUCK = f"""
WITH bm AS (SELECT doc_id, bm25 FROM ({_BM25_DUCK}) t),
a AS (SELECT doc_id,
        CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS r
      FROM bm),
lng AS (SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id ASC LIMIT 20),
b AS (SELECT doc_id,
        CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id ASC) AS INT) AS r
      FROM lng),
j AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, a.r AS ra, b.r AS rb
      FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
SELECT doc_id, ra AS rank_a, rb AS rank_b,
  ROUND((CASE WHEN ra IS NULL THEN 0.0
              ELSE 1.0 / (60.0 + CAST(ra AS DOUBLE)) END)
        + (CASE WHEN rb IS NULL THEN 0.0
                ELSE 1.0 / (60.0 + CAST(rb AS DOUBLE)) END), 6) AS rrf
FROM j
"""

# Negative-samples oracle: identical 52-bit md5 bucket ring, identical
# min-id representatives, identical rejection of self-draws.
_NEG_SAMPLES_DUCK = """
WITH ids AS (SELECT DISTINCT doc_id FROM documents),
reps AS (SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                     AS BIGINT) % 64 AS b,
                MIN(doc_id) AS neg_id
         FROM ids GROUP BY 1),
probes AS (SELECT doc_id, CAST(t.j AS INT) AS j,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#'
                                      || CAST(t.j AS VARCHAR)), 1, 13))
                  AS BIGINT) % 64 AS b
           FROM ids, unnest([0, 1, 2]) AS t(j))
SELECT p.doc_id, p.j, r.neg_id
FROM probes p JOIN reps r USING (b)
WHERE r.neg_id <> p.doc_id
"""

# PMI oracle: positional bigrams via list indexing (no window), the
# SAME fixed IEEE tree ln(c12·N / (c1·c2)) on exact integer counts, and
# the identical unique (pmi DESC, w1, w2) ordering for the top-k cut.
_PMI_DUCK = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
b AS (SELECT ws[i] AS w1, ws[i+1] AS w2
      FROM t, unnest(range(1, len(ws))) r(i)),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM b GROUP BY 1, 2),
uni AS (SELECT w, COUNT(*) AS c FROM (
          SELECT w1 AS w FROM b UNION ALL SELECT w2 FROM b) GROUP BY 1),
n AS (SELECT COUNT(*) AS nn FROM b)
SELECT c12.w1 AS w1, c12.w2 AS w2, CAST(c12.c12 AS BIGINT) AS c12,
  round(ln(CAST(c12.c12 AS DOUBLE) * n.nn / (u1.c * u2.c)), 6) AS pmi
FROM c12
JOIN uni u1 ON u1.w = c12.w1
JOIN uni u2 ON u2.w = c12.w2
CROSS JOIN n
WHERE c12.c12 >= 5
ORDER BY pmi DESC, w1, w2
LIMIT 20
"""

# Near-dup dedup oracle: the _MINHASH_DUCK pair CTEs verbatim, closed
# transitively by a RECURSIVE reachability CTE (fixpoint = full
# closure), then min reachable id per doc — an independent formulation
# of connected components (the operator uses union-find / min-label
# propagation). Docs outside every pair reach only themselves.
_NEARDUP_DEDUP_DUCK = """
WITH RECURSIVE d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 12) AS s
       FROM d, unnest(range(1, greatest(length(text) - 11, 1) + 1)) t(i)),
sig AS (SELECT doc_id,
               MIN(md5(concat('0|', s))) AS h0, MIN(md5(concat('1|', s))) AS h1
        FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, concat('b0#', h0) AS band FROM sig
          UNION ALL SELECT doc_id, concat('b1#', h1) AS band FROM sig),
pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id),
und AS (SELECT id_a AS s, id_b AS t FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
reach(s, t) AS (
  SELECT doc_id, doc_id FROM d
  UNION
  SELECT r.s, u.t FROM reach r JOIN und u ON r.t = u.s)
SELECT s AS doc_id, MIN(t) AS cluster_id,
       MIN(t) = s AS is_canonical
FROM reach GROUP BY s
"""

# Chunking oracle: same [i*stride, i*stride+chunk) token windows via
# 1-based inclusive list slicing; integer chunk-count arithmetic
# (// = floor div on exact ints, no float ceil).
_CHUNK_DUCK = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
m AS (SELECT doc_id, ws, len(ws) AS n,
        CASE WHEN len(ws) <= 32 THEN 1
             ELSE 1 + (len(ws) - 32 + 23) // 24 END AS n_chunks
      FROM t)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
  array_to_string(ws[i*24 + 1 : i*24 + 32], ' ') AS chunk_text,
  CAST(LEAST(32, n - i*24) AS INT) AS n_tokens
FROM m, unnest(range(0, n_chunks)) AS r(i)
"""

# Anomaly oracle: densified hourly spine per event_type
# (generate_series over the entity's own [min,max] span), rolling
# integer sums over ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING, and the
# z-score derived in the SAME fixed IEEE expression tree the Spark
# operator uses — (ss - s*s/cnt)/(cnt-1) — so the doubles are
# bit-identical (no engine-private stddev accumulation).
_ANOMALY_DUCK = """
WITH c AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_start, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
sp AS (
  SELECT event_type,
         unnest(generate_series(min(bucket_start), max(bucket_start),
                                INTERVAL 1 HOUR)) AS bucket_start
  FROM c GROUP BY event_type),
d AS (
  SELECT sp.event_type, sp.bucket_start, COALESCE(c.n, 0) AS n
  FROM sp LEFT JOIN c
    ON sp.event_type = c.event_type AND sp.bucket_start = c.bucket_start),
w AS (
  SELECT event_type, bucket_start, n,
    COUNT(n) OVER win AS cnt,
    SUM(n) OVER win AS s,
    SUM(n * n) OVER win AS ss
  FROM d
  WINDOW win AS (PARTITION BY event_type ORDER BY bucket_start
                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
SELECT event_type, bucket_start, CAST(n AS BIGINT) AS n,
  CASE WHEN cnt >= 12
        AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1) > 0
       THEN (n - CAST(s AS DOUBLE) / cnt)
            / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1))
  END AS zscore,
  CASE WHEN cnt >= 12
        AND (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1) > 0
       THEN abs((n - CAST(s AS DOUBLE) / cnt)
            / sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / cnt) / (cnt - 1))) > 3.0
  END AS is_anomaly
FROM w
"""

_SESSIONIZE_DUCK = """
WITH o AS (
  SELECT event_id, user_id, ts,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
         epoch_us(ts) AS cur_us
  FROM events),
f AS (SELECT event_id, user_id, ts,
        CASE WHEN prev_us IS NULL OR cur_us - prev_us > 28800000000 THEN 1 ELSE 0 END AS ns
      FROM o)
SELECT event_id, user_id,
  CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS INT) AS session_idx
FROM f
"""

# Repetition oracle: token positions via list indexing over an unnested
# 1..len range (no window function — independent of the engine's lead()
# formulation); bigrams as positional string concat. Fractions are the
# same exact-count divisions, bit-identical in IEEE.
_REPETITION_DUCK = """
WITH t AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
w AS (SELECT doc_id, ws[i] AS w FROM t, unnest(range(1, len(ws)+1)) AS r(i)),
uni AS (
  SELECT doc_id, SUM(c) AS n_words, COUNT(*) AS n_distinct_words, MAX(c) AS top_c
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1,2) GROUP BY 1
),
b AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bg
      FROM t, unnest(range(1, len(ws))) AS r(i)),
bs AS (SELECT doc_id, COUNT(*) AS n_bigrams,
              COUNT(DISTINCT bg) AS n_distinct_bigrams FROM b GROUP BY 1)
SELECT uni.doc_id AS doc_id, CAST(n_words AS BIGINT) AS n_words,
  CAST(n_distinct_words AS BIGINT) AS n_distinct_words,
  1 - CAST(n_distinct_words AS DOUBLE)/n_words AS dup_word_frac,
  CAST(top_c AS DOUBLE)/n_words AS top_word_frac,
  CASE WHEN bs.n_bigrams IS NOT NULL
       THEN 1 - CAST(n_distinct_bigrams AS DOUBLE)/n_bigrams
       ELSE 0.0 END AS dup_bigram_frac
FROM uni LEFT JOIN bs ON uni.doc_id = bs.doc_id
"""

# Split-assignment oracle: the 80/10/10 cumulative thresholds frozen as
# the 8-hex-digit literals 'cccccccc' (0.8*2^32) and 'e6666666'
# (0.9*2^32); lowercase-hex string compare == unsigned compare.
_SPLIT_ASSIGN_DUCK = """
SELECT doc_id,
  CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
       WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
       ELSE 'test' END AS split
FROM documents
"""

_VOCAB_DUCK = """
SELECT t.token, COUNT(*) AS n_total, COUNT(DISTINCT d.doc_id) AS n_docs
FROM documents d, unnest(str_split(d.text, ' ')) AS t(token)
GROUP BY 1 HAVING COUNT(*) >= 3
"""

# Packing oracle: plain global cumsum over doc_id order — the oracle is
# ALLOWED the single-partition window the engine is not (oracle scale).
_PACK_DUCK = """
WITH t AS (SELECT doc_id, len(str_split(text, ' ')) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                  - n_tokens AS BIGINT) AS start_offset
      FROM t)
SELECT doc_id, n_tokens, start_offset,
       CAST(floor(start_offset / 512.0) AS BIGINT) AS bin_id
FROM c
"""

# TF-IDF oracle: same public formula (tf * ln(N/df_t), round 6, ties on
# term asc) in plain window SQL.
_TFIDF_DUCK = """
WITH tok AS (SELECT doc_id, t.term
             FROM documents d, unnest(str_split(d.text, ' ')) AS t(term)),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df_t FROM tf GROUP BY 1),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_t,
                  ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / dfreq.df_t), 6) AS tfidf
           FROM tf JOIN dfreq USING (term) CROSS JOIN n),
ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY tfidf DESC, term ASC) AS term_rank
           FROM scored)
SELECT doc_id, term, tf, df_t, tfidf, term_rank FROM ranked WHERE term_rank <= 3
"""

# Percentile oracle: quantile_cont is the same (n-1)·p linear
# interpolation as Spark's exact percentile aggregate.
_PERCENTILES_DUCK = """
SELECT event_type, COUNT(*) AS n,
       ROUND(quantile_cont(value, 0.5), 6)  AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY 1
"""

_ANN_DUCK = """
WITH idx AS (SELECT unnest(range(1, 65)) AS i),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
norms AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(CAST(e.embedding[CAST(idx.i AS INT)] AS DOUBLE)
                       * CAST(e.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nrm2
  FROM embeddings e CROSS JOIN idx GROUP BY e.vec_id),
dots AS (
  SELECT q.qid, e.vec_id,
         CAST(SUM(CAST(CAST(q.qe[CAST(idx.i AS INT)] AS DOUBLE)
                       * CAST(e.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
  FROM q CROSS JOIN embeddings e CROSS JOIN idx
  WHERE e.vec_id <> q.qid
  GROUP BY q.qid, e.vec_id),
scored AS (
  SELECT d.qid, d.vec_id,
         ROUND(d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY d.qid
                            ORDER BY d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)) DESC, d.vec_id) AS rn
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nv ON nv.vec_id = d.vec_id)
SELECT qid, vec_id, cosine, rn AS nn_rank FROM scored WHERE rn <= 3
"""

_EMB_BUCKET_DUCK = """
WITH b AS (
  SELECT vec_id, concat(
           CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
           CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
           CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
           CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket
  FROM embeddings
)
SELECT bucket, COUNT(*) AS n, MIN(vec_id) AS min_vec_id FROM b GROUP BY bucket
"""

# hyperplane LSH: deterministic md5-derived planes (similarity.py
# hyperplane_table) — w = conv(md5(plane|i)[0:8], 16, 10) / 2^32 * 2 - 1
_HYPERPLANES_DUCK = """
planes AS (
  SELECT p.plane, i.i,
         (CAST(CAST('0x' || substr(md5(CAST(p.plane AS VARCHAR) || '|' || CAST(i.i AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
          / 4294967296.0) * 2 - 1 AS w,
         CAST(floor(p.plane / 4.0) AS INT) AS band
  FROM (SELECT unnest(range(0, 8)) AS plane) p,
       (SELECT unnest(range(1, 65)) AS i) i
),
e AS (SELECT vec_id, i.i, CAST(embedding[CAST(i.i AS INT)] AS DOUBLE) AS v
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) i),
dots AS (SELECT e.vec_id, pl.band, pl.plane, SUM(CAST(e.v * pl.w AS DECIMAL(38,18))) AS d
         FROM e JOIN planes pl ON pl.i = e.i GROUP BY 1, 2, 3),
buckets AS (
  SELECT vec_id, band,
         SUM((CASE WHEN d >= 0 THEN 1 ELSE 0 END)
             * CAST(pow(2, plane % 4) AS BIGINT)) AS bucket
  FROM dots GROUP BY vec_id, band
)
"""

_HYPERPLANE_BUCKETS_DUCK = f"""
WITH {_HYPERPLANES_DUCK}
SELECT vec_id, band, CAST(bucket AS BIGINT) AS bucket FROM buckets
"""

_ANN_LSH_DUCK = f"""
WITH {_HYPERPLANES_DUCK},
qb AS (SELECT vec_id AS qid, band, bucket FROM buckets WHERE vec_id < 5),
cands AS (
  SELECT DISTINCT qb.qid, b.vec_id
  FROM buckets b JOIN qb ON b.band = qb.band AND b.bucket = qb.bucket
  WHERE b.vec_id <> qb.qid
),
idx AS (SELECT unnest(range(1, 65)) AS i),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
norms AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(CAST(e.embedding[CAST(idx.i AS INT)] AS DOUBLE)
                       * CAST(e.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nrm2
  FROM embeddings e CROSS JOIN idx GROUP BY e.vec_id),
dots2 AS (
  SELECT c.qid, c.vec_id,
         CAST(SUM(CAST(CAST(q.qe[CAST(idx.i AS INT)] AS DOUBLE)
                       * CAST(e.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
  FROM cands c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN q ON q.qid = c.qid
  CROSS JOIN idx
  GROUP BY c.qid, c.vec_id),
scored AS (
  SELECT d.qid, d.vec_id,
         ROUND(d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY d.qid
                            ORDER BY d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)) DESC, d.vec_id) AS rn
  FROM dots2 d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nv ON nv.vec_id = d.vec_id)
SELECT qid, vec_id, cosine, rn AS nn_rank FROM scored WHERE rn <= 3
"""

# ANN-recall oracle: COMPOSES the two existing independent oracles
# (exact brute force, banded LSH) as subqueries and counts the overlap
# — the evaluation metric is itself oracle-checked end to end.
_ANN_RECALL_DUCK = f"""
WITH exact AS (SELECT qid, vec_id FROM ({_ANN_DUCK}) t),
approx AS (SELECT qid, vec_id FROM ({_ANN_LSH_DUCK}) t)
SELECT e.qid, COUNT(*) AS n_exact,
  CAST(SUM(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_hit
FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.vec_id = e.vec_id
GROUP BY 1
"""

# OOV oracle: identical unique (freq DESC, token ASC) top-20 vocabulary
# cut, identical per-doc integer counts via the vocab anti-membership.
_OOV_DUCK = """
WITH toks AS (SELECT doc_id, token AS w
              FROM documents d, unnest(str_split(d.text, ' ')) AS s(token)
              WHERE token <> ''),
v AS (SELECT w FROM (SELECT w, COUNT(*) AS cf FROM toks GROUP BY 1
                     ORDER BY cf DESC, w ASC LIMIT 20))
SELECT t.doc_id, COUNT(*) AS n_tokens,
  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM toks t LEFT JOIN v ON v.w = t.w
GROUP BY 1
"""

# Surprisal oracle: identical integer tf/cf/T, identical per-occurrence
# tf*ln(T/cf) tree cast to DECIMAL(28,12) BEFORE the per-doc sum
# (exact commutative addition — float sums are partition-order-
# dependent), single rounded double division.
_SURPRISAL_DUCK = """
WITH toks AS (SELECT doc_id, token AS w
              FROM documents d, unnest(str_split(d.text, ' ')) AS s(token)
              WHERE token <> ''),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
cf AS (SELECT w, COUNT(*) AS cf FROM toks GROUP BY 1),
t AS (SELECT CAST(SUM(cf) AS BIGINT) AS T FROM cf)
SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
  ROUND(CAST(SUM(CAST(CAST(tf.tf AS DOUBLE)
                      * ln(CAST(t.T AS DOUBLE) / CAST(cf.cf AS DOUBLE))
                 AS DECIMAL(28,12))) AS DOUBLE)
        / CAST(SUM(tf.tf) AS DOUBLE), 6) AS mean_surprisal
FROM tf JOIN cf USING (w), t
GROUP BY 1
"""


def _ivf_duck(k: int = 8, n_iters: int = 2, n_probe: int = 2, topk: int = 3) -> str:
    """IVF oracle: the same deterministic k-means (md5-seeded init, fixed
    Lloyd rounds, decimal-exact sums, cid tiebreaks) unrolled as CTEs."""
    parts = [
        "idx AS (SELECT unnest(range(1, 65)) AS i)",
        """e AS (SELECT vec_id, CAST(i.i AS INT) AS i,
             CAST(embedding[CAST(i.i AS INT)] AS DOUBLE) AS v
      FROM embeddings, idx i)""",
        f"""seeds AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id,
               ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
        FROM embeddings) WHERE cid < {k})""",
        "cent0 AS (SELECT s.cid, e.i, e.v AS c FROM e JOIN seeds s USING (vec_id))",
    ]
    for it in range(1, n_iters + 1):
        prev = f"cent{it - 1}"
        parts.append(
            f"""d{it} AS (SELECT e.vec_id, c.cid,
               SUM(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(38,18))) AS dist2
        FROM e JOIN {prev} c ON c.i = e.i GROUP BY 1, 2)"""
        )
        parts.append(
            f"""a{it} AS (SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
          FROM d{it}) WHERE rn = 1)"""
        )
        parts.append(
            f"""cent{it} AS (SELECT a.cid, e.i,
               CAST(SUM(CAST(e.v AS DECIMAL(38,18))) AS DOUBLE) / COUNT(*) AS c
        FROM e JOIN a{it} a USING (vec_id) GROUP BY 1, 2)"""
        )
    final = f"cent{n_iters}"
    parts += [
        f"""dinv AS (SELECT e.vec_id, c.cid,
             SUM(CAST((e.v - c.c) * (e.v - c.c) AS DECIMAL(38,18))) AS dist2
      FROM e JOIN {final} c ON c.i = e.i GROUP BY 1, 2)""",
        """inv AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM dinv) WHERE rn = 1)""",
        "qe AS (SELECT vec_id AS qid, i, v FROM e WHERE vec_id < 5)",
        f"""qd AS (SELECT qe.qid, c.cid,
             SUM(CAST((qe.v - c.c) * (qe.v - c.c) AS DECIMAL(38,18))) AS dist2
      FROM qe JOIN {final} c ON c.i = qe.i GROUP BY 1, 2)""",
        f"""probes AS (SELECT qid, cid FROM (
        SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY dist2, cid) AS rn
        FROM qd) WHERE rn <= {n_probe})""",
        """cands AS (SELECT DISTINCT p.qid, inv.vec_id
      FROM inv JOIN probes p USING (cid) WHERE inv.vec_id <> p.qid)""",
        "q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5)",
        """norms AS (
      SELECT e2.vec_id,
             CAST(SUM(CAST(CAST(e2.embedding[CAST(idx.i AS INT)] AS DOUBLE)
                           * CAST(e2.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nrm2
      FROM embeddings e2 CROSS JOIN idx GROUP BY e2.vec_id)""",
        """dots AS (
      SELECT c.qid, c.vec_id,
             CAST(SUM(CAST(CAST(q.qe[CAST(idx.i AS INT)] AS DOUBLE)
                           * CAST(e2.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
      FROM cands c
      JOIN embeddings e2 ON e2.vec_id = c.vec_id
      JOIN q ON q.qid = c.qid
      CROSS JOIN idx
      GROUP BY c.qid, c.vec_id)""",
        """scored AS (
      SELECT d.qid, d.vec_id,
             ROUND(d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)), 6) AS cosine,
             ROW_NUMBER() OVER (PARTITION BY d.qid
                                ORDER BY d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)) DESC, d.vec_id) AS rn
      FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nv ON nv.vec_id = d.vec_id)""",
    ]
    joined = ",\n".join(parts)
    return f"WITH {joined}\nSELECT qid, vec_id, cosine, rn AS nn_rank FROM scored WHERE rn <= {topk}"


_EMB_NEARDUP_DUCK = f"""
WITH {_HYPERPLANES_DUCK},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
idx AS (SELECT unnest(range(1, 65)) AS i),
norms AS (
  SELECT e2.vec_id,
         CAST(SUM(CAST(CAST(e2.embedding[CAST(idx.i AS INT)] AS DOUBLE)
                       * CAST(e2.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nrm2
  FROM embeddings e2 CROSS JOIN idx GROUP BY e2.vec_id),
pdots AS (
  SELECT c.id_a, c.id_b,
         CAST(SUM(CAST(CAST(ea.embedding[CAST(idx.i AS INT)] AS DOUBLE)
                       * CAST(eb.embedding[CAST(idx.i AS INT)] AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
  CROSS JOIN idx
  GROUP BY c.id_a, c.id_b)
SELECT d.id_a, d.id_b,
       ROUND(d.dot / (sqrt(na.nrm2) * sqrt(nb.nrm2)), 6) AS cosine
FROM pdots d JOIN norms na ON na.vec_id = d.id_a JOIN norms nb ON nb.vec_id = d.id_b
WHERE ROUND(d.dot / (sqrt(na.nrm2) * sqrt(nb.nrm2)), 6) >= 0.4
"""


_MULTIMODAL_DUCK = """
SELECT doc_id AS media_id, 'image' AS kind,
       CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
       ROUND(CAST('0x' || substr(md5(text), 1, 2) AS INT) / 255.0, 6) AS f0,
       ROUND(CAST('0x' || substr(md5(text), 3, 2) AS INT) / 255.0, 6) AS f1,
       ROUND(CAST('0x' || substr(md5(text), 5, 2) AS INT) / 255.0, 6) AS f2,
       ROUND(CAST('0x' || substr(md5(text), 7, 2) AS INT) / 255.0, 6) AS f3,
       ROUND(CAST('0x' || substr(md5(text), 9, 2) AS INT) / 255.0, 6) AS f4,
       ROUND(CAST('0x' || substr(md5(text), 11, 2) AS INT) / 255.0, 6) AS f5,
       ROUND(CAST('0x' || substr(md5(text), 13, 2) AS INT) / 255.0, 6) AS f6,
       ROUND(CAST('0x' || substr(md5(text), 15, 2) AS INT) / 255.0, 6) AS f7
FROM documents WHERE doc_id < 500
"""


# ---------------------------------------------------------------------------
# lib_* oracles: full pipeline per-sink counts + template clustering, both
# over COMMITTED parquet fixtures (fixtures/*.parquet) so DuckDB reads the
# identical bytes Spark does. Regex tables are imported from the library
# (the _template_mining_duck precedent); the SQL itself is authored
# independently of the Spark plan.
# ---------------------------------------------------------------------------


def _pii_mask_sql(expr: str) -> str:
    for _name, pat, mask in _PII_PATTERNS_ORACLE:
        pat_sql = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat_sql}', '{mask}', 'g')"
    return expr


def _lib_pipeline_duck() -> str:
    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE

    # parse_keyvalue 'level' extraction: one regex, strip quotes, ''→NULL
    case_sql = _ROUTING_CASE_ORACLE  # first-match-wins CASE, frozen literal
    return f"""
WITH t AS (SELECT * FROM read_parquet('{TRANSCRIPTS_FIXTURE}')),
p AS (
  SELECT *, regexp_extract(text, '(?:^|\\s)level=("[^"]*"|\\S+)', 1) AS _v FROM t
),
parsed AS (
  SELECT *,
         nullif(CASE WHEN _v LIKE '"%"' AND length(_v) >= 2
                     THEN substr(_v, 2, length(_v) - 2) ELSE _v END, '') AS parsed_level,
         {_pii_mask_sql('text')} AS _masked
  FROM p
),
enriched AS (
  SELECT *,
         CASE tool WHEN 'search' THEN 'search' WHEN 'browser' THEN 'web'
              WHEN 'python' THEN 'compute' WHEN 'calculator' THEN 'compute'
              ELSE 'unknown' END AS tool_category,
         (_masked <> text) AS has_pii
  FROM parsed
),
routed AS (SELECT *, {case_sql} AS sink FROM enriched),
agg AS (
  SELECT sink, conv_id, tool, date_trunc('hour', ts) AS bucket_start, COUNT(*) AS n
  FROM routed GROUP BY 1, 2, 3, 4
)
SELECT sink, CAST(SUM(n) AS BIGINT) AS turns, COUNT(*) AS groups
FROM agg GROUP BY sink
"""


def _marshal_sink_duck() -> str:
    """Oracle for the S6m sink-boundary marshal stage: the full routed
    pipeline (parse → mask → enrich → route, same frozen-literal CTEs as
    _lib_pipeline_duck) composed with the sumo_ic line rendering
    (_SUMO_DUCK's date/json logic) over the 'errors' sink only — so the
    check covers marshal-at-the-sink END TO END, not just the marshal op
    in isolation."""
    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE

    case_sql = _ROUTING_CASE_ORACLE
    return f"""
WITH t AS (SELECT * FROM read_parquet('{TRANSCRIPTS_FIXTURE}')),
p AS (
  SELECT *,
         regexp_extract(text, '(?:^|\\s)level=("[^"]*"|\\S+)', 1) AS _v,
         regexp_extract(text, '(?:^|\\s)service=("[^"]*"|\\S+)', 1) AS _sv
  FROM t
),
parsed AS (
  SELECT *,
         nullif(CASE WHEN _v LIKE '"%"' AND length(_v) >= 2
                     THEN substr(_v, 2, length(_v) - 2) ELSE _v END, '') AS parsed_level,
         nullif(CASE WHEN _sv LIKE '"%"' AND length(_sv) >= 2
                     THEN substr(_sv, 2, length(_sv) - 2) ELSE _sv END, '') AS parsed_service,
         {_pii_mask_sql('text')} AS _masked
  FROM p
),
enriched AS (
  SELECT *,
         CASE tool WHEN 'search' THEN 'search' WHEN 'browser' THEN 'web'
              WHEN 'python' THEN 'compute' WHEN 'calculator' THEN 'compute'
              ELSE 'unknown' END AS tool_category,
         (_masked <> text) AS has_pii
  FROM parsed
),
routed AS (SELECT *, {case_sql} AS sink FROM enriched)
SELECT '{{"date": "' || strftime(ts, '%Y-%m-%d %H:%M:%S')
       || CASE WHEN extract(microsecond FROM ts) % 1000000 > 0
               THEN '.' || rtrim(lpad(CAST(extract(microsecond FROM ts) % 1000000 AS VARCHAR), 6, '0'), '0')
               ELSE '' END
       || ' +0000 UTC","sourceName":"errors","sourceHost":'
       || to_json(coalesce(parsed_service, 'unknown'))
       || ',"sourceCategory":' || to_json(coalesce(tool, 'unknown'))
       || ',"fields":' || to_json(struct_pack(tool_category := tool_category))
       || ',"message":' || to_json(struct_pack(conv_id := conv_id, log := _masked))
       || '}}' AS line
FROM routed WHERE sink = 'errors'
"""


def _lib_streaming_duck() -> str:
    """Per-sink routed counts of the streaming pipeline — identical route
    semantics to the batch oracle (the streaming machinery is checkpoint/
    trigger plumbing; the routed OUTPUT is plain SQL over the fixture)."""
    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE

    case_sql = _ROUTING_CASE_ORACLE
    return f"""
WITH t AS (SELECT * FROM read_parquet('{TRANSCRIPTS_FIXTURE}')),
p AS (
  SELECT *, regexp_extract(text, '(?:^|\\s)level=("[^"]*"|\\S+)', 1) AS _v FROM t
),
parsed AS (
  SELECT *,
         nullif(CASE WHEN _v LIKE '"%"' AND length(_v) >= 2
                     THEN substr(_v, 2, length(_v) - 2) ELSE _v END, '') AS parsed_level,
         {_pii_mask_sql('text')} AS _masked
  FROM p
),
enriched AS (
  SELECT *,
         CASE tool WHEN 'search' THEN 'search' WHEN 'browser' THEN 'web'
              WHEN 'python' THEN 'compute' WHEN 'calculator' THEN 'compute'
              ELSE 'unknown' END AS tool_category,
         (_masked <> text) AS has_pii
  FROM parsed
)
SELECT {case_sql} AS sink, COUNT(*) AS turns FROM enriched GROUP BY 1
"""


def _lib_clusters_duck(n_rounds: int = 8) -> str:
    """Independent DuckDB implementation of the two-pass clustering:
    mask → collapse placeholders → char trigrams → 12 md5 minhashes →
    4 first-token-guarded bands of 3 → connected components via UNROLLED
    min-label propagation (labels are template strings, not xxhash64 —
    components and min(template) representatives are labeling-invariant,
    so the output matches Spark's min-fingerprint labels exactly).
    n_rounds=8 bounds the component diameter in band-graph hops; fixture
    convergence is pinned by tests (n_rounds vs n_rounds-1 equality)."""
    from cardinalhq_otel_collector_spark.sources.fixtures import NEARDUP_FIXTURE

    mask_expr = "text"
    for pat, mask in _MASKS_ORACLE:
        mask_expr = f"regexp_replace({mask_expr}, '{pat.replace(chr(39), chr(39) * 2)}', '{mask}', 'g')"
    hashes = ", ".join(f"MIN(md5('{s}|' || g)) AS h{s}" for s in range(12))
    bands = " UNION ALL ".join(
        "SELECT template, concat_ws('#', tok0, '%d', h%d, h%d, h%d) AS band FROM keyed"
        % (b, 3 * b, 3 * b + 1, 3 * b + 2)
        for b in range(4)
    )
    rounds, prev = [], "l0"
    for k in range(1, n_rounds + 1):
        rounds.append(
            f"bmin{k} AS (SELECT b.band, MIN(l.label) AS bmin\n"
            f"            FROM bands b JOIN {prev} l USING(template) GROUP BY b.band),\n"
            f"l{k} AS (SELECT b.template, MIN(bm.bmin) AS label\n"
            f"         FROM bands b JOIN bmin{k} bm USING(band) GROUP BY b.template)"
        )
        prev = f"l{k}"
    rounds_sql = ",\n".join(rounds)
    return f"""
WITH t AS (SELECT * FROM read_parquet('{NEARDUP_FIXTURE}')),
masked AS (SELECT {mask_expr} AS template FROM t WHERE text IS NOT NULL),
counts AS (SELECT template, COUNT(*) AS n FROM masked GROUP BY template),
tpl AS (SELECT template,
               regexp_replace(template, '<(num|hex|id)>', '§', 'g') AS _sim
        FROM counts),
grams AS (
  SELECT DISTINCT template, substr(_sim, CAST(pos AS INT), 3) AS g
  FROM tpl, LATERAL unnest(range(1, greatest(length(_sim) - 2, 1) + 1)) AS r(pos)
),
sig AS (SELECT template, {hashes} FROM grams GROUP BY template),
keyed AS (
  SELECT s.*, string_split(t._sim, ' ')[1] AS tok0
  FROM sig s JOIN tpl t USING(template)
),
bands AS ({bands}),
l0 AS (SELECT DISTINCT template, template AS label FROM bands),
{rounds_sql}
SELECT MIN(c.template) AS rep_template,
       COUNT(*) AS n_templates, CAST(SUM(n.n) AS BIGINT) AS n_rows
FROM {prev} c JOIN counts n USING(template)
GROUP BY c.label
"""


def q_events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user cardinality via the KMV bottom-k
    sketch (k=64) — O(k) state per group instead of shuffling every
    distinct value; exact below k, (k-1)*2^52 div h_k above. All
    integer arithmetic over a 52-bit md5 hash space, so the DuckDB
    oracle reproduces the estimate bit-for-bit."""
    from cardinalhq_otel_collector_spark.operators.sketch import kmv_distinct

    ev = _read(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_distinct(ev, "user_id", ["event_type"], k=64)


def q_doc_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-Jaccard >= 0.9 document pairs via prefix filtering
    (PPJoin-style rarest-first prefixes + integer verification) — the
    no-false-negatives counterpart to the MinHash LSH ladder; emitted
    sizes are exact integers."""
    from cardinalhq_otel_collector_spark.operators.dedup import prefix_jaccard_pairs

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return prefix_jaccard_pairs(docs, tau_num=9, tau_den=10)


def q_events_span_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user merged busy intervals (gaps-and-islands union of
    [ts, ts + floor(value)*200s] spans): one Exchange+Sort, both
    windows share it; integer-microsecond arithmetic end to end."""
    from cardinalhq_otel_collector_spark.operators.spans import merge_intervals

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    start = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        start.alias("start_us"),
        (start + F.floor("value").cast("long") * F.lit(200_000_000)).alias("end_us"),
    )
    return merge_intervals(iv, ["user_id"], "start_us", "end_us", "event_id")


def q_events_locf_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user hourly resample with last-observation-carried-forward
    fill (PromQL-style step alignment): per-series grid from its own
    [first, last] hour, per-step last value by (ts, event_id), LOCF
    window forward — floor-integer values, engine-exact."""
    from cardinalhq_otel_collector_spark.operators.resample import locf_resample

    ev = _read(spark, sf_dir, "events", spread=True).select("user_id", "ts", "value", "event_id")
    return locf_resample(
        ev, ["user_id"], "ts", "value", step_seconds=3600, order_tiebreak="event_id"
    )


def q_events_cms_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch per-key frequency estimates (4x256 grid over
    event_type:user_id keys): constant-size additive counters instead
    of a per-key shuffle — map-side combine carries at most 1024 cells
    per task at any scale. Estimates are >= true counts; the oracle
    rebuilds the identical md5 grid."""
    from cardinalhq_otel_collector_spark.operators.cms import cms_counts

    ev = _read(spark, sf_dir, "events", spread=True).select(
        F.concat(
            F.col("event_type"), F.lit(":"), F.col("user_id").cast("string")
        ).alias("k")
    )
    return cms_counts(ev, "k", depth=4, width=256)


def q_events_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact time-weighted integral of each user's value series
    (half-open LOCF steps, floored-integer values x µs gaps — the
    billing/SLO primitive). Emits exact integer numerator/denominator,
    no float division anywhere."""
    from cardinalhq_otel_collector_spark.operators.aggregate import time_weighted

    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "value", "event_id")
    return time_weighted(ev, ["user_id"], "ts", "value", "event_id")


def q_doc_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture materialization: per-source integer repeat
    weights (srcN -> N mod 4; multiples of 4 dropped), each copy dealt
    onto one of 64 md5 hash shards — the deterministic zero-shuffle
    alternative to a global random sort."""
    from cardinalhq_otel_collector_spark.operators.mixture import materialize_mixture

    docs = _read(spark, sf_dir, "documents").select("doc_id", "source")
    weights = {f"src{i}": i % 4 for i in range(20)}
    return materialize_mixture(docs, weights, shards=64)


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outliers: |value - median| > 4.4478 * MAD (the
    3-sigma cut under the 1.4826 normal-consistency factor) — the
    heavy-tail-proof complement to rolling z-scores; medians follow the
    exact-percentile round-6 discipline so both engines compare
    identical doubles."""
    from cardinalhq_otel_collector_spark.operators.aggregate import mad_outliers

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return mad_outliers(ev, "value", ["event_type"]).select(
        "event_id", "event_type", "value", "med", "mad"
    )


def q_events_exp_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTLP exponential histogram (base-2, scale 0) of event values per
    (type, day): bucket index from a comparison ladder over EXACT
    power-of-two double literals — no log2(), whose last-ulp libm
    behavior would put boundary values in different buckets per
    engine."""
    from cardinalhq_otel_collector_spark.operators.histogram import exp_histogram

    ev = _read(spark, sf_dir, "events").select("event_type", "ts", "value")
    return exp_histogram(
        ev, ["event_type"], "value", min_exp=-7, max_exp=9, interval="1 day"
    ).select("event_type", "bucket_start", "bucket_idx", "bucket_count")


def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day × type ROLLUP grouping sets in one expand+agg pass (counts +
    decimal-accumulated value totals; grouping_id disambiguates
    subtotal NULLs from data NULLs)."""
    from cardinalhq_otel_collector_spark.operators.grouping import rollup_counts

    ev = _read(spark, sf_dir, "events").select(
        F.date_trunc("day", F.col("ts")).alias("day"), "event_type", "value"
    )
    return rollup_counts(ev, ["day", "event_type"], "value")


def q_events_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast Bloom pre-filter (k=3, m=1024) of the events stream by
    a selective user dimension (>= 18 purchases): zero false negatives,
    deterministic md5 bit positions, the big side never shuffles — the
    explicit version of AQE's runtime bloom injection."""
    from cardinalhq_otel_collector_spark.operators.bloomjoin import bloom_semi_filter

    ev = _read(spark, sf_dir, "events")
    premium = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") >= 18)
        .select("user_id")
    )
    big = ev.select("event_id", "user_id", "event_type")
    return bloom_semi_filter(big, premium, "user_id", k=3, m=1024)


def q_events_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnostics for (event_type, user_id): top-10 keys by
    count with exact integer ppm share and the ceil(n/target) salt
    factor — the pre-flight profile before any big keyed shuffle."""
    from cardinalhq_otel_collector_spark.operators.profile import skew_report

    ev = _read(spark, sf_dir, "events").select("event_type", "user_id")
    return skew_report(ev, ["event_type", "user_id"], target_rows_per_task=10, top=10)


def q_events_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: two deterministic versions of the events
    table (old drops id%50==0; new drops id%11==0 and bumps value on
    id%7==0) classified added/removed/changed by a null-safe full
    outer join on the key — unchanged keys are dropped, the output is
    the replayable delta."""
    from cardinalhq_otel_collector_spark.operators.diff import table_diff

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    old = ev.where(F.pmod(F.col("event_id"), F.lit(50)) != 0)
    new = ev.where(F.pmod(F.col("event_id"), F.lit(11)) != 0).withColumn(
        "value",
        F.when(
            F.pmod(F.col("event_id"), F.lit(7)) == 0, F.col("value") + F.lit(1.0)
        ).otherwise(F.col("value")),
    )
    return table_diff(old, new, ["event_id"], ["value"])


def q_events_reply_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reply-latency summaries per role transition over the
    transcript-shaped stream (conv = user, role from event-id parity):
    exact integer µs gaps, mean as the pinned int/int double division —
    'how fast does the assistant answer' as data."""
    from cardinalhq_otel_collector_spark.operators.sessionize import (
        reply_latency_stats,
    )

    ev = _read(spark, sf_dir, "events").select(
        F.col("user_id").alias("conv_id"),
        "ts",
        "event_id",
        F.when(F.pmod(F.col("event_id"), F.lit(2)) == 0, "user")
        .otherwise("assistant")
        .alias("role"),
    )
    return reply_latency_stats(ev, "conv_id", "ts", "role", "event_id")


def q_conv_trim_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window trimming: per conversation keep the longest
    suffix of turns whose token total fits a 300-token budget
    (greedy-from-the-end reverse cumulative sum — the serving-side rule
    before inference). Both windows share one conv partitioning."""
    from cardinalhq_otel_collector_spark.operators.context import trim_to_budget

    from pyspark.sql import Window as W

    ev = _read(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    turns = ev.select(
        F.col("user_id").alias("conv_id"),
        (F.row_number().over(w).cast("long") - 1).alias("turn_idx"),
        (F.pmod(F.col("event_id"), F.lit(100)) + 1).alias("token_n"),
    )
    return trim_to_budget(turns, "conv_id", "turn_idx", "token_n", 300)


def q_events_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type equal-frequency value deciles (ANSI NTILE, total
    (value, event_id) ordering so assignments — not just bucket sizes —
    are deterministic)."""
    from cardinalhq_otel_collector_spark.operators.grouping import ntile_buckets

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return ntile_buckets(ev, "value", ["event_type"], k=10, tiebreak_col="event_id").select(
        "event_id", "event_type", "value", F.col("bucket").cast("long").alias("bucket")
    )


_HQ_BOUNDS = [10.0, 50.0, 100.0, 250.0]


def q_events_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style histogram_quantile(0.95) over explicit-bounds
    bucket counts per event type: exact integer rank crossing + one
    fixed IEEE interpolation tree, overflow clamped to the last finite
    bound (the PromQL rule)."""
    from cardinalhq_otel_collector_spark.operators.histogram import (
        bucket_index,
        histogram_quantile,
    )

    ev = _read(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            bucket_index(F.col("value"), _HQ_BOUNDS).cast("int").alias("bucket_idx"),
        )
        .groupBy("event_type", "bucket_idx")
        .agg(F.count(F.lit(1)).alias("bucket_count"))
    )
    return histogram_quantile(hist, ["event_type"], _HQ_BOUNDS, 95, 100)


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift terms between two deterministic
    snapshots (even vs odd event ids) over the shared histogram bounds —
    integer Laplace-smoothed counts into one fixed ln tree, round-6."""
    from cardinalhq_otel_collector_spark.operators.profile import psi_drift

    ev = _read(spark, sf_dir, "events").select("event_id", "value")
    old = ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    new = ev.where(F.pmod(F.col("event_id"), F.lit(2)) == 1)
    return psi_drift(old, new, "value", _HQ_BOUNDS)


def q_events_changes_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries delta compression: keep the first row per series plus
    rows whose floored value differs from the previous observation —
    LOCF replay of the kept rows reproduces every step exactly."""
    from cardinalhq_otel_collector_spark.operators.resample import changes_only

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    return changes_only(ev, ["user_id"], "ts", "value", "event_id").select(
        "event_id", "user_id", "value_floor"
    )


def q_events_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order key over (user_id, event_id mod 2^16) — the
    locality-preserving sort key behind OPTIMIZE ZORDER file layout;
    pure engine-exact bit interleaving."""
    from cardinalhq_otel_collector_spark.functions import z_order_key

    ev = _read(spark, sf_dir, "events").select("event_id", "user_id")
    return ev.select(
        "event_id",
        z_order_key(
            F.col("user_id"), F.pmod(F.col("event_id"), F.lit(65536)), bits=16
        ).alias("z"),
    )


def q_doc_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-overlap matrix: exact char-12-gram Jaccard between every
    SOURCE pair (vocab-sized join, corpus scanned once) — the
    data-governance 'how much of A is already in B' view."""
    from cardinalhq_otel_collector_spark.operators.dedup import source_overlap

    docs = _read(spark, sf_dir, "documents").select("source", "text")
    return source_overlap(docs)


def q_events_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types over user baskets —
    co-occurrence counts plus exact integer ppm lift (no float
    probabilities)."""
    from cardinalhq_otel_collector_spark.operators.sessionize import basket_lift

    ev = _read(spark, sf_dir, "events").select("user_id", "event_type")
    return basket_lift(ev, "user_id", "event_type")


def q_events_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-based value scaling per event type (ANSI percent_rank —
    exact int/int double, peers share ranks so the output is
    deterministic under any physical order)."""
    from cardinalhq_otel_collector_spark.operators.grouping import percent_rank_scale

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return percent_rank_scale(ev, "value", ["event_type"])


def q_events_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of each user's event-type sequence —
    consecutive equal states collapse to (run_idx, state, run_len,
    first/last id) rows; the state-machine compression for 'how long
    did it stay in state X'."""
    from cardinalhq_otel_collector_spark.operators.sessionize import run_length_encode

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return run_length_encode(ev, ["user_id"], "event_type", "ts", "event_id")


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping-priority) adapted to the testdata schema:
    BUILDING customers' pre-cutoff orders with post-cutoff line items,
    top-10 by decimal-accumulated revenue. DataFrame-API joins: the
    filtered customer dim broadcasts; the orders-lineitem join shuffles
    on the orderkey only. Revenue accumulates in DECIMAL(18,6) so the
    sort key (and the values) are bit-stable under any partitioning."""
    cust = (
        _read(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _read(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    items = _read(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    out = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(items, items.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    return out.orderBy(
        F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
    ).limit(10)


def q_events_kmv_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day distinct-user estimate per day from MERGED
    per-day KMV sketches (the WAU shape) — demonstrates the sketch
    union property that makes KMV the distributed-rollup choice; the
    merge is a broadcast day-grid range join, never a rescan."""
    from cardinalhq_otel_collector_spark.operators.sketch import kmv_rolling_distinct

    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    return kmv_rolling_distinct(ev, "user_id", "ts", k=64, window_days=7)


def q_events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k=3) over the quasi-identifier triple
    (event_type, 50-wide value band, day): every combination held by
    fewer than 3 rows — exactly what a privacy-safe release must
    suppress or generalize. One map-side-combined aggregate."""
    from cardinalhq_otel_collector_spark.operators.validate import (
        k_anonymity_violations,
    )

    ev = _read(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") / 50).cast("long").alias("band"),
        F.date_trunc("day", F.col("ts")).alias("d"),
    )
    return k_anonymity_violations(ev, ["event_type", "band", "d"], k=3)


def q_events_coverage_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-completeness report: per user, every 6-hour bucket between
    their first and last event with NO data (grid minus observed via a
    left anti join on the shared key)."""
    from cardinalhq_otel_collector_spark.operators.validate import coverage_gaps

    ev = _read(spark, sf_dir, "events").select("user_id", "ts")
    return coverage_gaps(ev, ["user_id"], "ts", step_seconds=21600)


def q_events_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement over two deterministic label columns
    (annotator B flips every 10th event to 'view'): Cohen's kappa as
    exact integer numerator/denominator plus a truncating-division ppm
    rendering — the label-quality gate as data."""
    from cardinalhq_otel_collector_spark.operators.validate import cohen_kappa

    ev = _read(spark, sf_dir, "events").select(
        F.col("event_type").alias("a"),
        F.when(F.pmod(F.col("event_id"), F.lit(10)) == 0, F.lit("view"))
        .otherwise(F.col("event_type"))
        .alias("b"),
    )
    return cohen_kappa(ev, "a", "b")


def q_orders_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orders whose (deterministically
    corrupted — +1e6 on every 97th orderkey) customer key has no
    parent row; one LEFT ANTI join, parent side broadcastable."""
    from cardinalhq_otel_collector_spark.operators.validate import fk_violations

    orders = _read(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(
            F.pmod(F.col("o_orderkey"), F.lit(97)) == 0,
            F.col("o_custkey") + F.lit(1_000_000),
        )
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
    )
    cust = _read(spark, sf_dir, "customer").select("c_custkey")
    return fk_violations(orders, cust, ["o_custkey"], ["c_custkey"])


def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-week seasonality grid: per (day-of-week, hour) cell,
    count + exact interpolated median value — the baseline behind
    'is this Tuesday 3pm normal'."""
    from cardinalhq_otel_collector_spark.operators.aggregate import (
        seasonality_profile,
    )

    ev = _read(spark, sf_dir, "events").select("ts", "value")
    return seasonality_profile(ev, "ts", "value")


def q_doc_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 documents by BM25 for a fixed term list — the lexical
    retrieval baseline beside the embedding ANN ladder; integer term
    frequencies in one aggregate, corpus stats broadcast, one fixed
    IEEE score tree, Lucene non-negative idf."""
    from cardinalhq_otel_collector_spark.operators.textstats import bm25_topk

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, _BM25_TERMS, topk=20)


def q_doc_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic contrastive negatives: 3 per document via the
    md5 bucket ring (bucket representative = min id) — no RNG, no
    global index, corpus never shuffles."""
    from cardinalhq_otel_collector_spark.operators.sampling import negative_samples

    docs = _read(spark, sf_dir, "documents").select("doc_id")
    return negative_samples(docs, "doc_id", k=3, buckets=64)


def q_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the banded hyperplane LSH against exact brute-force
    cosine — the acceptance metric every ANN index ships with, as an
    oracle-checked query (the oracle composes the two independent ANN
    oracles and counts overlap)."""
    from cardinalhq_otel_collector_spark.operators.similarity import (
        ann_recall,
        brute_force_topk,
        lsh_topk,
    )

    emb = _read(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(q, emb, k=3).select("qid", "vec_id")
    approx = lsh_topk(q, emb, k=3, bits=4, n_bands=2).select("qid", "vec_id")
    return ann_recall(exact, approx)


def q_doc_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc out-of-vocabulary counts against the corpus top-20
    vocabulary (frequency DESC, token ASC unique cut, broadcast back)
    — the '<unk> fallout at this vocab size' tokenizer-prep metric."""
    from cardinalhq_otel_collector_spark.operators.textstats import oov_rate

    docs = _read(spark, sf_dir, "documents").select("doc_id", "text")
    return oov_rate(docs, vocab_size=20)


def q_doc_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean unigram surprisal
    against the corpus MLE — decimal-accumulated so the sum is
    partition-order-independent; the text-quality filter's cheap
    stand-in for an LM."""
    from cardinalhq_otel_collector_spark.operators.textstats import unigram_surprisal

    docs = _read(spark, sf_dir, "documents", spread=True).select("doc_id", "text")
    return unigram_surprisal(docs)


def q_doc_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID evaluation: confusion matrix of the n-gram-marker
    classifier's guesses against the documents table's ground-truth
    lang column — (truth, pred, n) integer cells; the oracle composes
    the existing independent lang-ID oracle with the truth join."""
    from cardinalhq_otel_collector_spark.operators.textstats import lang_id
    from cardinalhq_otel_collector_spark.operators.validate import confusion_matrix

    docs = _read(spark, sf_dir, "documents")
    pred = lang_id(docs).select("doc_id", "lang_guess")
    joined = docs.select("doc_id", "lang").join(pred, "doc_id")
    return confusion_matrix(joined, "lang", "lang_guess")


def q_events_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-3 preceding event types for every error event ('what
    happened just before') — frame-ordered collect_list, joined to a
    deterministic context string; the triage primitive."""
    from cardinalhq_otel_collector_spark.operators.context import context_window

    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    out = context_window(ev, ["user_id"], "ts", "event_id", "event_type", k=3)
    return out.where(F.col("event_type") == "error").select(
        "event_id", "user_id", "context"
    )


def q_events_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user value trend: Theil-Sen median-of-pairwise-slopes
    (per hour) — outlier-immune drift detection; pairs form within each
    series, O(n_i²) per series by the estimator's nature."""
    from cardinalhq_otel_collector_spark.operators.anomaly import theil_sen_trend

    ev = _read(spark, sf_dir, "events", spread=True).select("user_id", "ts", "value", "event_id")
    return theil_sen_trend(ev, ["user_id"], "ts", "value", "event_id")


def q_events_state_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state accounting per (user, event_type): each
    observation's state holds until the successor, the gap attributed
    to the current state — exact integer µs dwell totals."""
    from cardinalhq_otel_collector_spark.operators.sessionize import state_dwell

    ev = _read(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return state_dwell(ev, ["user_id"], "event_type", "ts", "event_id")


def q_doc_ctfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinctive terms per source cluster via c-TF-IDF (the BERTopic
    labeling rule — cluster-level tf x ln(1 + N/df_clusters)); top-5
    per cluster on the unique (score DESC, token) cut."""
    from cardinalhq_otel_collector_spark.operators.textstats import ctfidf_topk

    docs = _read(spark, sf_dir, "documents").select("source", "text")
    return ctfidf_topk(docs, "source", topk=5)


def q_events_identity_stitch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identity stitching: each user links to two md5-derived device
    ids (namespace-offset +1e7); connected components over the edge
    set resolve the canonical identity — reusing the size-adaptive
    component engine behind template clustering. Oracle = recursive
    reachability fixpoint over the identical edges."""
    from cardinalhq_otel_collector_spark.operators.identity import stitch_identities

    users = _read(spark, sf_dir, "events").select("user_id").distinct()

    def dev(tag: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(tag), F.col("user_id").cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("long")
            % 200
            + F.lit(10_000_000)
        )

    edges = (
        users.select(F.col("user_id").alias("a"), dev("d1|").alias("b"))
        .unionByName(users.select(F.col("user_id").alias("a"), dev("d2|").alias("b")))
        .distinct()
    )
    return stitch_identities(edges, "a", "b")


def q_events_value_time_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Pearson correlation between value and event time —
    'is this gauge trending' as a classical statistic beside the
    Theil-Sen robust slope; DECIMAL-exact moment sums so the result is
    partition-order-independent (unlike F.corr)."""
    from cardinalhq_otel_collector_spark.operators.aggregate import pearson_corr

    ev = _read(spark, sf_dir, "events").select("user_id", "ts", "value")
    return pearson_corr(
        ev, ["user_id"], "value", F.unix_micros(F.col("ts").cast("timestamp"))
    )


def q_events_minmax_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type min-max feature scaling — broadcast bounds join, two
    single IEEE ops, engine-exact with no rounding discipline."""
    from cardinalhq_otel_collector_spark.operators.aggregate import minmax_scale

    ev = _read(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return minmax_scale(ev, "value", ["event_type"])


def q_events_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index over each type's top-50 values — the heavy-tail
    detector that says when means mislead and skew mitigation is
    mandatory; decimal-summed ln terms, round-6 alpha."""
    from cardinalhq_otel_collector_spark.operators.aggregate import hill_tail_index

    ev = _read(spark, sf_dir, "events").select("event_type", "value")
    return hill_tail_index(ev, "value", ["event_type"], k=50)


def q_events_ab_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test between the even/odd user-id variants on
    the per-event purchase rate — exact integer counts into one fixed
    IEEE tree; the experimentation readout as an oracle-checked
    query."""
    from cardinalhq_otel_collector_spark.operators.aggregate import (
        two_proportion_ztest,
    )

    ev = _read(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"),
        (F.col("event_type") == "purchase").alias("converted"),
    )
    return two_proportion_ztest(ev, "variant", "converted")


def q_events_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between event_type and the even/odd user-id
    bucket — the 'does this attribute predict that label' primitive;
    exact integer cells, decimal-summed terms, round-6 nats."""
    from cardinalhq_otel_collector_spark.operators.aggregate import (
        mutual_information,
    )

    ev = _read(spark, sf_dir, "events").select(
        "event_type", F.pmod(F.col("user_id"), F.lit(2)).alias("bucket")
    )
    return mutual_information(ev, "event_type", "bucket")


def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Gini coefficient of the user-count distribution —
    load imbalance as one FULLY integer-exact number (ppm via integer
    division); the summary beside skew_report's top-k detail."""
    from cardinalhq_otel_collector_spark.operators.profile import gini_coefficient

    ev = _read(spark, sf_dir, "events").select("event_type", "user_id")
    return gini_coefficient(ev, ["user_id"], ["event_type"])


def q_doc_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid-search federation: reciprocal-rank fusion of the BM25
    top-20 with a length-prior top-20 — the zero-tuning combiner;
    explicit two-term score tree, full outer join on the doc id (both
    inputs top-k-sized, the windows run over ≤20 rows)."""
    from pyspark.sql import Window as W

    from cardinalhq_otel_collector_spark.operators.similarity import rrf_fuse
    from cardinalhq_otel_collector_spark.operators.textstats import bm25_topk

    docs = _read(spark, sf_dir, "documents")
    bm = bm25_topk(docs.select("doc_id", "text"), _BM25_TERMS, topk=20)
    wa = W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    a = bm.select("doc_id", F.row_number().over(wa).alias("rank"))
    longest = (
        docs.select("doc_id", "n_chars")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .limit(20)
    )
    wb = W.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    b = longest.select("doc_id", F.row_number().over(wb).alias("rank"))
    return rrf_fuse(a, b, "doc_id")


def q_events_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-variant purchase-rate Wilson score intervals — the
    small-n-honest CI beside the z-test readout; exact integer counts
    into one fixed tree (z = 1.96 as a shared literal), round-6."""
    from cardinalhq_otel_collector_spark.operators.aggregate import wilson_interval

    ev = _read(spark, sf_dir, "events").select(
        F.pmod(F.col("user_id"), F.lit(2)).alias("variant"),
        (F.col("event_type") == "purchase").alias("converted"),
    )
    return wilson_interval(ev, "variant", "converted")


_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "pipeline_route_agg": q_pipeline_route_agg,
    "route_fanout_counts": q_route_fanout_counts,
    "interval_agg": q_interval_agg,
    "cumulative_to_delta": q_cumulative_to_delta,
    "delta_to_cumulative": q_delta_to_cumulative,
    "delta_to_rate": q_delta_to_rate,
    "metric_start_time": q_metric_start_time,
    "interval_last": q_interval_last,
    "log_dedup": q_log_dedup,
    "probabilistic_sample": q_probabilistic_sample,
    "tail_sample": q_tail_sample,
    "group_by_conv": q_group_by_conv,
    "summary_split": q_summary_split,
    "enrich_lookup": q_enrich_lookup,
    "tpch_q1": q_tpch_q1,
    "join_chain": q_join_chain,
    "template_mining": q_template_mining,
    "sumo_marshal": q_sumo_marshal,
    "partition_keys": q_partition_keys,
    "unroll_tokens": q_unroll_tokens,
    "otlp_roundtrip": q_otlp_roundtrip,
    "otlp_proto_marshal": q_otlp_proto_marshal,
    "genai_normalize": q_genai_normalize,
    "latency_histogram": q_latency_histogram,
    "red_metrics": q_red_metrics,
    "agg_type_override": q_agg_type_override,
    "exceptions_rollup": q_exceptions_rollup,
    "round_robin": q_round_robin,
    "doc_token_count": q_doc_token_count,
    "doc_quality": q_doc_quality,
    "doc_lang_id": q_doc_lang_id,
    "doc_exact_dedup": q_doc_exact_dedup,
    "doc_ngram_jaccard": q_doc_ngram_jaccard,
    "doc_minhash_lsh": q_doc_minhash_lsh,
    "doc_simhash": q_doc_simhash,
    "doc_simhash_candidates": q_doc_simhash_candidates,
    "doc_decontaminate": q_doc_decontaminate,
    "events_asof_join": q_events_asof_join,
    "doc_quota_sample": q_doc_quota_sample,
    "doc_vocab": q_doc_vocab,
    "doc_repetition": q_doc_repetition,
    "events_sessionize": q_events_sessionize,
    "events_anomaly": q_events_anomaly,
    "doc_chunk": q_doc_chunk,
    "doc_neardup_dedup": q_doc_neardup_dedup,
    "doc_normalize": q_doc_normalize,
    "doc_pmi": q_doc_pmi,
    "events_rate_limit": q_events_rate_limit,
    "events_heavy_hitters": q_events_heavy_hitters,
    "events_session_stats": q_events_session_stats,
    "events_retention": q_events_retention,
    "doc_split_assign": q_doc_split_assign,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_tfidf_topk": q_doc_tfidf_topk,
    "events_percentiles": q_events_percentiles,
    "events_range_join": q_events_range_join,
    "events_funnel": q_events_funnel,
    "events_transitions": q_events_transitions,
    "part_edit_distance": q_part_edit_distance,
    "events_sliding_window": q_events_sliding_window,
    "events_new_users": q_events_new_users,
    "events_pivot": q_events_pivot,
    "doc_entropy": q_doc_entropy,
    "events_json_attrs": q_events_json_attrs,
    "events_interarrival": q_events_interarrival,
    "doc_weighted_sample": q_doc_weighted_sample,
    "events_alerts": q_events_alerts,
    "events_decimate": q_events_decimate,
    "events_paths": q_events_paths,
    "doc_remove_boilerplate": q_doc_remove_boilerplate,
    "transcripts_integrity": q_transcripts_integrity,
    "events_winsorize": q_events_winsorize,
    "events_scd2_enrich": q_events_scd2_enrich,
    "events_kmv_distinct": q_events_kmv_distinct,
    "doc_prefix_jaccard": q_doc_prefix_jaccard,
    "events_span_union": q_events_span_union,
    "events_locf_resample": q_events_locf_resample,
    "events_cms_counts": q_events_cms_counts,
    "events_twa": q_events_twa,
    "doc_mixture": q_doc_mixture,
    "events_mad_outliers": q_events_mad_outliers,
    "events_exp_histogram": q_events_exp_histogram,
    "events_rollup": q_events_rollup,
    "events_bloom_prefilter": q_events_bloom_prefilter,
    "events_skew_report": q_events_skew_report,
    "events_table_diff": q_events_table_diff,
    "events_reply_latency": q_events_reply_latency,
    "conv_trim_budget": q_conv_trim_budget,
    "events_ntile": q_events_ntile,
    "events_histogram_quantile": q_events_histogram_quantile,
    "events_psi_drift": q_events_psi_drift,
    "events_changes_only": q_events_changes_only,
    "events_zorder_key": q_events_zorder_key,
    "doc_source_overlap": q_doc_source_overlap,
    "events_basket_lift": q_events_basket_lift,
    "events_percent_rank": q_events_percent_rank,
    "events_rle": q_events_rle,
    "tpch_q3": q_tpch_q3,
    "events_kmv_rolling": q_events_kmv_rolling,
    "events_k_anonymity": q_events_k_anonymity,
    "events_coverage_gaps": q_events_coverage_gaps,
    "events_cohen_kappa": q_events_cohen_kappa,
    "orders_fk_orphans": q_orders_fk_orphans,
    "events_seasonality": q_events_seasonality,
    "doc_bm25": q_doc_bm25,
    "doc_negative_samples": q_doc_negative_samples,
    "ann_recall_eval": q_ann_recall_eval,
    "doc_surprisal": q_doc_surprisal,
    "doc_oov_rate": q_doc_oov_rate,
    "doc_lang_confusion": q_doc_lang_confusion,
    "events_error_context": q_events_error_context,
    "events_theil_sen": q_events_theil_sen,
    "events_state_dwell": q_events_state_dwell,
    "doc_ctfidf": q_doc_ctfidf,
    "events_identity_stitch": q_events_identity_stitch,
    "events_value_time_corr": q_events_value_time_corr,
    "events_minmax_scale": q_events_minmax_scale,
    "events_hill_tail": q_events_hill_tail,
    "events_ab_ztest": q_events_ab_ztest,
    "events_mutual_info": q_events_mutual_info,
    "events_gini": q_events_gini,
    "doc_rrf_fusion": q_doc_rrf_fusion,
    "events_wilson_ci": q_events_wilson_ci,
    "ann_cosine_topk": q_ann_cosine_topk,
    "emb_lsh_buckets": q_emb_lsh_buckets,
    "emb_hyperplane_buckets": q_emb_hyperplane_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "emb_cosine_neardup": q_emb_cosine_neardup,
    "multimodal_decode": q_multimodal_decode,
}


def _oracles() -> dict[str, str]:
    return {
        "pipeline_route_agg": _PIPELINE_ROUTE_AGG_DUCK,
        "route_fanout_counts": _ROUTE_FANOUT_DUCK,
        "interval_agg": _INTERVAL_AGG_DUCK,
        "cumulative_to_delta": _CUM_TO_DELTA_DUCK,
        "delta_to_cumulative": _DELTA_TO_CUM_DUCK,
        "delta_to_rate": _DELTA_TO_RATE_DUCK,
        "metric_start_time": _START_TIME_DUCK,
        "interval_last": _INTERVAL_LAST_DUCK,
        "log_dedup": _LOG_DEDUP_DUCK,
        "probabilistic_sample": _PROB_SAMPLE_DUCK,
        "tail_sample": _TAIL_SAMPLE_DUCK,
        "group_by_conv": _GROUP_BY_CONV_DUCK,
        "summary_split": _SUMMARY_SPLIT_DUCK,
        "enrich_lookup": _ENRICH_DUCK,
        "tpch_q1": _TPCH_Q1_SQL,
        "join_chain": _JOIN_CHAIN_DUCK,
        "template_mining": _template_mining_duck(),
        "sumo_marshal": _SUMO_DUCK,
        "partition_keys": _PARTITION_KEY_DUCK,
        "unroll_tokens": _UNROLL_DUCK,
        "otlp_roundtrip": _OTLP_ROUNDTRIP_DUCK,
        "otlp_proto_marshal": _otlp_proto_duck(),
        "genai_normalize": _genai_duck(),
        "latency_histogram": _HISTOGRAM_DUCK,
        "red_metrics": _RED_DUCK,
        "agg_type_override": _AGG_OVERRIDE_DUCK,
        "exceptions_rollup": _EXCEPTIONS_DUCK,
        "round_robin": _ROUND_ROBIN_DUCK,
        "doc_token_count": _TOKEN_COUNT_DUCK,
        "doc_quality": _QUALITY_DUCK,
        "doc_lang_id": _lang_duck(),
        "doc_exact_dedup": _EXACT_DEDUP_DUCK,
        "doc_ngram_jaccard": _JACCARD_DUCK,
        "doc_minhash_lsh": _MINHASH_DUCK,
        "doc_simhash": _SIMHASH_DUCK,
        "doc_simhash_candidates": _SIMHASH_CAND_DUCK,
        "doc_decontaminate": _DECONTAMINATE_DUCK,
        "events_asof_join": _ASOF_DUCK,
        "doc_quota_sample": _QUOTA_SAMPLE_DUCK,
        "doc_vocab": _VOCAB_DUCK,
        "doc_repetition": _REPETITION_DUCK,
        "events_sessionize": _SESSIONIZE_DUCK,
        "events_anomaly": _ANOMALY_DUCK,
        "doc_chunk": _CHUNK_DUCK,
        "doc_neardup_dedup": _NEARDUP_DEDUP_DUCK,
        "doc_normalize": _NORMALIZE_DUCK,
        "doc_pmi": _PMI_DUCK,
        "events_rate_limit": _RATE_LIMIT_DUCK,
        "events_heavy_hitters": _HEAVY_HITTERS_DUCK,
        "events_session_stats": _SESSION_STATS_DUCK,
        "events_retention": _RETENTION_DUCK,
        "doc_split_assign": _SPLIT_ASSIGN_DUCK,
        "doc_pack_sequences": _PACK_DUCK,
        "doc_tfidf_topk": _TFIDF_DUCK,
        "events_percentiles": _PERCENTILES_DUCK,
        "events_range_join": _RANGE_JOIN_DUCK,
        "events_funnel": _FUNNEL_DUCK,
        "events_transitions": _TRANSITIONS_DUCK,
        "part_edit_distance": _EDIT_DISTANCE_DUCK,
        "events_sliding_window": _SLIDING_WINDOW_DUCK,
        "events_new_users": _NEW_USERS_DUCK,
        "events_pivot": _PIVOT_DUCK,
        "doc_entropy": _ENTROPY_DUCK,
        "events_json_attrs": _JSON_ATTRS_DUCK,
        "events_interarrival": _INTERARRIVAL_DUCK,
        "doc_weighted_sample": _WEIGHTED_SAMPLE_DUCK,
        "events_alerts": _ALERTS_DUCK,
        "events_decimate": _DECIMATE_DUCK,
        "events_paths": _PATHS_DUCK,
        "doc_remove_boilerplate": _BOILERPLATE_DUCK,
        "transcripts_integrity": _TRANSCRIPT_INTEGRITY_DUCK,
        "events_winsorize": _WINSORIZE_DUCK,
        "events_scd2_enrich": _SCD2_DUCK,
        "events_kmv_distinct": _KMV_DUCK,
        "doc_prefix_jaccard": _PREFIX_JACCARD_DUCK,
        "events_span_union": _SPAN_UNION_DUCK,
        "events_locf_resample": _LOCF_DUCK,
        "events_cms_counts": _CMS_DUCK,
        "events_twa": _TWA_DUCK,
        "doc_mixture": _MIXTURE_DUCK,
        "events_mad_outliers": _MAD_DUCK,
        "events_exp_histogram": _EXP_HIST_DUCK,
        "events_rollup": _ROLLUP_DUCK,
        "events_bloom_prefilter": _BLOOM_DUCK,
        "events_skew_report": _SKEW_DUCK,
        "events_table_diff": _TABLE_DIFF_DUCK,
        "events_reply_latency": _REPLY_LATENCY_DUCK,
        "conv_trim_budget": _TRIM_BUDGET_DUCK,
        "events_ntile": _NTILE_DUCK,
        "events_histogram_quantile": _HIST_QUANTILE_DUCK,
        "events_psi_drift": _PSI_DUCK,
        "events_changes_only": _CHANGES_ONLY_DUCK,
        "events_zorder_key": _ZORDER_DUCK,
        "doc_source_overlap": _SOURCE_OVERLAP_DUCK,
        "events_basket_lift": _BASKET_LIFT_DUCK,
        "events_percent_rank": _PERCENT_RANK_DUCK,
        "events_rle": _RLE_DUCK,
        "tpch_q3": _TPCH_Q3_DUCK,
        "events_kmv_rolling": _KMV_ROLLING_DUCK,
        "events_k_anonymity": _K_ANON_DUCK,
        "events_coverage_gaps": _COVERAGE_GAPS_DUCK,
        "events_cohen_kappa": _KAPPA_DUCK,
        "orders_fk_orphans": _FK_ORPHANS_DUCK,
        "events_seasonality": _SEASONALITY_DUCK,
        "doc_bm25": _BM25_DUCK,
        "doc_negative_samples": _NEG_SAMPLES_DUCK,
        "ann_recall_eval": _ANN_RECALL_DUCK,
        "doc_surprisal": _SURPRISAL_DUCK,
        "doc_oov_rate": _OOV_DUCK,
        "doc_lang_confusion": _LANG_CONFUSION_DUCK,
        "events_error_context": _ERROR_CONTEXT_DUCK,
        "events_theil_sen": _THEIL_SEN_DUCK,
        "events_state_dwell": _STATE_DWELL_DUCK,
        "doc_ctfidf": _CTFIDF_DUCK,
        "events_identity_stitch": _IDENTITY_STITCH_DUCK,
        "events_value_time_corr": _PEARSON_DUCK,
        "events_minmax_scale": _MINMAX_DUCK,
        "events_hill_tail": _HILL_DUCK,
        "events_ab_ztest": _ZTEST_DUCK,
        "events_mutual_info": _MI_DUCK,
        "events_gini": _GINI_DUCK,
        "doc_rrf_fusion": _RRF_DUCK,
        "events_wilson_ci": _WILSON_DUCK,
        "ann_cosine_topk": _ANN_DUCK,
        "emb_lsh_buckets": _EMB_BUCKET_DUCK,
        "emb_hyperplane_buckets": _HYPERPLANE_BUCKETS_DUCK,
        "ann_lsh_topk": _ANN_LSH_DUCK,
        "ann_ivf_topk": _ivf_duck(),
        "emb_cosine_neardup": _EMB_NEARDUP_DUCK,
        "multimodal_decode": _MULTIMODAL_DUCK,
        "lib_pipeline_e2e": _lib_pipeline_duck(),
        "lib_marshal_sink": _marshal_sink_duck(),
        "lib_template_clusters": _lib_clusters_duck(),
        "lib_streaming_pipeline": _lib_streaming_duck(),
        "lib_stateful_intervals": _lib_stateful_duck(),
        "lib_streaming_dedup": "SELECT event_id, user_id FROM events",
        # session_window merges touching windows: only a gap STRICTLY
        # greater than the gap parameter splits (same rule as batch
        # sessionize) — pinned by test_streaming_sessions_gap_boundary
        # stream-stream interval join: emitted inner matches over a fully
        # replayed source equal the batch range join, stated naively
        "lib_stream_stream_join": """
SELECT c.event_id, c.user_id, v.event_id AS view_event_id
FROM events c JOIN events v
  ON c.user_id = v.user_id
 AND c.event_type = 'click' AND v.event_type = 'view'
 AND epoch_us(v.ts) >= epoch_us(c.ts) - 600000000
 AND epoch_us(v.ts) <= epoch_us(c.ts) + 600000000
""",
        # the stateful streaming throttle replays time-split
        # microbatches, so its admitted set equals the BATCH rate_limit
        # — stated as the plain row_number cut over (user, day)
        "lib_streaming_rate_limit": """
WITH r AS (SELECT event_id, user_id,
             row_number() OVER (
               PARTITION BY user_id, (epoch_us(ts) // 1000000 // 86400)
               ORDER BY ts, event_id) AS rn
           FROM events)
SELECT event_id, user_id FROM r WHERE rn <= 2
""",
        # the stateful streaming gauge compression replays time-split
        # microbatches, so its emitted set equals the BATCH changes_only
        # — stated here as the plain lag / IS DISTINCT FROM query
        "lib_streaming_changes": """
WITH s AS (SELECT event_id, user_id, CAST(floor(value) AS BIGINT) AS v,
             lag(CAST(floor(value) AS BIGINT)) OVER w AS prev,
             row_number() OVER w AS rn
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT event_id, user_id, v AS value_floor
FROM s WHERE rn = 1 OR v IS DISTINCT FROM prev
""",
        "lib_streaming_sessions": """
WITH o AS (
  SELECT user_id, ts, event_id,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_us,
         epoch_us(ts) AS cur_us
  FROM events),
f AS (SELECT user_id, ts, event_id,
        CASE WHEN prev_us IS NULL OR cur_us - prev_us > 28800000000
             THEN 1 ELSE 0 END AS ns
      FROM o),
s AS (SELECT user_id, ts,
        SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid
      FROM f)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    }


# ---------------------------------------------------------------------------
# Library-backed queries — ALL fully oracle-backed now: the committed
# parquet fixtures let DuckDB reproduce the per-sink counts (batch AND
# streaming — the checkpoint/trigger machinery is not SQL, but its routed
# output is) and the cluster components (unrolled label propagation).
# ---------------------------------------------------------------------------


def _lib_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full staged pipeline (parse → fingerprint → redact → enrich → route →
    fan-out write → windowed aggregates → lineage) over the COMMITTED
    transcript fixture; returns per-sink counts (the north-rule aggregate
    shape). Reading the fixture file (instead of Spark-side datagen) lets
    the DuckDB oracle read the identical bytes — the per-sink counts are
    fully SQL-checkable (round-2 VERDICT item 3)."""
    import tempfile

    from cardinalhq_otel_collector_spark.plans.pipeline import AGG_TABLE, run_pipeline
    from cardinalhq_otel_collector_spark.sources.catalog import Catalog
    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE

    catalog = Catalog(spark, tempfile.mkdtemp(prefix="entry_wh_"))
    df = spark.read.parquet(TRANSCRIPTS_FIXTURE)
    run_pipeline(spark, df, catalog, run_id="entry")
    return (
        catalog.read(AGG_TABLE)
        .groupBy("sink")
        .agg(F.sum("n").alias("turns"), F.count(F.lit(1)).alias("groups"))
    )


def _lib_marshal_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6m sink-boundary marshal stage (exporter.go:48-66 marshal →
    partition → upload): the pipeline runs e2e over the COMMITTED fixture
    with marshal_sinks={'errors': 'sumo_ic'}, then the marshaled text
    files are read BACK from disk — the oracle reproduces the exact lines
    (routed CTE + sumo rendering) in DuckDB, so the byte shape is checked
    after the full write/read trip, not just in-plan."""
    import tempfile

    from cardinalhq_otel_collector_spark.config import PipelineConfig
    from cardinalhq_otel_collector_spark.datagen import routing_rules
    from cardinalhq_otel_collector_spark.plans.pipeline import run_pipeline
    from cardinalhq_otel_collector_spark.sources.catalog import Catalog
    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE

    catalog = Catalog(spark, tempfile.mkdtemp(prefix="entry_marshal_wh_"))
    cfg = PipelineConfig(
        rules=routing_rules(), marshal_sinks={"errors": "sumo_ic"}
    )
    df = spark.read.parquet(TRANSCRIPTS_FIXTURE)
    run_pipeline(spark, df, catalog, config=cfg, run_id="entry_marshal")
    return (
        spark.read.text(catalog.path("marshaled_errors"))
        .select(F.col("value").alias("line"))
    )


def _lib_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed two-pass clustering over the near-dup fixture. Output is
    cluster-id-agnostic — (representative template, template count, row
    count) per connected component — so the DuckDB oracle (an unrolled
    min-label propagation over the same band graph) can reproduce it
    without Spark's xxhash64."""
    from cardinalhq_otel_collector_spark.operators.fingerprint import (
        fingerprint_and_cluster,
    )
    from cardinalhq_otel_collector_spark.sources.fixtures import NEARDUP_FIXTURE

    df = fingerprint_and_cluster(spark.read.parquet(NEARDUP_FIXTURE))
    return (
        df.groupBy("cluster_id")
        .agg(
            F.min("template").alias("rep_template"),
            F.countDistinct("template").alias("n_templates"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select("rep_template", "n_templates", "n_rows")
    )


def _lib_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming pipeline over the COMMITTED transcript fixture
    (copied into a fresh source dir so the file-source checkpoint starts
    clean). The checkpoint/trigger machinery is not SQL, but its OUTPUT
    is: per-sink routed counts must equal the batch route — the oracle is
    the same route-CASE + COUNT the batch pipeline oracle uses."""
    import shutil
    import tempfile

    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE
    from cardinalhq_otel_collector_spark.streaming.stream_pipeline import (
        run_streaming_pipeline,
    )

    import os

    base = tempfile.mkdtemp(prefix="entry_stream_")
    src, out = f"{base}/src", f"{base}/out"
    os.makedirs(src)
    shutil.copy(TRANSCRIPTS_FIXTURE, os.path.join(src, "transcripts.parquet"))
    run_streaming_pipeline(spark, src, out, watermark="1 minute")
    return (
        spark.read.parquet(f"{out}/routed_stream")
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("turns"))
    )


def _lib_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 stateful streaming aggregate (applyInPandasWithState timers+TTL,
    streaming/stateful_agg.py) over the COMMITTED transcript fixture, made
    fully oracle-checkable.

    The trick: after the real data file, two SENTINEL microbatches (one
    future-ts row per conv_id at max_ts+3h and +6h, own files, ordered by
    mtime with maxFilesPerTrigger=1) advance the event-time watermark past
    every real bucket's end — so the stateful operator closes and emits ALL
    real (conv_id, hour-bucket) rows deterministically, while the
    sentinels' own buckets can never close (their end stays ahead of the
    final watermark) and are never emitted. The emitted set is therefore
    exactly the batch interval aggregate, which DuckDB reproduces with a
    plain windowed GROUP BY — no reliance on no-data-batch behavior."""
    import os
    import shutil
    import tempfile

    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE
    from cardinalhq_otel_collector_spark.streaming.stateful_agg import (
        stateful_interval_counts,
    )

    base = tempfile.mkdtemp(prefix="entry_stateful_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    fixture = spark.read.parquet(TRANSCRIPTS_FIXTURE)
    data_path = os.path.join(src, "00-data.parquet")
    shutil.copy(TRANSCRIPTS_FIXTURE, data_path)

    max_ts = fixture.agg(F.max("ts")).collect()[0][0]
    keys_df = fixture.select("conv_id").distinct()
    import time as _t

    now = _t.time()
    os.utime(data_path, (now - 100, now - 100))
    for j, hours in enumerate((3, 6), start=1):
        sent = keys_df.select(
            F.col("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("user").alias("role"),
            F.lit("sentinel").alias("text"),
            F.lit("").alias("tool"),
            (F.lit(max_ts) + F.expr(f"INTERVAL {hours} HOURS")).alias("ts"),
        ).coalesce(1)
        tmp = os.path.join(base, f"sent{j}")
        sent.write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
        )
        dst = os.path.join(src, f"{j:02d}-sentinel.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (now - 100 + 40 * j, now - 100 + 40 * j))

    stream = (
        spark.readStream.schema(fixture.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        # fixture ts is TIMESTAMP_NTZ; watermarks require TIMESTAMP — the
        # session is pinned UTC so the cast is deterministic
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = stateful_interval_counts(
        stream, keys=["conv_id"], value_col="turn_idx",
        interval_seconds=3600, watermark="1 second",
    )
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out).select(
        "conv_id",
        "bucket_start",
        F.col("n").alias("turns"),
        F.col("total").cast("double").alias("total_turnidx"),
    )


def _lib_stateful_duck() -> str:
    """Oracle: the emitted set equals the batch hourly aggregate over the
    fixture (see _lib_stateful — the sentinel construction guarantees every
    real bucket emits exactly once and nothing else emits)."""
    from cardinalhq_otel_collector_spark.sources.fixtures import TRANSCRIPTS_FIXTURE

    return f"""
SELECT conv_id, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS turns, CAST(SUM(turn_idx) AS DOUBLE) AS total_turnidx
FROM read_parquet('{TRANSCRIPTS_FIXTURE}')
GROUP BY 1, 2
"""


def _lib_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup (dropDuplicatesWithinWatermark) made
    fully oracle-checkable: the events table is written TWICE into the
    stream source dir (two files → every event_id arrives twice across
    microbatches), the dedup watermark delay exceeds the whole event-time
    span (no state eviction), so the emitted set is exactly one row per
    event_id — which DuckDB reproduces by just reading the events table
    (first-arrival rows are byte-identical copies, so survivor choice
    cannot diverge)."""
    import os
    import tempfile

    from cardinalhq_otel_collector_spark.streaming.stream_pipeline import (
        streaming_dedup,
    )

    base = tempfile.mkdtemp(prefix="entry_sdedup_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    # parquet ts is TIMESTAMP_NTZ; event-time watermarks require TIMESTAMP
    # (identical instants under the UTC-pinned session)
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    for _ in range(2):
        ev.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    deduped = streaming_dedup(stream, ["event_id"], delay="3650 days")
    (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).select("event_id", "user_id")


def _lib_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming session_window sessionization made fully
    oracle-checkable with the sentinel-watermark harness (same trick as
    lib_stateful_intervals): microbatch 1 is the real events table,
    microbatch 2 a single sentinel row years later — the watermark then
    sits past every real session end, so ALL real sessions are emitted
    on close. The sentinel's own (never-closed) session is filtered by
    its user_id. DuckDB reproduces the emitted set with a gap
    sessionization CTE; session_window merges windows that TOUCH, so
    the split rule is strictly-greater-than-gap — the same boundary as
    batch sessionize (pinned empirically in test_streaming.py)."""
    import datetime
    import os
    import shutil
    import tempfile
    import time as _t

    from cardinalhq_otel_collector_spark.streaming.stream_pipeline import (
        streaming_sessions,
    )

    base = tempfile.mkdtemp(prefix="entry_ssess_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    sentinel = spark.createDataFrame(
        [(int(-1), int(-1), datetime.datetime(2100, 1, 1))],
        schema=ev.schema,
    )
    # file-source microbatch order follows mtime (maxFilesPerTrigger=1):
    # real data first, the watermark-advancing sentinel strictly after
    now = _t.time()
    for j, frame in enumerate((ev, sentinel)):
        tmp = os.path.join(base, f"w{j}")
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet")
        )
        dst = os.path.join(src, f"{j:02d}-batch.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (now - 100 + 40 * j, now - 100 + 40 * j))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sessions = streaming_sessions(
        stream, ["user_id"], gap="8 hours", watermark="0 seconds"
    )
    (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).filter(F.col("user_id") >= 0)


def _lib_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (click→view attribution
    within ±10 minutes per user), replayed from file sources with
    availableNow. Inner-join emission is match-driven, so with
    watermarks longer than the replayed span the emitted set equals
    the batch range join — which the DuckDB oracle states naively."""
    import tempfile

    from cardinalhq_otel_collector_spark.streaming.stream_pipeline import (
        stream_stream_interval_join,
    )

    base = tempfile.mkdtemp(prefix="entry_ssj_")
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    srcs = {}
    for side in ("click", "view"):
        path = f"{base}/{side}"
        ev.filter(F.col("event_type") == side).drop("event_type").coalesce(
            1
        ).write.parquet(path)
        srcs[side] = path
    schema = "event_id long, user_id long, ts timestamp"
    clicks = spark.readStream.schema(schema).parquet(srcs["click"])
    views = spark.readStream.schema(schema).parquet(srcs["view"])
    joined = stream_stream_interval_join(
        clicks, views, by=["user_id"],
        lower_seconds=-600, upper_seconds=600,
        watermark="3650 days",
    )
    out, ckpt = f"{base}/out", f"{base}/ckpt"
    (
        joined.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).select(
        "event_id", "user_id", F.col("r_event_id").alias("view_event_id")
    )


def _lib_streaming_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState gauge compression (stateful_changes_only)
    driven to a deterministic emitted set: the events table is split
    into TWO time-ordered microbatches (first/second half-month by ts),
    so per-key state genuinely carries the last value ACROSS a
    microbatch boundary — with time-split input the emitted set equals
    the batch changes_only operator, which the DuckDB oracle states as
    the plain lag/IS DISTINCT FROM query."""
    import datetime
    import os
    import shutil
    import tempfile
    import time as _t

    from cardinalhq_otel_collector_spark.streaming.stateful_agg import (
        stateful_changes_only,
    )

    base = tempfile.mkdtemp(prefix="entry_schg_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    cut = datetime.datetime(2024, 1, 16)
    halves = (ev.where(F.col("ts") < cut), ev.where(F.col("ts") >= cut))
    now = _t.time()
    for j, frame in enumerate(halves):
        tmp = os.path.join(base, f"w{j}")
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{j:02d}-half.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (now - 100 + 40 * j, now - 100 + 40 * j))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    changes = stateful_changes_only(stream, ["user_id"], "ts", "value", "event_id")
    (
        changes.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).select("event_id", "user_id", "value_floor")


def _lib_streaming_rate_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState token-bucket throttle (stateful_rate_limit)
    replayed over TWO time-split microbatches: per-(user, day) admitted
    counts carry across the boundary, so a bucket that filled in the
    first half admits nothing from the second — the admitted set equals
    the batch rate_limit, stated by the oracle as the row_number cut."""
    import datetime
    import os
    import shutil
    import tempfile
    import time as _t

    from cardinalhq_otel_collector_spark.streaming.stateful_agg import (
        stateful_rate_limit,
    )

    base = tempfile.mkdtemp(prefix="entry_srl_")
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)
    ev = _read(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    cut = datetime.datetime(2024, 1, 16)
    halves = (ev.where(F.col("ts") < cut), ev.where(F.col("ts") >= cut))
    now = _t.time()
    for j, frame in enumerate(halves):
        tmp = os.path.join(base, f"w{j}")
        frame.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in sorted(os.listdir(tmp)) if f.endswith(".parquet"))
        dst = os.path.join(src, f"{j:02d}-half.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        os.utime(dst, (now - 100 + 40 * j, now - 100 + 40 * j))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    admitted = stateful_rate_limit(
        stream, ["user_id"], "ts", "event_id",
        interval_seconds=86400, max_per_window=2,
    )
    (
        admitted.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(out).select("event_id", "user_id")


_LIB_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lib_pipeline_e2e": _lib_pipeline,
    "lib_marshal_sink": _lib_marshal_sink,
    "lib_template_clusters": _lib_template_clusters,
    "lib_streaming_pipeline": _lib_streaming,
    "lib_stateful_intervals": _lib_stateful,
    "lib_streaming_dedup": _lib_streaming_dedup,
    "lib_streaming_sessions": _lib_streaming_sessions,
    "lib_stream_stream_join": _lib_stream_join,
    "lib_streaming_changes": _lib_streaming_changes,
    "lib_streaming_rate_limit": _lib_streaming_rate_limit,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the transcript pipeline (decorate → route → window agg) over
    a transcript-shaped stream derived from the sf0.001 events table."""
    import os

    from pyspark.sql import Window

    from cardinalhq_otel_collector_spark.config import PipelineConfig
    from cardinalhq_otel_collector_spark.datagen import routing_rules
    from cardinalhq_otel_collector_spark.operators.aggregate import interval_aggregate
    from cardinalhq_otel_collector_spark.plans.pipeline import decorate

    sf_dir = os.environ.get("SPARK_GRAFT_ENTRY_SF", "/root/testdata/sf0.001")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    transcripts = events.select(
        F.format_string("conv-%05d", F.col("user_id")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type") == "error", "tool").otherwise("user").alias("role"),
        F.format_string(
            "level=%s code=%d latency_ms=%d service=events msg=\"event\"",
            F.upper(F.col("event_type")),
            F.pmod(F.col("event_id"), F.lit(5)) * 100 + 100,
            F.col("value").cast("int"),
        ).alias("text"),
        F.when(F.col("event_type") == "error", "search").otherwise("").alias("tool"),
        F.col("ts"),
    )
    cfg = PipelineConfig(rules=routing_rules()).validate()
    decorated = decorate(transcripts, cfg)
    return interval_aggregate(decorated, keys=["sink", "role"], interval="1 hour")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = dict(_QUERIES)
    out.update(_LIB_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    return _oracles()
