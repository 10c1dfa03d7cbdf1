"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry exercises one operator family from SURVEY.md §2
over the driver's parquet tables; the matching ``oracle_sql()`` string is
the same computation in DuckDB SQL. Column names/aliases are kept
identical on both sides. Floating-point aggregates are made
engine-portable by summing in DECIMAL (exact) and rounding only at the
end; orderings always carry an explicit integer tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in _TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _sql(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _views(spark, sf_dir)
        return spark.sql(sql)

    return run


# ---------------------------------------------------------------------------
# Spark-side SQL (Java regex dialect, Spark function names) and DuckDB oracle
# SQL (RE2 dialect, DuckDB function names) per query.
# ---------------------------------------------------------------------------

_ROUTE_CASE = """CASE WHEN event_type = 'error' THEN 'errors'
                WHEN k >= 80 THEN 'hot_keys'
                WHEN value >= 150.0 THEN 'big_values'
                ELSE 'default' END"""

# A1-A8 + S1/S5/S7: parse -> route -> per-sink interval aggregate
# (aggregationprocessor aggregate.go:228-294; routingconnector manifest :282)
_PIPELINE_ROUTE_AGG_SPARK = f"""
WITH parsed AS (
  SELECT event_id, user_id, event_type, value, ts,
         CAST(get_json_object(props, '$.k') AS INT) AS k
  FROM events
), routed AS (
  SELECT *, {_ROUTE_CASE} AS sink FROM parsed
)
SELECT sink, event_type, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM routed GROUP BY sink, event_type, bucket_start
"""
_PIPELINE_ROUTE_AGG_DUCK = f"""
WITH parsed AS (
  SELECT event_id, user_id, event_type, value, ts,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
), routed AS (
  SELECT *, {_ROUTE_CASE} AS sink FROM parsed
)
SELECT sink, event_type, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM routed GROUP BY sink, event_type, bucket_start
"""

_ROUTE_FANOUT_SPARK = f"""
SELECT {_ROUTE_CASE.replace("k >=", "CAST(get_json_object(props, '$.k') AS INT) >=")} AS sink,
       COUNT(*) AS n
FROM events GROUP BY 1
"""
_ROUTE_FANOUT_DUCK = f"""
SELECT {_ROUTE_CASE.replace("k >=", "CAST(json_extract_string(props, '$.k') AS INTEGER) >=")} AS sink,
       COUNT(*) AS n
FROM events GROUP BY 1
"""

# A3/A4: interval aggregate with sum/avg/min/max (aggregate.go:204-294)
_INTERVAL_AGG_SQL = """
SELECT event_type, date_trunc('hour', ts) AS bucket_start,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS avg_value,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events GROUP BY event_type, bucket_start
"""

# cumulativetodeltaprocessor (manifest :240)
_CUM_TO_DELTA_SQL = """
SELECT event_id, user_id, ts,
       value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
FROM events
"""

# deltatocumulativeprocessor (manifest :242)
_DELTA_TO_CUM_SQL = """
SELECT event_id, user_id, ts,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cumulative
FROM events
"""

# deltatorateprocessor (manifest :243): delta / Δt
_DELTA_TO_RATE_SPARK = """
SELECT event_id, user_id, ts,
       ROUND((value - LAG(value) OVER w)
             / ((unix_micros(CAST(ts AS TIMESTAMP)) - LAG(unix_micros(CAST(ts AS TIMESTAMP))) OVER w)
                / 1000000.0), 6) + 0.0 AS rate
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""
_DELTA_TO_RATE_DUCK = """
SELECT event_id, user_id, ts,
       ROUND((value - LAG(value) OVER w)
             / ((epoch_us(ts) - LAG(epoch_us(ts)) OVER w) / 1000000.0), 6) + 0.0 AS rate
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""

# metricstarttimeprocessor (manifest :255)
_START_TIME_SQL = """
SELECT user_id, MIN(ts) AS start_ts, COUNT(*) AS n FROM events GROUP BY user_id
"""

# intervalprocessor: last value per series per interval (manifest :250)
_INTERVAL_LAST_SQL = """
SELECT user_id, bucket_start, value AS last_value FROM (
  SELECT user_id, date_trunc('hour', ts) AS bucket_start, value,
         ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) t WHERE rn = 1
"""

# logdedupprocessor (manifest :253)
_LOG_DEDUP_SPARK = """
SELECT date_trunc('minute', ts) AS bucket_start, event_type,
       get_json_object(props, '$.k') AS k, COUNT(*) AS dup_count
FROM events GROUP BY 1, 2, 3
"""
_LOG_DEDUP_DUCK = """
SELECT date_trunc('minute', ts) AS bucket_start, event_type,
       json_extract_string(props, '$.k') AS k, COUNT(*) AS dup_count
FROM events GROUP BY 1, 2, 3
"""

# probabilisticsamplerprocessor (manifest :257): deterministic md5 threshold
_PROB_SAMPLE_SPARK = """
SELECT event_id, event_type FROM events
WHERE substring(md5(CAST(event_id AS STRING)), 1, 4) < '4000'
"""
_PROB_SAMPLE_DUCK = """
SELECT event_id, event_type FROM events
WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 4) < '4000'
"""

# tailsamplingprocessor (manifest :265): whole-group keep if any row matches
_TAIL_SAMPLE_SQL = """
SELECT e.event_id, e.user_id, e.event_type FROM events e
WHERE EXISTS (SELECT 1 FROM events x
              WHERE x.user_id = e.user_id AND x.event_type = 'error')
"""

# groupbytraceprocessor (manifest :249): assemble per-group ordered sequence
_GROUP_BY_CONV_SPARK = """
SELECT user_id, COUNT(*) AS n_events,
       array_join(transform(array_sort(collect_list(struct(ts, event_id, event_type))),
                            s -> s.event_type), ',') AS seq
FROM events GROUP BY user_id
"""
_GROUP_BY_CONV_DUCK = """
SELECT user_id, COUNT(*) AS n_events,
       string_agg(event_type, ',' ORDER BY ts, event_id) AS seq
FROM events GROUP BY user_id
"""

# A7 summary split naming/explode shape (summarysplitprocessor/metrics.go:91-198)
_SUMMARY_SPLIT_SQL = """
WITH s AS (
  SELECT l_returnflag AS flag, COUNT(*) AS cnt,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qsum,
         MIN(l_quantity) AS qmin, MAX(l_quantity) AS qmax
  FROM lineitem GROUP BY l_returnflag
)
SELECT concat('lineitem.qty.', flag, '.count') AS metric, CAST(cnt AS DOUBLE) AS value FROM s
UNION ALL SELECT concat('lineitem.qty.', flag, '.sum') AS metric, qsum AS value FROM s
UNION ALL SELECT concat('lineitem.qty.', flag, '.min') AS metric, qmin AS value FROM s
UNION ALL SELECT concat('lineitem.qty.', flag, '.max') AS metric, qmax AS value FROM s
"""

# A16 broadcast enrichment with unknown-key (auth-denied) nulls
_ENRICH_SQL = """
SELECT COALESCE(c.c_mktsegment, 'unknown') AS segment, COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total
FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1
"""

# generic agg parity: TPC-H Q1 shape
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

# broadcast join chain (k8sattributes/geoip-style lookups)
_JOIN_CHAIN_SQL = """
SELECT r.r_name AS region_name, n.n_name AS nation_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""

# S2 template mining: mask volatile tokens -> count per template
_TEMPLATE_SPARK = r"""
WITH lines AS (
  SELECT concat('user ', CAST(user_id AS STRING), ' did ', event_type,
                ' k=', get_json_object(props, '$.k')) AS line
  FROM events
)
SELECT regexp_replace(line, '\\d+', '<num>') AS template, COUNT(*) AS n
FROM lines GROUP BY 1
"""
_TEMPLATE_DUCK = r"""
WITH lines AS (
  SELECT concat('user ', CAST(user_id AS VARCHAR), ' did ', event_type,
                ' k=', json_extract_string(props, '$.k')) AS line
  FROM events
)
SELECT regexp_replace(line, '\d+', '<num>', 'g') AS template, COUNT(*) AS n
FROM lines GROUP BY 1
"""

# A11 sumo_ic-style per-record JSON line marshal (sumo_marshaler.go:70-144)
_SUMO_SPARK = """
SELECT event_id,
       concat('{"date":"', date_format(ts, 'yyyy-MM-dd'),
              '","sourceName":"events","sourceHost":"host-', CAST(user_id AS STRING),
              '","sourceCategory":"', event_type,
              '","message":"value=', CAST(value AS STRING), '"}') AS line
FROM events
"""
_SUMO_DUCK = """
SELECT event_id,
       concat('{"date":"', strftime(ts, '%Y-%m-%d'),
              '","sourceName":"events","sourceHost":"host-', CAST(user_id AS VARCHAR),
              '","sourceCategory":"', event_type,
              '","message":"value=', CAST(value AS VARCHAR), '"}') AS line
FROM events
"""

# A12 time-partitioned object-key building (internal/upload/partition.go:59-134)
_PARTITION_KEY_SPARK = """
SELECT event_id,
       concat('bucket/prefix/year=', date_format(ts, 'yyyy'),
              '/month=', date_format(ts, 'MM'),
              '/day=', date_format(ts, 'dd'),
              '/hour=', date_format(ts, 'HH'),
              '/events_', event_type) AS object_key
FROM events
"""
_PARTITION_KEY_DUCK = """
SELECT event_id,
       concat('bucket/prefix/year=', strftime(ts, '%Y'),
              '/month=', strftime(ts, '%m'),
              '/day=', strftime(ts, '%d'),
              '/hour=', strftime(ts, '%H'),
              '/events_', event_type) AS object_key
FROM events
"""

# unrollprocessor (manifest :267): explode array-valued bodies
_UNROLL_SPARK = """
SELECT lang, COUNT(*) AS n_tokens
FROM documents LATERAL VIEW explode(split(text, ' ')) t AS w
GROUP BY lang
"""
_UNROLL_DUCK = """
SELECT lang, COUNT(*) AS n_tokens
FROM documents, unnest(string_split(text, ' ')) AS t(w)
GROUP BY lang
"""

# --- training-data pipeline ops over documents/embeddings -------------------

_TOKEN_COUNT_SPARK = """
SELECT doc_id, size(split(text, ' ')) AS n_tokens, length(text) AS n_chars_calc
FROM documents
"""
_TOKEN_COUNT_DUCK = """
SELECT doc_id, len(string_split(text, ' ')) AS n_tokens, length(text) AS n_chars_calc
FROM documents
"""

_QUALITY_SPARK = """
SELECT doc_id,
       size(split(text, ' ')) AS n_tokens,
       size(array_distinct(split(text, ' '))) AS n_distinct,
       ROUND(CAST(size(array_distinct(split(text, ' '))) AS DOUBLE)
             / size(split(text, ' ')), 4) AS ttr
FROM documents
"""
_QUALITY_DUCK = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       len(list_distinct(string_split(text, ' '))) AS n_distinct,
       ROUND(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS ttr
FROM documents
"""

_LANG_SPARK = r"""
SELECT doc_id, lang,
       regexp_count(text, '\\bthe\\b') + regexp_count(text, '\\ba\\b') AS eng_markers,
       CASE WHEN regexp_count(text, '\\bthe\\b') + regexp_count(text, '\\ba\\b') >= 3
            THEN 'en-like' ELSE 'other' END AS guess
FROM documents
"""
_LANG_DUCK = r"""
SELECT doc_id, lang,
       len(regexp_extract_all(text, '\bthe\b')) + len(regexp_extract_all(text, '\ba\b')) AS eng_markers,
       CASE WHEN len(regexp_extract_all(text, '\bthe\b')) + len(regexp_extract_all(text, '\ba\b')) >= 3
            THEN 'en-like' ELSE 'other' END AS guess
FROM documents
"""

_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""

# n-gram Jaccard near-dup (char 12-gram shingles, pairwise over a bounded
# candidate set — the exact small-N oracle; the scale path is minhash_lsh)
_JACCARD_SPARK = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
sh AS (SELECT DISTINCT doc_id, substring(text, i, 12) AS s
       FROM d LATERAL VIEW explode(sequence(1, greatest(length(text) - 11, 1))) t AS i),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.02
"""
_JACCARD_DUCK = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 60),
sh AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 12) AS s
       FROM d, unnest(range(1, greatest(length(text) - 11, 1) + 1)) t(i)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT doc_a, doc_b, ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.02
"""

# MinHash + LSH band-bucket candidate pairs (the scale path for near-dup:
# O(n·bands) shuffle instead of O(n²) compare)
_MINHASH_SPARK = """
WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
sh AS (SELECT DISTINCT doc_id, substring(text, i, 12) AS s
       FROM d LATERAL VIEW explode(sequence(1, greatest(length(text) - 11, 1))) t AS i),
sig AS (SELECT doc_id,
               MIN(md5(concat('0|', s))) AS h0, MIN(md5(concat('1|', s))) AS h1
        FROM sh GROUP BY doc_id),
bands AS (SELECT doc_id, concat('b0#', h0) AS band FROM sig
          UNION ALL SELECT doc_id, concat('b1#', h1) AS band FROM sig)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
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
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.doc_id < b.doc_id
"""

# brute-force cosine top-k ANN (exact baseline; decimal-summed dot products
# so Spark and DuckDB agree bit-for-bit before rounding)
_ANN_SPARK = """
WITH idx AS (SELECT explode(sequence(1, 64)) AS i),
q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
norms AS (
  SELECT e.vec_id,
         CAST(SUM(CAST(CAST(element_at(e.embedding, idx.i) AS DOUBLE)
                       * CAST(element_at(e.embedding, idx.i) AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS nrm2
  FROM embeddings e CROSS JOIN idx GROUP BY e.vec_id),
dots AS (
  SELECT q.qid, e.vec_id,
         CAST(SUM(CAST(CAST(element_at(q.qe, idx.i) AS DOUBLE)
                       * CAST(element_at(e.embedding, idx.i) AS DOUBLE) AS DECIMAL(38,18))) AS DOUBLE) AS dot
  FROM q CROSS JOIN embeddings e CROSS JOIN idx
  WHERE e.vec_id <> q.qid
  GROUP BY q.qid, e.vec_id),
scored AS (
  SELECT d.qid, d.vec_id,
         ROUND(d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY d.qid
                            ORDER BY d.dot / (sqrt(nq.nrm2) * sqrt(nv.nrm2)) DESC, d.vec_id) AS rn
  FROM dots d JOIN norms nq ON nq.vec_id = d.qid JOIN norms nv ON nv.vec_id = d.vec_id)
SELECT qid, vec_id AS neighbor_id, cosine, rn AS nn_rank FROM scored WHERE rn <= 3
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
SELECT qid, vec_id AS neighbor_id, cosine, rn AS nn_rank FROM scored WHERE rn <= 3
"""

# LSH sign-bucket assignment (the ANN scale path: bucket then search within)
_EMB_BUCKET_SPARK = """
SELECT concat(
         CASE WHEN element_at(embedding, 1) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 2) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 3) >= 0 THEN '1' ELSE '0' END,
         CASE WHEN element_at(embedding, 4) >= 0 THEN '1' ELSE '0' END) AS bucket,
       COUNT(*) AS n, MIN(vec_id) AS min_vec_id
FROM embeddings GROUP BY 1
"""
_EMB_BUCKET_DUCK = """
SELECT concat(
         CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END,
         CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bucket,
       COUNT(*) AS n, MIN(vec_id) AS min_vec_id
FROM embeddings GROUP BY 1
"""

_QUERIES: dict[str, tuple[str, str]] = {
    "pipeline_route_agg": (_PIPELINE_ROUTE_AGG_SPARK, _PIPELINE_ROUTE_AGG_DUCK),
    "route_fanout_counts": (_ROUTE_FANOUT_SPARK, _ROUTE_FANOUT_DUCK),
    "interval_agg": (_INTERVAL_AGG_SQL, _INTERVAL_AGG_SQL),
    "cumulative_to_delta": (_CUM_TO_DELTA_SQL, _CUM_TO_DELTA_SQL),
    "delta_to_cumulative": (_DELTA_TO_CUM_SQL, _DELTA_TO_CUM_SQL),
    "delta_to_rate": (_DELTA_TO_RATE_SPARK, _DELTA_TO_RATE_DUCK),
    "metric_start_time": (_START_TIME_SQL, _START_TIME_SQL),
    "interval_last": (_INTERVAL_LAST_SQL, _INTERVAL_LAST_SQL),
    "log_dedup": (_LOG_DEDUP_SPARK, _LOG_DEDUP_DUCK),
    "probabilistic_sample": (_PROB_SAMPLE_SPARK, _PROB_SAMPLE_DUCK),
    "tail_sample": (_TAIL_SAMPLE_SQL, _TAIL_SAMPLE_SQL),
    "group_by_conv": (_GROUP_BY_CONV_SPARK, _GROUP_BY_CONV_DUCK),
    "summary_split": (_SUMMARY_SPLIT_SQL, _SUMMARY_SPLIT_SQL),
    "enrich_lookup": (_ENRICH_SQL, _ENRICH_SQL),
    "tpch_q1": (_TPCH_Q1_SQL, _TPCH_Q1_SQL),
    "join_chain": (_JOIN_CHAIN_SQL, _JOIN_CHAIN_SQL),
    "template_mining": (_TEMPLATE_SPARK, _TEMPLATE_DUCK),
    "sumo_marshal": (_SUMO_SPARK, _SUMO_DUCK),
    "partition_keys": (_PARTITION_KEY_SPARK, _PARTITION_KEY_DUCK),
    "unroll_tokens": (_UNROLL_SPARK, _UNROLL_DUCK),
    "doc_token_count": (_TOKEN_COUNT_SPARK, _TOKEN_COUNT_DUCK),
    "doc_quality": (_QUALITY_SPARK, _QUALITY_DUCK),
    "doc_lang_id": (_LANG_SPARK, _LANG_DUCK),
    "doc_exact_dedup": (_EXACT_DEDUP_SQL, _EXACT_DEDUP_SQL),
    "doc_ngram_jaccard": (_JACCARD_SPARK, _JACCARD_DUCK),
    "doc_minhash_lsh": (_MINHASH_SPARK, _MINHASH_DUCK),
    "ann_cosine_topk": (_ANN_SPARK, _ANN_DUCK),
    "emb_lsh_buckets": (_EMB_BUCKET_SPARK, _EMB_BUCKET_DUCK),
}


# ---------------------------------------------------------------------------
# Library-backed queries with no portable SQL oracle (driver records the
# weaker rows-only check for these — genuinely non-SQL-expressible paths:
# driver-side union-find clustering, banded hyperplane LSH, Arrow-batched
# multimodal decode, the full staged pipeline with lineage).
# ---------------------------------------------------------------------------


def _lib_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full staged pipeline over deterministic synthetic transcripts;
    returns per-sink counts (the north-rule aggregate shape)."""
    import tempfile

    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.datagen import transcripts
    from cardinalhq_otel_collector_spark.plans.pipeline import AGG_TABLE, run_pipeline
    from cardinalhq_otel_collector_spark.sources.catalog import Catalog

    catalog = Catalog(spark, tempfile.mkdtemp(prefix="entry_wh_"))
    df = transcripts(spark, n_convs=300, hot_convs=3)
    run_pipeline(spark, df, catalog, run_id="entry")
    return (
        catalog.read(AGG_TABLE)
        .groupBy("sink")
        .agg(F.sum("n").alias("turns"), F.count(F.lit(1)).alias("groups"))
    )


def _lib_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.datagen import transcripts
    from cardinalhq_otel_collector_spark.operators.fingerprint import fingerprint_and_cluster

    df = fingerprint_and_cluster(transcripts(spark, n_convs=200))
    return df.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("fingerprint").alias("n_templates"),
    )


def _lib_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.operators.similarity import lsh_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(q, emb, k=3, bits=4, n_bands=8)


def _lib_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.operators.dedup import simhash_candidates

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(F.col("doc_id") < 200)
    return simhash_candidates(docs)


def _lib_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from cardinalhq_otel_collector_spark.operators.multimodal import decode_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(500)
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.col("text").cast("binary").alias("payload"),
    )
    return decode_features(media)


def _lib_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from cardinalhq_otel_collector_spark.datagen import transcripts
    from cardinalhq_otel_collector_spark.streaming.stream_pipeline import (
        run_streaming_pipeline,
    )

    base = tempfile.mkdtemp(prefix="entry_stream_")
    src, out = f"{base}/src", f"{base}/out"
    transcripts(spark, n_convs=100).repartition(4).write.parquet(src)
    run_streaming_pipeline(spark, src, out, watermark="1 minute")
    return spark.read.parquet(f"{out}/routed_stream").groupBy("sink").count()


_LIB_QUERIES: dict[str, object] = {
    "lib_pipeline_e2e": _lib_pipeline,
    "lib_template_clusters": _lib_template_clusters,
    "lib_ann_lsh": _lib_ann_lsh,
    "lib_simhash_candidates": _lib_simhash,
    "lib_multimodal_decode": _lib_multimodal,
    "lib_streaming_pipeline": _lib_streaming,
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the transcript pipeline (decorate → route → window agg) over
    a transcript-shaped stream derived from sf0.001 events."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    from cardinalhq_otel_collector_spark.config import PipelineConfig
    from cardinalhq_otel_collector_spark.datagen import routing_rules
    from cardinalhq_otel_collector_spark.operators.aggregate import interval_aggregate
    from cardinalhq_otel_collector_spark.plans.pipeline import decorate

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
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
    out = {name: _sql(spark_sql) for name, (spark_sql, _) in _QUERIES.items()}
    out.update(_LIB_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    return {name: duck for name, (_, duck) in _QUERIES.items()}
