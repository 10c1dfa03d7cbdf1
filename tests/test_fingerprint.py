from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.fingerprint import (
    fingerprint,
    fingerprint_and_cluster,
)


def test_same_pattern_family_shares_fingerprint(spark):
    """Rows differing only in numbers/ids share a masked template (F5.5)."""
    df = spark.createDataFrame(
        [
            ("connection 123 from host server-7 retry 1 timeout 500ms",),
            ("connection 999 from host server-31 retry 4 timeout 42ms",),
            ("totally different text",),
        ],
        "text string",
    )
    rows = fingerprint(df).collect()
    assert rows[0]["template"] == "connection <num> from host server-<num> retry <num> timeout <num>ms"
    assert rows[0]["fingerprint"] == rows[1]["fingerprint"]
    assert rows[0]["fingerprint"] != rows[2]["fingerprint"]


def test_masking_order_uuid_hex_num(spark):
    df = spark.createDataFrame(
        [
            ("trace 01234567-89ab-cdef-0123-456789abcdef block deadbeefcafe offset 17",),
        ],
        "text string",
    )
    assert (
        fingerprint(df).collect()[0]["template"]
        == "trace <id> block <hex> offset <num>"
    )


def test_cluster_deterministic_across_partitionings(spark):
    rows = [(f"connection {i} from host server-{i%5} retry {i%3} timeout {i}ms",) for i in range(50)]
    rows += [(f"user {i} logged in from 10.0.0.{i%9}",) for i in range(50)]
    rows += [("the quick brown fox",), ("pack my box with five dozen jugs",)]
    a = fingerprint_and_cluster(spark.createDataFrame(rows, "text string").repartition(1))
    b = fingerprint_and_cluster(spark.createDataFrame(list(reversed(rows)), "text string").repartition(7))
    ma = {r["text"]: r["cluster_id"] for r in a.collect()}
    mb = {r["text"]: r["cluster_id"] for r in b.collect()}
    assert ma == mb  # order/partitioning independent (SURVEY §7 risk (a))


def test_cluster_groups_similar_templates(spark):
    # near-identical templates (one token differs) should LSH-cluster together,
    # dissimilar ones apart
    df = spark.createDataFrame(
        [
            ("connection 1 from host server-1 retry 1 timeout 5ms",),
            ("connection 2 from host machine server-9 retry 0 timeout 7ms",),
            ("zzz completely unrelated words qqq",),
        ],
        "text string",
    )
    out = fingerprint_and_cluster(df).collect()
    by_text = {r["text"]: r for r in out}
    c1 = by_text["connection 1 from host server-1 retry 1 timeout 5ms"]["cluster_id"]
    c2 = by_text["connection 2 from host machine server-9 retry 0 timeout 7ms"]["cluster_id"]
    c3 = by_text["zzz completely unrelated words qqq"]["cluster_id"]
    assert c1 == c2
    assert c3 != c1


def test_fingerprint_no_python_on_row_path(spark, transcripts_df):
    """Pass 1 must be pure JVM expressions: the physical plan for the
    row-level projection contains no Python/Arrow eval nodes."""
    plan = fingerprint(transcripts_df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan
