from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.route import route, routing_case_sql


RULES = [
    {"rule_id": 2, "predicate": "x >= 10", "sink": "big"},
    {"rule_id": 1, "predicate": "x >= 100", "sink": "huge"},
    {"rule_id": 3, "predicate": "y = 'z'", "sink": "zed"},
]


def test_first_match_wins_priority(spark):
    df = spark.createDataFrame(
        [(500, "z"), (50, "z"), (5, "z"), (5, "q")], "x int, y string"
    )
    got = {(r["x"], r["y"]): r["sink"] for r in route(df, RULES).collect()}
    assert got == {
        (500, "z"): "huge",  # rule 1 beats rule 2 despite list order
        (50, "z"): "big",
        (5, "z"): "zed",
        (5, "q"): "default",
    }


def test_empty_rules_all_default(spark):
    df = spark.createDataFrame([(1,)], "x int")
    assert route(df, []).collect()[0]["sink"] == "default"


def test_case_sql_equivalent(spark):
    df = spark.createDataFrame(
        [(500, "z"), (50, "z"), (5, "z"), (5, "q")], "x int, y string"
    )
    via_sql = df.withColumn("sink", F.expr(routing_case_sql(RULES)))
    assert sorted(via_sql.collect()) == sorted(route(df, RULES).collect())
