"""Property-based tests (hypothesis) for the invariants the pipeline's
correctness rests on. Strategies are kept small and deadline=None because
each case round-trips through the JVM."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cardinalhq_otel_collector_spark.operators.fingerprint import mask_template
from cardinalhq_otel_collector_spark.operators.redact import DEFAULT_PII_PATTERNS, redact
from cardinalhq_otel_collector_spark.operators.route import route

_slow = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=80
)


@_slow
@given(st.lists(texts, min_size=1, max_size=8))
def test_redaction_is_idempotent_and_flag_consistent(spark, rows):
    df = spark.createDataFrame([(t,) for t in rows], "text string")
    once = redact(df).select("text_redacted", "has_pii").collect()
    again = redact(
        df.sparkSession.createDataFrame(
            [(r["text_redacted"],) for r in once], "text string"
        )
    ).collect()
    # masks never themselves match a pattern → second pass is a no-op
    for first, second in zip(once, again):
        assert second["text_redacted"] == first["text_redacted"]
    # flag ≡ "some pattern matched" (python re as the oracle)
    pats = [re.compile(p) for _, p, _ in DEFAULT_PII_PATTERNS]
    for t, r in zip(rows, once):
        assert r["has_pii"] == any(p.search(t) for p in pats)


@_slow
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=12
    )
)
def test_routing_first_match_wins_matches_python_oracle(spark, rows):
    rules = [
        {"rule_id": 1, "predicate": "x >= 90", "sink": "a"},
        {"rule_id": 2, "predicate": "y = 2", "sink": "b"},
        {"rule_id": 3, "predicate": "x < 10", "sink": "c"},
    ]

    def oracle(y, x):
        if x >= 90:
            return "a"
        if y == 2:
            return "b"
        if x < 10:
            return "c"
        return "default"

    df = spark.createDataFrame(rows, "y int, x int")
    got = route(df, rules).collect()
    for r in got:
        assert r["sink"] == oracle(r["y"], r["x"])


@_slow
@given(st.lists(texts, min_size=1, max_size=8))
def test_mask_template_is_partitioning_and_order_independent(spark, rows):
    from pyspark.sql import functions as F

    df1 = spark.createDataFrame([(t,) for t in rows], "text string").repartition(1)
    df2 = spark.createDataFrame([(t,) for t in reversed(rows)], "text string").repartition(5)
    m1 = {r["text"]: r["tpl"] for r in df1.select("text", mask_template(F.col("text")).alias("tpl")).collect()}
    m2 = {r["text"]: r["tpl"] for r in df2.select("text", mask_template(F.col("text")).alias("tpl")).collect()}
    assert m1 == m2
    # masking is idempotent: a masked template re-masks to itself
    df3 = spark.createDataFrame([(t,) for t in m1.values()], "text string")
    m3 = {r["text"] for r in df3.select(mask_template(F.col("text")).alias("text")).collect()}
    assert m3 == set(m1.values())


def test_sampler_rates_nest_for_all_probabilities(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import probabilistic_sample
    from pyspark.sql import functions as F

    df = spark.range(3000).withColumn("key", F.col("id").cast("string"))
    kept_prev: set = set()
    for p in (0.05, 0.2, 0.5, 0.9):
        kept = {r["id"] for r in probabilistic_sample(df, "key", p).collect()}
        assert kept_prev <= kept  # monotone nesting: raising p never drops rows
        kept_prev = kept
