"""Empty-input robustness: every round-5 operator must yield an empty
(or well-defined degenerate) result on an empty frame, never throw —
the edge a filtered-to-nothing partition hits constantly in production."""

from __future__ import annotations

from pyspark.sql import functions as F


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def test_empty_inputs_all_new_ops(spark):
    from cardinalhq_otel_collector_spark.operators.aggregate import (
        hill_tail_index,
        mad_outliers,
        minmax_scale,
        mutual_information,
        pearson_corr,
        seasonality_profile,
        time_weighted,
        two_proportion_ztest,
    )
    from cardinalhq_otel_collector_spark.operators.cms import cms_counts
    from cardinalhq_otel_collector_spark.operators.context import (
        context_window,
        trim_to_budget,
    )
    from cardinalhq_otel_collector_spark.operators.dedup import prefix_jaccard_pairs
    from cardinalhq_otel_collector_spark.operators.diff import table_diff
    from cardinalhq_otel_collector_spark.operators.profile import (
        gini_coefficient,
        psi_drift,
        skew_report,
    )
    from cardinalhq_otel_collector_spark.operators.resample import (
        changes_only,
        locf_resample,
    )
    from cardinalhq_otel_collector_spark.operators.sessionize import (
        basket_lift,
        reply_latency_stats,
        run_length_encode,
        state_dwell,
    )
    from cardinalhq_otel_collector_spark.operators.sketch import (
        kmv_distinct,
        kmv_rolling_distinct,
    )
    from cardinalhq_otel_collector_spark.operators.spans import merge_intervals
    from cardinalhq_otel_collector_spark.operators.validate import (
        cohen_kappa,
        coverage_gaps,
        k_anonymity_violations,
    )

    ev = _empty(spark, "event_id long, user_id long, ts timestamp, value double, event_type string")
    docs = _empty(spark, "doc_id long, text string, source string")
    iv = _empty(spark, "event_id long, k long, start_us long, end_us long")

    assert kmv_distinct(ev.select("event_type", "user_id"), "user_id", ["event_type"]).count() == 0
    assert kmv_rolling_distinct(ev, "user_id", "ts").count() == 0
    assert cms_counts(ev.select(F.col("event_type").alias("k")), "k").count() == 0
    assert prefix_jaccard_pairs(docs).count() == 0
    assert merge_intervals(iv, ["k"], "start_us", "end_us", "event_id").count() == 0
    assert locf_resample(ev, ["user_id"], "ts", "value", 3600, "event_id").count() == 0
    assert changes_only(ev, ["user_id"], "ts", "value", "event_id").count() == 0
    assert time_weighted(ev, ["user_id"], "ts", "value", "event_id").count() == 0
    assert mad_outliers(ev, "value", ["event_type"]).count() == 0
    assert minmax_scale(ev, "value", ["event_type"]).count() == 0
    assert seasonality_profile(ev, "ts", "value").count() == 0
    assert hill_tail_index(ev, "value", ["event_type"]).count() == 0
    assert two_proportion_ztest(
        ev.select(F.col("user_id").alias("variant"), (F.col("value") > 0).alias("s")),
        "variant", "s",
    ).count() == 0
    assert mutual_information(ev, "event_type", "user_id").collect()[0].n_cells == 0
    assert pearson_corr(ev, ["user_id"], "value", "value").count() == 0
    assert skew_report(ev, ["event_type"]).count() == 0
    assert psi_drift(ev, ev, "value", [10.0]).count() == 0
    assert gini_coefficient(ev, ["user_id"], ["event_type"]).count() == 0
    assert basket_lift(ev, "user_id", "event_type").count() == 0
    assert reply_latency_stats(ev, "user_id", "ts", "event_type", "event_id").count() == 0
    assert run_length_encode(ev, ["user_id"], "event_type", "ts", "event_id").count() == 0
    assert state_dwell(ev, ["user_id"], "event_type", "ts", "event_id").count() == 0
    assert trim_to_budget(
        _empty(spark, "conv_id long, turn_idx long, token_n long"),
        "conv_id", "turn_idx", "token_n", 100,
    ).count() == 0
    assert context_window(ev, ["user_id"], "ts", "event_id", "event_type").count() == 0
    assert table_diff(ev, ev, ["event_id"], ["value"]).count() == 0
    assert k_anonymity_violations(ev, ["event_type"], 3).count() == 0
    assert coverage_gaps(ev, ["user_id"], "ts").count() == 0
    r = cohen_kappa(ev, "event_type", "event_type").collect()[0]
    assert r.n_pairs == 0 and r.kappa_ppm is None
