from cardinalhq_otel_collector_spark.operators.redact import redact, rewrite_attributes


def test_redact_goldens(spark):
    df = spark.createDataFrame(
        [
            ("contact user123@example.com about ticket 400",),
            ("callback +1-555-0142 trace 01234567-89ab-cdef-0123-456789abcdef",),
            ("server at 10.1.2.3 responded",),
            ("nothing sensitive here",),
        ],
        "text string",
    )
    rows = redact(df).collect()
    assert rows[0]["text_redacted"] == "contact <EMAIL> about ticket 400"
    assert rows[0]["has_pii"] is True
    assert rows[1]["text_redacted"] == "callback <PHONE> trace <UUID>"
    assert rows[2]["text_redacted"] == "server at <IP> responded"
    assert rows[3]["text_redacted"] == "nothing sensitive here"
    assert rows[3]["has_pii"] is False
    # original column untouched (per-turn text equality invariant)
    assert rows[0]["text"] == "contact user123@example.com about ticket 400"


def test_redact_on_generated(transcripts_df):
    out = redact(transcripts_df)
    pii = out.filter("has_pii")
    assert pii.count() > 0
    assert pii.filter(out.text_redacted.rlike("@example.com")).count() == 0
    assert pii.filter(
        out.text_redacted.rlike("[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}")
    ).count() == 0


def test_rewrite_attributes(spark):
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    out = rewrite_attributes(
        df, set_attrs={"env": "prod"}, rename={"name": "label"}, drop=["id"]
    )
    assert out.columns == ["label", "env"]
    assert out.collect()[0]["env"] == "prod"
