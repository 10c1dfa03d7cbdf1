from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.parse import (
    compile_grok,
    parse_grok,
    parse_keyvalue,
)


def test_parse_keyvalue_golden(spark):
    df = spark.createDataFrame(
        [
            ('level=INFO code=200 latency_ms=42 service=ingest msg="request abc handled"',),
            ("level=ERROR code=503 latency_ms=900 service=router",),
            ("free text with no fields",),
            ('msg="quoted value" level=WARN',),
        ],
        "text string",
    )
    out = parse_keyvalue(
        df, {"level": "string", "code": "int", "latency_ms": "int", "msg": "string"}
    ).collect()
    assert (out[0]["parsed_level"], out[0]["parsed_code"], out[0]["parsed_latency_ms"]) == ("INFO", 200, 42)
    assert out[0]["parsed_msg"] == "request abc handled"
    assert (out[1]["parsed_level"], out[1]["parsed_code"]) == ("ERROR", 503)
    assert out[2]["parsed_level"] is None and out[2]["parsed_code"] is None
    assert out[3]["parsed_msg"] == "quoted value" and out[3]["parsed_level"] == "WARN"


def test_compile_grok():
    regex, fields = compile_grok("level=%{LOGLEVEL:level} code=%{INT:code:int} at %{IP}")
    assert fields == [("level", "string", 1), ("code", "int", 2)]
    import re

    m = re.search(regex, "level=WARN code=7 at 10.0.0.1")
    assert m and m.group(1) == "WARN" and m.group(2) == "7"


def test_parse_grok(spark):
    df = spark.createDataFrame(
        [("level=ERROR code=500 at 10.1.2.3",), ("nope",)], "text string"
    )
    out = parse_grok(df, "level=%{LOGLEVEL:level} code=%{INT:code:int} at %{IP:ip}").collect()
    assert (out[0]["parsed_level"], out[0]["parsed_code"], out[0]["parsed_ip"]) == ("ERROR", 500, "10.1.2.3")
    assert out[1]["parsed_level"] is None


def test_parse_on_generated_transcripts(transcripts_df):
    out = parse_keyvalue(transcripts_df, {"level": "string", "code": "int"})
    grok_rows = out.filter(F.col("text").startswith("level="))
    assert grok_rows.filter(F.col("parsed_level").isNull()).count() == 0
    assert grok_rows.filter(F.col("parsed_code").isNull()).count() == 0
    non_grok = out.filter(~F.col("text").startswith("level="))
    assert non_grok.filter(F.col("parsed_level").isNotNull()).count() == 0


def test_parse_json_attrs_typed_and_permissive(spark):
    from cardinalhq_otel_collector_spark.operators.parse import parse_json_attrs

    df = spark.createDataFrame(
        [
            (1, '{"k": 7, "s": "x"}'),
            (2, '{"s": "only"}'),        # missing field -> NULL
            (3, '{"k": "notanint"}'),    # mistyped -> NULL
            (4, 'not json at all'),      # malformed -> NULL
            (5, None),                   # NULL passthrough
        ],
        "event_id long, props string",
    )
    out = parse_json_attrs(df, "props", {"k": "int", "s": "string"})
    rows = {r.event_id: (r.k, r.s) for r in out.collect()}
    assert rows == {
        1: (7, "x"),
        2: (None, "only"),
        3: (None, None),
        4: (None, None),
        5: (None, None),
    }
    # prefix and column order
    out2 = parse_json_attrs(df, "props", {"k": "int"}, prefix="p_")
    assert out2.columns == ["event_id", "props", "p_k"]
