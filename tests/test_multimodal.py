from cardinalhq_otel_collector_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_media_metadata,
    decode_features,
    sample_frames,
)


def _media(spark):
    rows = [
        (0, "image", "image/jpeg", 64, 48, None, b"\xff\xd8\xff\xe0" + b"x" * 100),
        (1, "audio", "audio/wav", None, None, 4000, b"RIFF" + b"y" * 50),
        (2, "video", "video/mp4", 320, 240, 3500, b"\x00\x00\x00\x18ftyp" + b"z" * 200),
        (3, "image", "image/png", 8, 8, None, b"\x89PNG\r\n\x1a\n" + b"w" * 20),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_metadata_sniffing(spark):
    out = {r["media_id"]: r for r in attach_media_metadata(_media(spark)).collect()}
    assert out[0]["sniffed_mime"] == "image/jpeg"
    assert out[1]["sniffed_mime"] == "audio/wav"
    assert out[3]["sniffed_mime"] == "image/png"
    assert out[0]["n_bytes"] == 104


def test_metadata_is_jvm_only(spark):
    plan = attach_media_metadata(_media(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_decode_features_batch_shape(spark):
    out = decode_features(_media(spark)).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id[0]["features"]) == 8
    assert all(0.0 <= v <= 1.0 for v in by_id[0]["features"])
    assert by_id[2]["n_bytes"] == 208
    # deterministic stub: same payload, same features
    again = {r["media_id"]: r["features"] for r in decode_features(_media(spark)).collect()}
    assert again[0] == by_id[0]["features"]


def test_sample_frames(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    # only the video row (duration 3500ms -> frames at 0,1000,2000)
    assert {r["media_id"] for r in frames} == {2}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000]
    assert all(r["frame_payload"] is not None for r in frames)
