from datetime import datetime

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.sampling import (
    log_dedup,
    probabilistic_sample,
    tail_sample,
)


def test_probabilistic_sample_deterministic_and_unbiased(spark):
    df = spark.range(0, 20000).withColumn("key", F.col("id").cast("string"))
    a = probabilistic_sample(df, "key", 0.25)
    b = probabilistic_sample(df.repartition(13), "key", 0.25)
    ids_a = {r["id"] for r in a.collect()}
    ids_b = {r["id"] for r in b.collect()}
    assert ids_a == ids_b  # cluster-size / partitioning independent
    assert abs(len(ids_a) / 20000 - 0.25) < 0.02


def test_probabilistic_sample_subset_property(spark):
    df = spark.range(0, 5000).withColumn("key", F.col("id").cast("string"))
    p10 = {r["id"] for r in probabilistic_sample(df, "key", 0.10).collect()}
    p50 = {r["id"] for r in probabilistic_sample(df, "key", 0.50).collect()}
    assert p10 <= p50  # consistent sampling: smaller rate nests in larger


def test_tail_sample_keeps_whole_groups(spark):
    df = spark.createDataFrame(
        [("c1", "ok"), ("c1", "error"), ("c2", "ok"), ("c2", "ok")],
        "conv_id string, status string",
    )
    out = tail_sample(df, "conv_id", "status = 'error'")
    rows = out.collect()
    assert {r["conv_id"] for r in rows} == {"c1"}
    assert len(rows) == 2  # both turns of c1 kept, incl. the non-matching one


def test_log_dedup(spark):
    t0 = datetime.fromisoformat("2026-01-01 00:00:05")
    t1 = datetime.fromisoformat("2026-01-01 00:00:20")
    t2 = datetime.fromisoformat("2026-01-01 00:02:00")
    df = spark.createDataFrame(
        [("dup line", t0), ("dup line", t1), ("dup line", t2), ("other", t0)],
        "text string, ts timestamp",
    )
    out = log_dedup(df, interval="60 seconds")
    got = {(r["text"], r["bucket_start"].minute): r["dup_count"] for r in out.collect()}
    assert got[("dup line", 0)] == 2  # same body within the minute collapses
    assert got[("dup line", 2)] == 1
    assert got[("other", 0)] == 1


def test_quota_sample_caps_each_stratum(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de", "web") for i in range(40)],
        "doc_id long, lang string, source string",
    )
    out = quota_sample(df, ["lang", "source"], quota=3, key_col="doc_id")
    counts = {(r.lang, r.source): r.n for r in
              out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()}
    assert counts == {("en", "web"): 3, ("de", "web"): 3}


def test_quota_sample_deterministic_across_partitionings(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(
        [(i, "en", "web") for i in range(100)],
        "doc_id long, lang string, source string",
    )
    a = {r.doc_id for r in quota_sample(df, "lang", 10, key_col="doc_id").collect()}
    b = {r.doc_id for r in
         quota_sample(df.repartition(13), "lang", 10, key_col="doc_id").collect()}
    assert a == b and len(a) == 10


def test_quota_sample_under_quota_keeps_all(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import quota_sample

    df = spark.createDataFrame(
        [(1, "en", "web"), (2, "de", "web")],
        "doc_id long, lang string, source string",
    )
    assert quota_sample(df, "lang", 5, key_col="doc_id").count() == 2


def test_assign_split_deterministic_partition_and_exhaustive(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import assign_split

    df = spark.range(0, 20000).withColumn("key", F.col("id").cast("string"))
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["id"]: r["split"] for r in assign_split(df, "key", w).collect()}
    b = {
        r["id"]: r["split"]
        for r in assign_split(df.repartition(17), "key", w).collect()
    }
    assert a == b  # partitioning / cluster-size independent
    assert set(a.values()) == {"train", "val", "test"}  # exhaustive
    n = len(a)
    frac = {s: sum(1 for v in a.values() if v == s) / n for s in w}
    for s, target in (("train", 0.8), ("val", 0.1), ("test", 0.1)):
        assert abs(frac[s] - target) < 0.02, (s, frac[s])


def test_assign_split_is_narrow_projection(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import assign_split

    df = spark.range(0, 100).withColumn("key", F.col("id").cast("string"))
    out = assign_split(df, "key", {"train": 0.9, "val": 0.1})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # no shuffle: pure column expression
    assert "python" not in plan.lower()  # and no UDF


def test_assign_split_nests_with_probabilistic_sample(spark):
    # same md5-prefix keyspace: the 'train' 80% split is exactly the
    # p=0.8 probabilistic sample of the same key
    from cardinalhq_otel_collector_spark.operators.sampling import assign_split

    df = spark.range(0, 5000).withColumn("key", F.col("id").cast("string"))
    train = {
        r["id"]
        for r in assign_split(df, "key", {"train": 0.8, "rest": 0.2})
        .filter(F.col("split") == "train")
        .collect()
    }
    p80 = {r["id"] for r in probabilistic_sample(df, "key", 0.8).collect()}
    assert train == p80


def test_rate_limit_hand_computed(spark):
    from datetime import datetime, timedelta

    from cardinalhq_otel_collector_spark.operators.sampling import rate_limit

    # key A hour 0 ordered by (ts, id): id2(0:01), id3(0:01), id1(0:05),
    # id4(0:50) -> limit 2 keeps ids 2,3; hour 1 id5 kept; key B id6 kept
    rows = [
        (1, "A", datetime(2026, 1, 1, 0, 5)),
        (2, "A", datetime(2026, 1, 1, 0, 1)),
        (3, "A", datetime(2026, 1, 1, 0, 1)),   # tie with 2 -> id breaks it
        (4, "A", datetime(2026, 1, 1, 0, 50)),
        (5, "A", datetime(2026, 1, 1, 1, 0)),
        (6, "B", datetime(2026, 1, 1, 0, 0)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "key", "ts"])
    out = rate_limit(df, ["key"], "ts", "hour", 2, order_cols=["event_id"])
    assert sorted(r["event_id"] for r in out.collect()) == [2, 3, 5, 6]


def test_heavy_hitters_hand_computed(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import heavy_hitters

    rows = (
        [("g1", "x")] * 3 + [("g1", "y")] * 3 + [("g1", "z")] * 1
        + [("g2", "q")] * 2
    )
    df = spark.createDataFrame(rows, ["g", "v"])
    out = {(r["g"], r["rank"]): (r["v"], r["n"])
           for r in heavy_hitters(df, ["g"], "v", k=2).collect()}
    # tie between x and y (3 each) -> value asc: x first
    assert out == {("g1", 1): ("x", 3), ("g1", 2): ("y", 3), ("g2", 1): ("q", 2)}


def test_weighted_sample_determinism_and_clamps(spark):
    from cardinalhq_otel_collector_spark.operators.sampling import weighted_sample

    rows = [(i, w) for i, w in enumerate([0, 100, 1000, 4000] * 50)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    kept = weighted_sample(df, "doc_id", "n_chars", rate=0.5, weight_scale=2000.0)
    ids = sorted(r.doc_id for r in kept.collect())
    # deterministic: second run identical
    assert ids == sorted(r.doc_id for r in kept.collect())
    by_w = {}
    for r in df.collect():
        by_w.setdefault(r.n_chars, []).append(r.doc_id in set(ids))
    # weight 0 → probability 0; weight 4000 → clamped to 1
    assert not any(by_w[0])
    assert all(by_w[4000])
    # monotone-ish: heavier weights keep more (50 draws per weight)
    assert sum(by_w[1000]) > sum(by_w[100])


def test_decimate_keeps_every_nth_from_first(spark):
    import datetime as dt

    from cardinalhq_otel_collector_spark.operators.sampling import decimate

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=i)) for u in (1, 2) for i in range(7)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    kept = decimate(df, ["user_id"], n=3, order_cols=["event_id"])
    got = sorted((r.user_id, r.event_id) for r in kept.collect())
    assert got == [(1, 0), (1, 3), (1, 6), (2, 0), (2, 3), (2, 6)]
    # n=1 keeps everything
    assert decimate(df, ["user_id"], n=1, order_cols=["event_id"]).count() == 14
