"""Drain-parity evidence (drainprocessor, manifest :244): on loghub-shaped
synthetic logs with known generative templates, the two-pass fingerprint +
LSH clustering must reconstruct the generative families — rows of one
family share a cluster (completeness) and families don't merge (purity).

The loghub-style corpus mixes purely-numeric variability (masking alone
collapses it) with word-valued variables (hostnames, levels) where masking
is NOT enough and the trigram-LSH merge has to do the work — the part of
Drain's job that a plain regexp_replace cannot cover.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cardinalhq_otel_collector_spark.operators.fingerprint import (
    fingerprint_and_cluster,
)

# generative templates, loghub-flavored (HDFS / Spark / Zookeeper shapes);
# {N} = numeric slot (masking collapses), {W} = word slot from a small
# vocabulary (needs LSH to merge)
_FAMILIES = {
    "hdfs_recv": "Receiving block blk_{N} src /10.0.0.{N}:{N} dest /10.0.0.{N}:{N}",
    "hdfs_alloc": "BLOCK NameSystem allocateBlock /user/job{N}/part-{N} blk_{N}",
    "spark_task": "Finished task {N} in stage {N} TID {N} in {N} ms on {W} executor {N}",
    "spark_mem": "Block broadcast_{N} stored as values in memory estimated size {N} KB free {N} MB",
    "zk_session": "Accepted socket connection from /10.1.1.{N}:{N} session 0x{N}",
    "auth_fail": "authentication failure for user{N} from host {W} retries {N}",
}
_WORDS = ["nodeA", "nodeB", "nodeC", "nodeD"]


def _corpus(spark, per_family: int = 400):
    rows = []
    for fam, tpl in _FAMILIES.items():
        for i in range(per_family):
            text, n = "", 0
            for part in tpl.split("{"):
                if part.startswith("N}"):
                    text += str(1000 + (i * 7 + n * 13) % 9000) + part[2:]
                elif part.startswith("W}"):
                    text += _WORDS[(i + n) % len(_WORDS)] + part[2:]
                else:
                    text += part
                n += 1
            rows.append((fam, text))
    return spark.createDataFrame(rows, "family string, text string")


def test_clusters_reconstruct_generative_families(spark):
    df = _corpus(spark)
    out = fingerprint_and_cluster(df).select("family", "cluster_id")
    stats = (
        out.groupBy("family")
        .agg(F.countDistinct("cluster_id").alias("n_clusters"))
        .collect()
    )
    # completeness: each family collapses to ONE cluster (masking handles
    # {N}; trigram LSH must absorb the {W} word variation)
    for r in stats:
        assert r["n_clusters"] == 1, f"{r['family']} split into {r['n_clusters']}"
    # purity: no two families share a cluster id
    m = out.groupBy("cluster_id").agg(F.countDistinct("family").alias("nf")).collect()
    assert all(r["nf"] == 1 for r in m), "distinct families merged"
    assert len(m) == len(_FAMILIES)


def _assignment_parity(spark, per_family: int = 200) -> float:
    """Pairwise-F1 between THIS engine's cluster assignments and a
    reference Drain (He et al. 2017, reimplemented from the paper in
    drain_reference.py) on the loghub-shaped corpus."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from drain_reference import DrainParser, pairwise_f1

    df = _corpus(spark, per_family=per_family).withColumn(
        "row_id", F.monotonically_increasing_id()
    )
    rows = df.select("row_id", "text").collect()

    drain = DrainParser(depth=4, st=0.5)
    for r in rows:
        drain.add(r["text"], r["row_id"])
    ref = drain.assignments()

    ours = {
        r["row_id"]: r["cluster_id"]
        for r in fingerprint_and_cluster(df).select("row_id", "cluster_id").collect()
    }
    return pairwise_f1(ours, ref)


def test_assignment_parity_with_reference_drain(spark):
    """Golden parity metric: deterministic corpus, deterministic clustering
    on both sides — the pairwise F1 is exact and pinned. 1.0 = identical
    groupings (the six generative families reconstruct on both sides)."""
    f1 = _assignment_parity(spark)
    assert f1 >= 0.95, f"drain parity regressed: pairwise F1 {f1:.4f}"
    # Re-tuning procedure (this pin is MEANT to block band/mask changes):
    # when deliberately retuning band geometry / shingles / masks, re-run
    # this test to re-derive the new F1, inspect WHY it moved (which
    # families split/merged), and only then update the pinned value in the
    # same commit as the tuning change. Never delete the pin.
    assert round(f1, 4) == 1.0, f"pinned parity changed: {f1:.4f}"


def test_assignment_parity_adversarial_corpus(spark):
    """Harder corpus aimed at the structural differences between online
    Drain and this engine's two-pass LSH clustering:

      * shared-prefix families ('Connection opened ...' / 'Connection
        closed ...') — Drain's depth keys see identical level-2/3 tokens,
        the trigram LSH sees high Jaccard;
      * a word-slot in the FIRST token ({W} host prefix) — our leading-
        token band guard splits what Drain's length+depth key may join;
      * short messages (fewer tokens than tree depth).

    The pinned pairwise F1 documents exactly how far the two algorithms
    agree on this shape — a tuning change to bands/shingles moves this
    number and fails the pin."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from drain_reference import DrainParser, pairwise_f1

    fams = {
        "conn_open": "Connection opened from 10.0.0.{N} port {N}",
        "conn_close": "Connection closed from 10.0.0.{N} port {N}",
        "first_word": "{W} rebooting after {N} failures",
        "short": "GC pause {N} ms",
        "short2": "GC done {N} ms",
    }
    words = ["alpha", "beta", "gamma"]
    rows = []
    for fam, tpl in fams.items():
        for i in range(150):
            text, n = "", 0
            for part in tpl.split("{"):
                if part.startswith("N}"):
                    text += str(100 + (i * 11 + n * 3) % 900) + part[2:]
                elif part.startswith("W}"):
                    text += words[(i + n) % len(words)] + part[2:]
                else:
                    text += part
                n += 1
            rows.append((fam, text))
    df = spark.createDataFrame(rows, "family string, text string").withColumn(
        "row_id", F.monotonically_increasing_id()
    )
    collected = df.select("row_id", "text").collect()
    drain = DrainParser(depth=4, st=0.5)
    for r in collected:
        drain.add(r["text"], r["row_id"])
    ref = drain.assignments()
    ours = {
        r["row_id"]: r["cluster_id"]
        for r in fingerprint_and_cluster(df).select("row_id", "cluster_id").collect()
    }
    f1 = pairwise_f1(ours, ref)
    print(f"adversarial drain parity pairwise F1 = {f1:.4f}")
    # tuned: 4 bands x 3 hashes reaches exact agreement here (the old
    # 4x2 geometry coin-flip merged the shared-prefix shorts: F1 0.8113)
    # Re-tuning procedure: as in test_assignment_parity_with_reference_drain
    # — re-derive the F1 under the new geometry, understand the family-level
    # diff, then update this pin deliberately in the tuning commit. Never
    # delete the pin to make a tuning change pass.
    assert round(f1, 4) == 1.0, f"pinned adversarial parity changed: {f1:.4f}"
