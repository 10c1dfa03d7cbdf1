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
