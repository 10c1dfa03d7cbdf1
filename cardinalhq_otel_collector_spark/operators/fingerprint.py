"""S2 — token-pattern fingerprinting + template clustering.

The reference runs Drain-style online log-template mining (drainprocessor,
manifest :244) and CardinalHQ trigram fingerprinting (oteltools, called
from the chqdecorator stage — docs/flow/flow.dot:34). Online Drain is
order-dependent; a distributed engine must not be, so this is a
**deterministic two-pass design** (SURVEY.md §7 risk (a)):

  pass 1 (vectorized, all rows): mask volatile tokens
          (uuid → <id>, long hex → <hex>, number runs → <num>) →
          ``template`` string; ``fingerprint = xxhash64(template)``.
          Pure expressions, no shuffle beyond what downstream needs.

  pass 2 (distinct templates only — tiny by construction): char-trigram
          MinHash over the *distinct* template strings, band-bucket LSH,
          then union-find on the driver over band collisions →
          ``cluster_id`` (= min fingerprint of the cluster, so ids are
          stable under any input order/partitioning). The mapping is
          broadcast-joined back — rows never leave the JVM.

At 10^12 rows the distinct-template set stays log-structured-small
(templates are code sites, not data), so pass 2 is O(templates), not
O(rows) — the scale-critical property.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mask_template",
    "fingerprint",
    "cluster_templates",
    "attach_clusters",
    "fingerprint_and_cluster",
]

_MASKS: list[tuple[str, str]] = [
    # uuid before hex before number — order matters.
    (r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", "<id>"),
    (r"\b[0-9a-f]{8,}\b", "<hex>"),
    (r"\d+", "<num>"),
]


def mask_template(col: Column) -> Column:
    out = col
    for pat, mask in _MASKS:
        out = F.regexp_replace(out, pat, mask)
    return out


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pass 1: template + fingerprint columns (pure projection)."""
    tpl = mask_template(F.col(text_col))
    return df.withColumn("template", tpl).withColumn("fingerprint", F.xxhash64(tpl))


def _minhash_bands_py(template: str, n_hashes: int, band_size: int) -> list[str]:
    """Char-trigram MinHash band keys for one template (driver-side).

    Each of the ``n_hashes`` hash functions is md5(seed || trigram),
    minimized lexicographically; bands of ``band_size`` consecutive hashes
    concatenated → LSH bucket keys. Plain Python by design: this runs on
    the *distinct-template* set only (already collected for union-find),
    never on the row stream. A first cut used Spark higher-order functions
    here, but stacked ``F.transform`` lambdas corrupted each other when
    Catalyst collapsed projections (session-state-dependent lambda-variable
    capture observed on PySpark 4.1), so pass 2 is deliberately
    driver-side and exactly as deterministic as the template set.
    """
    import hashlib

    grams = {template[i : i + 3] for i in range(max(len(template) - 2, 1))}
    sig = [
        min(hashlib.md5((f"{s}|" + g).encode("utf-8")).hexdigest() for g in grams)
        for s in range(n_hashes)
    ]
    n_bands = n_hashes // band_size
    return [
        "#".join([str(b)] + sig[b * band_size : (b + 1) * band_size])
        for b in range(n_bands)
    ]


def cluster_templates(
    templates: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Pass 2: (template, fingerprint) → + cluster_id.

    Input must be the DISTINCT templates (small). Band collisions are
    resolved by union-find on the driver; cluster_id = min fingerprint in
    the cluster (order-independent, stable).
    """
    rows = [
        {"fingerprint": r["fingerprint"],
         "bands": _minhash_bands_py(r["template"], n_hashes, band_size)}
        for r in templates.select("template", "fingerprint").collect()
    ]  # distinct templates only — tiny
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    bucket_to_fp: dict[str, int] = {}
    for r in rows:
        for band in r["bands"]:
            if band in bucket_to_fp:
                union(bucket_to_fp[band], r["fingerprint"])
            else:
                bucket_to_fp[band] = r["fingerprint"]
    # cluster id = min fingerprint reachable; second pass for canonical min
    cluster_of = {r["fingerprint"]: find(r["fingerprint"]) for r in rows}
    roots: dict[int, int] = {}
    for fp, root in cluster_of.items():
        roots[root] = min(roots.get(root, fp), fp)
    mapping = [(fp, roots[root]) for fp, root in cluster_of.items()]
    spark = templates.sparkSession
    map_df = spark.createDataFrame(mapping, "fingerprint long, cluster_id long")
    return templates.join(F.broadcast(map_df), "fingerprint", "left")


def attach_clusters(df: DataFrame) -> DataFrame:
    """Given a frame that already has (template, fingerprint) columns
    (pass 1), compute the cluster map from its distinct templates and
    broadcast-join it back. Call this AFTER persisting the upstream frame:
    the distinct-template scan then reads the cache instead of recomputing
    the whole chain (the two-pass structure of SURVEY.md §7 step 5)."""
    distinct = df.select("template", "fingerprint").distinct()
    clustered = cluster_templates(distinct).select("fingerprint", "cluster_id").distinct()
    return df.join(F.broadcast(clustered), "fingerprint", "left")


def fingerprint_and_cluster(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full S2: rows → + template, fingerprint, cluster_id."""
    return attach_clusters(fingerprint(df, text_col))
