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

  pass 2 (distinct templates only): char-trigram MinHash over the
          *distinct* template strings, band-bucket LSH, then DISTRIBUTED
          connected components (iterative min-label propagation over band
          buckets) → ``cluster_id`` (= min fingerprint of the component, so
          ids are stable under any input order/partitioning). The driver
          never holds the template set: for log-shaped text templates are
          code sites (tiny), but free-form agent-transcript turns do NOT
          collapse under masking — distinct templates can approach distinct
          texts, so every stage here is a DataFrame op (explode → groupBy →
          iterative join), O(templates · bands) shuffle, no collect.

Label propagation converges in O(component diameter in band-graph hops)
iterations; each iteration is one groupBy + two joins + one scalar action
(a decimal label-sum, strictly decreasing until the fixpoint).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "mask_template",
    "fingerprint",
    "template_bands",
    "cluster_templates",
    "attach_clusters",
    "fingerprint_and_cluster",
]

_MASKS: list[tuple[str, str]] = [
    # uuid before hex before number — order matters.
    (r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}", "<id>"),
    (r"\b[0-9a-fA-F]{8,}\b", "<hex>"),  # case-insensitive: DEADBEEF09 masks too
    (r"\d+", "<num>"),
]


def mask_template(col: Column) -> Column:
    out = col
    for pat, mask in _MASKS:
        out = F.regexp_replace(out, pat, mask)
    return out


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pass 1: template + fingerprint columns (pure projection).

    NULL text yields a NULL template (valid input — TRANSCRIPT_SCHEMA marks
    text nullable); clustering skips NULL templates and leaves cluster_id
    NULL for those rows.
    """
    tpl = mask_template(F.col(text_col))
    return df.withColumn("template", tpl).withColumn("fingerprint", F.xxhash64(tpl))


def template_bands(
    templates: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """(fingerprint, band-bucket key) rows via char-trigram MinHash LSH.

    All JVM expressions (explode over positions + min-aggregate per seed —
    deliberately NO higher-order-function lambdas: stacked ``F.transform``
    lambdas corrupted each other when Catalyst collapsed projections on
    PySpark 4.1). The recipe is byte-compatible with the previous
    driver-side implementation: grams = {t[i:i+3] | 0 ≤ i < max(len-2, 1)},
    hash s = min over grams of md5("<s>|" + gram), band key =
    "<b>#h_{b·size}#…".
    """
    tpl = (
        templates.select("template", "fingerprint")
        .where(F.col("template").isNotNull())
        .distinct()
    )
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length("template") - 2, F.lit(1)))
    ).alias("pos")
    grams = (
        tpl.select("fingerprint", "template", pos)
        .select(
            "fingerprint",
            F.col("template").substr(F.col("pos"), F.lit(3)).alias("g"),
        )
        .distinct()
    )
    sig = grams.groupBy("fingerprint").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{s}|"), F.col("g")))).alias(f"h{s}")
            for s in range(n_hashes)
        ]
    )
    n_bands = n_hashes // band_size
    out: DataFrame | None = None
    for b in range(n_bands):
        cols = [F.lit(str(b))] + [
            F.col(f"h{b * band_size + j}") for j in range(band_size)
        ]
        part = sig.select("fingerprint", F.concat_ws("#", *cols).alias("band"))
        out = part if out is None else out.unionByName(part)
    return out


def _propagate_min_labels(bands: DataFrame, max_iters: int = 50) -> DataFrame:
    """Distributed connected components over the template↔band bipartite
    graph: labels start as fingerprints; each round every band bucket takes
    the min label of its members and every member takes the min over its
    buckets. Fixpoint = every component labeled with its min fingerprint —
    identical to union-find, but the driver never sees a template.
    """
    labels = (
        bands.select("fingerprint").distinct().withColumn("label", F.col("fingerprint"))
    )
    labels = labels.localCheckpoint(eager=True)
    prev_sum = labels.agg(F.sum(F.col("label").cast("decimal(38,0)"))).collect()[0][0]
    for _ in range(max_iters):
        banded = bands.join(labels, "fingerprint")
        bmin = banded.groupBy("band").agg(F.min("label").alias("bmin"))
        prop = (
            banded.join(bmin, "band")
            .groupBy("fingerprint")
            .agg(F.min("bmin").alias("plabel"))
        )
        new_labels = (
            labels.join(prop, "fingerprint", "left")
            .select(
                "fingerprint",
                F.least(
                    F.col("label"), F.coalesce(F.col("plabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)  # truncate lineage between rounds
        )
        new_sum = new_labels.agg(
            F.sum(F.col("label").cast("decimal(38,0)"))
        ).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:  # min-propagation strictly decreases until fixpoint
            break
        prev_sum = new_sum
    return labels


def cluster_templates(
    templates: DataFrame, n_hashes: int = 8, band_size: int = 2
) -> DataFrame:
    """Pass 2: (template, fingerprint) → + cluster_id.

    Input should be the DISTINCT (template, fingerprint) pairs. Fully
    distributed: band generation is explode+groupBy, component resolution
    is iterative min-label propagation — no driver-side collect, so
    free-text template sets that don't collapse under masking (agent
    transcripts) cannot OOM the driver. cluster_id = min fingerprint in the
    LSH-connected component (order/partitioning independent). NULL
    templates pass through with NULL cluster_id.
    """
    bands = template_bands(templates, n_hashes, band_size)
    mapping = _propagate_min_labels(bands).withColumnRenamed("label", "cluster_id")
    return templates.join(mapping, "fingerprint", "left")


def attach_clusters(df: DataFrame) -> DataFrame:
    """Given a frame that already has (template, fingerprint) columns
    (pass 1), compute the cluster map from its distinct templates and join
    it back. Call this AFTER persisting the upstream frame: the
    distinct-template scan then reads the cache instead of recomputing the
    whole chain (the two-pass structure of SURVEY.md §7 step 5). The join
    is left to AQE: broadcast when the template set is small (the log-
    shaped common case), shuffle join when free text blows it up."""
    distinct = df.select("template", "fingerprint").distinct()
    clustered = cluster_templates(distinct).select("fingerprint", "cluster_id").distinct()
    return df.join(clustered, "fingerprint", "left")


def fingerprint_and_cluster(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Full S2: rows → + template, fingerprint, cluster_id."""
    return attach_clusters(fingerprint(df, text_col))
