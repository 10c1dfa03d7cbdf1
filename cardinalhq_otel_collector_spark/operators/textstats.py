"""Text analysis operators (training-data pipeline ops): language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions. The BPE-ish token estimate uses a regex
word/punct segmentation (regexp_count), the standard cheap proxy when a
real tokenizer isn't available on the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "token_counts",
    "quality_score",
    "lang_id",
    "doc_fingerprint",
    "build_vocab",
    "tfidf_topk",
    "repetition_stats",
    "chunk_documents",
    "normalize_text",
    "pmi_collocations",
    "token_entropy",
    "remove_high_df_tokens",
    "bm25_topk",
    "unigram_surprisal",
    "oov_rate",
    "ctfidf_topk",
]

# tiny per-language stopword marker lists (public-knowledge heuristics)
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "y", "es"],
    "fr": ["le", "la", "les", "et", "est"],
}


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + a BPE-ish subword estimate (≈ chars/4 bounded
    below by word count — the common back-of-envelope token estimator)."""
    ws = F.size(F.split(F.col(text_col), " "))
    bpe_ish = F.greatest(ws, F.ceil(F.length(text_col) / 4).cast("int"))
    return (
        df.withColumn("n_ws_tokens", ws)
        .withColumn("n_chars", F.length(text_col))
        .withColumn("n_tokens_est", bpe_ish)
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / type-token-ratio quality features + a single
    [0,1] score (monotone combination; thresholds are config, not magic)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    punct_ratio = (
        F.length(F.regexp_replace(F.col(text_col), r"[^\p{Punct}]", "")) / F.length(text_col)
    )
    mean_word_len = (F.length(F.col(text_col)) - n + 1) / n
    score = (
        F.when(n < 5, 0.0)
        .otherwise(
            F.least(F.lit(1.0), n / 64)
            * distinct_ratio
            * (1 - F.least(F.lit(1.0), punct_ratio * 4))
        )
    )
    return (
        df.withColumn("n_tokens", n)
        .withColumn("distinct_ratio", F.round(distinct_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("mean_word_len", F.round(mean_word_len, 4))
        .withColumn("quality", F.round(score, 4))
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: count stopword hits per language, pick the
    argmax (ties → first by fixed language order). greatest over per-lang
    counts keeps it one projection."""
    out = df
    for lang, words in _LANG_MARKERS.items():
        hits = F.lit(0)
        for w in words:
            hits = hits + F.regexp_count(F.col(text_col), F.lit(rf"\b{w}\b"))
        out = out.withColumn(f"hits_{lang}", hits)
    langs = list(_LANG_MARKERS)
    guess = F.lit(langs[0])
    best_hits = F.col(f"hits_{langs[0]}")
    for lang in langs[1:]:
        guess = F.when(F.col(f"hits_{lang}") > best_hits, F.lit(lang)).otherwise(guess)
        best_hits = F.greatest(best_hits, F.col(f"hits_{lang}"))
    return out.withColumn("lang_guess", guess)


def doc_fingerprint(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint: xxhash64 of the full text plus a
    winnowing-style representative hash (min md5 over char windows) that is
    robust to small edits — the classic local-fingerprint scheme."""
    pos = F.explode(
        F.sequence(F.lit(1), F.greatest(F.length(text_col) - (window - 1), F.lit(1)))
    ).alias("pos")
    wins = df.select("*", pos).withColumn(
        "whash", F.md5(F.col(text_col).substr(F.col("pos"), F.lit(window)))
    )
    gb_cols = [c for c in df.columns]
    return (
        wins.groupBy(*gb_cols)
        .agg(F.min("whash").alias("winnow_fp"))
        .withColumn("full_fp", F.xxhash64(F.col(text_col)))
    )


def build_vocab(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Corpus vocabulary with document frequencies (training-data
    pipeline op): token → total count + number of documents containing
    it, dropping tokens below ``min_count`` total occurrences — the
    standard vocab/min-count pass before tokenizer training.

    One explode + one hash aggregate; partial (map-side) aggregation
    makes the shuffle carry only distinct (partition, token) pairs, so
    at 100 TB the shuffle is bounded by vocabulary size × partitions,
    not corpus size. Single-space tokenization for engine portability.
    """
    return (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .filter(F.col("n_total") >= min_count)
    )


def tfidf_topk(
    df: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document (training-data pipeline op:
    keyword extraction / topic features before mixing).

    tf = in-document count, idf = ln(N / df_t) with N = corpus document
    count and df_t = documents containing the term; score = tf · idf
    rounded to 6 places; ties break on the term ascending so results
    are deterministic across engines.

    Shape: explode → (doc, term) count → term doc-frequencies → join —
    the doc-frequency side is vocabulary-sized, so Spark broadcasts it
    under AQE; N arrives as a broadcast 1-row aggregate, not a driver
    round-trip. The only corpus-sized shuffles are the two hash
    aggregates and the per-doc top-k window.
    """
    from pyspark.sql import Window

    tok = df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term"))
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    n = df.agg(F.countDistinct(id_col).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("__n") / F.col("df_t")), 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "tf", "df_t", "tfidf", "term_rank")
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals — the Gopher-rule family of
    quality filters (duplicate-token mass, most-frequent-token mass,
    duplicate-bigram mass) used to drop boilerplate / keyboard-mash /
    template spam from training corpora.

    Shape at scale: posexplode to (doc, pos, token) — the same fan-out
    build_vocab already pays — then ONE hash aggregate keyed (doc,
    token) with map-side combine, and a doc-local lead() window for
    bigrams whose partitions are single documents (bounded by document
    length, never corpus-sized). The final join is between two
    doc-keyed aggregates co-partitioned by the same key.

    Fractions are plain double divisions of exact counts, so an
    independent engine computing the same counts reproduces them
    bit-for-bit.
    """
    from pyspark.sql import Window

    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    wc = words.groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("c"))
    uni = wc.groupBy(id_col).agg(
        F.sum("c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.max("c").alias("top_c"),
    )
    doc_w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = (
        words.withColumn("w2", F.lead("w").over(doc_w))
        .filter(F.col("w2").isNotNull())
        .groupBy(id_col, "w", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.count(F.lit(1)).alias("n_distinct_bigrams"),
        )
    )
    one = F.lit(1.0)
    return (
        uni.join(bigrams, id_col, "left")
        .select(
            F.col(id_col),
            F.col("n_words"),
            F.col("n_distinct_words"),
            (one - F.col("n_distinct_words") / F.col("n_words")).alias(
                "dup_word_frac"
            ),
            (F.col("top_c") / F.col("n_words")).alias("top_word_frac"),
            F.when(
                F.col("n_bigrams").isNotNull(),
                one - F.col("n_distinct_bigrams") / F.col("n_bigrams"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_bigram_frac"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the standard pre-tokenization
    splitter for long documents in a training-data pipeline: chunk i
    covers whitespace tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap, so consecutive chunks share
    ``overlap`` tokens of context. The last chunk may be short but
    always contributes at least one previously-unchunked token
    (n_chunks = 1 if n <= chunk_tokens else 1 + ceil((n - chunk_tokens)
    / stride)).

    Shape at scale: narrow plan — split + explode of per-doc chunk
    indices + array slice; zero shuffles, output rows proportional to
    corpus tokens / stride. Integer-only math (no float chunk counts),
    deterministic chunk_idx.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    ws = F.split(F.col(text_col), " ")
    n = F.size(ws)
    # integer ceil((n - chunk)/stride) without float division
    extra = F.floor(
        (n - F.lit(chunk_tokens) + F.lit(stride - 1)) / F.lit(stride)
    ).cast("int")
    n_chunks = F.when(n <= F.lit(chunk_tokens), F.lit(1)).otherwise(1 + extra)
    exploded = df.select(
        F.col(id_col),
        ws.alias("__ws"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    return exploded.select(
        id_col,
        "chunk_idx",
        F.array_join(
            F.slice(F.col("__ws"), start + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
        F.least(F.lit(chunk_tokens), F.col("__n") - start)
        .cast("int")
        .alias("n_tokens"),
    )


def normalize_text(
    df: DataFrame, text_col: str = "text", out_col: str = "text_norm"
) -> DataFrame:
    """Canonicalize text before dedup/fingerprinting (the standard
    pre-dedup normalizer: near-dup recall improves when case, URLs,
    addresses, and whitespace runs stop differentiating copies):
    lowercase → URLs/emails replaced by a space → whitespace runs
    collapsed → trimmed. Pure narrow projection; the regexes are
    dialect-portable (character classes only — no lookarounds, no \\b),
    so an independent engine applying the same chain is byte-identical.
    """
    t = F.lower(F.col(text_col))
    t = F.regexp_replace(t, r"https?://[^ ]+", " ")
    t = F.regexp_replace(t, r"[a-z0-9._%+-]+@[a-z0-9.-]+", " ")
    t = F.regexp_replace(t, r"  +", " ")
    return df.withColumn(out_col, F.trim(t))


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k collocations by pointwise mutual information — the classic
    corpus-statistics pass for multiword expressions (phrase tables,
    tokenizer merges): pmi(w1,w2) = ln(c12 · N / (c1 · c2)) over
    adjacent-token bigrams, N = total bigram count, with a min bigram
    count floor to kill singleton noise.

    Determinism: every input to the pmi expression is an exact integer
    count; the multiply/divide tree is IEEE-exact, and the one
    transcendental (ln — correctly-rounded in no stdlib, engines may
    differ by 1 ulp) is rounded to 6 places, the same discipline as
    tfidf_topk. Ties (and the global ordering) break on (rounded pmi
    desc, w1, w2), so the top-k set is unique and engine-independent.

    Shape at scale: one (doc,pos,token) fan-out → doc-local lead()
    bigrams (partitions bounded by doc length) → two vocabulary-sized
    hash aggs; unigram counts join back onto the bigram table
    (vocabulary-sized, AQE broadcasts); top-k is a TakeOrdered, never a
    full global sort.
    """
    words = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    )
    doc_w = Window.partitionBy(id_col).orderBy("pos")
    big = (
        words.withColumn("w2", F.lead("w").over(doc_w))
        .filter(F.col("w2").isNotNull())
        .select(F.col("w").alias("w1"), "w2")
    )
    # Round-6 single-pass shape (guide §2.4): the previous formulation
    # referenced ``big`` four times (c12, both unigram legs, N), so the
    # explode + doc-window chain planned — and without AQE stage reuse,
    # ran — four times over the corpus. Aggregate the bigram table ONCE;
    # unigram counts and N are exact integer rollups OF that table
    # (c(w) = Σ_w2 c12(w,·) + Σ_w1 c12(·,w), N = Σ c12), so every
    # downstream branch re-derives from the vocabulary²-sized aggregate
    # instead of the corpus. Counts are identical integers.
    c12_all = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    c12 = c12_all
    uni = (
        c12_all.select(F.col("w1").alias("w"), "c12")
        .unionAll(c12_all.select(F.col("w2").alias("w"), "c12"))
        .groupBy("w")
        .agg(F.sum("c12").alias("c"))
    )
    n = c12_all.agg(F.sum("c12").alias("__n"))
    scored = (
        c12.filter(F.col("c12") >= min_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    F.col("c12").cast("double") * F.col("__n")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ),
        )
    )
    return (
        scored.select("w1", "w2", "c12", "pmi")
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
    )


def token_entropy(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Shannon entropy (nats) of each document's token distribution — a
    diversity quality signal (near-zero entropy = the degenerate
    repeated-token documents that survive length/punctuation filters;
    see repetition_stats for the Gopher-style mass variants).

    H = ln(L) - (1/L)·Σ c_i·ln(c_i) over per-doc token counts c_i,
    L = Σ c_i — the algebraic form that keeps every ln argument an
    exact integer. Determinism discipline matches pmi_collocations:
    integer counts in, one rounding of the final double to 6 places.

    Shape at scale: one token fan-out → (doc, token) hash agg →
    per-doc sum — partial aggregation everywhere, partitions bounded
    by document length, no windows, no joins.
    """
    counts = (
        df.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        counts.groupBy(id_col)
        .agg(
            F.sum("c").alias("__len"),
            F.sum(F.col("c").cast("double") * F.log(F.col("c").cast("double"))).alias("__clnc"),
        )
        .select(
            id_col,
            F.col("__len").alias("n_tokens"),
            F.round(
                F.log(F.col("__len").cast("double"))
                - F.col("__clnc") / F.col("__len").cast("double"),
                6,
            ).alias("entropy"),
        )
    )


def remove_high_df_tokens(
    df: DataFrame,
    max_df_ratio: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Boilerplate pruning by document frequency — the C4-style "drop
    units that appear in too many documents" pass, at token granularity
    (this corpus has no line structure; swap the unit by splitting on
    newlines instead of spaces and the algorithm is line-level C4
    boilerplate/dedup removal verbatim).

    Any token present in MORE than ``max_df_ratio`` of all documents is
    removed everywhere; each document's surviving tokens are
    re-assembled in original order. Output: id, text_filtered,
    n_kept / n_removed counts.

    Shape at scale (round 6): a token's keep/drop decision depends only
    on the token string, never the position, so the document is never
    taken apart. The removed-token set is computed vocabulary-sized
    (explode of array_distinct per doc -> one map-side-combined count —
    the same integers as countDistinct(doc) over raw tokens), reduced
    to the tokens OVER the threshold (a handful by construction: they
    must appear in >ratio of ALL documents), collected into a one-row
    array and broadcast-cross-joined back; each document then filters
    its own split array in place. The token-level broadcast join and
    the array_sort(collect_list(struct)) reassembly shuffle of every
    token occurrence are gone — no data-sized exchange remains, only
    the vocab-sized aggregate. The threshold compare is the identical
    double multiply as before (strict complement: drop iff
    n_docs > ratio · total), so the kept set is bit-for-bit the same.
    """
    dfreq = (
        df.select(
            F.explode(
                F.array_distinct(F.split(F.col(text_col), " "))
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__ndocs"))
    )
    total = df.select(F.count(F.lit(1)).alias("__total"))
    # Exactly one row always (global agg): empty set -> empty array.
    bad = (
        dfreq.crossJoin(F.broadcast(total))
        .where(
            F.col("__ndocs").cast("double")
            > F.col("__total").cast("double") * F.lit(float(max_df_ratio))
        )
        .agg(F.collect_set("w").alias("__bad"))
    )
    toks = df.crossJoin(F.broadcast(bad)).select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("__toks"),
        F.filter(
            F.split(F.col(text_col), " "),
            lambda x: ~F.array_contains(F.col("__bad"), x),
        ).alias("__kept"),
    )
    return toks.select(
        F.col(id_col),
        F.array_join(F.col("__kept"), " ").alias("text_filtered"),
        F.size("__kept").cast("long").alias("n_kept"),
        (F.size("__toks") - F.size("__kept")).cast("long").alias("n_removed"),
    )


def bm25_topk(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """Top-k documents by BM25 for a FIXED term list (Robertson/
    Sparck Jones; the Lucene idf form ln(1 + (N-df+0.5)/(df+0.5)),
    which never goes negative). The classic lexical retrieval baseline
    next to the embedding ANN ladder.

    Determinism: term frequencies are conditional counts in ONE hash
    aggregate (exact integers, one fixed column per term — never a
    float sum over a data-dependent order); corpus stats (N, total
    length, per-term document frequencies) ride in as a one-row
    broadcast; the score is one fixed IEEE expression tree per
    document, summed over terms in literal term order, rounded to 6
    places. Top-k is TakeOrdered on (score DESC, id) — unique, never
    a global sort.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("__w")
    ).where(F.col("__w") != "")
    per_doc = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__len"),
        *[
            F.sum(F.when(F.col("__w") == t, 1).otherwise(0)).alias(f"__tf{i}")
            for i, t in enumerate(terms)
        ],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("__N"),
        F.sum("__len").alias("__total_len"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(terms))
        ],
    )
    scored = per_doc.join(F.broadcast(stats))
    avg_len = F.col("__total_len").cast("double") / F.col("__N").cast("double")
    score = None
    for i in range(len(terms)):
        tf = F.col(f"__tf{i}").cast("double")
        dfreq = F.col(f"__df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("__N").cast("double") - dfreq + F.lit(0.5)) / (dfreq + F.lit(0.5))
        )
        denom = tf + F.lit(k1) * (
            F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("__len").cast("double") / avg_len)
        )
        term_score = idf * (tf * F.lit(k1 + 1.0)) / denom
        score = term_score if score is None else (score + term_score)
    any_hit = None
    for i in range(len(terms)):
        c = F.col(f"__tf{i}") > 0
        any_hit = c if any_hit is None else (any_hit | c)
    ranked = (
        scored.where(any_hit)
        .withColumn("__score", score)
        .orderBy(F.col("__score").desc(), F.col(id_col).asc())
        .limit(topk)
    )
    return ranked.select(
        id_col,
        *[F.col(f"__tf{i}").alias(f"tf_{t}") for i, t in enumerate(terms)],
        F.col("__len").alias("doc_len"),
        F.round(F.col("__score"), 6).alias("bm25"),
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Perplexity-proxy quality scoring: mean unigram surprisal
    -(1/n)·Σ ln p(w) per document, with p(w) the corpus unigram MLE —
    the cheap stand-in for an LM perplexity filter (high = rare-token
    soup, low = repetitive boilerplate; both tails get filtered in
    corpus prep).

    Determinism: token and corpus counts are exact integers; each
    occurrence's surprisal tf·ln(T/cf) is ONE fixed IEEE tree, cast to
    DECIMAL(28,12) BEFORE the per-document sum — decimal addition is
    exact and commutative, so the sum is partition-order-independent
    (the float-sum trap every naive implementation hits); the mean is
    a single double division rounded to 6.

    Plan: one (doc, token) count aggregate, a token-frequency join
    (shuffle on token — the vocabulary), a one-row broadcast total,
    one final per-doc aggregate.
    """
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("__w")
    ).where(F.col("__w") != "")
    tf = toks.groupBy(id_col, "__w").agg(F.count(F.lit(1)).alias("__tf"))
    cf = toks.groupBy("__w").agg(F.count(F.lit(1)).alias("__cf"))
    total = cf.agg(F.sum("__cf").alias("__T"))
    term = (
        F.col("__tf").cast("double")
        * F.log(F.col("__T").cast("double") / F.col("__cf").cast("double"))
    ).cast("decimal(28,12)")
    return (
        tf.join(cf, "__w")
        .join(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.sum("__tf").alias("n_tokens"),
            F.sum(term).alias("__s"),
        )
        .select(
            id_col,
            "n_tokens",
            F.round(
                F.col("__s").cast("double") / F.col("n_tokens").cast("double"), 6
            ).alias("mean_surprisal"),
        )
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Out-of-vocabulary profile per document against the corpus top-K
    vocabulary — the tokenizer-prep question ('how much of each doc
    will fall to <unk>/byte-fallback at this vocab size'). The top-K
    cut is (frequency DESC, token ASC) — unique, TakeOrdered-shaped,
    config-bounded — and rides back as a broadcast semi-join set; the
    per-doc numbers are exact integers.
    """
    toks = df.select(
        id_col, F.explode(F.split(F.col(text_col), " ")).alias("__w")
    ).where(F.col("__w") != "")
    vocab = (
        toks.groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cf"))
        .orderBy(F.col("__cf").desc(), F.col("__w").asc())
        .limit(vocab_size)
        .select("__w", F.lit(1).alias("__in_vocab"))
    )
    return (
        toks.join(F.broadcast(vocab), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
    )


def ctfidf_topk(
    df: DataFrame,
    cluster_col: str,
    text_col: str = "text",
    topk: int = 5,
) -> DataFrame:
    """Distinctive terms per cluster via c-TF-IDF (the BERTopic
    labeling rule): score = tf_in_cluster * ln(1 + n_clusters /
    df_clusters), where df counts CLUSTERS containing the term — a
    term every cluster shares scores near tf*ln(2)·0, a term unique to
    one cluster gets the full idf boost. The topic-labeling primitive
    for template/near-dup cluster maps.

    Integer tf/df/N into one fixed IEEE tree (pmi discipline, round-6
    in the output, rank on the unrounded double); per-cluster top-k by
    (score DESC, token ASC) — unique. Two hash aggregates + a
    vocabulary-keyed join + a cluster-partitioned rank window.
    """
    toks = df.select(
        F.col(cluster_col).alias("cluster"),
        F.explode(F.split(F.col(text_col), " ")).alias("__w"),
    ).where(F.col("__w") != "")
    tf = toks.groupBy("cluster", "__w").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("__w").agg(F.count(F.lit(1)).alias("__df"))
    n_clusters = tf.select("cluster").distinct().agg(
        F.count(F.lit(1)).alias("__N")
    )
    score = F.col("tf").cast("double") * F.log(
        F.lit(1.0) + F.col("__N").cast("double") / F.col("__df").cast("double")
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("__score").desc(), F.col("__w").asc()
    )
    return (
        tf.join(dfc, "__w")
        .join(F.broadcast(n_clusters))
        .withColumn("__score", score)
        .withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= topk)
        .select(
            "cluster",
            F.col("__w").alias("token"),
            "tf",
            F.round(F.col("__score"), 6).alias("ctfidf"),
        )
    )
