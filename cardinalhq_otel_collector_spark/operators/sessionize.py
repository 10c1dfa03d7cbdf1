"""Inactivity-gap sessionization (log/transcript pipeline primitive):
split each user's (or conversation's) event stream into sessions
wherever the gap between consecutive events exceeds a threshold — the
batch equivalent of a session window (the streaming side of this repo
uses Structured Streaming's built-in ``session_window`` semantics; this
operator is the deterministic batch/backfill formulation).

Shape at scale: ONE shuffle on the entity key; both the lag() and the
running sum ride the same window partitioning, so Catalyst plans a
single Exchange + sort. Partitions are per-entity event lists — bounded
by entity activity, never corpus-sized. A pathological single entity
behaves like any skewed window; salt upstream if one key dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize", "session_stats", "transition_counts", "interarrival_stats", "path_mining", "reply_latency_stats", "basket_lift", "run_length_encode", "state_dwell"]


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
    out_col: str = "session_idx",
) -> DataFrame:
    """Assign a 0-based per-entity session index; a new session starts
    when the gap to the previous event exceeds ``gap_seconds``
    (strictly greater — an exactly-gap-long pause stays in-session).

    ``order_cols`` break timestamp ties deterministically (pass the
    event's primary key); ordering is (ts, *order_cols) so the
    assignment is stable across partitionings and retries.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    # integer-microsecond gap math: exact, engine-dialect-proof (no
    # float epoch rounding)
    prev_us = F.lag(F.unix_micros(F.col(ts_col).cast("timestamp"))).over(w)
    cur_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_sess = F.when(
        prev_us.isNull() | (cur_us - prev_us > F.lit(gap_seconds * 1_000_000)),
        1,
    ).otherwise(0)
    running = Window.partitionBy(entity_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("__new", new_sess).withColumn(
        out_col, (F.sum("__new").over(running) - 1).cast("int")
    ).drop("__new")


def session_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-session rollup on top of :func:`sessionize`: event count,
    start/end, and exact integer-microsecond duration per (entity,
    session). The groupBy keys on (entity, session_idx) — already
    co-partitioned with the sessionize window's entity shuffle, so the
    rollup adds a partial-agg + the one existing Exchange, and session
    counts are bounded by entity activity, never corpus-sized.
    """
    sess = sessionize(df, entity_col, ts_col, gap_seconds, order_cols)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return sess.groupBy(entity_col, "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


def transition_counts(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences (user-journey analysis): for each consecutive pair of
    events within an entity's (ts, tiebreak)-ordered stream, count the
    (from_state, to_state) transition and attach the conditional
    probability P(to|from).

    Shape at scale: the lag() window shuffles once on the entity key;
    the (from, to) count is a states^2-sized hash agg (map-side
    combinable), and the per-from total is derived from the counts
    themselves by a second tiny agg + broadcast-sized join — the raw
    events are scanned exactly once. The probability is an exact
    int/int double division, bit-identical across engines.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    pairs = (
        df.withColumn("__prev", F.lag(F.col(state_col)).over(w))
        .filter(F.col("__prev").isNotNull())
        .select(F.col("__prev").alias("from_state"), F.col(state_col).alias("to_state"))
    )
    counts = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )
    # per-from totals as a window over the states²-sized counts frame —
    # the previous totals-agg + join referenced ``counts`` twice, which
    # re-planned (and could re-run) the whole scan+lag chain per branch
    # (guide §2.4); same exact integer total, one pass
    wt = Window.partitionBy("from_state")
    return counts.withColumn(
        "prob",
        F.col("n").cast("double") / F.sum("n").over(wt).cast("double"),
    )


def interarrival_stats(
    df: DataFrame,
    entity_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-entity inter-arrival-time summary (cadence profiling: bot
    detection, polling-interval discovery, SLO heartbeat checks): gap
    count and min/max/mean gap over consecutive events in the
    (ts, tiebreak)-ordered stream, in exact integer microseconds
    (mean = exact int-sum / int-count double division).

    One lag window + one hash agg on the window's own partitioning —
    single Exchange, same scale shape as sessionize. Entities with a
    single event carry NULL gap stats (0 gaps), not a fabricated zero.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    cur = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = cur - F.lag(cur).over(w)
    g = df.withColumn("__gap", gap)
    return g.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count("__gap").alias("n_gaps"),
        F.min("__gap").alias("min_gap_us"),
        F.max("__gap").alias("max_gap_us"),
        (F.sum("__gap").cast("double") / F.count("__gap").cast("double")).alias("mean_gap_us"),
    )


def path_mining(
    df: DataFrame,
    entity_col: str,
    state_col: str,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    depth: int = 3,
    k: int = 10,
) -> DataFrame:
    """Top-k most common length-``depth`` event paths (user-journey
    mining, the sequence generalization of transition_counts): slide a
    window of ``depth`` consecutive states over each entity's ordered
    stream, count each exact path, rank globally.

    ``depth-1`` lead() columns share ONE window partitioning (single
    Exchange+Sort), the count is a paths-cardinality hash agg, and the
    global top-k is a TakeOrdered (rank via a single ORDER BY over the
    path-count frame, never the event frame). Ties break on the path
    string ascending so the top-k set is unique and engine-independent.
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(entity_col).orderBy(*order)
    steps = [F.col(state_col).alias("__s0")] + [
        F.lead(state_col, i).over(w).alias(f"__s{i}") for i in range(1, depth)
    ]
    paths = (
        df.select(*steps)
        # the farthest lead NULL ⇔ fewer than `depth` rows remain; nearer
        # leads are then non-null automatically, so no truncated path can
        # collide with a genuine shorter one under concat_ws's null-skip
        .filter(F.col(f"__s{depth - 1}").isNotNull())
        .select(
            F.concat_ws(">", *[F.col(f"__s{i}") for i in range(depth)]).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n"))
    rw = Window.orderBy(F.col("n").desc(), F.col("path").asc())
    return (
        counts.withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= k)
    )


def reply_latency_stats(
    df: DataFrame,
    conv_col: str,
    ts_col: str,
    role_col: str,
    id_col: str,
) -> DataFrame:
    """Reply-latency summaries per role transition: for each
    consecutive turn pair inside a conversation, the gap in exact
    integer microseconds, grouped by (prev_role -> role). The
    transcript-QA companion to interarrival_stats (which ignores
    roles) and transition_counts (which ignores time): "how fast does
    the assistant answer the user" as data.

    One Exchange: lag window over (conv, ts, id) feeds a hash agg on
    the tiny (prev_role, role) key. Mean is the SAME exact int/int
    double division as interarrival_stats — never AVG, whose internal
    accumulation is engine-defined.
    """
    w = Window.partitionBy(conv_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gapped = df.select(
        F.col(role_col).alias("role"),
        F.lag(F.col(role_col)).over(w).alias("prev_role"),
        (us - F.lag(us).over(w)).alias("__gap"),
    ).where(F.col("prev_role").isNotNull())
    return gapped.groupBy("prev_role", "role").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.min("__gap").alias("min_gap_us"),
        F.max("__gap").alias("max_gap_us"),
        (F.sum("__gap").cast("double") / F.count("__gap").cast("double")).alias(
            "mean_gap_us"
        ),
    )


def basket_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
) -> DataFrame:
    """Market-basket co-occurrence with EXACT integer lift: for every
    unordered item pair, how many baskets contain both, with lift
    rendered as parts-per-million of n_ab*total/(n_a*n_b) via integer
    division — no float probabilities anywhere, so the association
    strength is engine-exact. (Support/lift are THE correlation
    primitives for "alerts that fire together" / "tools used
    together" telemetry questions.)

    Plan: distinct (basket, item) → per-item basket counts (tiny) +
    pair counts via a self equi-join on the basket key — the join is
    per-basket items², never baskets², and hot baskets are bounded by
    the item vocabulary.
    """
    b = (
        df.select(F.col(basket_col).alias("bk"), F.col(item_col).alias("it"))
        .where(F.col("it").isNotNull())
        .distinct()
    )
    total = b.select("bk").distinct().count()  # control-plane scalar
    item_n = b.groupBy("it").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        b.select("bk", F.col("it").alias("a"))
        .join(b.select("bk", F.col("it").alias("b")), "bk")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    na = item_n.select(F.col("it").alias("a"), F.col("n").alias("n_a"))
    nb = item_n.select(F.col("it").alias("b"), F.col("n").alias("n_b"))
    return (
        pairs.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select(
            "a", "b", "n_ab", "n_a", "n_b",
            F.expr(f"n_ab * {int(total)}L * 1000000L div (n_a * n_b)").alias(
                "lift_ppm"
            ),
        )
    )


def run_length_encode(
    df: DataFrame,
    by: list[str],
    state_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Run-length encoding of a state sequence per entity: consecutive
    equal states collapse to one (entity, run_idx, state, run_len,
    first/last id) row — the state-machine compression for "how long
    did the service stay degraded" questions and the inverse-free twin
    of changes_only (which keeps rows; this emits runs). Gaps-and-
    islands: one lag + one running sum + one aggregate, all sharing
    the entity partitioning."""
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.withColumn(
        "__new",
        F.when(
            F.col(state_col).eqNullSafe(F.lag(state_col).over(w)), F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn("__run", F.sum("__new").over(w_run))
    return (
        flagged.groupBy(*by, "__run")
        .agg(
            F.max(state_col).alias("state"),
            F.count(F.lit(1)).alias("run_len"),
            F.min(id_col).alias("first_id"),
            F.max(id_col).alias("last_id"),
        )
        .withColumnRenamed("__run", "run_idx")
    )


def state_dwell(
    df: DataFrame,
    by: list[str],
    state_col: str,
    ts_col: str,
    id_col: str,
) -> DataFrame:
    """Time-in-state accounting: each observation's state holds until
    the next observation, so the gap to the successor is attributed to
    the CURRENT state (the same half-open LOCF reading as
    time_weighted, aggregated per state instead of integrated over
    values) — 'how long was each service degraded', 'dwell per page'.
    Exact integer microseconds; the last observation of a series has no
    successor and contributes nothing. One lead window + one hash agg
    sharing the entity partitioning."""
    w = Window.partitionBy(*by).orderBy(F.col("__t").asc(), F.col("__id").asc())
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    stepped = df.select(
        *by,
        F.col(state_col).alias("state"),
        us.alias("__t"),
        F.col(id_col).alias("__id"),
    ).withColumn("__gap", F.lead("__t").over(w) - F.col("__t"))
    return (
        stepped.where(F.col("__gap").isNotNull())
        .groupBy(*by, "state")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("__gap").alias("dwell_us"),
        )
    )
