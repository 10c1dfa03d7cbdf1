"""A6 with true timer semantics — applyInPandasWithState interval
aggregation (SURVEY §2A A3-A6; aggregate.go:31-44 emit scheduling).

The window/watermark variant in stream_pipeline.py is the idiomatic Spark
mapping; this module is the literal port of the reference's stateful
aggregator for users who need its exact operational shape:

  * per-(key) GroupState holds open interval buckets (count + decimal-ish
    sum as float64 — each bucket's sum accumulates in one task, so there
    is no cross-partition float reorder);
  * a bucket emits EXACTLY ONCE, when the event-time watermark passes its
    end (the reference emits at most once per interval per series,
    piggybacked on arrivals; the watermark generalizes that with a
    principled late-data bound);
  * state for a key times out one interval after the watermark — the
    per-key TTL the reference's cache carries.

Arrow-batched (applyInPandasWithState hands pandas chunks); the per-bucket
math is vectorized pandas groupby, no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["stateful_interval_counts", "stateful_changes_only", "stateful_rate_limit"]

# state: parallel arrays of open buckets (start ms, count, sum)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType()), True),
        T.StructField("ns", T.ArrayType(T.LongType()), True),
        T.StructField("sums", T.ArrayType(T.DoubleType()), True),
    ]
)


def _out_schema(keys: list[str], key_types: list[T.DataType]) -> T.StructType:
    fields = [T.StructField(k, t, True) for k, t in zip(keys, key_types)]
    return T.StructType(
        fields
        + [
            T.StructField("bucket_start", T.TimestampType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("total", T.DoubleType(), False),
        ]
    )


def stateful_interval_counts(
    stream: DataFrame,
    keys: list[str],
    value_col: str,
    interval_seconds: int = 3600,
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(keys, bucket_start, n, total) — one output row per (key, interval
    bucket), emitted exactly once when the watermark passes the bucket end.
    """
    interval_ms = interval_seconds * 1000
    key_types = [stream.schema[k].dataType for k in keys]

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def emit_frame(items: list[tuple[int, int, float]]) -> pd.DataFrame:
            data = {k: [kv] * len(items) for k, kv in zip(keys, key)}
            data["bucket_start"] = [
                pd.Timestamp(bs, unit="ms") for bs, _, _ in items
            ]
            data["n"] = [n for _, n, _ in items]
            data["total"] = [s for _, _, s in items]
            return pd.DataFrame(data)

        if state.hasTimedOut:
            starts, ns, sums = state.get
            state.remove()
            items = sorted(zip(starts, ns, sums))
            if items:
                yield emit_frame(items)
            return

        acc: dict[int, tuple[int, float]] = {}
        if state.exists:
            starts, ns, sums = state.get
            acc = {bs: (n, s) for bs, n, s in zip(starts, ns, sums)}
        for pdf in pdfs:
            ts_ms = pdf[ts_col].astype("datetime64[ms]").astype("int64")
            bucket = (ts_ms // interval_ms) * interval_ms
            g = pd.DataFrame({"b": bucket, "v": pdf[value_col].astype("float64")})
            agg = g.groupby("b")["v"].agg(["count", "sum"])
            for bs, row in agg.iterrows():
                n0, s0 = acc.get(int(bs), (0, 0.0))
                acc[int(bs)] = (n0 + int(row["count"]), s0 + float(row["sum"]))

        wm = state.getCurrentWatermarkMs()
        closed = sorted(
            (bs, n, s) for bs, (n, s) in acc.items() if bs + interval_ms <= wm
        )
        open_ = {bs: v for bs, v in acc.items() if bs + interval_ms > wm}
        if open_:
            starts = sorted(open_)
            state.update(
                (starts, [open_[b][0] for b in starts], [open_[b][1] for b in starts])
            )
            # TTL: fire one interval past the newest open bucket's end (and
            # strictly past the current watermark, as the API requires)
            state.setTimeoutTimestamp(max(max(starts) + 2 * interval_ms, wm + 1))
        elif state.exists:
            state.remove()
        if closed:
            yield emit_frame(closed)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*keys)
        .applyInPandasWithState(
            fn,
            outputStructType=_out_schema(keys, key_types),
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_CHG_STATE_SCHEMA = T.StructType(
    [
        T.StructField("has_last", T.LongType(), True),
        T.StructField("last_is_null", T.LongType(), True),
        T.StructField("last_v", T.LongType(), True),
    ]
)


def stateful_changes_only(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Streaming twin of resample.changes_only: per key, emit a row only
    when its floored value DIFFERS from the last emitted observation —
    the stateful gauge-compression an OTel pipeline applies at the edge
    so a flat gauge costs nothing downstream. GroupState holds exactly
    one (value) per key — O(keys) state, no timeout needed (a gauge's
    last value never stops being the comparison point; deployments can
    bolt a TTL on top when key churn demands it).

    Rows are ordered by (ts, id) WITHIN each microbatch (vectorized
    pandas sort, no per-row Python); cross-batch order is the file
    source's time order, so with time-split input the emitted set
    equals the batch operator exactly — which is how the oracle checks
    it (lib_streaming_changes).
    """
    key_types = [stream.schema[k].dataType for k in key_cols]
    out_schema = T.StructType(
        [T.StructField(k, t, True) for k, t in zip(key_cols, key_types)]
        + [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("value_floor", T.LongType(), True),
        ]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        import numpy as np

        raw = pdf[value_col]
        vs = pd.Series(
            np.floor(raw.to_numpy(dtype="float64")), dtype="Float64"
        ).astype("Int64")
        vs[raw.isna().to_numpy()] = pd.NA
        prev = vs.shift(1)
        if state.exists:
            _has, last_is_null, last_v = state.get
            prev.iloc[0] = pd.NA if last_is_null else last_v
            first_row_unconditional = False
        else:
            first_row_unconditional = True
        # null-safe inequality, fully vectorized on the nullable dtype
        both_na = vs.isna() & prev.isna()
        one_na = vs.isna() ^ prev.isna()
        changed = ((vs != prev).fillna(False) | one_na) & ~both_na
        if first_row_unconditional:
            changed.iloc[0] = True
        last = vs.iloc[-1]
        state.update((1, 1 if pd.isna(last) else 0, 0 if pd.isna(last) else int(last)))
        if changed.any():
            sel = pdf.loc[changed.to_numpy()]
            data = {k: [kv] * len(sel) for k, kv in zip(key_cols, key)}
            data["event_id"] = sel[id_col].to_list()
            data["value_floor"] = pd.array(vs[changed.to_numpy()], dtype="Int64")
            yield pd.DataFrame(data)

    return (
        stream.groupBy(*key_cols)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=_CHG_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


_RL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buckets", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
    ]
)


def stateful_rate_limit(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    id_col: str,
    interval_seconds: int = 86400,
    max_per_window: int = 100,
) -> DataFrame:
    """Streaming twin of sampling.rate_limit: per (key, time bucket),
    let the FIRST ``max_per_window`` rows through and drop the rest —
    the edge throttle for chatty emitters, with the admitted-count per
    open bucket as GroupState (O(active buckets) per key; a deployment
    adds bucket eviction past its late-data bound — the replay harness
    keeps every bucket so the equality with the batch operator is
    total).

    Rows are sorted by (ts, id) within each microbatch (vectorized);
    with time-split input the admitted set equals the batch
    rate_limit, which the oracle states as the plain row_number cut.
    """
    key_types = [stream.schema[k].dataType for k in key_cols]
    out_schema = T.StructType(
        [T.StructField(k, t, True) for k, t in zip(key_cols, key_types)]
        + [T.StructField("event_id", T.LongType(), True)]
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values([ts_col, id_col], kind="mergesort").reset_index(
            drop=True
        )
        prior: dict[int, int] = {}
        if state.exists:
            buckets, counts = state.get
            prior = dict(zip(buckets, counts))
        secs = (
            pdf[ts_col].astype("datetime64[us]").astype("int64") // 1_000_000
        )
        bucket = (secs // interval_seconds) * interval_seconds
        rank_in_bucket = bucket.groupby(bucket).cumcount()
        already = bucket.map(prior).fillna(0).astype("int64")  # vectorized dict map
        admit = (rank_in_bucket + already) < max_per_window
        new_totals = bucket.value_counts().to_dict()
        for b, n in new_totals.items():
            prior[int(b)] = prior.get(int(b), 0) + int(n)
        state.update((list(prior.keys()), list(prior.values())))
        if admit.any():
            sel = pdf.loc[admit.to_numpy()]
            data = {k: [kv] * len(sel) for k, kv in zip(key_cols, key)}
            data["event_id"] = sel[id_col].to_list()
            yield pd.DataFrame(data)

    return stream.groupBy(*key_cols).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=_RL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
