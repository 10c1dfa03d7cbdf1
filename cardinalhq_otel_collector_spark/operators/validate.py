"""Transcript integrity validation — structural QA over multi-turn
conversation streams (the input shape of this engine's north star:
conv_id / turn_idx / role / text / tool / ts).

Real transcript corpora arrive broken in three characteristic ways,
and a training pipeline must QUANTIFY them per conversation before
deciding to repair, resample, or drop:

  * index gaps/duplicates — ``turn_idx`` should be the dense 0-based
    sequence in timestamp order (dropped or double-logged turns);
  * role repeats — two consecutive turns by the same role where the
    protocol expects alternation (merged or split messages);
  * time regressions — a turn whose timestamp precedes its
    predecessor's in ``turn_idx`` order (clock skew, replays).

One window partitioning on the conversation key carries ALL THREE
checks (row_number + two lags share the Exchange+Sort), then a
map-side-combinable agg reduces to per-conversation counts — exact
integers, no floats anywhere. Partitions are conversation-sized; a
10^12-turn corpus shuffles once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["transcript_integrity"]


def transcript_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation structural-defect counts.

    Output: conv, n_turns, n_idx_breaks (turn_idx != its dense
    0-based position in (turn_idx, ts) order — catches gaps AND
    duplicates), n_role_repeats (consecutive same-role turns in
    turn_idx order), n_ts_regressions (ts strictly decreasing across
    consecutive turn_idx), is_clean (all three zero).
    """
    w = Window.partitionBy(conv_col).orderBy(
        F.col(idx_col).asc(), F.col(ts_col).asc()
    )
    flags = (
        df.select(conv_col, idx_col, role_col, ts_col)
        .withColumn("__pos", F.row_number().over(w) - 1)
        .withColumn("__prev_role", F.lag(role_col).over(w))
        .withColumn("__prev_ts", F.lag(ts_col).over(w))
    )
    out = flags.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(
            F.when(F.col(idx_col) != F.col("__pos"), 1).otherwise(0)
        ).alias("n_idx_breaks"),
        F.sum(
            F.when(F.col(role_col) == F.col("__prev_role"), 1).otherwise(0)
        ).alias("n_role_repeats"),
        F.sum(
            F.when(F.col(ts_col) < F.col("__prev_ts"), 1).otherwise(0)
        ).alias("n_ts_regressions"),
    )
    return out.withColumn(
        "is_clean",
        (F.col("n_idx_breaks") == 0)
        & (F.col("n_role_repeats") == 0)
        & (F.col("n_ts_regressions") == 0),
    )
