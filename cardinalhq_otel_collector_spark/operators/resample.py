"""Fixed-step resampling with LOCF gap fill (PromQL-style alignment).

Metrics backends answer range queries on a fixed step grid: the value
at each grid point is the most recent observation at or before it
(last-observation-carried-forward). The batch equivalent: per series,
build the step grid spanning the series' own [first, last] window,
take the last value inside each step, and carry forward across empty
steps. This composes with interval_last / stateful rollups as the
read-side of a metrics pipeline (reference behavior: PromQL lookback
semantics, public Prometheus docs; cf. interval_last for the
write-side rollup).

Plan shape: one per-series aggregate builds the grid bounds (tiny),
``sequence`` + explode materializes the grid (rows = series x steps,
never a cross join), one left join attaches per-step last values, and
one window (partition by series, order by step) carries them forward.
Two shuffles total, both on the series key. Values are kept integer
(floor) so the LOCF output is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["locf_resample", "changes_only"]


def locf_resample(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    step_seconds: int = 3600,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Resample ``value_col`` onto a ``step_seconds`` grid per group
    with last-observation-carried-forward fill.

    The per-step "last" observation is the max-(ts, tiebreak) row in
    the step; ``order_tiebreak`` (e.g. an event id) makes ties total.
    Output: group cols, step_start (timestamp), value (long, LOCF —
    never NULL because each series' grid starts at its own first
    observation's step).
    """
    # integer div, never double division: a float quotient landing on
    # x.99999... at a step boundary would mis-bucket the row
    step_of = F.expr(
        f"(unix_timestamp({ts_col}) div {int(step_seconds)}) * {int(step_seconds)}L"
    )
    if order_tiebreak is None:
        # a physical-order fallback (monotonically_increasing_id) would
        # make tied-timestamp results partitioning-dependent — refuse
        # instead of silently being nondeterministic
        raise ValueError(
            "locf_resample needs order_tiebreak (a unique id column) so "
            "tied timestamps resolve identically under any partitioning"
        )
    tb = F.col(order_tiebreak)
    # last value per non-empty step: max_by over (ts, tiebreak)
    per_step = (
        df.select(
            *by,
            step_of.alias("__step"),
            # floor, not a bare cast: Spark's double->long cast truncates
            # while DuckDB's rounds — floor agrees everywhere
            F.floor(F.col(value_col)).cast("long").alias("__v"),
            F.struct(F.col(ts_col), tb.alias("__tb")).alias("__ord"),
        )
        .groupBy(*by, "__step")
        .agg(F.max_by("__v", "__ord").alias("__step_last"))
    )
    # Round-6 plan shape (guide §2.4 — remove shuffles outright): the
    # previous formulation materialized the dense grid first (explode),
    # LEFT-JOINED the observed steps onto it, and ran the LOCF window
    # over every grid row — two extra shuffles and a window over the
    # (series × steps)-sized grid. Instead: carry the LOCF value and the
    # next observed step with ONE window over the observed rows only,
    # then explode each observation's [step, next) gap range directly —
    # the dense grid is produced, never joined or re-shuffled. Identical
    # output: a grid point between observations s_k <= t < s_(k+1) takes
    # the last non-NULL step-value at or before s_k in both shapes.
    w = Window.partitionBy(*by).orderBy("__step")
    step = F.lit(int(step_seconds)).cast("long")
    filled = per_step.select(
        *by,
        "__step",
        F.last("__step_last", ignorenulls=True).over(w).alias("value"),
        F.lead("__step").over(w).alias("__next"),
    )
    return filled.select(
        *by,
        F.explode(
            F.sequence(
                F.col("__step"),
                F.coalesce(F.col("__next") - step, F.col("__step")),
                step,
            )
        ).alias("__gstep"),
        "value",
    ).select(
        *by,
        F.timestamp_seconds(F.col("__gstep")).alias("step_start"),
        "value",
    )


def changes_only(
    df: DataFrame,
    by: list[str],
    ts_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Timeseries delta compression: keep only rows whose
    (floored-integer) value DIFFERS from the previous observation in
    the series — the first row always survives. The inverse of
    locf_resample: LOCF-replaying the kept rows reproduces every
    sampled step exactly, so at 100 TB a mostly-flat gauge stores a
    tiny fraction of its raw points with zero information loss (at the
    floor-integer resolution).

    One lag window per series (single Exchange); null-safe compare so
    NULL runs also compress.
    """
    w = Window.partitionBy(*by).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    v = F.floor(F.col(value_col)).cast("long")
    flagged = (
        df.withColumn("__v", v)
        .withColumn("__prev", F.lag("__v").over(w))
        # row number must be materialized: window functions are not
        # allowed inside WHERE, and "__prev IS NULL" cannot stand in for
        # "first row" (a NULL-valued predecessor also yields NULL)
        .withColumn("__rn", F.row_number().over(w))
    )
    return (
        flagged.where(
            (F.col("__rn") == 1) | ~F.col("__v").eqNullSafe(F.col("__prev"))
        )
        .drop("__prev", "__rn")
        .withColumnRenamed("__v", "value_floor")
    )
