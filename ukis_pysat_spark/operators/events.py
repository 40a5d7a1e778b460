"""Event-stream relational operators.

The reference has no event processing; these are the classic
training-data-pipeline operations over the driver's `events` table —
pure JVM window/aggregate expressions, one shuffle on the user key.

- sessionize   gap-based session assignment + per-session rollup.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: float = 30.0,
    ts_col: str = "ts",
    user_col: str = "user_id",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    > `gap_minutes`, then roll each session up.

    Timestamps are compared in integer MICROSECONDS (unix_micros) so
    the boundary test is exact — float seconds would put sub-ULP noise
    on the gap comparison.  One hash shuffle on the user key; the lag +
    running-sum window and the session aggregate share it.  Ties on ts
    break by `order_col` so retries are deterministic.

    Returns (user_id, session_idx, n_events, start_us, end_us,
    duration_us, sum_value)."""
    gap_us = int(gap_minutes * 60_000_000)
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # NTZ timestamps cast through TIMESTAMP in the session's UTC zone —
    # matching DuckDB's naive-as-UTC epoch_us
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | ((us - prev) > F.lit(gap_us)), 1).otherwise(0)
    marked = events.withColumn("_us", us).withColumn(
        "session_idx", F.sum(new_s).over(w).cast("long")
    )
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            (F.max("_us") - F.min("_us")).alias("duration_us"),
            F.sum(F.col(value_col).cast("decimal(28,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    within_minutes: float | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel (the classic conversion analysis): a
    user reaches step k at the EARLIEST event of ``steps[k]`` at or
    after their step-(k-1) time; ``within_minutes`` additionally bounds
    every step to that window after the user's step-1 time.

    Timestamps compare in integer microseconds (the sessionize rule),
    so boundaries are exact and the DuckDB twin matches bit-for-bit.
    Each step is one user-keyed aggregate over the PRE-FILTERED event
    type — filters reach the scan, the per-step frames are tiny (one
    row per surviving user), and the K-1 chaining joins are
    user-keyed equi-joins on those small frames.

    Returns one row per step: (step, step_type, n_users), n_users
    non-increasing."""
    if not steps:
        raise ValueError("need at least one funnel step")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    ev = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        us.alias("us"),
    )
    win_us = None if within_minutes is None else int(within_minutes * 60_000_000)
    cur = (
        ev.where(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("us").alias("t"))
        .select("user_id", "t", F.col("t").alias("t0"))
    )
    frames = [cur.select(F.lit(1).alias("step"),
                         F.lit(steps[0]).alias("step_type"), "user_id")]
    for k, st in enumerate(steps[1:], start=2):
        cand = ev.where(F.col("etype") == st).join(cur, "user_id").where(
            F.col("us") >= F.col("t")
        )
        if win_us is not None:
            cand = cand.where(F.col("us") <= F.col("t0") + F.lit(win_us))
        cur = (
            cand.groupBy("user_id", "t0")
            .agg(F.min("us").alias("t"))
            .select("user_id", "t", "t0")
        )
        frames.append(cur.select(F.lit(k).alias("step"),
                                 F.lit(st).alias("step_type"), "user_id"))
    allf = reduce(lambda a, b: a.unionByName(b), frames)
    return (
        allf.groupBy("step", "step_type")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("step")
    )
