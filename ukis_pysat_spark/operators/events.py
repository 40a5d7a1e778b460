"""Event-stream relational operators.

The reference has no event processing; these are the classic
training-data-pipeline operations over the driver's `events` table —
pure JVM window/aggregate expressions, one shuffle on the user key.

- sessionize   gap-based session assignment + per-session rollup.
"""

from __future__ import annotations

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
