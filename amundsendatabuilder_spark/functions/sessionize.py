"""Event sessionization — gaps-and-islands over a user event stream.

The training-data-pipeline counterpart of the usage channel: collapse a
raw event log into per-user sessions split at inactivity gaps.  Batch
shape is the classic two-window plan (lag → new-session flag → running
sum → groupBy), which Spark executes as ONE shuffle on ``user_id``
(both windows and the final aggregation share the partitioning, so the
sort/exchange is reused) — at 100 TB this scales as a single
hash-partitioned pass, with AQE handling skewed power users.

Cross-engine determinism (for oracle parity and replay digests): gap
arithmetic runs on integer epoch-microseconds (``unix_micros``), and
value sums on ``decimal(18,2)`` — no float summation-order drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_events(
    df: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-user sessions split where the gap to the previous event exceeds
    ``gap_minutes`` (strictly greater; an exactly-gap-sized pause stays in
    the session).  Returns one row per session: ``user_id, session_seq``
    (1-based per user, in time order), ``start_us``/``end_us`` (epoch
    microseconds), ``n_events``, ``sum_value`` (exact decimal).
    """
    gap_us = int(gap_minutes) * 60 * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    # NTZ timestamps get a timezone-independent micros computation (casting
    # NTZ -> TIMESTAMP would shift by the session zone, which the caller's
    # session may set arbitrarily); TIMESTAMP uses unix_micros directly
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        ts_us = F.expr(
            f"timestampdiff(MICROSECOND,"
            f" TIMESTAMP_NTZ'1970-01-01 00:00:00', {ts_col})"
        )
    else:
        ts_us = F.unix_micros(F.col(ts_col))
    prev_us = F.lag(ts_us).over(w)
    is_new = F.when(
        prev_us.isNull() | (ts_us - prev_us > F.lit(gap_us)), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_ts_us", ts_us)
        .withColumn("_new", is_new)
        .withColumn("session_seq", F.sum("_new").over(run))
        .groupBy(F.col(user_col), F.col("session_seq"))
        .agg(
            F.min("_ts_us").alias("start_us"),
            F.max("_ts_us").alias("end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,2)")).alias("sum_value"),
        )
    )
