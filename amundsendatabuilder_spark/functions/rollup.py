"""Time-bucket rollup cascade — hypertable-style continuous aggregates.

At 100 TB you do not recompute the daily aggregate from raw events: you
maintain a cascade of rollup levels (raw → hourly → daily → monthly)
where each coarser level re-aggregates the NEXT FINER level — reading
~1/3600th of the data instead of the raw table (TimescaleDB continuous
aggregates; Druid/Pinot rollup segments).  That only works for
DECOMPOSABLE measures, so the rollup row carries the algebraic parts
(count, sum, min, max — avg is derived as sum/count at read time), and
money stays integer cents end to end (the repo-wide idiom: no float or
DECIMAL drift when a sum is re-summed across levels).

Both steps are single partial-aggregating hash shuffles (map-side
combine on (bucket, keys)); ``coarsen`` never touches the raw table.
The reference has nothing like this (SURVEY.md §2.8 — its aggregations
are one-shot); this is a training-data/telemetry-pipeline extension,
verified against DuckDB computing the daily level directly from raw as
the oracle (the cascade must be bit-identical to the direct answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions.ranges import _micros

def _bucket_start(c, width: int):
    # Exact window start (c - pmod keeps everything in BIGINT — no double
    # division, see functions/ranges._floordiv).
    return c - F.pmod(c, F.lit(int(width)))

HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_us: int = HOUR_US,
    keys: list[str] | None = None,
    value_col: str | None = "value",
) -> DataFrame:
    """Level-0 rollup: aggregate raw rows into fixed ``bucket_us`` windows
    per ``keys``.  Output columns: ``bucket_us`` (window start, epoch
    micros), the keys, ``n_rows``, and — when ``value_col`` is given —
    ``sum_cents`` / ``min_cents`` / ``max_cents`` (BIGINT integer cents,
    NULL-valued rows counted but excluded from the money parts, like SQL
    aggregates).  One hash shuffle, partial aggregation map-side."""
    keys = keys or []
    if int(bucket_us) <= 0:
        raise ValueError("bucket_us must be positive")
    bucket = _bucket_start(_micros(df, ts_col), bucket_us).alias("bucket_us")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    if value_col is not None:
        cents = (F.col(value_col).cast("decimal(18,2)") * 100).cast("long")
        aggs += [
            F.sum(cents).alias("sum_cents"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
        ]
    return df.groupBy(bucket, *[F.col(k) for k in keys]).agg(*aggs)


def coarsen(
    rollup_df: DataFrame,
    bucket_us: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Re-aggregate a finer rollup into coarser ``bucket_us`` windows
    WITHOUT touching raw data: count sums, sums sum, min of mins, max of
    maxes.  ``bucket_us`` must be a multiple of the input's bucket width
    for the windows to nest; the caller guarantees that (hour → day →
    month cadences do)."""
    keys = keys or []
    if int(bucket_us) <= 0:
        raise ValueError("bucket_us must be positive")
    bucket = _bucket_start(F.col("bucket_us"), bucket_us).alias("bucket_us")
    aggs = [F.sum("n_rows").alias("n_rows")]
    if "sum_cents" in rollup_df.columns:
        aggs += [
            F.sum("sum_cents").alias("sum_cents"),
            F.min("min_cents").alias("min_cents"),
            F.max("max_cents").alias("max_cents"),
        ]
    return rollup_df.groupBy(bucket, *[F.col(k) for k in keys]).agg(*aggs)
