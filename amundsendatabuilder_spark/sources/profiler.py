"""Column profiler — compute TableColumnStats from the data itself.

The reference only INGESTS column stats that Hive has already computed
(``databuilder/models/table_stats.py:11-106``; the stats rows arrive
via SQL extractors).  A Spark-native engine can be its own profiler:
one aggregation pass over the table computes min / max / null_count /
distinct_count per column and emits rows in the exact flat shape
``operators/amundsen_models.table_column_stats_nodes`` expects, so the
profile lands in the graph as ``Stat`` nodes wired ``STAT_OF`` to their
columns like any ingested stat.

Scale shape: ONE full-scan aggregation job for all columns together
(partial aggregates map-side; the final reduce handles a single row).
Exact ``countDistinct`` rewrites to an expand+two-stage aggregate —
fine up to high-cardinality columns; pass ``exact_distinct=False`` to
use ``approx_count_distinct`` (HyperLogLog++, constant memory) at
100 TB.  The unpivot to (col, stat, val) rows happens on the one-row
aggregate result, so it is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: list[str],
    db: str = "hive",
    cluster: str = "gold",
    schema: str = "default",
    table_name: str = "table",
    epoch: int = 0,
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``cols`` of ``df`` into TableColumnStats-shaped rows:
    ``(db, cluster, schema, table_name, col_name, stat_name, stat_val,
    start_epoch, end_epoch)`` with stats ``min``, ``max``,
    ``null_count``, ``distinct_count`` per column (values stringified,
    matching the reference model's ``stat_val: str``)."""
    aggs = []
    for c in cols:
        distinct = (F.count_distinct(F.col(c)) if exact_distinct
                    else F.approx_count_distinct(F.col(c)))
        aggs += [
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
            F.sum(F.col(c).isNull().cast("long")).cast("string")
                .alias(f"{c}__null_count"),
            distinct.cast("string").alias(f"{c}__distinct_count"),
        ]
    one = df.agg(*aggs)
    entries = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.lit(stat).alias("stat_name"),
            F.col(f"{c}__{stat}").alias("stat_val"),
        )
        for c in cols
        for stat in ("min", "max", "null_count", "distinct_count")
    ])
    return one.select(F.explode(entries).alias("e")).select(
        F.lit(db).alias("db"),
        F.lit(cluster).alias("cluster"),
        F.lit(schema).alias("schema"),
        F.lit(table_name).alias("table_name"),
        F.col("e.col_name").alias("col_name"),
        F.col("e.stat_name").alias("stat_name"),
        F.col("e.stat_val").alias("stat_val"),
        F.lit(str(epoch)).alias("start_epoch"),
        F.lit(str(epoch)).alias("end_epoch"),
    )
