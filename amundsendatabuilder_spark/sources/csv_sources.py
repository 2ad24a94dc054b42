"""CSV metadata sources — the reference's CSV extractor family.

Re-expresses ``databuilder/extractor/csv_extractor.py`` as DataFrame readers:

* :func:`read_csv` — ``CsvExtractor`` (:16): header CSV → typed rows.
* :func:`tables_with_columns` — ``CsvTableColumnExtractor`` (:146): group
  columns per table key, ordered by sort_order, left-joined to tables. The
  reference builds a ``defaultdict(list)`` in driver memory; here it is
  ``groupBy + sort_array(collect_list(struct))`` with map-side partial agg —
  distributed and skew-safe.
* :func:`tables_with_badges` — ``CsvTableBadgeExtractor`` (:69): badges
  grouped per table key joined to tables (broadcast — badge tables are tiny).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """RFC-4180 semantics to match the reference's ``csv.DictReader``
    (``csv_extractor.py:40-44``): quoted fields may span lines (multiLine)
    and embed doubled quotes (escape='\"').  multiLine costs whole-file
    splits — fine for metadata CSVs, which are driver-scale inputs."""
    r = (spark.read.option("header", True)
         .option("multiLine", True).option("escape", '"'))
    return (r.schema(schema) if schema else r.option("inferSchema", True)).csv(path)


def _table_key(db="database", cluster="cluster", schema="schema", tbl="name"):
    return F.concat(F.col(db), F.lit("://"), F.col(cluster), F.lit("."),
                    F.col(schema), F.lit("/"), F.col(tbl))


def tables_with_columns(tables: DataFrame, columns: DataFrame) -> DataFrame:
    """One row per table with its ordered column structs attached."""
    cols = (
        columns.withColumn("__tk", _table_key(tbl="table_name"))
        .groupBy("__tk")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("sort_order").cast("int").alias("sort_order"),
                        F.col("name").alias("name"),
                        F.col("description").alias("description"),
                        F.col("col_type").alias("col_type"),
                    )
                )
            ).alias("columns")
        )
    )
    return (
        tables.withColumn("__tk", _table_key())
        .join(cols, "__tk", "left")
        .withColumn("columns", F.coalesce(F.col("columns"), F.array()))
        .withColumnRenamed("__tk", "table_key")
    )


def tables_with_badges(tables: DataFrame, badges: DataFrame) -> DataFrame:
    b = (
        badges.withColumn("__tk", _table_key(tbl="table_name"))
        .groupBy("__tk")
        .agg(F.sort_array(F.collect_list(F.lower(F.trim(F.col("name"))))).alias("badges"))
    )
    return (
        tables.withColumn("__tk", _table_key())
        .join(F.broadcast(b), "__tk", "left")
        .withColumn("badges", F.coalesce(F.col("badges"), F.array()))
        .withColumnRenamed("__tk", "table_key")
    )


def generic_rows(spark: SparkSession, rows: list[dict], schema: str) -> DataFrame:
    """``GenericExtractor`` (``generic_extractor.py:12``): literal rows."""
    names = [f.strip().split(" ")[0] for f in schema.split(",")]
    return spark.createDataFrame([tuple(r[n] for n in names) for r in rows], schema)
