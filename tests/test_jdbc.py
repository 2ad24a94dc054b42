"""JDBC source family: REAL spark.read.jdbc against embedded Derby (ships
with Spark), dialect SQL registry sanity, and the TableMetadata regroup —
mirroring tests/unit/extractor/test_hive_table_metadata_extractor.py and
test_sql_alchemy_extractor.py in the reference."""

import pytest
from pyspark.sql import functions as F

from amundsendatabuilder_spark.sources.jdbc import (
    DIALECT_METADATA_SQL,
    jdbc_query,
    metadata_scan,
    regroup_to_table_metadata,
)

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "metastore"
    url = f"jdbc:derby:{db};create=true"
    # seed an information_schema-shaped table through the real JDBC write path
    rows = [
        # schema, name, description, col_name, col_desc, col_type, sort, view
        ("core", "orders", "all orders", "order_id", "pk", "bigint", 0, False),
        ("core", "orders", "all orders", "amount", "usd", "double", 1, False),
        # Derby + createTableColumnTypes rejects setNull(CLOB) into VARCHAR —
        # missing descriptions are seeded as '' and NULLIF'd in the scan SQL
        ("core", "orders", "all orders", "ts", "", "timestamp", 2, False),
        ("core", "users_v", "", "user_id", "pk", "bigint", 0, True),
        ("ops", "events", "event log", "event_id", "", "bigint", 0, False),
    ]
    df = spark.createDataFrame(
        rows,
        "schema_name string, table_name string, description string, "
        "col_name string, col_description string, col_type string, "
        "col_sort_order int, is_view boolean",
    )
    df.write.format("jdbc").option("url", url).option("driver", DERBY_DRIVER) \
        .option("dbtable", "metastore_cols") \
        .option(
            "createTableColumnTypes",
            "schema_name VARCHAR(64), table_name VARCHAR(64), "
            "description VARCHAR(256), col_name VARCHAR(64), "
            "col_description VARCHAR(256), col_type VARCHAR(64)",
        ).mode("overwrite").save()
    return url


def test_jdbc_query_pushdown_roundtrip(spark, derby_url):
    """SQLAlchemyExtractor parity: arbitrary SQL runs SOURCE-side."""
    out = jdbc_query(
        spark, derby_url,
        'SELECT "schema_name", "table_name", "col_name" FROM metastore_cols '
        'WHERE "schema_name" = \'core\'',
        driver=DERBY_DRIVER,
    )
    got = {(r["schema_name"], r["table_name"], r["col_name"]) for r in out.collect()}
    assert got == {
        ("core", "orders", "order_id"), ("core", "orders", "amount"),
        ("core", "orders", "ts"), ("core", "users_v", "user_id"),
    }


def test_jdbc_metadata_scan_and_regroup(spark, derby_url):
    """Full dialect-extractor shape end-to-end over real JDBC: per-column
    rows → regroup → TableMetadata rows (golden, mirroring the reference
    hive extractor unit test expectations)."""
    sql = (
        'SELECT \'derby\' AS "database", \'gold\' AS "cluster", "schema_name" AS "schema", '
        '"table_name" AS "name", NULLIF("description", \'\') AS "description", "col_name", '
        'NULLIF("col_description", \'\') AS "col_description", '
        '"col_type", "col_sort_order", "is_view" FROM metastore_cols'
    )
    rows = jdbc_query(spark, derby_url, sql, driver=DERBY_DRIVER)
    rows = rows.toDF(*[c.lower() for c in rows.columns])
    tm = {(r["schema"], r["name"]): r for r in regroup_to_table_metadata(rows).collect()}
    orders = tm[("core", "orders")]
    assert orders["description"] == "all orders"
    assert orders["is_view"] is False
    assert [c["name"] for c in orders["columns"]] == ["order_id", "amount", "ts"]
    assert [c["col_type"] for c in orders["columns"]] == ["bigint", "double", "timestamp"]
    assert orders["columns"][0]["description"] == "pk"
    assert tm[("core", "users_v")]["is_view"] is True
    assert len(tm) == 3

    # regrouped output feeds the TableMetadata node expansion directly
    from amundsendatabuilder_spark.operators.amundsen_models import (
        table_metadata_nodes,
    )
    from amundsendatabuilder_spark.sources.jdbc import explode_table_columns

    tables = regroup_to_table_metadata(rows)
    nodes = table_metadata_nodes(tables, explode_table_columns(tables))
    keys = {r["key"] for r in nodes.collect()}
    assert "derby://gold.core/orders" in keys
    assert "derby://gold.core/orders/amount" in keys
    assert "derby://gold.core/orders/order_id/_description" in keys


def test_dialect_registry_formats(spark):
    """Every dialect SQL templates cleanly with the standard slots and keeps
    the standard column contract aliases."""
    import re

    for dialect in DIALECT_METADATA_SQL:
        with pytest.raises(Exception):
            # no live warehouse for these dialects in-sandbox: the read must
            # fail at CONNECTION time, proving the SQL formatted fine
            metadata_scan(
                spark, "jdbc:derby:/nonexistent-db-dir", dialect,
                where_clause_suffix="WHERE 1=1", driver=DERBY_DRIVER,
            )
        sql = DIALECT_METADATA_SQL[dialect]
        for alias in ("col_name", "col_type", "col_sort_order", "is_view"):
            assert re.search(alias, sql, re.I), (dialect, alias)
    with pytest.raises(ValueError, match="unknown dialect"):
        metadata_scan(spark, "jdbc:x", "oracle9i")


def test_jdbc_partitioned_read_options(spark, derby_url):
    """Parallel scan options reach the reader (fan-out vs the reference's
    single cursor)."""
    out = jdbc_query(
        spark, derby_url,
        'SELECT "col_sort_order" AS csort, "col_name" FROM metastore_cols',
        driver=DERBY_DRIVER,
        partition_column="csort", lower_bound=0, upper_bound=3,
        num_partitions=2,
    )
    assert out.rdd.getNumPartitions() == 2
    assert out.count() == 5
    with pytest.raises(ValueError, match="partitioned read"):
        jdbc_query(spark, derby_url, "SELECT 1", partition_column="x")


def test_last_updated_registry_and_fs_probe(spark, tmp_path):
    """SnowflakeTableLastUpdatedExtractor registry entry
    (snowflake_table_last_updated_extractor.py:27-36) + the distributed
    fs-probe path for non-partitioned Hive tables
    (hive_table_last_updated_extractor.py:235-281)."""
    import os
    import re
    import time

    from amundsendatabuilder_spark.sources.fs_probe import (
        merge_last_updated,
        table_last_updated_fs,
    )
    from amundsendatabuilder_spark.sources.jdbc import (
        DIALECT_LAST_UPDATED_SQL,
        last_updated_scan,
    )

    # registry: templates format cleanly, keep the row contract, and the
    # snowflake default where-clause (ref :51) is applied
    for dialect in DIALECT_LAST_UPDATED_SQL:
        with pytest.raises(Exception):
            last_updated_scan(spark, "jdbc:derby:/nonexistent-db-dir", dialect,
                              driver=DERBY_DRIVER)
        sql = DIALECT_LAST_UPDATED_SQL[dialect]
        for alias in ("cluster", "schema", "table_name", "last_updated_time"):
            assert re.search(alias, sql, re.I), (dialect, alias)
    assert "last_altered IS NOT NULL" in DIALECT_LAST_UPDATED_SQL["snowflake"].format(
        cluster_source="'m'", database="prod",
        where_clause_suffix="WHERE t.last_altered IS NOT NULL")
    with pytest.raises(ValueError, match="unknown dialect"):
        last_updated_scan(spark, "jdbc:x", "oracle9i")

    # fs probe over a local directory fixture: first-level only, empty and
    # over-threshold locations skipped
    t1 = tmp_path / "t1"; t1.mkdir()
    (t1 / "part-0.parquet").write_text("x")
    (t1 / "part-1.parquet").write_text("y")
    nested = t1 / "sub"; nested.mkdir()
    (nested / "deep.parquet").write_text("z")  # first level only: ignored
    old, new = time.time() - 9000, time.time() - 100
    os.utime(t1 / "part-0.parquet", (old, old))
    os.utime(t1 / "part-1.parquet", (new, new))
    os.utime(nested / "deep.parquet", (time.time(), time.time()))
    t2 = tmp_path / "t2"; t2.mkdir()  # no files -> no row
    t3 = tmp_path / "t3"; t3.mkdir()
    for i in range(5):
        (t3 / f"f{i}").write_text("w")

    tables = spark.createDataFrame(
        [("core", "t1", str(t1)), ("core", "t2", str(t2)),
         ("core", "t3", str(t3)), ("core", "gone", str(tmp_path / "nope"))],
        "schema string, table_name string, location string",
    )
    got = {(r["schema"], r["table_name"]): r["last_updated_time"]
           for r in table_last_updated_fs(tables, filecheck_threshold=3).collect()}
    assert set(got) == {("core", "t1")}  # t2 empty, t3 over threshold, gone missing
    assert got[("core", "t1")] == int(new)

    # union with the metastore partitioned path: newer timestamp wins
    part = spark.createDataFrame(
        [("core", "t1", int(old)), ("ops", "p1", 1700000000)],
        "schema string, table_name string, last_updated_time long",
    )
    fs = table_last_updated_fs(tables, filecheck_threshold=3)
    merged = {(r["schema"], r["table_name"]): r["last_updated_time"]
              for r in merge_last_updated(part, fs).collect()}
    assert merged == {("core", "t1"): int(new), ("ops", "p1"): 1700000000}


def test_presto_view_scan_decode(spark):
    import base64
    import json as _json

    from amundsendatabuilder_spark.sources.jdbc import (
        presto_view_scan,
        regroup_to_table_metadata,
    )

    def fence(columns):
        payload = base64.b64encode(
            _json.dumps({"columns": columns}).encode()).decode()
        return f"/* Presto View: {payload} */"

    rows = spark.createDataFrame(
        [("analytics", "v_daily", fence(
            [{"name": "day", "type": "date"},
             {"name": "clicks", "type": "bigint"}])),
         ("analytics", "v_empty", fence([]))],
        "schema string, name string, view_original_text string")

    out = presto_view_scan(spark, rows=rows, cluster="gold")
    got = {(r["name"], r["col_name"]): r for r in out.collect()}
    assert set(got) == {("v_daily", "day"), ("v_daily", "clicks")}
    r = got[("v_daily", "clicks")]
    assert r["database"] == "presto" and r["cluster"] == "gold"
    assert r["schema"] == "analytics"
    assert r["col_type"] == "bigint"
    assert r["col_sort_order"] == 1  # create-view order
    assert r["is_view"] is True

    # lands straight in the regroup -> TableMetadata contract
    t = regroup_to_table_metadata(out).collect()[0]
    assert t["is_view"] is True
    assert [c["name"] for c in t["columns"]] == ["day", "clicks"]
