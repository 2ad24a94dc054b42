"""DeltaLakeMetadataExtractor parity over the session catalog: real
CREATE TABLE/VIEW + DESCRIBE EXTENDED round trips, partition-column tagging,
regroup into TableMetadata, and the last-updated path (reference
tests/unit/extractor/test_deltalake_extractor.py scrapes a local
SparkSession the same way)."""

import pytest
from pyspark.sql import functions as F

from amundsendatabuilder_spark.sources.jdbc import regroup_to_table_metadata
from amundsendatabuilder_spark.sources.spark_catalog import (
    catalog_last_updated,
    catalog_metadata_scan,
    catalog_table_rows,
)


@pytest.fixture(scope="module")
def catalog(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS cat_test")
    spark.sql("DROP TABLE IF EXISTS cat_test.sales")
    spark.sql(
        "CREATE TABLE cat_test.sales (order_id BIGINT COMMENT 'pk', "
        "amount DOUBLE, ds STRING) USING parquet PARTITIONED BY (ds) "
        "COMMENT 'daily sales'"
    )
    spark.sql("DROP VIEW IF EXISTS cat_test.sales_v")
    spark.sql("CREATE VIEW cat_test.sales_v AS SELECT order_id FROM cat_test.sales")
    spark.sql("CREATE DATABASE IF NOT EXISTS cat_skip")
    spark.sql("DROP TABLE IF EXISTS cat_skip.hidden")
    spark.sql("CREATE TABLE cat_skip.hidden (x INT) USING parquet")
    yield spark
    spark.sql("DROP VIEW IF EXISTS cat_test.sales_v")
    spark.sql("DROP TABLE IF EXISTS cat_test.sales")
    spark.sql("DROP TABLE IF EXISTS cat_skip.hidden")
    spark.sql("DROP DATABASE IF EXISTS cat_test")
    spark.sql("DROP DATABASE IF EXISTS cat_skip")


def test_catalog_scan_contract(catalog):
    spark = catalog
    scan = catalog_metadata_scan(
        spark, database="delta", cluster="gold", exclude_list=["cat_skip"]
    )
    rows = {(r["schema"], r["name"], r["col_name"]): r for r in scan.collect()}
    assert ("cat_skip", "hidden", "x") not in rows

    t = rows[("cat_test", "sales", "order_id")]
    assert t["description"] == "daily sales"
    assert t["col_description"] == "pk"
    assert t["col_type"] == "bigint"
    assert t["is_view"] is False
    # partition tagging (reference PARTITION_COLUMN_TAG, :306-311)
    assert rows[("cat_test", "sales", "ds")]["is_partition"] is True
    assert rows[("cat_test", "sales", "amount")]["is_partition"] is False
    # the view is scraped via the DESCRIBE EXTENDED path
    assert rows[("cat_test", "sales_v", "order_id")]["is_view"] is True

    # schema_list narrows, mirroring SCHEMA_LIST_KEY
    only = catalog_metadata_scan(spark, schema_list=["cat_skip"])
    assert {r["schema"] for r in only.collect()} == {"cat_skip"}

    # delta_tables_only drops parquet tables but keeps views (reference
    # scrapes views regardless of provider, :226-241)
    d_only = catalog_metadata_scan(
        spark, schema_list=["cat_test"], delta_tables_only=True
    )
    assert {r["name"] for r in d_only.collect()} == {"sales_v"}


def test_catalog_scan_feeds_regroup_and_models(catalog):
    spark = catalog
    scan = catalog_metadata_scan(spark, schema_list=["cat_test"])
    tm = {
        (r["schema"], r["name"]): r
        for r in regroup_to_table_metadata(catalog_table_rows(scan)).collect()
    }
    sales = tm[("cat_test", "sales")]
    assert [c["name"] for c in sales["columns"]] == ["order_id", "amount", "ds"]
    assert sales["description"] == "daily sales"

    from amundsendatabuilder_spark.operators.amundsen_models import (
        table_metadata_nodes,
    )
    from amundsendatabuilder_spark.sources.jdbc import explode_table_columns

    tables = regroup_to_table_metadata(catalog_table_rows(scan))
    keys = {r["key"] for r in table_metadata_nodes(
        tables, explode_table_columns(tables)).collect()}
    assert "delta://gold.cat_test/sales" in keys
    assert "delta://gold.cat_test/sales/order_id" in keys

    # no lastModified without the delta jar -> empty last-updated frame with
    # the right contract
    lu = catalog_last_updated(scan)
    assert lu.columns == ["cluster", "schema", "table_name", "last_updated_time"]
    assert lu.count() == 0


def test_catalog_cli_pipeline_composition(catalog, tmp_path):
    """job.py --catalog-scan: one DESCRIBE walk -> scan rows + fs-probe
    locations -> apply_catalog merge (catalog channel epoch) -> staleness
    candidate report; second run no-ops via the ledger."""
    import json

    from amundsendatabuilder_spark import job
    from amundsendatabuilder_spark.sources.fs_probe import (
        table_last_updated_fs,
    )
    from amundsendatabuilder_spark.sources.spark_catalog import (
        catalog_locations,
        catalog_scrape,
    )
    from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

    spark = catalog
    # populate sales so its parquet dir has a probe-able file mtime
    spark.sql("INSERT INTO cat_test.sales VALUES (1, 2.0, '2024-01-01')")

    scraped = catalog_scrape(spark, schema_list=["cat_test"])
    locs = catalog_locations(spark, scraped)
    got = {r["table_name"]: r["location"] for r in locs.collect()}
    assert "sales" in got and "sales_v" not in got  # views carry no location
    probed = {r["table_name"]: r["last_updated_time"]
              for r in table_last_updated_fs(locs).collect()}
    # parquet table dirs keep data under partition subdirs; the probe reads
    # first-level files only, so at minimum the walk must not error — the
    # partitioned fixture may or may not surface a first-level file
    assert isinstance(probed, dict)

    wh = str(tmp_path / "wh")
    rc = job.main(["--warehouse", wh, "--catalog-scan",
                   "--catalog-schemas", "cat_test", "--buckets", "4"])
    assert rc == 0

    pipe = CDCPipeline(spark, wh, n_buckets=4)
    nodes = pipe.graph_nodes.read()
    tbl = {r["key"]: r for r in nodes.where("label='Table'").collect()}
    assert "delta://gold.cat_test/sales" in tbl
    assert tbl["delta://gold.cat_test/sales_v"]["attributes"]["is_view"] == "true"
    descs = {r["key"] for r in nodes.where("label='Description'").collect()}
    assert "delta://gold.cat_test/sales/_description" in descs
    cols = {r["key"] for r in nodes.where("label='Column'").collect()}
    assert "delta://gold.cat_test/sales/order_id" in cols

    # re-running the same catalog epoch is a ledger no-op
    from amundsendatabuilder_spark.sources.spark_catalog import (
        scan_rows_from_scrape,
    )

    m = pipe.apply_catalog(scan_rows_from_scrape(spark, scraped,
                                                 cluster="gold"), 0)
    assert m.get("skipped")


def test_catalog_locations_file_uri_forms(spark):
    """Spark emits single-slash 'file:/p' URIs; configs may carry
    'file:///p' — both must resolve to a plain path (a fixed-width strip
    mangled one form and silently no-op'd the whole fs probe)."""
    from amundsendatabuilder_spark.sources.spark_catalog import (
        catalog_locations,
    )

    scraped = [
        {"schema": "s", "table": "t1", "location": "file:/data/wh/t1",
         "is_view": False},
        {"schema": "s", "table": "t2", "location": "file:///data/wh/t2",
         "is_view": False},
        {"schema": "s", "table": "t3", "location": "s3a://bucket/t3",
         "is_view": False},
        {"schema": "s", "table": "v1", "location": "file:/x", "is_view": True},
    ]
    got = {r["table_name"]: r["location"]
           for r in catalog_locations(spark, scraped).collect()}
    assert got == {"t1": "/data/wh/t1", "t2": "/data/wh/t2",
                   "t3": "s3a://bucket/t3"}
