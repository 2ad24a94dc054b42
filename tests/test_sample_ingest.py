"""End-to-end fixture replay: the reference's example/sample_data 21-CSV
family through every entity path → graph tables → the three ES doc
families (sample_data_loader.py:299-365 parity), committed as one
idempotent fixture epoch."""

import os

import pytest
from pyspark.sql import functions as F

from amundsendatabuilder_spark.sample_ingest import (
    fixture_docs,
    fixture_graph,
    ingest_fixture_dir,
)

DATA = "/root/reference/example/sample_data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference fixture CSVs not present"
)


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline

    wh = str(tmp_path_factory.mktemp("fixture_wh"))
    pipe = CDCPipeline(spark, wh, n_buckets=8)
    metrics = ingest_fixture_dir(pipe, DATA)
    return pipe, metrics


def test_fixture_epoch_commits_and_is_idempotent(ingested):
    pipe, metrics = ingested
    assert metrics["graph"]["nodes"]["rows_inserted"] > 100
    assert metrics["graph"]["rels"]["rows_inserted"] > 100
    assert set(metrics["families"]) >= {
        "table_metadata", "column_badges", "table_badges", "column_stats",
        "programmatic_source", "watermark", "table_owner", "column_usage",
        "user", "application", "table_source", "tags", "table_last_updated",
        "schema_description", "dashboard_metadata", "dashboard_usage",
        "dashboard_owner", "dashboard_query", "dashboard_execution",
        "dashboard_last_modified", "dashboard_table", "es_last_updated",
    }
    # replaying the same epoch is a ledger no-op
    again = ingest_fixture_dir(pipe, DATA)
    assert again["graph"] == {"epoch": 0, "skipped": True}


def test_fixture_graph_golden_nodes(ingested):
    pipe, _ = ingested
    nodes = {(r["key"], r["label"]): (r["attributes"] or {})
             for r in pipe.graph_nodes.read().collect()}
    tk = "hive://gold.test_schema/test_table1"

    assert nodes[(tk, "Table")]["name"] == "test_table1"
    assert nodes[("database://hive", "Database")]["name"] == "hive"
    assert nodes[(f"{tk}/col1", "Column")]["type"] == "string"
    # programmatic descriptions: _{source}_description keys under the
    # Programmatic_Description label (table_metadata.py:100-127)
    assert nodes[(f"{tk}/_s3_crawler_description",
                  "Programmatic_Description")][
        "description_source"] == "s3_crawler"
    assert (f"{tk}/_quality_service_description",
            "Programmatic_Description") in nodes
    # plain description node untouched by the programmatic rows
    assert nodes[(f"{tk}/_description", "Description")][
        "description"] == "1st test table"
    # watermarks: key = {table}/{part_type}/, first part key/value split
    wm = nodes[(f"{tk}/high_watermark/", "Watermark")]
    assert wm["partition_key"] == "col3"
    assert wm["partition_value"] == "2019-09-30/col4=11"
    # stats: {table}/{col}/{stat_name}/
    assert nodes[(f"{tk}/col1/distinct values/", "Stat")]["stat_val"] == "8"
    # badges: table-level (beta) and column-level (pk/pii, category column)
    assert nodes[("beta", "Badge")]["category"] == "table_status"
    assert nodes[("pk", "Badge")]["category"] == "column"
    # the user CSV's rich profile wins over the owner/usage email stubs
    roald = nodes[("roald.amundsen@example.org", "User")]
    assert roald["first_name"] == "Roald"
    assert roald["github_username"] == "amundsen-io"
    # standalone tags + table tags + programmatic tags all land
    for tag in ("pii", "high_quality", "tag1", "recommended", "expensive"):
        assert (tag, "Tag") in nodes, tag
    # application, source, last-updated, schema-description, es sentinel
    assert ("application://gold.airflow/event_test/hive.test_schema.test_table1",
            "Application") in nodes
    assert nodes[(f"{tk}/_source", "Source")]["source_type"] == "github"
    assert nodes[(f"{tk}/timestamp", "Timestamp")][
        "last_updated_timestamp"] == "1570230473"
    assert nodes[("hive://gold.test_schema", "Schema")]["name"] == "test_schema"
    assert ("amundsen_updated_timestamp", "Updatedtimestamp") in nodes
    # dashboards
    dk = "mode_dashboard://gold.test_group_id_1/test_dashboard_id_1"
    assert nodes[(dk, "Dashboard")]["name"] == "test dashboard"
    assert (f"{dk}/query/query_1", "Query") in nodes
    assert (f"{dk}/execution/_last_successful_execution", "Execution") in nodes


def test_fixture_graph_golden_relations(ingested):
    pipe, _ = ingested
    rels = {(r["start_key"], r["end_key"], r["type"])
            for r in pipe.graph_relations.read().collect()}
    tk = "hive://gold.test_schema/test_table1"
    dk = "mode_dashboard://gold.test_group_id_1/test_dashboard_id_1"

    assert ("hive://gold.test_schema", tk, "TABLE") in rels
    assert (tk, f"{tk}/col1", "COLUMN") in rels
    assert ("roald.amundsen@example.org", tk, "OWNER_OF") in rels
    # usage wire direction: Table-[READ_BY]->User (column_usage_model.py:75-85)
    assert (tk, "roald.amundsen@example.org", "READ_BY") in rels
    assert ("roald.amundsen@example.org", "phboss@example.org",
            "MANAGE_BY") in rels
    assert (f"{tk}/high_watermark/", tk, "BELONG_TO_TABLE") in rels
    assert (f"{tk}/col1/distinct values/", f"{tk}/col1", "STAT_OF") in rels
    assert (f"{tk}/col1", "pk", "HAS_BADGE") in rels
    assert (tk, "beta", "HAS_BADGE") in rels
    assert (tk, "tag1", "TAGGED_BY") in rels
    assert (tk,
            "application://gold.airflow/event_test/hive.test_schema.test_table1",
            "DERIVED_FROM") in rels
    assert (dk, tk, "DASHBOARD_WITH_TABLE") in rels
    assert (dk, "roald.amundsen@example.org", "OWNER") in rels
    assert (dk, f"{dk}/query/query_1", "HAS_QUERY") in rels


def test_fixture_docs_golden(ingested):
    pipe, metrics = ingested
    docs = fixture_docs(pipe.graph_nodes.read(), pipe.graph_relations.read())
    tdoc = {r["key"]: r for r in docs["table"].collect()}
    t1 = tdoc["hive://gold.test_schema/test_table1"]
    assert t1["name"] == "test_table1"
    assert set(t1["column_names"]) >= {"col1", "col2", "col3"}
    assert "beta" in (t1["badges"] or [])
    assert {"tag1", "tag2"} <= set(t1["tags"] or [])
    assert t1["schema_description"] == "test schema description"
    assert any("50T" in d for d in (t1["programmatic_descriptions"] or []))

    udoc = {r["email"]: r for r in docs["user"].collect()}
    roald = udoc["roald.amundsen@example.org"]
    assert roald["manager_email"] == "phboss@example.org"
    assert roald["total_own"] >= 1
    assert roald["total_read"] >= 500

    ddoc = {r["uri"]: r for r in docs["dashboard"].collect()}
    d1 = ddoc["mode_dashboard://gold.test_group_id_1/test_dashboard_id_1"]
    assert d1["name"] == "test dashboard"
    assert d1["group_name"] == "test group1"
    assert metrics["table_docs"] == len(tdoc)


def test_fixture_graph_no_duplicate_keys(spark):
    nodes, rels, _ = fixture_graph(spark, DATA)
    assert nodes.groupBy("key", "label").count().where("count > 1").count() == 0
    assert rels.groupBy("start_key", "end_key", "type").count().where(
        "count > 1").count() == 0
