"""Client-injected API scans (Glue / BigQuery / Cassandra / BambooHR) over
deterministic fakes — paging loops, shard grouping, nested-column flatten,
and XML parse mirror the reference extractors' unit-test semantics."""

from amundsendatabuilder_spark.sources.api_scans import (
    bamboohr_user_scan,
    bigquery_metadata_scan,
    cassandra_metadata_scan,
    glue_metadata_scan,
)
from amundsendatabuilder_spark.sources.jdbc import regroup_to_table_metadata
from amundsendatabuilder_spark.sources.spark_catalog import catalog_table_rows


def test_glue_scan_paging_and_partition_keys(spark):
    pages = [
        {"TableList": [{
            "DatabaseName": "db1", "Name": "orders",
            "Description": "all orders",
            "TableType": "EXTERNAL_TABLE",
            "StorageDescriptor": {"Columns": [
                {"Name": "order_id", "Type": "bigint", "Comment": "pk"},
                {"Name": "amount", "Type": "double"},
            ]},
            "PartitionKeys": [{"Name": "ds", "Type": "string"}],
        }], "NextToken": "t1"},
        {"TableList": [{
            "DatabaseName": "db1", "Name": "users_v",
            "Parameters": {"comment": "from params"},
            "TableType": "VIRTUAL_VIEW",
            "StorageDescriptor": {"Columns": [
                {"Name": "user_id", "Type": "bigint"},
            ]},
        }]},
    ]
    calls = []

    def search_tables(**kwargs):
        calls.append(dict(kwargs))
        return pages[1] if kwargs.get("NextToken") == "t1" else pages[0]

    scan = glue_metadata_scan(spark, search_tables, cluster="prod",
                              filters=[{"Key": "x"}])
    # NextToken paging walked exactly like glue_extractor.py:78-90
    assert calls == [{"Filters": [{"Key": "x"}]},
                     {"Filters": [{"Key": "x"}], "NextToken": "t1"}]
    rows = {(r["name"], r["col_name"]): r for r in scan.collect()}
    assert rows[("orders", "order_id")]["col_description"] == "pk"
    assert rows[("orders", "ds")]["col_sort_order"] == 2  # after data columns
    assert rows[("orders", "ds")]["is_partition"] is True
    assert rows[("users_v", "user_id")]["description"] == "from params"
    assert rows[("users_v", "user_id")]["is_view"] is True

    tm = {r["name"]: r for r in regroup_to_table_metadata(
        catalog_table_rows(scan)).collect()}
    assert [c["name"] for c in tm["orders"]["columns"]] == ["order_id", "amount", "ds"]


def test_bigquery_scan_shards_and_nested(spark):
    datasets = [{"datasets": [{"datasetReference": {"projectId": "p", "datasetId": "d"}}]}]
    tables = [{"tables": [
        {"tableReference": {"projectId": "p", "datasetId": "d", "tableId": "ga_sessions_20240101"}},
        {"tableReference": {"projectId": "p", "datasetId": "d", "tableId": "ga_sessions_20240102"}},
        {"tableReference": {"projectId": "p", "datasetId": "d", "tableId": "plain"}},
    ]}]

    def get_table(ref):
        if ref["tableId"].startswith("ga_sessions"):
            return {"type": "TABLE", "description": "ga",
                    "schema": {"fields": [{"name": "visit", "type": "INTEGER"}]}}
        return {"type": "VIEW", "description": "nested", "schema": {"fields": [
            {"name": "id", "type": "INTEGER"},
            {"name": "addr", "type": "RECORD", "fields": [
                {"name": "city", "type": "STRING"},
                {"name": "zip", "type": "STRING"},
            ]},
            {"name": "tail", "type": "INTEGER"},
        ]}}

    scan = bigquery_metadata_scan(
        spark, lambda: iter(datasets), lambda ds: iter(tables), get_table)
    rows = scan.collect()
    names = {r["name"] for r in rows}
    # date-sharded tables collapse to ONE prefix entry (:45-58)
    assert names == {"ga_sessions_", "plain"}
    plain = {r["col_name"]: r["col_sort_order"] for r in rows if r["name"] == "plain"}
    # reference flatten quirk preserved exactly (:74-79 passes total_cols + 1
    # per TOP-LEVEL field, so top-level sort orders skip a slot after every
    # non-RECORD sibling): 1, 3, 4, 5, 7 — not a dense 1..5
    assert plain == {"id": 1, "addr": 3, "addr.city": 4, "addr.zip": 5, "tail": 7}
    assert all(r["is_view"] for r in rows if r["name"] == "plain")


def test_cassandra_scan_filters(spark):
    ks = {
        "system_schema": {"tables": {"x": "int"}},
        "app": {
            "events": {"id": "uuid", "ts": "timestamp"},
            "skipme": {"id": "uuid"},
        },
    }
    scan = cassandra_metadata_scan(
        spark, ks, table_filter=lambda k, t: t != "skipme")
    rows = {(r["schema"], r["name"], r["col_name"]): r["col_sort_order"]
            for r in scan.collect()}
    assert rows == {("app", "events", "id"): 0, ("app", "events", "ts"): 1}


def test_bamboohr_user_scan(spark):
    xml = b"""<directory><employees>
      <employee id="1">
        <field id="workEmail">a@x.com</field>
        <field id="firstName">Ann</field>
        <field id="lastName">Lee</field>
        <field id="displayName">Ann Lee</field>
        <field id="department">Data</field>
        <field id="jobTitle">SWE</field>
      </employee>
      <employee id="2">
        <field id="workEmail">b@x.com</field>
        <field id="firstName">Bo</field>
      </employee>
    </employees></directory>"""
    users = {r["email"]: r for r in bamboohr_user_scan(spark, lambda: xml).collect()}
    assert users["a@x.com"]["full_name"] == "Ann Lee"
    assert users["a@x.com"]["team_name"] == "Data"
    assert users["a@x.com"]["role_name"] == "SWE"
    # missing fields come back as '' (reference :47-52), not null
    assert users["b@x.com"]["last_name"] == ""

    from amundsendatabuilder_spark.operators.amundsen_models import user_nodes

    keys = {r["key"] for r in user_nodes(
        bamboohr_user_scan(spark, lambda: xml)).collect()}
    assert keys == {"a@x.com", "b@x.com"}
