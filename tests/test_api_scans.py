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


def test_feast_scan_and_descriptions(spark):
    from amundsendatabuilder_spark.sources.api_scans import (
        feast_metadata_scan,
        feast_table_descriptions,
    )

    fts = {
        "driver_project": [{
            "name": "driver_stats",
            "entities": ["driver_id"],
            "features": [{"name": "trips_today", "dtype": "INT64"},
                         {"name": "rating", "dtype": "FLOAT"}],
            "created_timestamp_seconds": 1704153600,  # 2024-01-02 00:00:00
            "labels": {"team": "mobility"},
            "batch_source": {"type": "BATCH_FILE", "uri": "/data/x"},
            "stream_source": {"type": "STREAM_KAFKA", "topic": "t"},
        }],
    }
    entities = {"driver_id": {"name": "driver_id",
                              "description": "driver key",
                              "value_type": "INT64"}}

    scan = feast_metadata_scan(
        spark, lambda: list(fts), lambda p: fts[p],
        lambda n, p: entities[n], instance_name="main")
    rows = {r["col_name"]: r for r in scan.collect()}
    # entity columns first, features continue the sort order (ref :71-91)
    assert rows["driver_id"]["col_sort_order"] == 0
    assert rows["driver_id"]["col_description"] == "driver key"
    assert rows["trips_today"]["col_sort_order"] == 1
    assert rows["rating"]["col_type"] == "FLOAT"
    assert rows["rating"]["database"] == "feast"
    assert rows["rating"]["cluster"] == "main"
    assert rows["rating"]["schema"] == "driver_project"
    assert rows["rating"]["name"] == "driver_stats"

    descs = {r["description_source"]: r["description"]
             for r in feast_table_descriptions(
                 spark, lambda: list(fts), lambda p: fts[p]).collect()}
    assert descs["feature_table_details"] == (
        "* Created at **2024-01-02 00:00:00**\n"
        "* Labels:\n    * team: **mobility**\n")
    assert descs["batch_source"].startswith("```\n")
    assert "BATCH_FILE" in descs["batch_source"]
    assert "STREAM_KAFKA" in descs["stream_source"]


def test_atlas_search_scan_mapping_spec(spark):
    from amundsendatabuilder_spark.sources.atlas_search import (
        atlas_search_scan,
    )

    def entity(i):
        return {
            "typeName": "hive_table",
            "updateTime": 1704153600000 + i,
            "tags": ["pii"] if i == 0 else [],
            "classifications": [
                {"typeName": "gold", "entityStatus": "ACTIVE"},
                {"typeName": "old", "entityStatus": "DELETED"},
            ],
            "attributes": {
                "qualifiedName": f"db.tbl{i}@cl1",
                "name": f"tbl{i}",
                "description": f"table {i}",
                "popularityScore": 0 if i == 0 else 7.0,
                "uniqueUsage": 0,
                "parameters": {"sourceDescription": "src desc",
                               "other": "42"},
            },
            "relationshipAttributes": {
                "db": {"displayText": "db"},
                "columns": [
                    {"status": "ACTIVE",
                     "attributes": {"name": "c1", "description": "first"}},
                    {"status": "DELETED",
                     "attributes": {"name": "zz", "description": "gone"}},
                    {"status": "ACTIVE",
                     "attributes": {"name": "c2", "description": None}},
                ],
            },
        }

    # 60 entities across 3 search pages of 25 -> bulk chunks of 10
    all_entities = {f"g{i}": entity(i) for i in range(60)}
    calls = {"search": [], "bulk": []}

    def search_guids(offset, limit):
        calls["search"].append((offset, limit))
        return [f"g{i}" for i in range(offset, min(offset + limit, 60))]

    def entity_bulk(guids):
        calls["bulk"].append(len(guids))
        return [all_entities[g] for g in guids]

    df = atlas_search_scan(
        spark, lambda: 60, search_guids, entity_bulk,
        search_chunk_size=25, details_chunk_size=10)
    rows = {r["name"]: r for r in df.collect()}
    assert len(rows) == 60
    assert calls["search"] == [(0, 25), (25, 25), (50, 25)]
    assert all(n == 10 for n in calls["bulk"])

    r = rows["tbl1"]
    assert r["database"] == "hive_table"
    assert r["cluster"] == "cl1"                 # qualifiedName @-suffix
    assert r["display_name"] == "db.tbl1"        # qualifiedName @-prefix
    assert r["schema"] == "db"
    assert r["key"] == "db.tbl1@cl1"
    assert r["last_updated_timestamp"] == 1704153600
    assert r["total_usage"] == 7
    assert r["unique_usage"] == 1                # 0 is falsy -> default 1
    assert rows["tbl0"]["total_usage"] == 0      # falsy -> default 0
    # ACTIVE columns only; None descriptions dropped (helper :36-43)
    assert r["column_names"] == ["c1", "c2"]
    assert r["column_descriptions"] == ["first"]
    assert r["badges"] == ["gold"]               # ACTIVE classifications
    assert rows["tbl0"]["tags"] == ["pii"]
    assert r["tags"] == []                       # empty -> default []
    assert r["schema_description"] == "src desc"
    assert sorted(r["programmatic_descriptions"]) == ["42", "src desc"]


def test_atlas_mapping_spec_whitelist(spark):
    import pytest as _pytest

    from amundsendatabuilder_spark.sources.atlas_search import (
        mapping_spec_select,
    )
    from pyspark.sql import functions as F

    with _pytest.raises(ValueError, match="unknown mapping transform"):
        mapping_spec_select([("f", "a.b", "exec_evil", None)], F.col("e"))


def test_bigquery_watermark_scan(spark):
    from amundsendatabuilder_spark.operators.amundsen_models import (
        watermark_nodes,
    )
    from amundsendatabuilder_spark.sources.api_scans import (
        bigquery_watermark_scan,
    )

    ds_ref = {"projectId": "proj", "datasetId": "web"}

    def tbl(table_id, **extra):
        return {"tableReference": {"projectId": "proj", "datasetId": "web",
                                   "tableId": table_id}, **extra}

    tables = [
        # sharded date-range family (watermarks = min/max suffix)
        tbl("ga_sessions_20190102", creationTime="1546387200000"),
        tbl("ga_sessions_20190101", creationTime="1546300800000"),
        tbl("ga_sessions_20190105", creationTime="1546646400000"),
        # time-partitioned table with explicit field
        tbl("events", timePartitioning={"field": "event_date"}),
        # time-partitioned, default pseudo-column
        tbl("logs", timePartitioning={}),
        # neither sharded nor partitioned -> no watermark
        tbl("lookup"),
    ]
    partitions = {
        "events": [("20240110", 1704844800.0), ("20240120", 1705708800.0)],
        "logs": [("20240201", 1706745600.0)],
        "lookup": [],
    }

    wm = bigquery_watermark_scan(
        spark, lambda: iter([{"datasets": [{"datasetReference": ds_ref}]}]),
        lambda ref: iter([{"tables": tables}]),
        lambda ref: partitions[ref["tableId"]])
    rows = {(r["table_name"], r["part_type"]): r for r in wm.collect()}

    lo = rows[("ga_sessions_", "low_watermark")]
    hi = rows[("ga_sessions_", "high_watermark")]
    assert lo["part_name"] == "__table__=20190101"
    assert hi["part_name"] == "__table__=20190105"
    # create_time from the lowest shard's creationTime (2019-01-01, UTC)
    assert lo["create_time"] == "2019-01-01 00:00:00"
    assert lo["database"] == "bigquery" and lo["schema"] == "web"
    assert lo["cluster"] == "proj"

    assert rows[("events", "low_watermark")]["part_name"] == "event_date=20240110"
    assert rows[("events", "high_watermark")]["part_name"] == "event_date=20240120"
    assert rows[("events", "low_watermark")]["create_time"] == "2024-01-10 00:00:00"
    # default partition pseudo-column; single partition = both watermarks
    assert rows[("logs", "low_watermark")]["part_name"] == "_PARTITIONTIME=20240201"
    assert rows[("logs", "high_watermark")]["part_name"] == "_PARTITIONTIME=20240201"
    assert ("lookup", "low_watermark") not in rows

    # lands in the Watermark node contract
    keys = {r["key"] for r in watermark_nodes(wm).collect()}
    assert "bigquery://proj.web/ga_sessions_/low_watermark/" in keys


def test_atlas_user_spec_generalizes_compiler(spark):
    """VERDICT r04 directive 6: the mapping-spec compiler over a SECOND
    entity type (the reference registry is keyed by type, :81,157)."""
    from amundsendatabuilder_spark.sources.atlas_search import (
        ENTITY_SCHEMA_BY_TYPE,
        FIELDS_MAPPING_SPEC_BY_TYPE,
        atlas_search_scan,
    )

    def user(i):
        return {
            "typeName": "User",
            "status": "ACTIVE" if i % 2 == 0 else "DELETED",
            "attributes": {
                "qualifiedName": f"u{i}@example.org",
                "name": f"User Num{i}",
                "firstName": "User",
                "lastName": f"Num{i}",
                "githubUsername": f"gh{i}",
                "employeeType": "swe",
                "slackId": f"s{i}",
                "roleName": "eng",
                "totalRead": i * 10,
                "totalOwn": 0,
                "totalFollow": None,
            },
            "relationshipAttributes": {
                "team": {"displayText": "Team A"},
                "manager": {"displayText": "boss@example.org"},
            },
        }

    users = {f"g{i}": user(i) for i in range(4)}
    df = atlas_search_scan(
        spark, lambda: 4,
        lambda off, lim: [f"g{i}" for i in range(off, min(off + lim, 4))],
        lambda guids: [users[g] for g in guids],
        spec=FIELDS_MAPPING_SPEC_BY_TYPE["User"],
        entity_schema=ENTITY_SCHEMA_BY_TYPE["User"],
        search_chunk_size=10, details_chunk_size=10)
    rows = {r["email"]: r for r in df.collect()}
    assert len(rows) == 4
    r = rows["u1@example.org"]
    assert r["full_name"] == "User Num1"
    assert r["team_name"] == "Team A"
    assert r["manager_email"] == "boss@example.org"
    assert r["is_active"] is False            # DELETED status
    assert rows["u2@example.org"]["is_active"] is True
    assert r["total_read"] == 10
    assert r["total_own"] == 0
    assert r["total_follow"] == 0             # null -> default 0
