"""Golden parity: our model expansions must serialize to exactly the shapes
the reference's own unit tests assert (expected dicts transcribed from
/root/reference/tests/unit/models/test_table_metadata.py:36-120,
test_watermark.py:39-75, test_table_owner.py:44-77)."""

import pytest

from amundsendatabuilder_spark.operators import amundsen_models as am


def node_dicts(df):
    out = []
    for r in df.collect():
        d = {"KEY": r["key"], "LABEL": r["label"]}
        at = r["attr_types"] or {}
        for k, v in (r["attributes"] or {}).items():
            if at.get(k) == "int":
                d[f"{k}:UNQUOTED"] = int(v)
            elif at.get(k) == "bool":
                d[f"{k}:UNQUOTED"] = v == "true"
            else:
                d[k] = v
        out.append(d)
    return out


def rel_dicts(df):
    out = []
    for r in df.collect():
        d = {
            "START_KEY": r["start_key"], "START_LABEL": r["start_label"],
            "END_KEY": r["end_key"], "END_LABEL": r["end_label"],
            "TYPE": r["type"], "REVERSE_TYPE": r["reverse_type"],
        }
        at = r["attr_types"] or {}
        for k, v in (r["attributes"] or {}).items():
            if at.get(k) == "int":
                d[f"{k}:UNQUOTED"] = int(v)
            else:
                d[k] = v
        out.append(d)
    return out


@pytest.fixture(scope="module")
def table_fixture(spark):
    tables = spark.createDataFrame(
        [("hive", "gold", "test_schema1", "test_table1", "test_table1", None, False, None)],
        "database string, cluster string, schema string, name string, "
        "description string, tags string, is_view boolean, description_source string",
    )
    cols = [
        ("test_id1", "description of test_table1", "bigint", 0),
        ("test_id2", "description of test_id2", "bigint", 1),
        ("is_active", None, "boolean", 2),
        ("source", "description of source", "varchar", 3),
        ("etl_created_at", "description of etl_created_at", "timestamp", 4),
        ("ds", None, "varchar", 5),
    ]
    columns = spark.createDataFrame(
        [c + ("hive", "gold", "test_schema1", "test_table1") for c in cols],
        "name string, description string, col_type string, sort_order int, "
        "database string, cluster string, schema string, table_name string",
    )
    return tables, columns


def test_table_metadata_nodes_golden(spark, table_fixture):
    tables, columns = table_fixture
    got = node_dicts(am.table_metadata_nodes(tables, columns))
    # expected per reference test_table_metadata.py:36-70
    expected = [
        {"name": "test_table1", "KEY": "hive://gold.test_schema1/test_table1",
         "LABEL": "Table", "is_view:UNQUOTED": False},
        {"description": "test_table1",
         "KEY": "hive://gold.test_schema1/test_table1/_description",
         "LABEL": "Description", "description_source": "description"},
        {"sort_order:UNQUOTED": 0, "type": "bigint", "name": "test_id1",
         "KEY": "hive://gold.test_schema1/test_table1/test_id1", "LABEL": "Column"},
        {"description": "description of test_table1",
         "KEY": "hive://gold.test_schema1/test_table1/test_id1/_description",
         "LABEL": "Description", "description_source": "description"},
        {"sort_order:UNQUOTED": 1, "type": "bigint", "name": "test_id2",
         "KEY": "hive://gold.test_schema1/test_table1/test_id2", "LABEL": "Column"},
        {"description": "description of test_id2",
         "KEY": "hive://gold.test_schema1/test_table1/test_id2/_description",
         "LABEL": "Description", "description_source": "description"},
        {"sort_order:UNQUOTED": 2, "type": "boolean", "name": "is_active",
         "KEY": "hive://gold.test_schema1/test_table1/is_active", "LABEL": "Column"},
        {"sort_order:UNQUOTED": 3, "type": "varchar", "name": "source",
         "KEY": "hive://gold.test_schema1/test_table1/source", "LABEL": "Column"},
        {"description": "description of source",
         "KEY": "hive://gold.test_schema1/test_table1/source/_description",
         "LABEL": "Description", "description_source": "description"},
        {"sort_order:UNQUOTED": 4, "type": "timestamp", "name": "etl_created_at",
         "KEY": "hive://gold.test_schema1/test_table1/etl_created_at", "LABEL": "Column"},
        {"description": "description of etl_created_at",
         "KEY": "hive://gold.test_schema1/test_table1/etl_created_at/_description",
         "LABEL": "Description", "description_source": "description"},
        {"sort_order:UNQUOTED": 5, "type": "varchar", "name": "ds",
         "KEY": "hive://gold.test_schema1/test_table1/ds", "LABEL": "Column"},
        {"name": "hive", "KEY": "database://hive", "LABEL": "Database"},
        {"name": "gold", "KEY": "hive://gold", "LABEL": "Cluster"},
        {"name": "test_schema1", "KEY": "hive://gold.test_schema1", "LABEL": "Schema"},
    ]
    for e in expected:
        assert e in got, f"missing node {e}"
    assert len(got) == len(expected)


def test_table_metadata_relations_golden(spark, table_fixture):
    tables, columns = table_fixture
    got = rel_dicts(am.table_metadata_relations(tables, columns))
    tk = "hive://gold.test_schema1/test_table1"
    expected = [
        {"START_KEY": "hive://gold.test_schema1", "START_LABEL": "Schema",
         "END_KEY": tk, "END_LABEL": "Table", "TYPE": "TABLE", "REVERSE_TYPE": "TABLE_OF"},
        {"START_KEY": tk, "START_LABEL": "Table", "END_KEY": f"{tk}/_description",
         "END_LABEL": "Description", "TYPE": "DESCRIPTION", "REVERSE_TYPE": "DESCRIPTION_OF"},
        {"START_KEY": "database://hive", "START_LABEL": "Database", "END_KEY": "hive://gold",
         "END_LABEL": "Cluster", "TYPE": "CLUSTER", "REVERSE_TYPE": "CLUSTER_OF"},
        {"START_KEY": "hive://gold", "START_LABEL": "Cluster",
         "END_KEY": "hive://gold.test_schema1", "END_LABEL": "Schema",
         "TYPE": "SCHEMA", "REVERSE_TYPE": "SCHEMA_OF"},
    ]
    for col in ["test_id1", "test_id2", "is_active", "source", "etl_created_at", "ds"]:
        expected.append(
            {"START_KEY": tk, "START_LABEL": "Table", "END_KEY": f"{tk}/{col}",
             "END_LABEL": "Column", "TYPE": "COLUMN", "REVERSE_TYPE": "COLUMN_OF"}
        )
    for col in ["test_id1", "test_id2", "source", "etl_created_at"]:
        expected.append(
            {"START_KEY": f"{tk}/{col}", "START_LABEL": "Column",
             "END_KEY": f"{tk}/{col}/_description", "END_LABEL": "Description",
             "TYPE": "DESCRIPTION", "REVERSE_TYPE": "DESCRIPTION_OF"}
        )
    for e in expected:
        assert e in got, f"missing rel {e}"
    assert len(got) == len(expected)


def test_watermark_golden(spark):
    wm = spark.createDataFrame(
        [("2017-09-18T00:00:00", "DYNAMO", "BASE", "TEST",
          "ds=2017-09-18/feature_id=9", "LOW_WATERMARK", "DEFAULT")],
        "create_time string, database string, schema string, table_name string, "
        "part_name string, part_type string, cluster string",
    )
    nodes = node_dicts(am.watermark_nodes(wm))
    rels = rel_dicts(am.watermark_relations(wm))
    start_key = "DYNAMO://DEFAULT.BASE/TEST/LOW_WATERMARK/"
    assert nodes == [{
        "KEY": start_key, "LABEL": "Watermark",
        "partition_key": "ds", "partition_value": "2017-09-18/feature_id=9",
        "create_time": "2017-09-18T00:00:00",
    }]
    assert rels == [{
        "START_KEY": start_key, "START_LABEL": "Watermark",
        "END_KEY": "DYNAMO://DEFAULT.BASE/TEST", "END_LABEL": "Table",
        "TYPE": "BELONG_TO_TABLE", "REVERSE_TYPE": "WATERMARK",
    }]


def test_table_owner_golden(spark):
    owners = spark.createDataFrame(
        [("hive", "test_schema", "default", "test_table", "user1@gmail.com, user2@gmail.com")],
        "db_name string, schema string, cluster string, table_name string, owners string",
    )
    nodes = node_dicts(am.table_owner_nodes(owners))
    rels = rel_dicts(am.table_owner_relations(owners))
    tk = "hive://default.test_schema/test_table"
    for email in ["user1@gmail.com", "user2@gmail.com"]:
        assert {"KEY": email, "LABEL": "User", "email": email} in nodes
        assert {
            "START_KEY": email, "START_LABEL": "User", "END_KEY": tk,
            "END_LABEL": "Table", "TYPE": "OWNER_OF", "REVERSE_TYPE": "OWNER",
        } in rels
    assert len(nodes) == 2 and len(rels) == 2


def test_column_usage_golden(spark):
    usage = spark.createDataFrame(
        [("hive", "gold", "scm", "tbl", "*", "john@example.com", 100)],
        "database string, cluster string, schema string, table_name string, "
        "column_name string, user_email string, read_count int",
    )
    rels = rel_dicts(am.column_usage_relations(usage))
    # reference wire direction: type=TABLE_USER_RELATION_TYPE='READ_BY'
    # (column_usage_model.py:75-85)
    assert rels == [{
        "START_KEY": "hive://gold.scm/tbl", "START_LABEL": "Table",
        "END_KEY": "john@example.com", "END_LABEL": "User",
        "TYPE": "READ_BY", "REVERSE_TYPE": "READ", "read_count:UNQUOTED": 100,
    }]


def test_badge_and_source_and_last_updated(spark):
    badges = spark.createDataFrame(
        [("Beta", "table_status", "hive", "gold", "scm", "tbl")],
        "name string, category string, database string, cluster string, schema string, table_name string",
    )
    assert node_dicts(am.badge_nodes(badges)) == [
        {"KEY": "beta", "LABEL": "Badge", "category": "table_status"}
    ]
    assert rel_dicts(am.badge_relations(badges, start_label="Table")) == [{
        "START_KEY": "hive://gold.scm/tbl", "START_LABEL": "Table",
        "END_KEY": "beta", "END_LABEL": "Badge",
        "TYPE": "HAS_BADGE", "REVERSE_TYPE": "BADGE_FOR",
    }]

    srcs = spark.createDataFrame(
        [("hive", "scm", "gold", "tbl", "/etl/repo.py", "github")],
        "db_name string, schema string, cluster string, table_name string, source string, source_type string",
    )
    assert node_dicts(am.table_source_nodes(srcs)) == [{
        "KEY": "hive://gold.scm/tbl/_source", "LABEL": "Source",
        "source": "/etl/repo.py", "source_type": "github",
    }]

    lu = spark.createDataFrame(
        [("gold", "hive", "scm", "tbl", 160000000)],
        "cluster string, db string, schema string, table_name string, last_updated_time_epoch long",
    )
    assert node_dicts(am.table_last_updated_nodes(lu)) == [{
        "KEY": "hive://gold.scm/tbl/timestamp", "LABEL": "Timestamp",
        "last_updated_timestamp:UNQUOTED": 160000000,
        "timestamp:UNQUOTED": 160000000,
        "name": "last_updated_timestamp",
    }]
    assert rel_dicts(am.table_last_updated_relations(lu)) == [{
        "START_KEY": "hive://gold.scm/tbl", "START_LABEL": "Table",
        "END_KEY": "hive://gold.scm/tbl/timestamp", "END_LABEL": "Timestamp",
        "TYPE": "LAST_UPDATED_AT", "REVERSE_TYPE": "LAST_UPDATED_TIME_OF",
    }]


def test_lineage_regex_skips_invalid(spark):
    ln = spark.createDataFrame(
        [("hive://gold.scm/tbl", "hive://gold.scm/tbl2, not-a-key, hive://gold.scm/tbl3")],
        "source_table_key string, downstream_deps string",
    )
    rels = rel_dicts(am.table_lineage_relations(ln))
    ends = {r["END_KEY"] for r in rels}
    assert ends == {"hive://gold.scm/tbl2", "hive://gold.scm/tbl3"}
    assert all(r["TYPE"] == "UPSTREAM" and r["REVERSE_TYPE"] == "DOWNSTREAM" for r in rels)


# ---- dashboard family (databuilder/models/dashboard/*.py) -------------------

def test_dashboard_family_golden(spark):
    """Key grammar + node/relation shapes per the reference dashboard models
    (dashboard_metadata.py:28-53, dashboard_query.py:21-25,
    dashboard_chart.py:21-25, dashboard_execution.py:21-25,
    dashboard_last_modified.py:23-24, dashboard_owner.py, dashboard_usage.py,
    dashboard_table.py:26-27)."""
    from amundsendatabuilder_spark.operators import dashboard_models as dm
    import pyspark.sql.functions as F

    base = spark.createDataFrame(
        [("mode", "gold", "grp", "Data Group", "https://g", "gd",
          "d1", "First Dash", "a dash", 1000, "https://d", ["Viz ", "core"])],
        "product string, cluster string, group_id string, group_name string, "
        "group_url string, group_description string, dashboard_id string, "
        "dashboard_name string, description string, created_timestamp long, "
        "dashboard_url string, tags array<string>",
    )
    nodes = {(r["key"], r["label"]): r["attributes"]
             for r in dm.dashboard_metadata_nodes(base).collect()}
    dkey = "mode_dashboard://gold.grp/d1"
    assert ("mode_dashboard://gold", "Cluster") in nodes
    assert nodes[("mode_dashboard://gold.grp", "Dashboardgroup")]["name"] == "Data Group"
    assert nodes[(dkey, "Dashboard")]["name"] == "First Dash"
    assert nodes[(dkey + "/_description", "Description")]["description"] == "a dash"
    assert nodes[("mode_dashboard://gold.grp/_description", "Description")]["description"] == "gd"
    assert ("viz", "Tag") in nodes and nodes[("viz", "Tag")]["tag_type"] == "dashboard"

    rels = {(r["start_key"], r["end_key"], r["type"]): r
            for r in dm.dashboard_metadata_relations(base).collect()}
    assert ("mode_dashboard://gold", "mode_dashboard://gold.grp", "DASHBOARD_GROUP") in rels
    assert (dkey, "mode_dashboard://gold.grp", "DASHBOARD_OF") in rels
    assert (dkey, "viz", "TAG") in rels
    assert rels[(dkey, "core", "TAG")]["reverse_type"] == "TAG_OF"

    q = base.select("product", "cluster", "group_id", "dashboard_id",
                    F.lit("q9").alias("query_id"), F.lit("Q").alias("query_name"),
                    F.lit(None).cast("string").alias("url"),
                    F.lit("SELECT 1").alias("query_text"))
    qn = dm.dashboard_query_nodes(q).collect()[0]
    assert qn["key"] == dkey + "/query/q9" and qn["label"] == "Query"
    assert qn["attributes"]["query_text"] == "SELECT 1"
    qr = dm.dashboard_query_relations(q).collect()[0]
    assert (qr["type"], qr["reverse_type"]) == ("HAS_QUERY", "QUERY_OF")

    c = q.select("product", "cluster", "group_id", "dashboard_id", "query_id",
                 F.lit("c3").alias("chart_id"), F.lit("C").alias("chart_name"),
                 F.lit("bar").alias("chart_type"),
                 F.lit(None).cast("string").alias("chart_url"))
    cn = dm.dashboard_chart_nodes(c).collect()[0]
    assert cn["key"] == dkey + "/query/q9/chart/c3" and cn["label"] == "Chart"
    cr = dm.dashboard_chart_relations(c).collect()[0]
    assert cr["start_key"] == dkey + "/query/q9"
    assert (cr["type"], cr["reverse_type"]) == ("HAS_CHART", "CHART_OF")

    e = base.select("product", "cluster", "group_id", "dashboard_id",
                    F.lit("_last_successful_execution").alias("execution_id"),
                    F.lit(1700).alias("timestamp"), F.lit("succeeded").alias("state"))
    en = dm.dashboard_execution_nodes(e).collect()[0]
    assert en["key"] == dkey + "/execution/_last_successful_execution"
    assert en["attributes"]["state"] == "succeeded"
    assert en["attr_types"]["timestamp"] == "int"

    m = base.select("product", "cluster", "group_id", "dashboard_id",
                    F.lit(1710).alias("last_modified_timestamp"))
    mn = dm.dashboard_last_modified_nodes(m).collect()[0]
    assert mn["key"] == dkey + "/_last_modified_timestamp"
    assert mn["label"] == "Timestamp"
    mr = dm.dashboard_last_modified_relations(m).collect()[0]
    assert (mr["type"], mr["reverse_type"]) == ("LAST_UPDATED_AT", "LAST_UPDATED_TIME_OF")

    o = base.select("product", "cluster", "group_id", "dashboard_id",
                    F.lit("o@x.com").alias("email"))
    orr = dm.dashboard_owner_relations(o).collect()[0]
    assert (orr["type"], orr["reverse_type"]) == ("OWNER", "OWNER_OF")
    assert orr["end_key"] == "o@x.com"

    u = o.withColumnRenamed("email", "email").withColumn("view_count", F.lit(7)) \
         .withColumnRenamed("email", "email")
    ur = dm.dashboard_usage_relations(u).collect()[0]
    assert (ur["type"], ur["reverse_type"]) == ("READ_BY", "READ")
    assert ur["attributes"]["read_count"] == "7"
    assert ur["attr_types"]["read_count"] == "int"

    t = base.select("product", "cluster", "group_id", "dashboard_id",
                    F.explode(F.array(
                        F.lit("hive://gold.core/orders"),
                        F.lit("not-a-key"),
                    )).alias("table_id"))
    tr = dm.dashboard_table_relations(t).collect()
    assert len(tr) == 1  # invalid table_id silently skipped (ref regex guard)
    assert tr[0]["end_key"] == "hive://gold.core/orders"
    assert (tr[0]["type"], tr[0]["reverse_type"]) == (
        "DASHBOARD_WITH_TABLE", "TABLE_OF_DASHBOARD")


def test_straggler_models_golden(spark):
    """TableColumnStats (table_stats.py:11), SchemaModel (schema/schema.py:15),
    Neo4jESLastUpdated (neo4j_es_last_updated.py:11), badge start-key
    validation (badge.py:45-61), watermark '=' validation (watermark.py:38-45)."""
    import pyspark.sql.functions as F
    import pytest

    stats = spark.createDataFrame(
        [("hive", "gold", "scm", "tbl", "col1", "avg", "42.5", "100", "200")],
        "db string, cluster string, schema string, table_name string, "
        "col_name string, stat_name string, stat_val string, "
        "start_epoch string, end_epoch string",
    )
    assert node_dicts(am.table_column_stats_nodes(stats)) == [{
        "KEY": "hive://gold.scm/tbl/col1/avg/", "LABEL": "Stat",
        "stat_val": "42.5", "stat_name": "avg",
        "start_epoch": "100", "end_epoch": "200",
    }]
    assert rel_dicts(am.table_column_stats_relations(stats)) == [{
        "START_KEY": "hive://gold.scm/tbl/col1/avg/", "START_LABEL": "Stat",
        "END_KEY": "hive://gold.scm/tbl/col1", "END_LABEL": "Column",
        "TYPE": "STAT_OF", "REVERSE_TYPE": "STAT",
    }]

    schemas = spark.createDataFrame(
        [("hive://gold.scm", "scm", "the schema", None),
         ("hive://gold.other", "other", "prog", "quality")],
        "schema_key string, schema string, description string, description_source string",
    )
    n = {(r["key"], r["label"]): r["attributes"] for r in am.schema_nodes(schemas).collect()}
    assert n[("hive://gold.scm", "Schema")]["name"] == "scm"
    assert n[("hive://gold.scm/_description", "Description")]["description"] == "the schema"
    assert ("hive://gold.other/_quality_description", "Description") in n
    r = {(x["start_key"], x["end_key"]) for x in am.schema_relations(schemas).collect()}
    assert ("hive://gold.scm", "hive://gold.scm/_description") in r

    es = am.neo4j_es_last_updated_nodes(spark, 1234).collect()[0]
    assert es["key"] == "amundsen_updated_timestamp"
    assert es["label"] == "Updatedtimestamp"
    assert es["attributes"]["latest_timestmap"] == "1234"
    assert es["attr_types"]["latest_timestmap"] == "int"

    # badge: unsupported label raises; non-matching start keys filtered
    badges = spark.createDataFrame(
        [("beta", "status", "hive", "gold", "scm", "tbl")],
        "name string, category string, database string, cluster string, "
        "schema string, table_name string",
    )
    with pytest.raises(ValueError, match="not a valid start_label"):
        am.badge_relations(badges, start_label="User")
    # a table key does NOT satisfy the Column pattern -> filtered out
    assert am.badge_relations(badges, start_label="Column").count() == 0
    assert am.badge_relations(badges, start_label="Table").count() == 1
    with_col = badges.withColumn("column_name", F.lit("c1"))
    out = am.badge_relations(with_col, start_label="Column").collect()
    assert out[0]["start_key"] == "hive://gold.scm/tbl/c1"

    # watermark: rows without '=' in part_name are dropped (ref raises)
    wm = spark.createDataFrame(
        [("2024", "hive", "scm", "tbl", "ds=2024-01-01", "high_watermark", "gold"),
         ("2024", "hive", "scm", "tbl", "not_partitioned", "high_watermark", "gold")],
        "create_time string, database string, schema string, table_name string, "
        "part_name string, part_type string, cluster string",
    )
    nodes = am.watermark_nodes(wm).collect()
    assert len(nodes) == 1
    assert nodes[0]["attributes"]["partition_key"] == "ds"
    assert nodes[0]["attributes"]["partition_value"] == "2024-01-01"
    assert am.watermark_relations(wm).count() == 1


def test_user_manager_relation_wire_format(spark):
    """Reference tests/unit/models/test_user.py:59-75: the employee->manager
    relation is User-[MANAGE_BY]->User with reverse MANAGE (user.py:33-34),
    emitted only when manager_email is non-empty."""
    users = spark.createDataFrame(
        [("test@email.com", "test_first", "test_last", "test_first test_last",
          "github_test", "test_team", "FTE", "test_manager@email.com", "slack", "swe"),
         ("nomgr@email.com", "a", "b", "a b", "g", "t", "FTE", "", "s", "swe")],
        "email string, first_name string, last_name string, full_name string, "
        "github_username string, team_name string, employee_type string, "
        "manager_email string, slack_id string, role_name string",
    )
    rels = rel_dicts(am.user_relations(users))
    assert rels == [{
        "START_KEY": "test@email.com", "START_LABEL": "User",
        "END_KEY": "test_manager@email.com", "END_LABEL": "User",
        "TYPE": "MANAGE_BY", "REVERSE_TYPE": "MANAGE",
    }]
