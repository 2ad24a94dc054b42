"""Tableau dashboard extractor chains — the Metadata-API (GraphQL) family
as DataFrame transforms over an injected ``execute_graphql``.

Chain sources (GraphQL queries, field mappings, sanitization rules
transcribed verbatim from the reference):
* metadata — ``tableau_dashboard_extractor.py:35-52,79-89`` (workbooks
  query; project-exclusion filter; group = projectName; URLs
  ``{base}/#/projects/{projectVizportalUrlId}`` and
  ``{base}/#/workbooks/{vizportalUrlId}/views``; ISO createdAt → epoch)
* queries — ``tableau_dashboard_query_extractor.py:33-48,72-82``
  (customSQLTables × downstreamWorkbooks fan-out)
* last modified — ``tableau_dashboard_last_modified_extractor.py:34-48,
  70-77`` (updatedAt → epoch)
* dashboard↔table — ``tableau_dashboard_table_extractor.py:36-86,110-123``
  (upstreamTables; the schema-inside-table-name fix :59-67; external
  tables routed through connectionType/database-name :70-76)
* external tables — ``tableau_external_table_extractor.py:32-56,99-110``
  (sheet-like connection types get one table per subsheet with the parent
  sheet as schema)
* sanitizers — ``tableau_dashboard_utils.py:23-65`` (schema: delete
  ``[]()-&?``, dots and spaces → underscores; database: delete hyphens;
  table/workbook: delete slashes and single quotes)

``execute_graphql(query: str, variables: dict) -> data dict`` is injected:
in production one authenticated POST to ``{api_base_url}/api/metadata/
graphql`` (``tableau_dashboard_utils.py:90-109``, auth :137-197); in this
sandbox a deterministic fake. The reference itself makes exactly one
driver-side POST per extractor, so the fetch stays on the driver
(bounded metadata traffic); every parse, filter, sanitize and fan-out
below is columnar ``from_json`` + higher-order functions on executors.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from amundsendatabuilder_spark.operators.transformers import timestamp_to_epoch

PRODUCT = "tableau"

WORKBOOKS_QUERY = """query {
    workbooks {
        id
        name
        createdAt
        description
        projectName
        projectVizportalUrlId
        vizportalUrlId
    }
}"""

CUSTOM_SQL_QUERY = """query {
  customSQLTables {
    id
    name
    query
    downstreamWorkbooks {
      name
      projectName
    }
  }
}"""

LAST_MODIFIED_QUERY = """query {
    workbooks {
        id
        name
        projectName
        updatedAt
    }
}"""

UPSTREAM_TABLES_QUERY = """query {
  workbooks {
    name
    projectName
    upstreamTables {
      name
      schema
      database {
        name
        connectionType
      }
    }
  }
}"""

EXTERNAL_TABLES_QUERY = """query externalTables($externalTableTypes: [String]) {
  databases (filter: {connectionTypeWithin: $externalTableTypes}) {
    name
    connectionType
    description
    tables {
        name
    }
  }
}"""

# connection types whose "subsheets" become tables
# (tableau_external_table_extractor.py:36)
SHEET_CONNECTION_TYPES = ["google-sheets", "salesforce", "excel-direct"]


def sanitize_schema_name(c: Column) -> Column:
    """tableau_dashboard_utils.py:23-34: delete ``[]()-&?``, then dots and
    spaces → underscores."""
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, r"[\[\]\(\)\-&\?]", ""),
                         r"\.", "_"),
        r" ", "_")


def sanitize_database_name(c: Column) -> Column:
    """:36-43 — delete hyphens."""
    return F.regexp_replace(c, r"-", "")


def sanitize_table_name(c: Column) -> Column:
    """:45-54 — delete forward slashes and single quotes."""
    return F.regexp_replace(c, r"[/']", "")


sanitize_workbook_name = sanitize_table_name  # :56-65 — same rule


def _graphql_rows(spark: SparkSession,
                  execute_graphql: Callable[[str, dict], Any],
                  query: str, variables: dict, root: str,
                  schema: str) -> DataFrame:
    """One GraphQL call → one exploded row per ``root`` entity, parsed
    columnar with ``from_json``."""
    data = execute_graphql(query, variables)
    payload = json.dumps(data.get(root, []))
    df = spark.createDataFrame([(payload,)], "j string")
    return df.select(
        F.explode(F.from_json("j", f"array<{schema}>")).alias("e")
    ).select("e.*")


def _not_excluded(excluded_projects: list[str] | None) -> Column:
    if not excluded_projects:
        return F.lit(True)
    return ~F.col("projectName").isin(excluded_projects)


def tableau_dashboard_metadata(
    spark: SparkSession, execute_graphql: Callable[[str, dict], Any],
    tableau_base_url: str, cluster: str,
    excluded_projects: list[str] | None = None,
) -> DataFrame:
    """→ the ``dashboard_metadata_nodes`` input contract; workbook =
    dashboard, top-level project = group (dashboard_id is the sanitized
    workbook name, as every Tableau extractor keys it)."""
    wb = _graphql_rows(
        spark, execute_graphql, WORKBOOKS_QUERY, {}, "workbooks",
        "struct<id:string,name:string,createdAt:string,description:string,"
        "projectName:string,projectVizportalUrlId:string,"
        "vizportalUrlId:string>",
    ).where(_not_excluded(excluded_projects))
    out = wb.select(
        F.lit(PRODUCT).alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("projectName").alias("group_id"),
        F.col("projectName").alias("group_name"),
        F.format_string("%s/#/projects/%s", F.lit(tableau_base_url),
                        F.col("projectVizportalUrlId")).alias("group_url"),
        F.lit(None).cast("string").alias("group_description"),
        sanitize_workbook_name(F.col("name")).alias("dashboard_id"),
        sanitize_workbook_name(F.col("name")).alias("dashboard_name"),
        F.col("description"),
        F.col("createdAt").alias("created_timestamp"),
        F.format_string("%s/#/workbooks/%s/views", F.lit(tableau_base_url),
                        F.col("vizportalUrlId")).alias("dashboard_url"),
        F.lit(None).cast("array<string>").alias("tags"),
    )
    return timestamp_to_epoch("created_timestamp")(out)


def tableau_dashboard_queries(
    spark: SparkSession, execute_graphql: Callable[[str, dict], Any],
    cluster: str, excluded_projects: list[str] | None = None,
) -> DataFrame:
    """→ ``dashboard_query_nodes`` contract: one row per (custom SQL table,
    downstream workbook); Tableau queries carry no url (the reference's
    DashboardQuery default)."""
    q = _graphql_rows(
        spark, execute_graphql, CUSTOM_SQL_QUERY, {}, "customSQLTables",
        "struct<id:string,name:string,query:string,"
        "downstreamWorkbooks:array<struct<name:string,projectName:string>>>",
    )
    return (
        q.select("id", "name", "query",
                 F.explode("downstreamWorkbooks").alias("wb"))
        .withColumn("projectName", F.col("wb.projectName"))
        .where(_not_excluded(excluded_projects))
        .select(
            F.lit(PRODUCT).alias("product"),
            F.lit(cluster).alias("cluster"),
            F.col("projectName").alias("group_id"),
            sanitize_workbook_name(F.col("wb.name")).alias("dashboard_id"),
            F.col("id").alias("query_id"),
            F.col("name").alias("query_name"),
            F.lit("").alias("url"),
            F.col("query").alias("query_text"),
        )
    )


def tableau_dashboard_last_modified(
    spark: SparkSession, execute_graphql: Callable[[str, dict], Any],
    cluster: str, excluded_projects: list[str] | None = None,
) -> DataFrame:
    """→ ``dashboard_last_modified_nodes`` contract (updatedAt → epoch)."""
    wb = _graphql_rows(
        spark, execute_graphql, LAST_MODIFIED_QUERY, {}, "workbooks",
        "struct<id:string,name:string,projectName:string,updatedAt:string>",
    ).where(_not_excluded(excluded_projects))
    out = wb.select(
        F.lit(PRODUCT).alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("projectName").alias("group_id"),
        sanitize_workbook_name(F.col("name")).alias("dashboard_id"),
        F.col("updatedAt").alias("last_modified_timestamp"),
    )
    return timestamp_to_epoch("last_modified_timestamp")(out)


def tableau_dashboard_tables(
    spark: SparkSession, execute_graphql: Callable[[str, dict], Any],
    cluster: str, database: str, external_cluster_name: str,
    excluded_projects: list[str] | None = None,
) -> DataFrame:
    """→ ``dashboard_table_relations`` contract. Internal tables use the
    configured database/cluster with the reference's schema fix (Tableau
    sometimes hides ``real_schema.real_table`` inside the table name and
    mis-sets the schema key — the inner schema wins,
    ``tableau_dashboard_table_extractor.py:59-67``); schema-less tables are
    external and keyed by connection type + database name (:70-76)."""
    wb = _graphql_rows(
        spark, execute_graphql, UPSTREAM_TABLES_QUERY, {}, "workbooks",
        "struct<name:string,projectName:string,upstreamTables:array<struct<"
        "name:string,schema:string,"
        "database:struct<name:string,connectionType:string>>>>",
    ).where(_not_excluded(excluded_projects))
    t = (
        wb.select("name", "projectName",
                  F.explode("upstreamTables").alias("t"))
        .select(F.col("name").alias("wb_name"), "projectName",
                F.col("t.name").alias("t_name"),
                F.col("t.schema").alias("t_schema"),
                F.col("t.database.name").alias("db_name"),
                F.col("t.database.connectionType").alias("conn_type"))
    )
    internal = F.col("t_schema") != ""
    inner = F.split("t_name", r"\.", 2)
    schema_col = F.when(
        internal,
        sanitize_schema_name(
            F.when(F.col("t_name").contains("."), inner[0])
            .otherwise(F.col("t_schema"))),
    ).otherwise(sanitize_schema_name(F.col("db_name")))
    name_col = sanitize_table_name(
        F.when(internal & F.col("t_name").contains("."), inner[1])
        .otherwise(F.col("t_name")))
    db_col = F.when(internal, F.lit(database)).otherwise(
        sanitize_database_name(F.col("conn_type")))
    cluster_col = F.when(internal, F.lit(cluster)).otherwise(
        F.lit(external_cluster_name))
    return (
        t.select(
            F.lit(PRODUCT).alias("product"),
            F.lit(cluster).alias("cluster"),
            F.col("projectName").alias("group_id"),
            sanitize_workbook_name(F.col("wb_name")).alias("dashboard_id"),
            F.format_string("%s://%s.%s/%s", db_col, cluster_col,
                            schema_col, name_col).alias("table_id"),
        )
        .dropDuplicates(["dashboard_id", "table_id"])
    )


def tableau_external_tables(
    spark: SparkSession, execute_graphql: Callable[[str, dict], Any],
    external_cluster_name: str, external_schema_name: str,
    external_table_types: list[str],
) -> DataFrame:
    """→ the ``table_metadata_nodes`` input contract (database, cluster,
    schema, name, description): sheet-like sources (google-sheets /
    salesforce / excel-direct) become one table per subsheet with the
    parent sheet as schema; other external types one table with the
    configured schema (``tableau_external_table_extractor.py:32-56``)."""
    db = _graphql_rows(
        spark, execute_graphql, EXTERNAL_TABLES_QUERY,
        {"externalTableTypes": external_table_types}, "databases",
        "struct<name:string,connectionType:string,description:string,"
        "tables:array<struct<name:string>>>",
    )
    sheet = F.col("connectionType").isin(SHEET_CONNECTION_TYPES)
    per_sheet = (
        db.where(sheet)
        .select("name", "connectionType", "description",
                F.explode("tables").alias("t"))
        .select(
            F.lit(external_cluster_name).alias("cluster"),
            sanitize_database_name(F.col("connectionType")).alias("database"),
            sanitize_schema_name(F.col("name")).alias("schema"),
            sanitize_table_name(F.col("t.name")).alias("name"),
            F.col("description"),
        )
    )
    flat = db.where(~sheet).select(
        F.lit(external_cluster_name).alias("cluster"),
        sanitize_database_name(F.col("connectionType")).alias("database"),
        F.lit(external_schema_name).alias("schema"),
        sanitize_table_name(F.col("name")).alias("name"),
        F.col("description"),
    )
    return per_sheet.unionByName(flat)
