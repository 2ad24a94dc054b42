"""Client-injected API metadata scans — Glue / BigQuery / Cassandra / BambooHR.

These reference extractors wrap cloud-service clients with no sandbox
backend; like ``sources/rest_api.py``, the client call is INJECTED (a plain
callable) so the paging/regroup/flatten logic — the part that is actually the
extractor — is real and unit-testable, and production swaps in boto3 /
google-api-client / cassandra-driver / requests without touching this code.

All table scans land in the shared per-column contract
(``sources/jdbc.py`` STANDARD_COLUMNS) → ``regroup_to_table_metadata`` →
``table_metadata_nodes/relations``; the user scan lands in the
``user_nodes/user_relations`` input contract. API paging is driver-side
metadata traffic, exactly as in the reference — the DATA-scale paths of
these services (audit logs, usage) stream through the usage channel instead.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from amundsendatabuilder_spark.sources.spark_catalog import SCAN_SCHEMA

USER_SCHEMA = ("email string, first_name string, last_name string, "
               "full_name string, github_username string, team_name string, "
               "employee_type string, manager_email string, slack_id string, "
               "role_name string")


def _contract_rows(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return spark.createDataFrame(rows, SCAN_SCHEMA)


# ---- Glue (glue_extractor.py:42-90) ----------------------------------------

def glue_metadata_scan(
    spark: SparkSession,
    search_tables: Callable[..., dict],
    cluster: str = "gold",
    filters: Any | None = None,
) -> DataFrame:
    """``search_tables(**kwargs) -> {'TableList': [...], 'NextToken'?}`` —
    the boto3 glue client surface. Paging loop is the reference's exact
    NextToken walk (:78-90); per table, columns = StorageDescriptor.Columns +
    PartitionKeys with a running sort order (:49-57), description falls back
    to Parameters.comment (:63), view = TableType VIRTUAL_VIEW (:66)."""
    tables: list[dict] = []
    kwargs: dict = {}
    if filters is not None:
        kwargs["Filters"] = filters
    data = search_tables(**kwargs)
    tables += data["TableList"]
    while "NextToken" in data:
        kwargs["NextToken"] = data["NextToken"]
        data = search_tables(**kwargs)
        tables += data["TableList"]

    out = []
    for row in tables:
        desc = row.get("Description") or row.get("Parameters", {}).get("comment")
        is_view = row.get("TableType") == "VIRTUAL_VIEW"
        cols = row["StorageDescriptor"]["Columns"] + row.get("PartitionKeys", [])
        n_data = len(row["StorageDescriptor"]["Columns"])
        for i, c in enumerate(cols):
            out.append((
                "glue", cluster, row["DatabaseName"], row["Name"], desc,
                c["Name"], c.get("Comment"), c["Type"], i, is_view,
                i >= n_data, None,
            ))
    return _contract_rows(spark, out)


# ---- BigQuery (bigquery_metadata_extractor.py:33-121) ----------------------

_SHARD_RE = re.compile(r"\d{8}$")


def _flatten_bq_cols(parent: str, column: dict, cols: list, total: int) -> int:
    """The reference's exact nested-RECORD flatten (:88-120): dotted names,
    RECORD parents emitted before their fields, the running counter IS the
    sort order (starting at 1 — reference quirk, :74)."""
    name = f"{parent}.{column['name']}" if parent else column["name"]
    cols.append((name, column.get("description", ""), column["type"], total))
    if column["type"] == "RECORD":
        total += 1
        for f in column.get("fields", []):
            total = _flatten_bq_cols(name, f, cols, total)
        return total
    return total + 1


def bigquery_metadata_scan(
    spark: SparkSession,
    list_dataset_pages: Callable[[], Iterator[dict]],
    list_table_pages: Callable[[dict], Iterator[dict]],
    get_table: Callable[[dict], dict],
    cluster: str | None = None,
) -> DataFrame:
    """Injected google-api surfaces: dataset pages (``{'datasets': [...]}``)
    → table pages per dataset (``{'tables': [...]}``) → per-table detail.
    Sharded date-range tables (8 trailing digits) collapse to their prefix,
    first shard wins (:45-58); nested schemas flatten with dotted names."""
    out = []
    for dpage in list_dataset_pages():
        for ds in dpage.get("datasets", []):
            grouped: set[str] = set()
            for tpage in list_table_pages(ds["datasetReference"]):
                for t in tpage.get("tables", []):
                    ref = t["tableReference"]
                    table_id = ref["tableId"]
                    if _SHARD_RE.search(table_id):
                        prefix = table_id[:-8]
                        if prefix in grouped:
                            continue
                        grouped.add(prefix)
                        out_id = prefix
                    else:
                        out_id = table_id
                    detail = get_table(ref)
                    cols: list = []
                    total = 0
                    for c in detail.get("schema", {}).get("fields", []):
                        total = _flatten_bq_cols("", c, cols, total + 1)
                    proj = cluster or ref["projectId"]
                    for (cn, cd, ct, so) in cols:
                        out.append((
                            "bigquery", proj, ref["datasetId"], out_id,
                            detail.get("description", ""), cn, cd, ct, so,
                            detail.get("type") == "VIEW", False, None,
                        ))
    return _contract_rows(spark, out)


# ---- Cassandra (cassandra_extractor.py:63-103) -----------------------------

def cassandra_metadata_scan(
    spark: SparkSession,
    keyspaces: dict[str, dict[str, dict[str, str]]],
    cluster: str = "gold",
    table_filter: Callable[[str, str], bool] | None = None,
) -> DataFrame:
    """``keyspaces``: the driver's ``cluster.metadata.keyspaces`` shape
    flattened to ``{keyspace: {table: {column: cql_type}}}`` (column dicts
    are insertion-ordered, like the driver's). ``system*`` keyspaces are
    skipped (:70-71); ``table_filter(keyspace, table)`` mirrors the
    configurable filter function (:73-74)."""
    out = []
    for ks, tables in keyspaces.items():
        if ks.startswith("system"):
            continue
        for tbl, columns in tables.items():
            if table_filter and not table_filter(ks, tbl):
                continue
            for idx, (cn, cql_type) in enumerate(columns.items()):
                out.append((
                    "cassandra", cluster, ks, tbl, None,
                    cn, None, cql_type, idx, False, False, None,
                ))
    return _contract_rows(spark, out)


# ---- BambooHR users (user/bamboohr/bamboohr_user_extractor.py:38-61) -------

def bamboohr_user_scan(spark: SparkSession, fetch_directory: Callable[[], bytes]) -> DataFrame:
    """``fetch_directory() -> XML bytes`` of the employees/directory payload;
    parse mirrors the reference (field ids workEmail/firstName/lastName/
    displayName/department/jobTitle; missing fields → '' per :47-52). Rows
    feed ``user_nodes`` / ``UserESDocument``."""
    from xml.etree import ElementTree

    root = ElementTree.fromstring(fetch_directory())
    rows = []
    for user in root.findall("./employees/employee"):
        def get_field(name: str) -> str:
            f = user.find(f"./field[@id='{name}']")
            return f.text if f is not None and f.text is not None else ""

        rows.append((
            get_field("workEmail"), get_field("firstName"),
            get_field("lastName"), get_field("displayName"),
            "", get_field("department"), "", "", "", get_field("jobTitle"),
        ))
    return spark.createDataFrame(rows, USER_SCHEMA)
