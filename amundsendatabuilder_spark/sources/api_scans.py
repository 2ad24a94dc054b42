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


# ---- BigQuery watermarks (bigquery_watermark_extractor.py:22-149) ----------

def bigquery_watermark_scan(
    spark: SparkSession,
    list_dataset_pages: Callable[[], Iterator[dict]],
    list_table_pages: Callable[[dict], Iterator[dict]],
    get_partitions: Callable[[dict], list[tuple[str, float]]],
    cluster: str | None = None,
) -> DataFrame:
    """→ the ``watermark_nodes`` input contract (create_time, database,
    schema, table_name, part_name, part_type, cluster).

    Sharded date-range tables (``name_YYYYMMDD``) collapse per prefix with
    low/high = min/max date suffix and ``part_name='__table__=<suffix>'``
    (reference :44-87; create_time comes from the lowest shard's
    creationTime — the reference keeps whichever shard the API listed
    first, which is the lexicographic minimum on BigQuery). Time-partitioned
    tables get low/high from the injected partition summary
    (``get_partitions(tableRef) -> [(partition_id, epoch_created)]``, the
    reference's legacy-SQL ``$__PARTITIONS_SUMMARY__`` query :89-115) with
    ``part_name='<field>=<partition_id>'``, field defaulting to
    ``_PARTITIONTIME`` (:122-125). Timestamps format as UTC
    ``%Y-%m-%d %H:%M:%S`` (the reference uses the host zone)."""
    from datetime import datetime, timezone

    def fmt(epoch_sec: float) -> str:
        return datetime.fromtimestamp(
            float(epoch_sec), tz=timezone.utc).strftime("%Y-%m-%d %H:%M:%S")

    rows = []
    for dpage in list_dataset_pages():
        for ds in dpage.get("datasets", []):
            shards: dict[tuple[str, str, str], dict] = {}
            for tpage in list_table_pages(ds["datasetReference"]):
                for t in tpage.get("tables", []):
                    ref = t["tableReference"]
                    table_id = ref["tableId"]
                    proj = cluster or ref["projectId"]
                    if _SHARD_RE.search(table_id):
                        suffix, prefix = table_id[-8:], table_id[:-8]
                        g = shards.setdefault(
                            (ref["datasetId"], prefix, proj),
                            {"low": suffix, "high": suffix, "table": t})
                        if suffix < g["low"]:
                            g["low"], g["table"] = suffix, t
                        g["high"] = max(g["high"], suffix)
                    elif "timePartitioning" in t:
                        parts = get_partitions(ref)
                        if not parts:
                            continue
                        field = t["timePartitioning"].get(
                            "field", "_PARTITIONTIME")
                        low = min(parts, key=lambda p: p[0])
                        high = max(parts, key=lambda p: p[0])
                        for (pid, created), part_type in (
                                (low, "low_watermark"), (high, "high_watermark")):
                            rows.append((
                                fmt(created), "bigquery", ref["datasetId"],
                                table_id, f"{field}={pid}", part_type, proj,
                            ))
            for (dataset_id, prefix, proj), g in shards.items():
                created = fmt(float(g["table"]["creationTime"]) / 1000)
                for suffix, part_type in ((g["low"], "low_watermark"),
                                          (g["high"], "high_watermark")):
                    rows.append((
                        created, "bigquery", dataset_id, prefix,
                        f"__table__={suffix}", part_type, proj,
                    ))
    return spark.createDataFrame(
        rows,
        "create_time string, database string, schema string, "
        "table_name string, part_name string, part_type string, "
        "cluster string",
    )


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


# ---- Feast feature tables (feast_extractor.py:16-139) ----------------------

def feast_metadata_scan(
    spark: SparkSession,
    list_projects: Callable[[], list[str]],
    list_feature_tables: Callable[[str], list[dict]],
    get_entity: Callable[[str, str], dict],
    instance_name: str = "main",
) -> DataFrame:
    """Feast Core registry → per-column contract rows: database='feast',
    cluster=instance name, schema=project, table=feature table; columns are
    the entity keys (with description/value_type from ``get_entity``)
    followed by the features, sort order continuing across the two groups
    (reference ``feast_extractor.py:71-100``). Feature-table dicts carry
    ``name``, ``entities`` (names), ``features`` (``{name, dtype}``)."""
    out = []
    for project in list_projects():
        for ft in list_feature_tables(project):
            n_entities = len(ft.get("entities", []))
            for i, entity_name in enumerate(ft.get("entities", [])):
                ent = get_entity(entity_name, project)
                out.append((
                    "feast", instance_name, project, ft["name"], None,
                    ent["name"], ent.get("description"), ent.get("value_type"),
                    i, False, False, None,
                ))
            for i, feat in enumerate(ft.get("features", [])):
                out.append((
                    "feast", instance_name, project, ft["name"], None,
                    feat["name"], None, feat.get("dtype"),
                    n_entities + i, False, False, None,
                ))
    return _contract_rows(spark, out)


def feast_table_descriptions(
    spark: SparkSession,
    list_projects: Callable[[], list[str]],
    list_feature_tables: Callable[[str], list[dict]],
    instance_name: str = "main",
) -> DataFrame:
    """The reference's describe_feature_tables=True side channel
    (``feast_extractor.py:102-139``): one programmatic description per
    feature table (created-at + labels markdown, source
    ``feature_table_details``), plus yaml-fenced ``batch_source`` and,
    when present, ``stream_source`` specs. Feature-table dicts add
    ``created_timestamp_seconds``, ``labels``, ``batch_source``,
    ``stream_source``."""
    from datetime import datetime, timezone

    import yaml

    rows = []
    for project in list_projects():
        for ft in list_feature_tables(project):
            created_at = datetime.fromtimestamp(
                ft["created_timestamp_seconds"], tz=timezone.utc
            ).replace(tzinfo=None)
            desc = f"* Created at **{created_at}**\n"
            if ft.get("labels"):
                desc += "* Labels:\n"
                for k, v in ft["labels"].items():
                    desc += f"    * {k}: **{v}**\n"
            rows.append(("feast", instance_name, project, ft["name"],
                         desc, "feature_table_details"))
            rows.append((
                "feast", instance_name, project, ft["name"],
                f"```\n{yaml.dump(ft['batch_source'])}```", "batch_source"))
            if ft.get("stream_source"):
                rows.append((
                    "feast", instance_name, project, ft["name"],
                    f"```\n{yaml.dump(ft['stream_source'])}```",
                    "stream_source"))
    return spark.createDataFrame(
        rows,
        "database string, cluster string, schema string, name string, "
        "description string, description_source string",
    )


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
