"""Spark-catalog metadata scan — DeltaLakeMetadataExtractor, Spark-first.

The reference walks ``spark.catalog.listDatabases/listTables`` and scrapes
each table with ``DESCRIBE DETAIL`` / ``DESCRIBE EXTENDED`` on a thread pool
(``databuilder/extractor/delta_lake_metadata_extractor.py:118,200-276``),
then builds ``TableMetadata`` + ``TableLastUpdated``
(:314-345). Here the same catalog walk lands rows directly in the
standard per-column contract (``sources/jdbc.py`` STANDARD_COLUMNS), so the
downstream path is shared with the 11 JDBC dialects:
``regroup_to_table_metadata`` → ``table_metadata_nodes/relations``.

Catalog calls are inherently driver-side API traffic (like the reference);
the result is metadata-sized (one row per column). The DESCRIBE calls fan
out on a thread pool exactly as the reference does (:215-218) — they are
IO-bound round trips to the metastore, not data movement. Partition columns
are tagged ``is_partition`` (reference PARTITION_COLUMN_TAG, :137,306-311);
DESCRIBE's section-marker parsing mirrors :286-312 (blank / ``#``-prefixed
rows toggle the partition-info section; a partition row may carry the column
name in either field, :307-311).

Delta specifics degrade gracefully without the delta jar: ``DESCRIBE
DETAIL`` (:251-258) is attempted first for table-level detail (format,
description, lastModified); non-delta/absent-jar tables fall back to the
``DESCRIBE EXTENDED`` detail section the reference uses for views
(:259-276)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from amundsendatabuilder_spark.sources.jdbc import STANDARD_COLUMNS

SCAN_SCHEMA = (
    "database string, cluster string, schema string, name string, "
    "description string, col_name string, col_description string, "
    "col_type string, col_sort_order int, is_view boolean, "
    "is_partition boolean, last_updated_epoch long"
)


def _parse_describe(rows: list[Any]) -> tuple[list[dict], dict]:
    """DESCRIBE EXTENDED output → (ordered columns with is_partition, detail
    dict). Reference parse: :286-312 (columns + partition section) and
    :259-276 (``# Detailed Table Information`` section)."""
    cols: dict[str, dict] = {}
    detail: dict[str, str] = {}
    in_partition = False
    in_detail = False
    sort_order = 0
    for r in rows:
        col_name, data_type = r["col_name"], r["data_type"]
        if "# Detailed Table" in col_name:
            in_detail = True
            continue
        if in_detail:
            if col_name:
                detail[col_name] = data_type
            continue
        if col_name == "" or "#" in col_name:
            in_partition = True
            continue
        if not in_partition:
            cols[col_name] = {
                "name": col_name,
                "description": r["comment"] if r["comment"] else None,
                "col_type": data_type,
                "sort_order": sort_order,
                "is_partition": False,
            }
            sort_order += 1
        else:
            # partition rows may carry the column name in either field (:307-311)
            for cand in (data_type, col_name):
                if cand in cols:
                    cols[cand]["is_partition"] = True
                    break
    return list(cols.values()), detail


def _scrape_table(spark: SparkSession, schema: str, table: str,
                  is_view: bool) -> dict | None:
    """One table's DESCRIBE round trips → dict; None on scrape failure
    (reference logs and skips, :226-250). DESCRIBE EXTENDED runs first; the
    delta-only DESCRIBE DETAIL enrichment (:251-258 — lastModified lives only
    there) is attempted only when the provider says delta, so non-delta
    catalogs never issue a failing statement."""
    full = f"`{schema}`.`{table}`"
    try:
        rows = spark.sql(f"DESCRIBE EXTENDED {full}").collect()
    except Exception:
        return None
    cols, ext_detail = _parse_describe(rows)
    if not cols:
        return None
    detail = {
        "format": (ext_detail.get("Provider") or "").lower() or None,
        "description": ext_detail.get("Comment"),
        "last_updated_epoch": None,
    }
    if not is_view and detail["format"] == "delta":
        try:
            d = spark.sql(f"DESCRIBE DETAIL {full}").collect()[0].asDict()
            lm = d.get("lastModified")
            detail = {
                "format": d.get("format") or detail["format"],
                "description": d.get("description") or detail["description"],
                "last_updated_epoch": int(lm.timestamp()) if lm else None,
            }
        except Exception:
            pass
    return {"schema": schema, "table": table, "is_view": is_view,
            "columns": cols, "location": ext_detail.get("Location"), **detail}


def catalog_scrape(
    spark: SparkSession,
    schema_list: list[str] | None = None,
    exclude_list: list[str] | None = None,
    max_workers: int = 16,
) -> list[dict]:
    """One thread-pooled DESCRIBE walk over the session catalog → the raw
    per-table dicts (columns, detail, location). Shared by the metadata
    scan and the fs-probe location feed so the CLI composition walks
    the catalog once."""
    schemas = [d.name for d in spark.catalog.listDatabases()]
    if schema_list:
        schemas = [s for s in schemas if s in set(schema_list)]
    if exclude_list:
        schemas = [s for s in schemas if s not in set(exclude_list)]

    targets = []
    for s in sorted(schemas):
        for t in spark.catalog.listTables(s):
            if t.isTemporary:
                continue
            targets.append((s, t.name, (t.tableType or "").lower() == "view"))

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        scraped = list(ex.map(lambda a: _scrape_table(spark, *a), targets))
    return [m for m in scraped if m is not None]


def scan_rows_from_scrape(
    spark: SparkSession,
    scraped: list[dict],
    database: str = "delta",
    cluster: str = "gold",
    delta_tables_only: bool = False,
) -> DataFrame:
    """Scraped dicts → standard per-column contract rows."""
    out_rows = []
    for m in scraped:
        if delta_tables_only and (m.get("format") or "") != "delta" and not m["is_view"]:
            continue
        for c in m["columns"]:
            out_rows.append((
                database, cluster, m["schema"], m["table"], m.get("description"),
                c["name"], c["description"], c["col_type"], c["sort_order"],
                m["is_view"], c["is_partition"], m.get("last_updated_epoch"),
            ))
    return spark.createDataFrame(out_rows, SCAN_SCHEMA)


def catalog_metadata_scan(
    spark: SparkSession,
    database: str = "delta",
    cluster: str = "gold",
    schema_list: list[str] | None = None,
    exclude_list: list[str] | None = None,
    delta_tables_only: bool = False,
    max_workers: int = 16,
) -> DataFrame:
    """Walk the session catalog → standard per-column contract rows (plus
    ``is_partition`` and ``last_updated_epoch``). ``schema_list`` /
    ``exclude_list`` / ``delta_tables_only`` mirror the reference config keys
    (:124-137; the reference defaults delta-only ON, which requires the delta
    jar — default OFF here so the scan is useful on any catalog)."""
    scraped = catalog_scrape(spark, schema_list, exclude_list, max_workers)
    return scan_rows_from_scrape(spark, scraped, database, cluster,
                                 delta_tables_only)


def catalog_locations(spark: SparkSession, scraped: list[dict]) -> DataFrame:
    """Scraped dicts → ``(schema, table_name, location)`` rows for the
    distributed fs probe (``sources/fs_probe.table_last_updated_fs``) —
    the reference's filesystem fallback for tables whose catalog detail
    carries no lastModified (``hive_table_last_updated_extractor.py``).
    ``file:`` URIs are stripped to paths; non-file URIs pass through for
    a Hadoop-FS-aware probe."""
    from urllib.parse import urlparse

    def _to_path(loc: str) -> str:
        # Spark emits single-slash 'file:/p' URIs (and 'file:///p' appears
        # in configs) — a fixed-width strip mangles one of the two forms,
        # so parse the scheme properly
        if loc.startswith("file:"):
            return urlparse(loc).path
        return loc

    rows = [
        (m["schema"], m["table"], _to_path(m["location"]))
        for m in scraped
        if m.get("location") and not m["is_view"]
    ]
    return spark.createDataFrame(
        rows, "schema string, table_name string, location string")


def catalog_table_rows(scan: DataFrame) -> DataFrame:
    """Scan rows → the regrouped TableMetadata contract (drop the two extra
    columns; ``regroup_to_table_metadata`` handles the rest)."""
    return scan.select(*STANDARD_COLUMNS)


def catalog_last_updated(scan: DataFrame) -> DataFrame:
    """Scan rows → (cluster, schema, table_name, last_updated_time) for
    tables whose detail carried lastModified (reference
    ``create_table_last_updated``, :334-345)."""
    return (
        scan.where(scan.last_updated_epoch.isNotNull())
        .select("cluster", "schema", scan.name.alias("table_name"),
                scan.last_updated_epoch.alias("last_updated_time"))
        .dropDuplicates(["cluster", "schema", "table_name"])
    )
