"""JDBC / warehouse-metastore source family — the reference's most-used path.

Spark-first re-expression of ``SQLAlchemyExtractor``
(``databuilder/extractor/sql_alchemy_extractor.py:13``) and ``DBAPIExtractor``
(``databuilder/extractor/db_api_extractor.py:15``): an arbitrary SQL scan over
any JDBC database becomes ``spark.read.format("jdbc").option("query", sql)`` —
the WHOLE dialect SQL is pushed down to the source (the reference's
"predicate pushdown via where_clause_suffix templating" is free here), and
large scans parallelize with ``partitionColumn/lowerBound/upperBound/
numPartitions`` instead of the reference's single cursor.

The 11 dialect metadata extractors (Hive/Postgres/Snowflake/Athena/MSSQL/
MySQL/Db2/Vertica/Dremio/Druid/Redshift — ``databuilder/extractor/
*_metadata_extractor.py``) all share one contract: a dialect-specific SQL
that emits one row PER COLUMN with the fields below, followed by a
group-adjacent-rows regroup into ``TableMetadata``
(``hive_table_metadata_extractor.py:133-160``). The SQL registry keeps that
contract; the regroup becomes one hash aggregation with ``sort_array(
collect_list(struct(...)))`` — order-insensitive, so no ORDER BY needs to be
pushed to the source (the reference needs it only because itertools.groupby
is adjacency-based).

Standard row contract (every dialect SQL aliases into this):
    database, cluster, schema, name, description, col_name, col_description,
    col_type, col_sort_order, is_view
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STANDARD_COLUMNS = [
    "database", "cluster", "schema", "name", "description",
    "col_name", "col_description", "col_type", "col_sort_order", "is_view",
]


def jdbc_query(
    spark: SparkSession,
    url: str,
    sql: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
    fetchsize: int = 10_000,
    **options: str,
) -> DataFrame:
    """Arbitrary SQL scan over a JDBC source (SQLAlchemyExtractor /
    DBAPIExtractor equivalent). The SQL runs source-side (full pushdown);
    with ``partition_column`` bounds the read fans out across executors —
    the scale replacement for the reference's single-threaded cursor."""
    r = spark.read.format("jdbc").option("url", url)
    if driver:
        r = r.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned read needs lower/upper bounds and numPartitions")
        # Spark requires dbtable (subquery alias) for partitioned reads
        r = (
            r.option("dbtable", f"({sql}) spark_jdbc_src")
            .option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    else:
        r = r.option("query", sql)
    r = r.option("fetchsize", str(fetchsize))
    for k, v in options.items():
        r = r.option(k, v)
    return r.load()


def _info_schema_sql(cluster_expr: str, catalog_col: str = "c.table_catalog",
                     tables: str = "information_schema.tables",
                     columns: str = "information_schema.columns",
                     description_col: str = "NULL",
                     col_description_col: str = "NULL",
                     is_view_expr: str = "(t.table_type = 'VIEW')") -> str:
    """information_schema-shaped dialect template: one row per column."""
    return f"""
    SELECT
        {catalog_col} AS database,
        {cluster_expr} AS cluster,
        c.table_schema AS schema,
        c.table_name AS name,
        {description_col} AS description,
        c.column_name AS col_name,
        {col_description_col} AS col_description,
        c.data_type AS col_type,
        c.ordinal_position AS col_sort_order,
        {is_view_expr} AS is_view
    FROM {columns} c
    LEFT JOIN {tables} t
      ON c.table_schema = t.table_schema AND c.table_name = t.table_name
    {{where_clause_suffix}}
    """


# Dialect registry — each entry re-derives the reference extractor's metadata
# SQL into the standard row contract. ``{where_clause_suffix}`` (and, where
# noted, ``{cluster}``/``{database}``/``{schema}``) are format slots, exactly
# the reference's templated-pushdown knobs.
DIALECT_METADATA_SQL: dict[str, str] = {
    # hive metastore relational schema: partition-key columns UNION regular
    # columns (hive_table_metadata_extractor.py:35-60). ORDER BY dropped —
    # the Spark regroup is a hash agg, not adjacency-based.
    "hive": """
    SELECT 'hive' AS database, '{cluster}' AS cluster, d.NAME AS schema,
           t.TBL_NAME AS name, tp.PARAM_VALUE AS description,
           p.PKEY_NAME AS col_name, p.PKEY_COMMENT AS col_description,
           p.PKEY_TYPE AS col_type, p.INTEGER_IDX AS col_sort_order,
           (t.TBL_TYPE = 'VIRTUAL_VIEW') AS is_view
    FROM TBLS t
    JOIN DBS d ON t.DB_ID = d.DB_ID
    JOIN PARTITION_KEYS p ON t.TBL_ID = p.TBL_ID
    LEFT JOIN TABLE_PARAMS tp ON t.TBL_ID = tp.TBL_ID AND tp.PARAM_KEY = 'comment'
    {where_clause_suffix}
    UNION
    SELECT 'hive', '{cluster}', d.NAME, t.TBL_NAME, tp.PARAM_VALUE,
           c.COLUMN_NAME, c.COMMENT, c.TYPE_NAME, c.INTEGER_IDX,
           (t.TBL_TYPE = 'VIRTUAL_VIEW')
    FROM TBLS t
    JOIN DBS d ON t.DB_ID = d.DB_ID
    JOIN SDS s ON t.SD_ID = s.SD_ID
    JOIN COLUMNS_V2 c ON s.CD_ID = c.CD_ID
    LEFT JOIN TABLE_PARAMS tp ON t.TBL_ID = tp.TBL_ID AND tp.PARAM_KEY = 'comment'
    {where_clause_suffix}
    """,
    # postgres: information_schema + pg_catalog descriptions
    # (postgres_metadata_extractor.py:13, base :24)
    "postgres": _info_schema_sql(
        cluster_expr="c.table_catalog",
        description_col="obj_description(pgc.oid)",
        col_description_col="pgd.description",
        columns="information_schema.columns",
    ).replace(
        "LEFT JOIN information_schema.tables t",
        "LEFT JOIN pg_catalog.pg_class pgc ON pgc.relname = c.table_name\n"
        "    LEFT JOIN pg_catalog.pg_description pgd\n"
        "      ON pgd.objoid = pgc.oid AND pgd.objsubid = c.ordinal_position\n"
        "    LEFT JOIN information_schema.tables t",
    ),
    # snowflake: information_schema with comment columns
    # (snowflake_metadata_extractor.py:35-56)
    "snowflake": """
    SELECT lower(c.table_catalog) AS database, lower({cluster_source}) AS cluster,
           lower(c.table_schema) AS schema, lower(c.table_name) AS name,
           t.comment AS description, lower(c.column_name) AS col_name,
           c.comment AS col_description, lower(c.data_type) AS col_type,
           c.ordinal_position AS col_sort_order,
           (lower(t.table_type) = 'view') AS is_view
    FROM {database}.{schema}.COLUMNS c
    LEFT JOIN {database}.{schema}.TABLES t
      ON c.table_name = t.table_name AND c.table_schema = t.table_schema
    {where_clause_suffix}
    """,
    # athena / presto information_schema (athena_metadata_extractor.py:23)
    "athena": _info_schema_sql(
        cluster_expr="'{cluster}'",
        col_description_col="c.comment",
        is_view_expr="false",
    ),
    # mssql: extended properties carry descriptions
    # (mssql_metadata_extractor.py:23)
    "mssql": """
    SELECT DISTINCT 'mssql' AS database, {cluster_source} AS cluster,
           SCH.NAME AS schema, TBL.NAME AS name,
           CAST(PROP.VALUE AS NVARCHAR(MAX)) AS description,
           COL.NAME AS col_name,
           CAST(PROP_COL.VALUE AS NVARCHAR(MAX)) AS col_description,
           TYP.NAME AS col_type, COL.COLUMN_ID AS col_sort_order,
           CAST(0 AS BIT) AS is_view
    FROM SYS.SCHEMAS SCH
    JOIN SYS.TABLES TBL ON SCH.SCHEMA_ID = TBL.SCHEMA_ID
    JOIN SYS.COLUMNS COL ON TBL.OBJECT_ID = COL.OBJECT_ID
    JOIN SYS.TYPES TYP ON COL.USER_TYPE_ID = TYP.USER_TYPE_ID
    LEFT JOIN SYS.EXTENDED_PROPERTIES PROP
      ON TBL.OBJECT_ID = PROP.MAJOR_ID AND PROP.MINOR_ID = 0
    LEFT JOIN SYS.EXTENDED_PROPERTIES PROP_COL
      ON TBL.OBJECT_ID = PROP_COL.MAJOR_ID AND PROP_COL.MINOR_ID = COL.COLUMN_ID
    {where_clause_suffix}
    """,
    # mysql information_schema (mysql_metadata_extractor.py:23)
    "mysql": """
    SELECT lower(c.table_schema) AS database, '{cluster}' AS cluster,
           lower(c.table_schema) AS schema, lower(c.table_name) AS name,
           t.table_comment AS description, lower(c.column_name) AS col_name,
           c.column_comment AS col_description, lower(c.data_type) AS col_type,
           c.ordinal_position AS col_sort_order,
           (t.table_type = 'VIEW') AS is_view
    FROM information_schema.columns c
    LEFT JOIN information_schema.tables t
      ON c.table_name = t.table_name AND c.table_schema = t.table_schema
    {where_clause_suffix}
    """,
    # db2 syscat (db2_metadata_extractor.py:23)
    "db2": """
    SELECT 'db2' AS database, '{cluster}' AS cluster,
           c.TABSCHEMA AS schema, c.TABNAME AS name, t.REMARKS AS description,
           c.COLNAME AS col_name, c.REMARKS AS col_description,
           c.TYPENAME AS col_type, c.COLNO AS col_sort_order,
           (t.TYPE = 'V') AS is_view
    FROM SYSCAT.COLUMNS c
    JOIN SYSCAT.TABLES t ON c.TABSCHEMA = t.TABSCHEMA AND c.TABNAME = t.TABNAME
    {where_clause_suffix}
    """,
    # vertica v_catalog (vertica_metadata_extractor.py:23)
    "vertica": _info_schema_sql(
        cluster_expr="'{cluster}'",
        tables="v_catalog.tables",
        columns="v_catalog.columns",
        is_view_expr="false",
    ),
    # dremio INFORMATION_SCHEMA via ODBC/JDBC (dremio_metadata_extractor.py:23)
    "dremio": _info_schema_sql(
        cluster_expr="'{cluster}'",
        columns='INFORMATION_SCHEMA."COLUMNS"',
        tables='INFORMATION_SCHEMA."TABLES"',
    ),
    # druid segment-metadata flavored INFORMATION_SCHEMA
    # (druid_metadata_extractor.py:24)
    "druid": """
    SELECT 'druid' AS database, '{cluster}' AS cluster,
           TABLE_SCHEMA AS schema, TABLE_NAME AS name,
           NULL AS description, COLUMN_NAME AS col_name,
           NULL AS col_description, DATA_TYPE AS col_type,
           ORDINAL_POSITION AS col_sort_order, false AS is_view
    FROM INFORMATION_SCHEMA.COLUMNS
    {where_clause_suffix}
    """,
    # redshift: late-binding views need pg_get_late_binding_view_cols UNION
    # (redshift_metadata_extractor.py)
    "redshift": """
    SELECT * FROM (
      SELECT 'redshift' AS database, '{cluster}' AS cluster,
             c.table_schema AS schema, c.table_name AS name,
             NULL AS description, c.column_name AS col_name,
             NULL AS col_description, c.data_type AS col_type,
             c.ordinal_position AS col_sort_order, false AS is_view
      FROM information_schema.columns c
      UNION
      SELECT 'redshift', '{cluster}', vc.view_schema, vc.view_name, NULL,
             vc.col_name, NULL, vc.col_type, vc.col_num, true
      FROM pg_get_late_binding_view_cols()
           vc(view_schema name, view_name name, col_name name,
              col_type varchar, col_num int)
    ) u
    {where_clause_suffix}
    """,
}


# Last-updated registry — per-table freshness scans that feed the
# TableLastUpdated model (``table_last_updated_nodes/relations``). Row
# contract: cluster, schema, table_name, last_updated_time (epoch seconds).
DIALECT_LAST_UPDATED_SQL: dict[str, str] = {
    # snowflake INFORMATION_SCHEMA.TABLES.last_altered — covers DML and DDL
    # (snowflake_table_last_updated_extractor.py:27-36; default where-clause
    # ' WHERE t.last_altered IS NOT NULL ', :51)
    "snowflake": """
    SELECT lower({cluster_source}) AS cluster,
           lower(t.table_schema) AS schema,
           lower(t.table_name) AS table_name,
           DATE_PART(EPOCH, t.last_altered) AS last_updated_time
    FROM {database}.INFORMATION_SCHEMA.TABLES t
    {where_clause_suffix}
    """,
    # hive metastore, partitioned tables: newest partition create time
    # (hive_table_last_updated_extractor.py:61-72). Non-partitioned tables
    # take the filesystem-probe path (sources/fs_probe.py) instead.
    "hive": """
    SELECT '{cluster}' AS cluster, d.NAME AS schema, t.TBL_NAME AS table_name,
           MAX(p.CREATE_TIME) AS last_updated_time
    FROM TBLS t
    JOIN DBS d ON t.DB_ID = d.DB_ID
    JOIN PARTITIONS p ON t.TBL_ID = p.TBL_ID
    {where_clause_suffix}
    GROUP BY d.NAME, t.TBL_NAME
    """,
}


def last_updated_scan(
    spark: SparkSession,
    url: str,
    dialect: str,
    where_clause_suffix: str = "",
    cluster: str = "master",
    sql_overrides: dict[str, str] | None = None,
    **jdbc_opts,
) -> DataFrame:
    """Run a dialect's last-updated SQL over JDBC →
    (cluster, schema, table_name, last_updated_time) rows, ready for
    ``table_last_updated_nodes/relations`` (add the db column the model
    expects via ``withColumn('db', lit(dialect))``)."""
    if dialect not in DIALECT_LAST_UPDATED_SQL:
        raise ValueError(
            f"unknown dialect {dialect!r}; have {sorted(DIALECT_LAST_UPDATED_SQL)}")
    if dialect == "snowflake" and not where_clause_suffix:
        where_clause_suffix = "WHERE t.last_altered IS NOT NULL"
    slots = {"where_clause_suffix": where_clause_suffix, "cluster": cluster,
             "cluster_source": f"'{cluster}'", "database": "prod"}
    if sql_overrides:
        slots.update(sql_overrides)
    import string

    sql = DIALECT_LAST_UPDATED_SQL[dialect]
    used = {fname for _, fname, _, _ in string.Formatter().parse(sql) if fname}
    sql = sql.format(**{k: v for k, v in slots.items() if k in used})
    return jdbc_query(spark, url, sql.strip(), **jdbc_opts)


def metadata_scan(
    spark: SparkSession,
    url: str,
    dialect: str,
    where_clause_suffix: str = "",
    cluster: str = "master",
    sql_overrides: dict[str, str] | None = None,
    **jdbc_opts,
) -> DataFrame:
    """Run a dialect's metadata SQL over JDBC and return standard-contract
    rows. ``where_clause_suffix`` is the reference's predicate-pushdown knob
    (``hive_table_metadata_extractor.py:92-95``); here any further filters
    the caller adds in Spark ALSO push down (Catalyst JDBC pushdown)."""
    if dialect not in DIALECT_METADATA_SQL:
        raise ValueError(f"unknown dialect {dialect!r}; have {sorted(DIALECT_METADATA_SQL)}")
    slots = {"where_clause_suffix": where_clause_suffix, "cluster": cluster,
             "cluster_source": f"'{cluster}'", "database": "d", "schema": "s"}
    if sql_overrides:
        slots.update(sql_overrides)
    sql = DIALECT_METADATA_SQL[dialect]
    # only substitute slots the template actually uses
    import string

    used = {fname for _, fname, _, _ in string.Formatter().parse(sql) if fname}
    sql = sql.format(**{k: v for k, v in slots.items() if k in used})
    return jdbc_query(spark, url, sql.strip(), **jdbc_opts)


def regroup_to_table_metadata(rows: DataFrame) -> DataFrame:
    """Per-column rows → one TableMetadata-shaped row per table: ordered
    ``columns array<struct<name,description,col_type,sort_order>>``
    (the reference's itertools.groupby regroup,
    ``hive_table_metadata_extractor.py:133-160``, as a hash aggregation with
    map-side combine — no pushed ORDER BY required)."""
    return (
        rows.groupBy("database", "cluster", "schema", "name")
        .agg(
            F.max("description").alias("description"),
            F.max(F.col("is_view").cast("boolean")).alias("is_view"),
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("col_sort_order").cast("int").alias("sort_order"),
                        F.col("col_name").alias("name"),
                        F.col("col_description").alias("description"),
                        F.col("col_type").alias("col_type"),
                    )
                )
            ).alias("columns"),
        )
    )


def explode_table_columns(tables: DataFrame) -> DataFrame:
    """Regrouped TableMetadata rows → the per-column frame the
    ``table_metadata_nodes/relations`` expansions take (reference
    ``ColumnMetadata`` value objects, ``table_metadata.py:156-190``)."""
    return tables.select(
        "database", "cluster", "schema",
        F.col("name").alias("table_name"),
        F.explode("columns").alias("c"),
    ).select(
        "database", "cluster", "schema", "table_name",
        F.col("c.name").alias("name"),
        F.col("c.description").alias("description"),
        F.col("c.col_type").alias("col_type"),
        F.col("c.sort_order").alias("sort_order"),
    )


# ---- Presto views (presto_view_metadata_extractor.py:21-117) ----------------

PRESTO_VIEW_SQL = """
    SELECT d.NAME as `schema`, t.TBL_NAME name, t.VIEW_ORIGINAL_TEXT as view_original_text
    FROM TBLS t
    JOIN DBS d ON t.DB_ID = d.DB_ID
    WHERE t.VIEW_EXPANDED_TEXT = '/* Presto View */'
    {where_clause_suffix}
"""


def presto_view_scan(
    spark: SparkSession,
    url: str | None = None,
    rows: DataFrame | None = None,
    where_clause_suffix: str = " ",
    cluster: str = "gold",
    **jdbc_opts,
) -> DataFrame:
    """Presto view metadata out of the Hive metastore → standard per-column
    contract rows (database='presto', is_view=True).

    The metastore query is the reference's
    (``presto_view_metadata_extractor.py:28-35``; pass ``url`` for a JDBC
    read, or ``rows`` with (schema, name, view_original_text) pre-read).
    The per-view decode chain — strip the ``/* Presto View: ... */`` fence,
    base64-decode, parse ``{"columns":[{name,type}...]}``, fan out with the
    create-view order as sort order (:93-116) — runs COLUMNAR:
    substring_index / unbase64 / from_json / posexplode, so a metastore
    with a million views decodes across executors instead of one
    driver-side loop."""
    if rows is None:
        if url is None:
            raise ValueError("presto_view_scan needs a JDBC url or rows")
        sql = PRESTO_VIEW_SQL.format(where_clause_suffix=where_clause_suffix)
        rows = jdbc_query(spark, url, sql.strip(), **jdbc_opts)

    # text.split(PREFIX, 1)[-1].rsplit(SUFFIX, 1)[0] — the b64 payload can
    # contain neither delimiter, so first/last-occurrence splits agree
    encoded = F.substring_index(
        F.substring_index("view_original_text", "/* Presto View: ", -1),
        " */", 1)
    cols = F.from_json(
        F.get_json_object(F.unbase64(encoded).cast("string"), "$.columns"),
        "array<struct<name:string,type:string>>",
    )
    return (
        rows.select("schema", "name", F.posexplode(cols).alias("pos", "c"))
        .select(
            F.lit("presto").alias("database"),
            F.lit(cluster).alias("cluster"),
            F.col("schema"),
            F.col("name"),
            F.lit(None).cast("string").alias("description"),
            F.col("c.name").alias("col_name"),
            F.lit(None).cast("string").alias("col_description"),
            F.col("c.type").alias("col_type"),
            F.col("pos").alias("col_sort_order"),
            F.lit(True).alias("is_view"),
        )
    )
