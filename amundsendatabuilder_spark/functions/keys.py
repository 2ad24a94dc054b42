"""Entity key grammar — the deterministic URI-style key scheme of the graph.

Reproduces the key format strings of the reference models (they are the MERGE
keys of the whole engine):

* ``database://{db}``                      — reference ``databuilder/models/table_metadata.py:212``
* ``{db}://{cluster}``                     — ``table_metadata.py:217``
* ``{db}://{cluster}.{schema}``            — ``table_metadata.py:222``
* ``{db}://{cluster}.{schema}/{tbl}``      — ``table_metadata.py:205``
* ``{db}://{cluster}.{schema}/{tbl}/{col}``— ``table_metadata.py:158``
* ``{parent}/_description`` (or ``_{src}_description``) — ``table_metadata.py:84,123-127``
* ``{db}://{cluster}.{schema}/{tbl}/timestamp`` — ``table_last_updated.py:13-16``
* ``{db}://{cluster}.{schema}/{tbl}/{part_type}/`` — ``watermark.py:13-21``
* owner/user key = email                   — ``user.py:14-19``
* tag key = lower-cased trimmed tag        — ``table_metadata.py:20-27``

Each helper exists twice: a Column-expression form (JVM-side, codegen'd — use
in pipelines) and a plain-string form (driver/tests). For the CDC engine over
the repo table, db=``repofs``, cluster=config, schema=``repo``, table=``path``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DATABASE = "repofs"
CLUSTER = "gold"


def _c(x: Column | str) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ---- Column-expression forms (JVM-side) ------------------------------------

def database_key(db: Column | str = DATABASE) -> Column:
    return F.concat(F.lit("database://"), _c(db))


def cluster_key(cluster: Column | str = CLUSTER, db: Column | str = DATABASE) -> Column:
    return F.concat(_c(db), F.lit("://"), _c(cluster))


def schema_key(schema: Column | str, cluster: Column | str = CLUSTER,
               db: Column | str = DATABASE) -> Column:
    return F.concat(cluster_key(cluster, db), F.lit("."), _c(schema))


def table_key(schema: Column | str, table: Column | str,
              cluster: Column | str = CLUSTER, db: Column | str = DATABASE) -> Column:
    return F.concat(schema_key(schema, cluster, db), F.lit("/"), _c(table))


def column_key(tbl_key: Column, column: Column | str) -> Column:
    return F.concat(tbl_key, F.lit("/"), _c(column))


def description_key(parent_key: Column, source: Column | str | None = None) -> Column:
    """``{parent}/_description``; programmatic: ``{parent}/_{source}_description``."""
    if source is None:
        return F.concat(parent_key, F.lit("/_description"))
    return F.concat(parent_key, F.lit("/_"), _c(source), F.lit("_description"))


def last_updated_key(tbl_key: Column) -> Column:
    return F.concat(tbl_key, F.lit("/timestamp"))


def watermark_key(tbl_key: Column, part_type: Column | str) -> Column:
    return F.concat(tbl_key, F.lit("/"), _c(part_type), F.lit("/"))


def stat_key(col_key: Column, stat_name: Column | str) -> Column:
    return F.concat(col_key, F.lit("/"), _c(stat_name), F.lit("/"))


def source_key(tbl_key: Column) -> Column:
    return F.concat(tbl_key, F.lit("/_source"))


def tag_key(tag: Column | str) -> Column:
    """Tags are trimmed + lower-cased (reference ``_format_as_list``)."""
    return F.lower(F.trim(_c(tag)))


def application_key(dag: Column | str, task: Column | str,
                    cluster: Column | str = CLUSTER) -> Column:
    return F.concat(F.lit("application://"), _c(cluster), F.lit(".airflow/"),
                    _c(dag), F.lit("/"), _c(task))


# ---- plain-string forms (driver / tests / fixtures) ------------------------

def database_key_str(db: str = DATABASE) -> str:
    return f"database://{db}"


def cluster_key_str(cluster: str = CLUSTER, db: str = DATABASE) -> str:
    return f"{db}://{cluster}"


def schema_key_str(schema: str, cluster: str = CLUSTER, db: str = DATABASE) -> str:
    return f"{db}://{cluster}.{schema}"


def table_key_str(schema: str, table: str, cluster: str = CLUSTER,
                  db: str = DATABASE) -> str:
    return f"{db}://{cluster}.{schema}/{table}"


def column_key_str(schema: str, table: str, column: str, cluster: str = CLUSTER,
                   db: str = DATABASE) -> str:
    return f"{db}://{cluster}.{schema}/{table}/{column}"


def description_key_str(parent_key: str, source: str | None = None) -> str:
    return f"{parent_key}/_description" if source is None else f"{parent_key}/_{source}_description"


def tag_key_str(tag: str) -> str:
    return tag.strip().lower()
