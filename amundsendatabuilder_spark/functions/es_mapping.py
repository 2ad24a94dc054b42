"""Elasticsearch index-mapping DDL derived from the engine's doc schemas.

The reference pins explicit text/keyword/date mappings for its three
search indexes (``databuilder/publisher/elasticsearch_constants.py:
13-247``) and ships them with every ElasticsearchPublisher job.  The
engine's ``search_documents`` table schema is the semantic analog; this
module derives the SAME mapping dict from the Spark ``StructType`` with
declarative per-index rules, so a user migrating to a real ES can diff
and create indexes bit-for-bit (see ``tests/test_es_mapping.py`` —
field-for-field golden parity against the reference constants).

Derivation rules (the reference's own conventions):

* string / array<string>  → ``text`` with the ``simple`` analyzer plus a
  ``raw`` keyword subfield (searchable AND aggregatable), except
  - fields in ``keyword``     → plain ``keyword`` (exact-match ids/enums),
  - fields in ``plain_text``  → analyzer-only text (no raw subfield),
  - fields in ``normalized``  → the raw subfield gains the reference's
    ``lowercase_normalizer`` (dashboard group/name sort-insensitivity);
* fields in ``dates``         → ``date`` with ``format: epoch_second``;
* long                        → ``long``;  boolean → ``boolean``.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import types as T

LOWERCASE_NORMALIZER_SETTINGS: dict[str, Any] = {
    "analysis": {
        "normalizer": {
            "lowercase_normalizer": {
                "type": "custom",
                "char_filter": [],
                "filter": ["lowercase", "asciifolding"],
            }
        }
    }
}


def field_mapping(
    field: T.StructField,
    keyword: frozenset[str] | set[str] = frozenset(),
    plain_text: frozenset[str] | set[str] = frozenset(),
    dates: frozenset[str] | set[str] = frozenset(),
    normalized: frozenset[str] | set[str] = frozenset(),
) -> dict[str, Any]:
    name, dt = field.name, field.dataType
    if name in dates:
        return {"type": "date", "format": "epoch_second"}
    if isinstance(dt, T.ArrayType):
        dt = dt.elementType  # ES maps arrays as their element type
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return {"type": "long"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if name in keyword:
        return {"type": "keyword"}
    out: dict[str, Any] = {"type": "text", "analyzer": "simple"}
    if name not in plain_text:
        raw: dict[str, Any] = {"type": "keyword"}
        if name in normalized:
            raw["normalizer"] = "lowercase_normalizer"
        out["fields"] = {"raw": raw}
    return out


def mapping_from_schema(
    schema: T.StructType,
    doc_type: str,
    settings: dict[str, Any] | None = None,
    **rule_sets: frozenset[str] | set[str],
) -> dict[str, Any]:
    props = {f.name: field_mapping(f, **rule_sets) for f in schema.fields}
    out: dict[str, Any] = {"mappings": {doc_type: {"properties": props}}}
    if settings:
        out = {"settings": settings, **out}
    return out


def table_index_mapping() -> dict[str, Any]:
    """The TABLE_ELASTICSEARCH_INDEX_MAPPING analog
    (``elasticsearch_constants.py:13-103``), derived from ``DOC_SCHEMA``.
    One extra field vs the reference: ``schema_description`` (the
    reference leaves it to ES dynamic mapping; pinning it as analyzed
    text is strictly more deterministic)."""
    from amundsendatabuilder_spark.operators.search_docs import DOC_SCHEMA

    return mapping_from_schema(
        DOC_SCHEMA, "table",
        keyword={"key", "display_name", "tags", "badges"},
        plain_text={"description", "column_descriptions",
                    "programmatic_descriptions", "schema_description"},
        dates={"last_updated_timestamp"},
    )


def user_index_mapping() -> dict[str, Any]:
    """USER_ELASTICSEARCH_INDEX_MAPPING analog
    (``elasticsearch_constants.py:190-247``), from ``USER_DOC_SCHEMA``."""
    from amundsendatabuilder_spark.operators.search_docs import (
        USER_DOC_SCHEMA,
    )

    return mapping_from_schema(USER_DOC_SCHEMA, "user")


DASHBOARD_DOC_SCHEMA = T.StructType(
    [
        T.StructField("group_name", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("product", T.StringType()),
        T.StructField("cluster", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("group_description", T.StringType()),
        T.StructField("group_url", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("uri", T.StringType()),
        T.StructField("last_successful_run_timestamp", T.LongType()),
        T.StructField("total_usage", T.LongType()),
        T.StructField("query_names", T.ArrayType(T.StringType())),
        T.StructField("chart_names", T.ArrayType(T.StringType())),
        T.StructField("tags", T.ArrayType(T.StringType())),
        T.StructField("badges", T.ArrayType(T.StringType())),
    ]
)


def dashboard_index_mapping() -> dict[str, Any]:
    """DASHBOARD_ELASTICSEARCH_INDEX_MAPPING analog
    (``elasticsearch_constants.py:105-188``): lowercase_normalizer on the
    group_name/name raw subfields, analyzed-with-raw description fields."""
    return mapping_from_schema(
        DASHBOARD_DOC_SCHEMA, "dashboard",
        settings=LOWERCASE_NORMALIZER_SETTINGS,
        keyword={"uri", "tags", "badges"},
        normalized={"group_name", "name"},
    )


def write_mappings(out_dir: str) -> dict[str, str]:
    """Emit the three index-mapping JSON artifacts (the files a real ES
    migration would feed to PUT /index)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for kind, m in (
        ("table", table_index_mapping()),
        ("user", user_index_mapping()),
        ("dashboard", dashboard_index_mapping()),
    ):
        p = os.path.join(out_dir, f"{kind}_index_mapping.json")
        with open(p, "w") as fh:
            json.dump(m, fh, indent=2, sort_keys=True)
            fh.write("\n")
        paths[kind] = p
    return paths
