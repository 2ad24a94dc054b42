"""Generic graph-query shim — the reference Neo4jExtractor re-expressed
over the engine's graph tables.

Reference: ``databuilder/extractor/neo4j_extractor.py:19,38-113`` (arbitrary
cypher_query → rows, optionally mapped to a model class) and the publish-tag
predicate injection hook of ``neo4j_search_data_extractor.py:161-175``
(``{publish_tag_filter}`` placeholder → ``WHERE {entity}.published_tag =
'{tag}'`` or empty).

Spark-first: the graph lives in lake tables (``graph_nodes`` /
``graph_relations`` / ``search_documents`` / ``repo_files`` /
``table_usage``), so "run a cypher query against Neo4j" becomes "run a SQL
query against those tables as temp views" — Catalyst plans the traversal
as joins with full pushdown, instead of streaming records out of a graph
server one at a time. The model-class mapping collapses to the SELECT list:
alias columns to the target contract (the reference's ``model_class(**row)``
is exactly a row-shape adapter).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

#: the lake tables a :class:`CDCPipeline` exposes, in view-name order
PIPELINE_VIEWS = ("graph_nodes", "graph_relations", "search_documents",
                  "repo_files", "table_usage")


def add_publish_tag_filter(query: str, publish_tag: str | None,
                           entity: str = "table") -> str:
    """The reference's ``_add_publish_tag_filter``
    (``neo4j_search_data_extractor.py:161-175``): empty tag → the
    ``{publish_tag_filter}`` placeholder disappears; otherwise it becomes
    ``WHERE {entity}.publish_tag = '{tag}'`` (the engine's lineage column —
    the reference's neo4j property is spelled ``published_tag``).
    Placeholder substitution is a literal replace so braces elsewhere in
    the SQL stay untouched."""
    if not publish_tag:
        flt = ""
    else:
        flt = f"WHERE {entity}.publish_tag = '{publish_tag}'"
    return query.replace("{publish_tag_filter}", flt)


def graph_query(
    query: str,
    pipe: Any | None = None,
    views: dict[str, DataFrame] | None = None,
    publish_tag: str | None = None,
    entity: str = "table",
    spark: SparkSession | None = None,
) -> DataFrame:
    """Run a user-supplied SQL query over the graph tables and return the
    result frame (the caller's SELECT list IS the model contract).

    ``pipe``: a CDCPipeline — its lake tables register as the temp views in
    :data:`PIPELINE_VIEWS`. ``views``: extra/override frames to register by
    name (tests, ad-hoc graphs). At least one of the two is required."""
    if pipe is None and not views:
        raise ValueError("graph_query needs a pipeline or explicit views")
    if pipe is not None:
        spark = pipe.spark
        for name in PIPELINE_VIEWS:
            getattr(pipe, name).read().createOrReplaceTempView(name)
    if views:
        if spark is None:
            spark = next(iter(views.values())).sparkSession
        for name, df in views.items():
            df.createOrReplaceTempView(name)
    return spark.sql(add_publish_tag_filter(query, publish_tag, entity))
