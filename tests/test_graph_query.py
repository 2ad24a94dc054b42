"""Generic Neo4jExtractor shim: user-supplied SQL over the graph tables →
model-contract rows, with the publish-tag predicate injection hook
(neo4j_extractor.py:19,87-100; neo4j_search_data_extractor.py:161-175)."""

import pytest

from amundsendatabuilder_spark.sources.changelog import changelog_df
from amundsendatabuilder_spark.sources.graph_query import (
    add_publish_tag_filter,
    graph_query,
)
from amundsendatabuilder_spark.streaming.pipeline import CDCPipeline


def test_publish_tag_filter_substitution():
    q = "SELECT * FROM search_documents t {publish_tag_filter} ORDER BY key"
    # empty tag -> placeholder disappears (reference :169-170)
    assert add_publish_tag_filter(q, None) == (
        "SELECT * FROM search_documents t  ORDER BY key")
    assert add_publish_tag_filter(q, "v7", entity="t") == (
        "SELECT * FROM search_documents t WHERE t.publish_tag = 'v7' "
        "ORDER BY key")


def test_graph_query_requires_source(spark):
    with pytest.raises(ValueError, match="pipeline or explicit views"):
        graph_query("SELECT 1")


def test_graph_query_over_views(spark):
    docs = spark.createDataFrame(
        [("k1", "t1", "epoch_0"), ("k2", "t2", "epoch_1")],
        "key string, name string, publish_tag string")
    out = graph_query(
        "SELECT d.key, d.name FROM search_documents d {publish_tag_filter} "
        "ORDER BY d.key",
        views={"search_documents": docs}, publish_tag="epoch_1", entity="d")
    assert [(r["key"], r["name"]) for r in out.collect()] == [("k2", "t2")]


def test_graph_query_over_pipeline(spark, tmp_path):
    pipe = CDCPipeline(spark, str(tmp_path / "wh"), n_buckets=4)
    batch = changelog_df(spark, 400, n_entities=40)
    pipe.apply_batch(batch, 0)

    # the reference's search-data pattern: arbitrary query over the graph,
    # SELECT list as the model contract (TableESDocument subset)
    out = graph_query(
        """SELECT n.key, n.attributes['name'] AS name
           FROM graph_nodes n
           WHERE n.label = 'Table'
           ORDER BY n.key""",
        pipe=pipe)
    rows = out.collect()
    assert rows and all(r["key"].startswith("repofs://") for r in rows)

    # publish-tag predicate over the entity table: epoch_0 wrote every row
    q = ("SELECT t.repo, t.path FROM repo_files t {publish_tag_filter} "
         "ORDER BY t.repo, t.path")
    tagged = graph_query(q, pipe=pipe, publish_tag="epoch_0", entity="t")
    untagged = graph_query(q, pipe=pipe, publish_tag="no_such_tag", entity="t")
    assert tagged.count() > 0
    assert untagged.count() == 0
