"""End-to-end Redash dashboard chain over a deterministic fake API,
mirroring the reference RedashDashboardExtractor composition
(redash_dashboard_extractor.py:100-215, redash_dashboard_utils.py:99-155):
publish filter, widget position sort, generated descriptions, per-viz
query/chart fan-out, owner/last-modified, table-parser hook."""

import re

from amundsendatabuilder_spark.operators import dashboard_models as dm
from amundsendatabuilder_spark.sources.redash_chains import (
    redash_dashboard_charts,
    redash_dashboard_last_modified,
    redash_dashboard_metadata,
    redash_dashboard_owners,
    redash_dashboard_queries,
    redash_dashboard_tables,
)

BASE = "https://redash.example.com"
API = f"{BASE}/api"


def _viz(vid, vname, vtype, qid, qname, qtext):
    return {"visualization": {
        "id": vid, "name": vname, "type": vtype,
        "query": {"id": qid, "name": qname, "query": qtext,
                  "data_source_id": 1},
    }, "options": {}}


def make_fake_redash_api():
    """d1 published (text+viz widgets, positions out of order), d2 archived,
    d3 draft, d4 published viz-only, d5 published empty. Nested so
    cloudpickle ships it by value to executors."""

    def dash(i, archived=False, draft=False):
        return {"id": i, "name": f"Dash {i}", "slug": f"dash-{i}",
                "created_at": "2024-03-01T00:00:00Z",
                "updated_at": "2024-03-05T00:00:00Z",
                "is_archived": archived, "is_draft": draft,
                "user": {"email": f"owner{i}@example.com"}}

    widgets = {
        "1": [
            {"text": "second paragraph",
             "options": {"position": {"row": 2, "col": 0}}},
            dict(_viz(100, "Viz A", "CHART", 10, "Query Ten", "SELECT * FROM s.t"),
                 options={"position": {"row": 3, "col": 0}}),
            {"text": "first paragraph",
             "options": {"position": {"row": 1, "col": 0}}},
            dict(_viz(101, "Viz B", "TABLE", 11, "Query Eleven",
                      "SELECT * FROM s.u"),
                 options={"position": {"row": 3, "col": 1}}),
        ],
        "2": [], "3": [],
        "4": [_viz(200, "Viz C", "PIVOT", 20, "Query Twenty",
                   "SELECT * FROM s.v"),
              _viz(201, "Viz D", "CHART", 20, "Query Twenty",
                   "SELECT * FROM s.v")],
        "5": [],
    }

    def fake(url: str):
        if url == f"{API}/dashboards":
            return {"count": 5, "page": 1, "page_size": 50, "results": [
                dash(1), dash(2, archived=True), dash(3, draft=True),
                dash(4), dash(5)]}
        m = re.match(rf"{re.escape(API)}/dashboards/(\d+)$", url)
        if m:
            return {"widgets": widgets[m.group(1)]}
        raise ValueError(f"unexpected URL {url}")

    return fake


def test_redash_metadata_descriptions(spark):
    md = {r["dashboard_id"]: r for r in redash_dashboard_metadata(
        spark, BASE, API, make_fake_redash_api()).collect()}
    # archived d2 / draft d3 filtered out
    assert sorted(md) == ["1", "4", "5"]
    r = md["1"]
    assert r["product"] == "redash" and r["cluster"] == "prod"
    assert r["group_id"] == "redash" and r["group_name"] == "Redash"
    assert r["group_url"] == BASE
    assert r["dashboard_url"] == f"{BASE}/dashboards/1"
    assert r["created_timestamp"] == 1709251200  # 2024-03-01
    # text widgets concatenated in position order (row 1 before row 2)
    assert r["description"] == "first paragraph\n\nsecond paragraph"
    # viz-only dashboard: distinct query-name bullet list
    assert md["4"]["description"] == (
        "A dashboard containing the following queries:\n\n- Query Twenty")
    assert md["5"]["description"] == "This dashboard appears to be empty!"


def test_redash_queries_charts_owners_tables(spark):
    fetch = make_fake_redash_api()
    qs = {(r["dashboard_id"], r["query_id"]): r
          for r in redash_dashboard_queries(spark, BASE, API, fetch).collect()}
    assert set(qs) == {("1", "10"), ("1", "11"), ("4", "20")}
    assert qs[("1", "10")]["query_name"] == "Query Ten"
    assert qs[("1", "10")]["url"] == f"{BASE}/queries/10"
    assert qs[("1", "10")]["query_text"] == "SELECT * FROM s.t"

    ch = {r["chart_id"]: r
          for r in redash_dashboard_charts(spark, BASE, API, fetch).collect()}
    assert sorted(ch) == ["100", "101", "200", "201"]
    assert ch["100"]["chart_name"] == "Viz A"
    assert ch["100"]["chart_type"] == "CHART"
    assert ch["100"]["query_id"] == "10"
    assert ch["100"]["chart_url"] is None

    ow = {r["dashboard_id"]: r["email"]
          for r in redash_dashboard_owners(spark, BASE, API, fetch).collect()}
    assert ow == {"1": "owner1@example.com", "4": "owner4@example.com",
                  "5": "owner5@example.com"}

    lm = {r["dashboard_id"]: r["last_modified_timestamp"]
          for r in redash_dashboard_last_modified(
              spark, BASE, API, fetch).collect()}
    assert lm["1"] == 1709596800  # 2024-03-05

    def table_parser(viz: dict) -> list[str]:
        m = re.search(r"FROM (\w+)\.(\w+)", viz["query"]["query"])
        return [f"db://prod.{m.group(1)}/{m.group(2)}"] if m else []

    tb = {(r["dashboard_id"], r["table_id"]) for r in redash_dashboard_tables(
        spark, BASE, API, fetch, table_parser).collect()}
    # d4's two vizzes share one query/table -> deduped like the reference's
    # table_keys set
    assert tb == {("1", "db://prod.s/t"), ("1", "db://prod.s/u"),
                  ("4", "db://prod.s/v")}


def test_redash_chain_to_search_docs(spark):
    fetch = make_fake_redash_api()
    md = redash_dashboard_metadata(spark, BASE, API, fetch)
    qs = redash_dashboard_queries(spark, BASE, API, fetch)
    ch = redash_dashboard_charts(spark, BASE, API, fetch)

    nodes = (
        dm.dashboard_metadata_nodes(md)
        .unionByName(dm.dashboard_query_nodes(qs))
        .unionByName(dm.dashboard_chart_nodes(ch))
    )
    rels = (
        dm.dashboard_metadata_relations(md)
        .unionByName(dm.dashboard_query_relations(qs))
        .unionByName(dm.dashboard_chart_relations(ch))
        .unionByName(dm.dashboard_owner_relations(
            redash_dashboard_owners(spark, BASE, API, fetch)))
    )
    docs = {r["uri"]: r
            for r in dm.dashboard_docs_from_graph(nodes, rels).collect()}
    assert len(docs) == 3
    d = docs["redash_dashboard://prod.redash/1"]
    assert d["name"] == "Dash 1"
    assert d["product"] == "redash" and d["cluster"] == "prod"
    assert d["group_name"] == "Redash"
    assert sorted(d["query_names"]) == ["Query Eleven", "Query Ten"]
    assert sorted(d["chart_names"]) == ["Viz A", "Viz B"]
