"""Tableau GraphQL dashboard chains over a deterministic fake Metadata API,
mirroring the reference extractors (tableau_dashboard_extractor.py:35-52,
_query_:33-48, _last_modified_:34-48, _table_:36-86,
tableau_external_table_extractor.py:32-56) and the sanitizer rules
(tableau_dashboard_utils.py:23-65)."""

from amundsendatabuilder_spark.operators import dashboard_models as dm
from amundsendatabuilder_spark.sources import tableau_chains as tc

BASE = "https://tableau.example.com"
CLUSTER = "gold"


def make_fake_graphql():
    def execute(query: str, variables: dict):
        if "createdAt" in query:
            return {"workbooks": [
                {"id": "w1", "name": "Sales/It's Q1", "createdAt":
                 "2024-04-01T00:00:00Z", "description": "sales wb",
                 "projectName": "Finance", "projectVizportalUrlId": "p10",
                 "vizportalUrlId": "v100"},
                {"id": "w2", "name": "Ops", "createdAt":
                 "2024-04-02T00:00:00Z", "description": "ops wb",
                 "projectName": "Internal", "projectVizportalUrlId": "p20",
                 "vizportalUrlId": "v200"},
            ]}
        if "customSQLTables" in query:
            return {"customSQLTables": [
                {"id": "q1", "name": "Rev Query", "query": "SELECT 1",
                 "downstreamWorkbooks": [
                     {"name": "Sales/It's Q1", "projectName": "Finance"},
                     {"name": "Ops", "projectName": "Internal"}]},
            ]}
        if "updatedAt" in query:
            return {"workbooks": [
                {"id": "w1", "name": "Sales/It's Q1",
                 "projectName": "Finance", "updatedAt":
                 "2024-05-01T00:00:00Z"},
            ]}
        if "upstreamTables" in query:
            return {"workbooks": [
                {"name": "Sales/It's Q1", "projectName": "Finance",
                 "upstreamTables": [
                     # schema hidden inside the table name; schema key wrong
                     {"name": "real_schema.real_table", "schema": "wrong",
                      "database": {"name": "pgdb",
                                   "connectionType": "postgres"}},
                     {"name": "plain_table", "schema": "public",
                      "database": {"name": "pgdb",
                                   "connectionType": "postgres"}},
                     # schema-less -> external keying
                     {"name": "My Sheet", "schema": "",
                      "database": {"name": "Growth by Region & County",
                                   "connectionType": "google-sheets"}},
                 ]},
            ]}
        if "externalTables" in query:
            assert variables == {"externalTableTypes": ["google-sheets",
                                                        "textfile"]}
            return {"databases": [
                {"name": "Growth by Region & County",
                 "connectionType": "google-sheets",
                 "description": "growth sheet",
                 "tables": [{"name": "FY19 Report"}, {"name": "FY20 Report"}]},
                {"name": "leads.csv", "connectionType": "textfile",
                 "description": "leads file", "tables": []},
            ]}
        raise ValueError(f"unexpected query: {query[:60]}")

    return execute


def test_tableau_metadata_and_exclusions(spark):
    md = {r["dashboard_id"]: r for r in tc.tableau_dashboard_metadata(
        spark, make_fake_graphql(), BASE, CLUSTER,
        excluded_projects=["Internal"]).collect()}
    # Internal project excluded; workbook name sanitized (no / or ')
    assert list(md) == ["SalesIts Q1"]
    r = md["SalesIts Q1"]
    assert r["product"] == "tableau" and r["cluster"] == CLUSTER
    assert r["group_id"] == "Finance" and r["group_name"] == "Finance"
    assert r["group_url"] == f"{BASE}/#/projects/p10"
    assert r["dashboard_url"] == f"{BASE}/#/workbooks/v100/views"
    assert r["created_timestamp"] == 1711929600  # 2024-04-01
    assert r["description"] == "sales wb"


def test_tableau_queries_and_last_modified(spark):
    qs = tc.tableau_dashboard_queries(
        spark, make_fake_graphql(), CLUSTER,
        excluded_projects=["Internal"]).collect()
    assert len(qs) == 1  # Ops workbook excluded
    q = qs[0]
    assert q["dashboard_id"] == "SalesIts Q1"
    assert q["query_id"] == "q1" and q["query_name"] == "Rev Query"
    assert q["query_text"] == "SELECT 1" and q["url"] == ""

    lm = tc.tableau_dashboard_last_modified(
        spark, make_fake_graphql(), CLUSTER).collect()
    assert lm[0]["last_modified_timestamp"] == 1714521600  # 2024-05-01


def test_tableau_dashboard_tables(spark):
    rows = {r["table_id"] for r in tc.tableau_dashboard_tables(
        spark, make_fake_graphql(), CLUSTER, database="presto",
        external_cluster_name="external").collect()}
    assert rows == {
        # inner schema wins over the wrong schema key
        "presto://gold.real_schema/real_table",
        "presto://gold.public/plain_table",
        # schema-less -> connectionType database, sanitized sheet schema
        "googlesheets://external.Growth_by_Region__County/My Sheet",
    }


def test_tableau_external_tables(spark):
    rows = {(r["database"], r["cluster"], r["schema"], r["name"],
             r["description"])
            for r in tc.tableau_external_tables(
                spark, make_fake_graphql(), "external", "external_schema",
                ["google-sheets", "textfile"]).collect()}
    assert rows == {
        ("googlesheets", "external", "Growth_by_Region__County",
         "FY19 Report", "growth sheet"),
        ("googlesheets", "external", "Growth_by_Region__County",
         "FY20 Report", "growth sheet"),
        ("textfile", "external", "external_schema", "leads.csv",
         "leads file"),
    }


def test_tableau_chain_to_search_docs(spark):
    fetch = make_fake_graphql()
    md = tc.tableau_dashboard_metadata(spark, fetch, BASE, CLUSTER)
    qs = tc.tableau_dashboard_queries(spark, fetch, CLUSTER)
    nodes = dm.dashboard_metadata_nodes(md).unionByName(
        dm.dashboard_query_nodes(qs))
    rels = dm.dashboard_metadata_relations(md).unionByName(
        dm.dashboard_query_relations(qs))
    docs = {r["uri"]: r
            for r in dm.dashboard_docs_from_graph(nodes, rels).collect()}
    d = docs["tableau_dashboard://gold.Finance/SalesIts Q1"]
    assert d["name"] == "SalesIts Q1"
    assert d["group_name"] == "Finance"
    assert d["query_names"] == ["Rev Query"]
