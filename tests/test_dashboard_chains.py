"""End-to-end Mode dashboard chains over a deterministic fake API:
fixture-API → RestApiQuery hops → model expansions → DashboardESDocument,
mirroring the reference's extractor compositions
(mode_dashboard_extractor.py / _queries_ / _charts_ /
_last_successful_executions_)."""

import re

import pytest

from amundsendatabuilder_spark.operators import dashboard_models as dm
from amundsendatabuilder_spark.sources.dashboard_chains import (
    mode_dashboard_charts,
    mode_dashboard_last_successful_executions,
    mode_dashboard_metadata,
    mode_dashboard_queries,
)

ORG = "acme"


def make_fake_mode_api():
    """Deterministic Mode API: 2 spaces x 2 reports x 2 queries x 1 chart.
    Built as a nested function so cloudpickle ships it by VALUE to executors
    (a module-level function in a pytest file is pickled by module reference,
    which workers cannot import)."""

    def fake_mode_api(url: str):
        m = re.match(r"https://app\.mode\.com/api/acme/spaces\?filter=all$", url)
        if m:
            return {"_embedded": {"spaces": [
                {"token": f"sp{i}", "name": f"Space {i}",
                 "description": f"space desc {i}"} for i in range(2)
            ]}}
        m = re.match(r"https://app\.mode\.com/api/acme/spaces/sp(\d+)/reports$", url)
        if m:
            s = int(m.group(1))
            return {"_embedded": {"reports": [
                {"token": f"r{s}{j}", "name": f"Report {s}{j}",
                 "description": f"report desc {s}{j}",
                 "created_at": f"2024-01-0{j + 1}T00:00:00Z",
                 "last_successfully_run_at": f"2024-02-0{j + 1}T00:00:00Z"}
                for j in range(2)
            ]}}
        m = re.match(r"https://app\.mode\.com/api/acme/reports/r(\d+)/queries$", url)
        if m:
            r = m.group(1)
            return {"_embedded": {"queries": [
                {"token": f"q{r}{k}", "name": f"Query {r}{k}",
                 "raw_query": f"SELECT {k}"} for k in range(2)
            ]}}
        m = re.match(
            r"https://app\.mode\.com/api/acme/reports/r(\d+)/queries/q(\d+)/charts$", url)
        if m:
            q = m.group(2)
            # >=2 charts per query so the OR-union zip (token | viz href)
            # is exercised with n>1 — at n=1 interleave and field-major
            # transpose coincide and a mispairing is invisible
            return {"_embedded": {"charts": [
                {"token": f"c{q}{c}", "_links": {"report_viz_web":
                                                 {"href": f"/acme/viz/c{q}{c}"}}}
                for c in range(2)
            ]}}
        raise ValueError(f"unexpected URL {url}")

    return fake_mode_api


def test_mode_metadata_chain(spark):
    md = mode_dashboard_metadata(spark, ORG, make_fake_mode_api()).collect()
    assert len(md) == 4  # 2 spaces x 2 reports
    row = {r["dashboard_id"]: r for r in md}["r01"]
    assert row["product"] == "mode"
    assert row["group_id"] == "sp0"
    assert row["group_name"] == "Space 0"
    assert row["group_url"] == "https://app.mode.com/acme/spaces/sp0"
    assert row["dashboard_url"] == "https://app.mode.com/acme/reports/r01"
    assert row["dashboard_name"] == "Report 01"
    # ISO8601 -> epoch (TimestampStringToEpoch), 2024-01-02
    assert row["created_timestamp"] == 1704153600


def test_mode_chains_to_search_docs(spark):
    md = mode_dashboard_metadata(spark, ORG, make_fake_mode_api())
    qs = mode_dashboard_queries(spark, ORG, make_fake_mode_api())
    ch = mode_dashboard_charts(spark, ORG, make_fake_mode_api())
    ex = mode_dashboard_last_successful_executions(spark, ORG, make_fake_mode_api())

    qrows = qs.collect()
    assert len(qrows) == 8  # 4 reports x 2 queries
    assert {r["query_name"] for r in qrows} == {
        f"Query {r}{k}" for r in ("00", "01", "10", "11") for k in range(2)
    }
    crows = ch.collect()
    assert len(crows) == 16  # 8 queries x 2 charts
    # each row's url must correspond to ITS chart id (OR-union pairing)
    assert all(
        r["chart_url"] == f"https://app.mode.com/acme/viz/{r['chart_id']}"
        for r in crows
    )

    nodes = (
        dm.dashboard_metadata_nodes(md)
        .unionByName(dm.dashboard_query_nodes(qs))
        .unionByName(dm.dashboard_chart_nodes(ch))
        .unionByName(dm.dashboard_execution_nodes(ex))
    )
    rels = (
        dm.dashboard_metadata_relations(md)
        .unionByName(dm.dashboard_query_relations(qs))
        .unionByName(dm.dashboard_chart_relations(ch))
        .unionByName(dm.dashboard_execution_relations(ex))
    )
    docs = {r["uri"]: r for r in dm.dashboard_docs_from_graph(nodes, rels).collect()}
    assert len(docs) == 4
    d = docs["mode_dashboard://gold.sp1/r10"]
    assert d["name"] == "Report 10"
    assert d["group_name"] == "Space 1"
    assert d["description"] == "report desc 10"
    assert d["group_description"] == "space desc 1"
    assert sorted(d["query_names"]) == ["Query 100", "Query 101"]
    # 2024-02-01 epoch from the rolling _last_successful_execution pointer
    assert d["last_successful_run_timestamp"] == 1706745600
