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
                 "last_successfully_run_at": f"2024-02-0{j + 1}T00:00:00Z",
                 "edited_at": f"2024-03-0{j + 1}T00:00:00Z",
                 "view_count": 10 * s + j,
                 "_links": {
                     "last_run": {"href": f"/api/acme/reports/r{s}{j}/runs/latest"},
                     "creator": {"href": f"/api/acme/users/u{s}{j}"},
                 }}
                for j in range(2)
            ]}}
        m = re.match(
            r"https://app\.mode\.com/api/acme/reports/r(\d+)/runs/latest$", url)
        if m:
            r = m.group(1)
            return {"state": "succeeded" if r != "11" else "failed",
                    "completed_at": "2024-04-01T00:00:00Z"}
        m = re.match(r"https://app\.mode\.com/api/acme/users/u(\d+)$", url)
        if m:
            if m.group(1) == "10":  # deactivated creator -> 404 skip
                e = RuntimeError("404 not found")
                e.status_code = 404
                raise e
            return {"email": f"u{m.group(1)}@acme.com"}
        if url == "https://app.mode.com/api/acme/memberships":
            return {"_embedded": {"memberships": [
                {"member_username": "alice",
                 "_links": {"user": {"href": "/api/acme/users/u00"}}},
                {"member_username": "bob",
                 "_links": {"user": {"href": "/api/acme/users/u10"}}},
            ]}}
        if url.startswith("http://app.mode.com/batch/acme/charts"):
            return {"charts": [
                {"space_token": f"sp{s}", "report_token": f"r{s}{j}",
                 "query_token": f"q{s}{j}0", "token": f"bc{s}{j}",
                 "chart_title": f"Chart {s}{j}", "chart_type": "bar"}
                for s in range(2) for j in range(2)
            ]}
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


def test_mode_secondary_chains(spark):
    """Executions / last-modified / owners (404-skip) / usage / users /
    batch charts — the six remaining Mode extractor chains."""
    from amundsendatabuilder_spark.sources.dashboard_chains import (
        mode_dashboard_charts_batch,
        mode_dashboard_executions,
        mode_dashboard_last_modified,
        mode_dashboard_owners,
        mode_dashboard_usage,
        mode_dashboard_users,
    )

    fetch = make_fake_mode_api()

    ex = {r["dashboard_id"]: r
          for r in mode_dashboard_executions(spark, ORG, fetch).collect()}
    assert len(ex) == 4
    assert ex["r00"]["execution_id"] == "_last_execution"
    assert ex["r00"]["state"] == "succeeded"
    assert ex["r11"]["state"] == "failed"
    assert ex["r00"]["timestamp"] == 1711929600  # 2024-04-01

    lm = {r["dashboard_id"]: r["last_modified_timestamp"]
          for r in mode_dashboard_last_modified(spark, ORG, fetch).collect()}
    assert lm["r01"] == 1709337600  # edited_at 2024-03-02
    assert lm["r00"] == 1709251200  # 2024-03-01

    ow = {r["dashboard_id"]: r["email"]
          for r in mode_dashboard_owners(spark, ORG, fetch).collect()}
    # creator u10 404s -> r10 skipped by the status policy
    assert ow == {"r00": "u00@acme.com", "r01": "u01@acme.com",
                  "r11": "u11@acme.com"}

    us = {r["dashboard_id"]: r["accumulated_view_count"]
          for r in mode_dashboard_usage(spark, ORG, fetch).collect()}
    assert us == {"r00": 0, "r01": 1, "r10": 10, "r11": 11}

    users = {r["mode_user_id"]: r["email"]
             for r in mode_dashboard_users(spark, ORG, fetch).collect()}
    # bob's user href 404s -> skipped
    assert users == {"alice": "u00@acme.com"}

    bc = {r["chart_id"]: r
          for r in mode_dashboard_charts_batch(spark, ORG, fetch).collect()}
    assert len(bc) == 4
    assert bc["bc01"]["group_id"] == "sp0"
    assert bc["bc01"]["dashboard_id"] == "r01"
    assert bc["bc01"]["query_id"] == "q010"
    assert bc["bc01"]["chart_name"] == "Chart 01"
    assert bc["bc01"]["chart_type"] == "bar"
