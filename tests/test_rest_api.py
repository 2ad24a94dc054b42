"""RestApiQuery correlated 1:1/1:N join — zip semantics mirroring
tests for databuilder/rest_api/rest_api_query.py (execute :134-185,
_compute_sub_records :208-249)."""

import pytest

from amundsendatabuilder_spark.sources.rest_api import (
    compute_sub_records,
    json_path_values,
    rest_api_join,
)


def _make_fake_api():
    """Deterministic local 'API' (Mode-extractor shape). Defined as a NESTED
    function so cloudpickle ships it by value to executors (a module-level
    function in tests/ is pickled by reference and unimportable on workers)."""
    def fake_api(url: str):
        if url == "https://api/spaces":
            return {"spaces": [{"id": "s1", "name": "Analytics"},
                               {"id": "s2", "name": "Growth"}]}
        if url.startswith("https://api/spaces/") and url.endswith("/reports"):
            sid = url.split("/")[-2]
            if sid == "s1":
                return {"reports": [{"id": "r1", "name": "Daily", "runs": 5},
                                    {"id": "r2", "name": "Weekly", "runs": 2}]}
            return {"reports": []}
        if url.startswith("https://api/fail"):
            raise ConnectionError("boom")
        raise KeyError(url)
    return fake_api


def test_sub_record_zip_and_or_semantics():
    # reference docstring examples, rest_api_query.py:212-231
    assert compute_sub_records(["1", "a", "x", "2", "b", "y", "3", "c", "z"],
                               ["f1", "f2", "f3"]) == [
        ["1", "a", "x"], ["2", "b", "y"], ["3", "c", "z"]]
    assert compute_sub_records(["1", "2", "3", "a", "b", "c"], ["f1", "f2"],
                               json_path_contains_or=True) == [
        ["1", "a"], ["2", "b"], ["3", "c"]]
    with pytest.raises(ValueError):
        compute_sub_records(["x"], [])


def test_json_path_or_union_layout():
    payload = {"charts": [
        {"token": "c0", "_links": {"viz": {"href": "/viz/c0"}}},
        {"token": "c1", "_links": {"viz": {"href": "/viz/c1"}}},
    ]}
    # '|' union → field-major (all of path 1, then path 2), matching
    # jsonpath-rw so the OR transpose re-pairs per record
    path = "(charts[*].token) | (charts[*]._links.viz.href)"
    vals = json_path_values(payload, path)
    assert vals == ["c0", "c1", "/viz/c0", "/viz/c1"]
    assert compute_sub_records(vals, ["id", "url"],
                               json_path_contains_or=True) == [
        ["c0", "/viz/c0"], ["c1", "/viz/c1"]]


def test_json_path_ragged_counts_raise():
    payload = {"items": [{"a": 1, "b": 10}, {"a": 2}]}  # second lacks 'b'
    with pytest.raises(ValueError, match="ragged"):
        json_path_values(payload, "items[*].a,items[*].b")


def test_json_path_and_chained_join(spark):
    _fake_api = _make_fake_api()
    assert json_path_values(_fake_api("https://api/spaces"),
                            "spaces.[*].id,spaces.[*].name") == [
        "s1", "Analytics", "s2", "Growth"]

    seed = spark.createDataFrame([("org1",)], "org string")
    spaces = rest_api_join(
        seed, "https://api/spaces", "spaces.[*].id,spaces.[*].name",
        ["space_id", "space_name"], _fake_api,
    )
    reports = rest_api_join(
        spaces, "https://api/spaces/{space_id}/reports",
        "reports.[*].id,reports.[*].name",
        ["report_id", "report_name"], _fake_api,
        skip_no_result=True,
    )
    got = {(r["space_id"], r["report_id"], r["report_name"])
           for r in reports.collect()}
    # 1:N fan-out for s1; s2 has no reports and is skipped (skip_no_result)
    assert got == {("s1", "r1", "Daily"), ("s1", "r2", "Weekly")}

    # no-result without skip: original record passes through with nulls
    kept = rest_api_join(
        spaces, "https://api/spaces/{space_id}/reports",
        "reports.[*].id,reports.[*].name",
        ["report_id", "report_name"], _fake_api,
    )
    rows = {r["space_id"]: r["report_id"] for r in kept.collect() if r["space_id"] == "s2"}
    assert rows == {"s2": None}

    # failure policy: can_skip_failure swallows, otherwise task fails
    failing = spark.createDataFrame([("fail",)], "path string")
    ok = rest_api_join(
        failing, "https://api/{path}", "x", ["f"], _fake_api,
        can_skip_failure=lambda e: isinstance(e, ConnectionError),
    )
    assert ok.count() == 0
    with pytest.raises(Exception):
        rest_api_join(failing, "https://api/{path}", "x", ["f"], _fake_api).collect()
