"""Field-for-field golden parity of the derived ES index mappings against
the reference's pinned constants (elasticsearch_constants.py:13-247)."""

import importlib.util
import json
import os

import pytest

from amundsendatabuilder_spark.functions.es_mapping import (
    dashboard_index_mapping,
    table_index_mapping,
    user_index_mapping,
    write_mappings,
)

REF = "/root/reference/databuilder/publisher/elasticsearch_constants.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF), reason="reference constants not present"
)


def _ref_constants():
    spec = importlib.util.spec_from_file_location("es_constants", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _props(mapping, doc_type):
    return mapping["mappings"][doc_type]["properties"]


def _diff(ref_props, got_props):
    """Per-field diff: (fields wrong in got, fields missing, extra)."""
    wrong = {k: (ref_props[k], got_props.get(k))
             for k in ref_props if got_props.get(k) != ref_props[k]}
    missing = set(ref_props) - set(got_props)
    extra = set(got_props) - set(ref_props)
    return wrong, missing, extra


def test_table_mapping_matches_reference():
    ref = json.loads(_ref_constants().TABLE_ELASTICSEARCH_INDEX_MAPPING)
    wrong, missing, extra = _diff(_props(ref, "table"),
                                  _props(table_index_mapping(), "table"))
    assert wrong == {} and missing == set()
    # the one documented superset field (reference leaves it dynamic)
    assert extra == {"schema_description"}


def test_user_mapping_matches_reference():
    ref = json.loads(_ref_constants().USER_ELASTICSEARCH_INDEX_MAPPING)
    wrong, missing, extra = _diff(_props(ref, "user"),
                                  _props(user_index_mapping(), "user"))
    assert wrong == {} and missing == set()
    # profile fields the reference lets ES dynamic-map
    assert extra == {"github_username", "team_name", "employee_type",
                     "manager_email", "slack_id", "role_name", "is_active"}


def test_dashboard_mapping_matches_reference():
    ref = json.loads(_ref_constants().DASHBOARD_ELASTICSEARCH_INDEX_MAPPING)
    got = dashboard_index_mapping()
    wrong, missing, extra = _diff(_props(ref, "dashboard"),
                                  _props(got, "dashboard"))
    assert wrong == {} and missing == set()
    assert extra == {"product", "cluster", "group_url", "url", "uri",
                     "last_successful_run_timestamp", "total_usage"}
    # the lowercase_normalizer settings block is carried verbatim
    assert got["settings"] == ref["settings"]


def test_write_mappings_artifacts(tmp_path):
    paths = write_mappings(str(tmp_path))
    assert set(paths) == {"table", "user", "dashboard"}
    for p in paths.values():
        with open(p) as fh:
            m = json.load(fh)
        assert "mappings" in m
