"""Mode dashboard extractor chains — the concrete RestApiQuery compositions.

Each function rebuilds one reference extractor's query chain over the
injected ``fetch`` (production: an HTTP client with Mode basic auth; tests:
a deterministic local fake) and lands rows in the ``operators/
dashboard_models`` input contract, so the output flows straight into
``dashboard_*_nodes/relations`` → ``dashboard_docs_from_graph``.

Chain sources (URLs, json paths, field names transcribed verbatim):
* spaces seed+hop — ``mode_dashboard_utils.py:23-47``
* metadata — ``mode_dashboard_extractor.py:89-109`` (+ the three
  transformers :48-76: created_timestamp → epoch, group/dashboard URL
  templates)
* queries — ``mode_dashboard_queries_extractor.py:90-102``
* charts — ``mode_dashboard_charts_extractor.py:78-93`` (chart_url template
  :40-44; the charts hop is an OR union of two paths)
* last successful execution —
  ``mode_dashboard_last_successful_executions_extractor.py:54-58`` (rolling
  ``_last_successful_execution`` pointer, state=succeeded)

Every hop is a distributed ``rest_api_join`` (mapInPandas batch fetches);
pagination (ModePaginatedRestApiQuery) is delegated to ``fetch``, which may
concatenate pages per URL — the join semantics don't change."""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amundsendatabuilder_spark.operators.transformers import timestamp_to_epoch
from amundsendatabuilder_spark.sources.rest_api import rest_api_join

SPACES_URL = "https://app.mode.com/api/{organization}/spaces?filter=all"
REPORTS_URL = "https://app.mode.com/api/{organization}/spaces/{dashboard_group_id}/reports"
QUERIES_URL = "https://app.mode.com/api/{organization}/reports/{dashboard_id}/queries"
CHARTS_URL = ("https://app.mode.com/api/{organization}/reports/{dashboard_id}"
              "/queries/{query_id}/charts")


def _seed(spark: SparkSession, organization: str) -> DataFrame:
    return spark.createDataFrame([(organization,)], "organization string")


def mode_spaces(spark: SparkSession, organization: str,
                fetch: Callable[[str], Any]) -> DataFrame:
    """Seed → spaces hop shared by every chain (``mode_dashboard_utils.py:
    23-47``)."""
    return rest_api_join(
        _seed(spark, organization), SPACES_URL,
        "_embedded.spaces[*].[token,name,description]",
        ["dashboard_group_id", "dashboard_group", "dashboard_group_description"],
        fetch,
    )


def _reports_hop(spaces: DataFrame, fetch, extra_paths: str,
                 extra_fields: list[str]) -> DataFrame:
    return rest_api_join(
        spaces, REPORTS_URL,
        f"_embedded.reports[*].[{extra_paths}]",
        extra_fields, fetch, skip_no_result=True,
    )


def mode_dashboard_metadata(spark: SparkSession, organization: str,
                            fetch: Callable[[str], Any],
                            cluster: str = "gold") -> DataFrame:
    """ModeDashboardExtractor chain → the ``dashboard_metadata_nodes`` input
    contract (product/cluster/group/dashboard attributes, epoch
    created_timestamp, templated URLs, empty tags)."""
    spaces = mode_spaces(spark, organization, fetch)
    reports = _reports_hop(
        spaces, fetch, "token,name,description,created_at",
        ["dashboard_id", "dashboard_name", "description", "created_timestamp"],
    )
    reports = timestamp_to_epoch("created_timestamp")(reports)
    return reports.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        F.col("dashboard_group").alias("group_name"),
        F.format_string(
            "https://app.mode.com/%s/spaces/%s",
            F.col("organization"), F.col("dashboard_group_id"),
        ).alias("group_url"),
        F.col("dashboard_group_description").alias("group_description"),
        "dashboard_id", "dashboard_name", "description", "created_timestamp",
        F.format_string(
            "https://app.mode.com/%s/reports/%s",
            F.col("organization"), F.col("dashboard_id"),
        ).alias("dashboard_url"),
        F.lit(None).cast("array<string>").alias("tags"),
    )


def mode_dashboard_queries(spark: SparkSession, organization: str,
                           fetch: Callable[[str], Any],
                           cluster: str = "gold") -> DataFrame:
    """ModeDashboardQueriesExtractor chain → ``dashboard_query_nodes``
    contract; ``url`` is the reference's templated query URL
    (``mode_dashboard_queries_extractor.py:45-49``)."""
    spaces = mode_spaces(spark, organization, fetch)
    reports = _reports_hop(spaces, fetch, "token", ["dashboard_id"])
    queries = rest_api_join(
        reports, QUERIES_URL,
        "_embedded.queries[*].[token,name,raw_query]",
        ["query_id", "query_name", "query_text"], fetch, skip_no_result=True,
    )
    return queries.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id", "query_id", "query_name",
        F.format_string(
            "https://app.mode.com/%s/reports/%s/queries/%s",
            F.col("organization"), F.col("dashboard_id"), F.col("query_id"),
        ).alias("url"),
        "query_text",
    )


def mode_dashboard_charts(spark: SparkSession, organization: str,
                          fetch: Callable[[str], Any],
                          cluster: str = "gold") -> DataFrame:
    """ModeDashboardChartsExtractor chain → ``dashboard_chart_nodes``
    contract. The charts hop is the reference's OR-union of token and viz
    href (field-major zip); chart name/type are not in this endpoint —
    the reference emits them empty here too (its chart model tolerates
    missing name/type)."""
    spaces = mode_spaces(spark, organization, fetch)
    reports = _reports_hop(spaces, fetch, "token", ["dashboard_id"])
    queries = rest_api_join(
        reports, QUERIES_URL,
        "_embedded.queries[*].[token,name]",
        ["query_id", "query_name"], fetch, skip_no_result=True,
    )
    charts = rest_api_join(
        queries, CHARTS_URL,
        "(_embedded.charts[*].token) | (_embedded.charts[*]._links.report_viz_web.href)",
        ["chart_id", "chart_url"], fetch,
        json_path_contains_or=True, skip_no_result=True,
    )
    return charts.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id", "query_id", "chart_id",
        F.lit(None).cast("string").alias("chart_name"),
        F.lit(None).cast("string").alias("chart_type"),
        F.format_string("https://app.mode.com%s", F.col("chart_url")).alias("chart_url"),
    )


def mode_dashboard_last_successful_executions(
    spark: SparkSession, organization: str, fetch: Callable[[str], Any],
    cluster: str = "gold",
) -> DataFrame:
    """ModeDashboardLastSuccessfulExecutionExtractor chain →
    ``dashboard_execution_nodes`` contract with the rolling
    ``_last_successful_execution`` id and state=succeeded (reference model
    ``dashboard_execution.py`` LAST_SUCCESSFUL pointer)."""
    spaces = mode_spaces(spark, organization, fetch)
    execs = _reports_hop(
        spaces, fetch, "token,last_successfully_run_at",
        ["dashboard_id", "execution_timestamp"],
    )
    execs = timestamp_to_epoch("execution_timestamp")(execs)
    return execs.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id",
        F.lit("_last_successful_execution").alias("execution_id"),
        F.col("execution_timestamp").alias("timestamp"),
        F.lit("succeeded").alias("state"),
    )


EXECUTIONS_RUN_URL = "https://app.mode.com{last_run_resource_path}"
OWNER_USER_URL = "https://app.mode.com{creator_resource_path}"
MEMBERSHIPS_URL = "https://app.mode.com/api/{organization}/memberships"
USER_URL = "https://app.mode.com{mode_user_resource_path}"
# http (not https) reproduces the reference's literal template
# (mode_dashboard_charts_batch_extractor.py:69) — parity over polish;
# a deployment fronting TLS should override the template
CHARTS_BATCH_URL = "http://app.mode.com/batch/{organization}/charts"


def mode_dashboard_executions(spark: SparkSession, organization: str,
                              fetch: Callable[[str], Any],
                              cluster: str = "gold") -> DataFrame:
    """ModeDashboardExecutionsExtractor chain
    (``mode_dashboard_executions_extractor.py:66-95``): reports OR-union
    (token | last_run href) → per-run state/completed_at →
    ``dashboard_execution_nodes`` contract with the rolling
    ``_last_execution`` pointer (DashboardExecution's default id)."""
    spaces = mode_spaces(spark, organization, fetch)
    runs = rest_api_join(
        spaces, REPORTS_URL,
        "(_embedded.reports[*].token) | (_embedded.reports[*]._links.last_run.href)",
        ["dashboard_id", "last_run_resource_path"], fetch,
        json_path_contains_or=True, skip_no_result=True,
    )
    state = rest_api_join(
        runs, EXECUTIONS_RUN_URL, "[state,completed_at]",
        ["execution_state", "execution_timestamp"], fetch,
        skip_no_result=True,
    )
    state = timestamp_to_epoch("execution_timestamp")(state)
    return state.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id",
        F.lit("_last_execution").alias("execution_id"),
        F.col("execution_timestamp").alias("timestamp"),
        F.col("execution_state").alias("state"),
    )


def mode_dashboard_last_modified(spark: SparkSession, organization: str,
                                 fetch: Callable[[str], Any],
                                 cluster: str = "gold") -> DataFrame:
    """ModeDashboardLastModifiedTimestampExtractor chain
    (``mode_dashboard_last_modified_timestamp_extractor.py:45-64``):
    reports ``[token, edited_at]`` → ``dashboard_last_modified_nodes``
    contract (ISO → epoch)."""
    spaces = mode_spaces(spark, organization, fetch)
    lm = _reports_hop(spaces, fetch, "token,edited_at",
                      ["dashboard_id", "last_modified_timestamp"])
    lm = timestamp_to_epoch("last_modified_timestamp")(lm)
    return lm.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id", "last_modified_timestamp",
    )


def mode_dashboard_owners(spark: SparkSession, organization: str,
                          fetch: Callable[[str], Any],
                          cluster: str = "gold") -> DataFrame:
    """ModeDashboardOwnerExtractor chain
    (``mode_dashboard_owner_extractor.py:44-77``): reports OR-union
    (token | creator href) → per-creator email with the 404-skip policy →
    ``dashboard_owner_relations`` contract."""
    from amundsendatabuilder_spark.sources.rest_api import (
        http_failure_skip_on_status,
    )

    spaces = mode_spaces(spark, organization, fetch)
    creators = rest_api_join(
        spaces, REPORTS_URL,
        "(_embedded.reports[*].token) | (_embedded.reports[*]._links.creator.href)",
        ["dashboard_id", "creator_resource_path"], fetch,
        json_path_contains_or=True, skip_no_result=True,
    )
    owners = rest_api_join(
        creators, OWNER_USER_URL, "email", ["email"], fetch,
        skip_no_result=True,
        can_skip_failure=http_failure_skip_on_status({404}),
    )
    return owners.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id", "email",
    )


def mode_dashboard_usage(spark: SparkSession, organization: str,
                         fetch: Callable[[str], Any],
                         cluster: str = "gold") -> DataFrame:
    """ModeDashboardUsageExtractor chain
    (``mode_dashboard_usage_extractor.py:35-55``): reports
    ``[token, view_count]`` → one row per dashboard with the accumulated
    view count (feeds the doc-level total_usage decoration)."""
    spaces = mode_spaces(spark, organization, fetch)
    usage = _reports_hop(spaces, fetch, "token,view_count",
                         ["dashboard_id", "accumulated_view_count"])
    return usage.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id",
        F.col("accumulated_view_count").cast("long")
        .alias("accumulated_view_count"),
    )


def mode_dashboard_users(spark: SparkSession, organization: str,
                         fetch: Callable[[str], Any]) -> DataFrame:
    """ModeDashboardUserExtractor chain
    (``mode_dashboard_user_extractor.py:70-107``): memberships OR-union
    (member_username | user href) → per-user email (404-skip) → User rows
    carrying the extra ``mode_user_id`` attribute; the reference's
    RemoveFieldTransformer drop (organization / resource path / product)
    is the select below."""
    from amundsendatabuilder_spark.sources.rest_api import (
        http_failure_skip_on_status,
    )

    seed = _seed(spark, organization)
    members = rest_api_join(
        seed, MEMBERSHIPS_URL,
        "(_embedded.memberships[*].member_username) | "
        "(_embedded.memberships[*]._links.user.href)",
        ["mode_user_id", "mode_user_resource_path"], fetch,
        json_path_contains_or=True, skip_no_result=True,
    )
    users = rest_api_join(
        members, USER_URL, "email", ["email"], fetch,
        skip_no_result=True,
        can_skip_failure=http_failure_skip_on_status({404}),
    )
    return users.select("email", "mode_user_id")


def mode_dashboard_charts_batch(spark: SparkSession, organization: str,
                                fetch: Callable[[str], Any],
                                cluster: str = "gold",
                                include_all_space: bool = False) -> DataFrame:
    """ModeDashboardChartsBatchExtractor
    (``batch/mode_dashboard_charts_batch_extractor.py:57-89``): the
    discovery endpoint lists every chart for the organization in one
    paginated sweep — six fields per chart including name and type (the
    per-query charts endpoint carries neither) → ``dashboard_chart_nodes``
    contract. Pagination is delegated to ``fetch`` as in every chain."""
    url = CHARTS_BATCH_URL + ("?include_spaces=all" if include_all_space else "")
    charts = rest_api_join(
        _seed(spark, organization), url,
        "(charts[*].[space_token,report_token,query_token,token,"
        "chart_title,chart_type])",
        ["dashboard_group_id", "dashboard_id", "query_id", "chart_id",
         "chart_name", "chart_type"], fetch, skip_no_result=True,
    )
    return charts.select(
        F.lit("mode").alias("product"),
        F.lit(cluster).alias("cluster"),
        F.col("dashboard_group_id").alias("group_id"),
        "dashboard_id", "query_id", "chart_id", "chart_name", "chart_type",
        F.lit(None).cast("string").alias("chart_url"),
    )
