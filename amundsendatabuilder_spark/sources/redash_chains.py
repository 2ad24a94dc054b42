"""Redash dashboard extractor chain — RedashDashboardExtractor as DataFrame
transforms over the injected ``fetch``.

Chain source (URLs, json paths, field names, widget semantics transcribed
verbatim from the reference):
* dashboards list + per-dashboard widgets —
  ``redash_dashboard_extractor.py:194-215`` (paged list ``/dashboards``,
  detail ``/dashboards/{id}``, json paths ``results[*].[id,name,slug,
  created_at,updated_at,is_archived,is_draft,user]`` and ``widgets``)
* publish filter ``NOT (is_archived OR is_draft)`` —
  ``redash_dashboard_extractor.py:100-113``
* ISO→epoch on created/last-modified — ``:230-247``
* fixed group (id ``redash``, name ``Redash``, url = redash base) —
  ``:74-76,122-133``
* widget sort by (position.row, position.col) —
  ``redash_dashboard_utils.py:99-112``; text vs visualization widget split
  ``:115-132``; generated description (text widgets joined by blank lines,
  else query-name bullet list, else the empty-dashboard string) ``:139-155``
* per-viz DashboardQuery / DashboardChart fields —
  ``redash_dashboard_extractor.py:157-175`` (query url =
  base + ``/queries/{id}``, chart has no url)
* optional table parser → DashboardTable keys — ``:60-63,177-183``

Spark-first shape: the two REST hops are distributed ``rest_api_join``s;
the widget list lands as ONE json string column and every widget transform
(sort, split, description build, query/chart fan-out) is columnar
``from_json`` + higher-order functions — no per-row Python except the
user-supplied ``table_parser`` hook, which runs as an Arrow-batched UDF.
Pagination (RedashPaginatedRestApiQuery's page params,
``redash_dashboard_utils.py:69-96``) is delegated to ``fetch``, which may
concatenate pages per URL — join semantics are unchanged.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amundsendatabuilder_spark.operators.transformers import timestamp_to_epoch
from amundsendatabuilder_spark.sources.rest_api import rest_api_join

PRODUCT = "redash"
GROUP_ID = "redash"
GROUP_NAME = "Redash"

_WIDGETS_SCHEMA = (
    "array<struct<"
    "text:string,"
    "options:struct<position:struct<row:int,col:int>>,"
    "visualization:struct<id:string,name:string,type:string,"
    "query:struct<id:string,name:string,query:string,data_source_id:string>>"
    ">>"
)


def _redash_detail(spark: SparkSession, redash_base_url: str,
                   api_base_url: str, fetch: Callable[[str], Any],
                   cluster: str) -> DataFrame:
    """Both hops + publish filter + widget parse → one row per published
    dashboard with identity columns and sorted/split widget arrays."""
    seed = spark.createDataFrame([(1,)], "seed int")  # EmptyRestApiQuerySeed
    dashes = rest_api_join(
        seed, f"{api_base_url}/dashboards",
        "results[*].[id,name,slug,created_at,updated_at,is_archived,is_draft,user]",
        ["dashboard_id", "dashboard_name", "slug", "created_timestamp",
         "last_modified_timestamp", "is_archived", "is_draft", "user"],
        fetch, skip_no_result=True,
        field_types={"is_archived": "BooleanType", "is_draft": "BooleanType"},
    )
    detail = rest_api_join(
        dashes, f"{api_base_url}/dashboards/{{dashboard_id}}",
        "widgets", ["widgets"], fetch, skip_no_result=True,
    )
    detail = detail.where(~(F.col("is_archived") | F.col("is_draft")))
    detail = timestamp_to_epoch("created_timestamp")(detail)
    detail = timestamp_to_epoch("last_modified_timestamp")(detail)

    w = F.from_json("widgets", _WIDGETS_SCHEMA)
    # stable (row, col) sort: lexicographic struct sort with the original
    # index as tiebreaker ≡ the reference's stable sorted()
    ordered = F.transform(
        F.sort_array(F.transform(
            w,
            lambda x, i: F.struct(
                F.coalesce(x["options"]["position"]["row"], F.lit(0)).alias("r"),
                F.coalesce(x["options"]["position"]["col"], F.lit(0)).alias("c"),
                i.alias("i"),
                x.alias("widget"),
            ),
        )),
        lambda s: s["widget"],
    )
    return (
        detail.withColumn("w", ordered)
        .withColumn("texts", F.expr(
            "transform(filter(w, x -> x.text is not null and "
            "x.visualization is null), x -> x.text)"))
        .withColumn("vizzes", F.expr(
            "transform(filter(w, x -> x.visualization is not null), "
            "x -> x.visualization)"))
        .select(
            F.lit(PRODUCT).alias("product"),
            F.lit(cluster).alias("cluster"),
            F.lit(GROUP_ID).alias("group_id"),
            F.lit(GROUP_NAME).alias("group_name"),
            F.lit(redash_base_url).alias("group_url"),
            F.lit(None).cast("string").alias("group_description"),
            "dashboard_id", "dashboard_name",
            "created_timestamp", "last_modified_timestamp",
            F.format_string("%s/dashboards/%s", F.lit(redash_base_url),
                            F.col("dashboard_id")).alias("dashboard_url"),
            F.get_json_object("user", "$.email").alias("owner_email"),
            "texts", "vizzes",
        )
    )


def redash_dashboard_metadata(spark: SparkSession, redash_base_url: str,
                              api_base_url: str, fetch: Callable[[str], Any],
                              cluster: str = "prod") -> DataFrame:
    """→ the ``dashboard_metadata_nodes`` input contract. The description is
    the reference's generated one (``redash_dashboard_utils.py:139-155``);
    the query-name bullet list keeps first-occurrence order of distinct
    names (the reference iterates a Python set there — nondeterministic;
    this engine is deterministic by construction)."""
    d = _redash_detail(spark, redash_base_url, api_base_url, fetch, cluster)
    desc = (
        F.when(F.size("texts") > 0, F.array_join("texts", "\n\n"))
        .when(
            F.size("vizzes") > 0,
            F.concat(
                F.lit("A dashboard containing the following queries:\n\n"),
                F.array_join(F.array_distinct(F.expr(
                    "transform(vizzes, v -> concat('- ', v.query.name))")), "\n"),
            ),
        )
        .otherwise("This dashboard appears to be empty!")
    )
    return d.select(
        "product", "cluster", "group_id", "group_name", "group_url",
        "group_description", "dashboard_id", "dashboard_name",
        desc.alias("description"), "created_timestamp", "dashboard_url",
        F.lit(None).cast("array<string>").alias("tags"),
    )


def _viz_rows(d: DataFrame) -> DataFrame:
    return d.select(
        "product", "cluster", "group_id", "dashboard_id",
        F.explode("vizzes").alias("v"),
    )


def redash_dashboard_queries(spark: SparkSession, redash_base_url: str,
                             api_base_url: str, fetch: Callable[[str], Any],
                             cluster: str = "prod") -> DataFrame:
    """→ ``dashboard_query_nodes`` contract; query url is the reference's
    relative-url template ``/queries/{id}`` on the redash base
    (``redash_dashboard_utils.py:34-36``)."""
    d = _redash_detail(spark, redash_base_url, api_base_url, fetch, cluster)
    return _viz_rows(d).select(
        "product", "cluster", "group_id", "dashboard_id",
        F.col("v")["query"]["id"].alias("query_id"),
        F.col("v")["query"]["name"].alias("query_name"),
        F.format_string("%s/queries/%s", F.lit(redash_base_url),
                        F.col("v")["query"]["id"]).alias("url"),
        F.col("v")["query"]["query"].alias("query_text"),
    ).dropDuplicates(["dashboard_id", "query_id"])


def redash_dashboard_charts(spark: SparkSession, redash_base_url: str,
                            api_base_url: str, fetch: Callable[[str], Any],
                            cluster: str = "prod") -> DataFrame:
    """→ ``dashboard_chart_nodes`` contract; Redash charts carry no url
    (``redash_dashboard_extractor.py:168-174`` passes none)."""
    d = _redash_detail(spark, redash_base_url, api_base_url, fetch, cluster)
    return _viz_rows(d).select(
        "product", "cluster", "group_id", "dashboard_id",
        F.col("v")["query"]["id"].alias("query_id"),
        F.col("v")["id"].alias("chart_id"),
        F.col("v")["name"].alias("chart_name"),
        F.col("v")["type"].alias("chart_type"),
        F.lit(None).cast("string").alias("chart_url"),
    )


def redash_dashboard_last_modified(spark: SparkSession, redash_base_url: str,
                                   api_base_url: str,
                                   fetch: Callable[[str], Any],
                                   cluster: str = "prod") -> DataFrame:
    """→ ``dashboard_last_modified_nodes`` contract (updated_at → epoch)."""
    d = _redash_detail(spark, redash_base_url, api_base_url, fetch, cluster)
    return d.select("product", "cluster", "group_id", "dashboard_id",
                    "last_modified_timestamp")


def redash_dashboard_owners(spark: SparkSession, redash_base_url: str,
                            api_base_url: str, fetch: Callable[[str], Any],
                            cluster: str = "prod") -> DataFrame:
    """→ ``dashboard_owner_relations`` contract (user.email,
    ``redash_dashboard_extractor.py:150-153``)."""
    d = _redash_detail(spark, redash_base_url, api_base_url, fetch, cluster)
    return d.select("product", "cluster", "group_id", "dashboard_id",
                    F.col("owner_email").alias("email"))


def redash_dashboard_tables(
    spark: SparkSession, redash_base_url: str, api_base_url: str,
    fetch: Callable[[str], Any], table_parser: Callable[[dict], list[str]],
    cluster: str = "prod",
) -> DataFrame:
    """→ ``dashboard_table_relations`` contract. ``table_parser`` is the
    reference's optional hook (``redash_dashboard_extractor.py:60-63,
    177-183``): given one visualization widget dict (same shape as
    RedashVisualizationWidget._data['visualization']) it returns table keys
    ``{db}://{cluster}.{schema}/{tbl}``. Runs Arrow-batched (metadata-scale
    fan-out, deduped per dashboard like the reference's table_keys set)."""
    d = _redash_detail(spark, redash_base_url, api_base_url, fetch, cluster)
    viz_json = _viz_rows(d).withColumn("vj", F.to_json("v")).drop("v")

    @F.pandas_udf("array<string>")
    def parse_tables(vj: pd.Series) -> pd.Series:
        return vj.map(lambda s: table_parser(json.loads(s)) if s else [])

    return (
        viz_json.withColumn("table_id", F.explode(parse_tables("vj")))
        .select("product", "cluster", "group_id", "dashboard_id", "table_id")
        .dropDuplicates(["dashboard_id", "table_id"])
    )
