"""Physical-plan quality gates: predicate pushdown, column pruning,
broadcast joins, whole-stage codegen. These assert the *plans*, not results —
a correct-but-unpushed scan is a regression at 100 TB."""

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_to_parquet(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").where(F.col("event_id") < 2000)
    s = plan(df)
    assert "PushedFilters" in s and "LessThan(event_id,2000)" in s.replace(" ", "")


def test_column_pruning(spark):
    from amundsendatabuilder_spark.functions.text import doc_fingerprint

    df = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))
    )
    s = plan(df)
    # scan must read only the two needed columns, not lang/source/n_chars
    scan = [l for l in s.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in scan and "text" in scan
    assert "n_chars" not in scan and "source" not in scan


def test_search_doc_join_broadcasts_dims(spark):
    import __spark_entry__ as em

    s = plan(em.q_search_doc_join(spark, SF))
    assert "BroadcastHashJoin" in s  # nation/region dims must broadcast


def test_anti_join_physical(spark):
    import __spark_entry__ as em

    s = plan(em.q_anti_join_no_orders(spark, SF))
    assert "LeftAnti" in s


def test_lww_agg_has_partial_aggregation(spark):
    """The scale path for dedup must show map-side partial aggregation
    (HashAggregate before the exchange), not a raw window sort."""
    from amundsendatabuilder_spark.operators.dedup import lww_dedup_agg
    from amundsendatabuilder_spark.sources.changelog import changelog_df

    df = lww_dedup_agg(changelog_df(spark, 1000, n_entities=100))
    s = plan(df)
    # struct-max plans as SortAggregate; the property that matters at scale
    # is the PARTIAL aggregate before the exchange (map-side combine: a hot
    # key collapses to one row per task pre-shuffle)
    assert "partial_max" in s and "Exchange" in s


def test_extraction_stays_in_codegen(spark):
    """Entity extraction must be pure JVM expressions — no Python eval nodes
    (BatchEvalPython / ArrowEvalPython) in the plan."""
    from amundsendatabuilder_spark.operators.extract import extract_entities
    from amundsendatabuilder_spark.sources.changelog import changelog_df

    e = extract_entities(changelog_df(spark, 100, n_entities=10).where("op != 'delete'"))
    s = plan(e)
    assert "EvalPython" not in s
    # '*'-prefixed operators = inside a WholeStageCodegen span; the extraction
    # projections and filter must all be codegen'd
    assert "* Project" in s and "* Filter" in s
