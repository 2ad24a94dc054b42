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


def test_delete_relation_preprocessor_desired_state(spark, warehouse):
    """DeleteRelationPreprocessor (neo4j_preprocessor.py:120-200): for every
    node PAIR the batch re-publishes (configured label tuples, undirected
    match), pre-delete the pair's other existing relations — stale relation
    types between re-published pairs disappear; pairs the batch does not
    touch and unconfigured label pairs are untouched."""
    from pyspark.sql import functions as F

    from amundsendatabuilder_spark.operators.preprocessors import (
        desired_state_relation_batch,
    )
    from amundsendatabuilder_spark.plans.lake import SnapshotLake

    rel_schema = ("start_key string, end_key string, type string, "
                  "start_label string, end_label string, reverse_type string")
    lake = SnapshotLake(spark, warehouse)
    t = lake.create_table("rels", spark.createDataFrame([], rel_schema).schema,
                          ["start_key", "end_key", "type"], n_buckets=4)
    seed = [
        # stale relation type between a re-published pair -> deleted
        ("c1", "pii.email", "OLD_TAG", "Column", "Tag", "OLD_TAG_OF"),
        # reversed orientation of a re-published pair -> deleted (the
        # reference Cypher matches -[r]- undirected, :138-141)
        ("pii.new", "c2", "TAG_OF", "Tag", "Column", "TAG"),
        # pair NOT re-published by the batch -> untouched (:147-152 scope)
        ("c1", "pii.ssn", "TAG", "Column", "Tag", "TAG_OF"),
        # label pair not configured -> untouched even though pair matches
        ("c1", "pii.email", "DESCRIPTION", "Column", "Description",
         "DESCRIPTION_OF"),
    ]
    t.merge_upsert(spark.createDataFrame(seed, rel_schema), 0)

    batch = spark.createDataFrame(
        [("c1", "pii.email", "TAG", "Column", "Tag", "TAG_OF"),
         ("c2", "pii.new", "TAG", "Column", "Tag", "TAG_OF")],
        rel_schema,
    )
    merged = desired_state_relation_batch(t.read(), batch, [("Column", "Tag")])
    m = t.merge_upsert(merged, 1, delete_col="__delete")
    assert m["rows_deleted"] == 2  # OLD_TAG + the reversed TAG_OF

    got = {(r["start_key"], r["end_key"], r["type"])
           for r in t.read().collect()}
    assert got == {
        ("c1", "pii.email", "TAG"),          # re-published
        ("c2", "pii.new", "TAG"),            # re-published (pair had reversed row)
        ("c1", "pii.ssn", "TAG"),            # pair untouched by the batch
        ("c1", "pii.email", "DESCRIPTION"),  # label pair not configured
    }

    # where-clause narrowing: nothing deleted when the predicate excludes all
    batch2 = spark.createDataFrame(
        [("c1", "pii.email", "TAG", "Column", "Tag", "TAG_OF")], rel_schema)
    merged2 = desired_state_relation_batch(
        t.read(), batch2, [("Column", "Tag")], where=F.col("type") == "NOPE")
    m2 = t.merge_upsert(merged2, 2, delete_col="__delete")
    assert m2["rows_deleted"] == 0
