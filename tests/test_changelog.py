"""Changelog generator: determinism across parallelism, dup/late injection."""

from pyspark.sql import functions as F

from amundsendatabuilder_spark.operators.dedup import lww_dedup, lww_dedup_agg
from amundsendatabuilder_spark.sources.changelog import changelog_df, expected_final_state


def test_deterministic_across_partitions(spark):
    a = changelog_df(spark, 2000, n_entities=300, num_partitions=2).orderBy("event_id")
    b = changelog_df(spark, 2000, n_entities=300, num_partitions=7).orderBy("event_id")
    assert a.schema == b.schema
    ra, rb = a.collect(), b.collect()
    assert ra == rb
    assert len(ra) == 2000


def test_changelog_properties(spark):
    df = changelog_df(spark, 3000, n_entities=400).cache()
    ops = {r[0] for r in df.select("op").distinct().collect()}
    assert ops == {"insert", "update", "delete"}
    # deletes carry null content
    assert df.where((F.col("op") == "delete") & F.col("content").isNotNull()).count() == 0
    assert df.where((F.col("op") != "delete") & F.col("content").isNull()).count() == 0
    # ~1% duplicate deliveries: same payload, different event_id
    dups = (
        df.groupBy("repo", "path", "commit", "event_ts", "op")
        .count().where("count > 1").count()
    )
    assert dups > 0
    # commit is a 40-char hex sha
    assert df.where(~F.col("commit").rlike("^[0-9a-f]{40}$")).count() == 0
    # skew: top repo holds a large share of events
    top = df.groupBy("repo").count().orderBy(F.desc("count")).first()
    assert top["count"] > 3000 * 0.15
    df.unpersist()


def test_lww_dedup_variants_agree(spark):
    df = changelog_df(spark, 3000, n_entities=200)
    a = lww_dedup(df).orderBy("repo", "path").collect()
    b = lww_dedup_agg(df).select(*[f.name for f in df.schema.fields]).orderBy("repo", "path").collect()
    assert len(a) == len(b)
    as_map = {(r["repo"], r["path"]): (r["event_ts"], r["commit"], r["op"]) for r in a}
    bs_map = {(r["repo"], r["path"]): (r["event_ts"], r["commit"], r["op"]) for r in b}
    assert as_map == bs_map
    # winner really is the max (event_ts, commit) per key
    exp = expected_final_state(df)
    live = {(r["repo"], r["path"]) for r in exp.select("repo", "path").collect()}
    for (repo, path), (_, _, op) in as_map.items():
        assert ((repo, path) in live) == (op != "delete")
