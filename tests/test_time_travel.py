"""Time travel, commit history, and the incremental change feed.

The lake's manifests are immutable and versioned (meta/v{N}.json), so a
pinned read is an old manifest's file list resolved normally, and the diff
of two snapshots is a logical CDC feed — the Iceberg VERSION AS OF /
snapshots-metadata-table / changelog-scan trio, and Delta CDF's
_change_type convention (pre-image on delete, post-image otherwise).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from amundsendatabuilder_spark.plans.lake import SnapshotLake

SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("v", T.LongType()),
    ]
)


def _mk(spark, warehouse, mode="mor"):
    lake = SnapshotLake(spark, warehouse)
    return lake.create_table(f"tt_{mode}", SCHEMA, ["key"], n_buckets=4, mode=mode)


def _state(df):
    return {r["key"]: (r["name"], r["v"]) for r in df.collect()}


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_time_travel_reads(spark, warehouse, mode):
    t = _mk(spark, warehouse, mode)
    v0 = t.current().version
    t.merge_upsert(spark.createDataFrame([("a", "A", 1), ("b", "B", 1)], SCHEMA), 0)
    v1 = t.current().version
    t.merge_upsert(spark.createDataFrame([("b", "B2", 2), ("c", "C", 1)], SCHEMA), 1)
    v2 = t.current().version
    assert v0 < v1 < v2
    assert _state(t.read(version=v0)) == {}
    assert _state(t.read(version=v1)) == {"a": ("A", 1), "b": ("B", 1)}
    assert _state(t.read(version=v2)) == _state(t.read())
    # a pinned read is immutable: writing more does not move it
    t.merge_upsert(spark.createDataFrame([("a", "A9", 9)], SCHEMA), 2)
    assert _state(t.read(version=v1)) == {"a": ("A", 1), "b": ("B", 1)}
    with pytest.raises(ValueError, match="does not exist or was expired"):
        t.read(version=999)


def test_history_ledger(spark, warehouse):
    t = _mk(spark, warehouse, "mor")
    t.merge_upsert(spark.createDataFrame([("a", "A", 1)], SCHEMA), 0)
    t.merge_upsert(spark.createDataFrame([("b", "B", 1)], SCHEMA), 1)
    h = t.history()
    assert [e["version"] for e in h] == sorted(e["version"] for e in h)
    assert h[0]["parent"] is None  # create commit
    assert all(h[i]["parent"] == h[i - 1]["version"] for i in range(1, len(h)))
    last = h[-1]
    assert last["epochs"]["default"] == 1
    assert last["n_delta_files"] > 0
    assert last["committed_at_ms"] > 0
    # expiry trims history and time travel to dropped versions raises
    for i in range(2, 12):
        t.merge_upsert(spark.createDataFrame([("a", f"A{i}", i)], SCHEMA), i)
    t.expire_snapshots(keep_last=3, orphan_grace_ms=0)
    h2 = t.history()
    assert len(h2) == 3
    with pytest.raises(ValueError, match="expired"):
        t.read(version=0)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_changes_classification(spark, warehouse, mode):
    t = _mk(spark, warehouse, mode)
    t.merge_upsert(
        spark.createDataFrame([("a", "A", 1), ("b", "B", 1), ("d", "D", 1)], SCHEMA), 0
    )
    v1 = t.current().version
    batch = spark.createDataFrame(
        [("b", "B2", 2, False), ("c", "C", 1, False), ("d", None, None, True)],
        T.StructType(SCHEMA.fields + [T.StructField("is_delete", T.BooleanType())]),
    )
    t.merge_upsert(batch, 1, delete_col="is_delete")
    v2 = t.current().version
    ch = {r["key"]: r for r in t.changes(v1, v2).collect()}
    assert {k: r["_change_type"] for k, r in ch.items()} == {
        "b": "update", "c": "insert", "d": "delete",
    }
    # post-image on insert/update, pre-image on delete (Delta CDF convention)
    assert (ch["b"]["name"], ch["b"]["v"]) == ("B2", 2)
    assert (ch["c"]["name"], ch["c"]["v"]) == ("C", 1)
    assert (ch["d"]["name"], ch["d"]["v"]) == ("D", 1)
    # 'a' was untouched: no row in the feed
    assert "a" not in ch
    # to_version defaults to current
    assert {r["key"] for r in t.changes(v1).collect()} == {"b", "c", "d"}
    # same-version window is empty; inverted window raises
    assert t.changes(v2, v2).count() == 0
    with pytest.raises(ValueError, match="precedes"):
        t.changes(v2, v1)


def test_changes_compaction_is_silent_and_reinsert_is_insert(spark, warehouse):
    t = _mk(spark, warehouse, "mor")
    t.merge_upsert(spark.createDataFrame([("a", "A", 1), ("b", "B", 1)], SCHEMA), 0)
    batch = spark.createDataFrame(
        [("a", None, None, True)],
        T.StructType(SCHEMA.fields + [T.StructField("is_delete", T.BooleanType())]),
    )
    t.merge_upsert(batch, 1, delete_col="is_delete")
    v_del = t.current().version
    # compaction rewrites files but changes no logical row
    t.compact()
    v_cmp = t.current().version
    assert v_cmp > v_del
    assert t.changes(v_del, v_cmp).count() == 0
    # delete → re-insert across the window reads as insert
    t.merge_upsert(spark.createDataFrame([("a", "A2", 2)], SCHEMA), 2)
    ch = {r["key"]: r["_change_type"] for r in t.changes(v_del).collect()}
    assert ch == {"a": "insert"}


def test_changes_across_schema_evolution(spark, warehouse):
    t = _mk(spark, warehouse, "mor")
    t.merge_upsert(spark.createDataFrame([("a", "A", 1)], SCHEMA), 0)
    v1 = t.current().version
    evolved = T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType())])
    t.merge_upsert(spark.createDataFrame([("b", "B", 1, "x")], evolved), 1)
    ch = {r["key"]: r for r in t.changes(v1).collect()}
    assert set(ch) == {"b"}
    assert ch["b"]["_change_type"] == "insert"
    assert ch["b"]["extra"] == "x"
    assert "extra" in t.changes(v1).columns
