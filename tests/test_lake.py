"""Snapshot lake: merge semantics, exactly-once, schema evolution, deletes."""

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


def _mk(spark, warehouse, n_buckets=8):
    lake = SnapshotLake(spark, warehouse)
    return lake, lake.create_table("t", SCHEMA, ["key"], n_buckets=n_buckets)


def rows(t):
    return {r["key"]: (r["name"], r["v"]) for r in t.read().collect()}


def test_merge_insert_update(spark, warehouse):
    lake, t = _mk(spark, warehouse)
    df = spark.createDataFrame([("a", "A", 1), ("b", "B", 1)], SCHEMA)
    m = t.merge_upsert(df, epoch_id=0)
    assert m["rows_inserted"] == 2 and m["rows_updated"] == 0
    df2 = spark.createDataFrame([("b", "B2", 2), ("c", "C", 1)], SCHEMA)
    m2 = t.merge_upsert(df2, epoch_id=1)
    assert m2["rows_inserted"] == 1 and m2["rows_updated"] == 1
    assert rows(t) == {"a": ("A", 1), "b": ("B2", 2), "c": ("C", 1)}
    # lineage columns stamped
    r = {x["key"]: x for x in t.read().collect()}
    assert r["a"]["publish_tag"] == "epoch_0"
    assert r["b"]["publish_tag"] == "epoch_1"
    assert r["b"]["updated_ms"] > 0


def test_exactly_once_epoch_replay(spark, warehouse):
    lake, t = _mk(spark, warehouse)
    df = spark.createDataFrame([("a", "A", 1)], SCHEMA)
    t.merge_upsert(df, epoch_id=5)
    v_before = t.current().version
    m = t.merge_upsert(spark.createDataFrame([("a", "GARBAGE", 99)], SCHEMA), epoch_id=5)
    assert "skipped_epoch" in m
    assert t.current().version == v_before
    assert rows(t)["a"] == ("A", 1)
    # but a different channel may apply the same epoch number
    m2 = t.merge_upsert(spark.createDataFrame([("z", "Z", 1)], SCHEMA), epoch_id=5, channel="other")
    assert m2["rows_inserted"] == 1


def test_delete_rows_via_merge(spark, warehouse):
    lake, t = _mk(spark, warehouse)
    t.merge_upsert(spark.createDataFrame([("a", "A", 1), ("b", "B", 1)], SCHEMA), 0)
    batch = spark.createDataFrame(
        [("a", None, None, True), ("x", None, None, True), ("b", "B2", 2, False)],
        T.StructType(SCHEMA.fields + [T.StructField("is_delete", T.BooleanType())]),
    )
    m = t.merge_upsert(batch, 1, delete_col="is_delete")
    assert m["rows_deleted"] == 1  # 'x' delete is a no-op, not counted
    assert rows(t) == {"b": ("B2", 2)}


def test_create_only(spark, warehouse):
    lake, t = _mk(spark, warehouse)
    t.merge_upsert(spark.createDataFrame([("a", "orig", 1)], SCHEMA), 0)
    batch = spark.createDataFrame(
        [("a", "newer", 2, True), ("b", "B", 1, True)],
        T.StructType(SCHEMA.fields + [T.StructField("co", T.BooleanType())]),
    )
    t.merge_upsert(batch, 1, create_only_col="co")
    r = rows(t)
    assert r["a"] == ("orig", 1)  # existing row wins for create-only
    assert r["b"] == ("B", 1)


def test_schema_evolution_additive(spark, warehouse):
    lake, t = _mk(spark, warehouse)
    t.merge_upsert(spark.createDataFrame([("a", "A", 1)], SCHEMA), 0)
    evolved = T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType())])
    t.merge_upsert(spark.createDataFrame([("b", "B", 1, "X")], evolved), 1)
    got = {r["key"]: r["extra"] for r in t.read().collect()}
    assert got == {"a": None, "b": "X"}  # old rows read null through evolved schema
    # destructive type change rejected
    bad = T.StructType([T.StructField("key", T.StringType()), T.StructField("v", T.StringType())])
    with pytest.raises(ValueError, match="incompatible"):
        t.merge_upsert(spark.createDataFrame([("c", "1")], bad), 2)


def test_delete_where_and_guard(spark, warehouse):
    lake, t = _mk(spark, warehouse)
    df = spark.createDataFrame([(f"k{i}", "N", i) for i in range(100)], SCHEMA)
    t.merge_upsert(df, 0)
    with pytest.raises(RuntimeError, match="staleness guard"):
        t.delete_where(F.col("v") < 50, max_delete_pct=0.05)
    m = t.delete_where(F.col("v") < 3, max_delete_pct=0.05)
    assert m["rows_deleted"] == 3
    assert t.read().count() == 97


def test_cow_only_touched_buckets(spark, warehouse):
    lake, t = _mk(spark, warehouse, n_buckets=16)
    df = spark.createDataFrame([(f"k{i}", "N", i) for i in range(200)], SCHEMA)
    t.merge_upsert(df, 0)
    before = t.current().files
    m = t.merge_upsert(spark.createDataFrame([("k0", "N2", 0)], SCHEMA), 1)
    assert m["buckets_touched"] == 1
    after = t.current().files
    unchanged = [b for b in before if before[b] == after.get(b)]
    assert len(unchanged) == len(before) - 1  # only one bucket rewritten


def test_merge_strategies_equivalent(spark, warehouse):
    """bucketed (1-shuffle pandas reducer) == join (full-outer) state."""
    lake = SnapshotLake(spark, warehouse)
    for strat in ("bucketed", "join"):
        t = lake.create_table(f"t_{strat}", SCHEMA, ["key"], n_buckets=8)
        t.merge_upsert(
            spark.createDataFrame([(f"k{i}", "A", i) for i in range(50)], SCHEMA),
            0, strategy=strat,
        )
        batch = spark.createDataFrame(
            [(f"k{i}", "B", i * 10, i % 3 == 0) for i in range(30, 70)],
            T.StructType(SCHEMA.fields + [T.StructField("d", T.BooleanType())]),
        )
        m = t.merge_upsert(batch, 1, delete_col="d", strategy=strat)
        assert m["rows_seen"] == 40
    a = {r["key"]: (r["name"], r["v"], r["publish_tag"]) for r in lake.table("t_bucketed").read().collect()}
    b = {r["key"]: (r["name"], r["v"], r["publish_tag"]) for r in lake.table("t_join").read().collect()}
    assert a == b
    ma = lake.table("t_bucketed").current().metrics
    mb = lake.table("t_join").current().metrics
    for k in ("rows_inserted", "rows_updated", "rows_deleted"):
        assert ma[k] == mb[k], (k, ma, mb)


def test_mor_merge_semantics(spark, warehouse):
    """merge-on-read: append-only writes, resolve-on-read LWW, compaction
    preserves state, delete_where works on resolved data."""
    lake = SnapshotLake(spark, warehouse)
    t = lake.create_table("m", SCHEMA, ["key"], n_buckets=8, mode="mor")
    t.merge_upsert(spark.createDataFrame([("a", "A", 1), ("b", "B", 1)], SCHEMA), 0)
    t.merge_upsert(spark.createDataFrame([("b", "B2", 2), ("c", "C", 1)], SCHEMA), 1)
    assert rows(t) == {"a": ("A", 1), "b": ("B2", 2), "c": ("C", 1)}

    # delete marker
    batch = spark.createDataFrame(
        [("a", None, None, True), ("d", "D", 4, False)],
        T.StructType(SCHEMA.fields + [T.StructField("dl", T.BooleanType())]),
    )
    t.merge_upsert(batch, 2, delete_col="dl")
    assert rows(t) == {"b": ("B2", 2), "c": ("C", 1), "d": ("D", 4)}

    # appends only: base empty, deltas accumulate
    snap = t.current()
    assert snap.mode == "mor" and not snap.files and snap.delta_files

    # compaction folds deltas into base without changing state
    before = rows(t)
    m = t.compact()
    assert m["compacted_buckets"] > 0
    snap = t.current()
    assert snap.files and not snap.delta_files
    assert rows(t) == before

    # writes after compaction still resolve
    t.merge_upsert(spark.createDataFrame([("b", "B3", 3)], SCHEMA), 3)
    assert rows(t)["b"] == ("B3", 3)

    # create-only after compaction: existing row wins
    co = spark.createDataFrame(
        [("b", "NOPE", 9, True), ("e", "E", 5, True)],
        T.StructType(SCHEMA.fields + [T.StructField("co", T.BooleanType())]),
    )
    t.merge_upsert(co, 4, create_only_col="co")
    r = rows(t)
    assert r["b"] == ("B3", 3) and r["e"] == ("E", 5)

    # schema evolution additive on mor
    evolved = T.StructType(SCHEMA.fields + [T.StructField("extra", T.StringType())])
    t.merge_upsert(spark.createDataFrame([("f", "Fx", 6, "X")], evolved), 5)
    got = {x["key"]: x["extra"] for x in t.read().collect()}
    assert got["f"] == "X" and got["b"] is None

    # delete_where on resolved state
    m = t.delete_where(F.col("v") >= 5, max_delete_pct=0.9)
    assert m["rows_deleted"] == 2  # e(5), f(6)
    assert set(rows(t)) == {"b", "c", "d"}

    # exactly-once epoch replay on mor
    v = t.current().version
    m = t.merge_upsert(spark.createDataFrame([("zzz", "Z", 1)], SCHEMA), 5)
    assert "skipped_epoch" in m and t.current().version == v


def test_empty_merge_output_all_deleted(spark, warehouse):
    """ADVICE r01: a batch that deletes every row in the touched buckets
    (empty written plan) must not crash the Observation metrics path."""
    lake, t = _mk(spark, warehouse, n_buckets=4)
    t.merge_upsert(spark.createDataFrame([("a", "A", 1)], SCHEMA), 0)
    batch = spark.createDataFrame(
        [("a", None, None, True)],
        T.StructType(SCHEMA.fields + [T.StructField("d", T.BooleanType())]),
    )
    m = t.merge_upsert(batch, 1, delete_col="d")
    assert m["rows_deleted"] == 1 and m["rows_seen"] == 1
    assert t.read().count() == 0
    # replaying the next epoch over the emptied table still works
    m2 = t.merge_upsert(spark.createDataFrame([("b", "B", 2)], SCHEMA), 2)
    assert m2["rows_inserted"] == 1
    assert rows(t) == {"b": ("B", 2)}


def test_mor_delete_then_create_only_matches_cow(spark, warehouse):
    """ADVICE r01: a create-only row written AFTER a delete must re-create the
    key in mor mode exactly as in cow mode, before AND after compaction."""
    lake = SnapshotLake(spark, warehouse)
    got = {}
    for mode in ("cow", "mor"):
        t = lake.create_table(f"dc_{mode}", SCHEMA, ["key"], n_buckets=4, mode=mode)
        t.merge_upsert(spark.createDataFrame([("a", "v1", 1)], SCHEMA), 0)
        d = spark.createDataFrame(
            [("a", None, None, True)],
            T.StructType(SCHEMA.fields + [T.StructField("d", T.BooleanType())]),
        )
        t.merge_upsert(d, 1, delete_col="d")
        co = spark.createDataFrame(
            [("a", "v2", 2, True)],
            T.StructType(SCHEMA.fields + [T.StructField("co", T.BooleanType())]),
        )
        t.merge_upsert(co, 2, create_only_col="co")
        got[mode] = rows(t)
        t.compact()
        assert rows(t) == got[mode], f"{mode}: compaction changed state"
    assert got["cow"] == got["mor"] == {"a": ("v2", 2)}


def test_delete_wins_over_create_only_both_strategies(spark, warehouse):
    """ADVICE r01: a source row with both __del and __co set deletes the
    target row under every physical strategy."""
    lake = SnapshotLake(spark, warehouse)
    both = T.StructType(
        SCHEMA.fields
        + [T.StructField("d", T.BooleanType()), T.StructField("co", T.BooleanType())]
    )
    for strat in ("join", "bucketed"):
        t = lake.create_table(f"dco_{strat}", SCHEMA, ["key"], n_buckets=4)
        t.merge_upsert(spark.createDataFrame([("a", "v1", 1)], SCHEMA), 0, strategy=strat)
        b = spark.createDataFrame([("a", "v2", 2, True, True)], both)
        m = t.merge_upsert(b, 1, delete_col="d", create_only_col="co", strategy=strat)
        assert m["rows_deleted"] == 1, strat
        assert t.read().count() == 0, strat
    # and in mor mode
    t = lake.create_table("dco_mor", SCHEMA, ["key"], n_buckets=4, mode="mor")
    t.merge_upsert(spark.createDataFrame([("a", "v1", 1)], SCHEMA), 0)
    t.merge_upsert(
        spark.createDataFrame([("a", "v2", 2, True, True)], both),
        1, delete_col="d", create_only_col="co",
    )
    assert t.read().count() == 0


def test_duplicate_key_batch_fails_loudly(spark, warehouse):
    """ADVICE r01: MERGE multi-match is an error, not silent corruption."""
    lake, t = _mk(spark, warehouse, n_buckets=4)
    dup = spark.createDataFrame([("a", "v1", 1), ("a", "v2", 2)], SCHEMA)
    with pytest.raises(ValueError, match="duplicate keys"):
        t.merge_upsert(dup, 0, check_unique=True)


def test_concurrent_commit_cas(spark, warehouse):
    """ADVICE r04: the commit is a true compare-and-swap — two committers
    built on the same parent race to create the same v{N}.json and exactly
    one wins; the loser raises instead of silently clobbering."""
    import os

    lake, t = _mk(spark, warehouse, n_buckets=4)
    t.merge_upsert(spark.createDataFrame([("a", "A", 1)], SCHEMA), 0)
    # simulate committer B winning the race: the next version's manifest
    # appears between A's current() read and A's commit
    snap = t.current()
    stolen = os.path.join(t.meta_dir, f"v{snap.version + 1}.json")
    with open(stolen, "w") as f:
        f.write(snap.to_json())
    with pytest.raises(RuntimeError, match="concurrent commit"):
        t.merge_upsert(spark.createDataFrame([("b", "B", 1)], SCHEMA), 1)


def test_pointer_rollforward_after_crash(spark, warehouse):
    """A crash between manifest creation and the CURRENT swap must not lose
    the commit: manifest creation IS the commit point and readers roll the
    stale pointer forward."""
    import os

    lake, t = _mk(spark, warehouse, n_buckets=4)
    t.merge_upsert(spark.createDataFrame([("a", "A", 1)], SCHEMA), 0)
    v = t.current().version
    t.merge_upsert(spark.createDataFrame([("b", "B", 1)], SCHEMA), 1)
    # wind the pointer back to simulate the un-landed swap
    t.io.swap_pointer(os.path.join(t.meta_dir, "CURRENT"), f"v{v}")
    assert t.current().version == v + 1
    assert rows(t) == {"a": ("A", 1), "b": ("B", 1)}
    # next commit builds on the rolled-forward version, not the stale pointer
    t.merge_upsert(spark.createDataFrame([("c", "C", 1)], SCHEMA), 2)
    assert t.current().version == v + 2


def test_reopen_adopts_on_disk_buckets(spark, warehouse):
    """ADVICE r04: get-or-open with a defaulted n_buckets adopts the
    authoritative on-disk layout (warning), while mode/key_cols mismatches
    stay hard errors."""
    lake, t = _mk(spark, warehouse, n_buckets=4)
    with pytest.warns(UserWarning, match="n_buckets"):
        t2 = lake.create_table("t", SCHEMA, ["key"], n_buckets=64)
    assert t2.current().n_buckets == 4
    with pytest.raises(ValueError, match="different structure"):
        lake.create_table("t", SCHEMA, ["key"], n_buckets=4, mode="mor")
    with pytest.raises(ValueError, match="different structure"):
        lake.create_table("t", SCHEMA, ["name"], n_buckets=4)


def test_expire_snapshots_reclaims_dead_files(spark, warehouse):
    """Iceberg expire_snapshots + remove_orphan_files analog: old manifests
    drop, data files only kept manifests reference are deleted (post-grace),
    fresh orphans survive, and the current state is untouched."""
    import os

    lake, t = _mk(spark, warehouse, n_buckets=4)
    for e in range(6):
        t.merge_upsert(
            spark.createDataFrame([("a", f"v{e}", e), (f"k{e}", "X", e)], SCHEMA), e)
    before = rows(t)
    n_manifests = lambda: len(
        [f for f in os.listdir(t.meta_dir) if f.endswith(".json")])
    n_files = lambda: sum(
        len(fs) for _, _, fs in os.walk(t.data_dir))
    assert n_manifests() == 7  # v0..v6
    files_before = n_files()

    # a fresh orphan (simulating an in-flight commit's data file)
    orphan = os.path.join(t.data_dir, "inflight.parquet")
    with open(orphan, "w") as f:
        f.write("x")

    m = t.expire_snapshots(keep_last=2, orphan_grace_ms=3_600_000)
    assert m["expired_manifests"] == 5 and m["kept_manifests"] == 2
    assert os.path.exists(orphan)  # younger than the grace window
    assert rows(t) == before      # current state untouched
    assert n_manifests() == 2

    # past the grace window the orphan goes too
    m2 = t.expire_snapshots(keep_last=2, orphan_grace_ms=0)
    assert not os.path.exists(orphan)
    assert rows(t) == before
    # every remaining file is referenced by one of the KEPT manifests
    from amundsendatabuilder_spark.plans.lake import Snapshot
    referenced = set()
    for v in (t.current().version - 1, t.current().version):
        s = Snapshot.from_json(
            t.io.read(os.path.join(t.meta_dir, f"v{v}.json")))
        referenced |= {os.path.abspath(p)
                       for fl in s.files.values() for p in fl}
    on_disk = {os.path.abspath(os.path.join(r, f))
               for r, _, fs in os.walk(t.data_dir) for f in fs}
    assert on_disk == referenced
    assert n_files() < files_before
