"""The CDC pipeline — changelog micro-batches → graph + search-doc tables.

One ``foreachBatch`` application does, per micro-batch (epoch):

1. **LWW dedup** (``groupBy.max(struct)`` — map-side combine kills dup/skew).
2. split upserts vs deletes.
3. **diff against current state**: read the old entity rows for exactly the
   touched keys (bucket-pruned point lookup) and compute the exact child
   nodes/relations/docs that the new state no longer produces — these become
   delete rows. This replaces the reference's publish-then-reap staleness
   model with an exact incremental diff; the staleness task still exists for
   shared nodes and disaster recovery.
4. **MERGE** nodes, relations, search docs — derived tables first.
5. **MERGE the entity table LAST** — it is the epoch commit marker.

Exactly-once: each table keeps a per-channel epoch ledger inside its manifest
(commit & ledger swap atomically). Derived tables are merged strictly before
the entity table, and every derivation reads only (batch + entity-table
current state), so a crash anywhere leaves the system in a state where
replaying the same epoch recomputes byte-identical merges; tables that
already applied the epoch skip via their ledger. This is the engine-grade
version of the reference's commit-Kafka-offsets-only-after-publish
(``databuilder/extractor/kafka_source_extractor.py:116-131``).

Scale notes: every stage is either narrow (extraction, expansion) or shuffles
only batch-sized data (dedup, diff join, merge join of batch vs touched
buckets). Nothing reads the full table; per-epoch cost is proportional to the
batch's key footprint, not table size.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from amundsendatabuilder_spark.functions import keys as K
from amundsendatabuilder_spark.operators.dedup import lww_dedup_agg
from amundsendatabuilder_spark.operators.extract import extract_entities
from amundsendatabuilder_spark.operators.models import (
    NODE_SCHEMA,
    REL_SCHEMA,
    nodes_from_entities,
    relations_from_entities,
    validate_nodes,
    validate_relations,
)
from amundsendatabuilder_spark.operators.search_docs import DOC_SCHEMA, docs_from_entities
from amundsendatabuilder_spark.plans.lake import SnapshotLake
from amundsendatabuilder_spark.sources.changelog import CHANGELOG_SCHEMA

ENTITY_KEYS = ["repo", "path"]
NODE_KEYS = ["key", "label"]
REL_KEYS = ["start_key", "end_key", "type"]
DOC_KEYS = ["key"]


def _strip(schema, drop: set[str]):
    import pyspark.sql.types as T

    return T.StructType([f for f in schema.fields if f.name not in drop])


class CDCPipeline:
    def __init__(
        self,
        spark: SparkSession,
        warehouse: str,
        n_buckets: int = 64,
        cluster: str = K.CLUSTER,
        create_only_labels: tuple[str, ...] = (),
        parallel_prepare: bool | None = None,
        table_mode: str = "cow",
        compact_every: int = 8,
        compact_max_delta_files: int = 2,
    ):
        """``table_mode``: "cow" rewrites touched buckets per epoch (cheap
        reads); "mor" appends per epoch and resolves winners on read — the
        ingest-throughput shape for 10^10-event replays, with
        ``compact_every`` epochs folding deltas back into the base."""
        self.spark = spark
        self.cluster = cluster
        self.create_only_labels = create_only_labels
        self.table_mode = table_mode
        self.compact_every = compact_every
        self.compact_max_delta_files = compact_max_delta_files
        # concurrent prepares overlap the four merge job-chains into one wave
        # — a win whenever cores outnumber one chain's effective tasks
        # (measured: 38s vs 52s per 1M-event replay at local[32]); on narrow
        # sessions the contention outweighs the overlap
        if parallel_prepare is None:
            env = os.environ.get("SPARK_CDC_PARALLEL_PREPARE")
            if env is not None:
                parallel_prepare = env == "1"
            else:
                parallel_prepare = spark.sparkContext.defaultParallelism >= 16
        self.parallel_prepare = parallel_prepare
        self.lake = SnapshotLake(spark, warehouse)
        self.metrics_dir = os.path.join(warehouse, "_metrics")
        os.makedirs(self.metrics_dir, exist_ok=True)

        from amundsendatabuilder_spark.operators.extract import extract_entities as _x

        import pyspark.sql.types as T

        entity_schema = T.StructType(
            _x(spark.createDataFrame([], CHANGELOG_SCHEMA), cluster)
            .drop("op", "shard", "event_id")
            .schema.fields
            + [T.StructField("is_deleted", T.BooleanType())]
        )
        self.repo_files = self.lake.create_table(
            "repo_files", entity_schema, ENTITY_KEYS, n_buckets=n_buckets, mode=table_mode
        )
        self.graph_nodes = self.lake.create_table(
            "graph_nodes", _strip(NODE_SCHEMA, {"scope_key"}), NODE_KEYS, n_buckets=n_buckets, mode=table_mode
        )
        self.graph_relations = self.lake.create_table(
            "graph_relations", _strip(REL_SCHEMA, {"scope_key"}), REL_KEYS, n_buckets=n_buckets, mode=table_mode
        )
        self.search_documents = self.lake.create_table(
            "search_documents", DOC_SCHEMA, DOC_KEYS, n_buckets=n_buckets, mode=table_mode
        )

    # -- the foreachBatch body -------------------------------------------

    def apply_batch(self, batch: DataFrame, epoch_id: int) -> dict[str, Any]:
        t0 = time.time()
        dbg = os.environ.get("SPARK_CDC_DEBUG_TIMING")
        marks: list[tuple[str, float]] = []

        def mark(label: str) -> None:
            if dbg:
                marks.append((label, round(time.time() - t0, 1)))
                print(f"    [{epoch_id}] {label} @ {marks[-1][1]}s", flush=True)

        if self.repo_files.last_epoch("cdc") >= epoch_id:
            return {"epoch": epoch_id, "skipped": True}

        winners = lww_dedup_agg(batch, ENTITY_KEYS, ["event_ts", "commit"])
        winners = winners.localCheckpoint(eager=True)  # cut lineage; reused 4×
        mark("dedup+ckpt")

        # current ordering state for the touched keys — INCLUDING tombstones
        # (a deleted entity must keep winning against late stale events).
        # Narrow projection: the gate needs only the LWW ordering columns —
        # never drag `content` (the widest column) through this read.
        old_all = self.repo_files.read_for_keys(
            winners.select(*ENTITY_KEYS),
            columns=["event_ts", "commit", "is_deleted"],
        ).localCheckpoint(eager=True)
        mark("old_state+ckpt")

        # cross-batch LWW gate (north rule): a batch row takes effect ONLY if
        # its (event_ts, commit) beats the stored row's — batches may arrive
        # with older events after newer ones (file ordering, replays, multi
        # source), and an unconditional MERGE would resurrect stale state
        old_ord = old_all.select(
            *ENTITY_KEYS,
            F.col("event_ts").alias("__old_ts"),
            F.col("commit").alias("__old_commit"),
        )
        effective = (
            winners.join(old_ord, ENTITY_KEYS, "left")
            .where(
                F.col("__old_ts").isNull()
                | (
                    F.struct(F.col("event_ts"), F.col("commit"))
                    > F.struct(F.col("__old_ts"), F.col("__old_commit"))
                )
            )
            .drop("__old_ts", "__old_commit")
        )

        upserts = effective.where(F.col("op") != "delete")
        deletes = effective.where(F.col("op") == "delete").select(
            "repo", "path", "commit", "event_ts"
        )

        # each entity frame feeds 3 expansions (nodes/rels/docs) + diffs —
        # materialize once, expansions become cheap narrow projections
        new_entities = (
            extract_entities(upserts, self.cluster)
            .drop("op", "shard", "event_id")
            .localCheckpoint(eager=True)
        )
        mark("extract+ckpt")
        # diffs only for keys whose state actually changes; active rows only.
        # Second pruned read: expansion features but NOT content (expansions
        # run on extracted features; content is never re-read after ingest)
        feature_cols = [c for c in new_entities.columns if c not in ("content",)]
        old_entities = (
            self.repo_files.read_for_keys(
                effective.select(*ENTITY_KEYS),
                columns=feature_cols + ["is_deleted"],
            )
            .where(~F.col("is_deleted"))
            .drop("is_deleted")
            .withColumn("content", F.lit(None).cast("string"))
            .localCheckpoint(eager=True)
        )

        new_nodes = validate_nodes(nodes_from_entities(new_entities))
        new_rels = validate_relations(relations_from_entities(new_entities))
        old_nodes = validate_nodes(nodes_from_entities(old_entities))
        old_rels = validate_relations(relations_from_entities(old_entities))

        # exact child diff: scoped rows the old state produced but the new
        # state no longer does (covers shrunk entities AND deleted entities)
        node_dels = (
            old_nodes.where(F.col("scope_key").isNotNull())
            .join(new_nodes, NODE_KEYS, "left_anti")
            .select(*NODE_KEYS)
            .withColumn("__delete", F.lit(True))
        )
        rel_dels = (
            old_rels.where(F.col("scope_key").isNotNull())
            .join(new_rels, REL_KEYS, "left_anti")
            .select("start_key", "end_key", "type", "start_label", "end_label", "reverse_type")
            .withColumn("__delete", F.lit(True))
        )

        tag = f"epoch_{epoch_id}"
        node_batch = (
            new_nodes.drop("scope_key")
            .withColumn("__delete", F.lit(False))
            .unionByName(node_dels, allowMissingColumns=True)
            .withColumn(
                "__create_only",
                F.col("label").isin(list(self.create_only_labels))
                if self.create_only_labels
                else F.lit(False),
            )
        )
        rel_batch = (
            new_rels.drop("scope_key")
            .withColumn("__delete", F.lit(False))
            .unionByName(rel_dels, allowMissingColumns=True)
        )
        doc_dels = deletes.select(
            K.table_key(F.col("repo"), F.col("path"), self.cluster).alias("key")
        ).withColumn("__delete", F.lit(True))
        doc_batch = (
            docs_from_entities(new_entities)
            .withColumn("__delete", F.lit(False))
            .unionByName(doc_dels, allowMissingColumns=True)
        )
        # entity table keeps TOMBSTONES: a delete is an upsert of
        # (key, event_ts, commit, is_deleted=true) so the LWW gate keeps
        # holding against late stale events; vacuum_tombstones() reclaims
        # them once older than the lateness bound
        entity_batch = new_entities.withColumn("is_deleted", F.lit(False)).unionByName(
            deletes.withColumn("is_deleted", F.lit(True)), allowMissingColumns=True
        )

        # prepare all four merges CONCURRENTLY (one wave of Spark jobs — the
        # serial chain of four merge pipelines left most cores idle), then
        # commit manifests strictly in dependency order: derived tables
        # first, entity table LAST as the epoch commit marker (exactly-once).
        from concurrent.futures import ThreadPoolExecutor

        jobs = {
            "nodes": (self.graph_nodes, node_batch,
                      {"delete_col": "__delete", "create_only_col": "__create_only"}),
            "rels": (self.graph_relations, rel_batch, {"delete_col": "__delete"}),
            "docs": (self.search_documents, doc_batch, {"delete_col": "__delete"}),
            "entities": (self.repo_files, entity_batch, {}),
        }
        if self.parallel_prepare:
            with ThreadPoolExecutor(max_workers=4) as ex:
                futs = {
                    name: ex.submit(
                        tbl.prepare_upsert, b, epoch_id,
                        channel="cdc", publish_tag=tag, **kw,
                    )
                    for name, (tbl, b, kw) in jobs.items()
                }
                preps = {name: f.result() for name, f in futs.items()}
        else:
            preps = {
                name: tbl.prepare_upsert(
                    b, epoch_id, channel="cdc", publish_tag=tag, **kw
                )
                for name, (tbl, b, kw) in jobs.items()
            }
        mark("prepare_all")

        def _commit(name: str) -> dict:
            tbl = jobs[name][0]
            p = preps[name]
            if p is None:
                return {"skipped_epoch": epoch_id, "channel": "cdc"}
            return tbl.commit_prepared(p)

        m_nodes = _commit("nodes")
        m_rels = _commit("rels")
        m_docs = _commit("docs")
        m_ent = _commit("entities")
        mark("commit_all")

        if (
            self.table_mode == "mor"
            and self.compact_every
            and (epoch_id + 1) % self.compact_every == 0
        ):
            for tbl in (self.graph_nodes, self.graph_relations,
                        self.search_documents, self.repo_files):
                tbl.compact(max_delta_files=self.compact_max_delta_files)
            mark("compact")

        metrics = {
            "epoch": epoch_id,
            "wall_sec": round(time.time() - t0, 3),
            "repo_files": m_ent,
            "graph_nodes": m_nodes,
            "graph_relations": m_rels,
            "search_documents": m_docs,
        }
        with open(os.path.join(self.metrics_dir, f"epoch_{epoch_id}.json"), "w") as f:
            json.dump(metrics, f, sort_keys=True)
        return metrics

    # -- reads / maintenance ------------------------------------------------

    def current_entities(self) -> DataFrame:
        """Live (non-tombstoned) entity rows — the user-facing final state."""
        return self.repo_files.read().where(~F.col("is_deleted"))

    def vacuum_tombstones(self, older_than_ms: int) -> dict:
        """Physically drop delete tombstones whose last update is older than
        the out-of-orderness bound (safe: no event older than the bound can
        still arrive). The CDC analogue of the staleness expiry window."""
        import time as _t

        cutoff = int(_t.time() * 1000) - older_than_ms
        return self.repo_files.delete_where(
            F.col("is_deleted") & (F.col("updated_ms") < cutoff)
        )

    # -- runners ------------------------------------------------------------

    def replay_batches(self, chunk_paths: list[str], start_epoch: int = 0) -> list[dict]:
        """Batch-mode replay: one epoch per parquet chunk (resumable — applied
        epochs no-op via the ledger)."""
        out = []
        for i, p in enumerate(chunk_paths):
            df = self.spark.read.schema(CHANGELOG_SCHEMA).parquet(p)
            out.append(self.apply_batch(df, start_epoch + i))
        return out

    def run_stream(
        self,
        source_dir: str,
        checkpoint_dir: str,
        max_files_per_trigger: int = 1,
        available_now: bool = True,
    ):
        """Structured Streaming replay: file source + checkpointed offsets +
        the epoch ledger = exactly-once end to end. ``availableNow`` drains
        the backlog in micro-batches then stops (kill-resume safe)."""
        stream = (
            self.spark.readStream.schema(CHANGELOG_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(lambda df, eid: self.apply_batch(df, eid))
            .option("checkpointLocation", checkpoint_dir)
            .queryName("cdc_ingest")
        )
        if available_now:
            q = writer.trigger(availableNow=True).start()
        else:
            q = writer.start()
        return q
