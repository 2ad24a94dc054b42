"""Publish-time relation preprocessors — desired-state deletes.

``DeleteRelationPreprocessor`` (``databuilder/publisher/neo4j_preprocessor.py:
120-200``) lets a publisher treat its batch as the DESIRED STATE for
configured label pairs: before merging, every existing relation between two
nodes whose (start_label, end_label) pair is configured is deleted (the
Cypher matches the pair UNDIRECTED and label tuples apply symmetrically,
:147-152,183-200), so relations the batch no longer carries disappear.

Spark-first translation: instead of per-row DELETE round trips, ONE set
computation — existing relations whose node PAIR the batch re-publishes
(either orientation, label pair configured) minus the keys the batch itself
carries — becomes the delete half of a single keyed MERGE. Note the scope is
the reference's: desired state per re-published node pair (stale relation
TYPES between those nodes die); pairs the batch does not mention survive. The delete and the upsert
commit in the same atomic manifest swap, which closes the delete-to-update
inconsistency window the reference documents as a caveat (:131-134).

The reference scopes this to small publish batches; the set form scales — the
pair semi-join shuffles only (existing ∩ batch-pairs) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def delete_relation_rows(
    existing: DataFrame,
    batch: DataFrame,
    label_tuples: list[tuple[str, str]],
    where: Column | None = None,
) -> DataFrame:
    """Existing relation rows to pre-delete for a desired-state publish of
    ``batch``: rows whose (start,end) node pair occurs in the batch (either
    orientation), whose label pair is configured (symmetric, :147-152), and
    whose key the batch does NOT re-publish. ``where`` optionally narrows the
    candidates (the reference's extra WHERE clause slot, :136-141)."""
    if not label_tuples:
        return existing.limit(0)
    pairs = set(label_tuples) | {(b, a) for a, b in label_tuples}
    pair_pred = F.lit(False)
    for sl, el in sorted(pairs):
        pair_pred = pair_pred | (
            (F.col("start_label") == sl) & (F.col("end_label") == el)
        )

    bp = (
        batch.where(pair_pred)
        .select("start_key", "end_key")
        .dropDuplicates(["start_key", "end_key"])
    )
    both = bp.unionByName(
        bp.select(F.col("end_key").alias("start_key"),
                  F.col("start_key").alias("end_key"))
    ).dropDuplicates(["start_key", "end_key"])

    cand = existing.where(pair_pred).join(both, ["start_key", "end_key"], "left_semi")
    if where is not None:
        cand = cand.where(where)
    # keys the batch re-publishes survive (the MERGE overwrites them anyway)
    return cand.join(
        batch.select("start_key", "end_key", "type"),
        ["start_key", "end_key", "type"],
        "left_anti",
    ).select("start_key", "end_key", "type", "start_label", "end_label",
             "reverse_type")


def desired_state_relation_batch(
    existing: DataFrame,
    batch: DataFrame,
    label_tuples: list[tuple[str, str]],
    where: Column | None = None,
) -> DataFrame:
    """The full MERGE input: batch upserts + pre-deletes, delete-flagged —
    feed to ``graph_relations.merge_upsert(..., delete_col='__delete')``."""
    dels = delete_relation_rows(existing, batch, label_tuples, where).withColumn(
        "__delete", F.lit(True)
    )
    return (
        batch.withColumn("__delete", F.lit(False))
        .unionByName(dels, allowMissingColumns=True)
    )
