"""Staleness removal — the CDC delete path for rows no longer published.

Spark re-expression of ``Neo4jStalenessRemovalTask``
(``databuilder/task/neo4j_staleness_removal_task.py:57-253``):

* stale = ``publish_tag != current_tag`` or ``updated_ms < now − ms_to_expire``
  (with the reference's 24 h minimum expiry guard, :49,84-94);
* **safety guard**: abort when any label would lose ≥ ``max_pct`` of its rows
  (default 5%, per-label overrides, :187-253) — here a single
  ``groupBy(label)`` over the table instead of N count queries;
* the batched ``DELETE ... LIMIT`` loop (:162-185) collapses into one
  set-based copy-on-write delete per table.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import functions as F

from amundsendatabuilder_spark.plans.lake import SnapshotTable

MIN_MS_TO_EXPIRE = 24 * 60 * 60 * 1000  # reference minimum, :49


def _stale_cond(current_tag: str | None, ms_to_expire: int | None, now_ms: int):
    if ms_to_expire is not None:
        if ms_to_expire < MIN_MS_TO_EXPIRE:
            raise ValueError(
                f"ms_to_expire {ms_to_expire} < minimum {MIN_MS_TO_EXPIRE} "
                "(reference guard: neo4j_staleness_removal_task.py:49)"
            )
        return F.col("updated_ms") < F.lit(now_ms - ms_to_expire)
    if current_tag is None:
        raise ValueError("need current_tag or ms_to_expire")
    return F.col("publish_tag") != F.lit(current_tag)


def remove_stale_nodes(
    table: SnapshotTable,
    current_tag: str | None = None,
    ms_to_expire: int | None = None,
    max_pct: float = 0.05,
    per_label_pct: dict[str, float] | None = None,
    target_labels: list[str] | None = None,
    now_ms: int | None = None,
) -> dict[str, Any]:
    """Delete stale graph nodes with the per-label percentage guard."""
    import time as _t

    now = now_ms or int(_t.time() * 1000)
    cond = _stale_cond(current_tag, ms_to_expire, now)
    if target_labels:
        cond = cond & F.col("label").isin(target_labels)

    # guard: per-label stale share (single scan)
    stats = (
        table.read()
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("total"), F.sum(cond.cast("long")).alias("stale"))
        .collect()
    )
    for r in stats:
        pct_limit = (per_label_pct or {}).get(r["label"], max_pct)
        if r["total"] and (r["stale"] or 0) / r["total"] >= pct_limit:
            raise RuntimeError(
                f"staleness guard: label {r['label']} would lose "
                f"{r['stale']}/{r['total']} ≥ {pct_limit:.0%} — aborting"
            )
    return table.delete_where(cond)


def remove_stale_relations(
    table: SnapshotTable,
    current_tag: str | None = None,
    ms_to_expire: int | None = None,
    max_pct: float = 0.05,
    now_ms: int | None = None,
) -> dict[str, Any]:
    import time as _t

    now = now_ms or int(_t.time() * 1000)
    cond = _stale_cond(current_tag, ms_to_expire, now)
    return table.delete_where(cond, max_delete_pct=max_pct, guard_group_col="type")
