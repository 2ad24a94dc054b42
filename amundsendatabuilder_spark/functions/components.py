"""Distributed connected components — dedup-cluster canonicalization.

Near-dup pair generators (``dedup.minhash_lsh_candidates``,
``dedup.simhash_near_pairs``, ``similarity.embedding_neardup_pairs``)
emit EDGES; turning "A~B, B~C" into "keep one doc per cluster" needs the
transitive closure.  This module computes per-node component labels
(the minimum node id reachable) with the alternating large-star /
small-star algorithm of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SOCC'14): each round is two shuffle-joins on the
edge list, and the edge set collapses toward star graphs in
O(log n) rounds REGARDLESS of graph diameter — unlike naive min-label
propagation, whose round count is the diameter (fatal on chain-shaped
dup clusters at 100 TB).  No driver-side state: the edge list stays a
DataFrame end to end; per-round convergence is checked with a single
count+checksum aggregate, and ``localCheckpoint`` truncates the lineage
so round N's plan does not replay rounds 1..N-1.

The reference has no graph-clustering operator (its dedup is the
first-writer-wins set in ``databuilder/models/table_metadata.py:232-234``);
this is one of the training-data-pipeline extensions, verified against a
DuckDB recursive-CTE transitive-closure oracle and a hypothesis
property test vs union-find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _digest(edges: DataFrame) -> tuple[int, int]:
    """Cheap fixpoint check: (row count, order-independent checksum)."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("u"), F.col("v"))), F.lit(0)
        ).alias("chk"),
    ).first()
    return int(row["n"]), int(row["chk"])


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the
    minimum of the neighborhood (incl. u).  Emitted edges point DOWN
    (src > dst)."""
    nbr = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = nbr.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    return (
        nbr.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Input edges point down (u > v).  For each node u: link u and all
    its smaller neighbors to the minimum neighbor."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    joined = edges.join(mins, "u")
    relink = (
        joined.where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = mins.select("u", F.col("m").alias("v"))
    return relink.unionAll(self_link).distinct()


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 50,
    max_edges: int | None = None,
) -> DataFrame:
    """Component label (minimum reachable node id) for every node that
    appears in ``edges``.  Returns ``(node, component)``, one row per
    distinct node.

    Each round runs large-star then small-star (two groupBy+join passes
    over the current edge list, both hash-partitioned on the node key —
    AQE coalesces as the edge set shrinks) and stops when the edge set
    reaches a fixpoint: at that point every edge is (node, root).

    ``max_edges`` is the blast-radius guard for adversarial inputs: a
    pathological pair generator (e.g. a degenerate LSH band where every
    doc collides) can emit O(n²) edges before CC ever runs — fail loudly
    with the measured count instead of grinding the cluster (the same
    contract as ``dedup.simhash_near_pairs(max_candidate_pairs=...)``).
    """
    src_t = edges.schema[src].dataType
    dst_t = edges.schema[dst].dataType
    if src_t != dst_t:
        # a silent cast here would NULL out unparseable ids and make the
        # whole dedup a no-op — fail loudly instead (string/UUID ids work
        # fine: the algorithm only needs an ordering on node ids)
        raise TypeError(
            f"connected_components: src/dst types differ ({src_t} vs "
            f"{dst_t}); cast them to a common orderable type first"
        )
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = _digest(e)
    if max_edges is not None and prev[0] > max_edges:
        raise ValueError(
            f"connected_components: {prev[0]} distinct edges exceed "
            f"max_edges={max_edges} — the upstream pair generator is "
            f"pathological (near-all-pairs); tighten its blocking/threshold"
        )
    for _ in range(max_rounds):
        e_next = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _digest(e_next)
        e = e_next
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds"
        )
    # Fixpoint edges are (node, root); roots only appear on the dst side.
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionAll(e.select(F.col("v").alias("node"), F.col("v").alias("component")))
        .distinct()
    )


def canonical_per_component(
    components: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    prefer: list[str] | None = None,
) -> DataFrame:
    """Pick ONE canonical document per dedup cluster: the member ranking
    highest on ``prefer`` (descending, e.g. ``["n_chars"]`` = keep the
    longest), ties broken by smallest id.  Returns
    ``(component, canonical_id, n_docs)`` — the keep-list a dedup
    pipeline joins back against to drop the rest.

    One hash join (components ⋈ docs on the id) and one window over the
    component key; cluster sizes are tiny after near-dup blocking, so
    the window never sees skewed partitions.
    """
    from pyspark.sql import Window

    prefer = prefer or []
    joined = components.join(
        docs.select(F.col(id_col).alias("node"), *prefer), "node")
    w = Window.partitionBy("component").orderBy(
        *[F.col(c).desc() for c in prefer], F.col("node").asc())
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .groupBy("component")
        .agg(
            F.max(F.when(F.col("_rn") == 1, F.col("node"))).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
