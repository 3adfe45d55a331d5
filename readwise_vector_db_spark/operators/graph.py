"""Connected components over an edge DataFrame — dedup cluster resolution.

A near-duplicate pipeline emits PAIRS (exact-fingerprint groups, Jaccard
pairs, MinHash collisions, embedding-cosine pairs…); turning pairs into
a deduped corpus needs the transitive closure: the connected component
each document belongs to, so one canonical doc per component survives.
The reference has no such operator (it dedups nothing); this is part of
the repo's training-data north star.

Algorithm: min-label propagation with pointer jumping.

* propagation step — every vertex takes the minimum label over itself
  and its neighbours (one hash aggregation over the symmetric edge
  list: shuffle keyed on vertex id).
* pointer-jumping step — every vertex re-reads the label OF its label
  (``labels ⋈ labels``) and keeps the minimum.  This doubles the
  distance a small label travels per round, so convergence is
  O(log diameter) rounds instead of O(diameter) — the difference
  between 40 shuffles and 6 on a 100 TB corpus with chained
  near-duplicates (A≈B≈C≈… chains are common: successive crawl
  snapshots of the same page).

Each round is two shuffles (agg on vertex, self-join on label), both on
the same long key; AQE handles skew (a huge component funnels into its
min label's partition only for the label-table self-join, which is
|V|-sized, not |E|-sized).  Convergence is detected with a 1-row
checksum aggregate per round — the only driver-side data movement.

Every round ends in a lineage-truncating checkpoint: iterative plans
grow EXPONENTIALLY without truncation (the pointer-jumping self-join
doubles the logical plan per round — at round ~7 the plan string alone
crossed 2 GB and killed the driver), and persist() does not truncate
lineage, only caches results.  Local mode uses
``localCheckpoint(eager=True)``; pass ``checkpoint_dir=`` to use
reliable ``checkpoint()`` into HDFS/object storage instead, which
survives executor loss — what GraphX/GraphFrames do for exactly this
reason, and what a 1000-executor 100 TB run requires.

The DuckDB oracle for the suite entry computes the same closure with a
recursive CTE (reachability → MIN over reached ids), so the whole
operator is value-hash-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    distinct_edges: bool = True,
) -> DataFrame:
    """(id, component) for every vertex in ``edges``; component = min
    vertex id reachable through undirected edges.

    ``distinct_edges=False`` skips the dedup shuffle on the symmetric
    edge list.  Duplicate edges are CORRECT here regardless (every step
    is a min-aggregation, idempotent under input multiplicity) — the
    flag only trades the |E|-sized distinct shuffle against join fan-out
    in the propagation rounds.  Pass False when the caller knows the
    pair list is already duplicate-free (e.g. detectors emitting
    disjoint pair sets); at 100 TB that saves a full pass over the edge
    list.

    ``max_iter`` bounds the driver loop; with pointer jumping the label
    of the component minimum reaches every vertex in
    O(log diameter) rounds, so 25 covers any graph up to diameter
    ~2^25.  Raises if the loop fails to converge (never observed —
    a safety net, not a tunable).

    ``checkpoint_dir``: when given, per-round lineage truncation uses
    reliable ``checkpoint()`` into that directory (HDFS/object-store
    path on a real cluster) instead of ``localCheckpoint()``.
    localCheckpoint blocks are executor-memory/disk-resident — one lost
    executor mid-iteration kills the job at 100 TB; a reliable
    checkpoint survives executor loss at the cost of a write per round.
    """
    spark = edges.sparkSession
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

        def cut(df: DataFrame) -> DataFrame:
            # persist first: RDD checkpoint runs a SEPARATE job to write
            # the files, and without a cache that job recomputes the
            # whole plan a second time (the classic reliable-checkpoint
            # trap).  The cache is dropped as soon as the files are down
            # — the checkpointed data is the durable copy.
            df = df.persist()
            out = df.checkpoint(eager=True)
            df.unpersist()
            return out

    else:

        def cut(df: DataFrame) -> DataFrame:
            return df.localCheckpoint(eager=True)

    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull())
    )
    # symmetric closure once, up front.  persist(), not checkpoint: sym
    # is rescanned every round so it must be cached, but its lineage is
    # STATIC (one union over the input) — only the labels table's
    # lineage grows per round and needs truncation.  An eager checkpoint
    # here cost one extra materialization pass before the first real
    # action; on executor loss the shallow recompute is the right trade
    # even in reliable-checkpoint mode.
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    if distinct_edges:
        sym = sym.distinct()
    sym = sym.persist()
    # init = the first propagation round fused into label creation:
    # label(u) = min(u, min neighbour).  Star- and clique-shaped
    # components (the overwhelming dedup case) are at their fixpoint
    # immediately, so the loop's first iteration is already the
    # confirmation round.
    labels = cut(
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select(F.col("u").alias("id"), F.least("u", "mv").alias("label"))
    )

    # Convergence detection: labels are vertex ids that only ever
    # DECREASE (min over a set containing the current label), so the
    # total Σlabel strictly decreases whenever any vertex changed and is
    # exactly stable at the fixpoint — a 1-row aggregate per round, no
    # old-vs-new join.  (No overflow: Σ of ≤2^32 ids each <2^32 fits a
    # 64-bit sum with headroom; Spark sum(long) is exact.)
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    converged = False
    for it in range(max_iter):
        # 1) neighbour propagation: label(v) -> u for every edge (u,v)
        nbr = sym.join(labels, sym["v"] == labels["id"]).select(
            sym["u"].alias("id"), labels["label"]
        )
        prop = labels.unionByName(nbr).groupBy("id").agg(F.min("label").alias("label"))
        if it == 0:
            # The first loop pass is usually the CONFIRMATION round —
            # the fused init already fixpoints star/clique topologies
            # (the overwhelming dedup case) — so the pointer-jumping
            # self-join would compare a frame against itself for
            # nothing.  Skipping it here saves a join per run; on deep
            # chains it delays the doubling by at most one round.
            hop = prop
        else:
            # 2) pointer jumping: label(id) := min(label, label(label)).
            # prop is NOT checkpointed although it feeds both join
            # sides: its lineage is one shallow agg over checkpointed
            # inputs, and recomputing that beats a full
            # materialize+rescan per round.  The right side renames its
            # columns instead of using .alias(): self-joining a
            # checkpointed frame through alias() leaves both sides
            # sharing attribute ids, and the NEXT localCheckpoint dies
            # in attribute resolution ("key not found: id#N").
            right = prop.select(
                F.col("id").alias("r_id"), F.col("label").alias("r_label")
            )
            hop = prop.join(right, prop["label"] == right["r_id"], "left").select(
                prop["id"],
                F.least(
                    prop["label"], F.coalesce(right["r_label"], prop["label"])
                ).alias("label"),
            )
        labels = cut(hop)
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    return labels.select(F.col("id"), F.col("label").alias("component"))


def resolve_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    checkpoint_dir: str | None = None,
    distinct_edges: bool = True,
) -> DataFrame:
    """Dedup-pipeline face of :func:`connected_components`:
    (doc_id, cluster_id, cluster_size) for every doc in ≥1 pair, where
    ``cluster_id`` = the canonical (minimum) doc id of the component —
    the row a keep-one-per-cluster pass retains."""
    comp = connected_components(
        pairs,
        src=id_a,
        dst=id_b,
        max_iter=max_iter,
        checkpoint_dir=checkpoint_dir,
        distinct_edges=distinct_edges,
    )
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            F.col("cluster_size"),
        )
    )
