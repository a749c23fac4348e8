"""Iterative hash-min connected components — DataFrame-only, no GraphFrames.

The reference folds similarity directly into greedy, order-dependent star
groups (/root/reference/duplicate_detector.py:39-103). That is neither
deterministic nor parallelizable; the target semantics (SURVEY.md §2.7) is
transitive closure over the match-edge graph, computed as iterative
min-label propagation:

    label(v) ← min(label(v), min over neighbors u of label(u))

repeated until fixpoint. Components here are duplicate families —
near-cliques with tiny diameter — so convergence is 2-4 iterations in
practice. Each iteration is one shuffle (groupBy id) + one join;
``localCheckpoint`` truncates lineage so the plan doesn't grow with the
iteration count (critical at scale: without it Catalyst re-derives the
whole chain every iteration).

Determinism: the component label is the minimum file_id of the component —
stable across runs, partitionings, and resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 50,
) -> DataFrame:
    """Return (file_id, component) for every vertex that appears in edges.

    Vertices not present in ``edges`` are simply absent — callers treat
    missing rows as singletons (cluster_id null), matching the reference's
    "groups require >=2 members" rule (duplicate_detector.py:88-89).
    """
    spark = edges.sparkSession
    e = edges.select(F.col(id1).alias("src"), F.col(id2).alias("dst"))
    # symmetric closure once; propagation then only needs one direction
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.repartition("src").localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .withColumn("component", F.col("vid"))
        .localCheckpoint(eager=True)
    )

    for it in range(max_iterations):
        # min label among self + neighbors.  shuffle_hash hint: both sides
        # are data-scale; AQE's size estimate of the checkpointed labels
        # frame can otherwise pick a driver-side broadcast and OOM (observed
        # at 10^6 labels / 8 GB driver).  Broadcasting an iterative frame is
        # wrong on a real cluster too — it re-ships every iteration.
        neighbor_labels = (
            sym.join(labels.hint("shuffle_hash"), sym.dst == labels.vid)
            .select(F.col("src").alias("vid"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor_labels)
            .groupBy("vid")
            .agg(F.min("component").alias("component"))
        )
        # convergence check piggybacks on the checkpoint materialization via
        # observe() — ONE action per iteration instead of two (the separate
        # changed-count job was half the loop's serial driver time)
        obs = Observation()
        flagged = (
            new_labels.join(
                labels.withColumnRenamed("component", "old_comp").hint(
                    "shuffle_hash"
                ),
                "vid",
            )
            .observe(
                obs,
                F.sum(
                    (F.col("component") != F.col("old_comp")).cast("long")
                ).alias("changed"),
            )
            .select("vid", "component")
        )
        labels = flagged.localCheckpoint(eager=True)
        if obs.get["changed"] == 0:
            break

    return labels.select(F.col("vid").alias("file_id"), "component")
