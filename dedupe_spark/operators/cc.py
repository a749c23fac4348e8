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

Vertex-id compaction: callers pass string ids (sha256-hex file_ids ≈ 64
bytes); shuffling those every iteration costs ~8× the bytes of a long. So
non-integral ids are mapped to longs via ``xxhash64`` — a pure projection,
zero extra shuffles on the forward path — before the loop, and the final
label is re-resolved to the MINIMUM ORIGINAL id of each component
(component-scale shuffles only), so the output matches running the loop
on strings. Collision caveat: two vertices hashing to the same long would
merge their components; expected colliding pairs ≈ C(n,2)/2^64 (~3·10⁴
at n = 10^12 — noise against the F1 ≥ 0.99 gate, and only vertices that
appear in candidate edges are exposed at all). Exactness-critical callers
can pass ``compact=False``.

Determinism: the component label is the minimum file_id of the component —
stable across runs, partitionings, and resume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _propagate(sym: DataFrame, max_iterations: int) -> DataFrame:
    """Min-label loop over symmetric long-id edges → (vid, component)."""
    labels = (
        sym.select(F.col("src").alias("vid"))
        .distinct()
        .withColumn("component", F.col("vid"))
        .localCheckpoint(eager=True)
    )

    for _it in range(max_iterations):
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
        # sum over ZERO rows observes NULL (None), which must also stop the
        # loop — an empty edge set otherwise burns all max_iterations jobs
        if (obs.get["changed"] or 0) == 0:
            break

    return labels


def connected_components(
    edges: DataFrame,
    *,
    id1: str = "id1",
    id2: str = "id2",
    max_iterations: int = 50,
    compact: bool | None = None,
) -> DataFrame:
    """Return (file_id, component) for every vertex that appears in edges.

    Vertices not present in ``edges`` are simply absent — callers treat
    missing rows as singletons (cluster_id null), matching the reference's
    "groups require >=2 members" rule (duplicate_detector.py:88-89).

    ``compact=None`` (default) hashes string ids to longs for the loop
    (module docstring); integral ids always pass through unchanged.
    """
    e_str = edges.select(
        F.col(id1).alias("src"), F.col(id2).alias("dst")
    ).localCheckpoint(eager=True)
    # ^ materialize the edge set ONCE: the symmetric union below reads it
    # twice, which would otherwise recompute the caller's whole scoring
    # chain twice (narrow checkpoint — no shuffle).
    if compact is None:
        compact = not isinstance(e_str.schema["src"].dataType, _INTEGRAL)

    if compact:
        # xxhash64 is a projection — the forward mapping costs no shuffle
        e = e_str.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
    else:
        e = e_str

    # symmetric closure once; propagation then only needs one direction
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    sym = sym.repartition("src").localCheckpoint(eager=True)

    labels = _propagate(sym, max_iterations)

    if not compact:
        return labels.select(F.col("vid").alias("file_id"), "component")

    # map back and re-resolve the deterministic label: component =
    # min(original id) of the component (min-hash-long ≠ min-string in
    # general). verts derives from the checkpointed e_str (cheap rescan);
    # the groupBy/joins are component-scale, not edge-scale.
    verts = (
        e_str.select(F.col("src").alias("orig_id"))
        .union(e_str.select(F.col("dst").alias("orig_id")))
        .distinct()
        .select("orig_id", F.xxhash64("orig_id").alias("vid"))
    )
    with_orig = labels.join(verts.hint("shuffle_hash"), "vid").select(
        F.col("orig_id").alias("file_id"), F.col("component").alias("comp_l")
    )
    rep = with_orig.groupBy("comp_l").agg(F.min("file_id").alias("component"))
    return with_orig.join(rep.hint("shuffle_hash"), "comp_l").select(
        "file_id", "component"
    )
