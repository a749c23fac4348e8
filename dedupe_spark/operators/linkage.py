"""Fuzzy record linkage over structured entity tables.

The classic record-linkage pipeline (Fellegi & Sunter JASA'69; Christen,
"Data Matching", 2012) applied to a structured table instead of raw
document text: **blocking → pairwise comparison → threshold →
transitive clustering**. This generalizes the engine's document dedup
strategies (which block on content fingerprints) to entity records whose
identity is spread across typed attributes — the reference's
duplicate-group semantics (duplicate_detector.py:60-101: groups of >= 2,
deterministic representative) over a `(key, attributes...)` table.

Scale design (10^12-record posture, mirroring `blocking.py`):

- Blocking is a plain shuffle on the block key — no all-pairs path
  exists. Within-block pairing is a self-equi-join with `id1 < id2`
  orientation, so Catalyst plans a shuffled hash/sort-merge join keyed
  on the block, never a cartesian.
- Skew guard: block sizes are counted with a partial aggregation first;
  blocks over ``max_block`` are excluded from pairing via a broadcast
  anti-join (the `_df_cap` pattern, dedup.py) — a single hot block (the
  "NULL city" block of ER folklore) can otherwise contribute O(s^2)
  pairs and dominate the job. Dropped blocks are reported, not silent.
- Comparison is JVM-side only: ``F.levenshtein`` is a codegen'd Catalyst
  expression, so the score never leaves Tungsten rows — zero Python in
  the hot path.
- Clustering reuses :func:`dedupe_spark.operators.cc.connected_components`
  (large-star/small-star, Kiveris SoCC'14).

Why edit distance and not Jaccard here: entity attributes (names, codes)
are short strings where token shingles degenerate; Levenshtein is the
standard comparison for such fields (Christen ch. 5) and is exactly
reproducible in the DuckDB oracle (`levenshtein`), which gives the
operator a value-level correctness gate rather than a rows-only one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dedupe_spark.operators.cc import (
    connected_components,
    partitioned_components,
)

# Default per-block pairing cap. 10_000 rows in one block is ~5*10^7
# comparisons for that block alone — already past the point where the
# block key has stopped discriminating and the right fix is a better
# key, not more compute. Same philosophy as blocking.py's bucket cap.
DEFAULT_MAX_BLOCK = 10_000

# Default sorted-neighborhood window for over-cap blocks: a block whose
# key stopped discriminating still gets O(n·w) candidates instead of
# zero (Hernández & Stolfo's sliding window, applied as the skew
# DEGRADATION path rather than the primary blocker).
DEFAULT_HOT_BLOCK_WINDOW = 20


def candidate_pairs(
    df: DataFrame,
    *,
    id_col: str,
    block_cols: list[str],
    compare_col: str,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    hot_block_window: int | None = DEFAULT_HOT_BLOCK_WINDOW,
) -> DataFrame:
    """Within-block candidate pairs with the comparison attribute on
    both sides: (id1, id2, left_val, right_val, *block_cols,
    from_hot_block), id1 < id2.

    ``max_block=None`` disables the skew guard (small curated inputs
    only — never at corpus scale). Blocks OVER the cap are not dropped
    (the r4 recall cliff): their records are routed through
    :func:`sorted_neighborhood_pairs` sorted by (block, value) —
    O(n·w) candidates for a hot block of n rows, so the pathological
    "NULL city" block degrades to a sliding-window comparison instead
    of silently losing every match. Seam pairs where the sliding
    window crosses a block boundary are filtered, preserving the
    "edges never cross a block" invariant. ``hot_block_window=None``
    restores the hard-drop behavior (over-cap records get no pairs).

    ``from_hot_block`` is a per-branch LITERAL, so a downstream filter
    on it constant-folds through the union and prunes the other
    branch's whole subtree — callers routing hot edges to a different
    clustering strategy pay zero extra scans.
    """
    keyed = df.select(
        F.col(id_col).alias("_rid"),
        F.col(compare_col).alias("_val"),
        *[F.col(c) for c in block_cols],
    ).filter(F.col("_rid").isNotNull() & F.col("_val").isNotNull())

    hot_pairs = None
    if max_block is not None:
        # partial-agg block census; the over-cap set is tiny by
        # construction (it's the pathological tail), so broadcast it.
        # Materialized ONCE (eager narrow checkpoint, runs at plan-build
        # time): both the cold anti-join and the hot fallback reuse the
        # result instead of re-running the census per branch, and the
        # empty census skips the whole fallback subtree — the common
        # no-hot-block case pays one aggregation, nothing else
        # (measured: the un-checkpointed form cost ~10% at 2M rows).
        hot = (
            keyed.groupBy(*block_cols)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block)
            .select(*block_cols)
        ).localCheckpoint(eager=True)
        cold = keyed.join(F.broadcast(hot), block_cols, "left_anti")
        if hot_block_window is not None and not hot.isEmpty():
            hot_rows = keyed.join(F.broadcast(hot), block_cols, "left_semi")
            hot_pairs = _hot_block_snm_pairs(
                hot_rows,
                block_cols=block_cols,
                window=hot_block_window,
            )
        keyed = cold

    a = keyed.select(
        *[F.col(c) for c in block_cols],
        F.col("_rid").alias("id1"),
        F.col("_val").alias("left_val"),
    )
    b = keyed.select(
        *[F.col(c) for c in block_cols],
        F.col("_rid").alias("id2"),
        F.col("_val").alias("right_val"),
    )
    # block cols ride along: downstream clustering exploits the fact that
    # edges never cross a block (partitioned_components)
    out = (
        a.join(b, block_cols)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            "left_val",
            "right_val",
            *block_cols,
            F.lit(False).alias("from_hot_block"),
        )
    )
    if hot_pairs is not None:
        out = out.unionByName(hot_pairs)
    return out


def _hot_block_snm_pairs(
    hot_rows: DataFrame, *, block_cols: list[str], window: int
) -> DataFrame:
    """Sorted-neighborhood candidates WITHIN over-cap blocks.

    One distributed rank over all hot rows sorted by (block, value, id)
    — blocks are contiguous in that order, so a w-window pass yields
    within-block near-value pairs; the ≤ w-1 seam pairs per block
    boundary are dropped by the block-equality filter. Output matches
    :func:`candidate_pairs`' schema with ``from_hot_block = True``;
    pairs are re-oriented to the id1 < id2 convention (SNM orients by
    rank, which follows the VALUE sort, not id order)."""
    snm = sorted_neighborhood_pairs(
        hot_rows.select("_rid", "_val", *block_cols),
        id_col="_rid",
        sort_cols=[*block_cols, "_val"],
        window=window,
        carry_sort_cols=True,
    )
    same_block = F.lit(True)
    for c in block_cols:
        same_block = same_block & (F.col(f"l_{c}") == F.col(f"r_{c}"))
    swap = F.col("id1") > F.col("id2")
    return snm.filter(same_block).select(
        F.least("id1", "id2").alias("id1"),
        F.greatest("id1", "id2").alias("id2"),
        F.when(swap, F.col("r__val")).otherwise(F.col("l__val")).alias(
            "left_val"
        ),
        F.when(swap, F.col("l__val")).otherwise(F.col("r__val")).alias(
            "right_val"
        ),
        *[F.col(f"l_{c}").alias(c) for c in block_cols],
        F.lit(True).alias("from_hot_block"),
    )


def score_pairs(
    pairs: DataFrame, *, max_distance: int, carry: list[str] | None = None
) -> DataFrame:
    """Levenshtein-score candidate pairs, keep edges within threshold.

    ``F.levenshtein(l, r, threshold)`` (Spark 3.5+) early-exits the DP
    once the distance provably exceeds the bound — O(threshold * len)
    instead of O(len^2) per pair, which matters when blocks pair long
    attribute strings. Over-threshold pairs come back as **-1**, not a
    big number, so the keep-filter must be two-sided.

    ``carry`` columns (e.g. the block key) pass through untouched.
    """
    return pairs.select(
        "id1",
        "id2",
        F.levenshtein("left_val", "right_val", max_distance).alias(
            "distance"
        ),
        *(carry or []),
    ).filter(F.col("distance").between(0, max_distance))


def score_pairs_jw(
    pairs: DataFrame,
    *,
    min_similarity: float,
    carry: list[str] | None = None,
) -> DataFrame:
    """Jaro–Winkler-score candidate pairs, keep edges at or above the
    similarity floor. The ER-standard comparator for name fields
    (Winkler 1990); Arrow-batched pandas UDF since Spark has no built-in
    JW expression — see :mod:`dedupe_spark.functions.strsim` for the
    pinned DuckDB-compatible semantics. Null values score null and are
    dropped by the floor filter."""
    from dedupe_spark.functions.strsim import jaro_winkler_udf

    if not 0.0 < min_similarity <= 1.0:
        raise ValueError(
            f"min_similarity must be in (0,1], got {min_similarity}"
        )
    return pairs.select(
        "id1",
        "id2",
        jaro_winkler_udf("left_val", "right_val").alias("similarity"),
        *(carry or []),
    ).filter(F.col("similarity") >= min_similarity)


def link_records(
    df: DataFrame,
    *,
    id_col: str,
    block_cols: list[str],
    compare_col: str,
    max_distance: int = 2,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    hot_block_window: int | None = DEFAULT_HOT_BLOCK_WINDOW,
    must_link: DataFrame | None = None,
    cannot_link: DataFrame | None = None,
    cannot_link_mode: str = "edge",
) -> DataFrame:
    """Full linkage: every input record → (id, cluster_id, cluster_size,
    is_representative). Singletons get cluster_id null (the reference's
    "groups require >= 2 members" rule); the representative is the
    cluster-min id, the reference's deterministic-survivor convention.

    ``must_link`` / ``cannot_link`` inject curated (id1, id2) pair
    overrides via :func:`apply_constraints`. A must-link pair may cross
    blocks, so the constrained path clusters with the GLOBAL iterative
    CC instead of the per-block solver — constraints cost the O(log n)
    star rounds; leave them None on the pure-blocked fast path.

    ``cannot_link_mode`` picks the constraint contract:

    - ``"edge"`` (default, fast): the direct edge is severed, but an
      indirect path may still co-cluster the pair (documented loudly in
      :func:`apply_constraints`).
    - ``"closure"``: the pair is guaranteed separated — violated
      components are re-split with :func:`constrained_components`
      (greedy constrained Kruskal: the lowest-evidence edge on every
      connecting path is cut, evidence = Levenshtein distance).
      Must-link edges enter with the strongest evidence but a union
      violating any cannot-link is skipped regardless (cannot wins).

    Over-cap blocks contribute sorted-neighborhood candidates (see
    :func:`candidate_pairs`); their edges are clustered with the global
    iterative CC, NOT the per-block solver — a hot block is exactly the
    block whose edge set must not land in one task. Components still
    never span a block, so the per-block and global labelings compose
    by disjoint union. The hot/cold split filters constant-fold through
    the candidate union (``from_hot_block`` is a branch literal), so
    the common no-hot-block case pays one empty-edge-set probe, never a
    second scan.
    """
    pairs = candidate_pairs(
        df,
        id_col=id_col,
        block_cols=block_cols,
        compare_col=compare_col,
        max_block=max_block,
        hot_block_window=hot_block_window,
    )
    if cannot_link_mode not in ("edge", "closure"):
        raise ValueError(
            f"cannot_link_mode must be 'edge' or 'closure', "
            f"got {cannot_link_mode!r}"
        )
    edges = score_pairs(
        pairs,
        max_distance=max_distance,
        carry=[*block_cols, "from_hot_block"],
    )
    if cannot_link is not None and cannot_link_mode == "closure":
        base = edges.select(
            "id1", "id2", F.col("distance").cast("double").alias("_evd")
        )
        if must_link is not None:
            base = base.unionByName(
                must_link.select(
                    F.least("id1", "id2").alias("id1"),
                    F.greatest("id1", "id2").alias("id2"),
                    F.lit(-1.0).alias("_evd"),
                )
            )
        comp = constrained_components(
            base, cannot_link, evidence_col="_evd", ascending=True
        )
    elif must_link is not None or cannot_link is not None:
        constrained = apply_constraints(
            edges.select("id1", "id2"),
            must_link=must_link,
            cannot_link=cannot_link,
        )
        comp = connected_components(constrained)
    elif max_block is not None:
        # single-pass blocking ⇒ no component crosses a block, and the
        # block cap bounds per-task memory ⇒ solve each block exactly in
        # one shuffle instead of O(log n) iterative star rounds (which
        # cost a checkpointed multi-shuffle job per round — the match
        # graph of near-identical entity names is chain-shaped, the
        # star rounds' worst case)
        comp = partitioned_components(
            edges.filter(~F.col("from_hot_block")), key_cols=block_cols
        )
        if hot_block_window is not None:
            hot_comp = connected_components(
                edges.filter(F.col("from_hot_block")).select("id1", "id2")
            )
            comp = comp.unionByName(hot_comp)
    else:
        comp = connected_components(edges.select("id1", "id2"))

    ids = df.select(F.col(id_col).alias("id")).filter(
        F.col("id").isNotNull()
    )
    out = ids.join(
        comp.withColumnRenamed("file_id", "id"), "id", "left"
    ).select("id", F.col("component").alias("cluster_id"))
    w = Window.partitionBy(F.coalesce(F.col("cluster_id"), F.col("id")))
    # keep = real cluster of >= 2 members; a closure-mode re-split can
    # isolate a node (all its edges cut), which must read as a singleton
    size = F.count("*").over(w)
    keep = F.col("cluster_id").isNotNull() & (size >= 2)
    return out.select(
        "id",
        F.when(keep, F.col("cluster_id")).alias("cluster_id"),
        F.when(keep, size).alias("cluster_size"),
        F.when(keep, F.col("id") == F.min("id").over(w)).alias(
            "is_representative"
        ),
    )


def global_rank(
    df: DataFrame,
    *,
    order_cols: list[str],
    n_partitions: int | None = None,
) -> DataFrame:
    """Dense 1-based global rank over a total order — distributed.

    A bare ``row_number() OVER (ORDER BY ...)`` collapses the whole table
    into ONE task (empty partitionBy), the classic global-sort
    scale-killer. Instead: range-partition on the order columns (ranges
    ascend with partition id), take ``row_number`` *within* each range
    partition, and add per-partition offsets computed from a P-row count
    aggregate — the only global window runs over those P rows, not the
    data. The offsets join-back is a broadcast.

    ``order_cols`` must be a TOTAL order (append a unique id as the last
    column) or ranks of tied rows are partition-placement-dependent.
    """
    from pyspark.sql import Window

    parts = n_partitions or df.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ranged = df.repartitionByRange(int(parts), *[F.col(c) for c in order_cols])
    # bind the physical partition id BEFORE any further exchange: the
    # projection materializes it at the range-exchange stage
    withpid = ranged.withColumn("_pid", F.spark_partition_id())
    counts = withpid.groupBy("_pid").agg(F.count("*").alias("_n"))
    # cumsum over <=P rows — the single-task window is over the partition
    # COUNT table, a few dozen rows, never the data
    offw = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_n").over(offw), F.lit(0)).alias("_off")
    )
    rnw = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        withpid.join(F.broadcast(offsets), "_pid")
        .withColumn("rank", F.row_number().over(rnw) + F.col("_off"))
        .drop("_pid", "_off")
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    *,
    id_col: str,
    sort_cols: list[str],
    window: int,
    carry_sort_cols: bool = False,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo SIGMOD'95):
    candidate pairs are records within ``window`` positions of each other
    in the global sort order — O(n·w) pairs total, the linear-output
    alternative to key blocking when near-duplicates sort adjacently
    (typos in the key tail, sequence-numbered ids).

    Pairs are produced by an **equi-join on w-sized rank buckets** (right
    side replicated to its own and the previous bucket, so every pair
    with rank distance 1..w-1 matches exactly once) — never an
    inequality-predicate join, which Catalyst could only plan as a
    cartesian. Per-row fan-out is a constant 2; output is (id1, id2,
    rank1, rank2, rank_distance) with id1's rank strictly smaller.

    The sort order is made total by appending ``id_col`` to
    ``sort_cols``, so results are deterministic under ties.
    ``carry_sort_cols=True`` adds ``l_<c>`` / ``r_<c>`` value columns so
    a comparison step can score pairs without joining the source back;
    ``carry_cols`` names ADDITIONAL non-sort columns to carry the same
    way (multi-field comparison without a source join-back).
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    extra = [c for c in (carry_cols or []) if c not in sort_cols]
    ranked = global_rank(
        df.select(
            F.col(id_col).alias("_sid"),
            *[F.col(c) for c in sort_cols],
            *[F.col(c) for c in extra],
        ),
        order_cols=[*sort_cols, "_sid"],
    )
    bucket = F.floor((F.col("rank") - 1) / window)
    carry = (sort_cols if carry_sort_cols else []) + extra
    left = ranked.select(
        bucket.alias("_bk"),
        F.col("_sid").alias("id1"),
        F.col("rank").alias("rank1"),
        *[F.col(c).alias(f"l_{c}") for c in carry],
    )
    right = ranked.select(
        F.explode(F.array(bucket, bucket - 1)).alias("_bk"),
        F.col("_sid").alias("id2"),
        F.col("rank").alias("rank2"),
        *[F.col(c).alias(f"r_{c}") for c in carry],
    )
    return (
        left.join(right, "_bk")
        .filter(
            (F.col("rank2") - F.col("rank1")).between(1, window - 1)
        )
        .select(
            "id1",
            "id2",
            "rank1",
            "rank2",
            (F.col("rank2") - F.col("rank1")).alias("rank_distance"),
            *[F.col(f"l_{c}") for c in carry],
            *[F.col(f"r_{c}") for c in carry],
        )
    )


def apply_constraints(
    edges: DataFrame,
    *,
    must_link: DataFrame | None = None,
    cannot_link: DataFrame | None = None,
) -> DataFrame:
    """Constraint-based ER (semi-supervised linkage, Wagstaff & Cardie
    2000 applied to ER; every production MDM system carries an override
    table): inject curated pair decisions into the edge set BEFORE
    clustering.

    - ``must_link`` (id1, id2) pairs are added as edges — a human-
      confirmed match survives any comparator miss;
    - ``cannot_link`` pairs are removed — a human-rejected match is
      dropped no matter how similar the records look. Orientation-
      insensitive on both (pairs are canonicalized before the union /
      anti-join).

    NOTE cannot-link is enforced on EDGES, not on the transitive
    closure: A~B and B~C still place A and C in one cluster even under
    cannot(A, C) — OPTIMAL closure-respecting cannot-link is NP-hard
    (correlation clustering); the edge-level contract is the fast,
    predictable compromise. For a guaranteed-separation contract use
    :func:`constrained_components` (greedy constrained Kruskal) or
    ``link_records(cannot_link_mode="closure")``; audit residual
    edge-mode violations with :func:`cluster_edge_stats`-style tooling.
    """

    def canon(df: DataFrame) -> DataFrame:
        return df.select(
            F.least("id1", "id2").alias("id1"),
            F.greatest("id1", "id2").alias("id2"),
        )

    out = canon(edges.select("id1", "id2"))
    if cannot_link is not None:
        out = out.join(canon(cannot_link), ["id1", "id2"], "left_anti")
    if must_link is not None:
        out = out.unionByName(canon(must_link)).distinct()
    return out


def constrained_components(
    edges: DataFrame,
    cannot_link: DataFrame,
    *,
    evidence_col: str | None = None,
    ascending: bool = True,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """Connected components under CLOSURE-level cannot-link constraints:
    a cannot-link pair is guaranteed to land in different output
    clusters even when an INDIRECT path connects it (A–C–B), which is
    what an MDM steward usually means — the edge-level contract of
    :func:`apply_constraints` only severs the direct edge.

    Optimal closure-respecting splitting is correlation clustering
    (NP-hard); this uses the standard greedy surrogate (constrained
    Kruskal, as in dedupe.io / constrained agglomerative clustering):
    within each violated component, re-add edges strongest-evidence
    first, skipping any union that would co-cluster a cannot-link pair
    — equivalently, the lowest-evidence edge on every connecting path
    is cut. ``evidence_col`` orders edges (``ascending=True`` means
    smaller = stronger, e.g. a distance; use False for similarities);
    ``None`` treats all edges equally and falls back to the
    deterministic (id1, id2) order.

    Scale shape: one unconstrained CC pass finds components; the
    cannot-link table (steward-curated, small) joins against the
    assignment to find VIOLATED components only — everything else keeps
    its label untouched. Violated components' edges + constraints are
    cogrouped per component and re-solved in one applyInPandas task
    each; per-task memory is one component's edge set, bounded by the
    caller's block cap exactly like :func:`partitioned_components`.
    Labels are component-min ids, so re-split labels can't collide with
    untouched ones (node sets are disjoint).

    Conflict rule: cannot-link beats everything, including an explicit
    must-link edge a caller may have injected upstream — a union that
    would violate any constraint is skipped no matter its evidence.
    """
    import pandas as pd

    ev = F.col(evidence_col) if evidence_col else F.lit(0)
    e = edges.select(
        F.least(id1, id2).alias("_e1"),
        F.greatest(id1, id2).alias("_e2"),
        (ev if ascending else -ev).cast("double").alias("_ev"),
    ).filter(F.col("_e1") != F.col("_e2"))
    cl = cannot_link.select(
        F.least(id1, id2).alias("_c1"), F.greatest(id1, id2).alias("_c2")
    ).distinct()

    comp = connected_components(e, id1="_e1", id2="_e2").localCheckpoint(
        eager=True
    )
    # violated components: both constraint endpoints share a label
    lab1 = comp.withColumnRenamed("file_id", "_c1").withColumnRenamed(
        "component", "_k1"
    )
    lab2 = comp.withColumnRenamed("file_id", "_c2").withColumnRenamed(
        "component", "_k2"
    )
    viol = (
        cl.join(lab1, "_c1")
        .join(lab2, "_c2")
        .filter(F.col("_k1") == F.col("_k2"))
        .select(F.col("_k1").alias("_vc"), "_c1", "_c2")
        .localCheckpoint(eager=True)
    )
    vcomps = viol.select("_vc").distinct()

    clean = comp.join(
        F.broadcast(vcomps.withColumnRenamed("_vc", "component")),
        "component",
        "left_anti",
    ).select("file_id", "component")

    # edges of violated components, labeled via one endpoint (edges never
    # cross components by construction)
    ve = (
        e.join(
            comp.withColumnRenamed("file_id", "_e1"), "_e1"
        )
        .join(
            F.broadcast(vcomps.withColumnRenamed("_vc", "component")),
            "component",
            "left_semi",
        )
        .select("component", "_e1", "_e2", "_ev")
    )
    vc = viol.select(
        F.col("_vc").alias("component"), "_c1", "_c2"
    )

    id_type = e.schema["_e1"].dataType
    out_schema = T.StructType(
        [
            T.StructField("file_id", id_type),
            T.StructField("component", id_type),
        ]
    )

    def solve(key, epdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if epdf.empty:
            return pd.DataFrame({"file_id": [], "component": []})
        epdf = epdf.sort_values(["_ev", "_e1", "_e2"], kind="mergesort")
        parent: dict = {}

        # NON-mutating find: path compression here would write through a
        # tentative union during the violation check, surviving the undo
        # and silently merging a forbidden pair (caught by the planted
        # flipped-evidence test). Components are block-cap-bounded, so
        # the uncompressed walk is fine.
        def find(x):
            while parent.get(x, x) != x:
                x = parent[x]
            return x

        forbidden = list(zip(cpdf["_c1"], cpdf["_c2"]))
        for a, b in zip(epdf["_e1"], epdf["_e2"]):
            ra, rb = find(a), find(b)
            if ra == rb:
                continue
            parent[max(ra, rb)] = min(ra, rb)
            if any(find(x) == find(y) for x, y in forbidden):
                del parent[max(ra, rb)]  # undo: violates a constraint
        nodes = pd.unique(pd.concat([epdf["_e1"], epdf["_e2"]]))
        roots = [find(x) for x in nodes]
        mins = pd.Series(nodes).groupby(roots).transform("min")
        return pd.DataFrame({"file_id": nodes, "component": mins})

    resolved = (
        ve.groupBy("component")
        .cogroup(vc.groupBy("component"))
        .applyInPandas(solve, schema=out_schema)
    )
    out = clean.unionByName(resolved)
    # singleton survivors of a split keep component == self; callers
    # treating component==file_id as singleton (link_records' null
    # cluster convention) need size-1 groups dropped — leave that to the
    # caller, matching connected_components' contract where every edge
    # endpoint appears.
    return out


def link_incremental(
    old_df: DataFrame,
    new_df: DataFrame,
    existing_assign: DataFrame,
    *,
    id_col: str,
    block_cols: list[str],
    compare_col: str,
    max_distance: int = 2,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> DataFrame:
    """Incrementally extend a :func:`link_records` result with a batch of
    new records — cost scales with the BATCH and the clusters it
    touches, not the corpus.

    Only new-vs-all pairs are generated (block equi-join of the batch
    against old ∪ new); prior clusters enter connected components as
    **star edges** ``(cluster_id, member)`` derived from
    ``existing_assign``, which preserve exactly the old connectivity —
    ``closure(star(old) ∪ new_edges) = closure(old_edges ∪ new_edges)``
    — so the result equals a one-shot ``link_records`` over the union
    (asserted by the two-batch == one-shot test). The CC input is
    labels-sized + batch-sized, never corpus-pairs-sized.

    Batch rows whose id already exists in ``old_df`` are dropped first
    (idempotent re-submission). The skew cap is enforced on the UNION's
    block census, matching the one-shot guard for blocks under the cap;
    a block that crosses the cap only via the batch suppresses NEW
    pairing there, while clusters already formed stand — linkage is
    monotone (clusters never unmerge), the production-ER convention.

    NOTE the incremental path does NOT apply the one-shot's hot-block
    SNM fallback (``candidate_pairs(hot_block_window=)``): within an
    over-cap block it generates no new pairs at all. Consequence: the
    two-batch == one-shot equivalence holds exactly only while every
    touched block stays under the cap — past it, the one-shot run finds
    the fallback's extra O(n·w) matches and the incremental run defers
    them to the next rebuild (the same compaction that fixes bucket-salt
    staleness; ``update_advice`` surfaces both signals).
    """
    from dedupe_spark.operators.cc import connected_components

    old_ids = old_df.select(F.col(id_col).alias("_oid"))
    batch = new_df.join(
        old_ids, new_df[id_col] == F.col("_oid"), "left_anti"
    )

    def keyed(df: DataFrame, is_new: bool) -> DataFrame:
        out = df.select(
            F.col(id_col).alias("_rid"),
            F.col(compare_col).alias("_val"),
            *[F.col(c) for c in block_cols],
            F.lit(is_new).alias("_is_new"),
        ).filter(F.col("_rid").isNotNull() & F.col("_val").isNotNull())
        for c in block_cols:
            out = out.filter(F.col(c).isNotNull())
        return out

    aug = keyed(old_df, False).unionByName(keyed(batch, True))
    if max_block is not None:
        hot = (
            aug.groupBy(*block_cols)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block)
            .select(*block_cols)
        )
        aug = aug.join(F.broadcast(hot), block_cols, "left_anti")

    left = aug.filter(F.col("_is_new")).select(
        *[F.col(c) for c in block_cols],
        F.col("_rid").alias("_lid"),
        F.col("_val").alias("left_val"),
    )
    right = aug.select(
        *[F.col(c) for c in block_cols],
        F.col("_rid").alias("_rrid"),
        F.col("_val").alias("right_val"),
        "_is_new",
    )
    # new-vs-old: every pair once (left is new, right old). new-vs-new:
    # orient by id so the pair appears exactly once.
    pairs = (
        left.join(right, block_cols)
        .filter(
            (~F.col("_is_new") & (F.col("_lid") != F.col("_rrid")))
            | (F.col("_is_new") & (F.col("_lid") < F.col("_rrid")))
        )
        .select(
            F.least("_lid", "_rrid").alias("id1"),
            F.greatest("_lid", "_rrid").alias("id2"),
            "left_val",
            "right_val",
        )
    )
    new_edges = score_pairs(pairs, max_distance=max_distance).select(
        "id1", "id2"
    )
    star = (
        existing_assign.filter(F.col("cluster_id").isNotNull())
        .filter(F.col("cluster_id") != F.col("id"))
        .select(F.col("cluster_id").alias("id1"), F.col("id").alias("id2"))
    )
    comp = connected_components(star.unionByName(new_edges))

    ids = (
        old_df.select(F.col(id_col).alias("id"))
        .unionByName(batch.select(F.col(id_col).alias("id")))
        .filter(F.col("id").isNotNull())
    )
    out = ids.join(
        comp.withColumnRenamed("file_id", "id"), "id", "left"
    ).select("id", F.col("component").alias("cluster_id"))
    w = Window.partitionBy(F.coalesce(F.col("cluster_id"), F.col("id")))
    return out.select(
        "id",
        "cluster_id",
        F.when(F.col("cluster_id").isNotNull(), F.count("*").over(w)).alias(
            "cluster_size"
        ),
        F.when(
            F.col("cluster_id").isNotNull(), F.col("id") == F.min("id").over(w)
        ).alias("is_representative"),
    )


def mutual_best_links(
    scored: DataFrame,
    *,
    score_col: str,
    id1: str = "id1",
    id2: str = "id2",
) -> DataFrame:
    """One-to-one linkage between two sources (the record-linkage mode
    where each left record may match at most one right record and vice
    versa — deduplicated master-file joins, Splink's link_only): keep a
    scored pair only when each side is the other's BEST candidate
    (mutual argmax; ties broken toward the smaller partner id, so the
    result is deterministic).

    Both argmaxes are ``min(struct(-score, partner))`` groupBys —
    partial-aggregating, no windows — followed by two semi-join-shaped
    equi-joins back onto the pair stream. Greedy mutual-best is the
    standard scalable surrogate for optimal bipartite matching
    (exact assignment is super-linear and global; mutual-best is one
    aggregation pass and local).
    """
    s = F.col(score_col)
    best_for_1 = scored.groupBy(id1).agg(
        F.min(F.struct((-s).alias("ns"), F.col(id2).alias("p")))["p"].alias(
            "_best2"
        )
    )
    best_for_2 = scored.groupBy(id2).agg(
        F.min(F.struct((-s).alias("ns"), F.col(id1).alias("p")))["p"].alias(
            "_best1"
        )
    )
    return (
        scored.join(best_for_1, id1)
        .filter(F.col(id2) == F.col("_best2"))
        .join(best_for_2, id2)
        .filter(F.col(id1) == F.col("_best1"))
        .drop("_best1", "_best2")
    )


def cluster_edge_stats(
    assignments: DataFrame, edges: DataFrame
) -> DataFrame:
    """Per-cluster edge statistics — the linkage-QA scorecard that
    separates tight (clique-like) clusters from chained ones
    (transitive-closure artifacts where A~B~C but A≁C, the classic
    false-merge smell; Splink's cluster metrics serve the same role).

    Returns one row per cluster of size >= 2: (cluster_id, n_members,
    n_edges, max_edges = C(n,2), density = edges/C(n,2), is_clique).
    Every edge's endpoints share a cluster by construction (edges at or
    above the linkage threshold), so one endpoint join suffices; the
    edge count and member count are both partial aggregations.
    """
    members = assignments.filter(F.col("cluster_id").isNotNull()).select(
        "id", "cluster_id"
    )
    sizes = members.groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    ecnt = (
        edges.join(
            members.withColumnRenamed("id", "id1").withColumnRenamed(
                "cluster_id", "_c"
            ),
            "id1",
        )
        .groupBy("_c")
        .agg(F.count("*").alias("n_edges"))
        .withColumnRenamed("_c", "cluster_id")
    )
    maxe = F.expr("n_members * (n_members - 1) / 2")
    return (
        sizes.join(ecnt, "cluster_id", "left")
        .select(
            "cluster_id",
            "n_members",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            maxe.cast("long").alias("max_edges"),
            F.round(F.coalesce("n_edges", F.lit(0)) / maxe, 6).alias(
                "density"
            ),
            (F.coalesce("n_edges", F.lit(0)) == maxe).alias("is_clique"),
        )
    )


def relational_evidence(
    pairs: DataFrame,
    relations: DataFrame,
    *,
    id_col: str = "id",
    neighbor_col: str = "neighbor",
) -> DataFrame:
    """Collective-ER evidence (Bhattacharya & Getoor, TKDD'07): augment
    candidate pairs with ``shared_neighbors`` — the number of distinct
    relation endpoints both records connect to (co-authors, co-purchased
    parts, shared addresses). Ambiguous attribute evidence plus strong
    relational overlap is the classic disambiguator attribute-only
    linkage can't express.

    CANDIDATE-DRIVEN on purpose: the count is computed by joining the
    relation table to the pair list on each side and matching neighbors
    — cost scales with |pairs|·degree, never with Σ C(df,2) over hot
    neighbors (the inverted-index direction would square the hottest
    neighbor's df; a co-purchase graph always has one such "bestseller").
    Pairs with no overlap keep ``shared_neighbors = 0``.
    """
    rel = relations.select(
        F.col(id_col).alias("_rid"), F.col(neighbor_col).alias("_nb")
    ).distinct()
    left = rel.withColumnRenamed("_rid", "id1")
    right = rel.withColumnRenamed("_rid", "id2")
    counts = (
        pairs.select("id1", "id2")
        .join(left, "id1")
        .join(right, ["id2", "_nb"])
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("shared_neighbors"))
    )
    return pairs.join(counts, ["id1", "id2"], "left").withColumn(
        "shared_neighbors",
        F.coalesce("shared_neighbors", F.lit(0)).cast("long"),
    )


def assignment_churn(
    old_assign: DataFrame, new_assign: DataFrame
) -> DataFrame:
    """Cluster-churn report between two assignment snapshots — the MDM
    audit for "what did this re-run / this batch do to my entities":
    per entity present in either snapshot, the old and new cluster plus
    a change class:

    - ``unchanged``    same cluster key on both sides (incl. singleton →
                       same singleton),
    - ``clustered``    singleton → member of a cluster,
    - ``unclustered``  cluster member → singleton,
    - ``moved``        different non-null cluster,
    - ``added`` / ``removed``  entity exists on only one side.

    Cluster identity is compared by the coalesced entity key
    (cluster_id or own id — the merge_clusters convention), so a cluster
    that merely absorbed members counts its old members ``unchanged``
    unless its min-id label changed (label stability is exactly what
    min-id labeling buys). One full-outer join on id; all else is a
    projection.
    """
    o = old_assign.select(
        F.col("id").alias("_id"),
        F.col("cluster_id").alias("old_cluster"),
        F.coalesce(F.col("cluster_id"), F.col("id")).alias("_ok"),
        F.lit(True).alias("_in_old"),
    )
    n = new_assign.select(
        F.col("id").alias("_id"),
        F.col("cluster_id").alias("new_cluster"),
        F.coalesce(F.col("cluster_id"), F.col("id")).alias("_nk"),
        F.lit(True).alias("_in_new"),
    )
    j = o.join(n, "_id", "full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("old_cluster").isNull() & F.col("new_cluster").isNotNull(),
            F.lit("clustered"),
        )
        .when(
            F.col("old_cluster").isNotNull() & F.col("new_cluster").isNull(),
            F.lit("unclustered"),
        )
        .when(F.col("_ok") == F.col("_nk"), F.lit("unchanged"))
        .otherwise(F.lit("moved"))
    )
    return j.select(
        F.col("_id").alias("id"),
        "old_cluster",
        "new_cluster",
        status.alias("status"),
    )


MERGE_RULES = ("min", "max", "longest", "mode")


def merge_clusters(
    df: DataFrame,
    assignments: DataFrame,
    *,
    id_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Survivorship / golden-record fusion (Christen 2012 ch. 6.11;
    Bleiholder & Naumann, "Data Fusion", CSUR'09): collapse each linked
    cluster to ONE merged record, resolving every attribute by rule.

    ``assignments`` is :func:`link_records` output (id, cluster_id, ...);
    singletons (cluster_id null) become their own entity, so the result
    is a complete deduplicated master table keyed by ``entity_id`` =
    coalesce(cluster_id, id). Rules per attribute:

    - ``min`` / ``max``  — plain extrema (nulls ignored, Spark agg rule)
    - ``longest``        — longest non-null string, ties broken toward
                           the smallest value (deterministic)
    - ``mode``           — most frequent non-null value, ties broken
                           toward the smallest value

    Plan shape: one groupBy covers count + min/max/longest (all are
    partial-aggregating — ``longest`` is min of a (-length, value)
    struct, which combines map-side like any min). Each ``mode`` column
    adds one (entity, value) partial-agg count plus an entity-scale
    join — frequency needs its own key, there is no single-pass form.
    Everything is JVM expressions; nothing leaves Tungsten rows.
    """
    for col, rule in rules.items():
        if rule not in MERGE_RULES:
            raise ValueError(
                f"rule for {col!r} must be one of {MERGE_RULES}, got {rule!r}"
            )

    ent = assignments.select(
        F.col("id").alias("_mid"),
        F.coalesce(F.col("cluster_id"), F.col("id")).alias("entity_id"),
    )
    joined = df.join(ent, F.col(id_col) == F.col("_mid")).drop("_mid")

    aggs = [F.count("*").alias("n_members")]
    mode_cols = []
    for col, rule in rules.items():
        if rule == "min":
            aggs.append(F.min(col).alias(col))
        elif rule == "max":
            aggs.append(F.max(col).alias(col))
        elif rule == "longest":
            aggs.append(
                F.min(
                    F.when(
                        F.col(col).isNotNull(),
                        F.struct(
                            (-F.length(col)).alias("nl"), F.col(col).alias("v")
                        ),
                    )
                )["v"].alias(col)
            )
        else:
            mode_cols.append(col)

    out = joined.groupBy("entity_id").agg(*aggs)
    for col in mode_cols:
        freq = (
            joined.filter(F.col(col).isNotNull())
            .groupBy("entity_id", col)
            .agg(F.count("*").alias("_cnt"))
            .groupBy("entity_id")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("_cnt")).alias("nc"), F.col(col).alias("v")
                    )
                )["v"].alias(col)
            )
        )
        out = out.join(freq, "entity_id", "left")
    return out


def blocking_metrics(
    df: DataFrame,
    *,
    truth_cols: list[str],
    block_cols: list[str],
) -> DataFrame:
    """Blocking-scheme evaluation (Christen 2012 ch. 7): one row with

    - ``reduction_ratio``   = 1 - candidate_pairs / total_pairs
    - ``pairs_completeness`` = true pairs co-blocked / true pairs
    - ``pairs_quality``      = true pairs co-blocked / candidate pairs

    where truth groups are rows agreeing on ``truth_cols`` and candidate
    pairs are rows agreeing on ``block_cols``. Computed entirely from
    group-size aggregations — sum over groups of C(s,2) — so NO pair set
    is ever materialized: three partial-agg shuffles regardless of how
    many pairs the scheme would generate. A true pair lands in the same
    block iff the two rows agree on truth AND block keys, so the covered
    count is the C(s,2) sum over (truth, block) composite groups.

    Pure declarative plan with ZERO joins: the three group-size scans are
    tagged and unioned, then a single global aggregation folds them into
    one row (``n_records`` = Σ s over truth groups = the row count, so no
    separate count scan is needed). Joining four 1-row aggregates on a
    literal key would plan as BroadcastNestedLoopJoin — harmless at 1 row
    but banned by the repo-wide plan gate, and the union shape is one
    stage shorter anyway.
    """

    def tagged(cols: list[str], kind: str) -> DataFrame:
        return (
            df.groupBy(*cols)
            .agg(F.count("*").alias("s"))
            .select(F.lit(kind).alias("kind"), F.col("s").cast("double"))
        )

    sizes = (
        tagged(truth_cols, "true")
        .unionByName(tagged(block_cols, "cand"))
        .unionByName(tagged(truth_cols + block_cols, "cov"))
    )

    def pair_sum(kind: str) -> F.Column:
        return F.coalesce(
            F.sum(
                F.when(F.col("kind") == kind, F.expr("s * (s - 1) / 2"))
            ),
            F.lit(0.0),
        )

    agg = sizes.agg(
        F.coalesce(
            F.sum(F.when(F.col("kind") == "true", F.col("s"))), F.lit(0.0)
        )
        .cast("bigint")
        .alias("n_records"),
        pair_sum("cand").alias("candidate_pairs"),
        pair_sum("true").alias("true_pairs"),
        pair_sum("cov").alias("covered_true_pairs"),
    )
    safe_div = lambda a, b: F.when(  # noqa: E731
        F.col(b) > 0, F.round(F.col(a) / F.col(b), 6)
    )
    return agg.select(
        "n_records",
        F.expr("n_records * (n_records - 1) / 2").alias("total_pairs"),
        "candidate_pairs",
        "true_pairs",
        "covered_true_pairs",
        F.when(
            F.col("n_records") > 1,
            F.round(
                1.0
                - F.col("candidate_pairs")
                / F.expr("n_records * (n_records - 1) / 2"),
                6,
            ),
        ).alias("reduction_ratio"),
        safe_div("covered_true_pairs", "true_pairs").alias(
            "pairs_completeness"
        ),
        safe_div("covered_true_pairs", "candidate_pairs").alias(
            "pairs_quality"
        ),
    )


def evaluate_blocking_schemes(
    df: DataFrame,
    *,
    truth_cols: list[str],
    schemes: dict[str, list[str]],
) -> DataFrame:
    """Blocking-scheme search (Christen ch. 7; the offline half of
    learned blocking à la Bilenko's Blocking-Scheme Learner): run
    :func:`blocking_metrics` for every candidate scheme and emit one
    labeled row each, so reduction ratio / completeness / quality are
    comparable on a single scorecard. Each scheme costs three group-size
    scans — still zero joins, zero pair materialization."""
    if not schemes:
        raise ValueError("schemes must be non-empty")
    out = None
    for name, block_cols in schemes.items():
        row = blocking_metrics(
            df, truth_cols=truth_cols, block_cols=block_cols
        ).select(F.lit(name).alias("scheme"), "*")
        out = row if out is None else out.unionByName(row)
    return out


def clustering_agreement(
    df: DataFrame,
    *,
    truth_col: str,
    pred_col: str,
) -> DataFrame:
    """Chance-corrected agreement between two clusterings of the same
    rows (Hubert & Arabie 1985): one row with pairwise precision /
    recall / F1, the Rand index, and the **adjusted Rand index** —
    the standard scorecard for judging a dedup/linkage clustering
    against gold labels.

    Everything reduces to three group-size sums — Σ C(s,2) over truth
    groups, predicted groups, and (truth, predicted) joint cells — so
    NO pair set is materialized: the tagged-union / single-fold pattern
    of ``blocking_metrics``, three partial-agg scans + one global
    aggregate, zero joins at any scale.

    Null labels group together under SQL GROUP BY semantics (one
    "null cluster" per side); pre-coalesce to row ids upstream if null
    means "unassigned singleton". ARI is null when the index is
    degenerate (denominator 0: both sides all-singletons or one
    all-encompassing cluster on each side).
    """

    def tagged(cols: list[str], kind: str) -> DataFrame:
        return (
            df.groupBy(*cols)
            .agg(F.count("*").alias("s"))
            .select(F.lit(kind).alias("kind"), F.col("s").cast("double"))
        )

    sizes = (
        tagged([truth_col], "true")
        .unionByName(tagged([pred_col], "pred"))
        .unionByName(tagged([truth_col, pred_col], "joint"))
    )

    def pair_sum(kind: str) -> F.Column:
        return F.coalesce(
            F.sum(
                F.when(F.col("kind") == kind, F.expr("s * (s - 1) / 2"))
            ),
            F.lit(0.0),
        )

    agg = sizes.agg(
        F.coalesce(
            F.sum(F.when(F.col("kind") == "true", F.col("s"))), F.lit(0.0)
        )
        .cast("bigint")
        .alias("n_items"),
        pair_sum("true").alias("true_pairs"),
        pair_sum("pred").alias("pred_pairs"),
        pair_sum("joint").alias("tp_pairs"),
    )
    total = F.expr("n_items * (n_items - 1) / 2")
    expected = F.col("true_pairs") * F.col("pred_pairs") / total
    max_index = (F.col("true_pairs") + F.col("pred_pairs")) / 2.0
    tn = (
        total
        - F.col("true_pairs")
        - F.col("pred_pairs")
        + F.col("tp_pairs")
    )
    safe = lambda num, den: F.when(den > 0, F.round(num / den, 6))  # noqa: E731
    precision = safe(F.col("tp_pairs"), F.col("pred_pairs"))
    recall = safe(F.col("tp_pairs"), F.col("true_pairs"))
    return agg.select(
        "n_items",
        "true_pairs",
        "pred_pairs",
        "tp_pairs",
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(
            (F.col("pred_pairs") > 0)
            & (F.col("true_pairs") > 0)
            & (F.col("tp_pairs") > 0),
            F.round(
                2.0
                * (F.col("tp_pairs") / F.col("pred_pairs"))
                * (F.col("tp_pairs") / F.col("true_pairs"))
                / (
                    F.col("tp_pairs") / F.col("pred_pairs")
                    + F.col("tp_pairs") / F.col("true_pairs")
                ),
                6,
            ),
        ).alias("f1"),
        safe(F.col("tp_pairs") + tn, total).alias("rand_index"),
        F.when(
            (F.col("n_items") > 1) & (max_index - expected != 0),
            F.round(
                (F.col("tp_pairs") - expected) / (max_index - expected), 6
            ),
        ).alias("ari"),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the entity table")
    p.add_argument("--id-col", required=True)
    p.add_argument("--block-cols", required=True, help="comma-separated")
    p.add_argument("--compare-col", required=True)
    p.add_argument("--max-distance", type=int, default=2)
    p.add_argument("--max-block", type=int, default=DEFAULT_MAX_BLOCK)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="link_records")
    link_records(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        block_cols=a.block_cols.split(","),
        compare_col=a.compare_col,
        max_distance=a.max_distance,
        max_block=a.max_block,
    ).orderBy(F.desc("cluster_size"), "id").show(20, truncate=40)
