"""Incremental dedup — extend a completed run with a new batch of files.

The reference rescans and re-compares its whole directory every run; the
staged warehouse exists so we never have to. ``incremental_update``
appends a new batch to an existing run's checkpoints and recomputes only
what the new rows can change. Per-stage cost model (the 100-TB contract —
"batch" below means the appended rows plus the clusters they touch):

    fingerprints   batch-only Arrow UDF; anti-join on file_id for
                   idempotence; the batch is staged to a scratch table so
                   a crashed update can be replayed exactly
    exact          only sha groups CONTAINING a new sha are regrouped
                   (broadcast semi-join against the batch's sha set);
                   untouched rows are carried over with a scan, no shuffle
    buckets        append-only: band keys for reps that are NEW to the
                   bucket table (a rep change inside an old group can only
                   promote a new file, so the delta is batch-sized).
                   Dethroned reps' rows stay — stale rows are harmless
                   (they only add candidates inside the same exact group)
                   and removal would need a corpus-wide rewrite. Hot-bucket
                   salting stays consistent with the existing table via
                   ``lsh_bucket_delta``.
    candidates     batch bucket rows BROADCAST against a scan of the full
                   bucket table — the big side is never shuffled; bounded
                   per-(new file, band) linking as in the batch path.
                   Rep succession inside touched groups adds an explicit
                   (old_rep, new_rep) pair so the new rep provably inherits
                   the old rep's component (not just with high probability
                   through LSH collisions).
    edges          score only the new pairs against features PREFETCHED for
                   the pair endpoints (semi-join, batch-bounded) → append
    labels         connected components over star edges derived from the
                   OLD labels (component, file_id) ∪ the fresh edges — the
                   same components and min-ids as full CC over all edges,
                   but the input is labels-sized, star-shaped (diameter 2),
                   and converges in ~1 round
    assignment     rewritten only for AFFECTED files: members of touched
                   sha groups plus every file whose exact_rep sits in a
                   component containing a touched rep (whole clusters, so
                   representative re-election sees complete partitions);
                   untouched rows are carried over with an anti-join

The corpus-proportional residue is scans (column-pruned parquet) and the
narrow carried-over writes of exact/assignment — no corpus-wide shuffle,
no corpus-wide UDF work. On a lakehouse table format the carried-over
writes become partition-level commits; here they are plain parquet
rewrites, disclosed in BENCH/BASELINE.md.

Equivalence contract: because candidate recall is threshold-complete for
planted families (every true pair passes blocking + consensus), two-batch
incremental ingestion produces the same clusters as a one-shot run on the
union — asserted by tests/test_incremental.py against the golden oracle.

Crash safety: the batch is staged to ``{run_id}/fp_batch`` before the
fingerprint append and dropped only after the assignment commit. A retry
of a crashed update finds the scratch table non-empty and replays the
downstream stages from it; if the NEXT update carries a *different*
batch, the leftover scratch is folded into it (union on file_id) rather
than clobbered, so a crashed batch's rows always reach every downstream
stage no matter what is submitted next. The fingerprint append itself is
derived from the scratch (append = scratch ∖ fingerprints), which covers
both crash windows — before the append and after it — and every
downstream step is idempotent (exact regroup is deterministic, bucket
delta anti-joins already-bucketed reps, edge append anti-joins existing
edges, labels/assignment are deterministic replaces).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.functions.fingerprint import with_fingerprints
from dedupe_spark.operators.blocking import exact_groups, lsh_bucket_delta
from dedupe_spark.operators.cc import connected_components
from dedupe_spark.operators.representative import (
    order_cols_for,
    with_representative,
)
from dedupe_spark.operators.scoring import PAIR_FEATURES, score_pairs
from dedupe_spark.plans.staged import StagedPipeline
from dedupe_spark.sources.catalog import Catalog

# above this many affected file_ids, stop broadcasting the affected set and
# let the carried-over joins shuffle (a broadcast of tens of millions of
# string ids would strain the driver more than a narrow exchange)
_BROADCAST_AFFECTED_MAX = 2_000_000


def incremental_update(
    spark: SparkSession,
    new_files: DataFrame,
    cfg: PipelineConfig,
    *,
    catalog: Catalog | None = None,
) -> dict:
    """Append ``new_files`` to an existing completed run and refresh its
    cluster assignment. Returns per-stage row counts for the report,
    plus ``stage_seconds`` (wall time per stage — makes the batch-bounded
    vs corpus-bounded split measurable, not claimed).

    Requires the run's ``fingerprints`` checkpoint to exist (a fresh run
    should use ``StagedPipeline.run``).
    """
    pipe = StagedPipeline(spark, cfg, catalog)
    cat = pipe.catalog
    if not cat.exists(pipe._tbl("fingerprints")):
        raise ValueError(
            "incremental_update extends an existing run; fingerprints "
            "checkpoint missing — use StagedPipeline.run for the first batch"
        )

    counts: dict = {}
    stage_seconds: dict[str, float] = {}
    _t0 = time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t0
        now = time.perf_counter()
        stage_seconds[stage] = round(now - _t0, 3)
        _t0 = now

    fpb_tbl = pipe._tbl("fp_batch")

    # 1. fingerprint ONLY the new batch; stage it to a scratch table, then
    #    append rows whose file_id is not already present (re-submitting a
    #    batch must be a no-op, never a duplicate row)
    existing = cat.read(pipe._tbl("fingerprints")).select("file_id")
    fp_new = with_fingerprints(
        new_files,
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
        normalize=cfg.normalize,
    ).join(existing, "file_id", "left_anti")

    leftover = cat.exists(fpb_tbl) and (cat.rows(fpb_tbl) or 0) > 0
    if not fp_new.isEmpty():
        if leftover:
            # a PREVIOUS update crashed mid-run leaving a staged batch that
            # never reached the downstream stages. Fold it into this batch
            # (disjoint-or-identical rows, so dropDuplicates on file_id is
            # exact) instead of clobbering it — otherwise the crashed
            # batch's rows would sit in the fingerprints table but never
            # enter exact/buckets/edges/assignment. replace() handles the
            # scratch table appearing in its own input plan.
            merged = fp_new.unionByName(cat.read(fpb_tbl)).dropDuplicates(
                ["file_id"]
            )
            cat.replace(merged, fpb_tbl)
        else:
            cat.write(fp_new, fpb_tbl)
    elif not leftover:
        # true no-op (batch already fully applied): report current state
        counts["fingerprints_appended"] = 0
        for stage in ("exact", "buckets", "labels", "assignment"):
            counts[stage] = cat.rows(pipe._tbl(stage)) or 0
        counts["edges_total"] = cat.rows(pipe._tbl("edges")) or 0
        _mark("fingerprints")
        counts["stage_seconds"] = stage_seconds
        return counts
    # the staged batch (this batch ∪ any crashed predecessor) drives every
    # downstream stage; append whatever part of it the fingerprint table
    # does not already hold — covers BOTH crash windows (scratch committed
    # before the append vs after it). localCheckpoint breaks the lineage
    # on `existing` so the append never reads the table it writes.
    fpb = cat.read(fpb_tbl)
    to_append = fpb.join(existing, "file_id", "left_anti").localCheckpoint(
        eager=True
    )
    n_append = to_append.count()
    if n_append:
        cat.append(to_append, pipe._tbl("fingerprints"))
    counts["fingerprints_appended"] = n_append
    _mark("fingerprints")

    fp_all = cat.read(pipe._tbl("fingerprints"))

    # 2. exact tier over TOUCHED sha groups only. A new row can only change
    #    the groups of shas it introduces; everything else is carried over.
    touched_shas = fpb.select("content_sha").distinct()
    exact_old = cat.read(pipe._tbl("exact"))
    touched_rows = fp_all.join(
        F.broadcast(touched_shas), "content_sha", "left_semi"
    )
    # batch-bounded and reused by every stage below — materialize once
    eg_touched = exact_groups(touched_rows).localCheckpoint(eager=True)
    kept_exact = exact_old.join(
        F.broadcast(touched_shas), "content_sha", "left_anti"
    )
    counts["exact"] = cat.replace(
        kept_exact.unionByName(eg_touched), pipe._tbl("exact")
    )
    _mark("exact")

    # rep succession: if a new file dethrones a group's representative, link
    # old rep → new rep explicitly so the new rep inherits the component.
    # Derived from eg_touched + the batch (not the pre-replace exact table),
    # so a crash-retry reconstructs the same pairs deterministically:
    # old_rep = min(file_id) among the group's PRE-BATCH members.
    succ = (
        eg_touched.join(
            F.broadcast(fpb.select("file_id", F.lit(True).alias("_new"))),
            "file_id",
            "left",
        )
        .groupBy("content_sha")
        .agg(
            F.min("file_id").alias("new_rep"),
            F.min(F.when(F.col("_new").isNull(), F.col("file_id"))).alias(
                "old_rep"
            ),
        )
        .filter(
            F.col("old_rep").isNotNull() & (F.col("new_rep") != F.col("old_rep"))
        )
        .select(
            F.least("new_rep", "old_rep").alias("id1"),
            F.greatest("new_rep", "old_rep").alias("id2"),
            F.lit(0).cast("long").alias("n_bands"),
        )
    )

    # 3. append band keys for reps that are new to the bucket table. Only a
    #    batch file can become a new rep (old members' relative order never
    #    changes), so the delta is batch-sized. Anti-join against reps
    #    already bucketed keeps a crash-retry from double-appending.
    buckets_old = cat.read(pipe._tbl("buckets"))
    new_rep_ids = (
        eg_touched.filter(F.col("file_id") == F.col("exact_rep"))
        .select("file_id")
        .join(fpb.select("file_id"), "file_id", "left_semi")
    )
    already_bucketed = (
        buckets_old.join(F.broadcast(new_rep_ids), "file_id", "left_semi")
        .select("file_id")
        .distinct()
    )
    reps_to_bucket = fpb.join(new_rep_ids, "file_id", "left_semi").join(
        F.broadcast(already_bucketed), "file_id", "left_anti"
    )
    delta = lsh_bucket_delta(
        reps_to_bucket, buckets_old, bucket_salt=cfg.bucket_salt
    )
    cat.append(delta, pipe._tbl("buckets"))
    counts["buckets"] = cat.rows(pipe._tbl("buckets")) or 0
    _mark("buckets")

    # 4. candidates: the batch's bucket rows (broadcast — the corpus-sized
    #    bucket table is scanned, never shuffled) against ALL buckets;
    #    old-vs-old pairs are never regenerated. Same bounded per-(file,
    #    band) linking and Hamming prefilter as the batch path.
    #
    #    The partner side is pre-truncated per touched bucket to its
    #    top-(k+1) members by the SAME per-band order the batch path uses
    #    (xxhash64(file_id, band_id) — a value independent of which new
    #    file is asking). Every new member's k partners are therefore a
    #    subset of that global top-(k+1) (only the member itself is ever
    #    excluded), so the truncation is exact for the linking rule while
    #    cutting the join output from Σ bucket_n × delta_n rows to
    #    (k+1) × delta_n. Before this, a worst-case update (every family
    #    touched, bucket_n ≈ 200) materialized 200× more intermediate rows
    #    than it kept. The truncation itself is one window over the
    #    touched-bucket subset (left_semi on the delta's bucket keys —
    #    delta-bounded for realistic updates). Prefilter placement matches
    #    the batch path: link first, Hamming-kill after.
    buckets_all = cat.read(pipe._tbl("buckets"))
    nb = buckets_all.join(F.broadcast(new_rep_ids), "file_id", "left_semi")
    bucket_key = ["band_id", "band_hash", "salt"]
    delta_keys = nb.select(*bucket_key).distinct()
    wb = Window.partitionBy(*bucket_key).orderBy(
        F.xxhash64("file_id", "band_id"), "file_id"
    )
    ab_top = (
        buckets_all.join(F.broadcast(delta_keys), bucket_key, "left_semi")
        .withColumn("_rk", F.row_number().over(wb))
        .filter(F.col("_rk") <= cfg.neighbors_per_band + 1)
        .drop("_rk")
    )
    joined = ab_top.alias("ab").join(
        F.broadcast(nb.alias("nb")), bucket_key
    ).filter(F.col("nb.file_id") != F.col("ab.file_id"))
    w = Window.partitionBy("nb.file_id", "band_id").orderBy(
        F.xxhash64("ab.file_id", "band_id"), "ab.file_id"
    )
    # rank FIRST, Hamming-kill AFTER — the same order as the batch path
    # (candidate_pairs links k successors, then prefilters). Filtering
    # before the rank would admit the (k+1)-th member whenever a top-k
    # member fails Hamming, which both diverges from the batch rule and
    # breaks the ab_top truncation-exactness argument above (the selected
    # partners must be a function of the order alone).
    pairs = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cfg.neighbors_per_band)
    )
    if cfg.require_agreement >= 2:
        pairs = pairs.filter(
            F.bit_count(F.col("nb.simhash").bitwiseXOR(F.col("ab.simhash")))
            <= cfg.hamming_threshold
        )
    pairs = (
        pairs.groupBy(
            F.least(F.col("nb.file_id"), F.col("ab.file_id")).alias("id1"),
            F.greatest(F.col("nb.file_id"), F.col("ab.file_id")).alias("id2"),
        )
        .agg(F.count("*").alias("n_bands"))
        .unionByName(succ)
        .localCheckpoint(eager=True)
    )

    # 5. score only the new pairs, with pair-endpoint features prefetched by
    #    a semi-join (batch-bounded — score_pairs joins feature columns
    #    twice, which on the raw table would shuffle the corpus twice).
    pair_ids = (
        pairs.select(F.col("id1").alias("file_id"))
        .union(pairs.select(F.col("id2").alias("file_id")))
        .distinct()
    )
    feats = (
        fp_all.select("file_id", *PAIR_FEATURES)
        .join(pair_ids, "file_id", "left_semi")
        .localCheckpoint(eager=True)
    )
    new_edges = score_pairs(
        pairs,
        feats,
        hamming_threshold=cfg.hamming_threshold,
        jaccard_threshold=cfg.jaccard_threshold,
        require_agreement=cfg.require_agreement,
    ).filter("is_match")
    old_edges = cat.read(pipe._tbl("edges"))
    fresh = new_edges.join(
        old_edges.select("id1", "id2"), ["id1", "id2"], "left_anti"
    ).localCheckpoint(eager=True)
    cat.append(fresh, pipe._tbl("edges"))
    counts["edges_total"] = cat.rows(pipe._tbl("edges")) or 0
    _mark("edges")

    # 6. labels: CC over star edges from the OLD labels ∪ fresh edges. The
    #    stars encode the old partition exactly (center = component min and
    #    a member, so min-ids are preserved); adding the fresh edges makes
    #    CC(stars ∪ fresh) ≡ CC(old edges ∪ fresh) — with a labels-sized,
    #    diameter-2 input instead of the whole edge table.
    labels_old = cat.read(pipe._tbl("labels"))
    stars = labels_old.select(
        F.col("component").alias("id1"), F.col("file_id").alias("id2")
    )
    labels_new = connected_components(
        stars.unionByName(fresh.select("id1", "id2")),
        max_iterations=cfg.cc_max_iterations,
    )
    counts["labels"] = cat.replace(labels_new, pipe._tbl("labels"))
    _mark("labels")
    labels_new = cat.read(pipe._tbl("labels"))

    # 7. assignment: rewrite only AFFECTED files — members of touched sha
    #    groups, the whole component of every touched rep (so representative
    #    re-election always sees complete clusters), and the batch itself
    #    (errored rows included). Every fresh edge has a touched rep as an
    #    endpoint, so touched-rep components cover all merges.
    eg_all = cat.read(pipe._tbl("exact"))
    seeds = eg_touched.select(
        F.col("exact_rep").alias("file_id")
    ).distinct()
    touched_comps = (
        labels_new.join(F.broadcast(seeds), "file_id", "left_semi")
        .select("component")
        .distinct()
    )
    affected_reps = labels_new.join(
        F.broadcast(touched_comps), "component", "left_semi"
    ).select(F.col("file_id").alias("exact_rep"))
    affected = (
        eg_all.join(affected_reps, "exact_rep", "left_semi")
        .select("file_id")
        .union(eg_touched.select("file_id"))
        .union(fpb.select("file_id"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_affected = affected.count()
    counts["affected_files"] = n_affected
    aff = (
        F.broadcast(affected) if n_affected <= _BROADCAST_AFFECTED_MAX else affected
    )

    rep_label = labels_new.select(
        F.col("file_id").alias("exact_rep"), "component"
    )
    clus = (
        eg_all.join(aff, "file_id", "left_semi")
        .join(rep_label, "exact_rep", "left")
        .withColumn(
            "cluster_id",
            F.when(F.col("component").isNotNull(), F.col("component")).when(
                F.col("exact_group_size") >= 2, F.col("exact_rep")
            ),
        )
        .select("file_id", "cluster_id")
    )
    fp_aff = fp_all.join(aff, "file_id", "left_semi")
    out_aff = with_representative(
        fp_aff.join(clus, "file_id", "left"),
        order_cols=order_cols_for(cfg.rep_order),
    )
    assignment_old = cat.read(pipe._tbl("assignment"))
    kept_assign = assignment_old.join(aff, "file_id", "left_anti")
    counts["assignment"] = cat.replace(
        kept_assign.unionByName(out_aff), pipe._tbl("assignment")
    )
    _mark("assignment")

    # batch fully applied — clear the scratch so a resubmission is a no-op
    cat.drop(fpb_tbl)
    counts["stage_seconds"] = stage_seconds
    return counts


def _stale_hot_buckets(cat: Catalog, tbl: str, max_bucket_size: int) -> int:
    """Count over-cap buckets whose rows are unsalted (salt 0) — the
    delta-growth staleness documented on ``lsh_bucket_delta``. One
    column-pruned aggregation over the bucket table, no UDF."""
    if not cat.exists(tbl):
        return 0
    return (
        cat.read(tbl)
        .groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("n"), F.max("salt").alias("s"))
        .filter((F.col("s") == 0) & (F.col("n") > max_bucket_size))
        .count()
    )


def rebucket(
    spark: SparkSession,
    cfg: PipelineConfig,
    *,
    catalog: Catalog | None = None,
) -> dict:
    """Bucket-salt maintenance: rebuild ONLY the buckets stage from the
    committed fingerprints + exact checkpoints and swap it in via
    ``Catalog.replace`` — the compaction job ``lsh_bucket_delta``'s
    documented staleness tradeoff defers to.

    What it fixes, both delta-accumulation artifacts:

    - buckets that became hot only through appended deltas keep salt 0
      (a delta batch cannot see global bucket sizes); the rebuild runs
      the full global census of ``lsh_buckets``, so every over-cap
      bucket is salted again;
    - dethroned representatives' bucket rows (kept by the incremental
      path because removal would need a corpus-wide rewrite) are
      dropped, since the rebuild derives reps from the CURRENT exact
      table.

    Nothing downstream is touched: committed edges/labels/assignment
    remain valid (bucket layout only shapes FUTURE candidate
    generation), so the job costs one fingerprints scan + the bucket
    census shuffle — the cheapest maintenance window there is. Safe to
    re-run (idempotent: same inputs → byte-identical buckets).

    Returns a report with bucket-row and stale-hot-bucket counts before
    and after, wired to the same census ``update_advice`` uses for its
    staleness signal.
    """
    pipe = StagedPipeline(spark, cfg, catalog)
    cat = pipe.catalog
    for t in ("fingerprints", "exact", "buckets"):
        if not cat.exists(pipe._tbl(t)):
            raise ValueError(
                f"rebucket requires a completed run; {t!r} checkpoint "
                "missing — run StagedPipeline first"
            )
    tbl = pipe._tbl("buckets")
    before_rows = cat.rows(tbl) or 0
    before_stale = _stale_hot_buckets(cat, tbl, cfg.max_bucket_size)
    after_rows = cat.replace(pipe._build_buckets(), tbl)
    after_stale = _stale_hot_buckets(cat, tbl, cfg.max_bucket_size)
    return {
        "buckets_before": before_rows,
        "buckets_after": after_rows,
        "stale_hot_before": before_stale,
        "stale_hot_after": after_stale,
    }


def update_advice(
    spark: SparkSession,
    cfg: PipelineConfig,
    *,
    batch_rows: int,
    catalog: Catalog | None = None,
    max_batch_ratio: float = 0.25,
    max_stale_hot_buckets: int = 10_000,
) -> dict:
    """Advisory planner: should this batch go through ``incremental_update``
    or a ``StagedPipeline`` rebuild?

    The thresholds encode what BENCH/BASELINE.md measured rather than a
    guess: after the lead-linking + bucket-truncation redesign, a
    worst-case 10%-of-corpus batch (every row colliding with an existing
    family) costs 46% of a same-day full rebuild, so incremental wins
    through at least ``batch_ratio`` 0.10; beyond ``max_batch_ratio``
    (default 0.25) the measurement band ends and rebuild is recommended.

    The second signal is **bucket-salt staleness** — the deliberate
    tradeoff documented on ``lsh_bucket_delta``: a bucket that only became
    hot through appended deltas keeps salt 0 until the next full
    rebucketing, and every stale hot bucket a future batch touches pays a
    window sort over its full membership. This helper counts them (one
    column-pruned aggregation over the bucket table, no UDF) so the
    operator sees the staleness instead of discovering it as a slow
    update.

    Returns a dict with the measurements, a ``recommendation`` of
    ``"incremental"`` or ``"rebuild"``, and human-readable ``reasons``.
    Advisory only — callers remain free to force either path.
    """
    pipe = StagedPipeline(spark, cfg, catalog)
    cat = pipe.catalog
    if not cat.exists(pipe._tbl("fingerprints")):
        return {
            "corpus_rows": 0,
            "batch_rows": batch_rows,
            "batch_ratio": None,
            "stale_hot_buckets": 0,
            "recommendation": "rebuild",
            "reasons": ["no completed run to extend — first batch"],
        }
    corpus_rows = cat.rows(pipe._tbl("fingerprints")) or 0
    batch_ratio = batch_rows / corpus_rows if corpus_rows else None

    stale_hot = _stale_hot_buckets(
        cat, pipe._tbl("buckets"), cfg.max_bucket_size
    )

    reasons: list[str] = []
    ratio_exceeded = batch_ratio is not None and batch_ratio > max_batch_ratio
    if ratio_exceeded:
        reasons.append(
            f"batch is {batch_ratio:.0%} of the corpus — beyond the "
            f"{max_batch_ratio:.0%} band where incremental is measured to win"
        )
    if stale_hot > max_stale_hot_buckets:
        reasons.append(
            f"{stale_hot} unsalted over-cap buckets — rebucketing overdue "
            "(delta-grown hot buckets keep salt 0; run the cheap "
            "buckets-only rebuild: rebucket() / run_pipeline --rebucket)"
        )
    # staleness alone warrants only the buckets-only maintenance job —
    # a full rebuild is recommended solely for an out-of-band batch size
    if ratio_exceeded:
        recommendation = "rebuild"
    elif reasons:
        recommendation = "rebucket"
    else:
        recommendation = "incremental"
    return {
        "corpus_rows": corpus_rows,
        "batch_rows": batch_rows,
        "batch_ratio": batch_ratio,
        "stale_hot_buckets": stale_hot,
        "recommendation": recommendation,
        "reasons": reasons
        or [
            "batch within the measured incremental-win band; bucket salting fresh"
        ],
    }
