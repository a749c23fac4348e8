"""Incremental dedup — extend a completed run with a new batch of files.

The reference rescans and re-compares its whole directory every run; the
staged warehouse exists so we never have to. ``incremental_update``
appends a new batch to an existing run's checkpoints and recomputes only
what the new rows can change:

    fingerprints   new batch only (Arrow UDF) → append
    exact          sha groupBy over the (appended) fingerprint table —
                   one cheap shuffle, recomputed (groups can merge)
    new candidates band keys of the NEW reps joined against the FULL
                   bucket table (old + new) — old-vs-old pairs are never
                   regenerated; per-(new file, band) candidate bound +
                   in-join Hamming prefilter as in the batch path
    edges          score only the new candidate pairs → append
    labels         connected components over the full edge table — edges
                   are match-scale (≪ corpus), so full CC is the cheap,
                   correct choice (a new edge can merge two old clusters;
                   incremental CC union-find is driver-state, not Spark)
    assignment     rebuilt from exact ∪ labels as in the batch path

Equivalence contract: because candidate recall is threshold-complete for
planted families (every true pair passes blocking + consensus), two-batch
incremental ingestion produces the same clusters as a one-shot run on the
union — asserted by tests/test_incremental.py against the golden oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.functions.fingerprint import with_fingerprints
from dedupe_spark.operators.blocking import exact_groups, lsh_buckets
from dedupe_spark.operators.cc import connected_components
from dedupe_spark.operators.representative import (
    order_cols_for,
    with_representative,
)
from dedupe_spark.operators.scoring import score_pairs
from dedupe_spark.plans.staged import StagedPipeline
from dedupe_spark.sources.catalog import Catalog


def incremental_update(
    spark: SparkSession,
    new_files: DataFrame,
    cfg: PipelineConfig,
    *,
    catalog: Catalog | None = None,
) -> dict:
    """Append ``new_files`` to an existing completed run and refresh its
    cluster assignment. Returns per-stage row counts for the report,
    plus ``stage_seconds`` (wall time per stage — makes the O(corpus)
    columnar floor vs batch-proportional split measurable, not claimed).

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
    import time

    _t0 = time.perf_counter()

    def _mark(stage: str) -> None:
        nonlocal _t0
        now = time.perf_counter()
        stage_seconds[stage] = round(now - _t0, 3)
        _t0 = now

    # 1. fingerprint ONLY the new batch; append rows whose file_id is not
    #    already present (re-submitting a batch must be a no-op, never a
    #    duplicate row — the idempotence contract resume depends on)
    before = cat.rows(pipe._tbl("fingerprints")) or 0
    existing = cat.read(pipe._tbl("fingerprints")).select("file_id")
    fp_new = with_fingerprints(
        new_files,
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
    ).join(existing, "file_id", "left_anti")
    total = cat.append(fp_new, pipe._tbl("fingerprints"))
    counts["fingerprints_appended"] = total - before
    _mark("fingerprints")
    fp_all = cat.read(pipe._tbl("fingerprints"))
    # new file_ids via the id projection only — no second UDF pass
    from dedupe_spark.functions.fingerprint import file_id_col

    new_ids = new_files.select(file_id_col().alias("file_id")).distinct()

    # 2. exact tier over the full (appended) table — one sha shuffle
    eg = exact_groups(fp_all)
    counts["exact"] = cat.write(eg, pipe._tbl("exact"))
    _mark("exact")

    # 3. bucket the full rep set once (cheap explode); candidates = NEW
    #    reps vs ALL buckets — old-vs-old pairs are never regenerated.
    #    Write-then-read-back: the checkpoint write IS the single
    #    materialization, and both join sides below read the columnar
    #    parquet (an eager localCheckpoint here would materialize the
    #    same ~bands×corpus rows a second time into executor RAM).
    reps = fp_all.join(
        eg.filter(F.col("file_id") == F.col("exact_rep")).select("file_id"),
        "file_id",
    )
    counts["buckets"] = cat.write(
        lsh_buckets(
            reps, max_bucket_size=cfg.max_bucket_size, bucket_salt=cfg.bucket_salt
        ),
        pipe._tbl("buckets"),
    )
    buckets = cat.read(pipe._tbl("buckets"))
    _mark("buckets")
    new_buckets = buckets.join(new_ids, "file_id", "left_semi")

    nb, ab = new_buckets.alias("nb"), buckets.alias("ab")
    joined = (
        nb.join(ab, ["band_id", "band_hash", "salt"])
        .filter(F.col("nb.file_id") != F.col("ab.file_id"))
    )
    if cfg.require_agreement >= 2:
        joined = joined.filter(
            F.bit_count(F.col("nb.simhash").bitwiseXOR(F.col("ab.simhash")))
            <= cfg.hamming_threshold
        )
    # bound candidates per (new file, band): nearest partners in the
    # per-band hash order, mirroring the batch path's bounded linking
    w = Window.partitionBy("nb.file_id", "band_id").orderBy(
        F.xxhash64("ab.file_id", "band_id"), "ab.file_id"
    )
    pairs = (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cfg.neighbors_per_band)
        .groupBy(
            F.least(F.col("nb.file_id"), F.col("ab.file_id")).alias("id1"),
            F.greatest(F.col("nb.file_id"), F.col("ab.file_id")).alias("id2"),
        )
        .agg(F.count("*").alias("n_bands"))
    )

    # 4. score only the new pairs; append to the edge checkpoint (dedup
    #    against existing edges so a re-submitted batch stays idempotent)
    new_edges = score_pairs(
        pairs,
        fp_all,
        hamming_threshold=cfg.hamming_threshold,
        jaccard_threshold=cfg.jaccard_threshold,
        require_agreement=cfg.require_agreement,
    ).filter("is_match")
    old_edges = cat.read(pipe._tbl("edges"))
    fresh = new_edges.join(
        old_edges.select("id1", "id2"), ["id1", "id2"], "left_anti"
    )
    cat.append(fresh, pipe._tbl("edges"))
    counts["edges_total"] = cat.rows(pipe._tbl("edges")) or 0
    _mark("edges")

    # 5. clustering + assignment over the full (small) edge set
    edges = cat.read(pipe._tbl("edges"))
    labels = connected_components(edges, max_iterations=cfg.cc_max_iterations)
    counts["labels"] = cat.write(labels, pipe._tbl("labels"))
    _mark("labels")

    rep_label = cat.read(pipe._tbl("labels")).withColumnRenamed(
        "file_id", "exact_rep"
    )
    eg_c = cat.read(pipe._tbl("exact"))
    assignment = (
        eg_c.join(rep_label, "exact_rep", "left")
        .withColumn(
            "cluster_id",
            F.when(F.col("component").isNotNull(), F.col("component")).when(
                F.col("exact_group_size") >= 2, F.col("exact_rep")
            ),
        )
        .select("file_id", "cluster_id")
    )
    out = with_representative(
        fp_all.join(assignment, "file_id", "left"),
        order_cols=order_cols_for(cfg.rep_order),
    )
    counts["assignment"] = cat.write(out, pipe._tbl("assignment"))
    _mark("assignment")
    counts["stage_seconds"] = stage_seconds
    return counts
