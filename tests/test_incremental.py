"""Incremental-update tests: two-batch ingestion must produce the same
clusters as a one-shot batch run on the union, and re-submitting a batch
must be idempotent."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.fixtures import files_dataframe, labeled_pairs
from dedupe_spark.oracle import pairwise_f1
from dedupe_spark.plans.incremental import incremental_update
from dedupe_spark.plans.staged import StagedPipeline


def _clusters(df):
    return {
        r["file_id"]: r["cluster_id"]
        for r in df.select("file_id", "cluster_id").collect()
    }


@pytest.fixture(scope="module")
def split_runs(spark, corpus, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("wh_inc"))
    all_files = files_dataframe(spark, corpus).cache()
    half1 = all_files.filter(F.crc32(F.col("path")) % 2 == 0)
    half2 = all_files.filter(F.crc32(F.col("path")) % 2 == 1)

    inc_cfg = PipelineConfig(run_id="inc", warehouse=wh)
    pipe = StagedPipeline(spark, inc_cfg)
    pipe.run(half1)
    counts = incremental_update(spark, half2, inc_cfg)

    batch_cfg = PipelineConfig(run_id="oneshot", warehouse=wh)
    batch = StagedPipeline(spark, batch_cfg)
    batch.run(all_files)
    return pipe, batch, counts, half2


def test_incremental_appends_only_new_fingerprints(split_runs):
    pipe, _batch, counts, half2 = split_runs
    assert counts["fingerprints_appended"] == half2.count()


def test_incremental_matches_oneshot_clusters(split_runs, corpus):
    """The incremental path may generate candidates in a different order,
    but every planted family is threshold-complete, so final clusters must
    match the one-shot run exactly (and the planted truth at F1 ≥ 0.99)."""
    pipe, batch, _counts, _ = split_runs
    inc = _clusters(pipe.result())
    one = _clusters(batch.result())
    assert set(inc) == set(one)
    # same partition of files into clusters (labels are both min-id, so
    # equality is exact, not just partition-equivalent)
    assert inc == one
    f1 = pairwise_f1(inc, labeled_pairs(corpus))
    assert f1 >= 0.99, f1


def test_incremental_resubmission_is_idempotent(spark, split_runs):
    """Re-submitting the same batch adds no new edges and leaves the
    assignment unchanged (the left-anti edge dedup)."""
    pipe, _batch, _counts, half2 = split_runs
    before = _clusters(pipe.result())
    edges_before = pipe.catalog.rows("inc/edges")
    counts2 = incremental_update(
        spark, half2, PipelineConfig(run_id="inc", warehouse=pipe.catalog.warehouse)
    )
    assert counts2["edges_total"] == edges_before
    assert _clusters(pipe.result()) == before


def test_incremental_requires_existing_run(spark, corpus, tmp_path):
    cfg = PipelineConfig(run_id="nope", warehouse=str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="fingerprints"):
        incremental_update(spark, files_dataframe(spark, corpus), cfg)


def test_rebucket_restores_salting_and_drops_stale_rows(
    spark, corpus, tmp_path
):
    """Planted stale-salt scenario: an over-cap salt-0 bucket (the
    lsh_bucket_delta staleness artifact) plus leftover dethroned-rep
    rows. --rebucket's library core must (a) re-salt from a fresh global
    census, (b) drop rows not derivable from the committed
    fingerprints/exact stages, (c) leave every downstream table
    untouched, (d) be idempotent."""
    from dedupe_spark.plans.incremental import rebucket, update_advice

    cfg = PipelineConfig(run_id="rb", warehouse=str(tmp_path / "wh"))
    pipe = StagedPipeline(spark, cfg)
    pipe.run(files_dataframe(spark, corpus))
    cat = pipe.catalog
    assign_before = _clusters(pipe.result())

    planted = spark.createDataFrame(
        [
            (99, 123456789, 0, f"stale{i}", i * 17)
            for i in range(cfg.max_bucket_size + 1)
        ],
        "band_id int, band_hash long, salt long, file_id string, simhash long",
    )
    cat.append(planted, "rb/buckets")
    adv = update_advice(spark, cfg, batch_rows=1, max_stale_hot_buckets=0)
    assert adv["recommendation"] == "rebucket"

    rep = rebucket(spark, cfg)
    assert rep["stale_hot_before"] >= 1
    assert rep["stale_hot_after"] == 0
    buckets = cat.read("rb/buckets")
    # planted band gone: only fingerprint-derived band ids remain
    assert buckets.filter("band_id = 99").count() == 0
    # byte-equivalent to a fresh buckets build from the committed stages
    fresh = pipe._build_buckets()
    assert buckets.exceptAll(fresh).count() == 0
    assert fresh.exceptAll(buckets).count() == 0
    # downstream untouched
    assert _clusters(pipe.result()) == assign_before
    # idempotent
    rep2 = rebucket(spark, cfg)
    assert rep2["buckets_after"] == rep["buckets_after"]
    assert rep2["stale_hot_before"] == 0


def test_rebucket_then_incremental_matches_oneshot(
    spark, corpus, tmp_path
):
    """Maintenance composes with ingestion: staged half → rebucket →
    incremental second half must equal the one-shot clustering of the
    union (the delta path keys its salting off the rebuilt table)."""
    from dedupe_spark.plans.incremental import rebucket

    wh = str(tmp_path / "wh")
    all_files = files_dataframe(spark, corpus).cache()
    half1 = all_files.filter(F.crc32(F.col("path")) % 2 == 0)
    half2 = all_files.filter(F.crc32(F.col("path")) % 2 == 1)

    cfg = PipelineConfig(run_id="rbi", warehouse=wh)
    pipe = StagedPipeline(spark, cfg)
    pipe.run(half1)
    rebucket(spark, cfg)
    incremental_update(spark, half2, cfg)

    one_cfg = PipelineConfig(run_id="oneshot2", warehouse=wh)
    one = StagedPipeline(spark, one_cfg)
    one.run(all_files)
    assert _clusters(pipe.result()) == _clusters(one.result())


def test_rebucket_requires_completed_run(spark, tmp_path):
    from dedupe_spark.plans.incremental import rebucket

    cfg = PipelineConfig(run_id="norun", warehouse=str(tmp_path / "wh"))
    with pytest.raises(ValueError, match="fingerprints"):
        rebucket(spark, cfg)


def test_update_advice_thresholds(spark, split_runs):
    """The planner recommends incremental inside the measured win band and
    rebuild beyond it or when there's no run to extend."""
    from dedupe_spark.plans.incremental import update_advice

    pipe, _batch, _counts, _half2 = split_runs
    cfg = PipelineConfig(run_id="inc", warehouse=pipe.catalog.warehouse)
    corpus_rows = pipe.catalog.rows("inc/fingerprints")

    small = update_advice(spark, cfg, batch_rows=max(1, corpus_rows // 20))
    assert small["recommendation"] == "incremental"
    assert small["batch_ratio"] < 0.25 and small["corpus_rows"] == corpus_rows

    big = update_advice(spark, cfg, batch_rows=corpus_rows)
    assert big["recommendation"] == "rebuild"
    assert any("beyond" in r for r in big["reasons"])

    fresh = update_advice(
        spark,
        PipelineConfig(run_id="virgin", warehouse=pipe.catalog.warehouse),
        batch_rows=100,
    )
    assert fresh["recommendation"] == "rebuild"
    assert "first batch" in fresh["reasons"][0]


def test_update_advice_counts_stale_hot_buckets(spark, split_runs):
    """A bucket that exceeds max_bucket_size with salt 0 (the
    lsh_bucket_delta staleness case) must be counted and, past the cap,
    flip the recommendation to the buckets-only rebucket job (a full
    rebuild stays reserved for out-of-band batch sizes)."""
    from dedupe_spark.plans.incremental import update_advice

    pipe, _batch, _counts, _half2 = split_runs
    cfg = PipelineConfig(run_id="inc", warehouse=pipe.catalog.warehouse)
    # plant an unsalted over-cap bucket directly in the bucket table
    planted = spark.createDataFrame(
        [(99, 123456789, 0, f"stale{i}", i * 17) for i in range(cfg.max_bucket_size + 1)],
        # schema must byte-match the committed bucket table (salt is a
        # pmod(xxhash64) ⇒ long) or the mixed-file parquet read fails
        "band_id int, band_hash long, salt long, file_id string, simhash long",
    )
    pipe.catalog.append(planted, "inc/buckets")
    try:
        adv = update_advice(spark, cfg, batch_rows=1)
        assert adv["stale_hot_buckets"] >= 1
        strict = update_advice(
            spark, cfg, batch_rows=1, max_stale_hot_buckets=0
        )
        assert strict["recommendation"] == "rebucket"
        assert any("rebucketing" in r for r in strict["reasons"])
    finally:
        # remove the planted rows so later tests in this module see the
        # original bucket table
        clean = pipe.catalog.read("inc/buckets").filter(F.col("band_id") != 99)
        pipe.catalog.replace(clean, "inc/buckets")


@pytest.mark.parametrize("crash_after_append", [False, True])
def test_crashed_batch_survives_a_different_next_batch(
    spark, corpus, tmp_path, crash_after_append
):
    """A staged batch left behind by a crashed update must reach the
    downstream stages even when the NEXT update carries a DIFFERENT batch:
    the leftover scratch is folded into the new batch, never clobbered.
    Exercised for both crash windows — before the fingerprint append and
    after it — and checked by exact cluster equality with a one-shot run
    over the union."""
    from dedupe_spark.functions.fingerprint import with_fingerprints

    all_files = files_dataframe(spark, corpus).cache()
    part = F.crc32(F.col("path")) % 3
    base = all_files.filter(part == 0)
    batch_a = all_files.filter(part == 1)
    batch_b = all_files.filter(part == 2)

    wh = str(tmp_path / f"wh_{crash_after_append}")
    cfg = PipelineConfig(run_id="cr", warehouse=wh)
    pipe = StagedPipeline(spark, cfg)
    pipe.run(base)

    # simulate batch A crashing mid-update: scratch committed, fingerprint
    # append maybe done, downstream stages never ran
    fp_a = with_fingerprints(
        batch_a,
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
    )
    pipe.catalog.write(fp_a, "cr/fp_batch")
    if crash_after_append:
        pipe.catalog.append(pipe.catalog.read("cr/fp_batch"), "cr/fingerprints")

    # the operator moves on and submits a different batch B
    counts = incremental_update(spark, batch_b, cfg)
    assert counts["fingerprints_appended"] == (
        batch_b.count() if crash_after_append else batch_a.count() + batch_b.count()
    )

    one = StagedPipeline(spark, PipelineConfig(run_id="one", warehouse=wh))
    one.run(all_files)
    assert _clusters(pipe.result()) == _clusters(one.result())
