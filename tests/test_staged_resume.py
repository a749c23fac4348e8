"""Resume/checkpoint/metrics/lineage tests for the staged pipeline runner.

The north-star contract: every stage checkpoints (LSH buckets, scored
edges, component labels), the run resumes mid-way after failure without
recomputation, final clusters are identical, and metrics/lineage rows are
not duplicated by resume."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.fixtures import files_dataframe, labeled_pairs
from dedupe_spark.oracle import pairwise_f1
from dedupe_spark.plans.staged import STAGES, StagedPipeline


def _clusters(df) -> dict[str, str | None]:
    return {
        r["file_id"]: r["cluster_id"]
        for r in df.select("file_id", "cluster_id").collect()
    }


@pytest.fixture(scope="module")
def warehouse(tmp_path_factory):
    return str(tmp_path_factory.mktemp("wh"))


@pytest.fixture(scope="module")
def cfg(warehouse):
    return PipelineConfig(run_id="r1", warehouse=warehouse)


@pytest.fixture(scope="module")
def fresh_run(spark, corpus, cfg):
    pipe = StagedPipeline(spark, cfg)
    ran = pipe.run(files_dataframe(spark, corpus))
    return pipe, ran


def test_fresh_run_executes_all_stages(fresh_run):
    _, ran = fresh_run
    assert ran == {s: True for s in STAGES}


def test_staged_matches_planted_truth(fresh_run, corpus):
    pipe, _ = fresh_run
    f1 = pairwise_f1(_clusters(pipe.result()), labeled_pairs(corpus))
    assert f1 >= 0.99


def test_resume_skips_everything_and_is_identical(fresh_run, spark, cfg, corpus):
    pipe, _ = fresh_run
    before = _clusters(pipe.result())
    pipe2 = StagedPipeline(spark, cfg)
    ran = pipe2.run(files=None, resume=True)  # no input needed on resume
    assert ran == {s: False for s in STAGES}
    assert _clusters(pipe2.result()) == before


def test_mid_run_failure_resumes_without_upstream_recompute(
    spark, corpus, warehouse, fresh_run
):
    """Simulate a crash after `edges`: only labels+assignment rerun, and the
    final clusters equal the uninterrupted run's."""
    pipe, _ = fresh_run
    golden = _clusters(pipe.result())

    cfg2 = PipelineConfig(run_id="r2", warehouse=warehouse)
    crash = StagedPipeline(spark, cfg2)
    ran1 = crash.run(files_dataframe(spark, corpus), until="edges")
    assert ran1 == {s: True for s in STAGES[:4]}

    resumed = StagedPipeline(spark, cfg2)
    ran2 = resumed.run(files=None, resume=True)
    assert [s for s, r in ran2.items() if r] == ["labels", "assignment"]
    assert _clusters(resumed.result()) == golden


def test_missing_fingerprints_requires_files(spark, warehouse):
    cfg3 = PipelineConfig(run_id="r3", warehouse=warehouse)
    with pytest.raises(ValueError, match="files DataFrame required"):
        StagedPipeline(spark, cfg3).run(files=None)


def test_metrics_written_once_per_stage(fresh_run, spark, cfg):
    pipe, _ = fresh_run
    m = pipe.metrics()
    per_stage = {
        (r["stage"], r["metric"]): r["cnt"]
        for r in m.groupBy("stage", "metric").agg(F.count("*").alias("cnt")).collect()
    }
    for s in STAGES:
        assert per_stage[(s, "rows")] == 1  # resume appended nothing
        assert per_stage[(s, "seconds")] == 1


def test_lineage_partition_counts_sum_to_stage_rows(fresh_run):
    pipe, _ = fresh_run
    lin = pipe.lineage()
    sums = {
        r["stage"]: r["total"]
        for r in lin.groupBy("stage").agg(F.sum("rows").alias("total")).collect()
    }
    for s in STAGES:
        assert sums[s] == pipe.catalog.rows(f"r1/{s}")


def test_checkpoint_tables_committed(fresh_run):
    pipe, _ = fresh_run
    for s in STAGES:
        assert pipe.catalog.exists(f"r1/{s}")
    # edges checkpoint carries the scoring evidence columns (north_star)
    edges = pipe.catalog.read("r1/edges")
    assert {"id1", "id2", "hamming", "jaccard", "votes"} <= set(edges.columns)
