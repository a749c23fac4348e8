"""End-to-end pipeline tests with planted families — the F1 gate.

Mirrors the reference's integration tests
(/root/reference/tests/test_integration.py:79-151: duplicate family in →
fewer survivors out, space saved > 0) and adds the BASELINE.json
acceptance: pairwise F1 ≥ 0.99 vs reference-semantics golden clusters on
labeled pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.fixtures import (
    file_id_of,
    files_dataframe,
    labeled_pairs,
    truth_clusters,
)
from dedupe_spark.operators.dedup import dedup_pipeline
from dedupe_spark.operators.representative import survivors
from dedupe_spark.oracle import golden_clusters, pairwise_f1


@pytest.fixture(scope="module")
def result(spark, corpus):
    out = dedup_pipeline(files_dataframe(spark, corpus), PipelineConfig()).cache()
    out.count()
    return out


def _predicted(result) -> dict[str, str | None]:
    return {
        r["file_id"]: r["cluster_id"]
        for r in result.select("file_id", "cluster_id").collect()
    }


def test_f1_vs_golden_oracle(result, corpus):
    """Engine clusters match the pure-Python reference-semantics oracle."""
    golden = golden_clusters([(file_id_of(r), r.content) for r in corpus])
    pred = _predicted(result)
    pairs = [
        (a, b, golden[a] is not None and golden[a] == golden[b])
        for (a, b, _) in labeled_pairs(corpus)
    ]
    f1 = pairwise_f1(pred, pairs)
    assert f1 >= 0.99, f"pairwise F1 vs golden oracle = {f1}"


def test_f1_vs_planted_truth(result, corpus):
    """Engine clusters match the planted family truth (F1 ≥ 0.99)."""
    pred = _predicted(result)
    f1 = pairwise_f1(pred, labeled_pairs(corpus))
    assert f1 >= 0.99, f"pairwise F1 vs planted truth = {f1}"


def test_exact_family_collapses(result, corpus):
    truth = truth_clusters(corpus)
    exact_fids = [file_id_of(r) for r in corpus if r.family.startswith("exact")]
    pred = _predicted(result)
    by_truth = {}
    for f in exact_fids:
        by_truth.setdefault(truth[f], set()).add(pred[f])
    for label, preds in by_truth.items():
        assert len(preds) == 1 and None not in preds, f"family {label} split: {preds}"


def test_one_representative_per_cluster(result):
    bad = (
        result.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(
            F.sum(F.col("is_representative").cast("int")).alias("reps"),
            F.count("*").alias("n"),
        )
        .filter((F.col("reps") != 1) | (F.col("n") < 2))
        .count()
    )
    assert bad == 0


def test_survivors_fewer_than_input(result, corpus):
    """Duplicates in → fewer survivors out (test_integration.py:79-151)."""
    n_in = len(corpus)
    n_out = survivors(result).count()
    n_families = len({r.family for r in corpus if r.family})
    n_clustered_rows = sum(1 for r in corpus if r.family)
    assert n_out == n_in - n_clustered_rows + n_families


def test_corrupt_rows_flow_through(result):
    """Errored rows present in output, never clustered
    (duplicate_detector.py:52 + error-channel convention)."""
    errs = result.filter(F.col("error").isNotNull())
    assert errs.count() >= 2
    assert errs.filter(F.col("cluster_id").isNotNull()).count() == 0


def test_giant_family_with_salting(spark, corpus_with_giant):
    """Skew path: a 300-copy exact family pre-collapses to one super-node
    and still comes out as exactly one cluster."""
    cfg = PipelineConfig(max_bucket_size=50, bucket_salt=4)
    out = dedup_pipeline(files_dataframe(spark, corpus_with_giant), cfg)
    truth = truth_clusters(corpus_with_giant)
    giant_fids = [
        file_id_of(r) for r in corpus_with_giant if r.family.startswith("giant")
    ]
    pred = {
        r["file_id"]: r["cluster_id"]
        for r in out.select("file_id", "cluster_id").collect()
    }
    labels = {pred[f] for f in giant_fids}
    assert len(labels) == 1 and None not in labels
    f1 = pairwise_f1(pred, labeled_pairs(corpus_with_giant))
    assert f1 >= 0.99
