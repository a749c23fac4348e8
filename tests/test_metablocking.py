"""Meta-blocking (CBS + weighted-edge pruning) and clustering-agreement
(ARI) on closed-form planted inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.linkage import clustering_agreement
from dedupe_spark.operators.metablocking import (
    bigram_blocks,
    cbs_edges,
    meta_block,
    weighted_edge_pruning,
)


def test_bigram_blocks_and_df_cap(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta delta"),
            (3, "omega psi"),
            (4, None),
            (5, "  "),
            (6, "single"),
        ],
        "id int, text string",
    )
    got = {
        (r["id"], r["block_key"])
        for r in bigram_blocks(df, id_col="id", text_col="text", max_df=50).collect()
    }
    assert (1, "alpha beta") in got and (2, "alpha beta") in got
    assert (1, "beta gamma") in got and (3, "omega psi") in got
    # null / blank / single-token docs emit no grams
    assert not any(i in (4, 5, 6) for i, _ in got)
    # df cap of 1 drops the shared "alpha beta" gram
    capped = {
        r["block_key"]
        for r in bigram_blocks(df, id_col="id", text_col="text", max_df=1).collect()
    }
    assert "alpha beta" not in capped and "beta gamma" in capped


def test_cbs_edges_counts_shared_blocks(spark):
    blocks = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "c")],
        "id int, block_key string",
    )
    got = {(r["id1"], r["id2"]): r["cbs"] for r in cbs_edges(blocks).collect()}
    assert got == {(1, 2): 2, (1, 3): 1}


def test_wep_keeps_at_or_above_mean(spark):
    edges = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1), (2, 3, 2)], "id1 int, id2 int, cbs int"
    )
    # mean = 2 → keep cbs >= 2
    got = {(r["id1"], r["id2"]) for r in weighted_edge_pruning(edges).collect()}
    assert got == {(1, 2), (2, 3)}


def test_meta_block_planted_near_duplicates(spark):
    # 1/2 share a long phrase (many bigrams); 3 overlaps each by one word
    rows = [
        (1, "the quick brown fox jumps high"),
        (2, "the quick brown fox jumps low"),
        (3, "unrelated fox words entirely"),
        (4, "totally different content here"),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    got = {(r["id1"], r["id2"]): r["cbs"] for r in
           meta_block(df, id_col="id", text_col="text").collect()}
    assert (1, 2) in got and got[(1, 2)] == 4  # 4 shared bigrams
    assert (1, 3) not in got and (3, 4) not in got  # pruned or never blocked


def test_meta_block_plan_hygiene(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2}") for i in range(30)], "id int, text string"
    )
    plan = (
        meta_block(df, id_col="id", text_col="text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # the WEP mean is the only nested-loop: a broadcast of exactly 1 row
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "truth string, pred string")


def test_clustering_agreement_perfect(spark):
    df = _labeled(spark, [("a", "x"), ("a", "x"), ("b", "y"), ("b", "y")])
    r = clustering_agreement(df, truth_col="truth", pred_col="pred").collect()[0]
    assert r["n_items"] == 4
    assert r["tp_pairs"] == 2.0 and r["precision"] == 1.0 and r["recall"] == 1.0
    assert r["f1"] == 1.0 and r["rand_index"] == 1.0 and r["ari"] == 1.0


def test_clustering_agreement_closed_form(spark):
    # truth {1,2,3}{4}; pred {1,2}{3,4}: TP=1, true=3, pred=2, n=4, tot=6
    df = _labeled(
        spark, [("a", "x"), ("a", "x"), ("a", "y"), ("b", "y")]
    )
    r = clustering_agreement(df, truth_col="truth", pred_col="pred").collect()[0]
    assert r["true_pairs"] == 3.0 and r["pred_pairs"] == 2.0 and r["tp_pairs"] == 1.0
    assert r["precision"] == 0.5
    assert r["recall"] == pytest.approx(1 / 3, abs=1e-6)
    assert r["f1"] == 0.4
    # RI = (TP + TN)/6, TN = 6-3-2+1 = 2 → 0.5
    assert r["rand_index"] == 0.5
    # ARI = (1 - 3*2/6) / ((3+2)/2 - 3*2/6) = 0 / 1.5 = 0
    assert r["ari"] == 0.0


def test_clustering_agreement_degenerate_all_singletons(spark):
    df = _labeled(spark, [("a", "x"), ("b", "y"), ("c", "z")])
    r = clustering_agreement(df, truth_col="truth", pred_col="pred").collect()[0]
    assert r["true_pairs"] == 0.0 and r["pred_pairs"] == 0.0
    assert r["precision"] is None and r["recall"] is None
    assert r["ari"] is None
    assert r["rand_index"] == 1.0  # all pairs are true negatives


def test_clustering_agreement_plan_no_joins(spark):
    df = _labeled(spark, [("a", "x")] * 10)
    plan = (
        clustering_agreement(df, truth_col="truth", pred_col="pred")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
