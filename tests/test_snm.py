"""Sorted-neighborhood blocking: distributed global rank correctness,
exact pair-set vs brute force, tie determinism, and plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.linkage import (
    global_rank,
    sorted_neighborhood_pairs,
)


def test_global_rank_is_exact_permutation(spark):
    # shuffled input, multiple range partitions → rank must be exactly
    # the position in the sorted order, 1..n with no gaps or dupes
    import random

    vals = [(i, f"k{i:04d}") for i in range(200)]
    rng = random.Random(7)
    rng.shuffle(vals)
    df = spark.createDataFrame(vals, "rid int, key string")
    got = {
        r["key"]: r["rank"]
        for r in global_rank(df, order_cols=["key"], n_partitions=8).collect()
    }
    assert sorted(got.values()) == list(range(1, 201))
    for i in range(200):
        assert got[f"k{i:04d}"] == i + 1


def test_global_rank_single_partition_input(spark):
    df = spark.createDataFrame([(3,), (1,), (2,)], "v int").coalesce(1)
    got = {r["v"]: r["rank"] for r in global_rank(df, order_cols=["v"]).collect()}
    assert got == {1: 1, 2: 2, 3: 3}


def test_snm_pairs_match_brute_force(spark):
    import itertools
    import random

    n, w = 100, 4
    rows = [(i, f"n{i:03d}") for i in range(n)]
    rng = random.Random(3)
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "rid int, nm string")
    got = {
        (r["id1"], r["id2"], r["rank_distance"])
        for r in sorted_neighborhood_pairs(
            df, id_col="rid", sort_cols=["nm"], window=w
        ).collect()
    }
    # sorted order is rid order (names are zero-padded rid)
    want = {
        (a, b, b - a)
        for a, b in itertools.combinations(range(n), 2)
        if b - a <= w - 1
    }
    assert got == want
    assert len(got) == sum(n - d for d in range(1, w))


def test_snm_ties_are_deterministic_by_id(spark):
    # all sort keys equal → order falls back to id; run twice, same pairs
    df = spark.createDataFrame([(i, "same") for i in range(20)], "rid int, k string")
    a = sorted(
        (r["id1"], r["id2"])
        for r in sorted_neighborhood_pairs(
            df, id_col="rid", sort_cols=["k"], window=3
        ).collect()
    )
    b = sorted(
        (r["id1"], r["id2"])
        for r in sorted_neighborhood_pairs(
            df, id_col="rid", sort_cols=["k"], window=3
        ).collect()
    )
    assert a == b
    # rank distance <= 2 pairs on the id order
    assert (0, 1) in a and (0, 2) in a and (0, 3) not in a


def test_snm_carry_sort_cols(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "alphb"), (3, "omega")], "rid int, nm string"
    )
    rows = sorted_neighborhood_pairs(
        df, id_col="rid", sort_cols=["nm"], window=2, carry_sort_cols=True
    ).collect()
    got = {(r["id1"], r["id2"]): (r["l_nm"], r["r_nm"]) for r in rows}
    assert got[(1, 2)] == ("alpha", "alphb")
    assert got[(2, 3)] == ("alphb", "omega")


def test_snm_rejects_window_one(spark):
    df = spark.createDataFrame([(1, "a")], "rid int, nm string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, id_col="rid", sort_cols=["nm"], window=1)


def test_snm_plan_no_cartesian_no_data_scale_global_window(spark):
    """The only unpartitioned window must run over the P-row count table;
    the data-scale windows are partitioned by _pid. No cartesian, no
    Python, offsets broadcast."""
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(50)], "rid int, nm string"
    )
    pairs = sorted_neighborhood_pairs(df, id_col="rid", sort_cols=["nm"], window=3)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert "BroadcastExchange" in plan  # offsets join-back
    # every Window node over the data partitions by _pid; the global
    # cumsum window exists only above the tiny groupBy(_pid) aggregate
    assert "windowspecdefinition(_pid" in plan or "partitionBy" not in plan


def test_global_rank_more_partitions_than_rows(spark):
    df = spark.createDataFrame([(i,) for i in (5, 3, 9, 1)], "v int")
    got = {r["v"]: r["rank"]
           for r in global_rank(df, order_cols=["v"], n_partitions=64).collect()}
    assert got == {1: 1, 3: 2, 5: 3, 9: 4}


def test_global_rank_null_sort_values_first_and_stable(spark):
    # nulls sort first in both repartitionByRange and row_number asc;
    # the id tiebreak keeps them deterministic
    df = spark.createDataFrame(
        [(1, None), (2, "b"), (3, None), (4, "a")], "rid int, k string"
    )
    got = {r["rid"]: r["rank"]
           for r in global_rank(df, order_cols=["k", "rid"],
                                n_partitions=4).collect()}
    assert got == {1: 1, 3: 2, 4: 3, 2: 4}
