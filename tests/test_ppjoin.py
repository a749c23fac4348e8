"""Prefix-filtered Jaccard join: lossless-vs-brute-force completeness,
hot-token robustness (the case the df-cap loses), and plan hygiene."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.ppjoin import (
    prefix_filtered_jaccard_pairs,
    rank_tokens,
    tokenize_distinct,
)


def _brute_force(rows, threshold):
    sets = {i: set(t.lower().split()) for i, t in rows if t and t.strip()}
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        s1, s2 = sets[a], sets[b]
        j = len(s1 & s2) / len(s1 | s2)
        if round(j, 6) >= threshold:
            out[(a, b)] = round(j, 6)
    return out


def test_matches_brute_force_on_mixed_corpus(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta zeta"),      # J=4/6 with 1
        (3, "alpha beta gamma delta epsilon"),   # J=1 with 1
        (4, "omega psi chi"),
        (5, "omega psi chi phi"),                # J=3/4 with 4
        (6, "unrelated words here"),
        (7, None),
        (8, "   "),
    ]
    df = spark.createDataFrame(rows, "id int, text string")
    for t in (0.5, 0.75, 0.99):
        got = {
            (r["id1"], r["id2"]): r["jaccard"]
            for r in prefix_filtered_jaccard_pairs(
                df, id_col="id", text_col="text", threshold=t
            ).collect()
        }
        want = _brute_force(rows, t)
        assert got == pytest.approx(want), f"threshold {t}"


def test_hot_tokens_stay_out_of_prefix_and_pairs_survive(spark):
    # every doc shares the same 8 stopwords; each true near-dup pair also
    # shares 8 rare tokens. A df-cap that drops the stopwords loses
    # NOTHING here — but a df-cap that dropped rare-but-still-common
    # tokens would: the prefix filter must find ALL pairs regardless.
    stop = "the of and to in is was for"
    rows = []
    for g in range(10):
        rare = " ".join(f"g{g}w{j}" for j in range(8))
        rows.append((g * 2, f"{stop} {rare} x{g}a"))
        rows.append((g * 2 + 1, f"{stop} {rare} x{g}b"))
    df = spark.createDataFrame(rows, "id int, text string")
    # sets are 17 tokens; within-pair overlap 16/18 = 0.888...
    got = {
        (r["id1"], r["id2"])
        for r in prefix_filtered_jaccard_pairs(
            df, id_col="id", text_col="text", threshold=0.85
        ).collect()
    }
    assert got == {(g * 2, g * 2 + 1) for g in range(10)}


def test_rank_is_df_ascending_total_order(spark):
    df = spark.createDataFrame(
        [(1, "rare common common2"), (2, "common common2"), (3, "common")],
        "id int, text string",
    )
    toks = tokenize_distinct(df, id_col="id", text_col="text")
    ranked = rank_tokens(toks)
    joined = {
        (r["id"], r["rank"]) for r in ranked.collect()
    }
    # df: rare=1, common2=2, common=3 -> ranks: common2... order by (df, token):
    # rare(1) -> 1, common2(2) -> 2, common(3) -> 3
    assert (1, 1) in joined            # doc1 has "rare"
    assert (3, 3) in joined            # doc3 has only "common"


def test_threshold_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "id int, text string")
    for bad in (0.0, 1.5, -0.2):
        with pytest.raises(ValueError, match="threshold"):
            prefix_filtered_jaccard_pairs(
                df, id_col="id", text_col="text", threshold=bad
            )


def test_identical_docs_jaccard_one(spark):
    df = spark.createDataFrame(
        [(1, "x y z"), (2, "z y x"), (3, "x y z w")],
        "id int, text string",
    )
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in prefix_filtered_jaccard_pairs(
            df, id_col="id", text_col="text", threshold=1.0
        ).collect()
    }
    assert got == {(1, 2): 1.0}


def test_plan_no_cartesian_no_python(spark):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} shared") for i in range(20)], "id int, text string"
    )
    plan = (
        prefix_filtered_jaccard_pairs(
            df, id_col="id", text_col="text", threshold=0.6
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
