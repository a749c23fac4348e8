"""PPRL Bloom encodings: closed-form positions, Dice arithmetic,
degenerate inputs, and pure-codegen plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.pprl import (
    bloom_encode,
    dice_score,
    pprl_dice_pairs,
)


def _positions(name: str, m: int = 256, k: int = 4) -> set[int]:
    nm = name.lower()
    grams = {nm[i : i + 2] for i in range(len(nm) - 1)}
    return {
        ((ord(g[0]) * 31 + ord(g[1])) * (2 * kk + 1) + kk * kk) % m
        for g in grams
        for kk in range(k)
    }


def _unpack(words: list[int]) -> set[int]:
    out = set()
    for w, word in enumerate(words):
        for b in range(64):
            if word >> b & 1:
                out.add(w * 64 + b)
    return out


def test_bloom_encode_matches_reference_positions(spark):
    names = ["jonathan smith", "ab", "x", "", None]
    df = spark.createDataFrame(
        [(i, nm) for i, nm in enumerate(names)], "rid int, nm string"
    )
    got = {r["id"]: r for r in bloom_encode(df, id_col="rid", text_col="nm").collect()}
    for i, nm in enumerate(names):
        if nm is None or len(nm) < 2:
            assert got[i]["nbits"] == 0
            assert all(w == 0 for w in got[i]["bloom"])
        else:
            want = _positions(nm)
            assert _unpack(got[i]["bloom"]) == want
            assert got[i]["nbits"] == len(want)


def test_dice_exact_on_known_pair(spark):
    df = spark.createDataFrame(
        [(1, "jonathan smith"), (2, "jonathon smith"), (3, "zzzz")],
        "rid int, nm string",
    )
    enc = bloom_encode(df, id_col="rid", text_col="nm")
    rows = {r["id"]: r for r in enc.collect()}
    p1, p2 = _positions("jonathan smith"), _positions("jonathon smith")
    want = 2 * len(p1 & p2) / (len(p1) + len(p2))
    pair = (
        enc.filter("id = 1")
        .select(
            F.col("bloom").alias("bloom1"), F.col("nbits").alias("nbits1")
        )
        .crossJoin(
            enc.filter("id = 2").select(
                F.col("bloom").alias("bloom2"), F.col("nbits").alias("nbits2")
            )
        )
        .select(dice_score().alias("d"))
        .collect()
    )
    assert pair[0]["d"] == pytest.approx(want, abs=1e-9)
    assert rows[1]["nbits"] == len(p1)


def test_pprl_pairs_blocked_and_thresholded(spark):
    rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),   # near-dup, same block
        (3, "B", "jonathan smith"),   # identical name, other block
        (4, "A", "completely other"),
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, nm string")
    got = {
        (r["id1"], r["id2"]): r["dice"]
        for r in pprl_dice_pairs(
            df, id_col="rid", name_col="nm", block_cols=["blk"],
            min_dice=0.8,
        ).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] > 0.8


def test_pprl_validation(spark):
    df = spark.createDataFrame([(1, "A", "nm")], "rid int, blk string, nm string")
    with pytest.raises(ValueError, match="min_dice"):
        pprl_dice_pairs(df, id_col="rid", name_col="nm",
                        block_cols=["blk"], min_dice=0.0)
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_encode(df, id_col="rid", text_col="nm", m=100)
    with pytest.raises(ValueError, match="k must"):
        bloom_encode(df, id_col="rid", text_col="nm", k=0)


def test_pprl_plan_is_pure_codegen(spark):
    df = spark.createDataFrame(
        [(i, "A", f"name {i}") for i in range(20)], "rid int, blk string, nm string"
    )
    plan = (
        pprl_dice_pairs(
            df, id_col="rid", name_col="nm", block_cols=["blk"], min_dice=0.5
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
