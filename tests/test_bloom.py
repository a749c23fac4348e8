"""Bloom membership pre-filter: exactness, no-false-negatives, fpp bound,
null/empty edges, and JVM-only plan shape."""

import math

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.bloom import (
    bloom_build,
    bloom_cross_filter,
    bloom_might_contain,
    bloom_params,
)


def test_bloom_params_textbook_sizing():
    m, k = bloom_params(1000, 0.01)
    # textbook: ~9.585 bits/key, k ~ 7 at 1% fpp
    assert abs(m / 1000 - 9.585) < 0.1
    assert k == 7
    assert m % 64 == 0
    with pytest.raises(ValueError):
        bloom_params(0)
    with pytest.raises(ValueError):
        bloom_params(10, 1.5)


def _corpus(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.concat(F.lit("key-"), F.col("id")), 256).alias("key"),
    )


def test_no_false_negatives_and_exact_confirm(spark):
    """bloom_cross_filter == plain equi-join semantics: every planted
    member matched with the right min ref_id, non-members unmatched."""
    corpus = _corpus(spark, 500)
    ref = _corpus(spark, 500).filter(F.col("doc_id") % 7 == 0)
    out = {
        r["doc_id"]: (r["matched"], r["ref_id"])
        for r in bloom_cross_filter(
            corpus, ref, id_col="doc_id", key_col="key", ref_id_col="doc_id"
        ).collect()
    }
    assert len(out) == 500
    for i in range(500):
        if i % 7 == 0:
            assert out[i] == (True, i), f"member {i} missed"
        else:
            assert out[i] == (False, None), f"non-member {i} matched"


def test_ref_id_is_native_type_min(spark):
    """Duplicate reference keys resolve to the NUMERIC min id (9 < 10 —
    a string min would pick '10')."""
    corpus = spark.createDataFrame([(0, "dup")], "doc_id long, key string")
    ref = spark.createDataFrame(
        [(9, "dup"), (10, "dup")], "doc_id long, key string"
    )
    [row] = bloom_cross_filter(
        corpus, ref, id_col="doc_id", key_col="key", ref_id_col="doc_id"
    ).collect()
    assert (row["matched"], row["ref_id"]) == (True, 9)


def test_null_keys_never_match(spark):
    corpus = spark.createDataFrame(
        [(0, None), (1, "a")], "doc_id long, key string"
    )
    ref = spark.createDataFrame(
        [(100, None), (101, "a")], "doc_id long, key string"
    )
    out = {
        r["doc_id"]: (r["matched"], r["ref_id"])
        for r in bloom_cross_filter(
            corpus, ref, id_col="doc_id", key_col="key", ref_id_col="doc_id"
        ).collect()
    }
    assert out[0] == (False, None)  # null key is not a member of anything
    assert out[1] == (True, 101)


def test_empty_reference_short_circuits(spark):
    corpus = _corpus(spark, 10)
    ref = _corpus(spark, 0)
    rows = bloom_cross_filter(
        corpus, ref, id_col="doc_id", key_col="key", ref_id_col="doc_id"
    ).collect()
    assert len(rows) == 10
    assert all(not r["matched"] and r["ref_id"] is None for r in rows)


def test_probe_fpp_within_bound(spark):
    """Realized probe-stage fpp on 2000 disjoint keys stays near the
    configured 1% (deterministic: xxhash64 is seeded, data is fixed)."""
    ref = _corpus(spark, 1000)
    disjoint = spark.range(1000).select(
        (F.col("id") + 1_000_000).alias("doc_id"),
        F.sha2(F.concat(F.lit("other-"), F.col("id")), 256).alias("key"),
    )
    words, m, k = bloom_build(ref, "key", expected_items=1000, fpp=0.01)
    probed = bloom_might_contain(
        disjoint, words, "key", m=m, k=k, id_col="doc_id"
    )
    fp = probed.filter("might_match").count()
    # 1000 Bernoulli(≈0.01) trials: 40 false positives would be >10 sigma
    assert fp <= 40, f"false-positive rate {fp / 1000:.3f} far above fpp"
    # and members all pass the probe (no false negatives at probe stage)
    member_pass = bloom_might_contain(
        ref, words, "key", m=m, k=k, id_col="doc_id"
    ).filter("might_match").count()
    assert member_pass == 1000


def test_word_table_is_bounded_by_m(spark):
    ref = _corpus(spark, 200)
    words, m, k = bloom_build(ref, "key", expected_items=200, fpp=0.01)
    rows = words.collect()
    assert len(rows) <= m // 64
    assert all(r["bits"] != 0 for r in rows)
    # total set bits ≤ n*k; expected = m(1 - (1 - 1/m)^(nk)) under
    # uniform hashing — deviation beyond ±10% means broken hashing
    total_bits = sum(bin(r["bits"] & ((1 << 64) - 1)).count("1") for r in rows)
    expected = m * (1 - math.exp(-200 * k / m))
    assert expected * 0.9 <= total_bits <= min(200 * k, expected * 1.1)


def test_under_sized_filter_stays_exact(spark):
    """Lying about expected_items inflates fpp but NOT the result: the
    confirm join keeps semantics exact."""
    corpus = _corpus(spark, 300)
    ref = _corpus(spark, 300).filter(F.col("doc_id") % 3 == 0)
    out = {
        r["doc_id"]: r["matched"]
        for r in bloom_cross_filter(
            corpus,
            ref,
            id_col="doc_id",
            key_col="key",
            ref_id_col="doc_id",
            expected_items=5,  # 20× under-sized
        ).collect()
    }
    assert all(out[i] == (i % 3 == 0) for i in range(300))


def test_plan_jvm_only_and_broadcast_probe(spark):
    """No Python eval anywhere; the word-table probe join is broadcast;
    the word build has a map-side partial aggregate."""
    corpus = _corpus(spark, 100)
    ref = _corpus(spark, 100).filter(F.col("doc_id") % 5 == 0)
    plan = bloom_cross_filter(
        corpus,
        ref,
        id_col="doc_id",
        key_col="key",
        ref_id_col="doc_id",
        expected_items=20,
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
    # map-side partial bit_or on the word-table build must survive
    assert "partialbitor" in plan.lower().replace("_", "")
