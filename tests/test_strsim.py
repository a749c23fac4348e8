"""Jaro–Winkler comparator: canonical values (Winkler paper examples),
DuckDB-semantics pins, null handling, and Arrow-batch plan hygiene."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dedupe_spark.functions.strsim import jaro_winkler, jaro_winkler_udf
from dedupe_spark.operators.linkage import candidate_pairs, score_pairs_jw

CANON = [
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("dwayne", "duane", 0.84),
    ("crate", "trace", 0.7333333333333333),  # jaro <= boost threshold
    ("abc", "abc", 1.0),
    ("abc", "xyz", 0.0),
    ("", "", 0.0),  # DuckDB pin: empty-vs-empty is 0, not 1
    ("x", "", 0.0),
    ("ab", "ba", 0.0),  # window too small for any match
]


@pytest.mark.parametrize("s1,s2,want", CANON)
def test_jaro_winkler_canonical(s1, s2, want):
    assert jaro_winkler(s1, s2) == pytest.approx(want, abs=1e-12)


def test_jaro_winkler_matches_duckdb_exhaustively():
    # random-ish strings over a small alphabet: the python and C++
    # implementations must agree to float precision on every pair
    import itertools

    vals = ["", "a", "ab", "abc", "acb", "abcd", "abcdefgh", "bacdefgh",
            "Customer#01", "Customer#10", "xyzzy"]
    con = duckdb.connect()
    for s1, s2 in itertools.product(vals, repeat=2):
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [s1, s2]
        ).fetchone()[0]
        assert jaro_winkler(s1, s2) == pytest.approx(want, abs=1e-12), (s1, s2)


def test_udf_nulls_and_values(spark):
    df = spark.createDataFrame(
        [("martha", "marhta"), (None, "x"), ("x", None)],
        "a string, b string",
    )
    got = df.select(jaro_winkler_udf("a", "b").alias("s")).collect()
    assert got[0]["s"] == pytest.approx(0.9611111111111111)
    assert got[1]["s"] is None and got[2]["s"] is None


def test_score_pairs_jw_end_to_end(spark):
    rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),
        (3, "A", "completely other"),
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, nm string")
    pairs = candidate_pairs(
        df, id_col="rid", block_cols=["blk"], compare_col="nm"
    )
    got = {
        (r["id1"], r["id2"]): r["similarity"]
        for r in score_pairs_jw(pairs, min_similarity=0.9).collect()
    }
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] == pytest.approx(0.9714285714285714)


def test_score_pairs_jw_rejects_bad_floor(spark):
    df = spark.createDataFrame([(1, "A", "x")], "rid int, blk string, nm string")
    pairs = candidate_pairs(df, id_col="rid", block_cols=["blk"], compare_col="nm")
    with pytest.raises(ValueError, match="min_similarity"):
        score_pairs_jw(pairs, min_similarity=0.0)


def test_jw_plan_is_arrow_batched_not_rowwise(spark):
    df = spark.createDataFrame(
        [(i, "A", f"name{i}") for i in range(10)], "rid int, blk string, nm string"
    )
    pairs = candidate_pairs(df, id_col="rid", block_cols=["blk"], compare_col="nm")
    plan = (
        score_pairs_jw(pairs, min_similarity=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_phonetic_key_classic_soundex_cases(spark):
    from dedupe_spark.functions.strsim import phonetic_key

    rows = [(1, "martha"), (2, "marhta"), (3, "robert"), (4, "rupert"),
            (5, "small"), (6, ""), (7, None), (8, "123"), (9, "pfister")]
    df = spark.createDataFrame(rows, "i int, w string")
    got = {r["i"]: r["k"] for r in
           df.select("i", phonetic_key(F.col("w")).alias("k")).collect()}
    # classic Soundex agreement: M630 twice (typo pair!), R163 twice
    assert got[1] == "M630" and got[2] == "M630"
    assert got[3] == "R163" and got[4] == "R163"
    assert got[5] == "S540"
    assert got[6] is None and got[7] is None and got[8] is None
    assert got[9] == "P236"  # first-letter run merged (pf -> P2..)


def test_vectorized_batch_equals_scalar_on_random_strings():
    import random

    import numpy as np

    from dedupe_spark.functions.strsim import _jw_batch

    rng = random.Random(42)
    alpha = "abcdexyz #0189"
    pairs = []
    for _ in range(500):
        n1, n2 = rng.randint(0, 12), rng.randint(0, 12)
        pairs.append(
            ("".join(rng.choice(alpha) for _ in range(n1)),
             "".join(rng.choice(alpha) for _ in range(n2)))
        )
    # adversarial shapes: long common prefixes, transposition soup, pads
    pairs += [("aaaaaaaaaaaa", "aaaaaaaaaaab"), ("abcdefgh", "badcfehg"),
              ("abcd", "abcdxxxxxxxxxxxxxxxx"), ("", ""), ("", "abc")]
    left = np.array([p[0] for p in pairs], dtype=object)
    right = np.array([p[1] for p in pairs], dtype=object)
    got = _jw_batch(left, right)
    for k, (s1, s2) in enumerate(pairs):
        assert got[k] == pytest.approx(jaro_winkler(s1, s2), abs=1e-12), (
            s1, s2, got[k], jaro_winkler(s1, s2)
        )


def test_vectorized_batch_all_empty():
    import numpy as np

    from dedupe_spark.functions.strsim import _jw_batch

    out = _jw_batch(np.array(["", ""], dtype=object),
                    np.array(["", "x"], dtype=object))
    assert list(out) == [0.0, 0.0]


def test_udf_nul_strings_take_scalar_path(spark):
    # numpy U-storage truncates trailing NULs; the UDF must route
    # NUL-bearing strings through the scalar reference
    df = spark.createDataFrame(
        [("a\x00", "a b"), ("a\x00b", "a\x00b"), ("martha", "marhta")],
        "a string, b string",
    )
    got = [r["s"] for r in df.select(jaro_winkler_udf("a", "b").alias("s")).collect()]
    assert got[0] == pytest.approx(jaro_winkler("a\x00", "a b"), abs=1e-12)
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(0.9611111111111111)


def test_jw_hypothesis_vectorized_equals_scalar():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import numpy as np

    from dedupe_spark.functions.strsim import _jw_batch

    alphabet = st.characters(
        min_codepoint=1, max_codepoint=0x2FF  # latin + extensions, no NUL
    )
    strs = st.text(alphabet=alphabet, min_size=0, max_size=24)

    @settings(max_examples=300, deadline=None)
    @given(st.lists(st.tuples(strs, strs), min_size=1, max_size=40))
    def inner(pairs):
        left = np.array([p[0] for p in pairs], dtype=object)
        right = np.array([p[1] for p in pairs], dtype=object)
        got = _jw_batch(left, right)
        for k, (s1, s2) in enumerate(pairs):
            want = jaro_winkler(s1, s2)
            assert got[k] == pytest.approx(want, abs=1e-12), (s1, s2)

    inner()
