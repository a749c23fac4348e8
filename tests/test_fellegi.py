"""Fellegi–Sunter probabilistic linkage: closed-form u estimation,
weight arithmetic, missing-field zero-evidence, EM recovery on planted
two-class data, and the full link arc on planted duplicates."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.fellegi import (
    agreement_patterns,
    estimate_m_u,
    estimate_u,
    field_pairs,
    fs_link,
    fs_score,
    u_probabilities,
)


def _tbl(spark):
    # city: 2×a, 2×b, 1 null over n=5 → u = (1+1)/C(5,2) = 0.2
    # seg:  3×x, 2×y             → u = (3+1)/10 = 0.4
    rows = [
        (1, "a", "x"),
        (2, "a", "x"),
        (3, "b", "x"),
        (4, "b", "y"),
        (5, None, "y"),
    ]
    return spark.createDataFrame(rows, "rid int, city string, seg string")


def test_u_probabilities_closed_form(spark):
    got = {
        r["field"]: r
        for r in u_probabilities(_tbl(spark), fields=["city", "seg"]).collect()
    }
    assert got["city"]["n"] == 5 and got["city"]["n_nonnull"] == 4
    assert got["city"]["n_distinct"] == 2
    assert got["city"]["u"] == pytest.approx(0.2)
    assert got["seg"]["n_distinct"] == 2
    assert got["seg"]["u"] == pytest.approx(0.4)


def test_estimate_u_clamps_and_matches(spark):
    u = estimate_u(_tbl(spark), fields=["city", "rid"])
    assert u["city"] == pytest.approx(0.2)
    # rid is all-distinct → raw u = 0, clamped into (0,1)
    assert 0.0 < u["rid"] < 1e-6


def test_fs_score_weights_and_missing_zero_evidence(spark):
    df = spark.createDataFrame(
        [(1, "B", "a", "x"), (2, "B", "a", "y"), (3, "B", None, "x")],
        "rid int, blk string, city string, seg string",
    )
    m = {"city": 0.9, "seg": 0.8}
    u = {"city": 0.2, "seg": 0.4}
    pairs = field_pairs(
        df, id_col="rid", block_cols=["blk"], fields=["city", "seg"]
    )
    scored = {
        (r["id1"], r["id2"]): r
        for r in fs_score(
            pairs, fields=["city", "seg"], m=m, u=u, prior=0.5
        ).collect()
    }
    assert len(scored) == 3
    w12 = math.log2(0.9 / 0.2) + math.log2(0.2 / 0.6)
    assert scored[(1, 2)]["match_weight"] == pytest.approx(w12)
    # pair (1,3): city missing on one side → zero evidence, only seg votes
    w13 = math.log2(0.8 / 0.4)
    assert scored[(1, 3)]["match_weight"] == pytest.approx(w13)
    assert scored[(1, 3)]["agree_city"] is None
    # posterior via odds form at prior 0.5: p = 2^w / (1 + 2^w)
    p13 = 2.0**w13 / (1.0 + 2.0**w13)
    assert scored[(1, 3)]["match_probability"] == pytest.approx(p13)


def test_fs_score_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "B", "a")], "rid int, blk string, c string")
    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=["c"])
    with pytest.raises(ValueError, match="missing"):
        fs_score(pairs, fields=["c"], m={}, u={"c": 0.1})
    with pytest.raises(ValueError, match="in \\(0,1\\)"):
        fs_score(pairs, fields=["c"], m={"c": 1.0}, u={"c": 0.1})
    with pytest.raises(ValueError, match="prior"):
        fs_score(
            pairs, fields=["c"], m={"c": 0.9}, u={"c": 0.1}, prior=1.5
        )


def test_fs_link_planted_duplicates(spark):
    # family {1,2,3} agrees on both fields (transitively via 2);
    # 4 is a singleton; 5/6 agree only on seg (weak, below threshold)
    rows = [
        (1, "B", "elm", "x"),
        (2, "B", "elm", "x"),
        (3, "B", "elm", "x"),
        (4, "B", "oak", "q"),
        (5, "B", "ash", "y"),
        (6, "B", "fir", "y"),
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, city string, seg string")
    m = {"city": 0.95, "seg": 0.95}
    out = fs_link(
        df,
        id_col="rid",
        block_cols=["blk"],
        fields=["city", "seg"],
        m=m,
        threshold_weight=4.0,
    )
    got = {r["id"]: r for r in out.collect()}
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == got[3]["cluster_id"] == 1
    assert got[1]["cluster_size"] == 3 and got[1]["is_representative"]
    assert not got[2]["is_representative"]
    for rid in (4, 5, 6):
        assert got[rid]["cluster_id"] is None


def test_em_recovers_planted_m_u(spark):
    # Planted generative model over THREE fields — the classic
    # identifiability minimum for a 2-class product-Bernoulli mixture
    # (2 fields give 3 free pattern counts vs 5 parameters; 3 fields
    # give 7 vs 7 — Winkler 1988 fits exactly this model). Contingency
    # counts are the exact expectations, so EM should land on the truth.
    import itertools

    m_true = {"a": 0.9, "b": 0.85, "c": 0.95}
    u_true = {"a": 0.1, "b": 0.3, "c": 0.05}
    lam_true = 0.1
    n = 100000
    rows = []
    for pa, pb, pc in itertools.product([True, False], repeat=3):
        cnt_m = n * lam_true
        cnt_u = n * (1 - lam_true)
        for f, ag in zip("abc", (pa, pb, pc)):
            cnt_m *= m_true[f] if ag else 1 - m_true[f]
            cnt_u *= u_true[f] if ag else 1 - u_true[f]
        rows.append(
            {
                "agree_a": pa,
                "agree_b": pb,
                "agree_c": pc,
                "n_pairs": cnt_m + cnt_u,
            }
        )
    m, u, lam = estimate_m_u(rows, fields=["a", "b", "c"], n_iter=500)
    for f in "abc":
        assert m[f] == pytest.approx(m_true[f], abs=0.02), f
        assert u[f] == pytest.approx(u_true[f], abs=0.02), f
    assert lam == pytest.approx(lam_true, abs=0.02)


def test_agreement_patterns_bounded(spark):
    df = spark.createDataFrame(
        [(i, "B", f"c{i % 2}", f"s{i % 3}") for i in range(20)],
        "rid int, blk string, city string, seg string",
    )
    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=["city", "seg"])
    scored = fs_score(
        pairs, fields=["city", "seg"], m={"city": 0.9, "seg": 0.9},
        u={"city": 0.5, "seg": 0.33},
    )
    pats = agreement_patterns(scored, fields=["city", "seg"]).collect()
    assert len(pats) <= 4  # no nulls in this table
    assert sum(r["n_pairs"] for r in pats) == 190  # C(20,2)


def test_em_rejects_too_many_fields(spark):
    with pytest.raises(ValueError, match="at most"):
        estimate_m_u(
            [], fields=[f"f{i}" for i in range(17)], n_iter=1
        )


def test_field_pairs_skew_guard(spark):
    # block H has 50 rows (over cap), block S has 3 → only S pairs
    # survive under the hard-drop (window=None) mode
    rows = [(i, "H", "v") for i in range(50)] + [
        (100, "S", "v"), (101, "S", "v"), (102, "S", "w")
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, f string")
    pairs = field_pairs(
        df, id_col="rid", block_cols=["blk"], fields=["f"], max_block=10,
        hot_block_window=None,
    ).collect()
    assert len(pairs) == 3
    assert all(r["blk"] == "S" for r in pairs)


def test_field_pairs_hot_block_snm_fallback_multi_field(spark):
    """Over-cap blocks degrade to O(n·w) SNM candidates with EVERY
    comparison field carried on both sides, and fs_link finds matches
    inside the hot block via the global-CC routing."""
    # 60-row hot block: distinct first-field values except one planted
    # twin pair; second field rotates so multi-field carry is exercised
    hot = [
        (i, "H", f"{i:04d}name", f"s{i % 3}") for i in range(60)
    ] + [(200, "H", "0007name", "s1")]  # exact f-match with rid 7
    cold = [(100, "S", "abc", "s0"), (101, "S", "abc", "s1")]
    df = spark.createDataFrame(
        hot + cold, "rid int, blk string, f string, g string"
    )
    pairs = field_pairs(
        df, id_col="rid", block_cols=["blk"], fields=["f", "g"],
        max_block=10, hot_block_window=3,
    )
    got = pairs.collect()
    by_pair = {(r["id1"], r["id2"]): r for r in got}
    # planted twins sort adjacently -> candidate exists with both fields
    assert (7, 200) in by_pair
    r = by_pair[(7, 200)]
    assert r["from_hot_block"] is True
    assert r["l_f"] == r["r_f"] == "0007name"
    assert {r["l_g"], r["r_g"]} == {"s1"}  # rid 7 has g = s1 (7 % 3)
    assert all(p["id1"] < p["id2"] for p in got)
    # cold path untouched
    assert (100, 101) in by_pair
    assert by_pair[(100, 101)]["from_hot_block"] is False
    # O(n·w) bound
    n_hot = sum(1 for p in got if p["from_hot_block"])
    assert 0 < n_hot < 61 * 2

    # end-to-end: fs_link clusters the planted twins (agree on f AND g
    # -> weight far above threshold; everything else disagrees on f)
    out = fs_link(
        df, id_col="rid", block_cols=["blk"], fields=["f", "g"],
        m={"f": 0.95, "g": 0.9}, threshold_weight=4.0,
        max_block=10, hot_block_window=3,
    )
    assign = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert assign[7] == assign[200] == 7


def test_fs_plan_is_jvm_only(spark):
    """Scoring must be a pure codegen projection: no Python eval, no
    joins beyond the blocked equi-join and broadcast skew guard."""
    df = spark.createDataFrame(
        [(i, f"b{i % 3}", f"c{i % 4}", f"s{i % 2}") for i in range(30)],
        "rid int, blk string, city string, seg string",
    )
    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=["city", "seg"])
    scored = fs_score(
        pairs, fields=["city", "seg"], m={"city": 0.9, "seg": 0.9},
        u={"city": 0.25, "seg": 0.5}, prior=0.01,
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_tf_adjustment_rare_value_outweighs_common(spark):
    # value "zz" appears once-ish, "aa" dominates: agreeing on zz must
    # earn strictly more weight than agreeing on aa
    rows = (
        [(i, "B", "aa") for i in range(8)]
        + [(100, "B", "zz"), (101, "B", "zz")]
    )
    df = spark.createDataFrame(rows, "rid int, blk string, sfx string")
    pairs = field_pairs(
        df, id_col="rid", block_cols=["blk"], fields=["sfx"],
        tf_fields=["sfx"],
    )
    scored = fs_score(
        pairs, fields=["sfx"], m={"sfx": 0.9}, u={"sfx": 0.5},
        tf_fields=["sfx"],
    )
    got = {(r["id1"], r["id2"]): r["match_weight"] for r in scored.collect()}
    import math
    w_zz = math.log2(0.9 / (2 / 10))
    w_aa = math.log2(0.9 / (8 / 10))
    assert got[(100, 101)] == pytest.approx(w_zz)
    assert got[(0, 1)] == pytest.approx(w_aa)
    assert got[(100, 101)] > got[(0, 1)]
    # disagreement still uses the field-level u
    w_dis = math.log2(0.1 / 0.5)
    assert got[(0, 100)] == pytest.approx(w_dis)


def test_tf_fields_must_be_subset(spark):
    df = spark.createDataFrame([(1, "B", "a")], "rid int, blk string, f string")
    with pytest.raises(ValueError, match="tf_fields"):
        field_pairs(df, id_col="rid", block_cols=["blk"], fields=["f"],
                    tf_fields=["nope"])
    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=["f"])
    with pytest.raises(ValueError, match="tf_fields"):
        fs_score(pairs, fields=["f"], m={"f": 0.9}, u={"f": 0.1},
                 tf_fields=["nope"])


def test_em_trained_link_end_to_end(spark):
    """Unsupervised FS: estimate m/u by EM from the data's own agreement
    patterns, then link with the learned weights — planted duplicate
    families must come out as clusters without any hand-set m."""
    rows = []
    # 10 duplicate families of 3 (agree on all three fields) + 60
    # background singletons. THREE fields: the 2-class product-Bernoulli
    # mixture is only identifiable from 3+ fields (7 free pattern counts
    # vs 7 params) — with 2, EM lands on a different local optimum.
    for g in range(10):
        for k in range(3):
            rows.append((g * 10 + k, "B", f"city{g}", f"seg{g % 5}",
                         f"zip{g}"))
    for i in range(60):
        rows.append((1000 + i, "B", f"bg{i}", f"seg{i % 5}", f"zx{i}"))
    df = spark.createDataFrame(
        rows, "rid int, blk string, city string, seg string, zip string"
    )
    FIELDS = ["city", "seg", "zip"]

    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=FIELDS)
    # bootstrap scoring only to materialize agreement flags for EM
    boot = fs_score(pairs, fields=FIELDS,
                    m={f: 0.9 for f in FIELDS}, u={f: 0.1 for f in FIELDS})
    pats = agreement_patterns(boot, fields=FIELDS)
    m, u, lam = estimate_m_u(pats, fields=FIELDS, n_iter=100)
    # matches agree on city/zip; random pairs rarely share either
    assert m["city"] > 0.9 and u["city"] < 0.05
    assert m["zip"] > 0.9 and u["zip"] < 0.05

    out = fs_link(df, id_col="rid", block_cols=["blk"],
                  fields=FIELDS, m=m, u=u, threshold_weight=4.0)
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    for g in range(10):
        base = g * 10
        assert got[base] == got[base + 1] == got[base + 2] == base
    assert all(got[1000 + i] is None for i in range(60))


def test_graded_levels_first_match_wins_and_weights(spark):
    from dedupe_spark.operators.fellegi import GradedLevel, fs_score_graded

    df = spark.createDataFrame(
        [(1, "B", "abc"), (2, "B", "abc"), (3, "B", "abd"), (4, "B", None)],
        "rid int, blk string, nm string",
    )
    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=["nm"])
    graded = {
        "nm": [
            GradedLevel("exact", lambda l, r: l == r, 0.6, 0.01),
            GradedLevel("lev1",
                        lambda l, r: F.levenshtein(l, r, 1).between(0, 1),
                        0.3, 0.09),
            GradedLevel("else", None, 0.1, 0.9),
        ]
    }
    got = {(r["id1"], r["id2"]): r for r in
           fs_score_graded(pairs, graded=graded, prior=0.5).collect()}
    # exact fires FIRST even though lev1's condition is also true
    assert got[(1, 2)]["level_nm"] == "exact"
    assert got[(1, 2)]["match_weight"] == pytest.approx(math.log2(0.6 / 0.01))
    assert got[(1, 3)]["level_nm"] == "lev1"
    assert got[(1, 3)]["match_weight"] == pytest.approx(math.log2(0.3 / 0.09))
    assert got[(1, 4)]["level_nm"] == "missing"
    assert got[(1, 4)]["match_weight"] == 0.0
    w = math.log2(0.6 / 0.01)
    assert got[(1, 2)]["match_probability"] == pytest.approx(
        2.0**w / (1 + 2.0**w))


def test_graded_levels_validation(spark):
    from dedupe_spark.operators.fellegi import GradedLevel, fs_score_graded

    df = spark.createDataFrame([(1, "B", "x")], "rid int, blk string, nm string")
    pairs = field_pairs(df, id_col="rid", block_cols=["blk"], fields=["nm"])
    eq = lambda l, r: l == r  # noqa: E731
    with pytest.raises(ValueError, match="catch-all"):
        fs_score_graded(pairs, graded={"nm": [GradedLevel("a", eq, 0.5, 0.5)]})
    with pytest.raises(ValueError, match="only the last"):
        fs_score_graded(pairs, graded={"nm": [
            GradedLevel("a", None, 0.5, 0.5),
            GradedLevel("b", None, 0.5, 0.5)]})
    with pytest.raises(ValueError, match="must be 1"):
        fs_score_graded(pairs, graded={"nm": [
            GradedLevel("a", eq, 0.5, 0.4),
            GradedLevel("b", None, 0.4, 0.6)]})
    with pytest.raises(ValueError, match="not in"):
        fs_score_graded(pairs, graded={"nm": [
            GradedLevel("a", eq, 1.5, 0.4),
            GradedLevel("b", None, -0.5, 0.6)]})
