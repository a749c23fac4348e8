"""Planted-case tests for benchmark decontamination and the per-language
quality-percentile gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.decontam import decontaminate, ngram_array
from dedupe_spark.operators.textstats import quality_percentile_filter


def test_ngram_array_planted(spark):
    df = spark.createDataFrame(
        [(1, "A b  c d"), (2, "x y"), (3, "w w w w")], ["id", "text"]
    )
    got = {
        r["id"]: sorted(r["g"])
        for r in df.select("id", ngram_array(F.col("text"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b c", "b c d"]  # lowercased, multi-space collapsed
    assert got[2] == []  # shorter than n -> empty, not null
    assert got[3] == ["w w w"]  # distinct


def test_decontaminate_planted(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # shares grams "beta gamma delta" and "gamma delta epsilon"
            (1, "zz beta gamma delta epsilon yy"),
            (2, "totally unrelated words here now"),
            (3, "two words"),  # < n tokens: zero grams, still present
        ],
        ["doc_id", "text"],
    )
    rows = {
        r["doc_id"]: r
        for r in decontaminate(corpus, bench, n=3, min_overlap=1).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["contaminated"] and rows[1]["matched_grams"] == 2
    assert rows[1]["n_grams"] == 4
    assert not rows[2]["contaminated"] and rows[2]["matched_grams"] == 0
    assert rows[3]["n_grams"] == 0 and not rows[3]["contaminated"]


def test_decontaminate_min_overlap(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [(1, "zz beta gamma delta yy")], ["doc_id", "text"]  # exactly 1 hit
    )
    out = decontaminate(corpus, bench, n=3, min_overlap=2).collect()[0]
    assert out["matched_grams"] == 1 and not out["contaminated"]


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_quality_filter_keeps_top_fraction(spark):
    # 10 docs per lang with strictly increasing quality (longer = higher
    # length/word scores); keep_frac=0.4 with the ceil rule keeps exactly
    # the top 4 of 10 when all scores are distinct.
    rows = []
    for lang in ("en", "fr"):
        for i in range(10):
            text = " ".join(f"{lang}tok{j}" for j in range(5 + i * 20))
            rows.append((i if lang == "en" else 100 + i, lang, text))
    docs = _mk_docs(spark, rows)
    kept = quality_percentile_filter(docs, keep_frac=0.4)
    got = {r["doc_id"] for r in kept.collect()}
    assert got == {6, 7, 8, 9, 106, 107, 108, 109}


def test_quality_filter_tie_inclusive_and_keep_all(spark):
    # all-identical scores: threshold is that score, everything survives
    docs = _mk_docs(spark, [(i, "en", "same words here") for i in range(5)])
    assert quality_percentile_filter(docs, keep_frac=0.4).count() == 5
    assert quality_percentile_filter(docs, keep_frac=1.0).count() == 5


def test_quality_filter_no_cross_lang_bleed(spark):
    # one lang all-short (low scores), one all-long: a global threshold
    # would kill every short-lang doc; the per-group gate keeps its top 40%
    rows = [(i, "en", "a b") for i in range(10)]
    rows += [(100 + i, "fr", " ".join(f"w{j}" for j in range(200))) for i in range(10)]
    kept = quality_percentile_filter(_mk_docs(spark, rows), keep_frac=0.4)
    by_lang = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    # ties within each lang (identical scores) -> everything at the
    # threshold survives, but crucially BOTH langs keep rows
    assert by_lang.get("en", 0) >= 4 and by_lang.get("fr", 0) >= 4


def _long_text(seed: str, n: int = 60) -> str:
    return " ".join(f"{seed}{i}" for i in range(n))


def test_cross_dedupe_planted(spark):
    from dedupe_spark.operators.decontam import cross_dedupe

    text_a = _long_text("alpha")
    text_b = _long_text("beta")
    near_a = text_a.replace("alpha30", "CHANGED")  # 1 of 60 tokens differs
    ref = spark.createDataFrame(
        [(100, text_a), (105, text_b)], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            (1, text_a),               # exact copy of ref 100
            (2, near_a),               # near-dup of ref 100
            (3, _long_text("gamma")),  # unrelated
            (4, ""),                   # errored (empty content)
        ],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r for r in cross_dedupe(corpus, ref).collect()}
    assert len(rows) == 4
    assert (rows["1"]["match_kind"], rows["1"]["ref_id"]) == ("exact", "100")
    assert (rows["2"]["match_kind"], rows["2"]["ref_id"]) == ("near", "100")
    assert rows["3"]["matched"] is False and rows["3"]["ref_id"] is None
    assert rows["4"]["matched"] is False and rows["4"]["match_kind"] is None


def test_cross_dedupe_min_ref_and_no_broadcast(spark):
    """Two refs share the corpus doc's text: ref_id = min id; the shuffle
    (non-broadcast) path returns the identical frame."""
    from dedupe_spark.operators.decontam import cross_dedupe

    text = _long_text("delta")
    ref = spark.createDataFrame(
        [(300, text), (200, text)], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    a = cross_dedupe(corpus, ref).collect()
    assert [(r["id"], r["match_kind"], r["ref_id"]) for r in a] == [
        ("1", "exact", "200")
    ]
    b = cross_dedupe(corpus, ref, broadcast_reference=False).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cross_dedupe_empty_sides(spark):
    """Empty reference ⇒ nothing matches; empty corpus ⇒ empty output —
    neither side crashes the fingerprint/centroid machinery."""
    from dedupe_spark.operators.decontam import cross_dedupe

    schema = "doc_id long, text string"
    corpus = spark.createDataFrame([(1, _long_text("eps"))], schema)
    empty = spark.createDataFrame([], schema)
    rows = cross_dedupe(corpus, empty).collect()
    assert [(r["id"], r["matched"], r["ref_id"]) for r in rows] == [("1", False, None)]
    assert cross_dedupe(empty, corpus).count() == 0


def test_quality_filter_null_group_rows_survive(spark):
    """Docs with a NULL group value form their own group (the gate applies
    to the ungrouped class too) — a plain equi-join would silently drop
    every one of them regardless of score."""
    rows = [(i, "en", " ".join(f"t{j}" for j in range(5 + i * 20))) for i in range(10)]
    rows += [(100 + i, None, " ".join(f"n{j}" for j in range(5 + i * 20))) for i in range(10)]
    kept = quality_percentile_filter(_mk_docs(spark, rows), keep_frac=0.4)
    got = {r["doc_id"] for r in kept.collect()}
    assert got == {6, 7, 8, 9, 106, 107, 108, 109}
