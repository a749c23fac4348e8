"""Unit tests for text-analysis operators (quality, lang-ID, fingerprints).

Mirrors the reference's closed-form quality-formula validation
(/root/reference/tests/test_quality_assessor.py:42-67, 242-278): known
inputs → hand-computed expected scores.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dedupe_spark.operators.textstats import (
    shingle_fingerprints,
    with_language_id,
    with_quality_score,
    with_token_counts,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


def test_token_counts_closed_form(spark):
    rows = with_token_counts(
        _df(spark, ["hello world", "a+b=c2", "  x  y  "]), "text"
    ).orderBy("doc_id").collect()
    assert [r["ws_tokens"] for r in rows] == [2, 1, 2]
    # a+b=c2 → [a][+][b][=][c][2] = 6 BPE-ish tokens
    assert rows[1]["bpe_tokens"] == 6


def test_quality_score_closed_form(spark):
    text = "the value of and to"  # 19 chars, 5 words, all stopwords, no punct
    r = with_quality_score(_df(spark, [text]), "text").first()
    exp_len = min(100.0, math.log10(19) / 4 * 100)
    exp_word = min(100.0, math.log10(6) / 3 * 100)
    assert abs(r["length_score"] - round(exp_len, 4)) < 1e-9
    assert abs(r["word_score"] - round(exp_word, 4)) < 1e-9
    assert r["stopword_ratio"] == 1.0
    assert r["punct_ratio"] == 0.0
    exp_q = max(0.0, 0.35 * exp_len + 0.35 * exp_word + 30 * 1.0)
    assert abs(r["quality_score"] - round(exp_q, 4)) < 1e-3


def test_quality_clamped_at_zero(spark):
    r = with_quality_score(_df(spark, ["!!!!"]), "text").first()
    assert r["quality_score"] == 0.0


def test_language_id(spark):
    rows = (
        with_language_id(
            _df(
                spark,
                [
                    "the value of the table is in the row",
                    "le chat et la table est de une les",
                    "el perro y los gatos es una de",
                    "der hund und die katze ist ein von zu",
                    "zzz qqq www",
                ],
            )
        )
        .orderBy("doc_id")
        .collect()
    )
    assert [r["pred_lang"] for r in rows] == ["en", "fr", "es", "de", "und"]


def test_lang_id_tie_prefers_dict_order(spark):
    # 'de' appears in both fr and es lists; one-word doc ties fr=es=1 → fr wins
    r = with_language_id(_df(spark, ["de"])).first()
    assert r["pred_lang"] == "fr"


def test_shingle_fingerprint_deterministic_and_sensitive(spark):
    texts = ["a b c d e", "a b c d e", "q w e r t"]
    fp = {
        r["id"]: (r["fingerprint"], r["n_distinct_shingles"])
        for r in shingle_fingerprints(_df(spark, texts), "doc_id", "text", k=3).collect()
    }
    assert fp[0] == fp[1]  # identical text → identical fingerprint
    assert fp[0][1] == 3  # 'a b c','b c d','c d e'
    assert fp[0] != fp[2]  # disjoint shingle sets → different fingerprint


def test_short_doc_yields_no_full_shingles(spark):
    out = shingle_fingerprints(_df(spark, ["a b"]), "doc_id", "text", k=3)
    assert out.count() == 0


def test_repetition_stats_closed_form(spark):
    from dedupe_spark.operators.textstats import repetition_stats

    # doc 0: "a a a b" — top word 'a' 3/4; bigrams [a a, a a, a b] top 2/3;
    #        trigrams [a a a, a a b] all distinct → dup frac 0
    # doc 1: "x y x y x y" — top word 3/6; top bigram 'x y' 3/5;
    #        trigrams [x y x, y x y, x y x, y x y] 4 slots 2 distinct → 0.5
    # doc 2: "q w" — too short for trigrams → NULL dup_trigram_frac
    rows = (
        repetition_stats(_df(spark, ["a a a b", "x y x y x y", "q w"]))
        .orderBy("doc_id")
        .collect()
    )
    assert rows[0]["top_word_frac"] == 0.75
    assert rows[0]["top_bigram_frac"] == round(2 / 3, 4)
    assert rows[0]["dup_trigram_frac"] == 0.0
    assert rows[1]["top_word_frac"] == 0.5
    assert rows[1]["top_bigram_frac"] == 0.6
    assert rows[1]["dup_trigram_frac"] == 0.5
    assert rows[2]["dup_trigram_frac"] is None
    assert rows[2]["top_bigram_frac"] == 1.0  # single bigram 'q w'


def test_repetition_stats_single_token_doc(spark):
    from dedupe_spark.operators.textstats import repetition_stats

    r = repetition_stats(_df(spark, ["solo"])).first()
    assert r["top_word_frac"] == 1.0
    assert r["top_bigram_frac"] is None
    assert r["dup_trigram_frac"] is None


def test_lm_score_closed_form(spark):
    """Hand-computed add-0.5 bigram LM on a 5-doc corpus, including the
    degenerate rows (single token, empty text, null text)."""
    import math

    from dedupe_spark.operators.textstats import lm_score

    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "x"), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in lm_score(df).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # model: c2("a b")=3, c2("b a")=1; c1(a)=3, c1(b)=1; vocab {a,b,x,''} v=4
    p_ab = math.log((3 + 0.5) / (3 + 0.5 * 4))   # 0.7
    p_ba = math.log((1 + 0.5) / (1 + 0.5 * 4))   # 0.5
    assert out[1]["n_bigrams"] == 3
    assert out[1]["lm_logp"] == round((2 * p_ab + p_ba) / 3, 4)
    assert out[2]["n_bigrams"] == 1
    assert out[2]["lm_logp"] == round(p_ab, 4)
    for i in (3, 4, 5):  # <2 tokens: no bigrams, null score
        assert out[i]["n_bigrams"] == 0 and out[i]["lm_logp"] is None


def test_lm_score_ranks_repetition_above_gibberish(spark):
    """The model trained on the corpus assigns higher mean log-prob to the
    dominant pattern than to a one-off token salad — the property the
    CCNet perplexity bucket actually uses."""
    from dedupe_spark.operators.textstats import lm_score

    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((99, "zq vx wk jj pq mn"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lm_logp"] for r in lm_score(df).collect()}
    assert out[0] > out[99]
