"""Planted-case tests for paragraph-level first-occurrence dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.paradedup import dedupe_paragraphs


def _docs(spark):
    # "repeated para" appears in docs 1 (pos 0), 2 (pos 1), and twice in
    # doc 3 — only the doc-1 occurrence may survive. "  repeated para  "
    # in doc 2 trims to the same key. Blank separator lines always
    # survive. Doc 4 is entirely made of already-seen paragraphs.
    rows = [
        (1, "repeated para\nunique one"),
        (2, "unique two\n  repeated para  \n\nunique three"),
        (3, "repeated para\nrepeated para\nunique four"),
        (4, "repeated para"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_first_occurrence_survives_later_dropped(spark):
    out = {
        r["doc_id"]: r for r in dedupe_paragraphs(_docs(spark)).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # row count preserved
    assert out[1]["text"] == "repeated para\nunique one"
    assert out[1]["n_dropped"] == 0
    # doc 2: its trimmed duplicate goes, original whitespace of survivors
    # and the blank structural line are intact
    assert out[2]["text"] == "unique two\n\nunique three"
    assert out[2]["n_paras"] == 4 and out[2]["n_dropped"] == 1
    # doc 3: both occurrences seen earlier -> dropped
    assert out[3]["text"] == "unique four"
    assert out[3]["n_dropped"] == 2
    # doc 4: everything seen -> empty text, row kept
    assert out[4]["text"] == "" and out[4]["n_dropped"] == 1


def test_each_paragraph_kept_exactly_once_corpus_wide(spark):
    out = dedupe_paragraphs(_docs(spark))
    survivors = out.select(
        F.explode(F.split("text", "\n")).alias("p")
    ).filter(F.trim("p") != "")
    dupes = (
        survivors.groupBy(F.trim("p").alias("k"))
        .count()
        .filter(F.col("count") > 1)
        .collect()
    )
    assert dupes == []


def test_deterministic_under_input_order(spark):
    a = dedupe_paragraphs(_docs(spark)).orderBy("doc_id").collect()
    b = (
        dedupe_paragraphs(_docs(spark).orderBy(F.desc("doc_id")))
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def test_regex_significant_separator_is_literal(spark):
    """`sep` must be treated as a LITERAL on both the split and the rejoin
    ('.' is regex-all, '||' matches empty) — a regex split with a literal
    join garbles the text."""
    docs = spark.createDataFrame(
        [(1, "alpha beta||gamma"), (2, "gamma||alpha beta")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["text"]
        for r in dedupe_paragraphs(docs, sep="||").collect()
    }
    assert out[1] == "alpha beta||gamma"
    assert out[2] == ""  # both paragraphs already seen in doc 1 — all drop
