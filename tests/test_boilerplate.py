"""Planted-case tests for C4/CCNet-style line-level boilerplate removal."""

from __future__ import annotations

import pytest

from dedupe_spark.operators.boilerplate import (
    boilerplate_lines,
    remove_boilerplate_lines,
)

BANNER = "== SITE NAV =="


def _docs(spark):
    # banner in 3 docs (df=3 > 2 -> banned); "shared twice" in 2 (kept);
    # doc 4 is banner-only; blank lines are structure, never banned.
    rows = [
        (1, f"{BANNER}\nunique alpha line\n\nshared twice"),
        (2, f"  {BANNER}  \nanother unique line\nshared twice"),
        (3, f"{BANNER}\nthird unique body"),
        (4, BANNER),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_banned_set(spark):
    banned = {
        r["line"]: r["doc_freq"]
        for r in boilerplate_lines(_docs(spark), max_docs=2).collect()
    }
    assert banned == {BANNER: 4}


def test_removal_preserves_order_whitespace_and_rows(spark):
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate_lines(_docs(spark), max_docs=2).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # row count preserved
    # banner gone (trimmed match caught the indented copy in doc 2),
    # surviving lines keep original form and order, blank line survives
    assert out[1]["text"] == "unique alpha line\n\nshared twice"
    assert out[2]["text"] == "another unique line\nshared twice"
    assert out[3]["text"] == "third unique body"
    assert out[4]["text"] == ""  # all-banned doc survives, empty
    assert out[1]["n_lines"] == 4 and out[1]["n_removed"] == 1
    assert out[4]["n_lines"] == 1 and out[4]["n_removed"] == 1


def test_per_doc_repeats_do_not_ban(spark):
    # one doc repeating its own divider 5x: df=1, never banned
    docs = spark.createDataFrame(
        [(1, "\n".join(["----"] * 5 + ["body"])), (2, "other\n----")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(docs).collect()}
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_max_banned_cap_raises(spark):
    docs = spark.createDataFrame(
        [(i, "hot line one\nhot line two") for i in range(4)],
        ["doc_id", "text"],
    )
    with pytest.raises(ValueError, match="max_banned"):
        remove_boilerplate_lines(docs, max_docs=2, max_banned=1)
