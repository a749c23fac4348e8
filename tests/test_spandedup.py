"""Planted-case tests for repeated-span (windowed exact-substring) dedup."""

from __future__ import annotations

from dedupe_spark.operators.spandedup import dedupe_spans


def _tok(n, prefix="w"):
    return " ".join(f"{prefix}{i}" for i in range(n))


def _run(spark, rows, window=8):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        r["doc_id"]: r
        for r in dedupe_spans(df, window=window).collect()
    }


def test_cross_doc_span_removed_first_survives(spark):
    # docs 1 and 2 share an 8-token run; doc 1 (smaller id) keeps it
    shared = _tok(8, "s")
    out = _run(
        spark,
        [
            (1, f"{_tok(3, 'a')} {shared} {_tok(3, 'b')}"),
            (2, f"{_tok(5, 'c')} {shared} {_tok(2, 'd')}"),
        ],
    )
    assert out[1]["text"] == f"{_tok(3, 'a')} {shared} {_tok(3, 'b')}"
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == f"{_tok(5, 'c')} {_tok(2, 'd')}"
    assert out[2]["n_tokens"] == 15 and out[2]["n_removed"] == 8


def test_long_shared_run_fully_removed_not_just_one_window(spark):
    # a 12-token shared run is covered by 5 overlapping 8-windows; the
    # whole run must go from the later doc, not just the first 8 tokens
    shared = _tok(12, "s")
    out = _run(
        spark,
        [(1, f"{shared} {_tok(2, 'a')}"), (2, f"{_tok(2, 'b')} {shared}")],
    )
    assert out[1]["n_removed"] == 0
    assert out[2]["text"] == _tok(2, "b")
    assert out[2]["n_removed"] == 12


def test_within_doc_repeat_keeps_earliest_position(spark):
    span = _tok(8, "s")
    out = _run(spark, [(1, f"{span} {_tok(3, 'mid')} {span}")])
    assert out[1]["text"] == f"{span} {_tok(3, 'mid')}"
    assert out[1]["n_tokens"] == 19 and out[1]["n_removed"] == 8


def test_exact_duplicate_docs_collapse_to_one_copy(spark):
    body = _tok(20, "x")
    out = _run(spark, [(1, body), (2, body), (3, body)])
    assert out[1]["text"] == body and out[1]["n_removed"] == 0
    assert out[2]["text"] == "" and out[2]["n_removed"] == 20
    assert out[3]["text"] == "" and out[3]["n_removed"] == 20


def test_short_docs_below_window_survive_untouched(spark):
    # 7 tokens < window=8: no windows, even identical docs both survive
    body = _tok(7, "x")
    out = _run(spark, [(1, body), (2, body), (3, "")])
    assert out[1]["text"] == body and out[1]["n_removed"] == 0
    assert out[2]["text"] == body and out[2]["n_removed"] == 0
    assert out[3]["text"] == "" and out[3]["n_tokens"] == 0


def test_sub_window_overlap_survives(spark):
    # 7-token overlap < window: below resolution, nothing removed
    shared = _tok(7, "s")
    out = _run(
        spark,
        [(1, f"{shared} {_tok(4, 'a')}"), (2, f"{shared} {_tok(4, 'b')}")],
    )
    assert out[1]["n_removed"] == 0 and out[2]["n_removed"] == 0


def test_row_count_and_extra_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "en", _tok(9, "s")), (2, "de", _tok(9, "s"))],
        ["doc_id", "lang", "text"],
    )
    out = dedupe_spans(df, window=8).collect()
    assert len(out) == 2
    assert {r["lang"] for r in out} == {"en", "de"}
    assert set(out[0].asDict()) == {
        "doc_id", "lang", "text", "n_tokens", "n_removed",
    }
