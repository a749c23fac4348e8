"""Tests for concat-and-chunk sequence packing (distributed prefix sum)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.packing import pack_offsets


def _docs(spark, n=50, shuffled=True):
    # token counts 1..50, ids deliberately delivered out of order and
    # over many partitions so the range-repartition does real work
    rows = [(i, (i * 7) % 50 + 1) for i in range(n)]
    if shuffled:
        rows = rows[::-1]
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]).repartition(7)


def test_offsets_match_serial_prefix_sum(spark):
    out = {
        r["doc_id"]: r
        for r in pack_offsets(_docs(spark), seq_len=16).collect()
    }
    acc = 0
    for i in range(50):
        tokens = (i * 7) % 50 + 1
        assert out[i]["start_off"] == acc
        assert out[i]["first_chunk"] == acc // 16
        assert out[i]["last_chunk"] == (acc + tokens - 1) // 16
        acc += tokens


def test_partitioning_invariance(spark):
    a = pack_offsets(_docs(spark), seq_len=16, num_partitions=3)
    b = pack_offsets(
        _docs(spark, shuffled=False).coalesce(1), seq_len=16,
        num_partitions=11,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_zero_token_doc_occupies_no_chunk(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 0), (3, 10)], ["doc_id", "n_tokens"]
    )
    out = {r["doc_id"]: r for r in pack_offsets(df, seq_len=8).collect()}
    assert out[2]["start_off"] == 10 and out[2]["last_chunk"] is None
    assert out[3]["start_off"] == 10  # zero-token doc shifts nothing


def test_bad_seq_len_rejected(spark):
    with pytest.raises(ValueError):
        pack_offsets(_docs(spark), seq_len=0)


def test_no_single_task_global_window(spark):
    """The corpus-sized window must be partitioned by the range-partition
    id — a global (empty-frame) window over the full input would be the
    single-task scale bug this operator exists to avoid."""
    plan = (
        pack_offsets(_docs(spark), seq_len=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    # every Window over n_tokens must carry a partition spec (_pid)
    for m in re.finditer(r"Window \[sum\(n_tokens[^\]]*\], \[([^\]]*)\]", plan):
        assert "_pid" in m.group(1) or "doc_id" in m.group(1)


def test_pack_offsets_numeric_plan_single_corpus_shuffle(spark):
    """Numeric-id path: quantile buckets mean the corpus is hash-shuffled
    ONCE (the window's own requirement) — no rangepartitioning at all, and
    the only other keyed exchange carries post-partial-agg bucket totals.
    The first design executed the range exchange twice plus a pid-hash
    exchange (~3x the documented bytes); this pins the fixed plan."""
    from pyspark.sql import functions as F

    from dedupe_spark.operators.packing import pack_offsets

    df = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 13 + 1).alias("n_tokens")
    )
    plan = (
        pack_offsets(df, num_partitions=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in plan, plan[:600]
    keyed = plan.count("Exchange hashpartitioning")
    assert keyed <= 2, plan[:900]  # window input + tiny totals partial-agg


def test_chunk_documents_covers_and_overlaps(spark):
    """Chunks tile the token stream: chunk c starts at c*step, consecutive
    chunks share exactly `overlap` tokens, every token appears, and no
    chunk is fully contained in its predecessor."""
    from dedupe_spark.operators.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(23))
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "   ")], "doc_id long, text string"
    )
    out = chunk_documents(df, size=10, overlap=3)
    rows = sorted(out.collect(), key=lambda r: (r["doc_id"], r["chunk_id"]))
    d1 = [r for r in rows if r["doc_id"] == 1]
    # 23 tokens, step 7: starts 0,7,14 (21 skipped: 21+3 >= 23 adds nothing)
    assert [(r["chunk_id"], r["start_tok"], r["n_tokens"]) for r in d1] == [
        (0, 0, 10), (1, 7, 10), (2, 14, 9),
    ]
    toks = text.split()
    for r in d1:
        assert r["chunk_text"] == " ".join(toks[r["start_tok"]:r["start_tok"] + 10])
    # union of chunk tokens covers the doc
    covered = set()
    for r in d1:
        covered.update(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(23))
    # short doc: one whole chunk; whitespace-only doc: none
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_text"] == "short doc"
    assert not [r for r in rows if r["doc_id"] == 3]


def test_chunk_documents_validates_params(spark):
    import pytest

    from dedupe_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, overlap=10)


def test_chunk_documents_is_shuffle_free(spark):
    """Chunking is a map-side op: zero exchanges in the plan."""
    from dedupe_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    plan = chunk_documents(df, size=2, overlap=1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
