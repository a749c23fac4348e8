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
