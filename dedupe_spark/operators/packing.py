"""Sequence packing — concat-and-chunk offsets for LM pretraining.

GPT-style pretraining packs the corpus by concatenating documents in a
fixed order and cutting the token stream every ``seq_len`` tokens; a
document's training placement is fully described by its global token
offset. This operator computes, for every document, its start offset in
the concatenated stream and the first/last chunk (sequence) it lands in.
The reference engine has no analog — this is one of the training-data
operators layered on top of its dedup surface (SURVEY.md §2 addendum).

The interesting part at 100 TB is the GLOBAL running sum. A naive window
``sum() over (order by id)`` has an empty partition spec — Spark funnels
the entire corpus through ONE task. Instead this is the classic
two-pass distributed prefix sum:

1. ``repartitionByRange(id)`` gives totally ordered partitions (range
   partition i holds smaller ids than i+1) — one shuffle, the same one
   any global ordering needs.
2. Per-partition token totals (one tiny row per partition) are
   aggregated and their running sum — the partition base offsets — is
   computed where it is O(partitions): a window over the partition-id
   table, then **broadcast** back.
3. The within-partition exclusive cumsum is a window partitioned BY the
   range-partition id — every task scans only its own rows.

Total cost: one range shuffle + one broadcast of #partitions rows. No
stage ever sees more than one partition's rows in one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_offsets(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    seq_len: int = 2048,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global concat-and-chunk placement for every document.

    Documents are concatenated in ascending ``id_col`` order; the stream
    is cut every ``seq_len`` tokens. Returns the input columns plus::

        start_off    global token offset where this doc begins
        first_chunk  floor(start_off / seq_len)
        last_chunk   floor((start_off + tokens - 1) / seq_len)
                     (equals first_chunk - 1 sentinel-free: NULL for
                     zero-token docs, which occupy no chunk)

    Deterministic for any input partitioning: order is defined by
    ``id_col`` alone (ids must be unique — standard for doc ids).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sess = df.sparkSession
    if num_partitions is None:
        num_partitions = sess.sparkContext.defaultParallelism

    parted = df.repartitionByRange(num_partitions, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )

    # partition base offsets: O(#partitions) rows, windowed where small
    totals = parted.groupBy("_pid").agg(F.sum(token_col).alias("_ptot"))
    w_base = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bases = totals.select(
        "_pid", F.coalesce(F.sum("_ptot").over(w_base), F.lit(0)).alias("_base")
    )

    w_local = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    placed = (
        parted.join(F.broadcast(bases), "_pid")
        .withColumn(
            "start_off",
            F.col("_base")
            + F.coalesce(F.sum(token_col).over(w_local), F.lit(0)),
        )
        .drop("_pid", "_base")
    )
    return placed.select(
        *df.columns,
        "start_off",
        F.floor(F.col("start_off") / seq_len).alias("first_chunk"),
        F.when(
            F.col(token_col) > 0,
            F.floor((F.col("start_off") + F.col(token_col) - 1) / seq_len),
        ).alias("last_chunk"),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path with an id and a token-count column")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--token-col", default="n_tokens")
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="pack_offsets")
    out = pack_offsets(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        token_col=a.token_col,
        seq_len=a.seq_len,
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(a.id_col).show(20, truncate=False)
