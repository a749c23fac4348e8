"""Meta-blocking: graph-based candidate-pair pruning (Papadakis et al.,
TKDE'13; JedAI's core trick for dirty-ER at web scale).

Token/shingle blocking is cheap but redundancy-heavy: two near-duplicate
documents co-occur in MANY blocks, while coincidental pairs co-occur in
one or two. Meta-blocking turns that redundancy into a signal — build
the *blocking graph* whose edge weight is the number of blocks a pair
shares (CBS, "common blocks scheme"), then prune edges below the global
mean weight (WEP, weighted-edge pruning). The surviving candidate set
keeps most true matches while cutting the comparison budget by an order
of magnitude — measured here at sf0.01: 9,534 candidate pairs → 593
survivors on bigram blocks.

Scale design (10^12-file posture):

- The blocking graph is never materialized as a graph: edge weights fall
  out of ONE ``groupBy(id1, id2).count()`` over the block-key self-join
  — partial-aggregating, so hot pairs combine map-side.
- Hot blocks (stopword grams) are removed FIRST by a document-frequency
  cap — partial-agg census + broadcast anti-join, the `_df_cap` pattern
  (dedup.py) — so the self-join's per-key fan-out is bounded by
  ``max_df`` and ΣC(df,2) stays linear in the corpus.
- The WEP threshold is a 1-row mean aggregate broadcast back over the
  edge stream (the scan_warnings pattern) — never an empty-partitionBy
  window, which would serialize every edge through one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_DF = 50


def bigram_blocks(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Distinct (id, block_key) pairs where block keys are adjacent-token
    bigrams of ``text_col`` — selective enough to block on even when the
    unigram vocabulary is tiny. Empty tokens never form a gram (matches
    the SQL twin, which skips pairs with an empty member).

    ``max_df`` drops grams appearing in more than that many documents:
    a partial-agg frequency census + broadcast anti-join, never a window
    over the gram key (hot grams are exactly the rows that would pile
    into one task).
    """
    arr = F.split(F.trim(F.col(text_col)), r"\W+")
    grams = (
        df.filter(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
        )
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.zip_with(
                    F.slice(arr, 1, F.greatest(F.size(arr) - 1, F.lit(0))),
                    F.slice(
                        arr, 2, F.greatest(F.size(arr) - 1, F.lit(0))
                    ),
                    lambda a, b: F.when(
                        (a != "") & (b != ""), F.concat(a, F.lit(" "), b)
                    ),
                )
            ).alias("block_key"),
        )
        .filter(F.col("block_key").isNotNull())
        .distinct()
    )
    if max_df is not None:
        hot = (
            grams.groupBy("block_key")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("block_key")
        )
        grams = grams.join(F.broadcast(hot), "block_key", "left_anti")
    return grams.select("id", "block_key")


def cbs_edges(blocks: DataFrame) -> DataFrame:
    """Blocking-graph edges with CBS weights: (id1, id2, cbs) where cbs =
    number of blocks the pair co-occurs in, id1 < id2.

    One equi-self-join on the block key + one partial-aggregating
    groupBy. Callers are responsible for having capped block sizes
    upstream (``bigram_blocks(max_df=...)``); with a cap of d the join
    emits at most C(d,2) rows per block.
    """
    a = blocks.select("block_key", F.col("id").alias("id1"))
    b = blocks.select("block_key", F.col("id").alias("id2"))
    return (
        a.join(b, "block_key")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("cbs"))
    )


def weighted_edge_pruning(
    edges: DataFrame, *, weight_col: str = "cbs"
) -> DataFrame:
    """WEP: keep edges whose weight is >= the global mean edge weight
    (Papadakis TKDE'13 §4.2). The mean is a 1-row aggregate broadcast
    over the edge stream — a BroadcastNestedLoopJoin of exactly one row,
    the allowlisted scan_warnings shape, never a global window."""
    # the mean and the filter both consume the full edge table; without a
    # materialization point Spark recomputes blocks+join+groupBy once per
    # branch (measured 2× the whole query cost at sf0.1). localCheckpoint
    # (lazy) truncates lineage at first use so both branches share ONE
    # materialization, and the backing RDD is GC-cleaned — no persist
    # lifecycle to leak.
    edges = edges.localCheckpoint(eager=False)
    mean = edges.agg(F.avg(weight_col).alias("_mean_w"))
    return (
        edges.crossJoin(F.broadcast(mean))
        .filter(F.col(weight_col) >= F.col("_mean_w"))
        .drop("_mean_w")
    )


def meta_block(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Full meta-blocking arc: bigram token blocking → CBS blocking graph
    → weighted-edge pruning. Returns (id1, id2, cbs) candidate pairs fit
    for a downstream comparison stage (e.g. ``scoring.score_pairs`` or
    ``fellegi.fs_score``)."""
    return weighted_edge_pruning(
        cbs_edges(
            bigram_blocks(df, id_col=id_col, text_col=text_col, max_df=max_df)
        )
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the document table")
    p.add_argument("--id-col", required=True)
    p.add_argument("--text-col", required=True)
    p.add_argument("--max-df", type=int, default=DEFAULT_MAX_DF)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="meta_block")
    meta_block(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        text_col=a.text_col,
        max_df=a.max_df,
    ).orderBy(F.desc("cbs"), "id1", "id2").show(20)
