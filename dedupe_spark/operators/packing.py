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

1. Rows are assigned an order-preserving **bucket** (bucket(i) <=
   bucket(j) whenever i < j) and hash-shuffled on it — ONE corpus-wide
   exchange. For numeric ids the bucket comes from ``approxQuantile``
   boundaries (one cheap aggregation pass; robust to arbitrary id
   skew), so the hash repartition on the bucket column *is* the range
   partitioning — and because the window below partitions BY that same
   column, Catalyst's clustering requirement is already satisfied and
   no further exchange is inserted.
2. Per-bucket token totals (one tiny row per bucket after map-side
   partial aggregation) are aggregated and their running sum — the
   bucket base offsets — is computed where it is O(buckets): a window
   over the totals table, then **broadcast** back.
3. The within-bucket exclusive cumsum is a window partitioned by the
   bucket — every task scans only its own rows.

Total cost for numeric ids: one quantile scan + ONE corpus shuffle + a
broadcast of #buckets rows. (The first design used
``repartitionByRange`` + ``spark_partition_id()``: Catalyst cannot know
the physical partition id is clustered, so it inserted a SECOND
corpus-wide hash exchange for the window, and the unshared range
subplan executed twice — the executed plan moved ~3× the bytes the
docstring claimed. Asserted now by a plan test.) Non-numeric ids have
no ``approxQuantile``; that path keeps the range-shuffle design with a
``localCheckpoint`` so the range exchange at least runs once, and pays
the extra pid-hash exchange — documented, not hidden.

The per-row bucket lookup is ``size(filter(boundaries, b <= id))`` —
O(#buckets) comparisons per row, trivially cheaper than the sha256/
MinHash work surrounding it in any real pipeline, but worth knowing if
``num_partitions`` is pushed to extremes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


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
    ``id_col`` alone (ids must be unique — standard for doc ids), and
    the offsets are independent of how rows land in buckets.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    sess = df.sparkSession
    if num_partitions is None:
        num_partitions = sess.sparkContext.defaultParallelism

    id_type = df.schema[id_col].dataType.typeName()
    if id_type in _NUMERIC and num_partitions > 1:
        # order-preserving quantile buckets: one cheap aggregation pass,
        # then ONE corpus shuffle that simultaneously satisfies the
        # window's clustering requirement (it partitions by _pid too)
        probs = [i / num_partitions for i in range(1, num_partitions)]
        bounds = sorted(set(df.stat.approxQuantile(id_col, probs, 0.001)))
        if bounds:
            barr = F.array(*[F.lit(b) for b in bounds])
            bucket = F.size(
                F.filter(barr, lambda b: b <= F.col(id_col).cast("double"))
            )
        else:
            bucket = F.lit(0)
        parted = (
            df.withColumn("_pid", bucket)
            .repartition(num_partitions, F.col("_pid"))
        )
    else:
        # non-numeric ids: no approxQuantile — range-partition and tag the
        # physical partition id. Catalyst cannot see that spark_partition_id
        # is clustered, so the window below costs one EXTRA corpus-wide
        # hash exchange on this path; localCheckpoint keeps the range
        # shuffle itself from executing twice (totals + join both read it).
        parted = (
            df.repartitionByRange(num_partitions, F.col(id_col))
            .withColumn("_pid", F.spark_partition_id())
            .localCheckpoint(eager=False)
        )

    # bucket base offsets: O(#buckets) rows, windowed where small
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


def chunk_documents(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split long documents into ``size``-token chunks with ``overlap``
    shared tokens between consecutive chunks (the HF tokenizer
    ``return_overflowing_tokens`` / ``stride`` shape, whitespace tokens).

    Returns one row per chunk::

        (id_col, chunk_id, start_tok, n_tokens, chunk_text)

    ``chunk_id`` is 0-based within the doc; chunk c starts at token
    ``c * (size - overlap)``. A chunk is emitted only if it contributes
    at least one NEW token (``start + overlap < n_tokens``), so the tail
    never yields a chunk fully contained in its predecessor. Documents
    whose trimmed text is empty produce no chunks.

    Pure array expressions end-to-end (``split`` → ``sequence`` →
    ``filter`` → ``posexplode`` → ``slice``), all codegen: the explode is
    the only row multiplier (factor ≈ n_tokens/step) and there is NO
    shuffle — chunking is a map-side op whatever the corpus size.
    """
    if size <= 0:
        raise ValueError(f"size must be positive, got {size}")
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got overlap={overlap}")
    step = size - overlap
    # regexp trim, NOT F.trim: trim() strips only spaces, so a doc framed
    # (or filled) with tabs/newlines would grow phantom empty tokens at
    # the edges — wrong n_tokens, and "\t\t" would emit a chunk of two
    # empty strings despite the no-empty-docs contract
    stripped = F.regexp_replace(F.col(text_col), r"^\s+|\s+$", "")
    toks = F.split(stripped, r"\s+")
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), n - 1, F.lit(step)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n),
    )
    chunked = (
        df.filter(F.length(stripped) > 0)
        .select(F.col(id_col), toks.alias("_toks"), starts.alias("_starts"))
        .select(
            id_col,
            "_toks",
            F.posexplode("_starts").alias("chunk_id", "start_tok"),
        )
    )
    chunk_toks = F.slice(F.col("_toks"), F.col("start_tok") + 1, size)
    return chunked.select(
        id_col,
        "chunk_id",
        "start_tok",
        F.size(chunk_toks).alias("n_tokens"),
        F.array_join(chunk_toks, " ").alias("chunk_text"),
    )
