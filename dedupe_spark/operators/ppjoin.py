"""Prefix-filtered set-similarity join (PPJoin family: Chaudhuri et al.
ICDE'06 SSJoin; Xiao et al. WWW'08 PPJoin; Vernica, Carey & Li
SIGMOD'10 — the canonical MapReduce formulation this Spark plan
mirrors).

The inverted-index Jaccard join (`dedup.ngram_jaccard_pairs`) indexes
EVERY token of every record; its candidate volume is Σ_token C(df,2),
which a df-cap bounds only by *dropping* hot tokens (lossy). The prefix
filter is the lossless alternative: order the vocabulary by ascending
document frequency (rarest first), sort each record's token set in that
order, and index only each record's first

    p = |x| - ceil(t·|x|) + 1

tokens. **Prefix-filter lemma**: two sets with Jaccard ≥ t MUST share at
least one token within each other's prefix — so joining on prefix
tokens alone loses no true pair, while the index shrinks by the (1-t)
factor AND hot (high-df) tokens are systematically pushed OUT of
prefixes: the frequent-token skew that forces the df-cap elsewhere is
exactly what this ordering neutralizes.

Scale design (10^12-record posture):

- The df census is one partial-agg pass; the global frequency rank uses
  :func:`dedupe_spark.operators.linkage.global_rank` (range partition +
  per-partition offsets — no single-task sort) over the VOCABULARY,
  which is sublinear in the corpus.
- Per-record token sorting is `array_sort` on rank-encoded ints (JVM,
  no Python); prefix extraction is a `slice`.
- Candidates: equi-self-join on prefix token rank, `id1 < id2`,
  distinct. Per-token fan-out is bounded by the token's *prefix* df,
  which the ordering keeps small for hot tokens.
- Verification is exact Jaccard on the full rank arrays via
  `array_intersect` — codegen, no shuffle beyond the pair join-back.

The verify step joins the full token arrays to BOTH pair sides; arrays
ride the shuffle once each. An alternative (carrying arrays through the
prefix explode) multiplies array bytes by prefix length — worse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedupe_spark.operators.linkage import global_rank


def tokenize_distinct(
    df: DataFrame, *, id_col: str, text_col: str
) -> DataFrame:
    """(id, token) rows: lowercase whitespace/punct tokens, de-duplicated
    per document, empties dropped — Jaccard is over token SETS."""
    return (
        df.filter(
            F.col(text_col).isNotNull() & (F.trim(F.col(text_col)) != "")
        )
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\W+")
                )
            ).alias("token"),
        )
        .filter(F.col("token") != "")
    )


def rank_tokens(tokens: DataFrame) -> DataFrame:
    """(id, rank) with rank = the token's position in the global
    ascending-df ordering (ties by token text — a TOTAL order, so both
    engines and every run agree). Rarest token = rank 1."""
    vocab = tokens.groupBy("token").agg(F.count("*").alias("df"))
    ranked_vocab = global_rank(vocab, order_cols=["df", "token"]).select(
        "token", F.col("rank").cast("int").alias("rank")
    )
    # vocabulary is corpus-sublinear; broadcast when small enough is left
    # to AQE — the join key (token) is the natural shuffle key otherwise
    return tokens.join(ranked_vocab, "token").select("id", "rank")


def prefix_filtered_jaccard_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """All pairs with token-set Jaccard ≥ ``threshold``, found via the
    prefix filter — LOSSLESS, unlike a df-cap. Returns
    (id1, id2, n1, n2, overlap, jaccard).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0,1], got {threshold}")
    toks = tokenize_distinct(df, id_col=id_col, text_col=text_col)
    ranked = rank_tokens(toks)
    sets = ranked.groupBy("id").agg(
        F.array_sort(F.collect_list("rank")).alias("ranks"),
        F.count("*").alias("n"),
    )
    # p = n - ceil(t*n) + 1 tokens of the (rarest-first) sorted set
    p = (
        F.col("n")
        - F.ceil(F.lit(threshold) * F.col("n")).cast("long")
        + F.lit(1)
    )
    prefix = sets.select(
        "id", "n", F.explode(F.slice("ranks", 1, p)).alias("rank")
    )
    # length filter (SSJoin): J >= t forces t·max(n1,n2) <= min(n1,n2),
    # so size-incompatible candidates die inside the join before the
    # distinct/verify stages ever see them
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "rank")
        .filter(
            (F.col("a.id") < F.col("b.id"))
            & (F.col("b.n") >= F.ceil(F.lit(threshold) * F.col("a.n")))
            & (F.col("a.n") >= F.ceil(F.lit(threshold) * F.col("b.n")))
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    s1 = sets.select(
        F.col("id").alias("id1"),
        F.col("ranks").alias("_r1"),
        F.col("n").alias("n1"),
    )
    s2 = sets.select(
        F.col("id").alias("id2"),
        F.col("ranks").alias("_r2"),
        F.col("n").alias("n2"),
    )
    verified = (
        cand.join(s1, "id1")
        .join(s2, "id2")
        .withColumn(
            "overlap", F.size(F.array_intersect("_r1", "_r2")).cast("long")
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("overlap")
                / (F.col("n1") + F.col("n2") - F.col("overlap")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("id1", "id2", "n1", "n2", "overlap", "jaccard")


def prefix_filtered_dedupe(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    threshold: float,
) -> DataFrame:
    """Lossless set-similarity dedup: prefix-filtered Jaccard pairs →
    transitive clustering → (id, cluster_id, cluster_size,
    is_representative) in the engine's standard assignment shape.
    The LOSSLESS sibling of ``ngram_jaccard_dedupe`` (whose df-cap drops
    hot grams): every pair with Jaccard ≥ t contributes an edge, no
    exceptions, at O((1-t)·index) cost instead of a recall trade."""
    from pyspark.sql import Window

    from dedupe_spark.operators.cc import connected_components

    edges = prefix_filtered_jaccard_pairs(
        df, id_col=id_col, text_col=text_col, threshold=threshold
    ).select("id1", "id2")
    comp = connected_components(edges)
    ids = df.select(F.col(id_col).alias("id")).filter(F.col("id").isNotNull())
    out = ids.join(
        comp.withColumnRenamed("file_id", "id"), "id", "left"
    ).select("id", F.col("component").alias("cluster_id"))
    w = Window.partitionBy(F.coalesce(F.col("cluster_id"), F.col("id")))
    return out.select(
        "id",
        "cluster_id",
        F.when(F.col("cluster_id").isNotNull(), F.count("*").over(w)).alias(
            "cluster_size"
        ),
        F.when(
            F.col("cluster_id").isNotNull(), F.col("id") == F.min("id").over(w)
        ).alias("is_representative"),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("input", help="parquet path of the document table")
    ap.add_argument("--id-col", required=True)
    ap.add_argument("--text-col", required=True)
    ap.add_argument("--threshold", type=float, default=0.8)
    a = ap.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="ppjoin")
    prefix_filtered_jaccard_pairs(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        text_col=a.text_col,
        threshold=a.threshold,
    ).orderBy(F.desc("jaccard"), "id1", "id2").show(20)
