"""Paragraph-level exact dedup — keep the first occurrence corpus-wide.

Exact near-line/paragraph duplication is the dominant redundancy in web
and code corpora; Lee et al. (ACL 2022, "Deduplicating Training Data
Makes Language Models Better") and the MassiveText pipeline (Rae et al.
2021) both remove repeated passages *within* documents that survive
document-level dedup. This operator is the paragraph-hash form: every
later occurrence of a paragraph already seen anywhere in the corpus is
dropped; the first occurrence (smallest ``(doc, position)``) survives.

It complements ``boilerplate.remove_boilerplate_lines``, which BANS every
occurrence of high-frequency lines: paragraph dedup KEEPS exactly one
occurrence of every paragraph, regardless of frequency — dedup semantics,
not filtering semantics. The reference engine has no analog; this is one
of the training-data operators layered on its dedup surface (SURVEY.md §2
addendum).

Scale shape (the only one that works at 100 TB):

* Paragraphs explode keyed by ``(doc, pos)``; the winner per paragraph is
  one ``groupBy(hash)`` → ``min(struct(doc, pos))`` — map-side partial
  aggregation, so a paragraph repeated a billion times contributes one
  partial row per task.
* Survival is decided by a shuffle join back on the hash key (the winner
  set is O(distinct paragraphs) — NOT broadcastable at corpus scale, so
  no broadcast is attempted; both sides shuffle on the same key once).
* Matching is on ``sha2(trimmed paragraph)`` — constant-width join keys
  instead of arbitrary-length text in the shuffle (the paragraphs
  themselves never ride through the winner aggregation).
* Reassembly is the same positional ``sort_array`` aggregation as the
  boilerplate pass: one doc-keyed shuffle. Blank separators are never
  deduped (they are structure, not content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe_paragraphs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Drop every paragraph occurrence except the corpus-wide first.

    Returns the input rows with ``text_col`` rebuilt from surviving
    paragraphs (original order and whitespace preserved) plus ``n_paras``
    (original paragraph count) and ``n_dropped``. "First" is the smallest
    ``(id_col, position)`` pair over the *trimmed* paragraph text, so the
    result is deterministic for any input order. Row count is preserved;
    a document whose every paragraph appeared earlier elsewhere survives
    with empty text.
    """
    # F.split takes a Java REGEX but array_join below re-inserts `sep` as a
    # literal — quote the pattern (\Q...\E) so both sides agree on literal
    # semantics for any separator ('.', '||', ...), not just regex-inert ones
    paras = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(F.col(text_col), "\\Q" + sep + "\\E")
        ).alias("_pos", "_raw"),
    ).withColumn("_key", F.sha2(F.trim(F.col("_raw")), 256))

    content = paras.filter(F.trim(F.col("_raw")) != "")
    winners = content.groupBy("_key").agg(
        F.min(F.struct("_id", "_pos")).alias("_win")
    )
    kept_content = (
        content.join(winners, "_key")
        .filter(
            (F.col("_id") == F.col("_win._id"))
            & (F.col("_pos") == F.col("_win._pos"))
        )
        .select("_id", "_pos", "_raw")
    )
    blanks = paras.filter(F.trim(F.col("_raw")) == "").select(
        "_id", "_pos", "_raw"
    )
    kept = kept_content.unionByName(blanks)

    clean = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_raw"))),
                lambda s: s["_raw"],
            ),
            sep,
        ).alias("_clean"),
        F.count("*").alias("_n_kept"),
    )
    totals = paras.groupBy("_id").agg(F.count("*").alias("n_paras"))

    out = (
        df.join(totals, F.col(id_col) == totals["_id"], "left")
        .drop("_id")
        .join(clean, F.col(id_col) == clean["_id"], "left")
        .drop("_id")
    )
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.coalesce(F.col("_clean"), F.lit("")).alias(text_col),
        F.col("n_paras"),
        (F.col("n_paras") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
            "n_dropped"
        ),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--sep", default="\n")
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="paradedup")
    out = dedupe_paragraphs(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        text_col=a.text_col,
        sep=a.sep,
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("n_dropped")).show(20, truncate=80)
