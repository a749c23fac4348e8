"""Repeated-span removal — windowed exact-substring dedup, first
occurrence survives corpus-wide.

Lee et al. (ACL 2022, "Deduplicating Training Data Makes Language Models
Better") remove every duplicated substring of >= 50 tokens, keeping one
occurrence; their single-machine implementation builds a suffix array
over the whole corpus, which has no shuffle-friendly distributed analog.
This operator is the standard MapReduce-shaped approximation used at web
scale: slide a ``window``-token hash over every document (stride 1), find
window values that occur more than once corpus-wide, and delete the
tokens covered by every occurrence except the first (smallest
``(doc, position)``). Any duplicated substring of length >= window is
fully covered by duplicated windows, so it is removed from all later
occurrences; substrings shorter than ``window`` are below the resolution
and survive — the precision/recall dial is ``window`` itself, exactly the
"minimum match length" knob of the suffix-array formulation.

It completes the passage-dedup family: ``paradedup`` keys on paragraph
boundaries (structure-aware, cheap), this operator is boundary-free
(catches spans that straddle or ignore line structure). The reference
engine has no analog; this is one of the training-data operators layered
on its dedup surface (SURVEY.md §2 addendum).

Scale shape (the only one that works at 100 TB):

* Window hashing is per-row array math (``transform`` over a token
  array + ``sha2`` of each slice) — JVM-side, no shuffle, output is one
  row per window position, i.e. O(corpus tokens) rows carrying a
  constant-width 64-char hash, never the window text.
* The winner per window value is one ``groupBy(hash)`` →
  ``count + min(struct(doc, pos))`` — map-side partial aggregation, so a
  span repeated a billion times contributes one partial row per task.
* Loser detection joins occurrences back to the duplicated-window
  winners on the hash key. The winner side is O(distinct duplicated
  windows) — NOT broadcastable at corpus scale, so both sides shuffle on
  the key once. A viral span makes that key hot on the occurrence side;
  the winner side is a single row per key, which is precisely the shape
  AQE skew-join splitting handles (it splits the big side and replicates
  the 1-row side; ``spark.sql.adaptive.enabled`` is on in
  ``session.get_spark``).
* Token-coverage explode multiplies LOSING occurrences only by
  ``window`` (duplicated text pays window×, unique text pays 1×), then a
  ``distinct`` collapses overlap — both keyed by ``(doc, token_pos)``,
  partial-agg friendly.
* Reassembly is the same positional ``sort_array`` aggregation as
  ``paradedup``/``boilerplate``: one doc-keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedupe_spans(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Remove every repeated ``window``-token span except its corpus-wide
    first occurrence.

    Tokenization is whitespace splitting; the surviving text is rebuilt
    single-space-joined (whitespace is normalized — the token stream, not
    the byte stream, is the unit of LM-pretraining dedup). Returns the
    input rows with ``text_col`` rebuilt plus ``n_tokens`` (original
    token count) and ``n_removed`` (tokens deleted). "First" is the
    smallest ``(id_col, window position)``, so the result is
    deterministic for any input partitioning; a window repeated within
    one document keeps only its earliest position. Documents shorter
    than ``window`` tokens contribute no windows and always survive
    intact (modulo whitespace normalization). Row count is preserved; a
    document fully covered by earlier-seen spans survives with empty
    text.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2 tokens, got {window}")

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.when(
            F.trim(F.col(text_col)) != "",
            F.split(F.trim(F.col(text_col)), r"\s+"),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_t"),
    )

    # (doc, pos0) → sha2 of the window starting there; docs shorter than
    # `window` produce an empty array and vanish under posexplode
    win_keys = F.transform(
        F.when(
            F.size("_t") >= window,
            F.sequence(F.lit(0), F.size("_t") - window),
        ).otherwise(F.array().cast("array<int>")),
        lambda i: F.sha2(F.array_join(F.slice("_t", i + 1, window), " "), 256),
    )
    wins = toks.select("_id", F.posexplode(win_keys).alias("_pos", "_key"))

    dup_winners = (
        wins.groupBy("_key")
        .agg(F.count("*").alias("_cnt"), F.min(F.struct("_id", "_pos")).alias("_win"))
        .filter(F.col("_cnt") >= 2)
        .select("_key", "_win")
    )
    losers = (
        wins.join(dup_winners, "_key")
        .filter(
            (F.col("_id") != F.col("_win._id"))
            | (F.col("_pos") != F.col("_win._pos"))
        )
        .select("_id", "_pos")
    )
    covered = losers.select(
        "_id",
        F.explode(F.sequence(F.col("_pos"), F.col("_pos") + (window - 1))).alias(
            "_tok"
        ),
    ).distinct()

    tokens = toks.select("_id", F.posexplode("_t").alias("_tok", "_token"))
    kept = tokens.join(covered, ["_id", "_tok"], "left_anti")
    clean = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_tok", "_token"))),
                lambda s: s["_token"],
            ),
            " ",
        ).alias("_clean"),
        F.count("*").alias("_n_kept"),
    )
    totals = toks.select("_id", F.size("_t").cast("long").alias("n_tokens"))

    out = (
        df.join(totals, F.col(id_col) == totals["_id"], "left")
        .drop("_id")
        .join(clean, F.col(id_col) == clean["_id"], "left")
        .drop("_id")
    )
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.coalesce(F.col("_clean"), F.lit("")).alias(text_col),
        F.col("n_tokens"),
        (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--window", type=int, default=50)
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="spandedup")
    out = dedupe_spans(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        text_col=a.text_col,
        window=a.window,
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("n_removed")).show(20, truncate=80)
