"""Line-level boilerplate removal — the C4 / CCNet cleaning pass.

Web and source-code corpora are full of lines that repeat across many
documents (nav menus, cookie banners, license headers, generated-file
preambles). C4 (Raffel et al., JMLR 2020 §2.2) removes lines that occur
more than once in the corpus; CCNet (Wenzek et al., LREC 2020) drops
duplicated paragraphs by hash. The reference engine has no analog — this
is one of the training-data operators layered on top of its dedup surface
(SURVEY.md §2 addendum).

Scale shape (the only one that works at 100 TB):

* Line frequency is a ``groupBy(line)`` count over distinct
  ``(doc, line)`` pairs — map-side partial aggregation, so a hot line
  ("```", "#include <stdio.h>") contributes one partial count per task,
  never O(corpus) rows into one reducer.
* The *banned set* — lines appearing in more than ``max_docs``
  documents — is tiny by construction (only boilerplate is frequent), so
  the removal join is a **broadcast anti-join**: the corpus-sized
  exploded-lines table never shuffles on line content.
* Reassembly is one doc-keyed aggregation (``sort_array`` over
  ``(pos, line)`` structs restores original order). Total: the frequency
  partial-agg plus one doc-keyed shuffle.
* Everything is JVM array/string expressions — zero Python in the path.

The banned-set-is-small assumption is enforced, not hoped for:
``max_banned`` caps how many distinct lines the broadcast may carry and
the operator raises if exceeded (at 100 TB a silent 10 GB broadcast is an
outage; a loud error is a config fix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# A line must appear in more than this many documents to be boilerplate.
DEFAULT_MAX_DOCS = 2
# Broadcast safety cap on the banned-lines table (distinct lines).
DEFAULT_MAX_BANNED = 5_000_000


def boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = DEFAULT_MAX_DOCS,
) -> DataFrame:
    """The banned set: ``(line, doc_freq)`` for every non-blank trimmed
    line appearing in more than ``max_docs`` distinct documents.

    Frequency counts *documents containing the line*, not occurrences —
    a doc repeating its own divider 50 times is repetition (see
    ``textstats.repetition_stats``), not cross-document boilerplate.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_raw"),
    ).select("_id", F.trim(F.col("_raw")).alias("line"))
    return (
        lines.filter(F.col("line") != "")
        .distinct()  # (doc, line) pairs: per-doc repeats count once
        .groupBy("line")
        .agg(F.count("*").alias("doc_freq"))
        .filter(F.col("doc_freq") > max_docs)
    )


def remove_boilerplate_lines(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_docs: int = DEFAULT_MAX_DOCS,
    max_banned: int = DEFAULT_MAX_BANNED,
) -> DataFrame:
    """Strip cross-document boilerplate lines from every document.

    Returns the input rows with ``text_col`` replaced by the cleaned text
    (banned lines removed, original order and whitespace of surviving
    lines preserved) plus ``n_lines`` (original) and ``n_removed``
    counters. Documents whose every line is banned survive with empty
    text — row count is preserved exactly.

    Matching is on the *trimmed* line (indentation does not make a cookie
    banner unique) but surviving lines keep their original form. Blank
    lines are never banned (they are structure, not content).
    """
    banned = boilerplate_lines(
        df, id_col=id_col, text_col=text_col, max_docs=max_docs
    )
    # Eager cap check; the banned set is then *recomputed* inside the
    # anti-join plan. Deliberate: it is one scan + partial agg (cheap),
    # while persisting it would hold unified-pool memory across the whole
    # downstream job — the same cache-pressure trap measured and reverted
    # in CC (BENCH/BASELINE.md "one measured dead end", 296 s → 592 s).
    n_banned = banned.limit(max_banned + 1).count()
    if n_banned > max_banned:
        raise ValueError(
            f"banned-line set exceeds max_banned={max_banned}; raise "
            f"max_docs (more selective) or max_banned (bigger broadcast)"
        )

    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_raw"),
    ).withColumn("line", F.trim(F.col("_raw")))

    kept = lines.join(F.broadcast(banned.select("line")), "line", "left_anti")
    clean = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_raw"))),
                lambda s: s["_raw"],
            ),
            "\n",
        ).alias("_clean"),
        F.count("*").alias("_n_kept"),
    )
    totals = lines.groupBy("_id").agg(F.count("*").alias("n_lines"))

    out = (
        df.join(totals, F.col(id_col) == totals["_id"], "left")
        .drop("_id")
        .join(clean, F.col(id_col) == clean["_id"], "left")
        .drop("_id")
    )
    return out.select(
        *[c for c in df.columns if c != text_col],
        F.coalesce(F.col("_clean"), F.lit("")).alias(text_col),
        F.col("n_lines"),
        (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--max-docs", type=int, default=DEFAULT_MAX_DOCS)
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="boilerplate")
    out = remove_boilerplate_lines(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        text_col=a.text_col,
        max_docs=a.max_docs,
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("n_removed")).show(20, truncate=80)
