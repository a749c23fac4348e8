"""Distributed BPE tokenizer training primitives.

Training a byte-pair-encoding vocabulary (Sennrich et al. ACL 2016; the
GPT-2/HF `tokenizers` trainer) is part of every LLM data pipeline, and
the expensive half — counting — is embarrassingly distributable. The
Spark-correct shape, used here:

1. ONE pass over the corpus builds the word-type histogram
   ``(word, n)`` — a partial-agg shuffle whose output is the set of
   distinct words (~10^8 rows at web scale), orders of magnitude
   smaller than the corpus.
2. Every BPE iteration then runs over the HISTOGRAM, never the corpus:
   adjacent-pair counts weighted by ``n`` (one partial-agg shuffle),
   argmax pair to the driver (a single row), then a re-segmentation of
   the symbol arrays. The corpus is touched exactly once regardless of
   the number of merges.

The pair counting and argmax are pure DataFrame expressions (codegen).
The re-segmentation is the one step Spark's built-ins cannot express —
greedy left-to-right merging of adjacent symbol pairs is a stateful
scan over each array (``"aaa"`` under merge (a,a) must become
``[aa, a]``, which no ``transform``/``filter`` composition gets right) —
so it is an Arrow-batched pandas UDF over the word-type histogram, the
skill-guide escape hatch for genuinely non-relational per-row logic.
Lineage is truncated per round with ``localCheckpoint`` (the CC-rounds
discipline) and intermediates are unpersisted.

The reference engine has no tokenizer surface — this extends the
training-data layer (SURVEY.md §2 addendum); ``bpe_pair_counts`` (the
iteration-0 statistics) is value-oracled against a DuckDB twin, the
merge loop against a pure-Python golden BPE in the unit tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Word segmentation shared verbatim with the SQL twin: lowercase, split
# on runs of non-alphanumerics. (Byte-level BPE would start from UTF-8
# bytes instead; word-level keeps the oracle exact and the shape is
# identical.)
WORD_SPLIT_RE = r"[^a-z0-9]+"


def word_histogram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, n)`` counts over the corpus — the single corpus-scale
    pass; everything downstream runs over word TYPES."""
    w = F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT_RE)).alias(
        "word"
    )
    return (
        df.select(w)
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str = "text", k: int = 100
) -> DataFrame:
    """Top-``k`` adjacent character pairs weighted by word frequency —
    the statistics of BPE iteration 0 (what the first merge is chosen
    from). Overlapping occurrences count, as in the reference trainers.
    Total order (cnt desc, pair asc) so the limit is deterministic."""
    hist = word_histogram(df, text_col)
    pairs = hist.filter(F.length("word") >= 2).select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word)-1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "n",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(k)
    )


def _merge_udf(a: str, b: str):
    """Greedy left-to-right merge of adjacent (a, b) into a+b."""
    merged = a + b

    def apply(col: pd.Series) -> pd.Series:
        def one(syms):
            out = []
            i = 0
            m = len(syms)
            while i < m:
                if i + 1 < m and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            return out

        return col.map(one)

    return F.pandas_udf(apply, ArrayType(StringType()))


def learn_bpe_merges(
    df: DataFrame, text_col: str = "text", n_merges: int = 10
) -> list[tuple[str, str]]:
    """The BPE training loop: returns the ordered merge list. Ties on
    count break lexicographically (deterministic across partitionings).
    Stops early when no pair occurs twice."""
    spark = df.sparkSession
    syms = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    )
    cur = (
        word_histogram(df, text_col)
        .select(syms.alias("syms"), "n")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str]] = []
    pair_expr = F.expr(
        "transform(sequence(1, size(syms)-1),"
        " i -> struct(element_at(syms, i) AS a, element_at(syms, i+1) AS b))"
    )
    for _ in range(n_merges):
        top = (
            cur.filter(F.size("syms") >= 2)
            .select(F.explode(pair_expr).alias("p"), "n")
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), "a", "b")
            .first()
        )
        if top is None or top["cnt"] < 2:
            break
        merges.append((top["a"], top["b"]))
        nxt = cur.select(
            _merge_udf(top["a"], top["b"])(F.col("syms")).alias("syms"), "n"
        ).localCheckpoint(eager=True)
        cur.unpersist()
        cur = nxt
    cur.unpersist()
    return merges


def segment_words(
    words: DataFrame,
    merges: list[tuple[str, str]],
    word_col: str = "word",
) -> DataFrame:
    """Apply a learned merge list to a word column: appends ``tokens``
    (array<string>). Merges apply in learned order, each greedily
    left-to-right — the standard BPE apply semantics. One pandas UDF
    projection, no shuffle (run it against the word-type histogram and
    join back to the corpus rather than against raw tokens)."""
    ms = list(merges)

    def apply(col: pd.Series) -> pd.Series:
        def one(w):
            syms = list(w)
            for a, b in ms:
                out = []
                i = 0
                m = len(syms)
                while i < m:
                    if i + 1 < m and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        return col.map(one)

    udf = F.pandas_udf(apply, ArrayType(StringType()))
    return words.withColumn("tokens", udf(F.col(word_col)))


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--text-col", default="text")
    p.add_argument("--merges", type=int, default=0, help="learn N merges")
    p.add_argument("--top-pairs", type=int, default=20)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="bpe")
    corpus = spark.read.parquet(a.input)
    if a.merges:
        for m in learn_bpe_merges(corpus, a.text_col, a.merges):
            print(m)
    else:
        bpe_pair_counts(corpus, a.text_col, a.top_pairs).show(
            a.top_pairs, truncate=False
        )
