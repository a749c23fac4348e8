"""Text-analysis operators for training-data pipelines.

The reference's quality-assessment stage (/root/reference/quality_assessor.py)
scores every image on format/resolution/size/sharpness with weighted-sum
math (P7-P12 in SURVEY.md §2.2); these operators are the text-table analog a
100 TB pretraining pipeline needs: quality scoring, language identification,
token counting, and document fingerprinting.

Everything here is pure ``pyspark.sql.functions`` column math — JVM-side,
whole-stage-codegen'd, no UDFs — so Catalyst pushes filters below them and
the parquet scan prunes to exactly the columns used. Each operator has an
ANSI-SQL oracle twin in ``dedupe_spark.plans.queries``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single non-space symbol.
# The same regex drives Spark's regexp_count and DuckDB's regexp_extract_all.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

# Tiny per-language stopword anchors for the n-gram/stopword heuristic.
# Real language-ID ships big frequency tables; the *operator shape* —
# array_intersect score per language, argmax via greatest/CASE — is what
# matters and is identical at any table size.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "value", "is", "in"],
    "fr": ["le", "la", "et", "de", "un", "une", "les", "est"],
    "es": ["el", "la", "los", "y", "de", "un", "una", "es"],
    "de": ["der", "die", "das", "und", "ein", "ist", "von", "zu"],
}


def _tokens(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), "\\s+")


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish sub-tokens (regex runs).

    JVM-side ``split``/``regexp_count`` — no UDF. At 100 TB this stays inside
    whole-stage codegen and the scan reads only the text column.
    """
    c = F.col(text_col)
    return df.withColumn(
        "ws_tokens", F.size(F.split(F.trim(c), "\\s+"))
    ).withColumn("bpe_tokens", F.regexp_count(c, F.lit(BPE_TOKEN_RE)))


def quality_score_col(text: Column) -> Column:
    """The weighted quality score as a single Column expression — reusable
    outside ``with_quality_score`` (e.g. quality-ordered representative
    selection, the reference's ``compare_images`` alternative,
    quality_assessor.py:114-136). Same formula as ``with_quality_score``.
    """
    toks = _tokens(text)
    n_chars = F.length(text)
    n_words = F.size(toks)
    distinct_toks = F.array_distinct(toks)
    stop_hits = F.size(F.array_intersect(distinct_toks, F.lit(LANG_STOPWORDS["en"])))
    punct = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    length_score = F.least(F.lit(100.0), F.log10(F.greatest(n_chars, F.lit(1))) / 4 * 100)
    word_score = F.least(F.lit(100.0), F.log10(n_words + F.lit(1)) / 3 * 100)
    stop_ratio = stop_hits / F.greatest(F.size(distinct_toks), F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    return F.round(
        F.greatest(
            F.lit(0.0),
            0.35 * length_score
            + 0.35 * word_score
            + 30 * stop_ratio
            - 50 * punct_ratio,
        ),
        4,
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + weighted overall score.

    Mirrors the reference's weighted-sum scoring
    (quality_assessor.py:94-105: 0.30*fmt + 0.25*res + 0.20*size + 0.20*sharp
    − 0.05*watermark, clamped ≥0) with text analogs:

      length_score   = min(100, log10(chars)/4 * 100)      (≈ resolution P8)
      word_score     = min(100, log10(1+words)/3 * 100)    (≈ size P9)
      stopword_ratio = |tokens ∩ en-stopwords| / |distinct| (≈ sharpness P10)
      punct_penalty  = punct_chars / chars                  (≈ watermark P11)

      quality = max(0, 0.35*length + 0.35*word + 30*stop_ratio
                       − 50*punct_penalty)
    """
    c = F.col(text_col)
    toks = _tokens(c)
    n_chars = F.length(c)
    n_words = F.size(toks)
    distinct_toks = F.array_distinct(toks)
    stop_hits = F.size(F.array_intersect(distinct_toks, F.lit(LANG_STOPWORDS["en"])))
    punct = F.length(F.regexp_replace(c, "[A-Za-z0-9\\s]", ""))
    length_score = F.least(F.lit(100.0), F.log10(F.greatest(n_chars, F.lit(1))) / 4 * 100)
    word_score = F.least(F.lit(100.0), F.log10(n_words + F.lit(1)) / 3 * 100)
    stop_ratio = stop_hits / F.greatest(F.size(distinct_toks), F.lit(1))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    return (
        df.withColumn("length_score", F.round(length_score, 4))
        .withColumn("word_score", F.round(word_score, 4))
        .withColumn("stopword_ratio", F.round(stop_ratio, 4))
        .withColumn("punct_ratio", F.round(punct_ratio, 4))
        .withColumn("quality_score", quality_score_col(c))
    )


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap language ID: score per language, argmax, 'und' on tie-0.

    Pure array math (array_intersect over a literal list per language) —
    scales as a narrow map stage; the per-language score columns are also
    useful as quality filters.
    """
    toks = F.array_distinct(_tokens(F.col(text_col)))
    out = df
    for lang, words in LANG_STOPWORDS.items():
        out = out.withColumn(
            f"score_{lang}", F.size(F.array_intersect(toks, F.lit(words)))
        )
    scores = [F.col(f"score_{lang}") for lang in LANG_STOPWORDS]
    best = F.greatest(*scores)
    pred = F.lit("und")
    # iterate in reverse so earlier languages win ties (deterministic)
    for lang in reversed(list(LANG_STOPWORDS)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("pred_lang", pred)


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Intra-document repetition signals — the Gopher/MassiveText quality
    filters (Rae et al. 2021, "Scaling Language Models", Table A1) that a
    pretraining pipeline applies before dedup: boilerplate and degenerate
    generation show up as one token/n-gram dominating the document.

      top_word_frac     occurrences of the most frequent token / n_tokens
      top_bigram_frac   occurrences of the most frequent bigram / (n-1)
      dup_trigram_frac  fraction of trigram slots occupied by repeats

    The trigram fraction is pure array math (transform + array_distinct —
    no shuffle); the n-gram modes explode keyed by document, so both
    groupBys partial-aggregate map-side and repartition on the doc key
    once — per-doc state stays bounded at any corpus size. Documents
    shorter than the n-gram width get NULL for that signal rather than a
    fake 0.
    """
    toks = _tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).withColumn(
        "n_tokens", F.size("toks")
    )

    def grams(width: int) -> Column:
        # zip_with aligned-slice fold (decontam.gram_fold): a handful of
        # array kernels instead of an interpreted per-element lambda —
        # measured 86 s → 3 s for this query at sf0.1.
        from dedupe_spark.operators.decontam import gram_fold

        return F.when(
            F.col("n_tokens") >= width, gram_fold(F.col("toks"), width)
        )

    base = base.withColumn("bgs", grams(2)).withColumn("tgs", grams(3))
    wtop = (
        base.select("id", F.explode("toks").alias("g"))
        .groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_word_n"))
    )
    btop = (
        base.filter(F.col("bgs").isNotNull())
        .select("id", F.explode("bgs").alias("g"))
        .groupBy("id", "g")
        .agg(F.count("*").alias("c"))
        .groupBy("id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    dup_tri = F.when(
        F.col("tgs").isNotNull(),
        F.round(
            (F.size("tgs") - F.size(F.array_distinct("tgs"))) / F.size("tgs"), 4
        ),
    )
    return (
        base.join(wtop, "id", "left")
        .join(btop, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            F.round(F.col("top_word_n") / F.col("n_tokens"), 4).alias(
                "top_word_frac"
            ),
            F.round(F.col("top_bigram_n") / (F.col("n_tokens") - 1), 4).alias(
                "top_bigram_frac"
            ),
            dup_tri.alias("dup_trigram_frac"),
        )
    )


def shingle_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Winnowing-style document fingerprint over token k-grams.

    posexplode tokens → lead() window builds k-gram strings → per-doc
    ``min(md5(shingle))`` fingerprint + distinct-shingle count. The rolling
    window (lead over token position) is the relational form of a rolling
    hash; min-of-hashes is the winnowing selection. One shuffle
    (window partition by doc), one groupBy on the same key — Catalyst reuses
    the partitioning, so the groupBy adds no extra exchange.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), "\\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("id").orderBy("pos")
    grams = toks.select(
        "id",
        F.concat_ws(
            " ", "tok", *[F.lead("tok", i).over(w) for i in range(1, k)]
        ).alias("gram"),
        F.lead("tok", k - 1).over(w).isNotNull().alias("full"),
    ).filter("full")
    return grams.groupBy("id").agg(
        F.min(F.md5(F.col("gram"))).alias("fingerprint"),
        F.count_distinct("gram").alias("n_distinct_shingles"),
    )


def quality_percentile_filter(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "lang",
    keep_frac: float = 0.4,
) -> DataFrame:
    """Keep the top ``keep_frac`` of each group by quality score — the
    CCNet-style per-language quantile gate (Wenzek et al., LREC 2020:
    per-language perplexity quantiles decide head/middle/tail buckets).
    A single global threshold would let the quality prior of one dominant
    language filter the others; the gate must be computed per group.

    Scale shape: the corpus does ONE partial aggregation down to a tiny
    (group, score) histogram — the score is rounded to 4 decimals, so the
    histogram's cardinality is bounded regardless of corpus size. The
    empirical-CDF threshold is computed with windows over that histogram
    (rows = distinct scores per group, not documents) and broadcast back.
    No per-group global sort of raw rows, and no interpolated percentile:
    the threshold is the score at ascending rank N_g - ceil(keep_frac*N_g) + 1

        thresh(g) = min{ s : #(score <= s) >= N_g - ceil(keep_frac * N_g) + 1 }

    so with all-distinct scores exactly ceil(keep_frac*N_g) docs survive,
    and ties at the threshold survive inclusively (better to keep a few
    extra borderline docs than to drop half a tie class arbitrarily). Pure
    integer/count arithmetic, so an independent engine (the DuckDB
    oracle twin) reproduces it exactly — unlike percentile interpolation,
    whose float semantics differ across engines.
    """
    scored = df.withColumn("quality_score", quality_score_col(F.col(text_col)))
    hist = scored.groupBy(group_col, "quality_score").agg(
        F.count("*").alias("_c")
    )
    w_cdf = (
        Window.partitionBy(group_col)
        .orderBy("quality_score")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_tot = Window.partitionBy(group_col)
    cdf = hist.withColumn("_cum", F.sum("_c").over(w_cdf)).withColumn(
        "_n", F.sum("_c").over(w_tot)
    )
    keep_cnt = F.ceil(F.lit(keep_frac) * F.col("_n"))
    thresh = (
        cdf.filter(F.col("_cum") >= F.col("_n") - keep_cnt + 1)
        .groupBy(group_col)
        .agg(F.min("quality_score").alias("_thresh"))
    )
    # null-safe join-back: groupBy/window treat NULL as a group of its own,
    # so a plain equi-join here (NULL != NULL) would silently drop every
    # NULL-group document regardless of score — the gate must apply to the
    # ungrouped class too, via its own threshold row
    t = thresh.withColumnRenamed(group_col, "_g")
    return (
        scored.join(
            F.broadcast(t), F.col(group_col).eqNullSafe(F.col("_g"))
        )
        .filter(F.col("quality_score") >= F.col("_thresh"))
        .drop("_thresh", "_g")
    )


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    alpha: float = 0.5,
) -> DataFrame:
    """Model-based quality score: per-document mean log-probability under
    an add-α-smoothed corpus bigram language model — the CCNet recipe
    (Wenzek et al. 2020 §3.3: score every document with an LM, filter or
    bucket on perplexity), with the external KenLM swapped for a bigram
    model trained ON the corpus itself so the whole operator is
    deterministic, self-contained, and SQL-oracle-checkable. Low (very
    negative) scores mark improbable token sequences — the gibberish /
    boilerplate tail a pretraining pipeline drops; near-zero scores mark
    degenerate repetition (the model memorizes what dominates).

    Two distributed passes over one shared bigram frame, all JVM-side:

    1. **Model**: per-(doc, bigram) counts (map-side combinable), rolled
       up to corpus bigram counts ``c2`` and prefix counts ``c1`` — the
       c1 rollup reuses c2's shuffle output, so the model costs ONE wide
       shuffle keyed on the bigram. Vocabulary size ``v`` is a 1-row
       aggregate broadcast back (the A2 "share of corpus" shape — never
       a global window).
    2. **Score**: the per-doc bigram frame joins the model on the bigram
       key and averages ``k·log((c2+α)/(c1+α·v))`` weighted by the
       per-doc multiplicity ``k`` — joining DISTINCT doc-bigrams instead
       of the raw token stream cuts the join input on repetitive docs
       by their repetition factor.

    Scale shape (100 TB): the model table is bounded by the corpus's
    distinct-bigram count (Zipf: ≪ token count) and both joins are hash
    equi-joins on the bigram string; the stopword-bigram skew on the
    score join is the classic AQE-skew-split case (same mitigation the
    n-gram Jaccard path documents). Self-training needs no second corpus
    scan: model and score read the same cached/staged bigram frame.

    Returns (doc_id, n_bigrams, lm_logp): docs with < 2 tokens score
    NULL with n_bigrams = 0; lm_logp rounded to 4 places (float-parity
    convention — summation order differs across engines).
    """
    base = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = base.select("doc_id", _tokens(F.col("text")).alias("t"))
    bigrams = toks.filter(F.size("t") >= 2).select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t)-2), i -> concat_ws(' ', t[i], t[i+1]))")
        ).alias("gram"),
    )
    # one shared bigram frame: model (c2 → c1) and score both read dbg, so
    # cut the lineage here — without it the tokenize→explode→groupBy
    # recomputes once per consumer (3 scans of the corpus). The staged
    # warehouse path would materialize this to parquet instead (the
    # cache-vs-staged tradeoff documented at dedup.py's fingerprint cache).
    dbg = bigrams.groupBy("doc_id", "gram").agg(F.count("*").alias("k"))
    dbg = dbg.localCheckpoint(eager=False)
    c2 = dbg.groupBy("gram").agg(F.sum("k").alias("c2"))
    c1 = c2.select(
        F.substring_index(F.col("gram"), " ", 1).alias("w1"), "c2"
    ).groupBy("w1").agg(F.sum("c2").alias("c1"))
    vocab = (
        toks.select(F.explode("t").alias("w"))
        .agg(F.countDistinct("w").alias("v"))
    )
    logp = F.log(
        (F.col("c2") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.col("v"))
    )
    scored = (
        dbg.join(c2, "gram")
        .withColumn("w1", F.substring_index(F.col("gram"), " ", 1))
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            F.round(F.sum(F.col("k") * logp) / F.sum("k"), 4).alias("lm_logp"),
        )
    )
    return base.select("doc_id").join(scored, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "lm_logp",
    )


if __name__ == "__main__":  # library smoke (SURVEY §3.3 per-module CLI)
    import sys

    from dedupe_spark.session import get_spark

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    spark = get_spark(app_name="textstats_smoke", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)
    with_language_id(with_quality_score(docs)).groupBy("pred_lang").count().orderBy(
        "pred_lang"
    ).show()
