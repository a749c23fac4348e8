"""Benchmark decontamination: flag training docs overlapping an eval set.

A pretraining pipeline must remove (or at least flag) training documents
that share long word n-grams with evaluation benchmarks, or downstream
eval numbers are contaminated (GPT-3 Appendix C uses 13-gram collision
removal; PaLM and Llama run the same shape with 8-10 grams). The
reference engine has no analog — this is one of the training-data
operators layered on top of its dedup surface (SURVEY.md §2 addendum).

Scale shape (the only one that works at 100 TB):

* The benchmark side is tiny relative to the corpus (MBs of eval sets vs
  TBs of crawl), so its distinct-gram set is **broadcast** — the corpus
  side never shuffles on gram.
* Corpus grams are built with pure array expressions (``split`` →
  ``transform``/``slice`` → ``array_distinct``), all inside whole-stage
  codegen — no Python, no per-doc window, no explode-then-window shuffle.
* After the map-side broadcast join, one doc-keyed aggregation (with
  map-side partial agg) produces the per-doc overlap counts. Total: one
  shuffle, keyed on doc id.
* ``broadcast_benchmark=False`` degrades gracefully to a sort-merge join
  for the (rare) case where the benchmark side is itself huge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ngram_array(text: Column, n: int, *, distinct: bool = True) -> Column:
    """Word ``n``-grams of ``text`` as ``array<string>`` (distinct by
    default; ``distinct=False`` keeps positional duplicates for callers
    that count gram modes, e.g. ``textstats.repetition_stats``).

    Lower-cased whitespace tokens, space-joined — the same gram convention
    as ``dedup._doc_grams`` so decontamination and Jaccard dedup agree on
    what a gram is. Documents shorter than ``n`` tokens yield an empty
    array (not null), so downstream ``explode_outer`` keeps the doc row.

    Built by ``zip_with``-folding ``n`` aligned shifted views of the token
    array (each sliced to exactly ``size - n + 1`` elements, so zip_with
    never null-pads). Measured 6× faster than the
    ``transform(sequence, slice)`` form at sf0.1 (1.6 s vs 10.2 s for the
    corpus gram explode): per-element lambda+slice stays interpreted,
    while the aligned-slice fold is a handful of array kernels.
    """
    toks = F.split(F.trim(F.lower(text)), "\\s+")
    acc = gram_fold(toks, n)
    if distinct:
        acc = F.array_distinct(acc)
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, acc).otherwise(empty)


def gram_fold(toks: Column, n: int) -> Column:
    """The raw ``zip_with`` fold over an already-tokenized array: positional
    (duplicate-preserving) ``n``-grams, exactly ``size - n + 1`` of them.
    Only meaningful when ``size >= n`` — callers guard short arrays."""
    m = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, m)
    for i in range(1, n):
        shifted = F.slice(toks, i + 1, m)
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return acc


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-doc n-gram overlap between ``corpus`` and ``benchmark``.

    Returns one row per corpus document::

        (id_col, n_grams, matched_grams, contaminated)

    where ``n_grams`` is the doc's distinct-gram count, ``matched_grams``
    how many of those appear anywhere in the benchmark, and
    ``contaminated`` is ``matched_grams >= min_overlap``.
    """
    bench_grams = (
        benchmark.select(
            F.explode(ngram_array(F.col(text_col), n)).alias("gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    corpus_grams = corpus.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(ngram_array(F.col(text_col), n)).alias("gram"),
    )
    return (
        corpus_grams.join(bench_grams, "gram", "left")
        .groupBy("_id")
        .agg(
            # count("gram") not count(*): the explode_outer null row that
            # keeps short docs present must not count as a gram.
            F.count("gram").alias("n_grams"),
            F.count("_hit").alias("matched_grams"),
        )
        .select(
            F.col("_id").alias(id_col),
            "n_grams",
            "matched_grams",
            (F.col("matched_grams") >= min_overlap).alias("contaminated"),
        )
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse
    import sys

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("corpus", help="parquet path of the training corpus")
    p.add_argument("benchmark", help="parquet path of the benchmark/eval set")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("-n", type=int, default=3, help="gram width (words)")
    p.add_argument("--min-overlap", type=int, default=1)
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="decontaminate")
    out = decontaminate(
        spark.read.parquet(a.corpus),
        spark.read.parquet(a.benchmark),
        id_col=a.id_col,
        text_col=a.text_col,
        n=a.n,
        min_overlap=a.min_overlap,
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("matched_grams")).show(20, truncate=False)
    n_bad = out.filter("contaminated").count()
    print(f"contaminated: {n_bad}", file=sys.stderr)


def cross_dedupe(
    corpus: DataFrame,
    reference: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    cfg=None,
    broadcast_reference: bool = True,
) -> DataFrame:
    """Fuzzy cross-corpus dedup: flag every corpus doc that exactly or
    NEARLY duplicates any reference doc (the fuzzy companion to
    ``decontaminate``'s exact n-gram rule — the "dedup the training set
    against the eval set" pass of NeMo-Curator-style pipelines, and the
    general A-vs-B fuzzy set difference).

    Tiers (same consensus semantics as the flagship pipeline):

    * **exact**: corpus ``content_sha`` equi-joined against the reference
      sha set.
    * **near**: corpus docs with no exact hit, LSH-band equi-join against
      the reference band keys with an in-join Hamming prefilter (losers
      never reach the pair-dedup shuffle), then simhash Hamming ≤
      ``cfg.hamming_threshold`` AND MinHash-Jaccard ≥
      ``cfg.jaccard_threshold``. This is the flagship's 2-of-3 consensus
      specialized to cross pairs: the sha vote cannot fire between
      non-exact pairs, so agreement ≥ 2 means both remaining signals —
      the rule is fixed, ``cfg.require_agreement`` is not consulted.

    Returns one row per corpus doc::

        (id, matched, match_kind 'exact'|'near'|null, ref_id)

    ``ref_id`` is the minimum matching reference id (exact hits take
    precedence) — deterministic, so reruns and the DuckDB twin agree.
    Errored corpus rows (empty content) come out unmatched.

    Scale shape: the reference side (eval benchmarks, a blocklist) is
    normally MBs against a 100-TB corpus, so both reference sides are
    broadcast by default — the corpus never shuffles on sha or band key;
    the only corpus-keyed exchanges are the two per-id aggregations.
    ``broadcast_reference=False`` degrades to shuffle equi-joins when the
    reference is itself warehouse-scale (at which point
    ``plans.incremental`` — new-vs-all with bucket maintenance — is
    usually the better tool).
    """
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.functions.fingerprint import with_fingerprints
    from dedupe_spark.operators.scoring import _minhash_jaccard

    cfg = cfg or PipelineConfig()

    def fp_of(df: DataFrame) -> DataFrame:
        files = (
            df.select(
                F.col(id_col).cast("string").alias("path"),
                F.col(text_col).alias("content"),
            )
            .withColumn("repo", F.lit("t"))
            .withColumn("commit", F.lit("0"))
            .withColumn("lang", F.lit("text"))
        )
        return with_fingerprints(
            files,
            shingle_k=cfg.shingle_k,
            num_perm=cfg.num_perm,
            bands=cfg.lsh_bands,
            rows=cfg.lsh_rows,
            normalize=cfg.normalize,
        ).select(
            F.col("path").alias("id"),
            "content_sha",
            "simhash",
            "minhash_sig",
            "band_keys",
            "error",
        )

    cfp = fp_of(corpus).localCheckpoint(eager=False)
    # reference fingerprints are read by both tiers; errored refs can't match
    rfp = fp_of(reference).filter(F.col("error").isNull()).localCheckpoint(
        eager=False
    )
    healthy = cfp.filter(F.col("error").isNull())

    # --- exact tier: sha membership --------------------------------------
    ref_shas = rfp.groupBy("content_sha").agg(F.min("id").alias("ref_id"))
    if broadcast_reference:
        ref_shas = F.broadcast(ref_shas)
    exact = healthy.select("id", "content_sha").join(ref_shas, "content_sha").select(
        "id", "ref_id"
    )

    # --- near tier: LSH cross-blocking + consensus ------------------------
    near_side = healthy.join(exact.select("id"), "id", "left_anti")
    # band explode carries only (id, simhash) — 16 bytes/row; the 128-lane
    # MinHash signatures are joined back AFTER the candidate set is
    # deduplicated, so they are never multiplied by the band fan-out or
    # shuffled through dropDuplicates (the flagship's prefetch-by-semi-join
    # shape, plans/incremental.py scoring stage)
    c_bands = near_side.select(
        "id", "simhash", F.posexplode("band_keys").alias("band_id", "band_hash")
    )
    r_bands = rfp.select(
        F.col("id").alias("rid"),
        F.col("simhash").alias("r_simhash"),
        F.posexplode("band_keys").alias("band_id", "band_hash"),
    )
    if broadcast_reference:
        r_bands = F.broadcast(r_bands)
    cand_ids = (
        c_bands.join(r_bands, ["band_id", "band_hash"])
        # in-join prefilter: Hamming losers die before the dedup shuffle
        .filter(
            F.bit_count(F.expr("simhash ^ r_simhash"))
            <= F.lit(cfg.hamming_threshold)
        )
        .select("id", "rid")
        .dropDuplicates(["id", "rid"])
    )
    r_sigs = rfp.select(F.col("id").alias("rid"), F.col("minhash_sig").alias("r_sig"))
    if broadcast_reference:
        r_sigs = F.broadcast(r_sigs)
    cand = (
        cand_ids.join(near_side.select("id", "minhash_sig"), "id")
        .join(r_sigs, "rid")
        .withColumn("jaccard", _minhash_jaccard(F.col("minhash_sig"), F.col("r_sig")))
        .filter(F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
    )
    near = cand.groupBy("id").agg(F.min("rid").alias("ref_id"))

    # --- assemble ----------------------------------------------------------
    e = exact.select("id", F.col("ref_id").alias("_e_ref"))
    n = near.select("id", F.col("ref_id").alias("_n_ref"))
    return (
        cfp.select("id")
        .join(e, "id", "left")
        .join(n, "id", "left")
        .select(
            "id",
            (F.col("_e_ref").isNotNull() | F.col("_n_ref").isNotNull()).alias(
                "matched"
            ),
            F.when(F.col("_e_ref").isNotNull(), F.lit("exact"))
            .when(F.col("_n_ref").isNotNull(), F.lit("near"))
            .alias("match_kind"),
            F.coalesce("_e_ref", "_n_ref").alias("ref_id"),
        )
    )
