"""High-level dedup pipeline: fingerprint → block → score → cluster → pick.

This is the engine's flagship operator — the whole reference pipeline
(/root/reference/dedupe.py:38-250 stages 2-8) as one DataFrame-to-DataFrame
function. Also exposes the individual dedup strategies a training-data
pipeline needs (exact, MinHash-LSH, simhash, n-gram Jaccard) as standalone
operators over any (id, text) table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.functions.fingerprint import make_simhash_udf, with_fingerprints
from dedupe_spark.operators.blocking import (
    candidate_pairs,
    cap_degree,
    exact_groups,
    lsh_buckets,
)
from dedupe_spark.operators.cc import connected_components
from dedupe_spark.operators.representative import (
    order_cols_for,
    with_representative,
)
from dedupe_spark.operators.scoring import score_pairs


def dedup_pipeline(files: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """files(repo, path, commit, lang, content) → per-file cluster assignment.

    Output columns: every input column + file_id, content_sha, size, lines,
    n_tokens, error, cluster_id (null ⇔ singleton), is_representative.

    Stages (each one or zero shuffles — SURVEY.md §4.3):
      1. fingerprint     narrow, Arrow batches
      2. exact tier      1 shuffle on content_sha (groupBy)
      3. LSH tier        explode ×bands, 1 shuffle on band key (window
                         lead-linking, no self-join) — over DISTINCT
                         contents only (super-nodes)
      4. score           joins on id (shuffle), then codegen'd expressions
      5. CC              ~2-4 iterations × (join + groupBy), checkpointed
      6. representative  1 shuffle on cluster_id (window)
    """
    cfg = cfg or PipelineConfig()
    if cfg.langs:
        files = files.filter(F.lower(F.col("lang")).isin([l.lower() for l in cfg.langs]))
    if cfg.sample:
        files = files.limit(cfg.sample)

    fp = with_fingerprints(
        files,
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
        normalize=cfg.normalize,
    ).cache()
    # fingerprints are reused by blocking, scoring and the final join — one
    # cached pass so the pandas UDF runs exactly once. (This in-memory path
    # is the convenience API; at warehouse scale use plans.staged, which
    # materializes the fingerprint checkpoint to parquet instead of caching.)
    fp_slim = fp.select(
        "file_id", "content_sha", "simhash", "minhash_sig", "band_keys", "error"
    )

    # (file_id, content_sha, exact_rep, exact_group_size) — read twice
    # (LSH rep filter + final assignment): cache so the sha groupBy runs once
    eg = exact_groups(fp_slim).cache()

    # near-dup tier over distinct contents only (exact reps = super-nodes)
    reps = fp_slim.join(
        eg.filter(F.col("file_id") == F.col("exact_rep")).select("file_id"),
        "file_id",
    )
    buckets = lsh_buckets(
        reps, max_bucket_size=cfg.max_bucket_size, bucket_salt=cfg.bucket_salt
    )  # single consumer since the lead-based linking (no self-join) — no cache
    pairs = candidate_pairs(
        buckets,
        neighbors_per_band=cfg.neighbors_per_band,
        # near-tier pairs have distinct contents, so with consensus >= 2 the
        # Hamming vote is mandatory — prefilter in-join, never shuffle losers
        hamming_prefilter=(
            cfg.hamming_threshold if cfg.require_agreement >= 2 else None
        ),
    )
    pairs = cap_degree(pairs, max_degree=cfg.max_candidate_degree)
    edges = score_pairs(
        pairs,
        fp_slim,
        hamming_threshold=cfg.hamming_threshold,
        jaccard_threshold=cfg.jaccard_threshold,
        require_agreement=cfg.require_agreement,
    ).filter("is_match")

    # transitive clustering over rep-level edges
    comp = connected_components(edges, max_iterations=cfg.cc_max_iterations)

    # rep-level component label → every member of the exact group;
    # exact groups with no near-dup edges still cluster if size >= 2
    rep_label = comp.withColumnRenamed("file_id", "exact_rep")
    assignment = (
        eg.join(rep_label, "exact_rep", "left")
        .withColumn(
            "cluster_id",
            F.when(F.col("component").isNotNull(), F.col("component")).when(
                F.col("exact_group_size") >= 2, F.col("exact_rep")
            ),
        )
        .select("file_id", "cluster_id")
    )

    out = fp.join(assignment, "file_id", "left")
    # contract: clusters need >= min_cluster_size members (reference
    # duplicate_detector.py:88-89). CC + exact tiers guarantee >=2, so the
    # default (2) costs nothing; a stricter setting demotes undersized
    # clusters to singletons (null cluster_id) BEFORE representative
    # election, with one cluster-keyed aggregation + join — only paid when
    # the knob is actually turned.
    if cfg.min_cluster_size > 2:
        sizes = (
            out.filter(F.col("cluster_id").isNotNull())
            .groupBy("cluster_id")
            .agg(F.count("*").alias("_csz"))
        )
        out = (
            out.join(sizes, "cluster_id", "left")
            .withColumn(
                "cluster_id",
                F.when(
                    F.col("_csz") >= cfg.min_cluster_size, F.col("cluster_id")
                ),
            )
            .drop("_csz")
        )
    out = with_representative(out, order_cols=order_cols_for(cfg.rep_order))
    return out


# ---------------------------------------------------------------------------
# standalone dedup strategies over any (id, text) table — training-data ops
# ---------------------------------------------------------------------------


def exact_dedupe(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via sha256-groupBy: (id, cluster_id, cluster_size, is_representative).

    cluster_id = min(id) over identical text; representative = min id.
    One shuffle; map-side partial aggregation applies. NULL-text rows are
    their own singletons: ``sha2(NULL)`` is NULL and an inner equi-join
    never matches NULL keys, so without the coalesce below every
    null-content row would silently VANISH from the output (fewer rows
    out than in, no error channel). The ``null:<id>`` surrogate cannot
    collide with a real sha (hex digits only).
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(
            F.sha2(F.col(text_col), 256),
            F.concat(F.lit("null:"), F.col(id_col).cast("string")),
        ).alias("sha"),
    )
    g = keyed.groupBy("sha").agg(
        F.min("id").alias("cluster_id"), F.count("*").alias("cluster_size")
    )
    return (
        keyed.join(g, "sha")
        .select(
            "id",
            "cluster_id",
            "cluster_size",
            (F.col("id") == F.col("cluster_id")).alias("is_representative"),
        )
    )


def simhash_hamming_pairs(
    fingerprints: DataFrame, *, hamming_threshold: int = 6, bits: int = 64
) -> DataFrame:
    """(id, simhash) → all pairs (id1 < id2) within Hamming ≤ threshold.

    Pigeonhole-complete banded blocking, block-COMBINATION keyed (the
    design of Manku et al.'s web-scale simhash dedup, WWW'07): split the
    ``bits``-wide fingerprint into ``b ≥ threshold + 2`` near-equal
    blocks. A pair at distance d ≤ threshold differs in at most d blocks,
    so at least 2 blocks match exactly — and every 2-subset of blocks is a
    join table, so some table key matches: recall is guaranteed, never
    probabilistic. Keying on block PAIRS (C(b,2) tables, ~2·bits/b-bit
    keys) instead of single blocks (b tables, bits/b-bit keys) is what
    makes this scale: with single 8-bit blocks a bucket holds n/256 rows —
    quadratic blowup at warehouse n — while 16-bit pair keys bound buckets
    at n/65536. Residual predicate is the exact XOR popcount
    (hash_generator.py:116-140's loop, as JVM ``bit_count``).

    ``simhash`` may be a LongType column (``bits=64``) or an
    ``array<long>`` of ``bits/64`` words (the reference's wider
    ``hash_size`` analog, dedupe.py:84-90) — blocks are cut across word
    boundaries and the residual distance sums per-word popcounts, all
    still codegen'd JVM expressions.
    """
    import itertools

    from pyspark.sql import types as T

    is_wide = isinstance(
        fingerprints.schema["simhash"].dataType, T.ArrayType
    )
    if not is_wide:
        bits = 64
    if bits % 64 or bits < 64:
        raise ValueError(f"bits must be a positive multiple of 64, got {bits}")
    words = bits // 64

    def word(w: int):
        return F.col("simhash")[w] if is_wide else F.col("simhash")

    def block(lo: int, hi: int):
        """Bits [lo, hi) of the concatenated fingerprint as a long."""
        w, off, width = lo // 64, lo % 64, hi - lo
        if width == 64:  # whole word (bounds are word-aligned in this case)
            return word(w)
        avail = 64 - off
        if width <= avail:
            return F.shiftrightunsigned(word(w), off).bitwiseAND(
                F.lit((1 << width) - 1)
            )
        low = F.shiftrightunsigned(word(w), off).bitwiseAND(
            F.lit((1 << avail) - 1)
        )
        high = word(w + 1).bitwiseAND(F.lit((1 << (width - avail)) - 1))
        return low.bitwiseOR(F.shiftleft(high, avail))

    def blocks_for(n_blocks: int):
        bounds = [bits * i // n_blocks for i in range(n_blocks)] + [bits]
        return [block(bounds[i], bounds[i + 1]) for i in range(n_blocks)]

    # pair keys pack two blocks into one long, so widths must be ≤ 32 bits:
    # b ≥ ceil(bits/32) blocks (pigeonhole allows ANY b ≥ threshold + 2)
    n_blocks = min(max(hamming_threshold + 2, -(-bits // 32)), bits)
    combos: list[tuple[int, ...]] = list(
        itertools.combinations(range(n_blocks), 2)
    )
    if len(combos) > 128:
        # beyond 128 tables the explode volume outweighs the bucket
        # shrinkage — fall back to single-block keying (t+1 tables;
        # guarantee needs only 1 clean block; widths must be ≤ 64 ⇒
        # b ≥ words)
        n_blocks = min(max(hamming_threshold + 1, words, 2), bits)
        combos = [(i,) for i in range(n_blocks)]
    blk = blocks_for(n_blocks)
    keys = F.array(
        *[
            F.shiftleft(blk[c[0]], 32).bitwiseOR(blk[c[1]])
            if len(c) == 2
            else blk[c[0]]
            for c in combos
        ]
    )
    chunks = fingerprints.select(
        "id", "simhash", F.posexplode(keys).alias("tbl", "key")
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    hamming = None
    for w in range(words):
        term = F.bit_count(
            (F.col("a.simhash")[w] if is_wide else F.col("a.simhash")).bitwiseXOR(
                F.col("b.simhash")[w] if is_wide else F.col("b.simhash")
            )
        )
        hamming = term if hamming is None else hamming + term
    return (
        a.join(b, ["tbl", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= hamming_threshold)
        .dropDuplicates(["id1", "id2"])
    )


def simhash_dedupe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    hamming_threshold: int = 6,
    cfg: PipelineConfig | None = None,
    bits: int | None = None,
) -> DataFrame:
    """Near-dedup via 64-bit simhash + banded-Hamming blocking + CC.

    Pigeonhole blocking: split the 64-bit fingerprint into ``c`` chunks.
    A pair within Hamming distance ``d`` has its differing bits in at most
    ``d`` chunks, so with ``c ≥ d + 1`` chunks at least one chunk is
    bit-identical — candidates come from ``c`` cheap equi-self-joins
    instead of a cross join, with guaranteed recall. ``c`` is derived from
    ``hamming_threshold`` (threshold 6 → 8 chunks of 8 bits; the old fixed
    4 × 16-bit layout only guaranteed recall for d ≤ 3 and silently missed
    pairs at d = 4..6 whose diffs spread across all four chunks).
    Residual predicate is the exact popcount (hash_generator.py:116-140's
    XOR+popcount, as JVM ``bit_count``).
    Returns (id, cluster_id, is_representative); null cluster ⇔ singleton.

    Identical fingerprints are pre-collapsed into super-nodes before the
    banded join (the flagship pipeline's exact-tier trick): a document
    duplicated a million times enters candidate generation as ONE row, so
    giant exact-dup groups never quadratically inflate any bucket. The
    collapse is lossless — identical simhash ⇒ Hamming 0 ⇒ same cluster —
    and the final labels are identical to the uncollapsed computation
    (component label = min id; each group rep is already its group min).

    ``bits`` (default from ``cfg.simhash_bits``, 64) widens the
    fingerprint — the reference's ``hash_size`` precision dial
    (dedupe.py:84-90): at the same relative threshold a 128-bit
    fingerprint halves the per-bit noise of the majority vote, cutting
    false positives on short/noisy docs. Wide fingerprints are
    ``array<long>``; blocking and the popcount residual generalize
    (``simhash_hamming_pairs``), everything else is width-agnostic.
    """
    cfg = cfg or PipelineConfig()
    bits = bits if bits is not None else cfg.simhash_bits
    if bits == 64:
        simhash_udf = make_simhash_udf(cfg.shingle_k)
    else:
        from dedupe_spark.functions.fingerprint import make_wide_simhash_udf

        simhash_udf = make_wide_simhash_udf(cfg.shingle_k, bits)
    # simhash-only fingerprint: this operator never reads the MinHash
    # signature or band keys, so skip the 128-perm kernels entirely.
    # healthy ⇔ n_tokens > 0 — exactly with_fingerprints' error channel
    # (null / empty / whitespace-only / token-free content all tokenize
    # to zero tokens).
    fp = df.select(
        F.col(id_col).cast("string").alias("id"),
        simhash_udf(F.col(text_col)).alias("_fp"),
    ).select("id", "_fp.simhash", "_fp.n_tokens")
    healthy = fp.filter(F.col("n_tokens") > 0).select("id", "simhash").cache()

    groups = healthy.groupBy("simhash").agg(
        F.min("id").alias("rep"), F.count("*").alias("n")
    )
    edges = simhash_hamming_pairs(
        groups.select(F.col("rep").alias("id"), "simhash"),
        hamming_threshold=hamming_threshold,
        bits=bits,
    )
    comp = connected_components(edges)
    rep_cluster = groups.join(
        comp.withColumnRenamed("file_id", "rep"), "rep", "left"
    ).select(
        "simhash",
        F.when(F.col("component").isNotNull(), F.col("component"))
        .when(F.col("n") >= 2, F.col("rep"))
        .alias("cluster_id"),
    )
    out = healthy.join(rep_cluster, "simhash", "left")
    w_rep = F.min("id").over(
        Window.partitionBy(F.coalesce(F.col("cluster_id"), F.col("id")))
    )
    # materialize, then release the cache — same lifecycle hygiene as
    # ngram_jaccard_dedupe: a cache left behind per call accumulates
    # unified-pool pressure that evicts the UDF caches at scale (the
    # measured 296 s → 592 s failure mode, BENCH/BASELINE.md)
    result = out.select(
        "id", "cluster_id", (F.col("id") == w_rep).alias("is_representative")
    ).localCheckpoint(eager=True)
    healthy.unpersist()
    return result


# Default document-frequency cap for the n-gram set-similarity join. The
# inverted-index join is O(df²) PER GRAM: one stopword bigram appearing in
# 10^6 documents alone contributes 5·10^11 joined rows — the single latent
# scale-killer in an otherwise linear plan. Ubiquitous grams carry no
# discriminative signal (they shift Jaccard uniformly), so capping df is
# the standard prefix-filter hygiene, not an approximation a user must
# opt into. 1000 bounds any gram's join group at 10^6 rows while leaving
# every discriminative gram intact at the corpus sizes where exact n-gram
# Jaccard is even viable; pass ``max_df=None`` explicitly for the
# unbounded literal semantics on small corpora.
DEFAULT_NGRAM_MAX_DF = 1000


def _doc_grams(df: DataFrame, id_col: str, text_col: str, *, k: int) -> DataFrame:
    """Distinct (id, gram) rows: whitespace tokens → full k-grams only."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.trim(F.lower(F.col(text_col))), "\\s+")).alias(
            "pos", "tok"
        ),
    )
    w = Window.partitionBy("id").orderBy("pos")
    return (
        toks.select(
            "id",
            F.concat_ws(
                " ", "tok", *[F.lead("tok", i).over(w) for i in range(1, k)]
            ).alias("gram"),
            F.lead("tok", k - 1).over(w).isNotNull().alias("full"),
        )
        .filter("full")
        .select("id", "gram")
        .distinct()
    )


def _df_cap(
    grams: DataFrame, *, max_df: int, weights: DataFrame | None = None
) -> DataFrame:
    """Drop grams whose document frequency exceeds ``max_df``.

    Skew-safe form: the df count is a ``groupBy(gram)`` — map-side partial
    aggregation, so a stopword gram contributes one partial count per task,
    never O(corpus) rows into a single window task (the r2 design counted
    with ``count(*) OVER (PARTITION BY gram)``, which shuffled every
    occurrence of exactly the hot grams the cap exists to drop into one
    task). The over-cap gram list is tiny by construction (≤ total gram
    occurrences / max_df) and broadcast for an exchange-free anti-join.

    ``weights`` (optional, (id, w)): counts each doc-gram occurrence with
    weight ``w`` — callers that pre-collapsed exact-duplicate texts pass
    the group sizes so df means "documents containing the gram", not
    "distinct texts containing it".
    """
    if weights is not None:
        weighted = grams.join(weights, "id").select(
            "gram", F.col("w").cast("long").alias("w")
        )
        counts = weighted.groupBy("gram").agg(F.sum("w").alias("df"))
    else:
        counts = grams.groupBy("gram").agg(F.count("*").alias("df"))
    hot = counts.filter(F.col("df") > max_df).select("gram")
    return grams.join(F.broadcast(hot), "gram", "left_anti")


def _jaccard_pairs_from_grams(grams: DataFrame, *, threshold: float) -> DataFrame:
    """(id, gram) → (id1 < id2, jaccard ≥ threshold) via inverted-index join."""
    sizes = grams.groupBy("id").agg(F.count("*").alias("n_grams"))
    a, b = grams.alias("a"), grams.alias("b")
    inter = (
        a.join(b, "gram")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .agg(F.count("*").alias("n_inter"))
    )
    s1 = sizes.select(F.col("id").alias("id1"), F.col("n_grams").alias("n1"))
    s2 = sizes.select(F.col("id").alias("id2"), F.col("n_grams").alias("n2"))
    # filter on the UNROUNDED ratio (the oracle's WHERE clause does the
    # same) — rounding only the output column avoids a parity flake for
    # pairs in [threshold - 5e-7, threshold)
    ratio = F.col("n_inter") / (F.col("n1") + F.col("n2") - F.col("n_inter"))
    return (
        inter.join(s1, "id1")
        .join(s2, "id2")
        .filter(ratio >= threshold)
        .select("id1", "id2", F.round(ratio, 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 2,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_NGRAM_MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard similarity self-join, fully relational.

    distinct (id, gram) rows → self-join on gram (inverted-index join; the
    classic set-similarity join) → |∩| per pair via groupBy → Jaccard by
    inclusion-exclusion against per-doc gram counts. No UDF anywhere, so the
    whole plan is codegen'd and the oracle twin runs verbatim in DuckDB.

    Scale note: the gram join is the textbook prefix-filter candidate; hot
    grams (stopword shingles) are the skew risk. ``max_df`` drops grams
    appearing in more than that many documents from the universe BEFORE the
    join — the standard set-similarity-join df-cap, computed skew-safely
    (partial-agg count + broadcast anti-join, see ``_df_cap``). Similarity
    then means "Jaccard over sub-ubiquitous grams" (hot grams carry no
    discriminative signal anyway); each per-gram join group shrinks from
    O(df²) to O(max_df²). The SQL oracle applies the identical cap, so
    parity holds exactly.

    ``max_df`` DEFAULTS to ``DEFAULT_NGRAM_MAX_DF`` (see its comment): an
    uncapped call on a web-scale corpus is O(df²) on its hottest gram, so
    unbounded semantics are opt-in (``max_df=None``), never the silent
    default.
    """
    grams = _doc_grams(df, id_col, text_col, k=k)
    if max_df is not None:
        grams = _df_cap(grams, max_df=max_df)
    return _jaccard_pairs_from_grams(grams, threshold=threshold)


def ngram_jaccard_dedupe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 2,
    threshold: float = 0.5,
    max_df: int | None = DEFAULT_NGRAM_MAX_DF,
) -> DataFrame:
    """Exact n-gram Jaccard near-dedup: τ-pairs → connected components.

    ``max_df`` defaults to ``DEFAULT_NGRAM_MAX_DF`` — see
    ``ngram_jaccard_pairs``; pass ``None`` for unbounded.

    Byte-identical texts are pre-collapsed into super-nodes before the
    set-similarity join (a giant exact-dup group would otherwise emit
    O(m²) Jaccard-1 pairs). The collapse preserves the UNCOLLAPSED
    semantics exactly — what the DuckDB oracle twin computes:

    * the ``max_df`` cap counts df weighted by group size (df = number of
      DOCUMENTS containing the gram, not distinct texts), so the surviving
      gram set per text matches the uncollapsed run;
    * an exact group only clusters through the n ≥ 2 rule if its text has
      at least one surviving gram — identical texts shorter than ``k``
      tokens (or whose grams were all df-capped) produce no Jaccard pair
      in the uncollapsed closure either, so they stay null;
    * labels are unchanged: component label = min id, and each group rep
      is its group min, so min-over-reps equals min-over-members.
    """
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("_text"),
        F.md5(F.col(text_col)).alias("_tkey"),
    )
    groups = keyed.groupBy("_tkey").agg(
        F.min("id").alias("rep"), F.count("*").alias("n")
    )
    rep_rows = keyed.join(
        groups.select(F.col("_tkey"), F.col("rep").alias("id")),
        ["_tkey", "id"],
    )
    # persist: the gram table feeds the df-cap count, both sides of the
    # inverted-index join, the per-doc sizes AND the has-gram gate — five
    # scans; without the cache the explode+window+distinct chain re-executes
    # in every job that touches one (CC's edge checkpoint + the final join).
    # Unpersisted below once rep_cluster is materialized — a leaked cache
    # entry per call would build exactly the unified-pool pressure that
    # evicted UDF caches at the 1M-file scale (commit d61c87f).
    gram_cache = _doc_grams(rep_rows, "id", "_text", k=k).persist()
    grams = gram_cache
    if max_df is not None:
        weights = groups.select(F.col("rep").alias("id"), F.col("n").alias("w"))
        grams = _df_cap(grams, max_df=max_df, weights=weights)
    edges = _jaccard_pairs_from_grams(grams, threshold=threshold)
    comp = connected_components(edges)
    has_gram = grams.select("id").distinct().withColumn("_hg", F.lit(True))
    rep_cluster = (
        groups.join(comp.withColumnRenamed("file_id", "rep"), "rep", "left")
        .join(has_gram.withColumnRenamed("id", "rep"), "rep", "left")
        .select(
            "_tkey",
            F.when(F.col("component").isNotNull(), F.col("component"))
            .when((F.col("n") >= 2) & F.col("_hg"), F.col("rep"))
            .alias("cluster_id"),
        )
        # eager: rep_cluster (one row per distinct text) is the last reader
        # of the gram cache; materializing it here — a pass the final join
        # needed anyway — lets the cache be released before returning
        .localCheckpoint(eager=True)
    )
    gram_cache.unpersist()
    return keyed.join(rep_cluster, "_tkey", "left").select("id", "cluster_id")


def minhash_lsh_dedupe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """Near-dedup via MinHash-LSH + CC on any (id, text) table.

    Returns (id, cluster_id) with null cluster_id for singletons.
    """
    cfg = cfg or PipelineConfig()
    files = df.select(
        F.col(id_col).cast("string").alias("path"),
        F.col(text_col).alias("content"),
    ).withColumn("repo", F.lit("t")).withColumn("commit", F.lit("0")).withColumn(
        "lang", F.lit("text")
    )
    out = dedup_pipeline(files, cfg)
    return out.select(
        F.col("path").cast("string").alias("id"), "cluster_id", "is_representative"
    )


if __name__ == "__main__":  # library smoke (SURVEY §3.3 per-module CLI)
    import sys

    from dedupe_spark.session import get_spark

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    spark = get_spark(app_name="dedup_smoke", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)
    out = exact_dedupe(docs, "doc_id", "text")
    n_dups = out.filter("cluster_size >= 2").count()
    print(f"{out.count()} rows, {n_dups} in exact-duplicate groups")
