"""Blocking — replaces the reference's O(n²) all-pairs loop.

The reference compares every file to every other file
(/root/reference/duplicate_detector.py:62-87, n(n-1)/2 comparisons —
1.68e9 at 58k files, ~1.4h single-threaded). At 10^12 files that's
impossible; we decompose the theta-join into:

  exact tier:  group identical contents on sha256 — a single shuffle, no
               pairs materialized at all.
  near tier:   MinHash-LSH band keys → bounded within-bucket neighbor
               linking → candidate pairs, Hamming/Jaccard residual
               predicate applied during/after (the classic LSH
               decomposition of a similarity join).

Scale levers (SURVEY.md §4.2), all measured on the 5×10^5-row bench:
  * near-dup search runs over DISTINCT contents only — every exact-dup
    group enters as one super-node (its min-file_id representative), so a
    file duplicated a million times costs one row, not 10^12 pairs.
  * **bounded candidate degree**: within a bucket each member links to at
    most ``neighbors_per_band`` successors in a per-band random order
    (xxhash64(file_id, band_id)), so candidates are O(n · bands · k) —
    LINEAR in n — instead of Σ bucket².  Naive all-pairs materialized
    792M rows (≈80 GB shuffle) on a 100-copy-family corpus; this emits
    128M bounded, most killed in-join by the prefilter below.  The random
    order differs per band, so across b bands a member meets ~b·k distinct
    bucket-mates — a random graph over the true-collision set, which CC
    closes into the same components all-pairs would produce (families are
    near-cliques; SURVEY §2.7).  The reference itself links members to a
    single seed, not all-pairs (duplicate_detector.py:84-86) — bounded
    linking is the same star idea with redundancy.
  * **in-join Hamming prefilter**: bucket rows carry the 64-bit simhash
    (8 bytes), so implausible pairs die inside the join via
    ``bit_count(sim1 ^ sim2) > t`` and are never shuffled to dedup or
    scoring.  Semantics-preserving when consensus needs ≥2 votes: the near
    tier has no sha-equal pairs (distinct contents), so every match must
    pass the Hamming vote anyway.
  * hot buckets are salted per (band, file) so no single task explodes;
    different bands salt differently, so CC re-merges the split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def exact_groups(fp: DataFrame) -> DataFrame:
    """Exact tier: one row per file with its exact-group representative.

    Returns (file_id, content_sha, exact_rep, exact_group_size).
    ``exact_rep`` = min(file_id) within the sha group — deterministic.
    A single hash-shuffle on content_sha; Catalyst does partial (map-side)
    aggregation automatically.
    """
    healthy = fp.filter(F.col("error").isNull())
    w = (
        healthy.groupBy("content_sha")
        .agg(
            F.min("file_id").alias("exact_rep"),
            F.count("*").alias("exact_group_size"),
        )
    )
    return healthy.select("file_id", "content_sha").join(w, "content_sha")


def lsh_buckets(
    fp_reps: DataFrame, *, max_bucket_size: int, bucket_salt: int
) -> DataFrame:
    """Explode band keys into (band_id, band_hash, salt, file_id, simhash).

    ``fp_reps`` must already be deduplicated to one row per distinct content
    (the exact-tier representatives). Buckets larger than ``max_bucket_size``
    are salted: each member lands in one of ``bucket_salt`` sub-buckets via
    a per-(band,file) hash, bounding within-bucket work; transitive closure
    re-merges the split because bands salt differently.

    Skew-safe sizing: bucket sizes come from a ``groupBy`` — map-side
    partial aggregation, so a degenerate hot bucket contributes one partial
    count per task, never all its occurrences into a single task (the r2
    design counted with ``count(*) OVER (PARTITION BY band_id, band_hash)``,
    which concentrated exactly the bucket salting exists to split). The
    over-cap bucket list is tiny by construction (≤ n·bands /
    max_bucket_size keys) and broadcast back — the salt assignment is a
    pure projection with ZERO exchange of the exploded rows; the only full
    exchange on bucket keys downstream is ``candidate_pairs``' window,
    which partitions on the already-salted key. Singleton buckets are no
    longer pre-filtered (that filter itself cost a full keyed exchange);
    they die in the rank-join for free.

    The simhash rides along (8 bytes/row) to enable the in-join Hamming
    prefilter in ``candidate_pairs`` — see module docstring.
    """
    exploded = fp_reps.select(
        "file_id",
        "simhash",
        F.posexplode("band_keys").alias("band_id", "band_hash"),
    )
    hot = (
        exploded.groupBy("band_id", "band_hash")
        .agg(F.count("*").alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket_size)
        .select("band_id", "band_hash", F.lit(True).alias("_hot"))
    )
    return (
        exploded.join(F.broadcast(hot), ["band_id", "band_hash"], "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_hot"),
                F.pmod(F.xxhash64("file_id", "band_id"), F.lit(bucket_salt)),
            ).otherwise(F.lit(0)),
        )
        .select("band_id", "band_hash", "salt", "file_id", "simhash")
    )


def lsh_bucket_delta(
    fp_new_reps: DataFrame, existing_buckets: DataFrame, *, bucket_salt: int
) -> DataFrame:
    """Band-explode ONLY a batch of new representatives, salting each row
    consistently with the already-written bucket table.

    ``lsh_buckets`` decides hotness from a global count over its input; a
    delta batch cannot see global sizes without the corpus-wide groupBy this
    path exists to avoid. Instead, a bucket is treated as hot iff its
    existing rows are salted (``max(salt) > 0`` among rows sharing the band
    key — detected via a scan of the bucket table semi-joined to the
    delta's band keys, so the aggregation is delta-bounded). The salt
    formula is the same pure per-(band, file) hash as ``lsh_buckets``, so a
    delta row lands in exactly the sub-bucket its old co-members occupy.

    Deliberate staleness tradeoff (documented for the 100-TB design): a
    bucket that only becomes hot through appended deltas keeps salt 0 until
    the next full rebucketing (StagedPipeline re-run from the ``buckets``
    stage — the compaction analog). Within-bucket work stays bounded
    regardless, because candidate generation ranks and caps neighbors per
    (file, band).
    """
    exploded = fp_new_reps.select(
        "file_id",
        "simhash",
        F.posexplode("band_keys").alias("band_id", "band_hash"),
    )
    delta_keys = exploded.select("band_id", "band_hash").distinct()
    hot = (
        existing_buckets.join(
            F.broadcast(delta_keys), ["band_id", "band_hash"], "left_semi"
        )
        .groupBy("band_id", "band_hash")
        .agg(F.max("salt").alias("_mx"))
        .filter(F.col("_mx") > 0)
        .select("band_id", "band_hash", F.lit(True).alias("_hot"))
    )
    return (
        exploded.join(F.broadcast(hot), ["band_id", "band_hash"], "left")
        .withColumn(
            "salt",
            F.when(
                F.col("_hot"),
                F.pmod(F.xxhash64("file_id", "band_id"), F.lit(bucket_salt)),
            ).otherwise(F.lit(0)),
        )
        .select("band_id", "band_hash", "salt", "file_id", "simhash")
    )


def candidate_pairs(
    buckets: DataFrame,
    *,
    neighbors_per_band: int = 8,
    hamming_prefilter: int | None = None,
) -> DataFrame:
    """Bounded within-bucket linking → distinct candidate pairs (id1 < id2).

    Each bucket member is ranked by a per-band random order and linked to
    its ``neighbors_per_band`` successors in that order; optional Hamming
    prefilter applied before the pair ever shuffles (see module docstring).
    Cross-band duplicates collapse via groupBy, which also yields
    ``n_bands`` — how many band-windows proposed the pair — free LSH
    evidence for the edge checkpoint.

    Successors come from ``lead(i)`` over the SAME sorted window pass —
    not from a rank self-join. The r1-r3 design joined the ranked table to
    itself on the bucket key and filtered to ``a.rn < b.rn <= a.rn + k``;
    a sort-merge join on the bucket key materializes Σ bucket_n² rows
    BEFORE that rank-range predicate can prune (an inequality can't be a
    join key), so a salted-to-2000 bucket still emitted 4M intermediate
    rows. Measured at 100k files/local[8] (r4 slow-regime host): 90.8 s
    for the join form vs 19.0 s for this one, identical 1,018,526 output
    pairs — and the gap widens with family size since lead emits exactly
    n·k rows regardless of bucket shape. One sort, no join, no quadratic
    intermediate; this is the plan shape a 100-TB run needs.

    ``least/greatest`` orient each pair as id1 < id2 (the reference's
    triangular ``j > i``, duplicate_detector.py:76) regardless of the
    random rank order, so cross-band dedup is well-keyed.
    """
    w = Window.partitionBy("band_id", "band_hash", "salt").orderBy(
        F.xxhash64("file_id", "band_id"), "file_id"
    )
    succ = F.array(
        *[
            F.struct(
                F.lead("file_id", i).over(w).alias("pid"),
                F.lead("simhash", i).over(w).alias("psim"),
            )
            for i in range(1, neighbors_per_band + 1)
        ]
    )
    linked = (
        buckets.select("file_id", "simhash", succ.alias("succ"))
        .select("file_id", "simhash", F.explode("succ").alias("s"))
        .filter(F.col("s.pid").isNotNull())
    )
    if hamming_prefilter is not None:
        linked = linked.filter(
            F.bit_count(F.col("simhash").bitwiseXOR(F.col("s.psim")))
            <= hamming_prefilter
        )
    return (
        linked.groupBy(
            F.least(F.col("file_id"), F.col("s.pid")).alias("id1"),
            F.greatest(F.col("file_id"), F.col("s.pid")).alias("id2"),
        )
        .agg(F.count("*").alias("n_bands"))
    )


def cap_degree(pairs: DataFrame, *, max_degree: int) -> DataFrame:
    """Keep each file's top-``max_degree`` candidate partners.

    Ordered by ``n_bands`` desc (more band collisions ⇔ higher estimated
    similarity — the LSH evidence), ties by partner id. A pair survives if
    it is in EITHER endpoint's top-K: the OR keeps every member attached to
    its best partners, so family connectivity is preserved (a K-out random
    graph is connected whp) while pairwise-scoring and CC input shrink from
    O(n · bands · neighbors) to O(n · K).

    Measured on the 5×10^5-row bench: 22.7M candidate edges → ~4M scored
    edges with identical final clusters. Cost: two windows over the
    deduped pair set — cheap next to moving 128-lane signatures for every
    extra pair.
    """
    w1 = Window.partitionBy("id1").orderBy(F.desc("n_bands"), "id2")
    w2 = Window.partitionBy("id2").orderBy(F.desc("n_bands"), "id1")
    return (
        pairs.withColumn("r1", F.row_number().over(w1))
        .withColumn("r2", F.row_number().over(w2))
        .filter((F.col("r1") <= max_degree) | (F.col("r2") <= max_degree))
        .drop("r1", "r2")
    )
