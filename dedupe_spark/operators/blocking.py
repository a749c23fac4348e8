"""Blocking — replaces the reference's O(n²) all-pairs loop.

The reference compares every file to every other file
(/root/reference/duplicate_detector.py:62-87, n(n-1)/2 comparisons —
1.68e9 at 58k files, ~1.4h single-threaded). At 10^12 files that's
impossible; we decompose the theta-join into:

  exact tier:  group identical contents on sha256 — a single shuffle, no
               pairs materialized at all.
  near tier:   MinHash-LSH band keys → equi-self-join per bucket →
               candidate pairs, Hamming/Jaccard residual predicate applied
               after (the classic LSH decomposition of a similarity join).

Scale levers (SURVEY.md §4.2):
  * near-dup search runs over DISTINCT contents only — every exact-dup
    group enters as one super-node (its min-file_id representative), so a
    file duplicated a million times costs one row, not 10^12 pairs.
  * hot buckets are salted per (band, file) so no single task explodes;
    the sub-buckets a giant family is split into are re-merged by
    connected components because different bands split differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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


def lsh_buckets(fp_reps: DataFrame, *, max_bucket_size: int, bucket_salt: int) -> DataFrame:
    """Explode band keys into (band_id, band_hash, salt, file_id) bucket rows.

    ``fp_reps`` must already be deduplicated to one row per distinct content
    (the exact-tier representatives). Buckets whose size exceeds
    ``max_bucket_size`` are salted: each member lands in one of
    ``bucket_salt`` sub-buckets chosen by a per-(band,file) hash, bounding
    the quadratic within-bucket work. Different bands salt differently, so
    transitive closure re-merges the split (see module docstring).
    """
    exploded = fp_reps.select(
        "file_id",
        F.posexplode("band_keys").alias("band_id", "band_hash"),
    )
    sizes = exploded.groupBy("band_id", "band_hash").agg(F.count("*").alias("bucket_n"))
    # buckets of size 1 can't produce pairs — drop them before the self-join
    exploded = exploded.join(
        sizes.filter(F.col("bucket_n") >= 2), ["band_id", "band_hash"]
    )
    return exploded.withColumn(
        "salt",
        F.when(
            F.col("bucket_n") > max_bucket_size,
            F.pmod(F.xxhash64("file_id", "band_id"), F.lit(bucket_salt)),
        ).otherwise(F.lit(0)),
    ).select("band_id", "band_hash", "salt", "file_id")


def candidate_pairs(buckets: DataFrame) -> DataFrame:
    """Within-bucket self-join → distinct candidate pairs (id1 < id2).

    ``id1 < id2`` halves the pairs (the reference's ``j > i`` triangular
    enumeration, duplicate_detector.py:76); dropDuplicates collapses pairs
    that collide in several bands so each pair is scored once (SURVEY §4.2).
    """
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band_id", "band_hash", "salt"])
        .filter(F.col("a.file_id") < F.col("b.file_id"))
        .select(
            F.col("a.file_id").alias("id1"),
            F.col("b.file_id").alias("id2"),
        )
        .dropDuplicates(["id1", "id2"])
    )
