"""Pairwise scoring + consensus voting over candidate pairs.

Reference semantics being reproduced:
  * Hamming distance = XOR + popcount over 64-bit fingerprints
    (/root/reference/hash_generator.py:116-140) — here a single JVM-side
    ``bit_count(simhash1 ^ simhash2)``; no UDF, fully codegen'd.
  * similarity predicate ``distance <= threshold``
    (hash_generator.py:142-158, default threshold 10).
  * consensus voting: >= k of m independent similarity signals
    (get_consensus_similarity, hash_generator.py:160-187; k default 2) —
    here the signals are {sha-equality, simhash-Hamming, MinHash-Jaccard}.
  * errored/empty rows are never similar (hash_generator.py:154-155,
    174-175) — enforced upstream by filtering error IS NULL before blocking.

MinHash-Jaccard is the estimate fraction-of-equal-lanes, computed JVM-side
with zip_with + aggregate (no Python in the pair loop at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAIR_FEATURES = ["simhash", "minhash_sig", "content_sha"]


def score_pairs(
    pairs: DataFrame,
    fp: DataFrame,
    *,
    hamming_threshold: int,
    jaccard_threshold: float,
    require_agreement: int,
) -> DataFrame:
    """Join fingerprints onto (id1, id2) and score; returns edges.

    Output: (id1, id2, hamming, jaccard, votes, is_match).
    """
    feats = fp.select(F.col("file_id"), *PAIR_FEATURES)
    f1 = feats.select(
        F.col("file_id").alias("id1"),
        F.col("simhash").alias("simhash1"),
        F.col("minhash_sig").alias("sig1"),
        F.col("content_sha").alias("sha1"),
    )
    f2 = feats.select(
        F.col("file_id").alias("id2"),
        F.col("simhash").alias("simhash2"),
        F.col("minhash_sig").alias("sig2"),
        F.col("content_sha").alias("sha2"),
    )
    scored = (
        pairs.join(f1, "id1")
        .join(f2, "id2")
        .withColumn(
            "hamming",
            F.bit_count(F.expr("simhash1 ^ simhash2")).cast("int"),
        )
        .withColumn(
            "jaccard",
            F.expr(
                "aggregate(zip_with(sig1, sig2, (x, y) -> IF(x = y, 1, 0)),"
                " 0, (acc, v) -> acc + v)"
            )
            / F.size("sig1"),
        )
        .withColumn(
            "votes",
            (F.col("sha1") == F.col("sha2")).cast("int")
            + (F.col("hamming") <= F.lit(hamming_threshold)).cast("int")
            + (F.col("jaccard") >= F.lit(jaccard_threshold)).cast("int"),
        )
        .withColumn("is_match", F.col("votes") >= F.lit(require_agreement))
    )
    return scored.select("id1", "id2", "hamming", "jaccard", "votes", "is_match")
