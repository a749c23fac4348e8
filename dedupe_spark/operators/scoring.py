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

MinHash-Jaccard is the estimate fraction-of-equal-lanes. Measured note: the
"obvious" JVM form ``aggregate(zip_with(sig1, sig2, ...))`` is interpreted
per-element (higher-order functions don't enter whole-stage codegen) and was
the edge-stage bottleneck at 10^6 pairs; the Arrow-batched pandas UDF below
(one numpy ``(a == b).mean(axis=1)`` per batch) is ~5× faster and is the
prescribed vectorized path for math Catalyst can't codegen.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.DoubleType())
def _minhash_jaccard(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Fraction of equal MinHash lanes per pair — vectorized over the batch."""
    a = np.vstack(s1.to_numpy())
    b = np.vstack(s2.to_numpy())
    return pd.Series((a == b).mean(axis=1))

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
    extra = [c for c in pairs.columns if c not in ("id1", "id2")]
    scored = (
        pairs.join(f1, "id1")
        .join(f2, "id2")
        .withColumn(
            "hamming",
            F.bit_count(F.expr("simhash1 ^ simhash2")).cast("int"),
        )
        .withColumn("jaccard", _minhash_jaccard(F.col("sig1"), F.col("sig2")))
        .withColumn(
            "votes",
            (F.col("sha1") == F.col("sha2")).cast("int")
            + (F.col("hamming") <= F.lit(hamming_threshold)).cast("int")
            + (F.col("jaccard") >= F.lit(jaccard_threshold)).cast("int"),
        )
        .withColumn("is_match", F.col("votes") >= F.lit(require_agreement))
    )
    return scored.select(
        "id1", "id2", "hamming", "jaccard", "votes", "is_match", *extra
    )
