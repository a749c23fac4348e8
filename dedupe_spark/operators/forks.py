"""Repo-level fork detection — Jaccard over per-repo content-hash sets.

The Stack's first dedup stage is repository-level: forks share most of
their files byte-for-byte, so repos whose sha256-content sets overlap
heavily are collapsed before any per-file near-dup work. This operator
surfaces those pairs. It is entity resolution one level up from the
reference's per-file groups (duplicate_detector.py groups files; this
groups REPOS by the same exact-hash evidence) — blocking key = the
content hash itself.

Scale shape, in order:
  1. one narrow projection (sha256 — JVM ``sha2``, codegen) + DISTINCT on
     (repo, sha): one shuffle, map-side partial agg;
  2. per-repo sizes and per-sha document frequency: partial-agg counts;
  3. hot-sha guard: shas shared by > ``max_df`` repos (vendored
     boilerplate — LICENSE files, empty __init__.py) would each emit
     C(df,2) pairs; they are removed via a BROADCAST anti-join, the same
     bounded-blocking pattern as the n-gram df-cap
     (operators/dedup.py ``_df_cap``). Candidate pairs are therefore
     O(shas · max_df²) worst case, never Σ df² unbounded;
  4. inverted-index self-join on sha (equi-join, AQE-safe) + count per
     ordered pair: one shuffle;
  5. per-repo sizes joined back via BROADCAST (the repo dim is tiny
     relative to files — millions of repos vs 10^12 files).

``n_a``/``n_b`` count ALL distinct shas of a repo (true set sizes), while
``shared`` counts only non-hot shas — so a capped run UNDER-estimates
Jaccard, which for a dedup decision is the safe direction (never collapses
two repos on boilerplate-only evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_MAX_DF = 1000


def fork_pairs(
    df: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
    *,
    threshold: float = 0.5,
    min_shared: int = 2,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Pairs of repos whose distinct-content Jaccard ≥ ``threshold``.

    Returns (repo_a, repo_b, shared, n_a, n_b, jaccard) with
    repo_a < repo_b. ``jaccard`` is rounded to 6dp BEFORE thresholding
    (the repo's float-parity convention) so the SQL twin agrees exactly.
    """
    # shas feeds FOUR consumers (sizes, the df counts, and both sides of
    # the self-join); without a persist Spark re-runs the scan + DISTINCT
    # shuffle for each (measured: 6 parquet scans, 0 reused exchanges).
    # Same lifecycle discipline as ngram_jaccard_dedupe
    # (operators/dedup.py): persist → eagerly materialize the (small)
    # result via localCheckpoint → unpersist before returning, so no
    # cache outlives the call (unified-pool pressure evicts UDF caches
    # at scale — measured 296→592s at 1M files).
    shas = (
        df.select(
            F.col(repo_col).alias("repo"),
            F.sha2(F.col(content_col), 256).alias("sha"),
        )
        .distinct()
        .persist()
    )
    sizes = shas.groupBy("repo").agg(F.count("*").alias("n"))
    hot = (
        shas.groupBy("sha")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > max_df)
        .select("sha")
    )
    cold = shas.join(F.broadcast(hot), "sha", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    shared = (
        a.join(b, "sha")
        .filter(F.col("a.repo") < F.col("b.repo"))
        .groupBy(
            F.col("a.repo").alias("repo_a"), F.col("b.repo").alias("repo_b")
        )
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    out = (
        shared.join(
            F.broadcast(sizes.withColumnsRenamed({"repo": "repo_a", "n": "n_a"})),
            "repo_a",
        )
        .join(
            F.broadcast(sizes.withColumnsRenamed({"repo": "repo_b", "n": "n_b"})),
            "repo_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("shared")
                / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("repo_a", "repo_b", "shared", "n_a", "n_b", "jaccard")
        .localCheckpoint(eager=True)
    )
    shas.unpersist()
    return out


def fork_clusters(
    df: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
    *,
    threshold: float = 0.5,
    min_shared: int = 2,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Transitive fork clusters over the :func:`fork_pairs` graph.

    Returns one row per repo that belongs to a fork cluster:
    (repo, fork_cluster, n_files, is_representative). ``fork_cluster``
    is the lexicographically smallest member repo (the CC min-label
    convention, operators/cc.py), ``n_files`` the repo's distinct-sha
    count, and the representative is the LARGEST member (most complete
    copy), tie-broken by repo name. Non-fork repos are absent — callers
    treat missing as singleton, same convention as the file pipeline.

    Scale: the repo graph is dim-table sized relative to files (millions
    vs 10^12), so CC rounds and the rank window run on component-scale
    data; everything heavy happened in fork_pairs.
    """
    from dedupe_spark.operators.cc import connected_components

    pairs = fork_pairs(
        df,
        repo_col,
        content_col,
        threshold=threshold,
        min_shared=min_shared,
        max_df=max_df,
    )
    labels = connected_components(
        pairs, id1="repo_a", id2="repo_b"
    ).withColumnsRenamed({"file_id": "repo", "component": "fork_cluster"})
    # per-repo distinct-sha sizes ride along on the pairs (n_a/n_b) — no
    # second scan of the corpus
    sizes = (
        pairs.select(F.col("repo_a").alias("repo"), F.col("n_a").alias("n_files"))
        .union(
            pairs.select(F.col("repo_b").alias("repo"), F.col("n_b").alias("n_files"))
        )
        .distinct()
    )
    w = Window.partitionBy("fork_cluster").orderBy(
        F.desc("n_files"), F.asc("repo")
    )
    return (
        labels.join(sizes, "repo")
        .withColumn("is_representative", F.row_number().over(w) == 1)
        .select("repo", "fork_cluster", "n_files", "is_representative")
    )


def collapse_forks(
    df: DataFrame,
    repo_col: str = "repo",
    content_col: str = "content",
    *,
    threshold: float = 0.5,
    min_shared: int = 2,
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """The Stack's stage-1 dedup: drop every file of every non-
    representative fork-cluster member; the representative repo and all
    non-fork repos pass through untouched. The drop set is repo-keyed
    and dim-table sized → BROADCAST anti-join, the corpus is never
    shuffled."""
    clusters = fork_clusters(
        df,
        repo_col,
        content_col,
        threshold=threshold,
        min_shared=min_shared,
        max_df=max_df,
    )
    drop = (
        clusters.filter(~F.col("is_representative"))
        .select(F.col("repo").alias(repo_col))
    )
    return df.join(F.broadcast(drop), repo_col, "left_anti")


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--repo-col", default="repo")
    p.add_argument("--content-col", default="content")
    p.add_argument("--threshold", type=float, default=0.5)
    p.add_argument("--max-df", type=int, default=DEFAULT_MAX_DF)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="fork_pairs")
    fork_pairs(
        spark.read.parquet(a.input),
        a.repo_col,
        a.content_col,
        threshold=a.threshold,
        max_df=a.max_df,
    ).orderBy(F.desc("jaccard")).show(20, truncate=40)
