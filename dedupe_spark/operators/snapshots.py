"""Corpus snapshot diff — added/removed/modified/unchanged between versions.

Web-scale corpora are re-crawled and re-released (The Stack v1 → v2,
Common Crawl monthly snapshots); the first question against a new
snapshot is always "what changed?" — it sizes the incremental-update run
(`plans/incremental.py`), drives cache invalidation, and is the audit
artifact for takedown verification (a removed file must show up as
``removed``). The reference engine has no analog — single-snapshot tool
(SURVEY.md §2 addendum).

Semantics: rows are identified by ``key_cols`` (default repo+path — the
file's identity across versions); content equality is sha256 over the
content column (or a precomputed sha column if the snapshot already
carries one — the fingerprints stage table does). Status per key:
``added`` (new only), ``removed`` (old only), ``modified`` (both, shas
differ), ``unchanged`` (both, shas null-safe equal).

Scale shape: each side is projected to (keys, sha) BEFORE the join — the
wide content column never enters the shuffle; sha256 is computed in-scan
(codegen). The diff is then ONE full-outer shuffle join on the key
columns; keys are unique per snapshot so there is no build-side
explosion and no skew (AQE handles residual partition imbalance).
``diff_summary`` is one further partial-agg shuffle on the repo column.
At 10^12 files both snapshots stream through once — the same cost
profile as the exact-dedup tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUSES = ("added", "removed", "modified", "unchanged")


def _keyed_sha(
    df: DataFrame,
    key_cols: tuple[str, ...],
    content_col: str,
    sha_col: str | None,
    out: str,
    marker: str,
) -> DataFrame:
    sha = F.col(sha_col) if sha_col else F.sha2(F.col(content_col), 256)
    return df.select(
        *key_cols, sha.alias(out), F.lit(True).alias(marker)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: tuple[str, ...] = ("repo", "path"),
    content_col: str = "content",
    sha_col: str | None = None,
) -> DataFrame:
    """One row per key present in either snapshot:
    ``(*key_cols, old_sha, new_sha, status)``.

    Presence is tracked with explicit marker columns, NOT sha nullness —
    a present row with NULL content (the error-channel convention) must
    diff as present (its NULL sha compares null-safe), never as
    added/removed."""
    o = _keyed_sha(old, key_cols, content_col, sha_col, "old_sha", "_in_old")
    n = _keyed_sha(new, key_cols, content_col, sha_col, "new_sha", "_in_new")
    joined = o.join(n, on=list(key_cols), how="full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(F.col("old_sha").eqNullSafe(F.col("new_sha")), F.lit("unchanged"))
        .otherwise(F.lit("modified"))
    )
    return joined.select(
        *key_cols, "old_sha", "new_sha", status.alias("status")
    )


def diff_summary(
    diff: DataFrame, repo_col: str = "repo"
) -> DataFrame:
    """Per-repo status counts: ``(repo, n_added, n_removed, n_modified,
    n_unchanged)`` — the incremental-vs-rebuild planner's input shape
    (``plans/incremental.py:update_advice`` keys on the changed
    fraction). One partial-agg shuffle."""
    aggs = [
        F.count(F.when(F.col("status") == s, 1)).alias(f"n_{s}")
        for s in STATUSES
    ]
    return diff.groupBy(repo_col).agg(*aggs)


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("old", help="parquet path of the old snapshot")
    p.add_argument("new", help="parquet path of the new snapshot")
    p.add_argument("--key-cols", default="repo,path")
    p.add_argument("--content-col", default="content")
    p.add_argument("--sha-col", default=None)
    p.add_argument("--summary", action="store_true")
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="snapshot_diff")
    keys = tuple(a.key_cols.split(","))
    d = snapshot_diff(
        spark.read.parquet(a.old),
        spark.read.parquet(a.new),
        key_cols=keys,
        content_col=a.content_col,
        sha_col=a.sha_col,
    )
    out = diff_summary(d, keys[0]) if a.summary else d
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.show(20, truncate=50)
