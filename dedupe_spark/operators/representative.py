"""Representative selection — argmax within cluster via a window.

Reference: ``DuplicateDetector._select_best_image``
(/root/reference/duplicate_detector.py:113-153) picks the group member with
the lexicographically greatest tuple (format_priority, width*height,
file_size) via Python ``max``. Python ``max`` keeps the first of ties in
input order — non-deterministic under reordering — so the target appends
``asc(file_id)`` as the final tie-break (SURVEY.md §2.5 W4).

Code-table analog of the priority tuple: (lang_score, lines * n_tokens,
size), where lang_score plays format_priority
(quality_assessor.py:31-41's format-weights idea).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# format-priority analog (duplicate_detector.py:132-142: PNG > ... > GIF)
LANG_SCORE = {
    "python": 100,
    "java": 90,
    "rust": 85,
    "go": 80,
    "js": 70,
    "md": 40,
}
DEFAULT_LANG_SCORE = 30  # reference defaults unknown formats to 30 (quality_assessor.py:140)


def lang_score_col(lang: str = "lang") -> Column:
    expr = F.lit(DEFAULT_LANG_SCORE)
    for k, v in LANG_SCORE.items():
        expr = F.when(F.lower(F.col(lang)) == k, F.lit(v)).otherwise(expr)
    return expr


def quality_order_cols(content_col: str = "content") -> list[Column]:
    """Quality-score representative ordering (reference W5) — the
    ``compare_images`` alternative (quality_assessor.py:114-136): rank
    cluster members by the weighted text-quality score instead of the
    format-priority tuple. Ties fall back to size then file_id so the
    choice stays deterministic."""
    from dedupe_spark.operators.textstats import quality_score_col

    return [
        quality_score_col(F.col(content_col)).desc(),
        F.col("size").desc(),
        F.col("file_id").asc(),
    ]


def order_cols_for(rep_order: str, *, content_col: str = "content") -> list[Column] | None:
    """Resolve a config/CLI ``rep_order`` name to window order columns.

    ``default`` → None (the format-priority tuple inside
    ``with_representative``); ``quality`` → ``quality_order_cols``.
    """
    if rep_order == "default":
        return None
    if rep_order == "quality":
        return quality_order_cols(content_col)
    raise ValueError(f"unknown rep_order {rep_order!r}; expected default|quality")


def with_representative(
    clustered: DataFrame,
    *,
    cluster_col: str = "cluster_id",
    order_cols: list[Column] | None = None,
) -> DataFrame:
    """Add ``is_representative`` — true for the best member of each cluster.

    Default ordering = the reference's tuple-max (W4):
    desc(lang_score), desc(resolution≈lines*n_tokens), desc(size), asc(file_id).
    Singletons (null cluster) are their own representative.
    """
    if order_cols is None:
        order_cols = [
            lang_score_col().desc(),
            (F.col("lines").cast("long") * F.col("n_tokens")).desc(),
            F.col("size").desc(),
            F.col("file_id").asc(),
        ]
    # partition on coalesce(cluster, file_id): a bare partitionBy(cluster)
    # would hash every singleton's NULL to ONE task — a skew wall at scale.
    # With the coalesce, singletons are size-1 partitions and trivially rank 1.
    w = Window.partitionBy(F.coalesce(F.col(cluster_col), F.col("file_id"))).orderBy(
        *order_cols
    )
    return clustered.withColumn("is_representative", F.row_number().over(w) == 1)


def survivors(with_reps: DataFrame, *, cluster_col: str = "cluster_id") -> DataFrame:
    """Rows to emit: representatives ∪ singletons (reference J3/SO2,
    file_organizer.py:72-84) — a single filter, no join needed because
    cluster membership is a column, not a nested list."""
    return with_reps.filter(
        F.col("is_representative") | F.col(cluster_col).isNull()
    )
