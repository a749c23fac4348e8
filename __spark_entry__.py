"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship dedup pipeline on /root/testdata/sf0.001.
queries()     — SURVEY.md §2 operators as (spark, sf_dir) → DataFrame.
oracle_sql()  — DuckDB-equivalent SQL per query (driver correctness gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full record-linkage pipeline (fingerprint → LSH blocking →
    consensus scoring → connected components → representative) over the
    sf0.001 documents table mapped to the files(repo,path,commit,lang,
    content) input shape."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.operators.dedup import dedup_pipeline

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    files = docs.select(
        F.col("source").alias("repo"),
        F.concat(F.lit("doc/"), F.col("doc_id").cast("string")).alias("path"),
        F.lit("0000000").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )
    out = dedup_pipeline(files, PipelineConfig())
    return out.select(
        "file_id",
        "repo",
        "path",
        "lang",
        "content_sha",
        "size",
        "cluster_id",
        "is_representative",
        "error",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dedupe_spark.plans.queries import registry

    return {name: fn for name, (fn, _sql) in registry().items()}


def oracle_sql() -> dict[str, str]:
    from dedupe_spark.plans.queries import registry

    return {name: sql for name, (_fn, sql) in registry().items() if sql is not None}
