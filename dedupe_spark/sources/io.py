"""Source readers / sink writers for the files table.

The reference's "sources" are a recursive directory walk with an extension
filter (/root/reference/image_scanner.py:24-74) and its sink is a
file-by-file copy loop (file_organizer.py:131-192). Spark-native
equivalents: datasource scans (the file listing is what the datasource does
natively — SURVEY.md §2.1 S1) and table writes (S6). These helpers pin the
schema and the scan-hygiene knobs so every entry point reads the same way.

Scale notes baked in here:
  * explicit schema on CSV/JSON — schema inference is a full extra pass
    over 100 TB.
  * ``maxPartitionBytes`` left to session config; readers never coalesce.
  * writers partition by a low-cardinality column (``lang``) so downstream
    lang-filtered scans partition-prune, and support bucketing by file_id
    for co-located self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILES_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)


def read_files(
    spark: SparkSession,
    path: str,
    *,
    fmt: str = "parquet",
    langs: list[str] | None = None,
) -> DataFrame:
    """Read a files table from parquet/csv/json with the canonical schema.

    The lang filter is applied immediately after the scan so Catalyst pushes
    it into the datasource (partition pruning if the table is partitioned by
    lang — the Spark analog of the reference's extension predicate,
    image_scanner.py:68-74).
    """
    reader = spark.read
    if fmt == "parquet":
        df = reader.parquet(path)
    elif fmt == "csv":
        df = reader.schema(FILES_SCHEMA).option("header", "true").option(
            "multiLine", "true"
        ).option("escape", '"').csv(path)
    elif fmt == "json":
        df = reader.schema(FILES_SCHEMA).json(path)
    else:
        raise ValueError(f"unsupported format: {fmt!r}")
    missing = set(f.name for f in FILES_SCHEMA.fields) - set(df.columns)
    if missing:
        raise ValueError(f"files table at {path} missing columns: {sorted(missing)}")
    if langs:
        df = df.filter(F.lower(F.col("lang")).isin([l.lower() for l in langs]))
    return df


def read_documents_as_files(spark: SparkSession, path: str) -> DataFrame:
    """Map a documents table (doc_id, text, lang, source) onto the files shape."""
    docs = spark.read.parquet(path)
    return docs.select(
        F.col("source").alias("repo"),
        F.col("doc_id").cast("string").alias("path"),
        F.lit("0").alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
    )


def with_conflict_free_names(
    df: DataFrame,
    *,
    path_col: str = "path",
    id_col: str = "file_id",
    max_rounds: int = 16,
) -> DataFrame:
    """S8 flat-destination conflict resolution (file_organizer.py:194-224).

    When every surviving file lands in ONE flat output directory, files
    from different source dirs can share a basename; the reference walks
    the names sequentially, keeping a mutable seen-set and appending
    ``_1, _2, …`` before the extension. The relational form: window over
    the CURRENT name ordered by (already-renamed?, ``id_col``) — the first
    claimant keeps the name, the k-th gets ``stem_k.ext`` — iterated to a
    fixpoint, because a synthesized ``a_1.txt`` can itself collide with a
    GENUINE ``a_1.txt`` from another directory (one pass over raw
    basenames misses exactly that case; the reference's seen-set re-checks
    every candidate). Un-renamed claimants win ties so a genuine name is
    never displaced by a synthesized one. Deterministic (id orders
    claims); skew-safe (the window partitions on the name, whose
    cardinality grows with the corpus). Collision-free inputs converge in
    one round with zero renames; each extra round only runs when a rename
    cascade actually occurred — flat output is the reference's
    small-destination mode, so the per-round driver check is not on the
    warehouse-scale path (partitioned output, the default, never needs
    this at all). After ``max_rounds`` any still-colliding stragglers get
    a ``_<id>`` suffix, unique by construction since ids are unique.
    """
    base = F.element_at(F.split(F.col(path_col), "/"), -1)
    out = df.withColumn("out_name", base).withColumn("_renamed", F.lit(0))
    for _ in range(max_rounds):
        ext = F.regexp_extract(F.col("out_name"), r"(\.[^.\/]*)$", 1)
        stem = F.col("out_name").substr(
            F.lit(1), F.length("out_name") - F.length(ext)
        )
        rn = F.row_number().over(
            Window.partitionBy("out_name").orderBy("_renamed", F.col(id_col))
        )
        out = (
            out.withColumn("_rn", rn)
            .withColumn(
                "out_name",
                F.when(F.col("_rn") == 1, F.col("out_name")).otherwise(
                    F.concat(stem, F.lit("_"), (F.col("_rn") - 1).cast("string"), ext)
                ),
            )
            .withColumn(
                "_renamed",
                F.when(F.col("_rn") == 1, F.col("_renamed")).otherwise(F.lit(1)),
            )
            .drop("_rn")
            .localCheckpoint(eager=True)  # bound the iterated plan depth
        )
        n_dup = (
            out.groupBy("out_name")
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if n_dup == 0:
            return out.drop("_renamed")
    w = Window.partitionBy("out_name").orderBy("_renamed", F.col(id_col))
    ext = F.regexp_extract(F.col("out_name"), r"(\.[^.\/]*)$", 1)
    stem = F.col("out_name").substr(F.lit(1), F.length("out_name") - F.length(ext))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "out_name",
            F.when(F.col("_rn") == 1, F.col("out_name")).otherwise(
                F.concat(stem, F.lit("_"), F.col(id_col).cast("string"), ext)
            ),
        )
        .drop("_rn", "_renamed")
    )


def write_output(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    flat: bool = False,
) -> None:
    """Write an output table, partitioned for downstream pruning.

    Default partitioning by ``lang`` mirrors the reference's
    structure-preserving output option (file_organizer.py:144-154): the
    partition directory layout *is* the preserved structure.

    ``flat=True`` is the reference's other output mode — everything into
    one flat destination (file_organizer.py:131-143): no partition
    directories, and basename conflicts resolved with the ``_k`` suffix
    column (``with_conflict_free_names``; requires ``path``/``file_id``
    columns). The suffixed name is carried as ``out_name``.
    """
    if flat:
        df = with_conflict_free_names(df)
        df.write.mode(mode).parquet(path)
        return
    cols = partition_by if partition_by is not None else (
        ["lang"] if "lang" in df.columns else []
    )
    w = df.write.mode(mode)
    if cols:
        w = w.partitionBy(*cols)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int = 64,
    bucket_col: str = "file_id",
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed table (saveAsTable) so self-joins on
    ``bucket_col`` are co-located — no shuffle on the probe side.

    At 100 TB this is the difference between re-shuffling fingerprints for
    every pairwise stage and reading pre-hashed buckets; sortBy makes the
    join a bucket-local sort-merge.
    """
    (
        df.write.mode(mode)
        .bucketBy(buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )
