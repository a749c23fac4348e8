"""Incremental fingerprint ingest — streaming front door to the staged
pipeline.

The reference rescans its whole input directory every run
(/root/reference/image_scanner.py:89-101); at warehouse scale new files
arrive continuously and refingerprinting the corpus per run is the cost we
exist to avoid. This module streams a files directory (Structured
Streaming file source tracks which files were already consumed in its
checkpoint), fingerprints each micro-batch with the SAME Arrow UDF as the
batch path, and appends to the staged warehouse's ``{run_id}/fingerprints``
table — after which ``StagedPipeline.run(files=None, resume=True)``
continues the dedup from that checkpoint exactly as if the fingerprints
had been computed in batch.

Exactly-once note: ``foreachBatch`` + a plain parquet append is
at-least-once on batch retry. Every append is keyed: the batch is
anti-joined against the table on ``file_id`` before appending, so the
table NEVER holds a duplicate file_id — whether the duplicate came from a
crash-retry partial append or from the same file legitimately re-arriving
in a later batch. Crash and no-crash runs converge to the identical table
(an earlier design repaired only on a detected crash, which made the
table contents depend on whether a crash happened — a batch-re-ingested
file_id was dropped on the crash path but duplicated on the normal one).
A ``done`` marker per batch short-circuits fully-committed retries
without the scan. The anti-join reads only the ``file_id`` column
(parquet column pruning); under USE_ICEBERG=1 the same hook is the
atomic keyed MERGE this emulates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from dedupe_spark.config import PipelineConfig
from dedupe_spark.functions.fingerprint import with_fingerprints
from dedupe_spark.sources.catalog import Catalog
from dedupe_spark.sources.io import FILES_SCHEMA


def ingest_files_stream(
    spark: SparkSession,
    input_dir: str,
    cfg: PipelineConfig,
    *,
    catalog: Catalog | None = None,
    checkpoint_dir: str | None = None,
    available_now: bool = True,
):
    """Stream ``input_dir`` parquet into the fingerprints stage table.

    Returns the StreamingQuery; with ``available_now`` (default) it drains
    everything currently in the directory and stops — the incremental-batch
    pattern — while ``available_now=False`` runs continuously.
    """
    catalog = catalog or Catalog(spark, cfg.warehouse)
    table = f"{cfg.run_id}/fingerprints"
    ckpt = checkpoint_dir or catalog.path(f"_stream_ckpt/{cfg.run_id}")

    files = spark.readStream.schema(FILES_SCHEMA).parquet(input_dir)
    fp = with_fingerprints(
        files,
        shingle_k=cfg.shingle_k,
        num_perm=cfg.num_perm,
        bands=cfg.lsh_bands,
        rows=cfg.lsh_rows,
        normalize=cfg.normalize,
    )

    seen_key = f"_ingested_batches/{cfg.run_id}"

    def _existing_ids(sess: SparkSession) -> DataFrame | None:
        if catalog.exists(table):
            return catalog.read(table).select("file_id")
        # FIRST-append crash window: Catalog.write commits the manifest
        # only AFTER the parquet write, so a crash in between leaves data
        # files with exists() still False — a retry that skipped the
        # anti-join here would append the whole batch a second time. Key
        # against the data files directly whenever any exist. (Under
        # Iceberg, exists() is the atomic table commit and this path is
        # unreachable.)
        import glob
        import os

        p = catalog.path(table)
        if not catalog.iceberg and glob.glob(os.path.join(p, "part-*")):
            return sess.read.parquet(p).select("file_id")
        return None

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.rows(f"{seen_key}/{batch_id}") is not None:
            return  # retried micro-batch — already fully committed
        existing = _existing_ids(batch_df.sparkSession)
        if existing is not None:
            # keyed append: drop any file_id already in the table — covers
            # crash-retry partial appends AND cross-batch re-arrivals, so
            # the table is identical with or without a crash (true
            # exactly-once on file_id; module docstring)
            batch_df = batch_df.join(existing, "file_id", "left_anti")
        catalog.append(batch_df, table)
        catalog.write(
            batch_df.sparkSession.range(1).toDF("one"), f"{seen_key}/{batch_id}"
        )

    writer = fp.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
