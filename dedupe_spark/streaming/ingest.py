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
at-least-once on batch retry. Two markers per batch close the window:
``pending`` is committed BEFORE the append and ``done`` after, so a retry
sees three cases — ``done`` present: batch fully committed, skip;
``pending`` present but not ``done``: the previous attempt may have
appended some or all rows before crashing, so the batch is anti-joined
against the table on ``file_id`` before re-appending (repair cost paid
only on this crash path, never per batch); neither present: fresh batch,
plain append. Net effect is exactly-once on ``file_id``. (A file
re-ingested with identical (repo, path, commit) in a LATER batch has the
same file_id by construction and is a duplicate either way.) With
USE_ICEBERG=1 the same hook would be an atomic MERGE.
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
    )

    seen_key = f"_ingested_batches/{cfg.run_id}"

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.rows(f"{seen_key}/{batch_id}") is not None:
            return  # retried micro-batch — already fully committed
        pending_key = f"{seen_key}/{batch_id}_pending"
        crashed_midway = catalog.rows(pending_key) is not None
        if not crashed_midway:
            # commit the pending marker BEFORE the append: its presence on
            # a retry means "rows may already be in the table"
            catalog.write(
                batch_df.sparkSession.range(1).toDF("one"), pending_key
            )
        elif catalog.exists(table):
            # previous attempt died between append and done-marker — drop
            # whatever it already landed (exactly-once on file_id)
            existing = catalog.read(table).select("file_id")
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
