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
at-least-once on batch retry. The batch id is recorded per append in the
snapshot manifest so a retried batch is detected and skipped (idempotent
appends); with USE_ICEBERG=1 the same hook would be an atomic MERGE.
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
        done = catalog.rows(f"{seen_key}/{batch_id}")
        if done is not None:  # retried micro-batch — already committed
            return
        catalog.append(batch_df, table)
        # tiny marker table makes the append idempotent across retries
        catalog.write(
            batch_df.sparkSession.range(1).toDF("one"), f"{seen_key}/{batch_id}"
        )

    writer = fp.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", ckpt
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
