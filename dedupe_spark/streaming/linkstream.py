"""Streaming entity linkage — continuous record-linkage ingest.

The batch ER arc (``linkage.link_records``) assumes the corpus is
complete; a production master-data pipeline receives entity records
continuously and must keep the cluster assignment current without
re-linking the corpus per batch. This module wires
:func:`dedupe_spark.operators.linkage.link_incremental` into a
``foreachBatch`` sink over the warehouse catalog:

per micro-batch
  1. append genuinely-new records (id anti-join) to the ``entities``
     table,
  2. derive the *pending* set — entities not yet present in the
     ``assignments`` table. This covers BOTH the current batch and any
     rows a previous crash left appended-but-unlinked, which makes every
     step idempotent under foreachBatch's at-least-once replay,
  3. run ``link_incremental`` (new-vs-all pairs + star edges from the
     prior assignment — batch-scale, never corpus-pairs-scale),
  4. atomically replace ``assignments`` via ``Catalog.replace`` (the
     rename-swap that is safe against the read-your-own-input trap; a
     crash mid-swap leaves ``exists()`` false and the next batch
     relinks the pending rows).

Equivalence: because ``link_incremental`` provably reproduces the
one-shot closure (closure(star ∪ new-edges) = closure(all edges)), the
assignments table after N batches equals ``link_records`` over the
union — asserted by the stream==batch parity test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dedupe_spark.operators.linkage import (
    DEFAULT_MAX_BLOCK,
    link_incremental,
    link_records,
)
from dedupe_spark.sources.catalog import Catalog

ENTITIES = "entities"
ASSIGNMENTS = "assignments"


def link_batch(
    batch_df: DataFrame,
    *,
    warehouse: str,
    id_col: str,
    block_cols: list[str],
    compare_col: str,
    max_distance: int = 2,
    max_block: int | None = DEFAULT_MAX_BLOCK,
) -> None:
    """One micro-batch of the streaming linkage — also directly usable
    as a mini-batch API outside Structured Streaming."""
    from pyspark.sql import functions as F

    spark = batch_df.sparkSession
    cat = Catalog(spark, warehouse)
    kw = dict(
        id_col=id_col,
        block_cols=block_cols,
        compare_col=compare_col,
        max_distance=max_distance,
        max_block=max_block,
    )

    if cat.exists(ENTITIES):
        existing = cat.read(ENTITIES)
        fresh = batch_df.join(
            existing.select(F.col(id_col).alias("_eid")),
            batch_df[id_col] == F.col("_eid"),
            "left_anti",
        )
        cat.append(fresh, ENTITIES)
    else:
        cat.write(batch_df, ENTITIES)

    entities = cat.read(ENTITIES)
    if cat.exists(ASSIGNMENTS):
        assign_old = cat.read(ASSIGNMENTS)
        pending = entities.join(
            assign_old.select(F.col("id").alias("_aid")),
            entities[id_col] == F.col("_aid"),
            "left_anti",
        )
        linked = entities.join(
            pending.select(F.col(id_col).alias("_pid")),
            entities[id_col] == F.col("_pid"),
            "left_anti",
        )
        new_assign = link_incremental(linked, pending, assign_old, **kw)
    else:
        new_assign = link_records(entities, **kw)
    cat.replace(new_assign, ASSIGNMENTS)


def link_entities_stream(
    records,
    *,
    warehouse: str,
    checkpoint: str,
    id_col: str,
    block_cols: list[str],
    compare_col: str,
    max_distance: int = 2,
    max_block: int | None = DEFAULT_MAX_BLOCK,
):
    """Attach the linkage sink to a streaming DataFrame of entity
    records; returns the started StreamingQuery."""

    def _sink(batch_df: DataFrame, _batch_id: int) -> None:
        link_batch(
            batch_df,
            warehouse=warehouse,
            id_col=id_col,
            block_cols=block_cols,
            compare_col=compare_col,
            max_distance=max_distance,
            max_block=max_block,
        )

    return (
        records.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
