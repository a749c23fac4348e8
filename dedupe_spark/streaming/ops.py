"""Structured Streaming operators — the streaming twins of the batch ops.

The reference is batch-only (SURVEY.md §2.9), but a training-data engine
ingests continuously, so the engine's core shapes are exposed as streaming
transformations too. Each function takes and returns a (streaming or batch)
DataFrame — identical code runs in both modes, which is how Structured
Streaming is meant to be used; the tests exploit that by checking
stream-over-file-source == batch-over-the-same-parquet.

Scale/state notes:
  * every WINDOWED stateful op is watermarked, so its state is bounded and
    late rows are dropped deterministically — unbounded state is the
    streaming analog of the O(n²) loop we removed from the batch path.
  * exact dedup uses ``dropDuplicatesWithinWatermark`` on content sha — the
    state store keys on the 64-hex sha, not the payload.
  * ``running_totals_stateful`` shows the applyInPandasWithState escape
    hatch for operators Spark lacks (custom per-key accumulators). It is
    the ONE deliberate exception to the bounded-state rule: a lifetime
    running total never expires by definition, so its state grows with
    key cardinality (one tiny tuple per user). Deployments with unbounded
    key churn should add a GroupStateTimeout eviction — that changes the
    semantics from "lifetime total" to "total since last seen", which is
    a product decision, not a default this library should silently make.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_event_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type.

    Batch twin: plans/queries.py q_hourly_events (oracle-checked) — same
    aggregation expression, so the streaming output is transitively
    oracle-checked through the batch path.
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    # group on the window column itself — grouping on window(...).start would
    # sever watermark propagation and make append-mode emission impossible
    return (
        src.groupBy(F.window(ts_col, window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("hour"), "event_type", "n", "sum_value"
        )
    )


def streaming_exact_dedupe(
    files: DataFrame,
    *,
    content_col: str = "content",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: first-seen row per content sha wins.

    ``dropDuplicatesWithinWatermark`` bounds the sha state store to the
    watermark horizon — the streaming analog of the exact-tier
    groupBy(content_sha) (operators/blocking.py:exact_groups).

    NULL-content rows pass through UNdeduped: ``sha2(NULL)`` is NULL, and
    dropDuplicates treats NULL as an ordinary key — without the split
    below, 100 distinct null-content files would collapse to one
    "duplicate" group and 99 rows would silently vanish. Null content is
    an error condition (the batch pipeline keeps such rows with an error
    column), not a duplicate relation.
    """
    keyed = files.withColumn("content_sha", F.sha2(F.col(content_col), 256))
    healthy = keyed.filter(F.col("content_sha").isNotNull())
    errored = keyed.filter(F.col("content_sha").isNull())
    if keyed.isStreaming:
        deduped = healthy.withWatermark(
            ts_col, watermark
        ).dropDuplicatesWithinWatermark(["content_sha"])
        return deduped.unionByName(errored)
    return healthy.dropDuplicates(["content_sha"]).unionByName(errored)


def sessionize(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation via the native session_window operator.

    Batch twin: plans/queries.py q_sessionization (gaps-and-islands oracle).
    """
    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return (
        src.groupBy("user_id", F.session_window(ts_col, gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )


_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("total", T.DoubleType())]
)
_RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _running_totals_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 4)]}
    )


def running_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-user (count, Σvalue).

    The ``applyInPandasWithState`` pattern for operators Spark doesn't have
    built-in — state is a typed tuple per key, updates arrive as Arrow
    batches. Update-mode output: one row per key per trigger with the
    running totals.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=_RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
