"""SparkSession factory tuned for this engine.

Defaults target the sandbox (single JVM, local[N]) but every setting is the
one you'd want on a real cluster too: AQE on (runtime re-planning +
skew-join handling), Arrow on (pandas UDF transport), UTC session timezone
(oracle comparability), shuffle partitions sized to parallelism instead of
the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


ICEBERG_CATALOG = "dedupe"


def iceberg_conf(
    catalog: str = ICEBERG_CATALOG, warehouse: str | None = None
) -> dict[str, str]:
    """Spark conf enabling a real Iceberg catalog (USE_ICEBERG=1 path).

    The sandbox has no Iceberg jars, so this path cannot be exercised
    here; on a real cluster add the iceberg-spark-runtime jar to
    spark-submit and set USE_ICEBERG=1 — ``get_spark`` merges these confs
    and ``sources.catalog.Catalog`` routes table IO through the session
    catalog instead of parquet paths."""
    wh = warehouse or os.environ.get("ICEBERG_WAREHOUSE", "/tmp/iceberg_warehouse")
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": wh,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def use_iceberg() -> bool:
    return os.environ.get("USE_ICEBERG", "") == "1"


def get_spark(
    app_name: str = "dedupe_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback 32).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster you'd size this to ~2-3x total executor cores; AQE coalesces
    small partitions at runtime either way.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; local[*] → cpus
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inner in ("*", "") else int(inner)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # pandas-UDF batches: big enough to amortize Arrow transfer, small
        # enough that a batch of `content` strings fits comfortably in memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    if use_iceberg():
        for k, v in iceberg_conf().items():
            builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
