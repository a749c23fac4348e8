#!/usr/bin/env python
"""Host-capacity control for the scaling benches: time ONLY a shuffle-free,
embarrassingly-parallel stage (parquet scan → fingerprint pandas UDF → noop)
at a given core count, over a pre-materialized 256-split input.

Why this exists: BENCH/BASELINE.md's scaling pairs are measured on a VM
whose effective core budget swings 2-3× minute to minute. This job is the
attribution instrument — if IT fails to scale in some window, that window's
pipeline pair efficiency is host-bound, not engine-bound. The input MUST be
pre-materialized (first invocation writes it): an explode generator inside
the timed region is a hidden serial stage that poisons the control (the
round-4 flawed-control lesson, BENCH/BASELINE.md "Final-engine pairs").

Usage:
    python jobs/bench_udf_control.py --cores 8
    python jobs/bench_udf_control.py --cores 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--expand", type=int, default=100)
    p.add_argument(
        "--input",
        default=None,
        help="pre-materialized input dir (default /tmp/udf_ctrl_input_<expand>)",
    )
    a = p.parse_args()
    src = a.input or f"/tmp/udf_ctrl_input_{a.expand}"

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    local_dir = f"/dev/shm/spark-local-ctrl-{os.getpid()}"
    os.makedirs(local_dir, exist_ok=True)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)

    from pyspark.sql import functions as F

    from dedupe_spark.functions.fingerprint import with_fingerprints
    from dedupe_spark.session import get_spark

    spark = get_spark(
        app_name=f"udf_ctrl[{a.cores}]",
        master=f"local[{a.cores}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.local.dir": local_dir,
            # pin GC threads to the simulated core count (bench_scaling.py
            # rationale: the JVM defaults them to the machine's 32 vCPUs)
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={a.cores} "
                f"-XX:ConcGCThreads={max(1, a.cores // 4)}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(src + "/_SUCCESS"):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        copies = F.explode(F.sequence(F.lit(0), F.lit(a.expand - 1))).alias("copy")
        files = docs.select("doc_id", "lang", "source", "text", copies).select(
            F.col("source").alias("repo"),
            F.concat_ws("_", F.col("doc_id").cast("string"), F.col("copy")).alias(
                "path"
            ),
            F.lit("0").alias("commit"),
            "lang",
            F.concat_ws(
                " ", F.col("text"), F.concat(F.lit("tag"), F.col("copy"))
            ).alias("content"),
        ).repartition(256)
        files.write.mode("overwrite").parquet(src)

    files = spark.read.parquet(src)  # 256 splits: scan parallelism ≥ task slots
    n = files.count()
    t0 = time.perf_counter()
    (
        with_fingerprints(files)
        .select("file_id", "simhash")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "cores": a.cores,
                "n": n,
                "seconds": round(dt, 1),
                "files_per_sec": round(n / dt, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
