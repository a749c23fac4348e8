#!/usr/bin/env python
"""Staged-vs-inmemory pipeline benchmark + resume-cost measurement.

BENCH's headline numbers time the in-memory convenience path
(``dedup_pipeline`` → noop sink). A real 100 TB run uses the resumable
runner (``plans/staged.py``): every stage commits a parquet checkpoint so
a crash resumes instead of recomputing. That durability costs one
materialization per stage — this job measures exactly how much, at the
same 500k/1M-file scale as the scaling bench, and how cheap resume
actually is:

  * ``inmem``        — one-shot ``dedup_pipeline`` (the BENCH path)
  * ``staged``       — full ``StagedPipeline.run`` (6 committed stages)
  * ``resume_noop``  — re-run over a complete warehouse (all stages skip)
  * ``resume_edges`` — crash simulated after ``buckets``: edges/labels/
                       assignment checkpoints dropped, run resumes there

Each leg runs in a fresh subprocess (fresh JVM, no cache bleed), same
session shape as ``bench_scaling`` (fixed 256 shuffle partitions, RAM
local dir, GC threads pinned). Input is the deterministic expanded sf0.1
documents table — identical across legs.

Usage:
    python jobs/bench_staged.py --all --expand 100          # full matrix
    python jobs/bench_staged.py --leg inmem --expand 100    # one leg (JSON)
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_WAREHOUSE = "/dev/shm/dedupe_bench_warehouse"
RUN_ID = "bench_staged"


def _session(cores: int):
    from dedupe_spark.session import get_spark

    # per-process dir (shared fixed paths let concurrent runs rmtree each
    # other's live shuffle files); cleaned on exit since /dev/shm is RAM
    local_dir = f"/dev/shm/spark-local-staged-{os.getpid()}"
    os.makedirs(local_dir, exist_ok=True)
    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)
    spark = get_spark(
        app_name=f"bench_staged[{cores}]",
        master=f"local[{cores}]",
        shuffle_partitions=256,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.local.dir": local_dir,
            "spark.driver.extraJavaOptions": (
                f"-XX:ParallelGCThreads={cores} "
                f"-XX:ConcGCThreads={max(1, cores // 4)}"
            ),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _input(spark, sf_dir: str, expand: int):
    """Same deterministic generator as bench_scaling: sf0.1 docs × expand
    perturbed copies, 256 splits (models a many-split 100 TB table)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = F.explode(F.sequence(F.lit(0), F.lit(expand - 1))).alias("copy")
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
    )
    return files.repartition(256)


def run_leg(leg: str, cores: int, sf_dir: str, expand: int, warehouse: str) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.operators.dedup import dedup_pipeline
    from dedupe_spark.plans.staged import StagedPipeline
    from dedupe_spark.sources.catalog import Catalog

    spark = _session(cores)
    files = _input(spark, sf_dir, expand)
    n_files = files.count()
    cfg = PipelineConfig(run_id=RUN_ID, warehouse=warehouse)
    out: dict = {"leg": leg, "cores": cores, "n_files": n_files}

    if leg == "inmem":
        t0 = time.perf_counter()
        dedup_pipeline(files, cfg).write.format("noop").mode("overwrite").save()
        out["seconds"] = round(time.perf_counter() - t0, 3)
    elif leg == "staged":
        shutil.rmtree(warehouse, ignore_errors=True)
        pipe = StagedPipeline(spark, cfg)
        t0 = time.perf_counter()
        pipe.run(files, resume=False)
        out["seconds"] = round(time.perf_counter() - t0, 3)
        from pyspark.sql import functions as F

        stage_secs = {
            r["stage"]: round(r["value"], 3)
            for r in pipe.metrics()
            .filter(F.col("metric") == "seconds")
            .select("stage", "value")
            .collect()
        }
        out["stage_seconds"] = stage_secs
    elif leg in ("resume_noop", "resume_edges"):
        pipe = StagedPipeline(spark, cfg)
        if leg == "resume_edges":
            for stage in ("edges", "labels", "assignment"):
                pipe.catalog.drop(f"{RUN_ID}/{stage}")
        t0 = time.perf_counter()
        ran = pipe.run(files=None, resume=True)
        out["seconds"] = round(time.perf_counter() - t0, 3)
        out["stages_ran"] = [s for s, r in ran.items() if r]
    else:
        raise ValueError(f"unknown leg {leg!r}")

    out["files_per_sec"] = round(n_files / out["seconds"], 1)
    spark.stop()
    return out


def run_subprocess(leg: str, args) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "32g")
    proc = subprocess.run(
        [
            sys.executable, os.path.abspath(__file__),
            "--leg", leg,
            "--cores", str(args.cores),
            "--sf-dir", args.sf_dir,
            "--expand", str(args.expand),
            "--warehouse", args.warehouse,
        ],
        capture_output=True, text=True, timeout=3600, env=env,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"leg {leg} failed:\n{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--leg", default=None)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    p.add_argument("--expand", type=int, default=100)
    p.add_argument("--warehouse", default=DEFAULT_WAREHOUSE)
    p.add_argument("--all", action="store_true")
    args = p.parse_args()

    if not args.all:
        print(json.dumps(run_leg(
            args.leg or "inmem", args.cores, args.sf_dir, args.expand,
            args.warehouse,
        )))
        return

    results = {}
    # order matters: staged populates the warehouse the resume legs reuse
    for leg in ("inmem", "staged", "resume_noop", "resume_edges"):
        results[leg] = run_subprocess(leg, args)
        print(json.dumps(results[leg]), flush=True)
    shutil.rmtree(args.warehouse, ignore_errors=True)
    overhead = results["staged"]["seconds"] / results["inmem"]["seconds"]
    summary = {
        "n_files": results["inmem"]["n_files"],
        "cores": args.cores,
        "inmem_s": results["inmem"]["seconds"],
        "staged_s": results["staged"]["seconds"],
        "staged_overhead_x": round(overhead, 2),
        "stage_seconds": results["staged"].get("stage_seconds", {}),
        "resume_noop_s": results["resume_noop"]["seconds"],
        "resume_edges_s": results["resume_edges"]["seconds"],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
