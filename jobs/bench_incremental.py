#!/usr/bin/env python
"""Incremental-update scaling evidence: batch-proportional, not corpus-
proportional.

A 100 TB corpus is never re-deduped from scratch when a day's crawl
lands; ``plans/incremental.py`` appends a batch to a completed run's
checkpoints and recomputes only what the new rows can change. This job
measures that claim at the 1M-file scale:

  * ``base``          — staged run over N files (the one-time cost)
  * ``update_small``  — incremental append of a 1% batch
  * ``update_big``    — incremental append of a 10% batch

If the update cost were corpus-bound, both updates would cost ~base; if
batch-bound, update_big ≈ 10 × update_small minus the shared
corpus-sized floor (the exact-tier re-shuffle, full-bucket rewrite and
assignment rewrite are O(corpus) but columnar-cheap; the expensive
stages — fingerprint UDF, candidate generation, scoring — run on the
batch only). Both numbers are published so the floor is visible rather
than claimed away.

Each leg runs in a fresh subprocess (fresh JVM); the warehouse persists
across legs on RAM disk. Input: the deterministic expanded sf0.1
documents table; update batches use copy indices disjoint from the base
so every appended row is genuinely new.

Usage:
    python jobs/bench_incremental.py --all --expand 200   # 1M base
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jobs.bench_staged import _session  # noqa: E402 — same session shape

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_WAREHOUSE = "/dev/shm/dedupe_incr_warehouse"
RUN_ID = "bench_incr"


def _slice(spark, sf_dir: str, lo: int, hi: int, fresh: bool = False):
    """sf0.1 documents × copies [lo, hi) — same perturbation scheme as
    bench_scaling, copy indices disjoint across legs.

    ``fresh=True`` reverses each document's text, producing families that
    are near-dups of each other but unrelated to every existing cluster —
    the realistic "new crawl shard" case, as opposed to the worst case
    where every appended copy touches an existing family."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    copies = F.explode(F.sequence(F.lit(lo), F.lit(hi - 1))).alias("copy")
    text = F.reverse(F.col("text")) if fresh else F.col("text")
    prefix = "fresh_" if fresh else ""
    files = docs.select("doc_id", "lang", "source", "text", copies).select(
        F.col("source").alias("repo"),
        F.concat_ws(
            "_", F.lit(prefix + ""), F.col("doc_id").cast("string"), F.col("copy")
        ).alias("path"),
        F.lit("0").alias("commit"),
        "lang",
        F.concat_ws(" ", text, F.concat(F.lit("tag"), F.col("copy"))).alias(
            "content"
        ),
    )
    return files.repartition(256)


def run_leg(leg: str, cores: int, sf_dir: str, expand: int, warehouse: str) -> dict:
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.plans.incremental import incremental_update
    from dedupe_spark.plans.staged import StagedPipeline

    spark = _session(cores)
    cfg = PipelineConfig(run_id=RUN_ID, warehouse=warehouse)
    small = max(1, expand // 100)
    big = max(1, expand // 10)
    ranges = {
        "base": (0, expand),
        "update_small": (expand, expand + small),
        "update_big": (expand + small, expand + small + big),
        # fresh leg: copy indices may overlap base's — paths and contents
        # are disjoint by construction (reversed text, fresh_ path prefix)
        "update_fresh": (0, small),
    }
    lo, hi = ranges[leg]
    files = _slice(spark, sf_dir, lo, hi, fresh=(leg == "update_fresh"))
    n_files = files.count()
    out: dict = {"leg": leg, "cores": cores, "n_files": n_files}

    if leg == "base":
        shutil.rmtree(warehouse, ignore_errors=True)
        t0 = time.perf_counter()
        StagedPipeline(spark, cfg).run(files, resume=False)
        out["seconds"] = round(time.perf_counter() - t0, 3)
    else:
        t0 = time.perf_counter()
        counts = incremental_update(spark, files, cfg)
        out["seconds"] = round(time.perf_counter() - t0, 3)
        out["appended"] = counts.get("fingerprints_appended")
        out["corpus_after"] = counts.get("assignment")
        out["stage_seconds"] = counts.get("stage_seconds", {})
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
    p.add_argument("--expand", type=int, default=200)
    p.add_argument("--warehouse", default=DEFAULT_WAREHOUSE)
    p.add_argument("--all", action="store_true")
    args = p.parse_args()

    if not args.all:
        print(json.dumps(run_leg(
            args.leg or "base", args.cores, args.sf_dir, args.expand,
            args.warehouse,
        )))
        return

    results = {}
    for leg in ("base", "update_fresh", "update_small", "update_big"):
        results[leg] = run_subprocess(leg, args)
        print(json.dumps(results[leg]), flush=True)
    shutil.rmtree(args.warehouse, ignore_errors=True)
    summary = {
        "cores": args.cores,
        "base_files": results["base"]["n_files"],
        "base_s": results["base"]["seconds"],
        "update_fresh_files": results["update_fresh"]["n_files"],
        "update_fresh_s": results["update_fresh"]["seconds"],
        "update_small_files": results["update_small"]["n_files"],
        "update_small_s": results["update_small"]["seconds"],
        "update_big_files": results["update_big"]["n_files"],
        "update_big_s": results["update_big"]["seconds"],
        "big_vs_base_pct": round(
            100 * results["update_big"]["seconds"] / results["base"]["seconds"], 1
        ),
        "marginal_s_per_file": round(
            (results["update_big"]["seconds"] - results["update_small"]["seconds"])
            / max(1, results["update_big"]["n_files"]
                  - results["update_small"]["n_files"]),
            6,
        ),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
