#!/usr/bin/env python
"""Scale probes for the newest operators: ``semdedup`` at 500k vectors and
``cross_dedupe`` at 500k docs vs a 5k reference.

Both inputs are pre-materialized to parquet OUTSIDE the timed region (the
corrected-control lesson from BENCH/BASELINE.md: a one-task explode
generator inside the timing poisons the measurement), then the operator is
timed scan-to-noop on a fresh-ish plan.

Inputs are deterministic expansions of the sf0.1 tables:

* vectors — each sf0.1 embedding replicated ``--expand`` times with a
  per-copy positive scalar rescale: scalar multiples keep cosine exactly
  1.0, so every family is a planted semantic-dup clique and the
  within-cell pair volume exercises SemDeDup's real cost profile.
* docs — the bench_scaling generator's expansion (per-copy token
  perturbation); the reference side is the UNEXPANDED sf0.1 documents, so
  every corpus doc near- or exactly-matches some reference doc — the
  worst case for the candidate join.

Usage:
    python jobs/bench_vectors.py --cores 8 --expand 100
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
    p.add_argument("--n-cells", type=int, default=5000)
    p.add_argument("--which", choices=["semdedup", "cross", "both"], default="both")
    a = p.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    local_dir = f"/dev/shm/spark-local-vec-{os.getpid()}"
    os.makedirs(local_dir, exist_ok=True)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, local_dir, ignore_errors=True)

    from pyspark.sql import functions as F

    from dedupe_spark.session import get_spark

    spark = get_spark(
        app_name=f"bench_vectors[{a.cores}]",
        master=f"local[{a.cores}]",
        shuffle_partitions=256,
        extra_conf={"spark.local.dir": local_dir},
    )
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"cores": a.cores, "expand": a.expand}

    if a.which in ("semdedup", "both"):
        src = f"/tmp/bench_vectors_input_{a.expand}"
        if not os.path.exists(src + "/_SUCCESS"):
            emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            copies = F.explode(F.sequence(F.lit(0), F.lit(a.expand - 1))).alias("copy")
            vecs = emb.select("vec_id", "embedding", copies).select(
                (F.col("vec_id") * 1000 + F.col("copy")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x * (1.0 + F.col("copy") * 0.001),
                ).alias("embedding"),
            )
            vecs.repartition(256).write.mode("overwrite").parquet(src)
        from dedupe_spark.operators.similarity import semdedup

        vecs = spark.read.parquet(src)
        n = vecs.count()
        t0 = time.perf_counter()
        res = semdedup(vecs, threshold=0.95, n_cells=a.n_cells)
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out["semdedup"] = {
            "n_vectors": n,
            "n_cells": a.n_cells,
            "seconds": round(dt, 1),
            "vectors_per_sec": round(n / dt, 1),
        }

    if a.which in ("cross", "both"):
        src = f"/tmp/bench_cross_input_{a.expand}"
        if not os.path.exists(src + "/_SUCCESS"):
            docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
            copies = F.explode(F.sequence(F.lit(0), F.lit(a.expand - 1))).alias("copy")
            corpus = docs.select("doc_id", "text", copies).select(
                (F.col("doc_id") * 1000 + F.col("copy")).alias("doc_id"),
                F.concat_ws(
                    " ", F.col("text"), F.concat(F.lit("tag"), F.col("copy"))
                ).alias("text"),
            )
            corpus.repartition(256).write.mode("overwrite").parquet(src)
        from dedupe_spark.operators.decontam import cross_dedupe

        corpus = spark.read.parquet(src)
        ref = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
            "doc_id", "text"
        )
        n = corpus.count()
        t0 = time.perf_counter()
        res = cross_dedupe(corpus, ref)
        res.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out["cross_dedupe"] = {
            "n_corpus": n,
            "n_ref": ref.count(),
            "seconds": round(dt, 1),
            "docs_per_sec": round(n / dt, 1),
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
