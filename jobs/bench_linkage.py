#!/usr/bin/env python
"""Scale probe for the structured-ER layer: link_records / fs_link /
link_incremental on a deterministic synthetic entity table generated
INSIDE Spark (no driver loop, no external data).

Corpus shape: families of ``--members`` near-duplicate records whose
names differ in one trailing character (Levenshtein 1), ``--fams-per-
block`` families per block key — so blocks are ~members·fams_per_block
rows and the pair volume per block is C(block,2), the realistic blocked-
ER regime. Family name stems are scattered with a prime multiplier so
cross-family name distances are mostly large (occasional accidental
links are harmless for a throughput probe; cluster-exactness is the
oracle suite's job, at sf0.01).

Prints one JSON line per stage: records/s end-to-end for
  * link_records  (blocked Levenshtein + per-block union-find)
  * fs_link       (u-estimation scan + codegen FS scoring + union-find)
  * link_incremental (+10% batch against the linked corpus)

Usage:
    python jobs/bench_linkage.py --n 200000
    python jobs/bench_linkage.py --n 500000 --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_entities(spark, n: int, members: int, fams_per_block: int):
    from pyspark.sql import functions as F

    base = spark.range(n)
    fam = (F.col("id") / members).cast("long")
    stem = (fam * 7919) % 10_000_000
    return base.select(
        F.col("id").alias("rid"),
        (fam % F.lit(max(1, n // (members * fams_per_block)))).alias("blk"),
        F.concat(
            F.lit("entity-"),
            F.lpad(stem.cast("string"), 7, "0"),
            F.lit("-"),
            (F.col("id") % members).cast("string"),
        ).alias("name"),
        (fam % 97).cast("int").alias("attr_a"),
        (stem % 1009).cast("int").alias("attr_b"),
    )


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--members", type=int, default=3)
    p.add_argument("--fams-per-block", type=int, default=10)
    p.add_argument("--cores", type=int, default=None)
    p.add_argument("--snm-window", type=int, default=0,
                   help="if > 0, add a sorted-neighborhood leg with this "
                        "window over the name sort (wide windows probe the "
                        "O(n*w) pair path: w=100+ per VERDICT r4 #8)")
    args = p.parse_args()

    from dedupe_spark.session import get_spark

    master = f"local[{args.cores}]" if args.cores else None
    spark = get_spark(app_name="bench_linkage", **(
        {"master": master} if master else {}
    ))
    spark.sparkContext.setLogLevel("ERROR")

    from dedupe_spark.operators.fellegi import fs_link
    from dedupe_spark.operators.linkage import (
        link_incremental,
        link_records,
    )

    ents = build_entities(spark, args.n, args.members, args.fams_per_block)
    # materialize the input once so generation cost is excluded
    ents = ents.localCheckpoint(eager=True)
    n = ents.count()

    out = {"n": n, "members": args.members,
           "fams_per_block": args.fams_per_block}

    kw = dict(id_col="rid", block_cols=["blk"], compare_col="name",
              max_distance=2)

    t0 = time.perf_counter()
    assign = link_records(ents, **kw)
    assign.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    out["link_records_s"] = round(dt, 1)
    out["link_records_rps"] = round(n / dt, 1)

    t0 = time.perf_counter()
    fs_link(
        ents,
        id_col="rid",
        block_cols=["blk"],
        fields=["name", "attr_a", "attr_b"],
        m={"name": 0.95, "attr_a": 0.9, "attr_b": 0.9},
        threshold_weight=6.0,
    ).write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    out["fs_link_s"] = round(dt, 1)
    out["fs_link_rps"] = round(n / dt, 1)

    if args.snm_window > 0:
        from pyspark.sql import functions as F

        from dedupe_spark.operators.linkage import sorted_neighborhood_pairs

        t0 = time.perf_counter()
        snm = sorted_neighborhood_pairs(
            ents,
            id_col="rid",
            sort_cols=["name"],
            window=args.snm_window,
            carry_sort_cols=True,
        ).select(
            "id1",
            "id2",
            F.levenshtein("l_name", "r_name", 2).alias("d"),
        ).filter(F.col("d").between(0, 2))
        snm.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        out["snm_window"] = args.snm_window
        out["snm_s"] = round(dt, 1)
        out["snm_rps"] = round(n / dt, 1)

    # +10% batch: ids above n with names colliding into existing blocks
    batch = build_entities(
        spark, int(args.n * 1.1), args.members, args.fams_per_block
    ).filter(f"rid >= {args.n}").localCheckpoint(eager=True)
    nb = batch.count()
    assign = assign.localCheckpoint(eager=True)
    t0 = time.perf_counter()
    link_incremental(ents, batch, assign, **kw).write.format("noop").mode(
        "overwrite"
    ).save()
    dt = time.perf_counter() - t0
    out["incremental_batch_n"] = nb
    out["incremental_s"] = round(dt, 1)
    out["incremental_batch_rps"] = round(nb / dt, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
