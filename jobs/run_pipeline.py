#!/usr/bin/env python
"""spark-submit entry point for the record-linkage pipeline.

Cluster usage (the packaged path, BASELINE.json north_star):

    python jobs/package.py                       # builds dist/dedupe_spark.zip
    spark-submit --py-files dist/dedupe_spark.zip jobs/run_pipeline.py \\
        --input /data/files_parquet --warehouse /data/warehouse \\
        --run-id nightly --threshold 10 --agreement 2

CLI surface mirrors the reference (/root/reference/dedupe.py:14-37):
--threshold (Hamming 0-64, default 10), --agreement (1-3, default 2),
--sample N, --dry-run, --quiet, plus the reference's second entry point
`analyze` (dedupe.py:253-306: scan→hash→detect→report, organize nothing)
as --analyze, partial-stage runs as --until STAGE, the --hash-size
precision/recall dial (dedupe.py:21-22) as the fingerprint-granularity
knobs --shingle-k/--num-perm/--bands/--rows, and Spark-era options the
reference lacks (--run-id/--resume checkpointing, --langs filter,
--warehouse).

Exit behavior mirrors the reference too: empty input exits 0 with a message
(dedupe.py:122-124); per-row errors never fail the run (error-channel rows
are reported, not raised).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# local (non-spark-submit) runs: make the repo-root package importable
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(description="PySpark record-linkage pipeline")
    p.add_argument("--input", default=None, help="parquet path with files schema "
                   "(repo, path, commit, lang, content); required except "
                   "with --rebucket")
    p.add_argument("--documents", action="store_true",
                   help="input is a documents table (doc_id, text, lang, source); "
                        "map it onto the files schema")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--output", default=None,
                   help="optional parquet path for surviving rows "
                        "(representatives + singletons)")
    p.add_argument("--flat-output", action="store_true",
                   help="write --output as one flat table (no partition "
                        "dirs); basename conflicts resolved with _k "
                        "suffixes in an out_name column (the reference's "
                        "flat-destination mode, file_organizer.py:131-143,"
                        "194-224)")
    p.add_argument("--threshold", type=int, default=10,
                   help="simhash Hamming threshold 0-64 (default 10)")
    p.add_argument("--agreement", type=int, default=2,
                   help="consensus votes required, 1-3 (default 2)")
    p.add_argument("--jaccard", type=float, default=0.7)
    p.add_argument("--sample", type=int, default=None)
    p.add_argument("--langs", default=None, help="comma-separated lang filter")
    p.add_argument("--no-resume", action="store_true",
                   help="recompute every stage even if checkpoints exist")
    p.add_argument("--dry-run", action="store_true",
                   help="run + report, write no output table")
    p.add_argument("--analyze", action="store_true",
                   help="report duplicates only, organize/write nothing "
                        "(the reference's `analyze` entry point)")
    p.add_argument("--update", action="store_true",
                   help="append the input as a new batch to an existing run "
                        "(incremental dedup: old-vs-old pairs not recomputed)")
    p.add_argument("--advise", action="store_true",
                   help="print the incremental-vs-rebuild recommendation for "
                        "this batch (batch ratio + bucket-salt staleness, "
                        "thresholds from BENCH measurements) and exit without "
                        "modifying the warehouse")
    p.add_argument("--rebucket", action="store_true",
                   help="maintenance mode: rebuild ONLY the buckets stage "
                        "from committed fingerprints (fresh global hot-bucket "
                        "census restores salting lost to delta growth; "
                        "dethroned-rep rows dropped), swap via Catalog."
                        "replace, print a before/after report, and exit — "
                        "no --input needed, nothing downstream touched")
    p.add_argument("--until", default="assignment",
                   choices=["fingerprints", "exact", "buckets", "edges",
                            "labels", "assignment"],
                   help="stop after this stage (checkpoints committed up to "
                        "and including it; later runs resume from there)")
    # fingerprint granularity — the reference's --hash-size {8,16}
    # precision/recall dial (dedupe.py:21-22, validated dedupe.py:86-88)
    p.add_argument("--shingle-k", type=int, default=3,
                   help="token-shingle width (higher = stricter match)")
    p.add_argument("--num-perm", type=int, default=128,
                   help="MinHash permutations (must equal bands*rows)")
    p.add_argument("--bands", type=int, default=32,
                   help="LSH bands b; s-curve threshold ~ (1/b)^(1/r)")
    p.add_argument("--rows", type=int, default=4, help="LSH rows per band r")
    p.add_argument("--normalize", default="raw",
                   choices=["raw", "type1", "type2"],
                   help="fingerprint the clone-normalized content instead "
                        "of raw bytes: type1 strips comments/layout (The "
                        "Stack v2 comment-stripped near-dedup), type2 also "
                        "folds identifiers+literals (clone-candidate "
                        "granularity); size/space-saved stats stay raw")
    p.add_argument("--rep-order", default="default",
                   choices=["default", "quality"],
                   help="representative ranking: 'default' = format-priority "
                        "tuple (reference W4); 'quality' = weighted "
                        "text-quality score (W5, the compare_images "
                        "alternative, quality_assessor.py:114-136)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--master", default=None)
    return p.parse_args(argv)


def main(argv: list[str] | None = None) -> int:
    args = parse_args(argv)

    from pyspark.sql import functions as F

    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.operators.representative import survivors
    from dedupe_spark.plans.staged import StagedPipeline
    from dedupe_spark.session import get_spark

    cfg = PipelineConfig(
        hamming_threshold=args.threshold,
        require_agreement=args.agreement,
        jaccard_threshold=args.jaccard,
        shingle_k=args.shingle_k,
        num_perm=args.num_perm,
        lsh_bands=args.bands,
        lsh_rows=args.rows,
        sample=args.sample,
        normalize=args.normalize,
        rep_order=args.rep_order,
        run_id=args.run_id,
        warehouse=args.warehouse,
        langs=args.langs.split(",") if args.langs else [],
        dry_run=args.dry_run or args.analyze,
    )
    spark = get_spark(app_name=f"dedupe_spark[{args.run_id}]", master=args.master)
    if args.quiet:
        spark.sparkContext.setLogLevel("ERROR")

    if args.rebucket:
        from dedupe_spark.plans.incremental import rebucket

        report = rebucket(spark, cfg)
        print(json.dumps({"run_id": args.run_id, "rebucket": report}))
        return 0
    if not args.input:
        raise SystemExit("--input is required (except with --rebucket)")

    from dedupe_spark.sources.io import read_documents_as_files, read_files

    if args.documents:
        files = read_documents_as_files(spark, args.input)
    else:
        files = read_files(spark, args.input)
    if files.isEmpty():  # reference: empty scan exits 0 (dedupe.py:122-124)
        print("No input rows found — nothing to do.")
        return 0

    pipe = StagedPipeline(spark, cfg)
    if args.advise:
        from dedupe_spark.plans.incremental import update_advice

        advice = update_advice(spark, cfg, batch_rows=files.count())
        print(json.dumps({"run_id": args.run_id, "advice": advice}))
        return 0
    if args.update:
        from dedupe_spark.plans.incremental import incremental_update, update_advice

        if not args.quiet:
            # advisory only — the operator asked for an update, run it; the
            # planner's reasons are surfaced so the cost is not a surprise.
            # Gated on --quiet: the advisory costs a batch count plus a
            # corpus-wide bucket aggregation, which a production (quiet)
            # update should not pay just to discard the answer.
            advice = update_advice(spark, cfg, batch_rows=files.count())
            if advice["recommendation"] != "incremental":
                print(json.dumps({"advice": advice}), file=sys.stderr)
        ran = incremental_update(spark, files, cfg)
    else:
        ran = pipe.run(files, resume=not args.no_resume, until=args.until)

    if args.until != "assignment":
        # partial-stage run: no assignment table yet — report per-stage
        # rows from the metrics table and stop (resume picks up from here)
        rows = {
            r["stage"]: int(r["value"])
            for r in pipe.metrics().filter(F.col("metric") == "rows").collect()
        }
        print(json.dumps({
            "run_id": args.run_id,
            "stages_ran": ran,
            "until": args.until,
            "stage_rows": rows,
            "dry_run": cfg.dry_run,
        }))
        return 0

    result = pipe.result()

    if args.output and not (args.dry_run or args.analyze):
        from dedupe_spark.sources.io import write_output

        # default: lang-partitioned (structure-preserving S7); --flat-output
        # = the reference's single-flat-directory mode with S8 suffixing
        write_output(survivors(result), args.output, flat=args.flat_output)

    # run report (duplicate_detector.py:191-217 / file_organizer.py:270-293)
    sizes = (
        result.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n"), (F.sum("size") - F.max("size")).alias("saved"))
    )
    stats = sizes.agg(
        F.count("*").alias("groups"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("members"),
        F.coalesce(F.max("n"), F.lit(0)).alias("largest"),
        F.coalesce(F.sum("saved"), F.lit(0)).alias("space_saved"),
    ).first()
    # error artifact — parity with the reference's timestamped error log +
    # console summary (dedupe.py:147-182): the rows a user would triage land
    # in a {run_id}/errors warehouse table (file identity + error type),
    # and the report carries the type frequencies. --analyze still writes it
    # (the reference's analyze entry point emits its error log too), but
    # --dry-run does NOT: a dry run must not mutate warehouse state or
    # clobber a prior real run's errors table for the same run_id — the
    # frequencies are computed from the in-memory result instead.
    err_rows = result.filter(F.col("error").isNotNull()).select(
        "file_id", "repo", "path", "error"
    )
    if args.dry_run:
        errors = err_rows.count()
    else:
        errors = pipe.catalog.write(err_rows, f"{args.run_id}/errors")
        err_rows = pipe.catalog.read(f"{args.run_id}/errors")
    top_errors = {
        r["error"]: r["n"]
        for r in err_rows.groupBy("error")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "error")
        .limit(5)
        .collect()
    }
    report = {
        "run_id": args.run_id,
        "stages_ran": ran,
        "total_files": result.count(),
        "duplicate_groups": stats["groups"],
        "files_in_groups": stats["members"],
        "largest_group": stats["largest"],
        "space_saved_bytes": stats["space_saved"],
        "error_rows": errors,
        "top_errors": top_errors,
        "dry_run": cfg.dry_run,
        "analyze": args.analyze,
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
