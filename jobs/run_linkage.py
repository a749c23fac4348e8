#!/usr/bin/env python
"""spark-submit entry point for the structured entity-resolution arc.

The document pipeline's sibling driver (jobs/run_pipeline.py covers the
reference's file-dedup surface): point it at a parquet table of entity
records and it runs block → compare → cluster → (optionally) fuse,
writing the assignment and golden-record tables to the warehouse catalog
and printing ONE JSON report line.

Comparison modes (--comparator):
  levenshtein   codegen bounded edit distance (<= --max-distance)
  jaro_winkler  Arrow-batched JW similarity (>= --min-similarity)
  fellegi       probabilistic FS weights over --fs-fields
                (u estimated from the data; m from --fs-m; optionally
                EM-trained with --fs-em), threshold --fs-threshold bits

Incremental: --update links a new batch against an existing run's
entities/assignments (batch-scale, star-edge reuse). Golden records:
--merge col=rule,... applies survivorship fusion after clustering.

Examples:
    spark-submit --py-files dist/dedupe_spark.zip jobs/run_linkage.py \\
        entities.parquet --id-col id --block-cols zip,city \\
        --compare-col name --warehouse /wh --run-id r1
    python jobs/run_linkage.py entities.parquet --id-col id \\
        --block-cols blk --comparator fellegi \\
        --fs-fields name,phone,email --fs-em --warehouse /wh --run-id r2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedupe_spark.operators.linkage import DEFAULT_MAX_BLOCK  # noqa: E402

MERGE_HELP = "comma-separated col=rule (rules: min,max,longest,mode)"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the entity table")
    p.add_argument("--id-col", required=True)
    p.add_argument("--block-cols", required=True, help="comma-separated")
    p.add_argument("--compare-col",
                   help="required for levenshtein / jaro_winkler")
    p.add_argument("--comparator", default="levenshtein",
                   choices=["levenshtein", "jaro_winkler", "fellegi"])
    p.add_argument("--max-distance", type=int, default=2)
    p.add_argument("--min-similarity", type=float, default=0.94)
    p.add_argument("--fs-fields", help="comma-separated FS fields")
    p.add_argument("--fs-m", type=float, default=0.95,
                   help="m-probability applied per field (unless --fs-em)")
    p.add_argument("--fs-em", action="store_true",
                   help="EM-train m/u from the agreement patterns")
    p.add_argument("--fs-threshold", type=float, default=4.0)
    p.add_argument("--max-block", type=int, default=DEFAULT_MAX_BLOCK)
    p.add_argument("--merge", help=MERGE_HELP)
    p.add_argument("--must-link",
                   help="parquet of (id1,id2) curated-match overrides "
                        "(levenshtein comparator only)")
    p.add_argument("--cannot-link",
                   help="parquet of (id1,id2) curated-non-match overrides "
                        "(levenshtein comparator only)")
    p.add_argument("--cannot-link-mode", default="edge",
                   choices=("edge", "closure"),
                   help="'edge' severs only the direct pair edge (fast); "
                        "'closure' guarantees the pair lands in different "
                        "clusters by re-splitting violated components "
                        "(constrained Kruskal on edge evidence)")
    p.add_argument("--update", help="parquet path of a new batch to link "
                                    "against an existing run")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--report-density", action="store_true",
                   help="write the per-cluster edge-density QA table "
                        "(cluster_edge_stats) — levenshtein comparator only")
    p.add_argument("--quiet", action="store_true")
    return p


def _parse_rules(spec: str) -> dict[str, str]:
    rules: dict[str, str] = {}
    for part in spec.split(","):
        if "=" not in part:
            raise SystemExit(f"--merge entry {part!r} is not col=rule")
        col, rule = part.split("=", 1)
        rules[col.strip()] = rule.strip()
    return rules


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.comparator in ("levenshtein", "jaro_winkler") and not args.compare_col:
        raise SystemExit(f"--compare-col required for {args.comparator}")
    if args.comparator == "fellegi" and not args.fs_fields:
        raise SystemExit("--fs-fields required for fellegi")
    if (args.must_link or args.cannot_link) and (
        args.comparator != "levenshtein" or args.update
    ):
        raise SystemExit(
            "--must-link/--cannot-link require the levenshtein comparator "
            "and a full (non --update) run"
        )
    merge_rules = _parse_rules(args.merge) if args.merge else None

    from pyspark.sql import functions as F

    from dedupe_spark.operators import linkage
    from dedupe_spark.session import get_spark
    from dedupe_spark.sources.catalog import Catalog

    spark = get_spark(app_name=f"run_linkage:{args.run_id}")
    if args.quiet:
        spark.sparkContext.setLogLevel("ERROR")
    cat = Catalog(spark, args.warehouse)
    run = lambda t: f"{args.run_id}/{t}"  # noqa: E731

    df = spark.read.parquet(args.input)
    block_cols = args.block_cols.split(",")
    kw = dict(
        id_col=args.id_col,
        block_cols=block_cols,
        compare_col=args.compare_col,
        max_distance=args.max_distance,
        max_block=args.max_block,
    )

    if args.update:
        batch = spark.read.parquet(args.update)
        prior = cat.read(run("assignment"))
        # the linked corpus is the CATALOG's entities table, not the
        # --input path: a second --update must extend batch 1's rows,
        # which exist only in the catalog
        old = cat.read(run("entities"))
        assign = linkage.link_incremental(old, batch, prior, **kw)
        entities = old.unionByName(batch.join(
            old.select(F.col(args.id_col).alias("_x")),
            batch[args.id_col] == F.col("_x"), "left_anti",
        ))
    elif args.comparator == "levenshtein":
        constraints = {}
        if args.must_link:
            constraints["must_link"] = spark.read.parquet(args.must_link)
        if args.cannot_link:
            constraints["cannot_link"] = spark.read.parquet(args.cannot_link)
            constraints["cannot_link_mode"] = args.cannot_link_mode
        assign = linkage.link_records(df, **kw, **constraints)
        entities = df
    elif args.comparator == "jaro_winkler":
        from dedupe_spark.operators.cc import partitioned_components

        pairs = linkage.candidate_pairs(
            df, id_col=args.id_col, block_cols=block_cols,
            compare_col=args.compare_col, max_block=args.max_block,
        )
        edges = linkage.score_pairs_jw(
            pairs, min_similarity=args.min_similarity,
            carry=block_cols,
        ).select("id1", "id2", *block_cols)
        comp = partitioned_components(edges, key_cols=block_cols)
        ids = df.select(F.col(args.id_col).alias("id")).filter(
            F.col("id").isNotNull()
        )
        from pyspark.sql import Window

        out = ids.join(
            comp.withColumnRenamed("file_id", "id"), "id", "left"
        ).select("id", F.col("component").alias("cluster_id"))
        w = Window.partitionBy(
            F.coalesce(F.col("cluster_id"), F.col("id"))
        )
        assign = out.select(
            "id", "cluster_id",
            F.when(F.col("cluster_id").isNotNull(),
                   F.count("*").over(w)).alias("cluster_size"),
            F.when(F.col("cluster_id").isNotNull(),
                   F.col("id") == F.min("id").over(w)).alias(
                "is_representative"),
        )
        entities = df
    else:  # fellegi
        from dedupe_spark.operators import fellegi

        fields = args.fs_fields.split(",")
        if args.fs_em:
            u0 = fellegi.estimate_u(df, fields=fields)
            pairs = fellegi.field_pairs(
                df, id_col=args.id_col, block_cols=block_cols,
                fields=fields, max_block=args.max_block,
            )
            boot = fellegi.fs_score(
                pairs, fields=fields,
                m={f: 0.9 for f in fields}, u=u0,
            )
            pats = fellegi.agreement_patterns(boot, fields=fields)
            m, u, _lam = fellegi.estimate_m_u(pats, fields=fields)
        else:
            m = {f: args.fs_m for f in fields}
            u = None
        assign = fellegi.fs_link(
            df, id_col=args.id_col, block_cols=block_cols,
            fields=fields, m=m, u=u,
            threshold_weight=args.fs_threshold,
            max_block=args.max_block,
        )
        entities = df

    cat.replace(assign, run("assignment"))
    cat.replace(entities, run("entities"))
    # everything below must read the MATERIALIZED tables: the live
    # `assign`/`entities` plans still reference the pre-swap files that
    # replace() just renamed away (stale-lineage trap)
    assign_tbl = cat.read(run("assignment"))

    report = {
        "run_id": args.run_id,
        "comparator": args.comparator if not args.update else "update",
        "n_entities": cat.rows(run("entities")),
        "n_assigned": cat.rows(run("assignment")),
        "n_clusters": assign_tbl.filter(
            F.col("is_representative")
        ).count(),
        "n_clustered_rows": assign_tbl.filter(
            F.col("cluster_id").isNotNull()
        ).count(),
    }

    if merge_rules:
        golden = linkage.merge_clusters(
            cat.read(run("entities")), assign_tbl,
            id_col=args.id_col, rules=merge_rules,
        )
        cat.replace(golden, run("golden"))
        report["n_golden"] = cat.rows(run("golden"))

    if args.report_density:
        if args.comparator != "levenshtein" or args.update:
            raise SystemExit(
                "--report-density requires the levenshtein comparator "
                "(edges must be recomputable from the config)"
            )
        pairs = linkage.candidate_pairs(
            cat.read(run("entities")), id_col=args.id_col,
            block_cols=block_cols, compare_col=args.compare_col,
            max_block=args.max_block,
        )
        edges = linkage.score_pairs(
            pairs, max_distance=args.max_distance
        ).select("id1", "id2")
        density = linkage.cluster_edge_stats(assign_tbl, edges)
        cat.replace(density, run("density"))
        chained = density.filter(~F.col("is_clique")).count()
        report["n_scored_clusters"] = cat.rows(run("density"))
        report["n_chained_clusters"] = chained

    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
