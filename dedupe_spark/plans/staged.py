"""Staged, resumable pipeline runner — checkpoints + metrics + lineage.

The reference runs one monolithic in-memory pass and loses everything on a
crash (its own wishlist flags "resume capability" as missing,
/root/reference/context-cache.md:190). The north_star contract requires the
opposite: every stage writes its checkpoint (LSH buckets, scored edges,
component labels), per-partition lineage rows and counters go to a metrics
table, and a re-run after failure skips completed stages byte-identically.

Stage DAG (each stage reads only the PREVIOUS stage's committed table, so
resume never recomputes upstream work — and never rescans raw content after
``fingerprints`` is committed, the column-pruning point SURVEY.md §4.1
makes physical):

    fingerprints  files → fingerprint projection (pandas-UDF batch stage)
    exact         sha-groupBy tier (super-node representatives)
    buckets       LSH band explosion, size-filtered + salted
    edges         within-bucket pairs → consensus scoring → matches
    labels        iterative hash-min connected components
    assignment    labels × exact groups → per-file cluster + representative

Tables are keyed ``{run_id}/{stage}`` in the warehouse; metrics/lineage are
append tables keyed by (run_id, stage) and idempotent on resume because a
skipped stage appends nothing.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedupe_spark.config import PipelineConfig
from dedupe_spark.functions.fingerprint import with_fingerprints
from dedupe_spark.operators.blocking import (
    candidate_pairs,
    cap_degree,
    exact_groups,
    lsh_buckets,
)
from dedupe_spark.operators.cc import connected_components
from dedupe_spark.operators.representative import (
    order_cols_for,
    with_representative,
)
from dedupe_spark.operators.scoring import score_pairs
from dedupe_spark.sources.catalog import Catalog

STAGES = ["fingerprints", "exact", "buckets", "edges", "labels", "assignment"]


class StagedPipeline:
    """Resumable dedup pipeline over a warehouse catalog."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: PipelineConfig,
        catalog: Catalog | None = None,
    ) -> None:
        self.spark = spark
        self.cfg = cfg
        self.catalog = catalog or Catalog(spark, cfg.warehouse)

    # -- bookkeeping -------------------------------------------------------

    def _tbl(self, stage: str) -> str:
        return f"{self.cfg.run_id}/{stage}"

    def _metric(self, stage: str, metric: str, value: float) -> None:
        self._metrics([(stage, metric, value)])

    def _metrics(self, rows: list[tuple[str, str, float]]) -> None:
        """Append metric rows in ONE write per call — per-stage batching
        keeps crash durability (a committed stage always has its metrics)
        without one tiny parquet file per metric."""
        data = [(self.cfg.run_id, s, m, float(v)) for s, m, v in rows]
        df = self.spark.createDataFrame(
            data, "run_id string, stage string, metric string, value double"
        ).withColumn("ts", F.current_timestamp())
        df.write.mode("append").parquet(self.catalog.path("_metrics"))

    def _lineage(self, stage: str, df: DataFrame) -> None:
        """Per-partition lineage rows for a committed stage table.

        Reads the committed parquet (not the pre-write plan), so counts
        reflect exactly what resume will see. groupBy(partition_id) over a
        fresh scan is one cheap job; no Python.
        """
        lin = (
            df.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("rows"))
            .withColumn("run_id", F.lit(self.cfg.run_id))
            .withColumn("stage", F.lit(stage))
            .withColumn("ts", F.current_timestamp())
            .select("run_id", "stage", "partition_id", "rows", "ts")
        )
        lin.write.mode("append").parquet(self.catalog.path("_lineage"))

    def metrics(self) -> DataFrame:
        return self.catalog.read("_metrics").filter(
            F.col("run_id") == self.cfg.run_id
        )

    def lineage(self) -> DataFrame:
        return self.catalog.read("_lineage").filter(
            F.col("run_id") == self.cfg.run_id
        )

    def _run_stage(
        self, stage: str, build: Callable[[], DataFrame], resume: bool
    ) -> bool:
        """Execute one stage unless its checkpoint is already committed.

        Returns True if the stage ran, False if skipped (resume hit).
        """
        tbl = self._tbl(stage)
        if resume and self.catalog.exists(tbl):
            return False
        t0 = time.perf_counter()
        rows = self.catalog.write(build(), tbl)
        self._metrics(
            [(stage, "rows", rows), (stage, "seconds", time.perf_counter() - t0)]
        )
        self._lineage(stage, self.catalog.read(tbl))
        return True

    # -- stage builders (each reads committed upstream tables) -------------

    def _build_fingerprints(self, files: DataFrame) -> DataFrame:
        cfg = self.cfg
        df = files
        if cfg.langs:
            df = df.filter(
                F.lower(F.col("lang")).isin([l.lower() for l in cfg.langs])
            )
        if cfg.sample:
            df = df.limit(cfg.sample)
        return with_fingerprints(
            df,
            shingle_k=cfg.shingle_k,
            num_perm=cfg.num_perm,
            bands=cfg.lsh_bands,
            rows=cfg.lsh_rows,
            normalize=cfg.normalize,
        )

    def _build_exact(self) -> DataFrame:
        fp = self.catalog.read(self._tbl("fingerprints"))
        return exact_groups(fp)

    def _build_buckets(self) -> DataFrame:
        fp = self.catalog.read(self._tbl("fingerprints"))
        eg = self.catalog.read(self._tbl("exact"))
        reps = fp.join(
            eg.filter(F.col("file_id") == F.col("exact_rep")).select("file_id"),
            "file_id",
        )
        return lsh_buckets(
            reps,
            max_bucket_size=self.cfg.max_bucket_size,
            bucket_salt=self.cfg.bucket_salt,
        )

    def _build_edges(self) -> DataFrame:
        fp = self.catalog.read(self._tbl("fingerprints"))
        buckets = self.catalog.read(self._tbl("buckets"))
        pairs = candidate_pairs(
            buckets,
            neighbors_per_band=self.cfg.neighbors_per_band,
            hamming_prefilter=(
                self.cfg.hamming_threshold
                if self.cfg.require_agreement >= 2
                else None
            ),
        )
        pairs = cap_degree(pairs, max_degree=self.cfg.max_candidate_degree)
        return score_pairs(
            pairs,
            fp,
            hamming_threshold=self.cfg.hamming_threshold,
            jaccard_threshold=self.cfg.jaccard_threshold,
            require_agreement=self.cfg.require_agreement,
        ).filter("is_match")

    def _build_labels(self) -> DataFrame:
        edges = self.catalog.read(self._tbl("edges"))
        return connected_components(
            edges, max_iterations=self.cfg.cc_max_iterations
        )

    def _build_assignment(self) -> DataFrame:
        fp = self.catalog.read(self._tbl("fingerprints"))
        eg = self.catalog.read(self._tbl("exact"))
        labels = self.catalog.read(self._tbl("labels"))
        rep_label = labels.withColumnRenamed("file_id", "exact_rep")
        assignment = (
            eg.join(rep_label, "exact_rep", "left")
            .withColumn(
                "cluster_id",
                F.when(
                    F.col("component").isNotNull(), F.col("component")
                ).when(F.col("exact_group_size") >= 2, F.col("exact_rep")),
            )
            .select("file_id", "cluster_id")
        )
        out = fp.join(assignment, "file_id", "left")
        return with_representative(
            out, order_cols=order_cols_for(self.cfg.rep_order)
        )

    # -- orchestration -----------------------------------------------------

    def run(
        self,
        files: DataFrame | None = None,
        *,
        resume: bool = True,
        until: str = "assignment",
    ) -> dict[str, bool]:
        """Run stages up to ``until`` inclusive; returns {stage: ran?}.

        ``files`` is only needed when the fingerprints checkpoint doesn't
        exist yet — a resumed run can re-enter with files=None.
        """
        if until not in STAGES:
            raise ValueError(f"unknown stage {until!r}; expected one of {STAGES}")
        builders: dict[str, Callable[[], DataFrame]] = {
            "fingerprints": lambda: self._build_fingerprints(files),
            "exact": self._build_exact,
            "buckets": self._build_buckets,
            "edges": self._build_edges,
            "labels": self._build_labels,
            "assignment": self._build_assignment,
        }
        ran: dict[str, bool] = {}
        for stage in STAGES[: STAGES.index(until) + 1]:
            if stage == "fingerprints" and files is None:
                if not self.catalog.exists(self._tbl(stage)):
                    raise ValueError(
                        "files DataFrame required: fingerprints checkpoint missing"
                    )
                ran[stage] = False
                continue
            ran[stage] = self._run_stage(stage, builders[stage], resume)
        return ran

    def result(self) -> DataFrame:
        return self.catalog.read(self._tbl("assignment"))
