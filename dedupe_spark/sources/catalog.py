"""Warehouse catalog — Iceberg-shaped table layer with a parquet fallback.

The production design (BASELINE.json north_star) writes every stage
checkpoint to an Iceberg table; this sandbox has no Iceberg jars, so the
same API is served by a path-per-table parquet warehouse plus a
``_snapshots`` JSON manifest that plays the role of Iceberg's snapshot
metadata (commit bookkeeping for resume). The real Iceberg path IS wired:
``USE_ICEBERG=1`` makes ``session.get_spark`` register the catalog
(``session.iceberg_conf``) and this class route every read/write/exists
through the session catalog (``writeTo``/``spark.table``) instead of
parquet paths — untestable in this jar-less sandbox, but a config switch,
not a code change, on a real cluster (SURVEY.md §7 "catalog layer").

Why a manifest and not just "directory exists": a crashed write can leave a
partial directory. Spark's ``_SUCCESS`` marker plus our manifest entry
(written strictly after the data commit) makes ``exists()`` mean
"committed", which is what resume correctness needs.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Snapshot:
    table: str
    rows: int
    committed_at: float
    mode: str


class Catalog:
    """Path-per-table parquet warehouse with commit manifest."""

    def __init__(self, spark: SparkSession, warehouse: str) -> None:
        self.spark = spark
        self.warehouse = warehouse
        from dedupe_spark.session import use_iceberg

        self.iceberg = use_iceberg()
        if not self.iceberg:
            os.makedirs(warehouse, exist_ok=True)

    def qualified(self, table: str) -> str:
        """Iceberg identifier for a stage table: `/` (run/stage separator)
        and other non-identifier chars become `_`."""
        from dedupe_spark.session import ICEBERG_CATALOG

        safe = "".join(c if c.isalnum() else "_" for c in table)
        return f"{ICEBERG_CATALOG}.db.{safe}"

    # -- manifest ----------------------------------------------------------

    @property
    def _manifest_path(self) -> str:
        return os.path.join(self.warehouse, "_snapshots.json")

    def _manifest(self) -> dict[str, dict]:
        if not os.path.exists(self._manifest_path):
            return {}
        with open(self._manifest_path) as f:
            return json.load(f)

    def _commit(self, snap: Snapshot) -> None:
        m = self._manifest()
        m[snap.table] = {
            "rows": snap.rows,
            "committed_at": snap.committed_at,
            "mode": snap.mode,
        }
        tmp = self._manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, indent=1)
        os.replace(tmp, self._manifest_path)  # atomic on POSIX

    # -- table API ---------------------------------------------------------

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        """True ⇔ the table was fully committed (manifest + data present;
        under Iceberg, table commits are atomic so tableExists suffices)."""
        if self.iceberg:
            return self.spark.catalog.tableExists(self.qualified(table))
        return table in self._manifest() and os.path.exists(self.path(table))

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> int:
        """Write + commit; returns rows written (the count reads back the
        committed parquet footer metadata — cheap, no recompute)."""
        if self.iceberg:
            ident = self.qualified(table)
            w = df.writeTo(ident)
            if mode == "overwrite" or not self.spark.catalog.tableExists(ident):
                w.createOrReplace()
            else:
                w.append()
            return self.read(table).count()
        df.write.mode(mode).parquet(self.path(table))
        rows = self.spark.read.parquet(self.path(table)).count()
        self._commit(Snapshot(table, rows, time.time(), mode))
        return rows

    def append(self, df: DataFrame, table: str) -> int:
        return self.write(df, table, mode="append")

    def replace(self, df: DataFrame, table: str) -> int:
        """Overwrite ``table`` with a plan that may READ ``table`` itself.

        A plain overwrite of a parquet path you are reading deletes the
        input files before the lazy plan scans them (the classic Spark
        self-overwrite trap). Here the new data is fully materialized to a
        sibling ``<table>.__new`` directory first, then swapped in with two
        directory renames. Under Iceberg this is unnecessary — reads are
        pinned to the old snapshot — so it degrades to a plain overwrite.

        Crash window: between the two renames the table directory is
        briefly absent; the manifest entry is only rewritten after the
        swap, so ``exists()`` (manifest AND path) stays false during the
        window and a resuming run recomputes the stage rather than reading
        a half-swapped table.
        """
        if self.iceberg:
            return self.write(df, table)
        tmp = table + ".__new"
        shutil.rmtree(self.path(tmp), ignore_errors=True)
        df.write.mode("overwrite").parquet(self.path(tmp))
        rows = self.spark.read.parquet(self.path(tmp)).count()
        old = self.path(table) + ".__old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(self.path(table)):
            os.rename(self.path(table), old)
        os.rename(self.path(tmp), self.path(table))
        shutil.rmtree(old, ignore_errors=True)
        self._commit(Snapshot(table, rows, time.time(), "replace"))
        return rows

    def read(self, table: str) -> DataFrame:
        if self.iceberg:
            return self.spark.table(self.qualified(table))
        return self.spark.read.parquet(self.path(table))

    def drop(self, table: str) -> None:
        if self.iceberg:
            self.spark.sql(f"DROP TABLE IF EXISTS {self.qualified(table)}")
            return
        m = self._manifest()
        if m.pop(table, None) is not None:
            tmp = self._manifest_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(m, f, indent=1)
            os.replace(tmp, self._manifest_path)
        shutil.rmtree(self.path(table), ignore_errors=True)

    def rows(self, table: str) -> int | None:
        """Committed row count, or None if the table was never committed.

        The Iceberg branch has no parquet manifest — count the live table
        instead (Iceberg commits are atomic, so exists ⇒ committed). This
        keeps the streaming-ingest idempotence markers (``rows(...) is not
        None``) and incremental_update's before-counts working identically
        under ``USE_ICEBERG=1``.
        """
        if self.iceberg:
            if not self.exists(table):
                return None
            return self.read(table).count()
        entry = self._manifest().get(table)
        return None if entry is None else entry["rows"]
