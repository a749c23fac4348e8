"""sources/ layer tests: schema-pinned readers, partitioned writer,
catalog commit semantics (the resume gate's foundation)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dedupe_spark.sources.catalog import Catalog
from dedupe_spark.sources.io import (
    FILES_SCHEMA,
    read_documents_as_files,
    read_files,
    write_output,
)

ROWS = [
    ("r1", "a.py", "c0", "python", "def a(): pass"),
    ("r1", "b.js", "c0", "js", "function b() {}"),
    ("r2", "c.py", "c1", "python", "def c(): pass"),
]


@pytest.fixture(scope="module")
def files_parquet(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("files_src") / "files")
    spark.createDataFrame(ROWS, FILES_SCHEMA).write.parquet(d)
    return d


def test_read_files_parquet_and_lang_filter(spark, files_parquet):
    assert read_files(spark, files_parquet).count() == 3
    only_py = read_files(spark, files_parquet, langs=["PYTHON"])
    assert only_py.count() == 2  # case-insensitive lang match


def test_read_files_csv_with_pinned_schema(spark, tmp_path):
    d = str(tmp_path / "csv")
    spark.createDataFrame(ROWS, FILES_SCHEMA).write.option("header", "true").option(
        "escape", '"'
    ).csv(d)
    df = read_files(spark, d, fmt="csv")
    assert df.schema == FILES_SCHEMA
    assert df.count() == 3


def test_read_files_rejects_wrong_shape(spark, tmp_path):
    d = str(tmp_path / "bad")
    spark.range(3).write.parquet(d)
    with pytest.raises(ValueError, match="missing columns"):
        read_files(spark, d)


def test_read_files_rejects_unknown_format(spark, files_parquet):
    with pytest.raises(ValueError, match="unsupported format"):
        read_files(spark, files_parquet, fmt="orcish")


def test_documents_mapping(spark):
    out = read_documents_as_files(spark, "/root/testdata/sf0.001/documents.parquet")
    assert set(out.columns) == {"repo", "path", "commit", "lang", "content"}
    assert out.count() == 500


def test_write_output_partitions_by_lang(spark, tmp_path):
    d = str(tmp_path / "out")
    write_output(spark.createDataFrame(ROWS, FILES_SCHEMA), d)
    subdirs = {p for p in os.listdir(d) if p.startswith("lang=")}
    assert subdirs == {"lang=python", "lang=js"}
    assert spark.read.parquet(d).count() == 3


def test_write_output_partition_prunes_on_readback(spark, tmp_path):
    """S7 round-trip: a lang-filtered scan of write_output's layout must
    partition-prune — the physical plan carries the lang partition filter
    and the scan touches only the matching partition directory's files."""
    d = str(tmp_path / "out")
    write_output(spark.createDataFrame(ROWS, FILES_SCHEMA), d)
    q = spark.read.parquet(d).filter(F.col("lang") == "python")
    plan = q._jdf.queryExecution().executedPlan().toString()
    part = plan.split("PartitionFilters")[1][:160]
    assert "lang" in part, plan[:800]
    # prove the pruning physically: only files under lang=python are read
    pruned = q.withColumn("_f", F.input_file_name()).select("_f").distinct().collect()
    assert all("lang=python" in r["_f"] for r in pruned), pruned
    assert q.count() == 2


def test_catalog_commit_semantics(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame(ROWS, FILES_SCHEMA)
    assert not cat.exists("t1")
    assert cat.write(df, "t1") == 3
    assert cat.exists("t1") and cat.rows("t1") == 3
    assert cat.read("t1").count() == 3
    # a data directory without a manifest entry is NOT committed
    df.write.mode("overwrite").parquet(cat.path("t2"))
    assert not cat.exists("t2")
    cat.drop("t1")
    assert not cat.exists("t1") and cat.rows("t1") is None


def test_iceberg_switch_off_by_default(spark, tmp_path, monkeypatch):
    """Without USE_ICEBERG=1 the catalog is the tested parquet branch."""
    from dedupe_spark.sources.catalog import Catalog

    monkeypatch.delenv("USE_ICEBERG", raising=False)
    cat = Catalog(spark, str(tmp_path / "wh"))
    assert cat.iceberg is False
    df = spark.range(3).toDF("x")
    assert cat.write(df, "r1/t") == 3
    assert cat.exists("r1/t") and cat.read("r1/t").count() == 3


def test_iceberg_conf_and_identifier_shape(monkeypatch):
    """The USE_ICEBERG=1 path: conf keys + identifier sanitization (the
    jar-less sandbox can't run Iceberg itself — structural checks only)."""
    from dedupe_spark.session import ICEBERG_CATALOG, iceberg_conf, use_iceberg

    conf = iceberg_conf(warehouse="/w")
    assert conf[f"spark.sql.catalog.{ICEBERG_CATALOG}"].endswith("SparkCatalog")
    assert conf[f"spark.sql.catalog.{ICEBERG_CATALOG}.warehouse"] == "/w"
    monkeypatch.setenv("USE_ICEBERG", "1")
    assert use_iceberg() is True

    from dedupe_spark.sources.catalog import Catalog

    cat = Catalog.__new__(Catalog)  # skip __init__: no session needed
    assert cat.qualified("run0/fingerprints") == (
        f"{ICEBERG_CATALOG}.db.run0_fingerprints"
    )


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """A self-join on the bucket column of a bucketed table must not
    re-shuffle either side — the physical plan has no Exchange above the
    scans. This is the co-located-join contract write_bucketed exists for."""
    from dedupe_spark.sources.io import write_bucketed

    df = spark.range(0, 1000).select(
        F.col("id").cast("string").alias("file_id"),
        (F.col("id") % 7).alias("v"),
    )
    write_bucketed(df, "bucketed_fp_test", buckets=8)
    try:
        t = spark.table("bucketed_fp_test")
        # force the sort-merge path (AQE would otherwise broadcast this
        # tiny table); bucketing must make the SMJ shuffle-free
        joined = t.alias("a").hint("merge").join(t.alias("b"), "file_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:800]
        assert joined.count() == 1000
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_fp_test")


def test_conflict_free_names_suffixes_flat_collisions(spark):
    """S8 flat mode: colliding basenames get _k before the extension,
    ordered by file_id; non-colliding names stay bare."""
    from dedupe_spark.sources.io import with_conflict_free_names

    df = spark.createDataFrame(
        [
            ("f1", "a/util.py"),
            ("f2", "b/util.py"),
            ("f3", "c/sub/util.py"),
            ("f4", "a/unique.rs"),
            ("f5", "a/noext"),
            ("f6", "b/noext"),
        ],
        "file_id string, path string",
    )
    out = {r["file_id"]: r["out_name"] for r in with_conflict_free_names(df).collect()}
    assert out["f1"] == "util.py"          # first claimant by file_id
    assert out["f2"] == "util_1.py"        # suffix BEFORE the extension
    assert out["f3"] == "util_2.py"
    assert out["f4"] == "unique.rs"
    assert out["f5"] == "noext"
    assert out["f6"] == "noext_1"


def test_write_output_flat_mode(spark, tmp_path):
    """flat=True writes one unpartitioned table carrying out_name."""
    import os

    from dedupe_spark.sources.io import write_output

    df = spark.createDataFrame(
        [("f1", "a/x.py", "python"), ("f2", "b/x.py", "python")],
        "file_id string, path string, lang string",
    )
    dest = str(tmp_path / "flat")
    write_output(df, dest, flat=True)
    assert not any(d.startswith("lang=") for d in os.listdir(dest))
    got = {r["out_name"] for r in spark.read.parquet(dest).collect()}
    assert got == {"x.py", "x_1.py"}


def test_conflict_free_names_synthesized_never_collides_with_genuine(spark):
    """A synthesized `a_1.txt` must not collide with a GENUINE `a_1.txt`
    from another directory (the one-pass-over-raw-basenames failure mode):
    resolution iterates on the FINAL name space, genuine names win ties,
    and the output names are globally unique."""
    from dedupe_spark.sources.io import with_conflict_free_names

    df = spark.createDataFrame(
        [
            ("f1", "x/a.txt"),
            ("f2", "y/a.txt"),      # would synthesize a_1.txt ...
            ("f3", "z/a_1.txt"),    # ... which this genuine name occupies
        ],
        "file_id string, path string",
    )
    rows = with_conflict_free_names(df).collect()
    out = {r["file_id"]: r["out_name"] for r in rows}
    names = [r["out_name"] for r in rows]
    assert len(set(names)) == len(names), names
    assert out["f1"] == "a.txt"
    assert out["f3"] == "a_1.txt"   # genuine claimant keeps its own name
    assert out["f2"] == "a_1_1.txt"  # renamed row cascades one more round
