"""CLI smoke tests: analyze mode, partial-stage runs (--until), resume
continuation, and the fingerprint-granularity knobs.

Mirrors the reference's two entry points: `dedupe` (full organize run,
dedupe.py:100-250) and `analyze` (report-only, dedupe.py:253-306)."""

from __future__ import annotations

import json
import os

import pytest

from jobs.run_pipeline import main


@pytest.fixture(scope="module")
def docs_parquet(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("docs") / "documents.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(60).write.parquet(p)
    return p


def _last_json(capsys) -> dict:
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out[-1])


def test_analyze_until_labels_reports_without_output(docs_parquet, capsys, tmp_path):
    wh = str(tmp_path / "wh")
    rc = main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli1", "--until", "labels", "--analyze", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    assert rep["until"] == "labels"
    assert rep["dry_run"] is True
    assert set(rep["stage_rows"]) == {
        "fingerprints", "exact", "buckets", "edges", "labels"
    }
    # no assignment table yet — partial run stops where told
    assert not os.path.exists(os.path.join(wh, "cli1", "assignment"))


def test_resume_continues_from_partial_run(docs_parquet, capsys, tmp_path):
    wh = str(tmp_path / "wh")
    main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli2", "--until", "edges", "--analyze", "--quiet",
    ])
    capsys.readouterr()
    rc = main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli2", "--analyze", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    # stages up to `edges` were checkpointed by the first run → skipped
    for s in ["fingerprints", "exact", "buckets", "edges"]:
        assert rep["stages_ran"][s] is False, s
    for s in ["labels", "assignment"]:
        assert rep["stages_ran"][s] is True, s
    assert rep["analyze"] is True and rep["total_files"] == 60


def test_fingerprint_knobs_validated(docs_parquet, tmp_path):
    with pytest.raises(ValueError, match="bands"):
        main([
            "--input", docs_parquet, "--documents",
            "--warehouse", str(tmp_path / "wh"),
            "--bands", "7", "--rows", "4", "--quiet",
        ])


def test_output_writes_survivors(docs_parquet, capsys, tmp_path):
    """Full run with --output writes the survivors table (representatives
    + singletons) — the reference's organize step as a table write."""
    wh, out = str(tmp_path / "wh"), str(tmp_path / "out")
    rc = main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli3", "--output", out, "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    surv = spark.read.parquet(out)
    assert surv.count() == rep["total_files"] - (
        rep["files_in_groups"] - rep["duplicate_groups"]
    )


def test_error_artifact_written_and_counted(capsys, tmp_path, spark):
    """Error parity with the reference's error log (dedupe.py:147-182): a
    run over a corpus with degenerate rows writes a {run_id}/errors table
    whose rows match the report's error count and type frequencies."""
    src = str(tmp_path / "docs.parquet")
    good = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    bad = spark.createDataFrame(
        [(9001, "", "en", "synthetic"), (9002, "   ", "en", "synthetic")],
        "doc_id long, text string, lang string, source string",
    )
    good.select("doc_id", "text", "lang", "source").unionByName(bad).write.parquet(src)

    wh = str(tmp_path / "wh")
    rc = main([
        "--input", src, "--documents", "--warehouse", wh,
        "--run-id", "cli5", "--analyze", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    assert rep["error_rows"] == 2
    assert sum(rep["top_errors"].values()) == 2
    err_tbl = spark.read.parquet(os.path.join(wh, "cli5", "errors"))
    assert err_tbl.count() == 2
    assert set(err_tbl.columns) == {"file_id", "repo", "path", "error"}
    got_types = {r["error"] for r in err_tbl.select("error").distinct().collect()}
    assert got_types == set(rep["top_errors"])


def test_dry_run_does_not_write_errors_table(capsys, tmp_path, spark):
    """--dry-run must not mutate warehouse report artifacts: the error
    frequencies still appear in the report (computed in-memory) but no
    {run_id}/errors table is written — a dry run can never clobber a prior
    real run's error artifact for the same run_id."""
    src = str(tmp_path / "docs.parquet")
    good = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    bad = spark.createDataFrame(
        [(9001, "", "en", "synthetic")],
        "doc_id long, text string, lang string, source string",
    )
    good.select("doc_id", "text", "lang", "source").unionByName(bad).write.parquet(src)

    wh = str(tmp_path / "wh")
    rc = main([
        "--input", src, "--documents", "--warehouse", wh,
        "--run-id", "cli6", "--dry-run", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    assert rep["error_rows"] == 1
    assert sum(rep["top_errors"].values()) == 1
    assert not os.path.exists(os.path.join(wh, "cli6", "errors"))


def test_rep_order_quality_selects_highest_quality_member(capsys, tmp_path, spark):
    """--rep-order quality routes W5: within a duplicate cluster the
    representative is the member with the highest text-quality score."""
    import pyspark.sql.functions as F

    from dedupe_spark.operators.textstats import quality_score_col

    src = str(tmp_path / "docs.parquet")
    base = ("the quick brown fox jumps over the lazy dog and keeps going "
            "with many common words of the usual kind in a long sentence")
    rows = [
        (1, base, "en", "s"),
        (2, base + " !!!! ???? @@@@ ####", "en", "s"),   # punct-penalized copy
        (3, base + " extended with further prose to raise the value of "
            "the length and word scores in the quality formula", "en", "s"),
        (4, "unrelated tiny", "en", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).write.parquet(src)

    wh = str(tmp_path / "wh")
    rc = main([
        "--input", src, "--documents", "--warehouse", wh, "--run-id", "cli6",
        "--analyze", "--quiet", "--rep-order", "quality", "--jaccard", "0.5",
    ])
    assert rc == 0
    res = spark.read.parquet(os.path.join(wh, "cli6", "assignment"))
    clustered = res.filter(F.col("cluster_id").isNotNull()).withColumn(
        "q", quality_score_col(F.col("content"))
    )
    got = clustered.select("path", "q", "is_representative").collect()
    assert len(got) >= 2  # the near-family clustered
    best = max(got, key=lambda r: (r["q"], r["path"]))
    reps = [r for r in got if r["is_representative"]]
    assert len(reps) == 1 and reps[0]["path"] == best["path"], got


def test_update_mode_appends_batch(docs_parquet, capsys, tmp_path, spark):
    """--update appends the input as a new batch to an existing run."""
    wh = str(tmp_path / "wh")
    main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli4", "--analyze", "--quiet",
    ])
    capsys.readouterr()
    more = str(tmp_path / "more.parquet")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .filter("doc_id >= 400").write.parquet(more)
    rc = main([
        "--input", more, "--documents", "--warehouse", wh,
        "--run-id", "cli4", "--update", "--analyze", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    assert rep["total_files"] > 60  # original 60 + appended batch
    assert rep["stages_ran"]["fingerprints_appended"] > 0


def test_rebucket_cli_mode(docs_parquet, capsys, tmp_path, spark):
    """--rebucket rebuilds only the buckets stage from a committed run,
    prints a before/after report, and needs no --input."""
    wh = str(tmp_path / "wh")
    main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "rb1", "--quiet",
    ])
    capsys.readouterr()
    rc = main([
        "--warehouse", wh, "--run-id", "rb1", "--rebucket", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)["rebucket"]
    assert rep["buckets_after"] > 0
    assert rep["stale_hot_after"] == 0
    # --input is required for every non-rebucket mode
    with pytest.raises(SystemExit, match="--input"):
        main(["--warehouse", wh, "--run-id", "rb1", "--quiet"])


def test_flat_output_suffixes_colliding_basenames(capsys, tmp_path, spark):
    """--flat-output e2e: survivors land in ONE flat table and planted
    basename collisions carry _k-suffixed out_names (reference
    file_organizer.py:194-224)."""
    src = str(tmp_path / "files.parquet")
    rows = [
        ("r1", "a/dup.py", "c0", "python", "alpha beta gamma delta " * 5),
        ("r2", "b/dup.py", "c0", "python", "totally different content words " * 5),
        ("r3", "c/only.py", "c0", "python", "third unrelated content here " * 5),
    ]
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(src)

    wh, out = str(tmp_path / "wh"), str(tmp_path / "out")
    rc = main([
        "--input", src, "--warehouse", wh, "--run-id", "cli7",
        "--output", out, "--flat-output", "--quiet",
    ])
    assert rc == 0
    got = spark.read.parquet(out)
    names = {r["out_name"] for r in got.collect()}
    assert names == {"dup.py", "dup_1.py", "only.py"}
    assert not any(d.startswith("lang=") for d in os.listdir(out))


def test_advise_mode_reports_without_mutating(docs_parquet, capsys, tmp_path):
    """--advise prints the incremental-vs-rebuild recommendation and exits
    without touching the warehouse."""
    wh = str(tmp_path / "wh")
    main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli9", "--analyze", "--quiet",
    ])
    capsys.readouterr()
    manifest_before = open(os.path.join(wh, "_snapshots.json")).read()
    rc = main([
        "--input", docs_parquet, "--documents", "--warehouse", wh,
        "--run-id", "cli9", "--advise", "--quiet",
    ])
    assert rc == 0
    rep = _last_json(capsys)
    # re-submitting the whole corpus as a batch = 100% ratio -> rebuild
    assert rep["advice"]["recommendation"] == "rebuild"
    assert rep["advice"]["corpus_rows"] == 60
    assert open(os.path.join(wh, "_snapshots.json")).read() == manifest_before
