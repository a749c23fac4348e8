"""run_linkage.py CLI e2e: all three comparators, incremental update,
golden-record fusion, and validation errors."""

from __future__ import annotations

import json

import pytest

from jobs.run_linkage import main


@pytest.fixture(scope="module")
def entities_parquet(spark, tmp_path_factory):
    rows = [
        (1, "A", "jonathan smith", "s1"),
        (2, "A", "jonathon smith", "s1"),
        (3, "A", "jonathan smyth", "s2"),
        (4, "A", "maria garcia", "s3"),
        (5, "A", "mariah garcia", "s3"),
        (6, "B", "jonathan smith", "s1"),
        (7, "B", "completely other", "s4"),
    ]
    p = str(tmp_path_factory.mktemp("ents") / "entities.parquet")
    spark.createDataFrame(
        rows, "rid int, blk string, name string, seg string"
    ).write.parquet(p)
    return p


def _report(capsys) -> dict:
    out = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    return json.loads(out[-1])


def test_levenshtein_run_with_merge(entities_parquet, capsys, tmp_path, spark):
    wh = str(tmp_path / "wh")
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "lv1",
        "--merge", "name=longest,seg=mode", "--quiet",
    ])
    assert rc == 0
    rep = _report(capsys)
    assert rep["n_entities"] == 7
    assert rep["n_clusters"] == 2          # {1,2,3} and {4,5}
    assert rep["n_clustered_rows"] == 5
    assert rep["n_golden"] == 4            # 2 merged + 2 singletons (6,7)
    golden = {r["entity_id"]: r for r in spark.read.parquet(
        f"{wh}/lv1/golden").collect()}
    assert golden[1]["n_members"] == 3
    assert golden[4]["seg"] == "s3"


def test_jaro_winkler_run(entities_parquet, capsys, tmp_path):
    wh = str(tmp_path / "wh")
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--comparator", "jaro_winkler",
        "--min-similarity", "0.93", "--warehouse", wh, "--run-id", "jw1",
        "--quiet",
    ])
    assert rc == 0
    rep = _report(capsys)
    assert rep["n_clusters"] >= 2 and rep["n_assigned"] == 7


def test_fellegi_em_run(entities_parquet, capsys, tmp_path):
    wh = str(tmp_path / "wh")
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--comparator", "fellegi", "--fs-fields", "name,seg",
        "--fs-threshold", "3.0", "--warehouse", wh, "--run-id", "fs1",
        "--quiet",
    ])
    assert rc == 0
    rep = _report(capsys)
    # exact-name agreement within block A: none share BOTH name+seg
    # except... name must agree exactly for FS; only near-typos here, so
    # clusters come only from (name agree) pairs — none are identical in
    # block A; assert the run completes with a valid shape instead
    assert rep["n_assigned"] == 7 and rep["n_entities"] == 7


def test_update_links_new_batch(entities_parquet, capsys, tmp_path, spark):
    wh = str(tmp_path / "wh")
    main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "up1",
        "--quiet",
    ])
    capsys.readouterr()
    batch = str(tmp_path / "batch.parquet")
    spark.createDataFrame(
        [(8, "B", "completely othar", "s4")],
        "rid int, blk string, name string, seg string",
    ).write.parquet(batch)
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "up1",
        "--update", batch, "--quiet",
    ])
    assert rc == 0
    rep = _report(capsys)
    assert rep["comparator"] == "update"
    assert rep["n_entities"] == 8
    assign = {r["id"]: r["cluster_id"] for r in spark.read.parquet(
        f"{wh}/up1/assignment").collect()}
    assert assign[7] == 7 and assign[8] == 7  # 8 joined 7's cluster


def test_validation_errors(entities_parquet, tmp_path):
    wh = str(tmp_path / "wh")
    with pytest.raises(SystemExit):
        main([entities_parquet, "--id-col", "rid", "--block-cols", "blk",
              "--warehouse", wh, "--run-id", "x"])  # no compare-col
    with pytest.raises(SystemExit):
        main([entities_parquet, "--id-col", "rid", "--block-cols", "blk",
              "--comparator", "fellegi", "--warehouse", wh,
              "--run-id", "x"])  # no fs-fields
    with pytest.raises(SystemExit):
        main([entities_parquet, "--id-col", "rid", "--block-cols", "blk",
              "--compare-col", "name", "--merge", "badspec",
              "--warehouse", wh, "--run-id", "x"])


def test_second_update_keeps_first_batch(entities_parquet, capsys, tmp_path, spark):
    """Regression: a second --update must extend the CATALOG's entities
    (including batch 1), not the original --input."""
    wh = str(tmp_path / "wh")
    base = [entities_parquet, "--id-col", "rid", "--block-cols", "blk",
            "--compare-col", "name", "--warehouse", wh, "--run-id", "u2",
            "--quiet"]
    main(base)
    schema = "rid int, blk string, name string, seg string"
    b1 = str(tmp_path / "b1.parquet")
    spark.createDataFrame([(8, "C", "first batch row", "s")], schema
                          ).write.parquet(b1)
    main(base + ["--update", b1])
    b2 = str(tmp_path / "b2.parquet")
    spark.createDataFrame([(9, "C", "first batch rowX", "s")], schema
                          ).write.parquet(b2)
    capsys.readouterr()
    rc = main(base + ["--update", b2])
    assert rc == 0
    rep = _report(capsys)
    assert rep["n_entities"] == 9  # 7 base + batch1 + batch2
    assign = {r["id"]: r["cluster_id"] for r in spark.read.parquet(
        f"{wh}/u2/assignment").collect()}
    # 9 links to 8 (lev 1) — possible only if batch 1 survived
    assert assign[8] == 8 and assign[9] == 8


def test_report_density_writes_qa_table(entities_parquet, capsys, tmp_path, spark):
    wh = str(tmp_path / "wh")
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "dq1",
        "--report-density", "--quiet",
    ])
    assert rc == 0
    rep = _report(capsys)
    assert rep["n_scored_clusters"] == 2
    dens = {r["cluster_id"]: r for r in spark.read.parquet(
        f"{wh}/dq1/density").collect()}
    # cluster {1,2,3}: edges (1,2),(1,3),(2,3)? 2-3 is lev 3 -> chain of 2
    assert dens[1]["n_members"] == 3
    assert dens[4]["n_members"] == 2 and dens[4]["is_clique"]


def test_report_density_rejected_for_update_and_jw(entities_parquet, tmp_path):
    wh = str(tmp_path / "wh")
    with pytest.raises(SystemExit):
        main([entities_parquet, "--id-col", "rid", "--block-cols", "blk",
              "--compare-col", "name", "--comparator", "jaro_winkler",
              "--warehouse", wh, "--run-id", "x", "--report-density"])


def test_constraint_overrides_via_cli(entities_parquet, capsys, tmp_path, spark):
    wh = str(tmp_path / "wh")
    must = str(tmp_path / "must.parquet")
    cannot = str(tmp_path / "cannot.parquet")
    spark.createDataFrame([(1, 6)], "id1 int, id2 int").write.parquet(must)
    spark.createDataFrame([(4, 5)], "id1 int, id2 int").write.parquet(cannot)
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "c1",
        "--must-link", must, "--cannot-link", cannot, "--quiet",
    ])
    assert rc == 0
    assign = {r["id"]: r["cluster_id"] for r in spark.read.parquet(
        f"{wh}/c1/assignment").collect()}
    assert assign[6] == 1          # cross-block must-link honored
    assert assign[4] is None and assign[5] is None  # cannot-link severed
    with pytest.raises(SystemExit):
        main([entities_parquet, "--id-col", "rid", "--block-cols", "blk",
              "--compare-col", "name", "--comparator", "jaro_winkler",
              "--warehouse", wh, "--run-id", "c2", "--must-link", must])


def test_closure_cannot_link_via_cli(entities_parquet, tmp_path, spark):
    """--cannot-link-mode closure separates a pair connected only via an
    indirect path (1–2 and 1–3 edges; cannot(2,3))."""
    wh = str(tmp_path / "wh")
    cannot = str(tmp_path / "cannot.parquet")
    spark.createDataFrame([(2, 3)], "id1 int, id2 int").write.parquet(cannot)
    # default edge mode: 2 and 3 stay co-clustered through 1
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "e1",
        "--cannot-link", cannot, "--quiet",
    ])
    assert rc == 0
    edge = {r["id"]: r["cluster_id"] for r in spark.read.parquet(
        f"{wh}/e1/assignment").collect()}
    assert edge[2] == edge[3] == 1
    rc = main([
        entities_parquet, "--id-col", "rid", "--block-cols", "blk",
        "--compare-col", "name", "--warehouse", wh, "--run-id", "e2",
        "--cannot-link", cannot, "--cannot-link-mode", "closure", "--quiet",
    ])
    assert rc == 0
    clo = {r["id"]: r["cluster_id"] for r in spark.read.parquet(
        f"{wh}/e2/assignment").collect()}
    assert clo[1] == clo[2] == 1 and clo[3] is None
