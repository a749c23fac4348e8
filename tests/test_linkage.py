"""Fuzzy record linkage: planted-duplicate clustering, skew guard,
null handling, and blocking-metric arithmetic on closed-form inputs."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.linkage import (
    blocking_metrics,
    candidate_pairs,
    link_records,
    score_pairs,
)


def _people(spark):
    # two planted duplicate families inside block A, one cross-block
    # near-pair that blocking must NOT link, singletons elsewhere
    rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),   # lev 1 from #1
        (3, "A", "jonathan smyth"),   # lev 1 from #1, lev 2 from #2
        (4, "A", "maria garcia"),
        (5, "A", "mariah garcia"),    # lev 1 from #4
        (6, "B", "jonathan smith"),   # identical name, different block
        (7, "B", "completely other"),
        (8, "C", None),               # null compare value -> singleton
        (9, "C", "zzz"),
    ]
    return spark.createDataFrame(rows, "rid int, blk string, name string")


def test_link_records_planted_clusters(spark):
    out = link_records(
        _people(spark),
        id_col="rid",
        block_cols=["blk"],
        compare_col="name",
        max_distance=2,
    )
    got = {r["id"]: r for r in out.collect()}
    assert len(got) == 9  # every record present, including the null-name row
    assert got[1]["cluster_id"] == got[2]["cluster_id"] == 1
    assert got[3]["cluster_id"] == 1 and got[1]["cluster_size"] == 3
    assert got[4]["cluster_id"] == got[5]["cluster_id"] == 4
    # same name, different block: blocking must keep 6 out of cluster 1
    for rid in (6, 7, 8, 9):
        assert got[rid]["cluster_id"] is None
        assert got[rid]["cluster_size"] is None
        assert got[rid]["is_representative"] is None
    assert got[1]["is_representative"] is True
    assert got[2]["is_representative"] is False


def test_score_pairs_over_threshold_is_dropped_not_negative(spark):
    # bounded levenshtein returns -1 past the threshold; the filter must
    # not let -1 through as "<= max_distance"
    pairs = spark.createDataFrame(
        [(1, 2, "aaaaaaaaaa", "bbbbbbbbbb"), (3, 4, "abc", "abd")],
        "id1 int, id2 int, left_val string, right_val string",
    )
    got = score_pairs(pairs, max_distance=2).collect()
    assert [(r["id1"], r["id2"], r["distance"]) for r in got] == [(3, 4, 1)]


def test_candidate_pairs_skew_guard_drops_hot_block(spark):
    rows = [(i, "hot", f"v{i}") for i in range(50)] + [
        (100, "cold", "x"),
        (101, "cold", "y"),
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, name string")
    # hot_block_window=None restores the hard-drop (r4) behavior
    got = candidate_pairs(
        df, id_col="rid", block_cols=["blk"], compare_col="name",
        max_block=10, hot_block_window=None,
    ).collect()
    assert [(r["id1"], r["id2"]) for r in got] == [(100, 101)]
    # and with the guard off, the hot block pairs in full: C(50,2) + 1
    n = candidate_pairs(
        df, id_col="rid", block_cols=["blk"], compare_col="name",
        max_block=None,
    ).count()
    assert n == 50 * 49 // 2 + 1


def test_candidate_pairs_hot_block_snm_fallback(spark):
    """Over-cap blocks degrade to sorted-neighborhood candidates instead
    of the r4 recall cliff (zero pairs). Near-identical values sort
    adjacently, so the planted near-dups inside the hot block must still
    pair; pair volume stays O(n·w), never C(n,2)."""
    hot = [(i, "hot", f"name{i:04d}") for i in range(60)]
    # planted near-dups: adjacent in the (blk, name) sort order
    hot += [(200, "hot", "name0007x"), (201, "hot", "name0031x")]
    cold = [(100, "cold", "x"), (101, "cold", "y")]
    df = spark.createDataFrame(
        hot + cold, "rid int, blk string, name string"
    )
    pairs = candidate_pairs(
        df, id_col="rid", block_cols=["blk"], compare_col="name",
        max_block=10, hot_block_window=3,
    )
    got = pairs.collect()
    keyset = {(r["id1"], r["id2"]) for r in got}
    # cold path untouched
    assert (100, 101) in keyset
    # the planted near-dups are window-adjacent -> candidates exist
    assert (7, 200) in keyset and (31, 201) in keyset
    # id1 < id2 orientation holds even though SNM orients by rank
    assert all(r["id1"] < r["id2"] for r in got)
    # every fallback pair stays inside the hot block (no seam pairs):
    # both endpoint ids belong to the hot block's id set
    hot_ids = {r[0] for r in hot}
    for r in got:
        if r["from_hot_block"]:
            assert r["id1"] in hot_ids and r["id2"] in hot_ids
    # O(n·w) bound: 62 hot rows, window 3 -> < 62*2 hot pairs, vs C(62,2)
    n_hot = sum(1 for r in got if r["from_hot_block"])
    assert 0 < n_hot < 62 * 2
    # left/right values follow their ids after reorientation
    by_pair = {(r["id1"], r["id2"]): r for r in got}
    assert by_pair[(7, 200)]["left_val"] == "name0007"
    assert by_pair[(7, 200)]["right_val"] == "name0007x"


def test_link_records_finds_matches_in_hot_block(spark):
    """End-to-end: matches inside an over-cap block survive linkage via
    the SNM fallback + global-CC routing (r4's What's-wrong #3)."""
    # doubled index keeps consecutive sort-neighbors >= lev 2 apart
    # (plain nameNNNN would chain the whole block at max_distance=1)
    hot = [(i, "hot", f"{i:04d}name{i:04d}") for i in range(60)]
    hot += [(200, "hot", "0007name0007x")]  # lev 1 from rid 7's value
    cold = [(100, "cold", "abc"), (101, "cold", "abd")]
    df = spark.createDataFrame(
        hot + cold, "rid int, blk string, name string"
    )
    out = link_records(
        df, id_col="rid", block_cols=["blk"], compare_col="name",
        max_distance=1, max_block=10, hot_block_window=3,
    )
    got = {r["id"]: r for r in out.collect()}
    # cold-block pair links via the per-block solver
    assert got[100]["cluster_id"] == got[101]["cluster_id"] == 100
    # hot-block planted match links via the fallback path
    assert got[7]["cluster_id"] == got[200]["cluster_id"] == 7
    assert got[7]["is_representative"] is True
    # everything else in the hot block stays singleton (lev > 1 apart)
    assert got[8]["cluster_id"] is None


def test_blocking_metrics_closed_form(spark):
    # truth groups: {1,2,3}, {4,5}, {6} -> true pairs = 3 + 1 = 4
    # blocks:       {1,2,4,5}, {3,6}    -> candidate pairs = 6 + 1 = 7
    # co-blocked true pairs: (1,2), (4,5) -> 2
    rows = [
        (1, "t1", "b1"),
        (2, "t1", "b1"),
        (3, "t1", "b2"),
        (4, "t2", "b1"),
        (5, "t2", "b1"),
        (6, "t3", "b2"),
    ]
    df = spark.createDataFrame(rows, "rid int, truth string, blk string")
    m = blocking_metrics(df, truth_cols=["truth"], block_cols=["blk"]).first()
    assert m["n_records"] == 6
    assert m["total_pairs"] == 15.0
    assert m["candidate_pairs"] == 7.0
    assert m["true_pairs"] == 4.0
    assert m["covered_true_pairs"] == 2.0
    assert m["reduction_ratio"] == round(1 - 7 / 15, 6)
    assert m["pairs_completeness"] == 0.5
    assert m["pairs_quality"] == round(2 / 7, 6)


def test_blocking_metrics_no_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "rid int, truth string, blk string"
    )
    m = blocking_metrics(df, truth_cols=["truth"], block_cols=["blk"]).first()
    assert m["candidate_pairs"] == 0.0 and m["true_pairs"] == 0.0
    assert m["pairs_completeness"] is None and m["pairs_quality"] is None
    assert m["reduction_ratio"] == 1.0


def test_merge_clusters_rules(spark):
    from dedupe_spark.operators.linkage import merge_clusters

    recs = spark.createDataFrame(
        [
            # cluster 1 = {1, 2, 3}
            (1, "bob", "12 main street", "555", 10.0),
            (2, "ann", "12 main st", "777", 30.0),
            (3, "cal", None, "777", 20.0),
            # singleton 4
            (4, "dee", "x", None, -5.0),
        ],
        "rid int, name string, addr string, phone string, bal double",
    )
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, None)], "id int, cluster_id int"
    )
    got = {
        r["entity_id"]: r
        for r in merge_clusters(
            recs,
            assign,
            id_col="rid",
            rules={
                "name": "min",
                "addr": "longest",
                "phone": "mode",
                "bal": "max",
            },
        ).collect()
    }
    assert set(got) == {1, 4}
    g1 = got[1]
    assert g1["n_members"] == 3
    assert g1["name"] == "ann"              # min
    assert g1["addr"] == "12 main street"   # longest non-null
    assert g1["phone"] == "777"             # mode (2 of 3)
    assert g1["bal"] == 30.0                # max
    g4 = got[4]
    assert g4["n_members"] == 1 and g4["phone"] is None and g4["bal"] == -5.0


def test_merge_clusters_tie_breaks_and_all_null(spark):
    from dedupe_spark.operators.linkage import merge_clusters

    recs = spark.createDataFrame(
        [(1, "bb", "q"), (2, "aa", "p"), (3, None, None)],
        "rid int, s string, t string",
    )
    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id int, cluster_id int"
    )
    row = merge_clusters(
        recs, assign, id_col="rid", rules={"s": "longest", "t": "mode"}
    ).first()
    # equal lengths / equal counts -> smallest value, deterministically
    assert row["s"] == "aa"
    assert row["t"] == "p"

    # all-null attribute stays null rather than erroring
    recs2 = spark.createDataFrame([(1, None), (2, None)], "rid int, s string")
    assign2 = spark.createDataFrame([(1, 1), (2, 1)], "id int, cluster_id int")
    for rule in ("longest", "mode", "min", "max"):
        assert (
            merge_clusters(recs2, assign2, id_col="rid", rules={"s": rule})
            .first()["s"]
            is None
        )


def test_merge_clusters_rejects_unknown_rule(spark):
    import pytest

    from dedupe_spark.operators.linkage import merge_clusters

    recs = spark.createDataFrame([(1, "a")], "rid int, s string")
    assign = spark.createDataFrame([(1, None)], "id int, cluster_id int")
    with pytest.raises(ValueError, match="rule for 's'"):
        merge_clusters(recs, assign, id_col="rid", rules={"s": "latest"})


def test_partitioned_components_matches_global_cc(spark):
    """Per-block union-find must reproduce connected_components exactly
    (labels included) on a multi-block graph with chain, star, and
    singleton-edge shapes — chains are the worst case the per-block
    solver exists to shortcut."""
    import random

    from dedupe_spark.operators.cc import (
        connected_components,
        partitioned_components,
    )

    rng = random.Random(7)
    edges = []
    # block 0: one long chain (diameter = 60) with shuffled string ids
    ids = [f"v{rng.randrange(10**6):06d}" for _ in range(61)]
    edges += [("b0", a, b) for a, b in zip(ids, ids[1:])]
    # block 1: a star + an isolated pair
    edges += [("b1", "hub", f"leaf{i}") for i in range(5)]
    edges += [("b1", "px", "py")]
    # block 2: two triangles sharing nothing
    edges += [("b2", x, y) for x, y in [("t1", "t2"), ("t2", "t3"), ("t1", "t3"),
                                        ("u1", "u2"), ("u2", "u3"), ("u1", "u3")]]
    df = spark.createDataFrame(edges, "blk string, id1 string, id2 string")

    got = {
        r["file_id"]: r["component"]
        for r in partitioned_components(df, key_cols=["blk"]).collect()
    }
    want = {
        r["file_id"]: r["component"]
        for r in connected_components(df, compact=False).collect()
    }
    assert got == want
    # and the chain really is one component labeled by its min id
    assert len({got[i] for i in ids}) == 1
    assert got[ids[0]] == min(ids)


def test_partitioned_components_empty_edges(spark):
    from dedupe_spark.operators.cc import partitioned_components

    df = spark.createDataFrame([], "blk string, id1 string, id2 string")
    assert partitioned_components(df, key_cols=["blk"]).count() == 0


def test_linkage_plan_is_jvm_only(spark):
    """The hot path (pairing + scoring) must stay in codegen: no
    BatchEvalPython / cartesian product in the physical plan."""
    edges = score_pairs(
        candidate_pairs(
            _people(spark),
            id_col="rid",
            block_cols=["blk"],
            compare_col="name",
        ),
        max_distance=2,
    )
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_link_incremental_equals_one_shot(spark):
    from dedupe_spark.operators.linkage import link_incremental

    old_rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),
        (4, "A", "maria garcia"),
        (7, "B", "zz top"),
    ]
    new_rows = [
        (3, "A", "jonathan smyth"),   # joins cluster {1,2}
        (5, "A", "mariah garcia"),    # joins 4
        (8, "B", "aa bottom"),        # singleton
    ]
    schema = "rid int, blk string, name string"
    old_df = spark.createDataFrame(old_rows, schema)
    new_df = spark.createDataFrame(new_rows, schema)
    kw = dict(id_col="rid", block_cols=["blk"], compare_col="name",
              max_distance=2)
    prior = link_records(old_df, **kw)
    inc = link_incremental(old_df, new_df, prior, **kw)
    one_shot = link_records(old_df.unionByName(new_df), **kw)
    assert sorted(map(tuple, inc.collect())) == sorted(
        map(tuple, one_shot.collect())
    )


def test_link_incremental_bridges_two_old_clusters(spark):
    from dedupe_spark.operators.linkage import link_incremental

    # two separate old clusters {1,2} and {5,6}; the new record 9 is
    # within distance of BOTH -> everything must merge transitively
    old_rows = [
        (1, "A", "aaaa"),
        (2, "A", "aaab"),
        (5, "A", "aadd"),
        (6, "A", "aade"),
    ]
    new_rows = [(9, "A", "aabd")]  # lev 2 to aaab AND to aadd
    schema = "rid int, blk string, name string"
    old_df = spark.createDataFrame(old_rows, schema)
    new_df = spark.createDataFrame(new_rows, schema)
    kw = dict(id_col="rid", block_cols=["blk"], compare_col="name",
              max_distance=2)
    prior = link_records(old_df, **kw)
    got = {r["id"]: r for r in
           link_incremental(old_df, new_df, prior, **kw).collect()}
    assert {got[i]["cluster_id"] for i in (1, 2, 5, 6, 9)} == {1}
    assert got[1]["cluster_size"] == 5
    one_shot = {r["id"]: r["cluster_id"] for r in
                link_records(old_df.unionByName(new_df), **kw).collect()}
    assert all(one_shot[i] == 1 for i in (1, 2, 5, 6, 9))


def test_link_incremental_resubmission_is_idempotent(spark):
    from dedupe_spark.operators.linkage import link_incremental

    schema = "rid int, blk string, name string"
    old_df = spark.createDataFrame(
        [(1, "A", "aaaa"), (2, "A", "aaab")], schema
    )
    kw = dict(id_col="rid", block_cols=["blk"], compare_col="name",
              max_distance=2)
    prior = link_records(old_df, **kw)
    # the "new" batch contains only rows that already exist
    again = link_incremental(old_df, old_df, prior, **kw)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, prior.collect())
    )


def test_link_incremental_no_links_anywhere(spark):
    from dedupe_spark.operators.linkage import link_incremental

    schema = "rid int, blk string, name string"
    old_df = spark.createDataFrame(
        [(1, "A", "aaaaaaaa"), (2, "B", "zzzzzzzz")], schema
    )
    new_df = spark.createDataFrame([(3, "C", "qqqqqqqq")], schema)
    kw = dict(id_col="rid", block_cols=["blk"], compare_col="name",
              max_distance=1)
    prior = link_records(old_df, **kw)  # all singletons -> no star edges
    got = {r["id"]: r for r in
           link_incremental(old_df, new_df, prior, **kw).collect()}
    assert set(got) == {1, 2, 3}
    assert all(got[i]["cluster_id"] is None for i in got)


def test_mutual_best_links_planted(spark):
    from dedupe_spark.operators.linkage import mutual_best_links

    rows = [
        # a1's best is b1 (0.9) and b1's best is a1 -> kept
        (1, 101, 0.9), (1, 102, 0.5),
        # a2's best is b1 (0.8) but b1 prefers a1 -> dropped
        (2, 101, 0.8),
        # a3/b3 mutual at 0.7 -> kept
        (3, 103, 0.7),
        # tie on score for a4: partners 104/105 -> smaller id wins; 104's
        # best is a4 -> kept; 105 loses its only candidate
        (4, 104, 0.6), (4, 105, 0.6),
    ]
    df = spark.createDataFrame(rows, "id1 int, id2 int, sim double")
    got = {(r["id1"], r["id2"]) for r in
           mutual_best_links(df, score_col="sim").collect()}
    assert got == {(1, 101), (3, 103), (4, 104)}


def test_cluster_edge_stats_clique_vs_chain(spark):
    import pytest

    from dedupe_spark.operators.linkage import cluster_edge_stats

    assign = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (12, 10), (99, None)],
        "id int, cluster_id int",
    )
    edges = spark.createDataFrame(
        # cluster 1: triangle (clique); cluster 10: chain 10-11-12
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)],
        "id1 int, id2 int",
    )
    got = {r["cluster_id"]: r for r in
           cluster_edge_stats(assign, edges).collect()}
    assert got[1]["n_edges"] == 3 and got[1]["is_clique"]
    assert got[1]["density"] == 1.0
    assert got[10]["n_edges"] == 2 and not got[10]["is_clique"]
    assert got[10]["density"] == pytest.approx(2 / 3, abs=1e-6)
    assert None not in got and 99 not in got


def test_evaluate_blocking_schemes_labels_and_rejects_empty(spark):
    import pytest

    from dedupe_spark.operators.linkage import evaluate_blocking_schemes

    df = spark.createDataFrame(
        [("t1", "a", "x"), ("t1", "a", "y"), ("t2", "b", "x")],
        "truth string, blk1 string, blk2 string",
    )
    out = evaluate_blocking_schemes(
        df, truth_cols=["truth"],
        schemes={"s1": ["blk1"], "s2": ["blk2"]},
    )
    got = {r["scheme"]: r for r in out.collect()}
    assert set(got) == {"s1", "s2"}
    # truth pair (rows 1,2) co-blocks under blk1 (a,a) but not blk2 (x,y)
    assert got["s1"]["pairs_completeness"] == 1.0
    assert got["s2"]["pairs_completeness"] == 0.0
    with pytest.raises(ValueError, match="schemes"):
        evaluate_blocking_schemes(df, truth_cols=["truth"], schemes={})


def test_constraints_must_and_cannot_link(spark):
    from dedupe_spark.operators.linkage import apply_constraints

    edges = spark.createDataFrame([(1, 2), (3, 2)], "id1 int, id2 int")
    must = spark.createDataFrame([(5, 4)], "id1 int, id2 int")   # reversed
    cannot = spark.createDataFrame([(2, 3)], "id1 int, id2 int")
    got = {(r["id1"], r["id2"]) for r in apply_constraints(
        edges, must_link=must, cannot_link=cannot).collect()}
    assert got == {(1, 2), (4, 5)}  # (2,3) removed, (4,5) canonicalized


def test_link_records_with_constraints_cross_block_merge(spark):
    rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),
        (6, "B", "jonathan smith"),   # other block: normally unlinked
        (9, "A", "zzz"),
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, name string")
    must = spark.createDataFrame([(1, 6)], "id1 int, id2 int")
    cannot = spark.createDataFrame([(1, 2)], "id1 int, id2 int")
    got = {r["id"]: r for r in link_records(
        df, id_col="rid", block_cols=["blk"], compare_col="name",
        max_distance=2, must_link=must, cannot_link=cannot,
    ).collect()}
    # must-link merges across blocks; cannot-link severs the typo edge
    assert got[1]["cluster_id"] == got[6]["cluster_id"] == 1
    assert got[2]["cluster_id"] is None
    assert got[9]["cluster_id"] is None


def test_constrained_components_blocks_indirect_path(spark):
    """Closure-level cannot-link: A–C stay separated despite the A–B–C
    path; the WEAKEST edge on the connecting path is the one cut."""
    from dedupe_spark.operators.linkage import constrained_components

    # chain 1–2 (strong, d=1), 2–3 (weak, d=2); cannot(1,3)
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 2.0)], "id1 int, id2 int, d double"
    )
    cannot = spark.createDataFrame([(3, 1)], "id1 int, id2 int")  # reversed
    got = {
        r["file_id"]: r["component"]
        for r in constrained_components(
            edges, cannot, evidence_col="d", ascending=True
        ).collect()
    }
    assert got[1] == got[2] == 1  # strong edge kept
    assert got[3] == 3            # weak edge cut -> 3 isolated
    # flip the evidence: now 2–3 is the strong edge, 1 gets isolated
    edges2 = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 1.0)], "id1 int, id2 int, d double"
    )
    got2 = {
        r["file_id"]: r["component"]
        for r in constrained_components(
            edges2, cannot, evidence_col="d", ascending=True
        ).collect()
    }
    assert got2[2] == got2[3] == 2 and got2[1] == 1


def test_constrained_components_untouched_components_keep_labels(spark):
    from dedupe_spark.operators.linkage import constrained_components

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (10, 11, 1.0), (11, 12, 1.0)],
        "id1 int, id2 int, d double",
    )
    cannot = spark.createDataFrame([(1, 2)], "id1 int, id2 int")
    got = {
        r["file_id"]: r["component"]
        for r in constrained_components(
            edges, cannot, evidence_col="d"
        ).collect()
    }
    # direct cannot-link edge: pair split, both isolated
    assert got[1] == 1 and got[2] == 2
    # unrelated component untouched (fast path, no re-solve)
    assert got[10] == got[11] == got[12] == 10


def test_link_records_closure_mode_separates_indirect_pair(spark):
    """cannot_link_mode='closure' vs the default edge mode on the same
    A–C–B chain: edge mode (documented) leaves the indirect pair
    together; closure mode guarantees separation."""
    rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),   # lev 1 from #1, lev 2 from #3
        (3, "A", "jonathon smyth"),   # lev 1 from #2, lev 2 from #1
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, name string")
    cannot = spark.createDataFrame([(1, 3)], "id1 int, id2 int")
    kw = dict(
        id_col="rid", block_cols=["blk"], compare_col="name",
        max_distance=2, cannot_link=cannot,
    )
    edge_mode = {r["id"]: r for r in link_records(df, **kw).collect()}
    # edge mode: direct 1–3 edge severed, but 1–2–3 path reconnects
    assert edge_mode[1]["cluster_id"] == edge_mode[3]["cluster_id"] == 1
    closure = {
        r["id"]: r
        for r in link_records(
            df, cannot_link_mode="closure", **kw
        ).collect()
    }
    assert closure[1]["cluster_id"] != closure[3]["cluster_id"] or (
        closure[1]["cluster_id"] is None and closure[3]["cluster_id"] is None
    )
    # lev(1,2)=1 beats lev(2,3)=1? both are distance 1 — but lev(1,3)=2
    # is within threshold too, and is the weakest path edge; with all
    # closure guarantees the constraint holds:
    assert not (
        closure[1]["cluster_id"] is not None
        and closure[1]["cluster_id"] == closure[3]["cluster_id"]
    )
    # a node isolated by the re-split reads as a singleton (nulls)
    for rid in (1, 2, 3):
        r = closure[rid]
        if r["cluster_id"] is None:
            assert r["cluster_size"] is None
            assert r["is_representative"] is None


def test_link_records_closure_mode_must_link_and_cannot(spark):
    rows = [
        (1, "A", "jonathan smith"),
        (2, "A", "jonathon smith"),
        (6, "B", "jonathan smith"),
    ]
    df = spark.createDataFrame(rows, "rid int, blk string, name string")
    must = spark.createDataFrame([(1, 6)], "id1 int, id2 int")
    cannot = spark.createDataFrame([(2, 6)], "id1 int, id2 int")
    got = {
        r["id"]: r
        for r in link_records(
            df, id_col="rid", block_cols=["blk"], compare_col="name",
            max_distance=2, must_link=must, cannot_link=cannot,
            cannot_link_mode="closure",
        ).collect()
    }
    # must-link (strongest evidence) processed first: 1+6 merge; the
    # 1–2 typo edge would put 2 and 6 together -> skipped (cannot wins)
    assert got[1]["cluster_id"] == got[6]["cluster_id"] == 1
    assert got[2]["cluster_id"] is None


def test_link_records_rejects_bad_cannot_link_mode(spark):
    df = spark.createDataFrame(
        [(1, "A", "x")], "rid int, blk string, name string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cannot_link_mode"):
        link_records(
            df, id_col="rid", block_cols=["blk"], compare_col="name",
            cannot_link_mode="transitive",
        )


def test_assignment_churn_all_statuses(spark):
    from dedupe_spark.operators.linkage import assignment_churn

    old = spark.createDataFrame(
        [(1, 1), (2, 1), (3, None), (4, None), (5, 5), (6, 5), (9, None)],
        "id int, cluster_id int",
    )
    new = spark.createDataFrame(
        # 3 joins cluster 1; 5/6 dissolve; 7 appears; 9 gone; 1/2 stable
        [(1, 1), (2, 1), (3, 1), (4, None), (5, None), (6, None), (7, None)],
        "id int, cluster_id int",
    )
    got = {r["id"]: r["status"] for r in assignment_churn(old, new).collect()}
    assert got == {
        1: "unchanged", 2: "unchanged", 3: "clustered", 4: "unchanged",
        5: "unclustered", 6: "unclustered", 7: "added", 9: "removed",
    }


def test_relational_evidence_counts_shared_distinct_neighbors(spark):
    from dedupe_spark.operators.linkage import relational_evidence

    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id1 int, id2 int")
    rel = spark.createDataFrame(
        # 1 and 2 share n1, n2 (n2 duplicated on id 1 -> still counts once)
        [(1, "n1"), (1, "n2"), (1, "n2"), (2, "n1"), (2, "n2"), (2, "n9"),
         (3, "nz")],
        "id int, neighbor string",
    )
    got = {(r["id1"], r["id2"]): r["shared_neighbors"]
           for r in relational_evidence(pairs, rel).collect()}
    assert got == {(1, 2): 2, (1, 3): 0}
