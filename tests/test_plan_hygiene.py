"""Physical-plan hygiene gates (SURVEY §4): filters reach the parquet scan,
JVM-expressible paths contain no Python eval, small dims broadcast, and the
pair-scoring Hamming kernel is codegen'd — asserted on the executed plans so
regressions fail loudly instead of silently costing 10× at scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedupe_spark.plans.queries import registry

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    q = registry()["pricing_summary"][0](spark, SF)
    plan = _plan(q)
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters"
    )[1][:200]


def test_column_pruning_reaches_scan(spark):
    q = registry()["lang_histogram"][0](spark, SF)
    plan = _plan(q)
    # documents has 5 columns; the scan must read only `lang`
    read = plan.split("ReadSchema")[1][:120]
    assert "lang" in read and "text" not in read


def test_jvm_only_queries_have_no_python_eval(spark):
    for name in [
        "token_count",
        "text_quality",
        "lang_id",
        "binary_metadata",
        "span_dedupe",
    ]:
        plan = _plan(registry()[name][0](spark, SF))
        assert "EvalPython" not in plan, f"{name} fell off the JVM path"


def test_small_dimension_broadcasts(spark):
    plan = _plan(registry()["top_customers"][0](spark, SF))
    assert "BroadcastHashJoin" in plan


def test_scoring_hamming_is_codegen(spark):
    """bit_count(xor) must live inside WholeStageCodegen, not a UDF."""
    from dedupe_spark.operators.scoring import score_pairs

    pairs = spark.createDataFrame([("a", "b")], ["id1", "id2"])
    fp = spark.createDataFrame(
        [("a", 3, [1, 2], "s1"), ("b", 5, [1, 3], "s2")],
        "file_id string, simhash long, minhash_sig array<int>, content_sha string",
    )
    plan = _plan(
        score_pairs(
            pairs, fp, hamming_threshold=10, jaccard_threshold=0.7, require_agreement=2
        )
    )
    # bit_count is a JVM expression; the only Python node allowed is the
    # Arrow-batched jaccard UDF (never row-at-a-time BatchEvalPython)
    assert "bit_count" in plan
    assert "BatchEvalPython" not in plan


def test_representative_uses_partial_agg_not_window(spark):
    """q_representative must be a groupBy struct-min (map-side partial
    aggregation), never a row_number window over ~5 lang partitions —
    a low-cardinality window serializes 1/|langs| of the table per task."""
    plan = _plan(registry()["representative"][0](spark, SF))
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


def test_conflict_suffix_window_key_is_high_cardinality(spark):
    """The conflict window must partition by the name slug too, not just
    (source, lang) — the reference's conflict key is per-filename."""
    plan = _plan(registry()["conflict_suffix"][0](spark, SF))
    assert "Window" in plan
    head = plan.split("Window")[1][:400]
    # the name-slug expression (regexp_replace over the text prefix) must be
    # part of the windowspec partition key, not just the projection
    assert "regexp_replace" in head, head


def test_vocab_topk_uses_take_ordered(spark):
    """top-k must be TakeOrderedAndProject (per-partition heaps merged at
    the driver), never a global sort of the full vocabulary."""
    plan = _plan(registry()["vocab_topk"][0](spark, SF))
    assert "TakeOrderedAndProject" in plan


def test_row_dedupe_prunes_to_needed_columns(spark):
    """The 11-column lineitem scan must read only the 3 columns the dedup
    hashes — column pruning is the difference between scanning 100 TB and
    scanning a 3-column projection of it."""
    plan = _plan(registry()["row_dedupe_stats"][0](spark, SF))
    read = plan.split("ReadSchema")[1][:250]
    assert "l_suppkey" in read and "l_extendedprice" not in read


def test_lsh_bucket_sizing_is_partial_agg_not_window(spark):
    """Bucket sizes must come from a groupBy (map-side partial agg) +
    broadcast join-back of the hot list — a count window over the raw
    bucket key would shuffle every occurrence of a degenerate hot bucket
    into ONE task before salting can split it."""
    from dedupe_spark.operators.blocking import lsh_buckets

    fp = spark.createDataFrame(
        [(f"f{i}", i, [i % 3, (i + 1) % 3]) for i in range(20)],
        "file_id string, simhash long, band_keys array<long>",
    )
    plan = _plan(lsh_buckets(fp, max_bucket_size=4, bucket_salt=4))
    assert "Window" not in plan, plan[:900]
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_ngram_df_cap_is_partial_agg_not_window(spark):
    """The df-cap must never window-partition by gram (hot stopword grams
    are exactly the rows that would pile into one task); the only windows
    allowed are the per-doc lead() shingle windows."""
    plan = _plan(registry()["ngram_jaccard_pairs"][0](spark, SF))
    assert "windowspecdefinition(gram" not in plan, plan[:900]
    # the cap is an aggregation + broadcast anti join-back
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_scan_warnings_total_is_broadcast_not_window(spark):
    """The corpus total must reach rows via a broadcast join of a 1-row
    aggregate — an empty-partitionBy window would serialize the table."""
    plan = _plan(registry()["scan_warnings"][0](spark, SF))
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_candidate_pairs_has_no_join(spark):
    """Candidate linking must be lead() over ONE sorted window pass — a
    rank self-join on the bucket key materializes sum(bucket_n^2) rows
    before the rank-range predicate can prune (an inequality can't be a
    join key), which at a salted bucket cap of 2000 is 4M intermediate
    rows per bucket. Exactly two exchanges are allowed: the window sort
    and the pair groupBy."""
    from dedupe_spark.operators.blocking import candidate_pairs

    buckets = spark.createDataFrame(
        [(i % 3, i % 5, 0, f"f{i}", i * 7) for i in range(60)],
        "band_id int, band_hash long, salt int, file_id string, simhash long",
    )
    plan = _plan(candidate_pairs(buckets, neighbors_per_band=4, hamming_prefilter=10))
    assert "Join" not in plan, plan[:900]
    assert "Window" in plan and plan.count("Exchange") <= 2, plan[:900]


def test_cross_dedupe_broadcasts_reference_no_cartesian(spark):
    """cross_dedupe's scale contract: the reference side (sha set, band
    keys, signatures) is BROADCAST — the corpus never shuffles on sha or
    band key — and no tier degenerates to a cartesian product."""
    plan = _plan(registry()["cross_dedupe"][0](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan[:900]


def test_semdedup_pairs_are_cell_equijoin_not_cartesian(spark):
    """semdedup's within-cell pairing must be a hash equi-join on the cell
    id (the k-means partition IS the blocking step) — never a global
    cross join over the corpus."""
    plan = _plan(registry()["semdedup"][0](spark, SF))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


# Queries whose plan legitimately contains a BroadcastNestedLoopJoin: each is
# a broadcast cross of 1-row aggregate totals (the A2 "share of corpus"
# shape), where a nested-loop over one broadcast row is the CHEAPEST possible
# physical join — not a scale risk. Anything else showing a BNLJ means an
# equi-join key was lost (e.g. a join condition Catalyst couldn't extract).
_ONE_ROW_BNLJ_OK = {
    "row_dedupe_stats",
    "group_stats",
    "space_saved",
    "scan_warnings",
    "pipeline_f1",
    "small_quantity_revenue",
    "ann_recall",
    "lm_score",
    "temperature_sample",
    "meta_blocking",  # WEP threshold: 1-row mean broadcast over the edges
    # term-frequency normalizer: 1-row total broadcast over the
    # VOCABULARY-sized count table (value_frequencies)
    "fs_tf_match_pairs",
    # not a 1-row total but still intentional: brute-force exact top-k IS
    # all-pairs by definition — the tiny query side broadcasts against one
    # corpus scan; ann_topk / ivf_topk are the bounded scale path.
    "knn_cosine",
    # same brute-force broadcast shape as knn_cosine, with the label
    # disagreement folded into the join predicate
    "hard_negatives",
    # knn_cosine's shape over the INT8 lattice — deliberately brute-force;
    # the quantized ANN tier is the bounded scale path
    "quantized_knn",
}


def test_registry_wide_no_cartesian_no_rowwise_python(spark):
    """Every registered query, one gate: a CartesianProduct anywhere is an
    instant fail (O(n²) at 100 TB); BroadcastNestedLoopJoin only on the
    allowlisted 1-row-total queries; and the only Python eval node ever
    allowed is ArrowEvalPython — BatchEvalPython (row-at-a-time pickling)
    must not exist in ANY plan. Sweeping the whole registry means a new
    query cannot silently ship a scale-killer plan."""
    bad: list[str] = []
    for name, (fn, _sql) in sorted(registry().items()):
        plan = _plan(fn(spark, SF))
        if "CartesianProduct" in plan:
            bad.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in _ONE_ROW_BNLJ_OK:
            bad.append(f"{name}: BroadcastNestedLoopJoin (not allowlisted)")
        if "BatchEvalPython" in plan:
            bad.append(f"{name}: BatchEvalPython (row-at-a-time Python)")
    assert not bad, "\n".join(bad)
