"""Unit tests for the standalone dedup strategies' blocking guarantees.

Planted-adversary tests: the simhash pigeonhole layout must find every
pair within the Hamming threshold (the reference's exhaustive O(n²)
popcount loop, duplicate_detector.py:58-87, finds them all — banding is
only allowed to be faster, not lossier).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dedupe_spark.operators.cc import connected_components
from dedupe_spark.operators.dedup import simhash_hamming_pairs


def _signed(v: int) -> int:
    """Unsigned 64-bit literal → Java long (two's complement)."""
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= (1 << 63) else v


def _pairs(spark, sims: dict[str, int], threshold: int) -> set[tuple[str, str]]:
    df = spark.createDataFrame(
        [(k, _signed(v)) for k, v in sims.items()], "id string, simhash long"
    )
    got = simhash_hamming_pairs(df, hamming_threshold=threshold).collect()
    return {(r["id1"], r["id2"]) for r in got}


def test_simhash_pairs_distance_spread_across_old_chunks(spark):
    """d=5 pair whose differing bits land in ≥4 different 16-bit chunks —
    the old fixed 4×16 layout shared no chunk and silently missed it."""
    base = 0x0123456789ABCDEF
    # flip bits 2, 18, 34, 50, 60: one in each 16-bit quarter (+1 extra)
    spread = base ^ ((1 << 2) | (1 << 18) | (1 << 34) | (1 << 50) | (1 << 60))
    sims = {"a": base, "b": spread, "z": ~base & ((1 << 64) - 1)}
    assert ("a", "b") in _pairs(spark, sims, threshold=6)


def test_simhash_pairs_exhaustive_small(spark):
    """Banded blocking == brute force on a planted set, several thresholds."""
    import itertools

    sims = {
        "a": 0x0123456789ABCDEF,
        "b": 0x0123456789ABCDEF ^ 0b111,                      # d=3, one chunk
        "c": 0x0123456789ABCDEF ^ ((1 << 5) | (1 << 25) | (1 << 45) | (1 << 63)),  # d=4 spread
        "d": 0xFEDCBA9876543210,
        "e": 0xFEDCBA9876543210 ^ ((1 << 1) | (1 << 17) | (1 << 33) | (1 << 49) | (1 << 62) | (1 << 13)),  # d=6 spread
        "f": 0x0000000000000000,
    }
    mask = (1 << 64) - 1
    for t in (0, 3, 4, 6, 10):
        brute = {
            tuple(sorted((i, j)))
            for i, j in itertools.combinations(sims, 2)
            if bin((sims[i] ^ sims[j]) & mask).count("1") <= t
        }
        assert _pairs(spark, sims, threshold=t) == brute, f"threshold {t}"


def _truth_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    comps: dict[str, list[str]] = {}
    for v in parent:
        comps.setdefault(find(v), []).append(v)
    return {v: min(vs) for vs in comps.values() for v in vs}


def test_cc_string_ids_label_is_min_original_id(spark):
    """Long-id compaction must re-resolve labels to the min ORIGINAL id —
    ids chosen so lexicographic min ≠ min of any assignment order."""
    edges = [
        ("zz9", "aa1"), ("aa1", "mm5"),          # comp label aa1
        ("bb2", "bb3"),                           # comp label bb2
        ("x1", "x2"), ("x2", "x3"), ("x3", "x4"),  # chain, label x1
    ]
    df = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {
        r["file_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _truth_components(edges)


def test_cc_long_ids_passthrough(spark):
    edges = [(10, 3), (3, 7), (100, 200)]
    df = spark.createDataFrame(edges, "id1 long, id2 long")
    got = {
        r["file_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == {10: 3, 3: 3, 7: 3, 100: 100, 200: 100}


def test_cc_empty_edges_returns_empty(spark):
    df = spark.createDataFrame([], "id1 string, id2 string")
    assert connected_components(df).count() == 0


def test_cc_converges_without_spinning(spark):
    """Empty/converged inputs must break out of the loop, not run all 50
    iterations (the observe() NULL-on-zero-rows regression)."""
    import time

    df = spark.createDataFrame([("a", "b")], "id1 string, id2 string")
    t0 = time.perf_counter()
    connected_components(df, max_iterations=50).collect()
    took = time.perf_counter() - t0
    # 2 propagation iterations; 50 eager checkpoints would take far longer
    assert took < 30, f"CC took {took:.1f}s — convergence check not firing?"


def test_deterministic_split_and_sample(spark):
    """Content-stable split: fractions ~right, stable across calls and
    partitionings, val/test disjoint from train; sample ⊂ corpus."""
    from dedupe_spark.operators.sampling import deterministic_sample, with_split

    docs = spark.range(0, 2000).toDF("doc_id")
    a = with_split(docs, "doc_id").groupBy("split").count().collect()
    b = with_split(docs.repartition(7), "doc_id").groupBy("split").count().collect()
    fa = {r["split"]: r["count"] for r in a}
    assert fa == {r["split"]: r["count"] for r in b}  # partition-invariant
    assert abs(fa["train"] / 2000 - 0.8) < 0.05
    assert abs(fa.get("val", 0) / 2000 - 0.1) < 0.03
    s1 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", rate=0.1).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", rate=0.2).collect()}
    assert s1 <= s2  # rate-monotone (nested samples)
    assert abs(len(s1) / 2000 - 0.1) < 0.03

    import pytest as _pytest

    with _pytest.raises(ValueError):
        with_split(docs, "doc_id", train=0.95, val=0.1)
    with _pytest.raises(ValueError):
        deterministic_sample(docs, "doc_id", rate=0.0)


def test_deterministic_sample_rate_one_is_identity(spark):
    """rate=1.0 must return every row — the 4-hex-char cutoff would format
    as the 5-char '10000' and lexicographically drop ~94% of keys."""
    from dedupe_spark.operators.sampling import deterministic_sample

    docs = spark.range(0, 500).toDF("doc_id")
    assert deterministic_sample(docs, "doc_id", rate=1.0).count() == 500


def test_simhash_pairs_large_threshold_fallback(spark):
    """t ≥ 15 routes to single-block keying; recall must still be exact."""
    import itertools

    sims = {
        "a": 0x0123456789ABCDEF,
        "b": 0x0123456789ABCDEF ^ ((1 << 63) - (1 << 46)) & 0xFFFF000000000000,
        "c": 0x0123456789ABCDEF ^ 0xFFFF,  # d=16, low block
        "d": 0,
    }
    mask = (1 << 64) - 1
    t = 16
    brute = {
        tuple(sorted((i, j)))
        for i, j in itertools.combinations(sims, 2)
        if bin((sims[i] ^ sims[j]) & mask).count("1") <= t
    }
    assert _pairs(spark, sims, threshold=t) == brute


def test_simhash_dedupe_collapses_exact_groups(spark):
    """50 byte-identical docs + a near variant + unrelated docs: identical
    fingerprints enter candidate generation as one super-node, and the
    expanded clusters still put every copy (plus the near variant) in one
    cluster labeled by the min id."""
    from dedupe_spark.operators.dedup import simhash_dedupe

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    rows = [(i, base) for i in range(50)]
    rows += [(60 + i, f"totally different text number {i} about spark plans rows columns shuffle") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r["cluster_id"] for r in simhash_dedupe(df, "doc_id", "text").collect()}
    family = {out[str(i)] for i in range(50)}
    assert family == {"0"}, family          # all copies, labeled by min id
    # the unrelated docs never leak into the exact family
    assert all(out[str(60 + i)] != "0" for i in range(5))


def test_ngram_dedupe_collapses_exact_groups(spark):
    from dedupe_spark.operators.dedup import ngram_jaccard_dedupe

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(i, base) for i in range(30)]
    rows.append((30, base + " iota"))  # high-Jaccard variant
    rows += [(40 + i, f"unrelated words here {i} xi omicron pi rho sigma") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r["cluster_id"]
        for r in ngram_jaccard_dedupe(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert len(out) == 35
    assert {out[i] for i in range(30)} == {0}
    assert out[30] == 0
    assert all(out[40 + i] is None or out[40 + i] >= 40 for i in range(4))


def test_ngram_dedupe_zero_gram_duplicates_stay_null(spark):
    """Byte-identical texts SHORTER than the gram width produce no gram, so
    the uncollapsed closure (and the DuckDB oracle) gives them no pair and
    a null cluster — the exact-group n>=2 shortcut must not cluster them.
    Identical texts WITH grams still cluster through the shortcut."""
    from dedupe_spark.operators.dedup import ngram_jaccard_dedupe

    rows = [
        (0, "solo"), (1, "solo"),              # 1 token < k=2 → no gram
        (2, "alpha beta gamma"), (3, "alpha beta gamma"),  # grams → cluster
        (4, "unrelated totally different words"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r["cluster_id"]
        for r in ngram_jaccard_dedupe(df, "doc_id", "text", k=2, threshold=0.5).collect()
    }
    assert out[0] is None and out[1] is None
    assert out[2] == 2 and out[3] == 2
    assert out[4] is None


def test_ngram_dedupe_weighted_df_cap_matches_uncollapsed(spark):
    """max_df counts DOCUMENTS, not distinct texts: a gram carried by 6
    copies of one text plus 1 other doc has df=7 > cap 5 and must be
    dropped, even though only 2 distinct texts contain it."""
    from dedupe_spark.operators.dedup import ngram_jaccard_dedupe

    hot = "shared common phrase"          # grams: "shared common", "common phrase"
    rows = [(i, hot) for i in range(6)]   # 6 copies → weighted df 6 per gram
    rows.append((10, hot + " tailword"))  # 7th doc carrying the hot grams
    rows += [(20, "aa bb cc dd"), (21, "aa bb cc ee")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["id"]: r["cluster_id"]
        for r in ngram_jaccard_dedupe(
            df, "doc_id", "text", k=2, threshold=0.3, max_df=5
        ).collect()
    }
    # the hot grams are df-capped away for EVERY doc: the exact copies keep
    # no gram → null (matches the uncollapsed oracle); doc 10 keeps only
    # "phrase tailword" → no partner → null
    assert all(out[i] is None for i in range(6)), out
    assert out[10] is None
    # the unaffected docs still pair on their sub-cap grams
    assert out[20] == 20 and out[21] == 20


def test_cc_long_chain_converges_within_cap(spark):
    """A 300-node path graph has diameter 299 — one-hop propagation alone
    would silently exceed the 50-iteration cap and split the component;
    pointer jumping must close it in ~log2(300) rounds."""
    n = 300
    edges = [(f"v{i:04d}", f"v{i+1:04d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {
        r["file_id"]: r["component"]
        for r in connected_components(df, max_iterations=50).collect()
    }
    assert len(got) == n
    assert set(got.values()) == {"v0000"}


def test_cc_random_graphs_match_union_find(spark):
    """Randomized stress: mixed chains/cliques/isolated pairs on shuffled
    string ids must match a pure-Python union-find exactly (labels = min
    original id per component)."""
    import random

    rng = random.Random(7)
    ids = [f"n{i:05d}" for i in range(600)]
    rng.shuffle(ids)
    edges = []
    # random cliques
    pool = ids[:200]
    for c in range(20):
        fam = pool[c * 10 : (c + 1) * 10]
        edges += [(fam[i], fam[i + 1]) for i in range(len(fam) - 1)]
        edges += [(rng.choice(fam), rng.choice(fam)) for _ in range(5)]
    # chains
    chain = ids[200:320]
    edges += [(chain[i], chain[i + 1]) for i in range(len(chain) - 1)]
    # random sparse edges across the rest
    rest = ids[320:]
    edges += [
        (rng.choice(rest), rng.choice(rest)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "id1 string, id2 string")
    got = {
        r["file_id"]: r["component"]
        for r in connected_components(df).collect()
    }
    assert got == _truth_components(edges)


def test_ngram_pairs_default_df_cap_guards_hot_grams(spark):
    """The RAW operator's default must not be silently O(df²) on a stopword
    gram: with > DEFAULT_NGRAM_MAX_DF documents sharing one hot bigram, the
    default path drops it (the planted hot-gram pair vanishes) while
    explicit ``max_df=None`` opts back into the unbounded literal
    semantics. True near-dups on sub-cap grams pair either way."""
    from dedupe_spark.operators.dedup import (
        DEFAULT_NGRAM_MAX_DF,
        ngram_jaccard_pairs,
    )

    n_hot = DEFAULT_NGRAM_MAX_DF + 2
    rows = [(i, f"common gram u{i} v{i}") for i in range(n_hot)]
    rows.append((5000, "common gram"))       # grams: {"common gram"} only
    rows.append((5001, "common gram zz"))    # {"common gram", "gram zz"}
    # ^ jaccard 1/2 = 0.5 — a pair ONLY via the hot gram
    rows += [(6000, "alpha beta gamma delta"), (6001, "alpha beta gamma delta eps")]
    # ^ jaccard 3/4 on cold grams — must pair under the default cap
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=2, threshold=0.5).collect()
    }
    assert (5000, 5001) not in capped
    assert (6000, 6001) in capped

    uncapped = {
        (r["id1"], r["id2"])
        for r in ngram_jaccard_pairs(
            df, "doc_id", "text", k=2, threshold=0.5, max_df=None
        ).collect()
    }
    assert (5000, 5001) in uncapped
    assert (6000, 6001) in uncapped


def _signed_words(v: int, words: int) -> list[int]:
    """Unsigned wide int → little-endian list of Java longs."""
    return [_signed((v >> (64 * w)) & ((1 << 64) - 1)) for w in range(words)]


def _wide_pairs(spark, sims: dict[str, int], threshold: int, bits: int):
    from dedupe_spark.operators.dedup import simhash_hamming_pairs

    words = bits // 64
    df = spark.createDataFrame(
        [(k, _signed_words(v, words)) for k, v in sims.items()],
        "id string, simhash array<long>",
    )
    got = simhash_hamming_pairs(
        df, hamming_threshold=threshold, bits=bits
    ).collect()
    return {(r["id1"], r["id2"]) for r in got}


def test_wide_simhash_pairs_exhaustive_small(spark):
    """128-bit banded blocking == brute force on a planted set, several
    thresholds — including t=5 (7 blocks: bounds straddle the word
    boundary) and diffs split across both words."""
    import itertools

    base = 0x0123456789ABCDEF_FEDCBA9876543210
    sims = {
        "a": base,
        "b": base ^ 0b111,                                   # d=3, low word
        "c": base ^ ((1 << 63) | (1 << 64) | (1 << 65)),     # d=3 across the boundary
        "d": base ^ ((1 << 5) | (1 << 40) | (1 << 70) | (1 << 100) | (1 << 127)),  # d=5 spread
        "e": (1 << 128) - 1,
        "f": 0,
    }
    mask = (1 << 128) - 1
    for t in (0, 3, 5, 10, 16):
        brute = {
            tuple(sorted((i, j)))
            for i, j in itertools.combinations(sims, 2)
            if bin((sims[i] ^ sims[j]) & mask).count("1") <= t
        }
        assert _wide_pairs(spark, sims, t, 128) == brute, f"threshold {t}"


def test_wide_simhash_word0_matches_narrow(spark):
    """Word 0 of the wide fingerprint IS the 64-bit simhash (remix j=0 is
    the identity) — the width dial changes precision, not the base signal."""
    from dedupe_spark.functions.fingerprint import (
        make_simhash_udf,
        make_wide_simhash_udf,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    narrow = make_simhash_udf(3)
    wide = make_wide_simhash_udf(3, 128)
    both = docs.select(
        "doc_id",
        narrow(F.col("text")).alias("n"),
        wide(F.col("text")).alias("w"),
    ).select("doc_id", "n.simhash", F.col("w.simhash").alias("wide"))
    for r in both.collect():
        assert r["wide"][0] == r["simhash"], r["doc_id"]
        assert len(r["wide"]) == 2


def test_simhash_dedupe_128bit_same_clusters_on_planted_corpus(spark):
    """The 128-bit path clusters the planted copy families identically to
    the 64-bit default (identical texts ⇒ identical wide fingerprints;
    distinct families stay apart at either width)."""
    from dedupe_spark.operators.dedup import simhash_dedupe

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "totally different words about unrelated matters entirely xyz"
    rows = [(i, base) for i in range(20)]
    rows += [(40 + i, other) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for bits in (64, 128):
        out = {
            r["id"]: r["cluster_id"]
            for r in simhash_dedupe(df, "doc_id", "text", bits=bits).collect()
        }
        assert {out[str(i)] for i in range(20)} == {"0"}, bits
        assert {out[str(40 + i)] for i in range(5)} == {"40"}, bits


def test_stratified_sample_rates_and_determinism(spark):
    import pytest

    from dedupe_spark.operators.sampling import (
        deterministic_sample,
        stratified_sample,
    )

    rows = [(i, ["en", "de", "fr", "zz"][i % 4]) for i in range(2000)]
    docs = spark.createDataFrame(rows, ["doc_id", "lang"])
    kept = stratified_sample(
        docs, "doc_id", "lang", {"en": 0.5, "de": 1.0, "fr": 0.0},
        default_rate=0.25,
    )
    by_lang = {r["lang"]: r["count"] for r in kept.groupBy("lang").count().collect()}
    assert by_lang["de"] == 500          # rate 1.0 keeps every row
    assert "fr" not in by_lang           # rate 0.0 keeps none
    assert 150 < by_lang["en"] < 350     # ~0.5 of 500
    assert 60 < by_lang["zz"] < 190      # default 0.25 of 500
    # same draw as the unstratified sampler: en@0.5 == Bernoulli(0.5) subset
    en = docs.filter("lang = 'en'")
    assert sorted(
        r["doc_id"] for r in kept.filter("lang = 'en'").collect()
    ) == sorted(
        r["doc_id"] for r in deterministic_sample(en, "doc_id", rate=0.5).collect()
    )
    with pytest.raises(ValueError):
        stratified_sample(docs, "doc_id", "lang", {"en": 1.5})


def test_exact_dedupe_null_text_rows_are_kept_singletons(spark):
    """sha2(NULL) is NULL and inner equi-joins drop NULL keys — null-text
    rows must come back as their own singletons, not vanish."""
    from dedupe_spark.operators.dedup import exact_dedupe

    df = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (4, None)], ["doc_id", "text"]
    )
    out = {r["id"]: r for r in exact_dedupe(df, "doc_id", "text").collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["cluster_size"] == 2 and out[2]["cluster_id"] == 1
    for i in (3, 4):  # each null row is its own cluster
        assert out[i]["cluster_size"] == 1 and out[i]["cluster_id"] == i
        assert out[i]["is_representative"]


def test_min_cluster_size_demotes_small_clusters(spark):
    """min_cluster_size=3: a 2-member exact group must come back as two
    singletons (null cluster_id), while a 3-member group keeps its label."""
    from dedupe_spark.config import PipelineConfig
    from dedupe_spark.operators.dedup import dedup_pipeline

    rows = [("r", f"p{i}", "0", "py", "pair content here") for i in range(2)]
    rows += [("r", f"t{i}", "0", "py", "trio content here") for i in range(3)]
    rows += [("r", "solo", "0", "py", "unique content entirely")]
    files = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    out = dedup_pipeline(files, PipelineConfig(min_cluster_size=3))
    by_path = {r["path"]: r["cluster_id"] for r in out.collect()}
    assert by_path["p0"] is None and by_path["p1"] is None
    assert by_path["t0"] is not None
    assert by_path["t0"] == by_path["t1"] == by_path["t2"]
    assert by_path["solo"] is None

    import pytest as _pytest

    with _pytest.raises(ValueError, match="min_cluster_size"):
        PipelineConfig(min_cluster_size=1)


def test_temperature_sample_closed_form_rates(spark):
    """tau=0.5, budget 50% on a 90/10 corpus: the small source's rate
    caps at 1.0 (keeps ALL rows); the big source's kept set equals a
    python md5 recomputation of the same cutoff."""
    import hashlib
    import math

    from dedupe_spark.operators.sampling import temperature_sample
    import pytest as _pytest

    rows = [(i, "big") for i in range(90)] + [(i, "small") for i in range(90, 100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, "doc_id", "source", tau=0.5, budget_frac=0.5)
    got = {(r["doc_id"], r["source"]) for r in out.collect()}

    z = math.sqrt(90) + math.sqrt(10)
    r_big = round(min(1.0, 0.5 * 100 * math.sqrt(90) / (z * 90)), 6)
    assert round(min(1.0, 0.5 * 100 * math.sqrt(10) / (z * 10)), 6) == 1.0
    cut = format(math.floor(r_big * 65536), "04x")
    expect = {(i, "small") for i in range(90, 100)} | {
        (i, "big")
        for i in range(90)
        if hashlib.md5(str(i).encode()).hexdigest()[:4] < cut
    }
    assert got == expect

    with _pytest.raises(ValueError):
        temperature_sample(df, "doc_id", "source", tau=0.0)
    with _pytest.raises(ValueError):
        temperature_sample(df, "doc_id", "source", budget_frac=1.5)


def test_temperature_sample_null_group_is_own_stratum(spark):
    """NULL group rows must survive with their own computed rate (null-safe
    join), not vanish through an equi-join."""
    from dedupe_spark.operators.sampling import temperature_sample

    rows = [(i, "a") for i in range(4)] + [(100 + i, None) for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    # budget_frac=1.0 -> every rate caps at 1.0 -> identity sample
    out = temperature_sample(df, "doc_id", "source", tau=0.7, budget_frac=1.0)
    assert out.count() == 8
    assert out.filter("source is null").count() == 4


def test_leakage_safe_split_moves_clusters_whole(spark):
    """Rows sharing a group key always land in the same split, the split
    equals the rep's with_split assignment, and singletons are unchanged
    vs plain with_split."""
    from dedupe_spark.operators.sampling import leakage_safe_split, with_split

    rows = [(i, f"g{i % 25}") for i in range(200)]  # 25 clusters of 8
    df = spark.createDataFrame(rows, "doc_id long, k string")
    out = leakage_safe_split(df, "doc_id", "k").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r["k"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_group.values()), "cluster straddles splits"
    # each cluster's split == the rep's (min id = i%25, ids 0..24) own split
    reps = {
        r["doc_id"]: r["split"]
        for r in with_split(df.filter("doc_id < 25"), "doc_id").collect()
    }
    for r in out:
        assert r["split"] == reps[int(r["k"][1:])]


def test_leakage_safe_split_null_group_is_singleton(spark):
    """NULL group keys don't vanish (the SQL null<>null join trap) and
    split as singletons on their own id, matching plain with_split."""
    from dedupe_spark.operators.sampling import leakage_safe_split, with_split

    df = spark.createDataFrame(
        [(1, "g"), (2, "g"), (3, None), (4, None)], "doc_id long, k string"
    )
    out = {r["doc_id"]: r["split"] for r in leakage_safe_split(df, "doc_id", "k").collect()}
    assert len(out) == 4
    solo = {
        r["doc_id"]: r["split"]
        for r in with_split(df.filter("k IS NULL"), "doc_id").collect()
    }
    assert out[3] == solo[3] and out[4] == solo[4]
    assert out[1] == out[2]  # the real cluster still moves whole
