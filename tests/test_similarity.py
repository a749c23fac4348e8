"""Similarity-search tests: exact top-k sanity, ANN recall vs brute force,
embedding near-dedup clustering on planted vector families."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    embedding_dedupe,
    embedding_dup_pairs,
)


@pytest.fixture(scope="module")
def vectors(spark):
    """60 vectors in 5 tight clusters + 10 isotropic noise vectors."""
    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for c in range(5):
        center = rng.standard_normal(16) * 3
        for _ in range(10):
            v = center + rng.standard_normal(16) * 0.05
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    for _ in range(10):
        rows.append((vid, [float(x) for x in rng.standard_normal(16)], -1))
        vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).cache()


def test_topk_finds_cluster_mates(vectors):
    out = cosine_topk(vectors.filter("vec_id = 0"), vectors, k=9)
    mates = {r["n_id"] for r in out.collect()}
    assert mates == set(range(1, 10))  # cluster 0 = ids 0..9


def test_topk_rank_deterministic(vectors):
    a = cosine_topk(vectors.limit(5), vectors, k=5).collect()
    b = cosine_topk(vectors.limit(5), vectors, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ann_recall_vs_bruteforce(vectors):
    queries = vectors.filter("vec_id < 20")
    exact = cosine_topk(queries, vectors, k=5).collect()
    approx = ann_lsh_topk(
        queries, vectors, k=5, dim=16, n_planes=8, n_tables=6
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r["q_id"], set()).add(r["n_id"])
    got = {}
    for r in approx:
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    recalls = [
        len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_embedding_dedupe_clusters_match_labels(vectors):
    out = embedding_dedupe(vectors, threshold=0.999)
    labels = {r["label"]: set() for r in vectors.collect()}
    cluster_of = {r["id"]: r["cluster_id"] for r in out.collect()}
    truth = {r["vec_id"]: r["label"] for r in vectors.collect()}
    for vid, lab in truth.items():
        labels[lab].add(cluster_of[vid])
    for c in range(5):  # each tight cluster → exactly one non-null cluster id
        assert len(labels[c]) == 1 and None not in labels[c], (c, labels[c])


def test_dup_pairs_triangular_and_thresholded(vectors):
    pairs = embedding_dup_pairs(vectors, threshold=0.998)
    rows = pairs.collect()
    assert all(r["id1"] < r["id2"] for r in rows)
    assert all(r["cos"] >= 0.998 for r in rows)
    # every surviving pair is intra-cluster (ids 0..49 in blocks of 10)
    label = {r["vec_id"]: r["label"] for r in vectors.collect()}
    assert all(
        label[r["id1"]] == label[r["id2"]] and label[r["id1"]] >= 0 for r in rows
    )
    assert len(rows) >= 200  # near-complete intra-cluster coverage (max 225)


def test_dup_pairs_lsh_tier_matches_exact(vectors):
    """Forcing the corpus over the broadcast guard routes to the LSH tier;
    on tight clusters (cos ≥ 0.998) its recall vs the exact tier is ~1."""
    exact = {
        (r["id1"], r["id2"])
        for r in embedding_dup_pairs(vectors, threshold=0.998).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in embedding_dup_pairs(
            vectors, threshold=0.998, max_broadcast_rows=1
        ).collect()
    }
    assert lsh <= exact  # rerank is exact → no false positives
    assert len(lsh & exact) / len(exact) >= 0.95, (len(lsh), len(exact))


def test_no_unbounded_collect_in_similarity_module():
    """The only .collect() in the engine must sit behind the broadcast
    guard (grep-level regression for the driver-OOM scale hazard)."""
    import inspect

    import dedupe_spark.operators.similarity as sim

    src = inspect.getsource(sim)
    before_guard, _, after_guard = src.partition("max_broadcast_rows:")
    assert ".collect()" not in before_guard


def test_dup_pairs_empty_corpus(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert embedding_dup_pairs(empty).count() == 0


def test_ivf_empty_corpus_returns_empty(spark):
    """Empty corpus (or an empty training sample) must yield an empty
    result, not an axis-1 norm crash on a 0-d array."""
    from dedupe_spark.operators.similarity import ivf_topk

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = ivf_topk(empty, empty, k=5)
    assert out.count() == 0
    assert set(out.columns) == {"q_id", "n_id", "cos", "rank"}


def test_ivf_recall_vs_bruteforce(vectors):
    from dedupe_spark.operators.similarity import ivf_topk

    queries = vectors.filter("vec_id < 20")
    exact = cosine_topk(queries, vectors, k=5).collect()
    approx = ivf_topk(queries, vectors, k=5, n_cells=8, n_probe=3).collect()
    truth, got = {}, {}
    for r in exact:
        truth.setdefault(r["q_id"], set()).add(r["n_id"])
    for r in approx:
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    recalls = [len(truth[q] & got.get(q, set())) / len(truth[q]) for q in truth]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_full_probe_is_exact(vectors):
    """n_probe == n_cells degenerates to exact search — same top-k sets."""
    from dedupe_spark.operators.similarity import ivf_topk

    queries = vectors.filter("vec_id in (0, 25, 60)")
    exact = {(r["q_id"], r["n_id"]) for r in cosine_topk(queries, vectors, k=5).collect()}
    full = {
        (r["q_id"], r["n_id"])
        for r in ivf_topk(queries, vectors, k=5, n_cells=4, n_probe=4).collect()
    }
    assert full == exact


def test_null_embedding_rejected_loudly(spark, vectors):
    """Arrow collect path: ListArray.flatten() silently drops null rows —
    a null embedding must raise naming the column, never misalign ids."""
    bad = vectors.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id bigint, embedding array<double>"
        )
    )
    with pytest.raises(Exception, match="embedding.*null"):
        embedding_dup_pairs(bad, threshold=0.95).collect()


def test_ragged_embedding_rejected_loudly(spark, vectors):
    """Ragged vector lengths whose total happens to divide the row count
    would silently misalign in the reshape — must raise instead."""
    bad = vectors.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [(901, [1.0] * 8), (902, [1.0] * 24)],
            "vec_id bigint, embedding array<double>",
        )
    )
    with pytest.raises(Exception, match="ragged"):
        embedding_dup_pairs(bad, threshold=0.95).collect()


def test_semdedup_prunes_planted_clusters(vectors):
    """Each 10-member tight cluster (cos ≈ 1 within, ≈ noise across) must
    collapse to exactly one kept member; noise vectors stay singletons."""
    from dedupe_spark.operators.similarity import semdedup

    out = semdedup(vectors, threshold=0.95, n_cells=5).cache()
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 60
    labels = {r["vec_id"]: r["label"] for r in vectors.collect()}
    # every planted cluster keeps exactly one member
    for c in range(5):
        members = [i for i in rows if labels[i] == c]
        kept = [i for i in members if rows[i]["keep"]]
        assert len(kept) == 1, f"cluster {c}: kept {kept}"
        # all members share one cluster_id = min member id
        cids = {rows[i]["cluster_id"] for i in members}
        assert cids == {min(members)}
    # noise vectors: singletons, always kept
    for i in rows:
        if labels[i] == -1:
            assert rows[i]["cluster_id"] is None and rows[i]["keep"]


def test_semdedup_keep_rule_lowest_centroid_sim(vectors):
    """The kept member of each duplicate group is the argmin of cent_sim
    (ties by min id) — the SemDeDup 'most marginal example' rule."""
    from dedupe_spark.operators.similarity import semdedup

    out = semdedup(vectors, threshold=0.95, n_cells=5).collect()
    groups: dict = {}
    for r in out:
        if r["cluster_id"] is not None:
            groups.setdefault(r["cluster_id"], []).append(r)
    assert groups
    for cid, members in groups.items():
        kept = [r for r in members if r["keep"]]
        assert len(kept) == 1
        expect = min(members, key=lambda r: (r["cent_sim"], r["id"]))
        assert kept[0]["id"] == expect["id"]


def test_semdedup_deterministic(vectors):
    from dedupe_spark.operators.similarity import semdedup

    a = sorted(map(tuple, semdedup(vectors, threshold=0.95, n_cells=5).collect()))
    b = sorted(map(tuple, semdedup(vectors, threshold=0.95, n_cells=5).collect()))
    assert a == b


def test_semdedup_empty_corpus(spark):
    from dedupe_spark.operators.similarity import semdedup

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert semdedup(empty).count() == 0


def test_semdedup_exact_direction_supernodes(spark):
    """Scalar multiples share a direction (cosine exactly 1): a 50-copy
    clique plus one noisy near-dup must come out as ONE cluster labeled by
    the min id, with pairing done over direction reps (the super-node
    collapse) — and a lone scalar-pair with no external edges still
    clusters via the dir-group >= 2 rule."""
    import numpy as np

    from dedupe_spark.operators.similarity import semdedup

    rng = np.random.default_rng(11)
    base = rng.standard_normal(16)
    other = rng.standard_normal(16) * 2
    rows = [(i, [float(x) for x in base * (1.0 + 0.01 * i)]) for i in range(50)]
    rows.append((50, [float(x) for x in base + rng.standard_normal(16) * 0.01]))
    rows += [(60, [float(x) for x in other]), (61, [float(x) for x in other * 3.5])]
    rows.append((70, [float(x) for x in rng.standard_normal(16)]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    # n_cells=1: a single cell removes k-means placement from the test —
    # with so few distinct directions a larger k can legitimately put the
    # noisy near-dup in its own cell (the paper's documented cross-cell
    # miss), which is not what this test is about.
    out = {r["id"]: r for r in semdedup(df, threshold=0.95, n_cells=1).collect()}
    assert {out[i]["cluster_id"] for i in range(51)} == {0}
    assert sum(1 for i in range(51) if out[i]["keep"]) == 1
    assert out[60]["cluster_id"] == 60 and out[61]["cluster_id"] == 60
    assert out[70]["cluster_id"] is None and out[70]["keep"]


def test_train_centroids_survives_zero_rate_sample(spark):
    """When train_sample_rows/n rounds the md5 cutoff to ZERO kept rows
    (corpus more than ~65k x the sample budget), training must fall back
    to a deterministic bounded take instead of returning None — a None
    makes semdedup/ivf silently return EMPTY results for a non-empty
    corpus."""
    from pyspark.sql import functions as F

    from dedupe_spark.operators.similarity import _train_centroids, semdedup_assign

    n = 70_000  # rate = 1/70000 -> int(rate * 65536) == 0
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 7).cast("float"), ((F.col("id") + 1) % 5).cast("float")
        ).alias("embedding"),
    )
    cents = _train_centroids(
        df, id_col="vec_id", vec_col="embedding", n_cells=4,
        train_sample_rows=1, seed=42,
    )
    assert cents is not None and len(cents) >= 1
    assigned = semdedup_assign(
        df, n_cells=4, train_sample_rows=1, seed=42
    )
    assert assigned.count() == n


def test_hard_negatives_excludes_same_label_and_nulls(spark):
    """Every mined negative has a different, non-null label; ranking is
    by cosine within the different-label set; null-labeled queries mine
    nothing."""
    from pyspark.sql import functions as F

    from dedupe_spark.operators.similarity import hard_negatives

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.14], 0),   # same label: must never appear for q=0
        (2, [0.9, 0.44], 1),    # closest different-label
        (3, [0.0, 1.0], 1),     # orthogonal different-label
        (4, [0.95, 0.31], None),  # null label: neither negative nor query
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = hard_negatives(
        df.filter(F.col("vec_id").isin(0, 4)), df, k=2
    ).collect()
    got = [(r["q_id"], r["n_id"], r["rank"]) for r in out]
    assert got == [(0, 2, 1), (0, 3, 2)]  # q=4 (null label) mines nothing
    assert all(r["n_label"] is not None for r in out)


def test_quantize_roundtrip_error_bounded(vectors):
    """Dequantized values are within scale/2 of the originals (the int8
    lattice guarantee), q fits [-127, 127], zero vectors -> scale 0."""
    from dedupe_spark.operators.similarity import quantize_embeddings

    orig = {r["vec_id"]: r["embedding"] for r in vectors.collect()}
    for r in quantize_embeddings(vectors).collect():
        s, q = r["scale"], r["qvec"]
        assert all(-127 <= x <= 127 for x in q)
        assert s > 0  # fixture has no zero vectors
        for x, qi in zip(orig[r["vec_id"]], q):
            assert abs(x - qi * s) <= s / 2 + 1e-12


def test_quantize_zero_vector(spark):
    from dedupe_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]), (1, [1.0, -2.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert out[0]["scale"] == 0.0 and out[0]["qvec"] == [0, 0, 0]
    # max-abs element lands exactly on ±127 (clamp catches floor(127.5))
    assert out[1]["qvec"][1] == -127
    assert out[1]["qvec"][0] == 64  # 1.0 / (2/127) = 63.5 -> half-up 64


def test_quantized_topk_recall_vs_exact(vectors):
    """INT8 top-10 recalls >=90% of the exact float top-10 per query on
    the clustered fixture (the ScaNN-regime claim the docstring makes)."""
    from dedupe_spark.operators.similarity import cosine_topk, quantized_topk

    queries = vectors.filter("vec_id IN (0, 10, 20, 30, 40)")
    exact = cosine_topk(queries, vectors, k=10).collect()
    quant = quantized_topk(queries, vectors, k=10).collect()
    by_q_exact, by_q_quant = {}, {}
    for r in exact:
        by_q_exact.setdefault(r["q_id"], set()).add(r["n_id"])
    for r in quant:
        by_q_quant.setdefault(r["q_id"], set()).add(r["n_id"])
    assert set(by_q_quant) == set(by_q_exact)
    for qid, ex in by_q_exact.items():
        recall = len(ex & by_q_quant[qid]) / len(ex)
        assert recall >= 0.9, f"query {qid} recall {recall}"


def test_topk_ops_survive_zero_and_nan_vectors(spark):
    """Zero-norm vectors (padding / failed encodes) must not abort the
    job under ANSI mode, and NaN-component vectors must not outrank real
    matches — across all three brute-force top-k ops."""
    from dedupe_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
        quantized_topk,
    )

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.9, 0.44], 1),
        (2, [0.0, 1.0], 1),
        (3, [0.0, 0.0], 1),            # zero norm: DIVIDE_BY_ZERO trap
        (4, [float("nan"), 1.0], 1),   # NaN: sorts above every real cos
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    q = df.filter("vec_id = 0")
    for op in (cosine_topk, quantized_topk):
        got = [(r["n_id"], r["rank"]) for r in op(q, df, k=4).collect()]
        assert got == [(1, 1), (2, 2)], f"{op.__name__}: {got}"
    got = [(r["n_id"], r["rank"]) for r in hard_negatives(q, df, k=4).collect()]
    assert got == [(1, 1), (2, 2)]
    # zero-norm / NaN QUERY vectors mine nothing rather than crashing
    bad_q = df.filter("vec_id IN (3, 4)")
    assert cosine_topk(bad_q, df, k=4).count() == 0
