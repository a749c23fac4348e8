"""Embedding similarity search + embedding-cosine near-dedup.

The reference has no vector operators (FAISS was considered and rejected,
/root/reference/PLAN.md:91-97); a training-data engine needs them, so these
are first-class here:

  * ``cosine_topk``          — brute-force exact top-k (the correctness
                               baseline; cross join + window).
  * ``ann_lsh_topk``         — random-hyperplane LSH bucketing; candidates
                               share a signature prefix bucket, rerank
                               exactly within buckets. The scale path: the
                               cross join never materializes, the join is a
                               hash equi-join on the bucket key.
  * ``ivf_topk``             — inverted-file ANN: k-means coarse quantizer
                               trained on a bounded deterministic sample,
                               cell-id equi-join + exact rerank.
  * ``embedding_dup_pairs``  — cosine ≥ τ pairs (id1 < id2).
  * ``embedding_dedupe``     — those pairs fed to connected components →
                               near-duplicate clusters.

Cosine math stays JVM-side: ``F.zip_with`` + ``F.aggregate`` compile to
codegen'd loops over the array column — no Python in the pair loop.
Hyperplane signatures are computed in one Arrow-batched pandas UDF
(numpy matmul per batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


def _list_column_matrix(vec_arr, n_rows: int, col_name: str) -> np.ndarray:
    """Arrow list column → (n_rows, dim) float64 matrix, loudly validated.

    ``ListArray.flatten()`` silently DROPS null rows, so a corpus with any
    null embedding would either crash in the reshape or — when the sizes
    happen to divide — silently misalign ids with vectors. Ragged rows with
    a divisible total would misalign the same way. Both are rejected here
    with the offending column named; the copy is required because Arrow
    buffers are read-only and callers normalize in place.
    """
    if vec_arr.null_count:
        raise ValueError(
            f"column {col_name!r} contains {vec_arr.null_count} null "
            "vectors; drop or impute them before similarity search"
        )
    import pyarrow.compute as pc

    lens = pc.unique(pc.list_value_length(vec_arr)).to_pylist()
    if len(lens) > 1:
        raise ValueError(
            f"column {col_name!r} has ragged vector lengths {sorted(lens)}; "
            "embeddings must share one dimension"
        )
    flat = vec_arr.flatten().to_numpy(zero_copy_only=False)
    assert n_rows == 0 or flat.size == n_rows * lens[0]
    return np.array(flat, dtype=np.float64, copy=True).reshape(n_rows, -1)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<double> columns (JVM-side).

    NULL when either vector has zero norm: a zero vector has no direction,
    and under Spark 4's ANSI default the unguarded division would abort
    the WHOLE job with DIVIDE_BY_ZERO the moment one padding/failed-encode
    row appears (CASE WHEN is lazy, so the guard really prevents the
    division). NaN components propagate to a NaN cosine; ranking consumers
    drop both via :func:`_rank_topk`.
    """
    den = _norm(a) * _norm(b)
    return F.when(den == 0, F.lit(None).cast("double")).otherwise(
        _dot(a, b) / den
    )


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn(vec_col, F.col(vec_col).cast("array<double>"))


def _rank_topk(scored: DataFrame, k: int, *, extra: tuple = ()) -> DataFrame:
    """Shared tail of every top-k operator: drop unrankable cosines (NULL
    from zero-norm vectors, NaN from NaN components — NaN would otherwise
    sort ABOVE every real match in the descending window), then rank per
    query with the deterministic (cos desc, n_id asc) order and cut at k.
    """
    ranked = scored.filter(F.col("cos").isNotNull() & ~F.isnan("cos"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        ranked.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", *extra, "cos", "rank")
    )


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact brute-force top-k cosine neighbors per query.

    Broadcast the (small) query side so the corpus is scanned once with no
    shuffle; the only exchange is the per-query top-k window. This is the
    oracle ANN is measured against — at 100 TB you run it on a sample, not
    the full corpus.
    """
    q = _as_double(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")
        ),
        "q_vec",
    )
    c = _as_double(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")),
        "n_vec",
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6))
    )
    return _rank_topk(scored, k)


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR/SimCSE
    recipe, Karpukhin et al. 2020 §3.2): for each query, the top-k most
    cosine-similar corpus rows with a DIFFERENT label — the near-misses a
    contrastive loss learns the most from.

    Same execution shape as ``cosine_topk`` (broadcast the small query
    side, scan the corpus once, per-query top-k window) with the label
    disagreement folded INTO the join predicate, so cross-label pairs are
    dropped before the cosine is ever computed. NULL labels never match
    anything (SQL null semantics): a null-labeled row mines no negatives
    and serves as none — unlabeled data is not evidence of dissimilarity.

    Scale path: exact mining runs per training batch (queries ≪ corpus —
    exactly this broadcast shape); corpus-×-corpus mining at 100 TB goes
    through the ANN tier first (``ann_lsh_topk`` / ``ivf_topk`` with a
    widened k), then applies this same label filter + re-rank to the
    bounded candidate set.
    """
    q = _as_double(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            F.col(label_col).alias("q_label"),
        ),
        "q_vec",
    )
    c = _as_double(
        corpus.select(
            F.col(id_col).alias("n_id"),
            F.col(vec_col).alias("n_vec"),
            F.col(label_col).alias("n_label"),
        ),
        "n_vec",
    )
    scored = c.join(
        F.broadcast(q),
        (F.col("q_id") != F.col("n_id"))
        & (F.col("q_label") != F.col("n_label")),
    ).withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6))
    return _rank_topk(scored, k, extra=("n_label",))


def quantize_embeddings(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector INT8 quantization: ``(id, scale, qvec)``.

    ``scale = max(|x_i|) / 127``; ``q_i = clamp(floor(x_i/scale + 0.5),
    -127, 127)`` as ``tinyint``. Half-up is spelled ``floor(+0.5)`` so
    every engine (Spark, DuckDB, numpy) computes the identical lattice —
    bankers-vs-half-up ``round()`` divergence is exactly the kind of
    cross-engine drift the oracle would flag. Zero vectors quantize to
    all-zero with ``scale = 0``.

    Why this exists at 100 TB: an ``array<float>`` embedding column is the
    widest thing in a training corpus (256 B/row at dim 64, dwarfing the
    metadata); int8 cuts the ANN tier's scan, shuffle, and cache volume
    4× (vs float32) with ~1% recall loss at this dim (Guo et al.,
    ScaNN ICML'20 report the same regime). And because cosine is
    scale-invariant — ``cos(q_a, q_b)`` needs NO dequantization —
    downstream rerank never touches ``scale``; it is carried only for
    L2/dot consumers. All codegen (``transform``/``array_max``), no
    Python.
    """
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    quant = F.transform(
        v,
        lambda x: F.least(
            F.lit(127), F.greatest(F.lit(-127), F.floor(x / scale + F.lit(0.5)))
        ).cast("tinyint"),
    )
    zeros = F.transform(v, lambda x: F.lit(0).cast("tinyint"))
    return df.select(
        F.col(id_col),
        F.when(max_abs == 0, F.lit(0.0)).otherwise(scale).alias("scale"),
        F.when(max_abs == 0, zeros).otherwise(quant).alias("qvec"),
    )


def quantized_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Brute-force top-k cosine over INT8-quantized vectors — the
    4×-cheaper scan :func:`cosine_topk` becomes once the corpus is stored
    quantized. Same execution shape (broadcast query side, one corpus
    scan, per-query top-k window); the cosine runs directly on the int
    lattices (scale cancels), so this measures exactly what a quantized
    ANN tier would serve. Zero vectors (scale 0) produce null cosines and
    are dropped, matching ``cosine_topk``'s NaN-drop semantics.
    """
    q = quantize_embeddings(queries, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("q_id"), F.col("qvec").cast("array<double>").alias("q_vec")
    )
    c = quantize_embeddings(corpus, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("n_id"), F.col("qvec").cast("array<double>").alias("n_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6))
    )
    return _rank_topk(scored, k)


def make_hyperplane_udf(dim: int, n_planes: int, seed: int = 42):
    """Arrow-batched sign-signature UDF: embedding → int bucket key.

    The hyperplane matrix is seeded and baked into the closure — identical
    on every executor, every run (determinism contract as fingerprint.py).
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @pandas_udf(T.LongType())
    def signature(vecs: pd.Series) -> pd.Series:
        m = np.vstack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(bits @ weights)

    return signature


def ann_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 12,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane signatures,
    candidates = corpus rows sharing any signature with the query, exact
    rerank within candidates.

    Scale shape: corpus is hashed once (narrow pandas-UDF stage), the
    candidate join is a hash equi-join on (table, signature) — no cross
    join, no broadcast of the corpus. Recall rises with n_tables and falls
    with n_planes; defaults give ≳0.9 recall@10 on clustered embeddings.
    """
    sigs = [make_hyperplane_udf(dim, n_planes, seed=42 + t) for t in range(n_tables)]

    def with_sigs(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        d = _as_double(
            df.select(
                F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias)
            ),
            vec_alias,
        )
        per_table = F.array(*[s(F.col(vec_alias)) for s in sigs])
        return d.select(
            id_alias, vec_alias, F.posexplode(per_table).alias("tbl", "sig")
        )

    qs = with_sigs(queries, "q_id", "q_vec")
    cs = with_sigs(corpus, "n_id", "n_vec")
    cand = (
        qs.join(cs, ["tbl", "sig"])
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("cos", F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6))
    )
    return _rank_topk(cand, k)


@pandas_udf(T.DoubleType())
def _pair_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched cosine over two array columns (numpy, no per-row Python).

    Rounded to 6 places BEFORE any threshold comparison — deliberately the
    opposite of the Jaccard convention (dedup.py filters the unrounded
    ratio): Jaccard is exact rational arithmetic that every engine
    reproduces bit-for-bit, while float cosine differs between numpy and
    the DuckDB oracle in the low-order bits, so both engines must quantize
    FIRST or boundary pairs flake. The oracle SQL applies the identical
    round-then-compare (SQL_EMBEDDING_DUP_PAIRS)."""
    ma = np.vstack(a.to_numpy()).astype(np.float64)
    mb = np.vstack(b.to_numpy()).astype(np.float64)
    num = (ma * mb).sum(axis=1)
    den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
    return pd.Series(np.round(num / np.maximum(den, 1e-12), 6))


def _lsh_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    *,
    n_planes: int = 8,
    n_tables: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Distributed near-dup pairs via hyperplane-LSH bucketing — the scale
    tier of ``embedding_dup_pairs``: no driver collect, no cross join; the
    candidate join is a hash equi-join on (table, signature) and the exact
    cosine reranks candidates. Recall is probabilistic: for cos ≥ 0.95 the
    defaults give ≥ 0.998 per-pair candidate probability
    (1 − (1 − (1 − θ/π)^8)^12 with θ = arccos(0.95) ≈ 18°).

    ``dim`` (vector width) is taken from the caller when known — resolving
    it here costs a Spark job (``head``) just to measure one array."""
    if dim is None:
        head = df.select(vec_col).head()
        dim = len(head[0]) if head else 0
    if dim == 0:
        return df.sparkSession.createDataFrame(
            [], f"id1 {df.schema[id_col].dataType.simpleString()}, "
            f"id2 {df.schema[id_col].dataType.simpleString()}, cos double"
        )
    sigs = [
        make_hyperplane_udf(dim, n_planes, seed=142 + t) for t in range(n_tables)
    ]
    d = _as_double(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), "vec"
    )
    exploded = d.select(
        "id", "vec", F.posexplode(F.array(*[s(F.col("vec")) for s in sigs])).alias(
            "tbl", "sig"
        )
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(b, ["tbl", "sig"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.col("a.vec").alias("v1"),
            F.col("b.vec").alias("v2"),
        )
        .dropDuplicates(["id1", "id2"])
        .withColumn("cos", _pair_cosine(F.col("v1"), F.col("v2")))
        .filter(F.col("cos") >= threshold)
        .select("id1", "id2", "cos")
    )


def embedding_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_broadcast_rows: int = 2_000_000,
    dim: int | None = None,
) -> DataFrame:
    """All (id1 < id2) pairs with cosine ≥ threshold.

    Two physical tiers behind one API:

    * **exact tier** (corpus ≤ ``max_broadcast_rows``): broadcast one
      (normalized) copy of the corpus as a numpy matrix; each Arrow batch
      computes a (batch × corpus) BLAS matmul inside ``mapInPandas`` and
      emits only above-threshold pairs with ``id1 < id2`` (the reference's
      triangular ``j > i``, duplicate_detector.py:76). O(n²) flops, zero
      shuffled pairs. The collect is GUARDED and Arrow-native: the corpus
      lands as flat Arrow buffers reshaped straight into the numpy matrix
      (~1 GB ≈ 2M float64 vectors at dim 64), never as per-row Python
      ``Row`` objects whose interpreter overhead would OOM the driver an
      order of magnitude earlier.
    * **LSH tier** (above the guard): hyperplane-signature equi-join +
      exact cosine rerank (``_lsh_dup_pairs``) — fully distributed, recall
      ≥ 0.998 at the 0.95 default threshold.
    """
    from collections.abc import Iterator

    n = df.count()
    if n > max_broadcast_rows:
        return _lsh_dup_pairs(df, id_col, vec_col, threshold, dim=dim)
    if n == 0:
        id_t = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id1 {id_t}, id2 {id_t}, cos double"
        )

    # Arrow collect: one contiguous values buffer + offsets, zero Row objects
    tbl = df.select(F.col(id_col), F.col(vec_col)).toArrow()
    ids = np.asarray(tbl.column(0).to_numpy(zero_copy_only=False))
    vec_arr = tbl.column(1).combine_chunks()
    mat = _list_column_matrix(vec_arr, len(ids), vec_col)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    out_schema = T.StructType(
        [
            T.StructField("id1", df.schema[id_col].dataType),
            T.StructField("id2", df.schema[id_col].dataType),
            T.StructField("cos", T.DoubleType()),
        ]
    )

    def block(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in it:
            q = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            q /= np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
            sims = np.round(q @ all_mat.T, 6)  # (batch, corpus)
            qi = pdf[id_col].to_numpy()
            keep_r, keep_c = np.nonzero(
                (sims >= threshold) & (qi[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id1": qi[keep_r],
                    "id2": all_ids[keep_c],
                    "cos": sims[keep_r, keep_c],
                }
            )

    return df.select(id_col, vec_col).mapInPandas(block, out_schema)


def embedding_dedupe(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding-cosine near-dup clusters: τ-pairs → connected components.

    Returns (id, cluster_id); null cluster_id ⇔ singleton (same contract as
    the text pipeline, duplicate_detector.py:88-89's ≥2-member rule).
    """
    from dedupe_spark.operators.cc import connected_components

    edges = embedding_dup_pairs(
        df, id_col=id_col, vec_col=vec_col, threshold=threshold
    )
    comp = connected_components(edges)
    ids = df.select(F.col(id_col).alias("id"))
    return ids.join(
        comp.select(F.col("file_id").alias("id"), F.col("component").alias("cluster_id")),
        "id",
        "left",
    )


if __name__ == "__main__":  # library smoke (SURVEY §3.3 per-module CLI)
    import sys

    from dedupe_spark.session import get_spark

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/embeddings.parquet"
    spark = get_spark(app_name="similarity_smoke", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(path)
    topk = cosine_topk(emb.limit(3), emb, k=5)
    topk.show()


def _train_centroids(
    corpus: DataFrame,
    *,
    id_col: str,
    vec_col: str,
    n_cells: int,
    train_sample_rows: int,
    seed: int,
) -> np.ndarray | None:
    """Spherical k-means coarse quantizer trained on a BOUNDED deterministic
    sample (driver-side numpy, seeded). Shared by ``ivf_topk`` (inverted-file
    search) and ``semdedup`` (cluster-then-prune dedup).

    md5-prefix sampling keeps the training set stable across runs and
    cluster sizes; the driver never holds more than ``train_sample_rows``
    rows — the standard IVF recipe: the index is trained on a sample, never
    the full corpus. Returns L2-normalized centroids, or None ONLY for a
    genuinely empty corpus: when the md5 cutoff rounds to zero kept rows
    (rate < 1/65536 — a corpus more than ~65k× the sample budget), the
    sampler falls back to a deterministic bounded take (ascending-id
    TakeOrdered: per-partition heaps, no full sort) rather than returning
    None — a None here makes every caller emit an EMPTY result for a
    non-empty corpus (semdedup would silently drop the whole dataset).
    """
    from dedupe_spark.operators.sampling import deterministic_sample

    n = corpus.count()
    if n == 0:
        return None
    rate = min(1.0, train_sample_rows / n)
    sample = (
        deterministic_sample(corpus, id_col, rate=rate) if rate < 1.0 else corpus
    )
    s_tbl = sample.select(vec_col).toArrow()
    s_vecs = s_tbl.column(0).combine_chunks()
    n_train = len(s_vecs)
    if n_train == 0:
        s_tbl = (
            corpus.orderBy(id_col).limit(train_sample_rows).select(vec_col).toArrow()
        )
        s_vecs = s_tbl.column(0).combine_chunks()
        n_train = len(s_vecs)
    if n_train == 0:
        return None
    train = _list_column_matrix(s_vecs, n_train, vec_col)
    train /= np.maximum(np.linalg.norm(train, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    cells = min(n_cells, len(train))
    centroids = train[rng.choice(len(train), size=cells, replace=False)]
    for _ in range(10):  # Lloyd iterations on the (bounded) sample
        assign = (train @ centroids.T).argmax(axis=1)
        for c in range(cells):
            members = train[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids /= np.maximum(
            np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
        )
    return centroids


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample_rows: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path alongside ``ann_lsh_topk``.

    1. **Train**: k-means centroids on a BOUNDED deterministic sample of
       the corpus (``_train_centroids``).
    2. **Assign**: every corpus row → nearest centroid, one Arrow-batched
       numpy argmax per batch; cell id becomes the inverted-list key.
    3. **Search**: each query probes its ``n_probe`` nearest cells; the
       candidate join is a hash equi-join on cell id (no cross join, no
       corpus broadcast) and the exact cosine reranks candidates.

    Recall rises with n_probe (n_probe == n_cells ⇒ exact search).
    """
    centroids = _train_centroids(
        corpus,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        train_sample_rows=train_sample_rows,
        seed=seed,
    )
    if centroids is None:
        # empty corpus — nothing to train on, nothing to return (mirror
        # _lsh_dup_pairs' empty-schema path instead of crashing)
        id_t = queries.schema[id_col].dataType.simpleString()
        return corpus.sparkSession.createDataFrame(
            [], f"q_id {id_t}, n_id {id_t}, cos double, rank int"
        )

    sc = corpus.sparkSession.sparkContext
    b_cent = sc.broadcast(centroids)

    @pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_cells(vecs: pd.Series) -> pd.Series:
        cent = b_cent.value
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cent.T
        order = np.argsort(-sims, axis=1)[:, : min(n_probe, cent.shape[0])]
        return pd.Series([row.astype("int32").tolist() for row in order])

    @pandas_udf(T.IntegerType())
    def assign_cell(vecs: pd.Series) -> pd.Series:
        # corpus side needs only the single nearest cell — an argmax, not
        # an n_probe-length sorted array per row
        cent = b_cent.value
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series((m @ cent.T).argmax(axis=1).astype("int32"))

    c = _as_double(
        corpus.select(F.col(id_col).alias("n_id"), F.col(vec_col).alias("n_vec")),
        "n_vec",
    ).withColumn("cell", assign_cell(F.col("n_vec")))
    q = _as_double(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec")),
        "q_vec",
    ).withColumn("cell", F.explode(probe_cells(F.col("q_vec"))))

    cand = (
        q.join(c, "cell")
        .filter(F.col("q_id") != F.col("n_id"))
        .dropDuplicates(["q_id", "n_id"])
        .withColumn("cos", _pair_cosine(F.col("q_vec"), F.col("n_vec")))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", "cos", "rank")
    )


def semdedup_assign(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    train_sample_rows: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """Deterministic k-means cell assignment: (id, cell, cent_sim).

    ``cent_sim`` is the cosine to the assigned centroid, rounded to 6
    places — the SemDeDup keep-rule's sort key, rounded so an independent
    engine reading the materialized assignment reproduces the ordering
    exactly. Seeded sample + seeded Lloyd ⇒ rerunning yields identical
    cells and sims (the same determinism contract as ``ivf_topk``).
    """
    centroids = _train_centroids(
        df,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        train_sample_rows=train_sample_rows,
        seed=seed,
    )
    if centroids is None:
        id_t = df.schema[id_col].dataType.simpleString()
        return df.sparkSession.createDataFrame(
            [], f"id {id_t}, cell int, cent_sim double, dir_key long"
        )
    b_cent = df.sparkSession.sparkContext.broadcast(centroids)

    @pandas_udf("cell int, cent_sim double, dir_key long")
    def assign(vecs: pd.Series) -> pd.DataFrame:
        cent = b_cent.value
        m = np.vstack(vecs.to_numpy()).astype(np.float64)
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ cent.T
        cell = sims.argmax(axis=1)
        # direction key: FNV-style fold over the 1e-6-quantized normalized
        # vector (vectorized across the batch, same mixing shape as
        # fingerprint._band_hashes_batch). Identical directions — scalar
        # multiples, byte-identical embeddings — share a key; semdedup
        # pre-collapses them before pairing (cosine is exactly 1 inside a
        # key group, so the collapse is semantics-preserving for any
        # threshold ≤ 1). 64-bit random-collision risk ~C(n,2)/2^64, the
        # same accepted bound as cc.py's vertex compaction.
        q = np.round(m * 1e6).astype(np.int64).astype(np.uint64)
        acc = np.full(len(q), 14695981039346656037, dtype=np.uint64)
        for j in range(q.shape[1]):
            acc = (acc ^ q[:, j]) * np.uint64(1099511628211)
        return pd.DataFrame(
            {
                "cell": cell.astype("int32"),
                "cent_sim": np.round(sims[np.arange(len(cell)), cell], 6),
                "dir_key": acc.view(np.int64),
            }
        )

    d = _as_double(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), "vec"
    )
    return d.select("id", assign(F.col("vec")).alias("_a")).select(
        "id", "_a.cell", "_a.cent_sim", "_a.dir_key"
    )


def semdedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    train_sample_rows: int = 100_000,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup via
    cluster-then-prune — k-means partition the embedding space, then prune
    near-duplicates WITHIN each cell only.

    1. **Cluster**: seeded spherical k-means on a bounded sample
       (``_train_centroids``); every row → (cell, cent_sim) in one
       Arrow-batched argmax (``semdedup_assign``).
    2. **Pair**: within-cell candidate pairs via a hash equi-join on the
       cell id (never a global cross join — the cell partition IS the
       blocking step; cross-cell near-dups are out of scope by design,
       exactly the paper's approximation). Exact cosine reranks, keep
       pairs with cos ≥ ``threshold``.
    3. **Cluster the pairs**: connected components (min-id labels).
    4. **Keep-rule**: per duplicate group keep the member with the LOWEST
       centroid similarity (the paper's choice — the most "marginal"
       example preserves diversity), ties broken on min id; singletons are
       always kept.

    Returns (id, cell, cent_sim, cluster_id, keep); null cluster_id ⇔
    singleton (the ≥2-member rule, duplicate_detector.py:88-89).

    Scale shape (100 TB): n_cells grows with the corpus (cells ≈
    n / target_cell_size, e.g. 100k cells for 100M embeddings per the
    paper), so the within-cell pair count is bounded by
    Σ cell_n² ≈ n · target_cell_size — linear in n for fixed cell size.
    The pair join is a shuffle on the cell id; AQE skew-join splits any
    oversized cell. Training stays driver-side on a bounded sample
    regardless of corpus size. The ``localCheckpoint`` below holds the
    (id, vec, assignment) frame in executor memory for the convenience
    path; a warehouse-scale run should materialize ``semdedup_assign`` to
    parquet instead (the cache-vs-staged tradeoff documented at
    dedup.py's fingerprint cache).
    """
    assign_df = semdedup_assign(
        df,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        train_sample_rows=train_sample_rows,
        seed=seed,
    )
    d = _as_double(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")), "vec"
    ).join(assign_df, "id")
    # localCheckpoint: the self-join below reads the assignment twice;
    # without it the fingerprint UDF + argmax would recompute per side.
    d = d.localCheckpoint(eager=False)

    # exact-direction super-nodes (the text pipeline's exact-sha tier,
    # transplanted): identical directions are cosine-1 cliques, so scoring
    # them pairwise is pure waste — collapse each dir_key group to its min
    # id before pairing. A 100-copy clique costs 99 expansion rows instead
    # of C(100,2) scored pairs; pairing-side recall is untouched because
    # cos(w, u) == cos(w, v) whenever u, v share a direction.
    eg = d.groupBy("dir_key").agg(
        F.min("id").alias("rep"), F.count("*").alias("dir_n")
    )
    reps = d.join(eg.select(F.col("rep").alias("id")), "id")

    a, b = reps.alias("a"), reps.alias("b")
    pairs = (
        a.join(b, "cell")
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn("cos", _pair_cosine(F.col("a.vec"), F.col("b.vec")))
        .filter(F.col("cos") >= threshold)
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
    )
    from dedupe_spark.operators.cc import connected_components

    comp = connected_components(pairs).select(
        F.col("file_id").alias("rep"), F.col("component").alias("_comp")
    )
    # rep-level component → every member of the direction group; dir
    # groups of ≥2 cluster even without external edges (their members are
    # exact cosine-1 duplicates of each other). component = min rep id of
    # the component = min member id overall, since each rep is the min of
    # its own group.
    labels = (
        d.select("id", "cell", "cent_sim", "dir_key")
        .join(eg, "dir_key")
        .join(comp, "rep", "left")
        .withColumn(
            "cluster_id",
            F.when(F.col("_comp").isNotNull(), F.col("_comp")).when(
                F.col("dir_n") >= 2, F.col("rep")
            ),
        )
    )
    out = labels.select("id", "cell", "cent_sim", "cluster_id")
    w = Window.partitionBy(
        F.coalesce(F.col("cluster_id"), F.col("id"))
    ).orderBy(F.asc("cent_sim"), F.asc("id"))
    return out.withColumn("keep", F.row_number().over(w) == 1)
