"""Fingerprint stage unit tests — mirrors the reference's hash tests
(/root/reference/tests/test_hash_generator.py): format/determinism/Hamming
math/error handling, plus the BASELINE.json per-row invariant:
sha256(content) equality vs hashlib."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedupe_spark.fixtures import files_dataframe
from dedupe_spark.functions.fingerprint import (
    _hash_shingles_batch,
    band_hashes,
    minhash_from_hashes,
    _minhash_coeffs,
    shingle_strings,
    simhash_from_hashes,
    tokenize,
    with_fingerprints,
)


def test_sha256_invariant_vs_hashlib(spark, corpus):
    """Per-row invariant (BASELINE.json input_hint): engine sha == hashlib sha."""
    df = with_fingerprints(files_dataframe(spark, corpus[:30]))
    got = {r["content"]: r["content_sha"] for r in df.select("content", "content_sha").collect()}
    for content, sha in got.items():
        assert sha == hashlib.sha256(content.encode()).hexdigest()


def test_fingerprint_determinism(spark, corpus):
    """Same input twice → identical simhash/minhash (test_hash_generator.py:185-206)."""
    df = files_dataframe(spark, corpus[:20])
    a = with_fingerprints(df).select("file_id", "simhash", "minhash_sig").collect()
    b = with_fingerprints(df).select("file_id", "simhash", "minhash_sig").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_simhash_hamming_properties():
    h1 = _hash_shingles_batch([f"tok {i} x" for i in range(50)]).astype(np.uint64)
    s1 = simhash_from_hashes(h1)
    assert s1 == simhash_from_hashes(h1)  # deterministic
    # identical sets → hamming 0; disjoint sets → large hamming
    h2 = _hash_shingles_batch([f"other {i} y" for i in range(50)]).astype(np.uint64)
    s2 = simhash_from_hashes(h2)
    ham = bin((s1 ^ s2) & ((1 << 64) - 1)).count("1")
    assert ham > 10  # unrelated docs far apart (metamorphic, :269-321 analog)


def test_minhash_estimates_jaccard():
    a, b = _minhash_coeffs(128)
    base = [f"sh {i}" for i in range(100)]
    h1 = _hash_shingles_batch(base).astype(np.uint64)
    # 80% overlap
    h2 = _hash_shingles_batch(base[:80] + [f"new {i}" for i in range(20)]).astype(np.uint64)
    s1 = minhash_from_hashes(np.unique(h1), a, b)
    s2 = minhash_from_hashes(np.unique(h2), a, b)
    est = float((s1 == s2).mean())
    true_j = 80 / 120
    assert abs(est - true_j) < 0.15


def test_band_hashes_shape_and_determinism():
    a, b = _minhash_coeffs(128)
    h = _hash_shingles_batch(["x y z"]).astype(np.uint64)
    sig = minhash_from_hashes(h, a, b)
    bh1 = band_hashes(sig, 32, 4)
    bh2 = band_hashes(sig, 32, 4)
    assert bh1.shape == (32,)
    assert (bh1 == bh2).all()
    # same lanes in different bands must not collide
    flat = np.zeros(128, dtype=np.int32)
    bh = band_hashes(flat, 32, 4)
    assert len(set(bh.tolist())) == 32


def test_error_channel(spark):
    """Degenerate rows kept with error set, never dropped
    (hash_generator.py:102-114 convention)."""
    rows = [("r", "p1", "c", "python", ""), ("r", "p2", "c", "python", "  \n "),
            ("r", "p3", "c", "python", "def f(): pass")]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, lang string, content string")
    out = with_fingerprints(df).select("path", "error").collect()
    errs = {r["path"]: r["error"] for r in out}
    assert errs["p1"] is not None and errs["p2"] is not None and errs["p3"] is None
    assert len(out) == 3


def test_tokenize_and_shingles():
    toks = tokenize("def foo(bar, baz):\n  return bar")
    assert toks == ["def", "foo", "bar", "baz", "return", "bar"]
    assert shingle_strings(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingle_strings(["a"], 3) == ["a"]
    assert shingle_strings([], 3) == []


def test_batched_kernels_match_per_doc():
    """The batched segment-reduceat kernels must reproduce the per-doc
    reference functions bit-for-bit on random inputs (incl. empty rows)."""
    import numpy as np

    from dedupe_spark.functions.fingerprint import (
        _band_hashes_batch,
        _minhash_batch,
        _minhash_coeffs,
        _simhash_batch,
        _unique_per_row,
        band_hashes,
        minhash_from_hashes,
        simhash_from_hashes,
    )

    rng = np.random.default_rng(3)
    rows = []
    for i in range(200):
        size = [0, 1, 3, 40, 120][i % 5]
        arr = rng.integers(0, 1 << 63, size=size, dtype=np.uint64)
        if size > 2:
            arr[1] = arr[0]  # plant duplicates to exercise the set semantics
        rows.append(arr)
    flat = np.concatenate(rows) if rows else np.empty(0, dtype=np.uint64)
    lens = np.array([r.size for r in rows])
    row_idx = np.repeat(np.arange(len(rows)), lens)
    vu, counts = _unique_per_row(flat, row_idx, len(rows))
    offs = np.concatenate(([0], np.cumsum(counts)))

    a, b = _minhash_coeffs(128)
    sim_b = _simhash_batch(vu, offs, counts)
    sig_b = _minhash_batch(vu, offs, counts, a, b)
    band_b = _band_hashes_batch(sig_b, 32, 4)
    for i, r in enumerate(rows):
        h = np.unique(r)
        assert sim_b[i] == simhash_from_hashes(h), i
        ref_sig = minhash_from_hashes(h, a, b)
        assert (sig_b[i] == ref_sig).all(), i
        assert (band_b[i] == band_hashes(ref_sig, 32, 4)).all(), i


def test_file_id_distinct_for_null_column_permutations(spark):
    """concat_ws skips nulls, so ('r', NULL, 'x') and ('r', 'x', NULL)
    would collide without per-column sentinels — ids must be distinct."""
    from dedupe_spark.functions.fingerprint import file_id_col

    df = spark.createDataFrame(
        [("r", None, "x"), ("r", "x", None), ("r", "x", "x")],
        "repo string, path string, commit string",
    )
    ids = [r["fid"] for r in df.select(file_id_col().alias("fid")).collect()]
    assert len(set(ids)) == 3, ids
