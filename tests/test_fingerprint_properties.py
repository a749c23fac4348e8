"""Property-based tests (hypothesis) for the fingerprint kernels.

These are the pure-numpy functions under the Arrow UDF — fast enough to
fuzz hard. Properties mirror what the pipeline depends on:

* determinism (same input → same fingerprint, the resume/oracle contract)
* simhash locality (similar shingle sets → small Hamming distance)
* MinHash-Jaccard unbiasedness within concentration bounds
* rolling shingle hashing ≡ the string-built shingle definition
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from dedupe_spark.functions.fingerprint import (
    _hash_shingles_batch,
    _minhash_coeffs,
    minhash_from_hashes,
    shingle_hash_rolling,
    shingle_strings,
    simhash_from_hashes,
    tokenize,
)

texts = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs")),
    max_size=400,
)
hash_arrays = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=0, max_size=200
).map(lambda xs: np.array(xs, dtype=np.uint64))


@settings(max_examples=100, deadline=None)
@given(texts, st.integers(min_value=1, max_value=5))
def test_rolling_shingles_count_matches_string_shingles(text, k):
    """The rolling-hash fast path must produce exactly one hash per
    string-built shingle (same windows, same short-doc fallback)."""
    toks = tokenize(text)
    th = _hash_shingles_batch(toks)
    rolled = shingle_hash_rolling(th, k)
    assert len(rolled) == len(shingle_strings(toks, k))


@settings(max_examples=50, deadline=None)
@given(hash_arrays)
def test_simhash_deterministic_and_long_range(h):
    s1, s2 = simhash_from_hashes(h), simhash_from_hashes(h.copy())
    assert s1 == s2
    assert -(1 << 63) <= s1 < (1 << 63)  # valid Spark LongType


big_hash_arrays = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1), min_size=20, max_size=200
).map(lambda xs: np.array(xs, dtype=np.uint64))


@settings(max_examples=50, deadline=None)
@given(big_hash_arrays, st.integers(0, 3))
def test_simhash_locality_small_perturbation(h, n_changes):
    """Changing n elements of the shingle set moves each bit's majority
    vote by at most n — Hamming distance can flip only bits whose margin
    was ≤ 2·n_changes; with ≥20 shingles and ≤3 changes the distance stays
    far below the 64-bit worst case (sanity bound: ≤ 64 trivially, and
    == 0 when nothing changed)."""
    base = simhash_from_hashes(h)
    h2 = h.copy()
    rng = np.random.default_rng(0)
    for i in range(n_changes):
        h2[rng.integers(0, h2.size)] = rng.integers(0, 1 << 63, dtype=np.uint64)
    pert = simhash_from_hashes(h2)
    d = bin((base ^ pert) & ((1 << 64) - 1)).count("1")
    if n_changes == 0:
        assert d == 0
    # margin argument: a bit flips only if its vote margin ≤ 2*n_changes;
    # for iid-uniform hashes the expected flip count is tiny, but the hard
    # guarantee we rely on in blocking is monotonicity in set overlap —
    # checked here as a loose ceiling that fails loudly if simhash ever
    # degenerates into avalanche behavior on small edits.
    assert d <= 40, (n_changes, d)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.text(min_size=1, max_size=12), min_size=30, max_size=120, unique=True),
    st.floats(min_value=0.3, max_value=1.0),
)
def test_minhash_jaccard_estimate_concentrates(universe, keep_frac):
    """sig-agreement / num_perm estimates true Jaccard within ±0.25 at 128
    permutations (Chernoff: P(|est − J| > 0.25) < 1e-3 per example).

    The universe goes through the ENGINE's shingle hasher first — MinHash's
    guarantee assumes uniformly-distributed input hashes (the pipeline
    always feeds it hash_array output); raw adversarial integers (e.g.
    0..n, where the linear permutation is monotone and every min is h=0)
    are outside the operator's contract and do fail."""
    a, b = _minhash_coeffs(128)
    h1 = _hash_shingles_batch(universe)
    n_keep = max(1, int(len(universe) * keep_frac))
    h2 = h1[:n_keep]
    true_j = n_keep / len(universe)
    s1 = minhash_from_hashes(h1, a, b)
    s2 = minhash_from_hashes(h2, a, b)
    est = float((s1 == s2).mean())
    assert abs(est - true_j) <= 0.25, (true_j, est)


@settings(max_examples=50, deadline=None)
@given(hash_arrays)
def test_minhash_signature_shape_and_determinism(h):
    a, b = _minhash_coeffs(64)
    s1 = minhash_from_hashes(h, a, b)
    s2 = minhash_from_hashes(h.copy(), a, b)
    assert s1.dtype == np.int32 and s1.shape == (64,)
    assert (s1 == s2).all()
    assert (s1 >= 0).all()  # band keys assume non-negative int32
