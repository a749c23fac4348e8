"""Content fingerprinting — the engine's projection stage.

Plays the role of the reference's ``HashGenerator.generate_hash``
(/root/reference/hash_generator.py:62-114): one pass over content producing
every signal later stages compare on. The reference computes three 64-bit
perceptual hashes per image in a per-row Python loop; here we compute a
64-bit **simhash** + a 128-lane **MinHash signature** + LSH band keys per
source-code row, in Arrow batches with numpy — zero per-row Python at the
Spark level (one pandas UDF call per ~4096-row batch).

Everything cheap stays JVM-side (sha2, octet_length, split): Catalyst
codegen beats any UDF for those.

Determinism: shingle hashing uses ``pandas.util.hash_array`` with a fixed
hash key (SipHash, stable across processes/runs), and MinHash permutation
coefficients come from a seeded numpy Generator — reruns are bit-identical,
which the resume/checkpoint tests rely on.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

# ---------------------------------------------------------------------------
# deterministic constants
# ---------------------------------------------------------------------------

_HASH_KEY = "dedupe_spark_016"  # exactly 16 bytes — pandas hash_array key
_MERSENNE_P = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+")

# Polynomial-mix constants for band hashing (splitmix64-style odd constants).
_BAND_C0 = np.uint64(0x9E3779B97F4A7C15)
_BAND_C1 = np.uint64(0xBF58476D1CE4E5B9)
_BAND_C2 = np.uint64(0x94D049BB133111EB)


def _minhash_coeffs(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) for sig_i = (a_i * h + b_i) mod p.

    a < 2^31 so a*h32 + b stays below 2^63 — no uint64 overflow.
    """
    rng = np.random.default_rng(seed)
    a = rng.integers(1, 1 << 31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE_P, size=num_perm, dtype=np.uint64)
    return a, b


def tokenize(text: str) -> list[str]:
    """Lowercased word tokens (``\\w+``) — the unit of shingling."""
    return _TOKEN_RE.findall(text.lower())


def shingle_strings(tokens: list[str], k: int) -> list[str]:
    """k-token shingles as joined strings; short docs fall back to tokens.

    Reference form of the shingle definition (used by tests and the SQL
    n-gram operators); the engine's hot path hashes tokens once and rolls
    the window over the hash array instead — ``shingle_hash_rolling`` —
    which is the same set of shingles without any string building.
    """
    if len(tokens) < k:
        return [" ".join(tokens)] if tokens else []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def shingle_hash_rolling(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """64-bit shingle hashes from token hashes via a vectorized rolling mix.

    One hash per k-token window (short docs: one hash over all tokens,
    mirroring ``shingle_strings``'s fallback). The mix is the same
    splitmix-style combine as ``band_hashes``; position matters, so
    'a b c' ≠ 'c b a'. Replaces per-shingle Python string joins — measured
    ~2× faster fingerprints at 10^5 rows.
    """
    n = int(token_hashes.size)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    kk = min(k, n)
    m = n - kk + 1
    th = token_hashes.astype(np.uint64)
    acc = np.full(m, _BAND_C1, dtype=np.uint64)
    for j in range(kk):
        acc = (acc ^ th[j : j + m]) * _BAND_C2
        acc ^= acc >> np.uint64(29)
    return acc


def _hash_shingles_batch(all_shingles: list[str]) -> np.ndarray:
    """Stable 64-bit hashes for a flat list of shingle strings (vectorized)."""
    if not all_shingles:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(all_shingles, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY).astype(np.uint64)


def simhash_from_hashes(h: np.ndarray) -> int:
    """64-bit simhash: majority vote per bit over shingle hashes.

    Same comparison math as the reference's Hamming pipeline
    (hash_generator.py:116-140) — two simhashes are compared with
    XOR + popcount.
    """
    if h.size == 0:
        return 0
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
    votes = bits.sum(axis=0)
    maj = (votes * 2 > h.size).astype(np.uint64)
    packed = np.uint64(0)
    for i in range(64):
        packed |= maj[i] << shifts[i]
    return int(packed.astype(np.int64))  # two's-complement view as Spark LongType


def minhash_from_hashes(h: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (int32) from shingle hashes via seeded permutations."""
    num_perm = a.shape[0]
    if h.size == 0:
        return np.full(num_perm, np.iinfo(np.int32).max, dtype=np.int32)
    h32 = (h & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    # (num_perm, n_shingles) — safe: a < 2^31, h32 < 2^32 → product < 2^63
    phi = (a[:, None] * h32[None, :] + b[:, None]) % np.uint64(_MERSENNE_P)
    sig = phi.min(axis=1)
    return (sig & np.uint64(0x7FFFFFFF)).astype(np.int32)


def band_hashes(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Fold each band of ``rows`` signature lanes into one stable int64 key.

    The band index is mixed in so identical lane values in different bands
    never collide into the same block.
    """
    s = sig.astype(np.uint64).reshape(bands, rows)
    acc = (np.arange(bands, dtype=np.uint64) * _BAND_C0) + _BAND_C1
    for j in range(rows):
        acc = (acc ^ s[:, j]) * _BAND_C2
        acc ^= acc >> np.uint64(29)
    return acc.astype(np.int64)


# ---------------------------------------------------------------------------
# batched kernels — same math as the per-doc functions above, computed for
# a whole Arrow batch at once (segment reduceat instead of a Python loop
# of small-matrix calls; measured ~2× the per-doc throughput). The per-doc
# functions remain the reference implementation; equivalence is pinned by
# tests/test_fingerprint.py::test_batched_kernels_match_per_doc.
# ---------------------------------------------------------------------------


def _unique_per_row(
    values: np.ndarray, row_idx: np.ndarray, n_rows: int
) -> tuple[np.ndarray, np.ndarray]:
    """Sorted-unique values per row → (flat uniques, per-row counts)."""
    if values.size == 0:
        return values, np.zeros(n_rows, dtype=np.int64)
    order = np.lexsort((values, row_idx))
    v, r = values[order], row_idx[order]
    keep = np.ones(v.size, dtype=bool)
    keep[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    vu, ru = v[keep], r[keep]
    return vu, np.bincount(ru, minlength=n_rows)


def _simhash_batch(
    vu: np.ndarray, offsets: np.ndarray, counts: np.ndarray
) -> np.ndarray:
    """Per-row simhash over concatenated unique shingle hashes."""
    n = counts.size
    out = np.zeros(n, dtype=np.int64)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    starts = offsets[:-1][nonempty]
    shifts = np.arange(64, dtype=np.uint64)
    votes = np.empty((starts.size, 64), dtype=np.int64)
    for g in range(0, 64, 16):  # chunk shifts: bounds the (M, 16) temporary
        sh = shifts[g : g + 16]
        bits = ((vu[:, None] >> sh) & np.uint64(1)).astype(np.int32)
        votes[:, g : g + 16] = np.add.reduceat(bits, starts, axis=0)
    maj = (votes * 2 > counts[nonempty][:, None]).astype(np.uint64)
    packed = (maj << shifts).sum(axis=1, dtype=np.uint64)
    out[nonempty] = packed.astype(np.int64)
    return out


def _minhash_batch(
    vu: np.ndarray,
    offsets: np.ndarray,
    counts: np.ndarray,
    a: np.ndarray,
    b: np.ndarray,
) -> np.ndarray:
    """Per-row MinHash signatures (n_rows, num_perm) int32."""
    n, num_perm = counts.size, a.shape[0]
    out = np.full((n, num_perm), np.iinfo(np.int32).max, dtype=np.int32)
    nonempty = counts > 0
    if not nonempty.any():
        return out
    starts = offsets[:-1][nonempty]
    h32 = (vu & np.uint64(0xFFFFFFFF)).astype(np.uint64)
    p = np.uint64(_MERSENNE_P)
    s61 = np.uint64(61)
    mins = np.empty((num_perm, starts.size), dtype=np.uint64)
    for g in range(0, num_perm, 32):  # chunk perms: bounds the (32, M) temp
        ag, bg = a[g : g + 32, None], b[g : g + 32, None]
        x = ag * h32[None, :] + bg  # < 2^63 + 2^31, fits uint64
        # Mersenne reduction: 2^61 ≡ 1 (mod p) → x mod p computed with a
        # shift+add+conditional-subtract instead of 64-bit hardware modulo
        # (~3× faster; no SIMD div exists). Exact: y < 2p after folding.
        y = (x & p) + (x >> s61)
        phi = np.where(y >= p, y - p, y)
        mins[g : g + 32] = np.minimum.reduceat(phi, starts, axis=1)
    out[nonempty] = (mins & np.uint64(0x7FFFFFFF)).astype(np.int32).T
    return out


def _band_hashes_batch(sig: np.ndarray, bands: int, rows: int) -> np.ndarray:
    """Per-row band keys (n_rows, bands) int64 from an int32 sig matrix."""
    s = sig.astype(np.uint64).reshape(sig.shape[0], bands, rows)
    acc = np.broadcast_to(
        (np.arange(bands, dtype=np.uint64) * _BAND_C0) + _BAND_C1,
        (sig.shape[0], bands),
    ).copy()
    for j in range(rows):
        acc = (acc ^ s[:, :, j]) * _BAND_C2
        acc ^= acc >> np.uint64(29)
    return acc.astype(np.int64)


# ---------------------------------------------------------------------------
# the pandas UDF
# ---------------------------------------------------------------------------

_FP_STRUCT = T.StructType(
    [
        T.StructField("simhash", T.LongType()),
        T.StructField("minhash_sig", T.ArrayType(T.IntegerType())),
        T.StructField("band_keys", T.ArrayType(T.LongType())),
        T.StructField("n_shingles", T.IntegerType()),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def _shingle_batch_prologue(
    content: pd.Series, shingle_k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Shared tokenize → hash → roll → unique prologue of every
    fingerprint UDF; returns ``(vu, u_offsets, counts, tok_counts)``.

    One implementation on purpose: the simhash-only and wide-simhash UDFs
    document bit-identical simhash values to the full fingerprint UDF,
    which is only guaranteed if they literally share this path (the block
    used to be copy-pasted into all three closures, where a one-sided edit
    would silently break that contract).

    Mechanics: hash every token in the batch in ONE hash_array call, roll
    the k-window over each row's hash slice (no shingle strings built),
    then run the heavy kernels BATCHED over the whole Arrow batch —
    segment reduceat instead of 4096 small-matrix calls (~2× throughput,
    identical outputs).
    """
    n = len(content)
    tokens_per_row: list[list[str]] = [
        tokenize(c) if isinstance(c, str) else [] for c in content
    ]
    tok_counts = np.fromiter(
        (len(t) for t in tokens_per_row), dtype=np.int64, count=n
    )
    flat_tokens = [t for row in tokens_per_row for t in row]
    flat_hashes = _hash_shingles_batch(flat_tokens)
    offsets = np.concatenate(([0], np.cumsum(tok_counts)))
    rolled = [
        shingle_hash_rolling(flat_hashes[offsets[i] : offsets[i + 1]], shingle_k)
        for i in range(n)
    ]
    lens = np.fromiter((r.size for r in rolled), dtype=np.int64, count=n)
    flat_rolled = np.concatenate(rolled) if n else np.empty(0, dtype=np.uint64)
    row_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    vu, counts = _unique_per_row(flat_rolled, row_idx, n)
    u_offsets = np.concatenate(([0], np.cumsum(counts)))
    return vu, u_offsets, counts, tok_counts


def make_fingerprint_udf(shingle_k: int, num_perm: int, bands: int, rows: int):
    """Build the Arrow-batched fingerprint UDF (closure carries config)."""
    a_coef, b_coef = _minhash_coeffs(num_perm)

    @pandas_udf(_FP_STRUCT)
    def fingerprint_udf(content: pd.Series) -> pd.DataFrame:
        vu, u_offsets, counts, tok_counts = _shingle_batch_prologue(
            content, shingle_k
        )
        simhashes = _simhash_batch(vu, u_offsets, counts)
        sig_matrix = _minhash_batch(vu, u_offsets, counts, a_coef, b_coef)
        bkey_matrix = _band_hashes_batch(sig_matrix, bands, rows)

        return pd.DataFrame(
            {
                "simhash": simhashes,
                "minhash_sig": list(sig_matrix),
                "band_keys": list(bkey_matrix),
                "n_shingles": counts.astype(np.int32),
                "n_tokens": tok_counts.astype(np.int32),
            }
        )

    return fingerprint_udf


_SIMHASH_STRUCT = T.StructType(
    [
        T.StructField("simhash", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
    ]
)


def make_simhash_udf(shingle_k: int):
    """Simhash-only fingerprint UDF — for callers that never read the
    MinHash signature or band keys (e.g. ``simhash_dedupe``): skips the
    128-permutation MinHash and band folding, the dominant kernel cost.
    Identical simhash values to ``make_fingerprint_udf`` (same tokenize →
    hash → roll → unique → majority-vote path)."""

    @pandas_udf(_SIMHASH_STRUCT)
    def simhash_udf(content: pd.Series) -> pd.DataFrame:
        vu, u_offsets, counts, tok_counts = _shingle_batch_prologue(
            content, shingle_k
        )
        return pd.DataFrame(
            {
                "simhash": _simhash_batch(vu, u_offsets, counts),
                "n_tokens": tok_counts.astype(np.int32),
            }
        )

    return simhash_udf


def _remix(h: np.ndarray, j: int) -> np.ndarray:
    """Independent 64-bit view #j of shingle hashes (splitmix64 finalizer).

    j=0 is the identity, so word 0 of a wide fingerprint equals the 64-bit
    simhash exactly. The finalizer is bijective (xor-shift and odd-multiply
    both are), so per-row uniqueness of the shingle set is preserved.
    """
    if j == 0:
        return h
    x = h ^ (np.uint64(j) * _BAND_C0)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def make_wide_simhash_udf(shingle_k: int, bits: int):
    """Wide-simhash UDF: ``simhash array<long>`` of ``bits/64`` words.

    The reference's ``hash_size`` dial (dedupe.py:84-90: hash_size 8/16 →
    64/256-bit perceptual hashes) — wider fingerprints trade compute for
    precision at the same relative threshold. Each 64-bit word is the
    majority-vote simhash over an independently remixed view of the SAME
    shingle set (``_remix``), so words are independent signals and the
    128-bit Hamming distance is the sum of per-word XOR popcounts.
    """
    if bits % 64 or bits < 64:
        raise ValueError(f"bits must be a positive multiple of 64, got {bits}")
    words = bits // 64
    struct = T.StructType(
        [
            T.StructField("simhash", T.ArrayType(T.LongType())),
            T.StructField("n_tokens", T.IntegerType()),
        ]
    )

    @pandas_udf(struct)
    def wide_simhash_udf(content: pd.Series) -> pd.DataFrame:
        vu, u_offsets, counts, tok_counts = _shingle_batch_prologue(
            content, shingle_k
        )
        n = len(content)
        word_cols = [
            _simhash_batch(_remix(vu, j), u_offsets, counts) for j in range(words)
        ]
        return pd.DataFrame(
            {
                "simhash": list(np.stack(word_cols, axis=1)) if n else [],
                "n_tokens": tok_counts.astype(np.int32),
            }
        )

    return wide_simhash_udf


# ---------------------------------------------------------------------------
# DataFrame-level stage
# ---------------------------------------------------------------------------


def file_id_col(repo: str = "repo", path: str = "path", commit: str = "commit") -> Column:
    """Stable primary key: sha256 over NUL-joined identity columns.

    Each column is null-coalesced to a distinct sentinel BEFORE the join:
    ``concat_ws`` silently SKIPS null arguments, so without the sentinels
    ``('r', NULL, 'x')`` and ``('r', 'x', NULL)`` would both serialize to
    ``'r\\x00x'`` and collide to one file_id — cross-matching two distinct
    files through every downstream equi-join on the key."""
    def _nn(c: str) -> Column:
        return F.coalesce(F.col(c), F.lit("\x01null\x01"))

    return F.sha2(F.concat_ws("\x00", _nn(repo), _nn(path), _nn(commit)), 256)


def with_fingerprints(
    df: DataFrame,
    *,
    content_col: str = "content",
    shingle_k: int = 3,
    num_perm: int = 128,
    bands: int = 32,
    rows: int = 4,
    add_file_id: bool = True,
    normalize: str = "raw",
) -> DataFrame:
    """Fingerprint projection stage (reference P1/P2, hash_generator.py:39-114).

    Adds: file_id, content_sha, size, lines, simhash, minhash_sig,
    band_keys, n_shingles, n_tokens, error.

    ``normalize``: ``"raw"`` (default) fingerprints the content as-is;
    ``"type1"``/``"type2"`` fingerprint the clone-normalized text
    (operators/clones.py — comment/layout stripped, type-2 additionally
    folds identifiers+literals), so the exact tier merges reformatted
    copies and the near tier compares normalized shingles — The Stack
    v2's comment-stripped near-dedup as a pipeline mode. ``size`` and
    ``lines`` always describe the RAW content (space-saved stats count
    real bytes), and the error channel follows the normalized text, so a
    comment-only file is degenerate ("empty content") under
    normalization — nothing substantive to dedup.

    Error-channel convention matches the reference (hash_generator.py:102-114):
    degenerate rows (null/empty/whitespace-only content) are kept with
    ``error`` set and excluded from comparisons downstream — never fail the job.
    """
    fp = make_fingerprint_udf(shingle_k, num_perm, bands, rows)
    raw = F.col(content_col)
    if normalize == "raw":
        c = raw
    else:
        from dedupe_spark.operators.clones import normalize_code_col

        # lang-gated '#' stripping: C-family preprocessor directives are
        # semantic, not comments (operators/clones.py HASH_COMMENT_LANGS).
        lang = F.col("lang") if "lang" in df.columns else None
        c = normalize_code_col(raw, normalize, lang)
    out = df
    if add_file_id and "file_id" not in df.columns:
        out = out.withColumn("file_id", file_id_col())
    out = (
        out.withColumn("content_sha", F.sha2(c, 256))
        .withColumn("size", F.octet_length(raw).cast("long"))
        .withColumn("lines", F.size(F.split(raw, "\n")))
        .withColumn("_fp", fp(c))
        .select("*", "_fp.*")
        .drop("_fp")
        .withColumn(
            "error",
            F.when(c.isNull(), F.lit("null content"))
            .when(F.length(F.trim(c)) == 0, F.lit("empty content"))
            .when(F.col("n_tokens") == 0, F.lit("no tokens"))
            .otherwise(F.lit(None).cast("string")),
        )
    )
    return out
