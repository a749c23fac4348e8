"""String-similarity comparators for record linkage.

Jaro–Winkler (Winkler 1990, building on Jaro 1989) is the standard name
comparator in entity resolution — Splink's default for person/org name
fields, ahead of Levenshtein for short strings because transpositions
and shared prefixes carry identity signal that raw edit counts miss.

Spark has no built-in Jaro–Winkler expression, so this is the documented
exception to the JVM-only rule: an **Arrow-batched pandas UDF** (the
scoring.py Jaccard precedent — batches cross the boundary via Arrow,
never per-row pickling; `BatchEvalPython` must not appear in any plan).
Per-pair cost is O(len·window) with the Jaro matching window — constant
for name-length strings; the UDF is CPU-bound arithmetic on small
strings, exactly the shape where Arrow batching amortizes the Python
transfer.

Semantics are pinned to DuckDB's ``jaro_winkler_similarity`` so the
operator keeps a value-level oracle (validated pairwise on 14 canonical
cases including the Winkler paper's examples):

- either string empty → 0.0 (INCLUDING empty vs empty — DuckDB returns
  0.0 there, not 1.0),
- Winkler prefix boost: up to 4 shared leading chars, scale 0.1, applied
  only when the Jaro score exceeds 0.7 (the standard boost threshold).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


def _jaro(s1: str, s2: str) -> float:
    # empties first: DuckDB scores ("","") as 0.0, not 1.0
    if not s1 or not s2:
        return 0.0
    if s1 == s2:
        return 1.0
    n1, n2 = len(s1), len(s2)
    md = max(n1, n2) // 2 - 1
    if md < 0:
        md = 0
    f1 = [False] * n1
    f2 = [False] * n2
    m = 0
    for i, c in enumerate(s1):
        lo = i - md if i > md else 0
        hi = i + md + 1
        if hi > n2:
            hi = n2
        for j in range(lo, hi):
            if not f2[j] and s2[j] == c:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(n1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    return (m / n1 + m / n2 + (m - t) / m) / 3.0


def jaro_winkler(s1: str, s2: str) -> float:
    """Pure-Python Jaro–Winkler, DuckDB-compatible. Driver-side / test
    use; the distributed path is :func:`jaro_winkler_udf`."""
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * 0.1 * (1.0 - j)


#: Soundex digit map for a..z (0 = vowel/ignored: a e h i o u w y)
_SOUNDEX_DIGITS = "01230120022455012623010202"


def phonetic_key(col) -> "F.Column":
    """Simplified Soundex phonetic blocking key — pure JVM codegen, no
    UDF: lowercase/strip, translate letters to Soundex digit classes,
    collapse runs, drop the first letter's code and all vowel zeros,
    keep ``UPPER(first letter) + 3 digits`` zero-padded.

    Matches classic Soundex on common cases (martha→M630, robert→R163,
    small→S540) but intentionally skips the h/w adjacency rule so the
    whole key is expressible as a regex cascade in BOTH engines —
    DuckDB's RE2 has no backreferences, so run-collapsing is seven
    per-digit ``d{2,} → d`` replaces instead of ``(\\d)\\1+``. The SQL
    twin (SQL_PHONETIC_BLOCKING) mirrors this cascade literally.

    Null / letterless input → null key (no block).
    """
    b = F.lower(F.regexp_replace(col, "[^A-Za-z]", ""))
    d = F.translate(b, "abcdefghijklmnopqrstuvwxyz", _SOUNDEX_DIGITS)
    for digit in "0123456":
        d = F.regexp_replace(d, digit + "{2,}", digit)
    rest = F.regexp_replace(d.substr(F.lit(2), F.length(d)), "0", "")
    key = F.concat(
        F.upper(F.substring(b, 1, 1)), F.rpad(F.substring(rest, 1, 3), 3, "0")
    )
    return F.when(b != "", key)


def _jw_batch(left, right):
    """Vectorized Jaro–Winkler over two equal-length sequences of
    strings — the whole Arrow batch at once, numpy on the PAIR axis.

    The greedy character-matching loop is inherently sequential per
    character position, so the vectorization runs over pairs instead:
    ``L1·(2·md+1)`` tiny steps, each an O(batch) boolean vector op —
    measured ~6× faster than the per-pair scalar loop on 18-char name
    batches, which turns the 890k-pair sf0.1 query from UDF-bound to
    shuffle-bound. Exactly :func:`jaro_winkler`'s semantics (property-
    tested equal on random strings, and transitively pinned to DuckDB).

    ``left``/``right`` are object arrays WITHOUT nulls and WITHOUT NUL
    characters (numpy U-storage truncates trailing NULs — the UDF routes
    those through the scalar reference).
    Returns float64 scores.
    """
    import numpy as np

    n = len(left)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    # '<U{maxlen}' numpy unicode mats: view as uint32 code-point grids,
    # zero-padded — the zero pad can't collide with real chars (no NUL
    # in data; a literal NUL would compare equal on both sides exactly
    # as the scalar loop would)
    a_arr = np.asarray(left, dtype="U")
    b_arr = np.asarray(right, dtype="U")
    la = np.char.str_len(a_arr).astype(np.int32)
    lb = np.char.str_len(b_arr).astype(np.int32)
    l1 = int(a_arr.dtype.itemsize // 4)
    l2 = int(b_arr.dtype.itemsize // 4)
    if l1 == 0 or l2 == 0:
        return np.zeros(n, dtype=np.float64)
    A = a_arr.view(np.uint32).reshape(n, l1)
    B = b_arr.view(np.uint32).reshape(n, l2)

    md = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    md_max = int(md.max())
    f1 = np.zeros((n, l1), dtype=bool)
    f2 = np.zeros((n, l2), dtype=bool)
    for i in range(l1):
        if not (i < la).any():
            break
        matched_i = np.zeros(n, dtype=bool)
        # (i < la) alone guards padding: every in-length char is real,
        # including a literal NUL — identical semantics to the scalar loop
        base = i < la
        for d in range(-md_max, md_max + 1):
            j = i + d
            if j < 0 or j >= l2:
                continue
            ok = (
                base
                & ~matched_i
                & (np.abs(d) <= md)
                & (j < lb)
                & ~f2[:, j]
                & (B[:, j] == A[:, i])
            )
            if ok.any():
                f2[:, j] |= ok
                f1[:, i] = f1[:, i] | ok
                matched_i |= ok
    m = f1.sum(axis=1).astype(np.int32)

    # transpositions: matched chars of each side in ORIGINAL order —
    # stable argsort floats matched positions to the front in order
    mmax = int(m.max()) if n else 0
    t = np.zeros(n, dtype=np.int32)
    if mmax > 0:
        rows = np.arange(n)[:, None]
        idx1 = np.argsort(~f1, axis=1, kind="stable")[:, :mmax]
        idx2 = np.argsort(~f2, axis=1, kind="stable")[:, :mmax]
        c1 = A[rows, idx1]
        c2 = B[rows, idx2]
        valid = np.arange(mmax)[None, :] < m[:, None]
        t = (((c1 != c2) & valid).sum(axis=1) // 2).astype(np.int32)

    with np.errstate(divide="ignore", invalid="ignore"):
        jaro = np.where(
            (m > 0) & (la > 0) & (lb > 0),
            (m / np.maximum(la, 1) + m / np.maximum(lb, 1)
             + (m - t) / np.maximum(m, 1)) / 3.0,
            0.0,
        )

    # Winkler prefix boost: shared prefix up to 4, only above jaro 0.7
    pmax = min(4, l1, l2)
    prefix = np.zeros(n, dtype=np.int32)
    if pmax > 0:
        alive = np.ones(n, dtype=bool)
        for k in range(pmax):
            alive = alive & (k < la) & (k < lb) & (A[:, k] == B[:, k])
            prefix += alive
    return np.where(jaro > 0.7, jaro + prefix * 0.1 * (1.0 - jaro), jaro)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Arrow-batched, numpy-vectorized Jaro–Winkler over two string
    columns. Null on either side → null (no evidence), matching SQL
    comparison semantics."""
    import numpy as np

    lv = left.to_numpy(dtype=object)
    rv = right.to_numpy(dtype=object)
    # numpy 'U' arrays use NUL-terminated storage, silently truncating
    # trailing NULs — route any NUL-bearing string through the scalar
    # reference instead (vanishingly rare in real text; exactness wins)
    mask = np.fromiter(
        (
            a is not None
            and b is not None
            and "\x00" not in a
            and "\x00" not in b
            for a, b in zip(lv, rv)
        ),
        dtype=bool,
        count=len(lv),
    )
    out = np.full(len(lv), np.nan)
    if mask.any():
        out[mask] = _jw_batch(lv[mask], rv[mask])
    for k in np.nonzero(~mask)[0]:
        if lv[k] is not None and rv[k] is not None:
            out[k] = jaro_winkler(lv[k], rv[k])
    return pd.Series(out, dtype="float64")
