"""Pure-Python reference-semantics oracle (≤150 LoC) — golden labels.

Reimplements, without Spark, the semantics the engine must match
(FIXTURES.md §3):

  * similarity = consensus ≥ k over {sha-equal, simhash-Hamming ≤ t,
    shingle-Jaccard ≥ tj} — the reference's get_consensus_similarity shape
    (/root/reference/hash_generator.py:160-187) with code signals.
  * clustering = transitive closure (union-find). The reference's greedy
    star grouping (duplicate_detector.py:39-103) coincides with closure on
    well-separated families — see SURVEY.md §2.7 for why closure is the
    target semantics.
  * groups require ≥2 members (duplicate_detector.py:88-89).
  * representative = tuple-max (duplicate_detector.py:132-153), ties to
    smallest file_id.

Used only in tests, as the truth the Spark pipeline's F1 is measured
against. O(n²) — fine at fixture scale, exactly what we must NOT do in Spark.
"""

from __future__ import annotations

import hashlib

from dedupe_spark.functions.fingerprint import (
    _hash_shingles_batch,
    shingle_hash_rolling,
    simhash_from_hashes,
    tokenize,
)


def _fingerprint(content: str, k: int = 3):
    import numpy as np

    toks = tokenize(content)
    token_hashes = _hash_shingles_batch(toks)
    uh = np.unique(shingle_hash_rolling(token_hashes, k))
    return {
        "sha": hashlib.sha256(content.encode()).hexdigest(),
        "simhash": simhash_from_hashes(uh),
        "shingles": set(uh.tolist()),
        "error": None if toks else "no tokens",
    }


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _jaccard(s1: set, s2: set) -> float:
    if not s1 or not s2:
        return 0.0
    return len(s1 & s2) / len(s1 | s2)


def _similar(f1, f2, *, t: int, tj: float, k: int) -> bool:
    if f1["error"] or f2["error"]:
        return False  # errored rows never similar (hash_generator.py:174-175)
    votes = (
        int(f1["sha"] == f2["sha"])
        + int(_hamming(f1["simhash"], f2["simhash"]) <= t)
        + int(_jaccard(f1["shingles"], f2["shingles"]) >= tj)
    )
    return votes >= k


class _UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id becomes root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def golden_clusters(
    items: list[tuple[str, str]],
    *,
    hamming_threshold: int = 10,
    jaccard_threshold: float = 0.7,
    require_agreement: int = 2,
    shingle_k: int = 3,
) -> dict[str, str | None]:
    """[(file_id, content)] → {file_id: cluster_id-or-None}.

    cluster_id = min file_id of the component; None for singletons.
    """
    fps = {fid: _fingerprint(c, shingle_k) for fid, c in items}
    ids = sorted(fps)
    uf = _UnionFind()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if _similar(
                fps[ids[i]],
                fps[ids[j]],
                t=hamming_threshold,
                tj=jaccard_threshold,
                k=require_agreement,
            ):
                uf.union(ids[i], ids[j])
    roots: dict[str, list[str]] = {}
    for fid in ids:
        roots.setdefault(uf.find(fid), []).append(fid)
    out: dict[str, str | None] = {}
    for members in roots.values():
        label = min(members) if len(members) >= 2 else None
        for m in members:
            out[m] = label
    return out


def pairwise_f1(
    predicted: dict[str, str | None],
    labeled: list[tuple[str, str, bool]],
) -> float:
    """Pairwise F1 over labeled pairs (BASELINE.json metric)."""
    tp = fp = fn = 0
    for a, b, is_dup in labeled:
        same = (
            predicted.get(a) is not None
            and predicted.get(a) == predicted.get(b)
        )
        if same and is_dup:
            tp += 1
        elif same and not is_dup:
            fp += 1
        elif not same and is_dup:
            fn += 1
    if tp == 0:
        return 0.0
    p = tp / (tp + fp)
    r = tp / (tp + fn)
    return 2 * p * r / (p + r)
