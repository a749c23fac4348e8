"""Deterministic synthetic `files` table with planted duplicate structure.

Mirrors how the reference tests itself: its conftest renders a small image
corpus with planted duplicate families — the same image saved under several
formats/sizes/locations — plus distinct singletons and corrupted inputs
(/root/reference/tests/conftest.py:41-102, :116-137). We do the same with
source-code rows (FIXTURES.md §1): exact families (byte-identical content),
near families (small token edits, shingle-Jaccard kept high), singletons
(disjoint vocab), corrupt rows (empty/whitespace), and one giant exact
family to exercise skew handling.

Families are well separated (cross-family Jaccard ≈ 0) so greedy star
grouping and connected components coincide (SURVEY.md §2.7) and truth is
unambiguous: same family ⇔ duplicate. All generation is seeded — seed=42
reproduces byte-identical tables.
"""

from __future__ import annotations

import hashlib
import random
from dataclasses import dataclass

LANGS = ["python", "java", "js", "go", "rust", "md"]
# skewed: python ≈ 60% (FIXTURES.md — exercises hot-language skew)
LANG_WEIGHTS = [0.60, 0.10, 0.10, 0.08, 0.07, 0.05]


@dataclass
class FileRow:
    repo: str
    path: str
    commit: str
    lang: str
    content: str
    family: str  # truth label, NOT part of the files schema


def _commit_for(repo: str, seq: int) -> str:
    return hashlib.sha256(f"{repo}:{seq}".encode()).hexdigest()[:40]


def _base_doc(rng: random.Random, family_idx: int, n_lines: int = 40) -> str:
    """A deterministic fake source file with a family-private vocabulary.

    Each family draws identifiers from a disjoint namespace
    (``f{family_idx}_*``) so cross-family shingle overlap is ~0 — the
    well-separated property the F1 metric needs (SURVEY §2.7).
    """
    idents = [f"f{family_idx}_{rng.choice('abcdefgh')}{i}" for i in range(12)]
    lines = []
    for i in range(n_lines):
        a, b, c = rng.choice(idents), rng.choice(idents), rng.choice(idents)
        kind = rng.random()
        if kind < 0.3:
            lines.append(f"def {a}({b}, {c}):")
        elif kind < 0.6:
            lines.append(f"    {a} = {b} + {c} * {rng.randint(1, 99)}")
        elif kind < 0.8:
            lines.append(f"    return {a}({b}, {c})")
        else:
            lines.append(f"# {a} handles {b} for {c}")
    return "\n".join(lines) + "\n"


def _edit_once(rng: random.Random, content: str, n_renames: int) -> str:
    """One candidate edit: rename ``n_renames`` identifiers, insert a
    comment and a blank line — the analog of the reference's
    resized/recompressed copies (conftest.py:54-56)."""
    lines = content.split("\n")
    tokens = sorted(
        {
            t
            for l in lines
            for t in l.replace("(", " ").replace(")", " ").replace(",", " ").split()
            if t.startswith("f")
        }
    )
    for t in rng.sample(tokens, min(n_renames, len(tokens))):
        new = t + "x"
        lines = [
            l.replace(t + " ", new + " ").replace(t + "(", new + "(").replace(
                t + ",", new + ","
            )
            for l in lines
        ]
    lines.insert(rng.randrange(len(lines)), f"# edited variant {rng.randint(0, 9)}")
    lines.insert(rng.randrange(len(lines)), "")
    return "\n".join(lines)


def _near_edit(rng: random.Random, content: str) -> str:
    """Edit that provably stays within duplicate thresholds of the base.

    FIXTURES.md requires within-family shingle-Jaccard ≥ ~0.8 and the
    consensus predicate needs simhash-Hamming ≤ 10 too; random token
    renames can overshoot (a hot identifier touches many shingles), so we
    verify each candidate edit against the base with the same fingerprint
    math the engine uses and retry with gentler edits. Deterministic: the
    rng is seeded and the accept test is pure."""
    from dedupe_spark.functions.fingerprint import (
        _hash_shingles_batch,
        shingle_hash_rolling,
        simhash_from_hashes,
        tokenize,
    )
    import numpy as np

    def fp(c: str):
        # MUST be the engine's canonical shingle hashing (rolling mix over
        # token hashes) — a margin verified under a different hash function
        # is no margin at all.
        h = np.unique(shingle_hash_rolling(_hash_shingles_batch(tokenize(c)), 3))
        return set(h.tolist()), simhash_from_hashes(h)

    base_sh, base_sim = fp(content)
    # margins leave slack for the engine's 128-lane MinHash *estimate* of
    # Jaccard (σ≈0.04 at the 0.7 vote threshold): accept only edits ≥2σ
    # inside both votes so no base-variant edge is decided by estimator noise
    for n_renames in (2, 1, 1, 1, 0, 0):
        cand = _edit_once(rng, content, n_renames)
        cand_sh, cand_sim = fp(cand)
        jac = len(base_sh & cand_sh) / max(1, len(base_sh | cand_sh))
        ham = bin((base_sim ^ cand_sim) & ((1 << 64) - 1)).count("1")
        if jac >= 0.78 and ham <= 7:
            return cand
    # n_renames=0 (comment+blank only) always lands well inside thresholds
    return cand


def generate_files(
    seed: int = 42,
    n_exact_families: int = 10,
    n_near_families: int = 10,
    n_singletons: int = 15,
    giant_family_size: int = 0,
    include_corrupt: bool = True,
) -> list[FileRow]:
    """Build the planted corpus. Returns rows with a truth ``family`` label
    (family == '' means singleton/corrupt: duplicate of nothing)."""
    rng = random.Random(seed)
    rows: list[FileRow] = []
    fam = 0

    def lang() -> str:
        return rng.choices(LANGS, weights=LANG_WEIGHTS, k=1)[0]

    def emit(family: str, content: str, i: int) -> None:
        r = rng.randrange(8)
        repo = f"org{r}/repo{r}"
        path = f"src/pkg{rng.randrange(6)}/mod_{family or 'solo'}_{i}.py"
        rows.append(
            FileRow(repo, path, _commit_for(repo, len(rows)), lang(), content, family)
        )

    for _ in range(n_exact_families):
        fam += 1
        base = _base_doc(rng, fam)
        for i in range(rng.randint(3, 6)):
            emit(f"exact{fam}", base, i)

    for _ in range(n_near_families):
        fam += 1
        base = _base_doc(rng, fam)
        emit(f"near{fam}", base, 0)
        for i in range(1, rng.randint(3, 5)):
            emit(f"near{fam}", _near_edit(rng, base), i)

    for _ in range(n_singletons):
        fam += 1
        emit("", _base_doc(rng, fam, n_lines=rng.randint(20, 60)), 0)

    if giant_family_size:
        fam += 1
        base = _base_doc(rng, fam)
        for i in range(giant_family_size):
            emit(f"giant{fam}", base, i)

    if include_corrupt:
        emit("", "", 0)            # empty
        emit("", " \n\t \n", 1)    # whitespace-only
        emit("", "x", 2)           # 1-byte

    return rows


def files_dataframe(spark, rows: list[FileRow]):
    """FileRow list → files DataFrame (truth label dropped — input schema
    is exactly BASELINE.json's (repo, path, commit, lang, content))."""
    return spark.createDataFrame(
        [(r.repo, r.path, r.commit, r.lang, r.content) for r in rows],
        "repo string, path string, commit string, lang string, content string",
    )


def file_id_of(row: FileRow) -> str:
    return hashlib.sha256(
        f"{row.repo}\x00{row.path}\x00{row.commit}".encode()
    ).hexdigest()


def truth_clusters(rows: list[FileRow]) -> dict[str, str | None]:
    """file_id → truth cluster label (min file_id of family; None=singleton)."""
    by_family: dict[str, list[str]] = {}
    for r in rows:
        if r.family:
            by_family.setdefault(r.family, []).append(file_id_of(r))
    out: dict[str, str | None] = {file_id_of(r): None for r in rows}
    for fids in by_family.values():
        label = min(fids)
        if len(fids) >= 2:
            for f in fids:
                out[f] = label
    return out


def labeled_pairs(rows: list[FileRow], seed: int = 42, n_negatives: int = 500):
    """(id1, id2, is_duplicate) — all within-family positives + sampled
    cross-family negatives (FIXTURES.md §2)."""
    rng = random.Random(seed)
    truth = truth_clusters(rows)
    ids = sorted(truth)
    pos = []
    by_family: dict[str, list[str]] = {}
    for r in rows:
        if r.family:
            by_family.setdefault(r.family, []).append(file_id_of(r))
    for fids in by_family.values():
        fids = sorted(fids)
        for i in range(len(fids)):
            for j in range(i + 1, len(fids)):
                pos.append((fids[i], fids[j], True))
    neg = set()
    while len(neg) < n_negatives:
        a, b = rng.sample(ids, 2)
        if truth[a] is None or truth[a] != truth[b]:
            neg.add((min(a, b), max(a, b), False))
    return pos + sorted(neg)
