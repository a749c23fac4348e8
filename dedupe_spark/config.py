"""Pipeline configuration.

Mirrors the reference CLI surface (/root/reference/dedupe.py:14-37):
threshold (0-64 Hamming over a 64-bit fingerprint, default 10), consensus
agreement k (default 2 of 3 signals), sample limit, dry-run, quiet — plus
the Spark-side knobs the reference has no analog for (LSH geometry, skew
salting, checkpointing).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- similarity semantics (reference parity) -------------------------
    # Hamming threshold over the 64-bit simhash; reference default 10/64
    # (dedupe.py:17-18, validated range 0-64 at dedupe.py:84-85).
    hamming_threshold: int = 10
    # Consensus: how many of the similarity signals must agree
    # (reference: 2 of {ahash,dhash,phash}, dedupe.py:19-20;
    #  here: 2 of {sha-equal, simhash-Hamming, MinHash-Jaccard}).
    require_agreement: int = 2
    # MinHash-Jaccard estimate threshold for the Jaccard vote.
    jaccard_threshold: float = 0.7

    # --- fingerprinting ---------------------------------------------------
    shingle_k: int = 3          # token-shingle width
    # content normalization before fingerprinting: "raw" (byte-identical
    # semantics, reference parity), "type1" (comments/layout stripped —
    # The Stack v2 comment-stripped near-dedup) or "type2" (additionally
    # folds identifiers+literals — clone-candidate granularity). See
    # operators/clones.py; size/lines stats always describe raw bytes.
    normalize: str = "raw"
    # simhash fingerprint width for the standalone simhash dedup — the
    # reference's hash_size precision/recall dial (dedupe.py:84-90,
    # hash_size 8/16 → 64/256-bit hashes). 64 (default) keeps the single
    # LongType fast path; wider multiples of 64 use array<long>
    # fingerprints (functions.fingerprint.make_wide_simhash_udf).
    simhash_bits: int = 64
    num_perm: int = 128         # MinHash permutations
    lsh_bands: int = 32         # b
    lsh_rows: int = 4           # r; b*r must equal num_perm
    # s-curve threshold ≈ (1/b)^(1/r) = (1/32)^(1/4) ≈ 0.42 — recall ≥0.99
    # for true Jaccard ≥ 0.8 (the fixture families' floor, FIXTURES.md §1).

    # --- scale / skew -----------------------------------------------------
    # LSH buckets larger than this get salted (split) so the within-bucket
    # self-join stays bounded; giant exact-dup groups are pre-collapsed
    # before CC either way (SURVEY.md §4.2).
    max_bucket_size: int = 2000
    bucket_salt: int = 16
    # bounded candidate degree: each bucket member links to at most this
    # many successors per band (random per-band order) — candidates are
    # O(n · bands · neighbors) instead of Σ bucket² (blocking.py docstring).
    # With 32 bands this still gives each member ~128 distinct partners; small
    # families (≤6) get full pairwise coverage either way.
    neighbors_per_band: int = 4
    # after cross-band dedup, keep each file's top-K partners by LSH
    # evidence (n_bands) — bounds scoring + CC input to O(n · K)
    max_candidate_degree: int = 8

    # --- clustering -------------------------------------------------------
    min_cluster_size: int = 2   # groups require ≥2 members (duplicate_detector.py:88-89)
    cc_max_iterations: int = 50
    # representative ranking: "default" = format-priority tuple (W4);
    # "quality" = weighted text-quality score (W5, the reference's
    # compare_images alternative, quality_assessor.py:114-136)
    rep_order: str = "default"

    # --- run control ------------------------------------------------------
    sample: int | None = None   # row-limit debugging (dedupe.py:33-34)
    dry_run: bool = False
    run_id: str = "run0"
    warehouse: str = "/tmp/dedupe_spark_warehouse"
    langs: list[str] = field(default_factory=list)  # empty → all (extension filter analog)

    def __post_init__(self) -> None:
        if not (0 <= self.hamming_threshold <= 64):
            raise ValueError("hamming_threshold must be in [0, 64]")
        if not (1 <= self.require_agreement <= 3):
            raise ValueError("require_agreement must be in [1, 3]")
        if self.lsh_bands * self.lsh_rows != self.num_perm:
            raise ValueError("lsh_bands * lsh_rows must equal num_perm")
        if self.simhash_bits < 64 or self.simhash_bits % 64:
            raise ValueError("simhash_bits must be a positive multiple of 64")
        if self.normalize not in ("raw", "type1", "type2"):
            raise ValueError("normalize must be 'raw', 'type1' or 'type2'")
        if self.rep_order not in ("default", "quality"):
            raise ValueError("rep_order must be 'default' or 'quality'")
        if self.min_cluster_size < 2:
            raise ValueError("min_cluster_size must be >= 2 (pairs at minimum)")
