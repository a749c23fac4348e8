"""Deterministic sampling / splitting operators for training-data pipelines.

The reference's only sampling is a row-limit debug sample
(/root/reference/dedupe.py:33-34 → ``PipelineConfig.sample``). A
training-data engine needs content-stable sampling: the same document
lands in the same split/sample on every run, on every cluster size, and
after re-partitioning — so splits are keyed on a content hash of the id,
never on row position or RNG state.

Both operators are pure projections + filters (no shuffle for the
assignment itself; zero UDFs) and their DuckDB oracles are verbatim
equivalents because the md5 hex digest is engine-independent — unlike
``xxhash64`` or per-engine ``hash()`` functions, which differ across
engines and would make the split irreproducible outside Spark.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _hash_key(id_col: str) -> Column:
    """First 4 hex chars of md5(id) — a uniform draw over [0, 65536)."""
    return F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)


def with_split(
    df: DataFrame,
    id_col: str,
    *,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Assign a deterministic train/val/test split by md5-prefix range.

    Fractions are approximate to 1/65536 (the 4-hex-char resolution); the
    assignment is a pure projection — no shuffle, no RNG, stable across
    runs and engines.
    """
    if not (0 < train < 1 and 0 <= val < 1 and train + val < 1):
        raise ValueError("need 0 < train, 0 <= val, train + val < 1")
    key = _hash_key(id_col)
    t_hi = format(int(train * 65536), "04x")
    v_hi = format(int((train + val) * 65536), "04x")
    return df.withColumn(
        "split",
        F.when(key < t_hi, "train").when(key < v_hi, "val").otherwise("test"),
    )


def deterministic_sample(
    df: DataFrame, id_col: str, *, rate: float = 0.1
) -> DataFrame:
    """Content-stable Bernoulli(rate) sample: keep rows whose md5-prefix
    falls under the rate cutoff. Unlike ``df.sample()`` this is stable
    across runs, partitionings, and cluster sizes."""
    if not (0 < rate <= 1):
        raise ValueError("rate must be in (0, 1]")
    if rate >= 1.0:
        # rate 1.0 would format the cutoff as the 5-char '10000', which
        # compares lexicographically BELOW most 4-hex keys — a 100% sample
        # would silently return ~1/16 of the rows. A full sample is the
        # identity.
        return df
    cutoff = format(int(rate * 65536), "04x")
    return df.filter(_hash_key(id_col) < cutoff)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-group content-stable Bernoulli sampling — the data-mixing
    primitive of corpus construction (up-/down-weighting sources or
    languages, as in The Pile / Llama data recipes). ``rates`` maps a
    group value to its keep rate; unlisted groups get ``default_rate``.

    Same md5-prefix draw as ``deterministic_sample`` (stable across runs,
    partitionings, engines), selected per row by a broadcast-free CASE
    chain — the rate table is a query constant, so the whole operator is
    one codegen'd filter, no shuffle, no join. A group rated 1.0 keeps
    every row (the 4-hex cutoff caps at the max key; see
    ``deterministic_sample`` for the '10000' pitfall).
    """
    for g, r in rates.items():
        if not (0 <= r <= 1):
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not (0 <= default_rate <= 1):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")

    def cutoff(rate: float) -> Column:
        # 'ffff' < 'g': 4-hex keys all sort below 'g', so rate 1.0 keeps all
        return F.lit("g" if rate >= 1.0 else format(int(rate * 65536), "04x"))

    cut = None
    for g, r in sorted(rates.items()):
        cond = F.col(group_col) == g
        cut = F.when(cond, cutoff(r)) if cut is None else cut.when(cond, cutoff(r))
    cut = cutoff(default_rate) if cut is None else cut.otherwise(cutoff(default_rate))
    return df.filter(_hash_key(id_col) < cut)


def temperature_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    tau: float = 0.7,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-weighted source resampling — the multilingual /
    multi-source mixing op (mC4 §3.1, XLM-R §3.1: sample group g with
    probability ∝ n_g^τ, τ < 1 flattens the head so low-resource groups
    keep proportionally more of their data).

    Given a row budget ``budget_frac · N``, group g's keep rate is

        r_g = min(1, budget_frac · N · n_g^τ / (Z · n_g)),   Z = Σ n_h^τ

    — downsampling only (rates cap at 1; upweighting beyond a group's own
    size would duplicate rows, a different operator). The draw is the
    same md5-prefix key as ``deterministic_sample``: content-stable
    across runs, partitionings, and engines.

    Unlike ``stratified_sample`` the rates are computed FROM the data:
    one small groupBy builds the per-group counts, a 1-row aggregate
    broadcasts the (N, Z) totals back (never a global window), and the
    per-row cutoff arrives by broadcast-joining the #groups-row rate
    table — the corpus itself is never shuffled, the whole sampled side
    is one codegen'd filter. Rates are rounded to 6 places BEFORE the
    cutoff floor (the float-parity convention — summation/``pow`` noise
    across engines is ~1e-15, far below the 1e-6 grid; same argument as
    the cosine rounding in operators/similarity.py).

    NULL group values form their own stratum (null-safe join) — the same
    NULL-group contract as ``quality_percentile_filter``.
    """
    if not (0 < tau <= 1):
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    if not (0 < budget_frac <= 1):
        raise ValueError(f"budget_frac must be in (0, 1], got {budget_frac}")
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").alias("_n")
    )
    tot = counts.agg(
        F.sum("_n").alias("_total"),  # NOT '_N': resolution is case-insensitive
        F.sum(F.pow(F.col("_n"), F.lit(tau))).alias("_z"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "_g",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(budget_frac)
                * F.col("_total")
                * F.pow(F.col("_n"), F.lit(tau))
                / (F.col("_z") * F.col("_n")),
            ),
            6,
        ).alias("_rate"),
    )
    cut = F.when(F.col("_rate") >= 1.0, F.lit("g")).otherwise(
        F.format_string("%04x", F.floor(F.col("_rate") * 65536).cast("int"))
    )
    return (
        df.join(F.broadcast(rates), F.col(group_col).eqNullSafe(F.col("_g")))
        .filter(_hash_key(id_col) < cut)
        .drop("_g", "_rate")
    )


if __name__ == "__main__":  # library smoke (SURVEY §3.3 per-module CLI)
    import sys

    from dedupe_spark.session import get_spark

    path = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001/documents.parquet"
    spark = get_spark(app_name="sampling_smoke", master="local[2]")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(path)
    with_split(docs, "doc_id").groupBy("split").count().orderBy("split").show()


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    group_col: str,
    *,
    train: float = 0.8,
    val: float = 0.1,
) -> DataFrame:
    """Train/val/test split keyed on the duplicate-GROUP representative,
    not the row — the anti-leakage split of LLM data pipelines.

    ``with_split`` on raw ids puts two copies of the same document on
    both sides of the train/test fence (Lee et al. ACL'22 §6 measure the
    resulting eval inflation); here every row sharing ``group_col``
    (a content sha for exact dups, or a near-dup ``cluster_id`` from
    ``dedup_pipeline`` / ``minhash_lsh_dedupe``) inherits the split of
    the group's MIN id, so a whole duplicate cluster moves as one unit.

    Cost: one group-keyed aggregation (map-side partial: the rep is a
    min) + one shuffle join of the corpus against the (group, rep) pairs
    — both keyed on ``group_col``, so AQE coalesces them into the same
    exchange at scale (a window-min would handle the same grouping in one
    exchange but puts a whole hot cluster in one task — the same skew
    trap ``paradedup`` documents). The split itself stays a pure
    projection on the rep id (md5-prefix ranges, engine-independent).

    A NULL ``group_col`` means "no duplicate-cluster information", not "one
    big cluster of unknowns": null-keyed rows fall out of the equi-join
    (SQL null ≠ null) and are split as singletons on their own id.
    """
    reps = df.groupBy(group_col).agg(F.min(id_col).alias("_rep_id"))
    joined = df.join(reps, group_col, "left").withColumn(
        "_rep_id", F.coalesce("_rep_id", F.col(id_col))
    )
    return with_split(joined, "_rep_id", train=train, val=val).drop("_rep_id")
