"""Privacy-preserving record linkage (PPRL) — Bloom-filter encodings.

Schnell, Bachteler & Reiher (BMC Med Inform Decis Mak, 2009): when two
parties must link person records WITHOUT revealing the identifying
strings, each party maps its names' character bigrams through k hash
functions into an m-bit Bloom filter and shares only the bitsets; the
linker scores pairs with the **Dice coefficient** of the filters,

    dice(A, B) = 2·|A ∧ B| / (|A| + |B|),

which approximates bigram-set Dice similarity of the underlying names
(collisions only ever merge bits, a bounded distortion at sensible m/k).
The same encoding doubles as a compact similarity sketch: a 256-bit
filter replaces an arbitrary-length name for comparison purposes.

Spark-first design — everything stays in whole-stage codegen:

- the encoder is ONE projection: bigram extraction, k position hashes,
  and the packed ``array<bigint>`` filter are nested higher-order
  functions (`transform`/`aggregate`/`filter`) — no UDF, no shuffle;
- pair scoring is ``zip_with(bit_count(x & y))`` + a sum — pure integer
  codegen over whatever blocked candidate stream feeds it;
- the position hash is an arithmetic double-hash
  ``h_k(g) = (h0(g)·(2k+1) + k²) mod m`` with
  ``h0 = ascii(g[0])·31 + ascii(g[1])`` — chosen over xxhash64 ONLY so
  the DuckDB oracle can recompute positions exactly (DuckDB lacks
  xxhash64); swap in ``F.xxhash64`` for production hardening, the plan
  shape is identical. NOTE this makes the sketch value-oracle-able but
  NOT cryptographically private — real PPRL uses keyed HMACs; the
  docstring of record for that swap is Schnell §3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bloom_encode(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    m: int = 256,
    k: int = 4,
) -> DataFrame:
    """(id, bloom: array<bigint>, nbits) — the m-bit Bloom encoding of
    ``text_col``'s lowercase character bigrams through k hashes, packed
    64 bits per word. ``nbits`` = number of set bits (distinct
    positions). Names shorter than 2 chars (or null) encode to the empty
    filter with nbits 0."""
    if m % 64 != 0 or m <= 0:
        raise ValueError(f"m must be a positive multiple of 64, got {m}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    nm = f"lower({text_col})"
    grams = (
        f"array_distinct(transform(sequence(1, length({nm}) - 1),"
        f" i -> substring({nm}, i, 2)))"
    )
    pos = (
        f"array_distinct(flatten(transform({grams}, g ->"
        f" transform(sequence(0, {k - 1}), kk ->"
        f" ((ascii(substring(g, 1, 1)) * 31 + ascii(substring(g, 2, 1)))"
        f" * (2 * kk + 1) + kk * kk) % {m}))))"
    )
    words = m // 64
    bloom = (
        f"transform(sequence(0, {words - 1}), w ->"
        f" aggregate(filter({pos}, p -> p div 64 = w),"
        f" cast(0 as bigint),"
        f" (acc, p) -> acc | shiftleft(cast(1 as bigint), int(p % 64))))"
    )
    guarded_bloom = (
        f"case when {text_col} is not null and length({nm}) >= 2"
        f" then {bloom}"
        f" else array_repeat(cast(0 as bigint), {words}) end"
    )
    guarded_nbits = (
        f"case when {text_col} is not null and length({nm}) >= 2"
        f" then size({pos}) else 0 end"
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(guarded_bloom).alias("bloom"),
        F.expr(guarded_nbits).cast("int").alias("nbits"),
    )


def dice_score(
    bloom1="bloom1", bloom2="bloom2", nbits1="nbits1", nbits2="nbits2"
) -> F.Column:
    """Dice coefficient of two packed Bloom filters as a codegen column:
    2·popcount(AND) / (nbits1 + nbits2); null when both filters are
    empty (no evidence either way)."""
    common = F.expr(
        f"aggregate(zip_with({bloom1}, {bloom2}, (x, y) ->"
        f" bit_count(x & y)), 0, (acc, c) -> acc + c)"
    )
    denom = F.col(nbits1) + F.col(nbits2)
    return F.when(denom > 0, 2.0 * common / denom)


def pprl_dice_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block_cols: list[str],
    min_dice: float,
    m: int = 256,
    k: int = 4,
) -> DataFrame:
    """Blocked PPRL matching: encode, pair within blocks (id1 < id2),
    keep pairs at or above the Dice floor. Returns (id1, id2, dice)."""
    if not 0.0 < min_dice <= 1.0:
        raise ValueError(f"min_dice must be in (0,1], got {min_dice}")
    enc = bloom_encode(df, id_col=id_col, text_col=name_col, m=m, k=k)
    keyed = df.select(
        F.col(id_col).alias("id"), *[F.col(c) for c in block_cols]
    ).join(enc, "id")
    a = keyed.select(
        *block_cols,
        F.col("id").alias("id1"),
        F.col("bloom").alias("bloom1"),
        F.col("nbits").alias("nbits1"),
    )
    b = keyed.select(
        *block_cols,
        F.col("id").alias("id2"),
        F.col("bloom").alias("bloom2"),
        F.col("nbits").alias("nbits2"),
    )
    return (
        a.join(b, block_cols)
        .filter(F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(dice_score(), 6).alias("dice"),
        )
        .filter(F.col("dice") >= min_dice)
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the entity table")
    p.add_argument("--id-col", required=True)
    p.add_argument("--name-col", required=True)
    p.add_argument("--block-cols", required=True, help="comma-separated")
    p.add_argument("--min-dice", type=float, default=0.9)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="pprl")
    pprl_dice_pairs(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        name_col=a.name_col,
        block_cols=a.block_cols.split(","),
        min_dice=a.min_dice,
    ).orderBy(F.desc("dice"), "id1", "id2").show(20)
