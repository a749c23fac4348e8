"""Fellegi–Sunter probabilistic record linkage (JASA'69).

The decision-theoretic core of classical entity resolution — and of its
modern Spark incarnations (Splink, JedAI): each candidate pair gets a
log-likelihood-ratio **match weight** summed over per-field agreement
evidence, where

- ``m_f`` = P(field f agrees | pair is a true match)   — supplied by the
  caller (domain knowledge) or estimated by EM on agreement patterns,
- ``u_f`` = P(field f agrees | pair is a non-match)    — estimated from
  the data itself: the probability two *random* records agree on f,
  which is Σ_v C(count_v, 2) / C(n, 2) over f's value histogram.

Weight contribution per field: ``log2(m/u)`` on agreement,
``log2((1-m)/(1-u))`` on disagreement, **0 when either side is null**
(missing data carries no evidence either way — Christen 2012 §6.3).
Posterior match probability given a prior λ follows from Bayes in odds
form: ``odds = λ/(1-λ) · 2^weight``, ``p = odds/(1+odds)``.

This generalizes the reference's fixed consensus vote
(hash_generator.py:160-187: k-of-n boolean signals with equal say) to
*calibrated, data-driven* per-signal evidence — the reason a frequency-
aware linker can know that agreeing on a rare surname means far more
than agreeing on a market segment.

Scale design (10^12-record posture):

- ``u_probabilities`` is one scan: per-field (field, value) rows emitted
  with a single ``explode`` of a literal struct array, then two chained
  partial aggregations. The explode multiplies rows ×|fields| but
  map-side combine collapses them immediately; no joins, no windows.
- m/u land in the plan as **literals** (``estimate_u`` collects the
  ≤|fields|-row aggregate — a bounded driver collect, same contract as
  the IVF centroid collect, similarity.py:378-398), so the per-pair
  scoring is pure whole-stage-codegen arithmetic: zero joins, zero
  Python, on the candidate-pair stream.
- Candidate generation reuses the blocked, skew-guarded pairing of
  :mod:`dedupe_spark.operators.linkage` — no all-pairs path exists.
- EM (``estimate_m_u``) iterates on the **agreement-pattern contingency
  table** (≤ 2^|fields| rows, fields capped at 16), never on pairs: one
  Spark aggregation compresses billions of pairs to the sufficient
  statistics, then numpy runs the E/M steps driver-side in microseconds.
  Deterministic: fixed init, fixed iteration count.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from dedupe_spark.operators.linkage import (
    DEFAULT_HOT_BLOCK_WINDOW,
    DEFAULT_MAX_BLOCK,
)

MAX_EM_FIELDS = 16  # 2^16 pattern rows — the EM collect stays bounded


def u_probabilities(df: DataFrame, *, fields: list[str]) -> DataFrame:
    """Per-field random-agreement probability from the value histogram.

    Returns (field, n, n_nonnull, n_distinct, u) where
    ``u = Σ_v C(count_v, 2) / C(n, 2)`` over non-null values and ``n``
    counts ALL rows (a pair involving a null cannot agree but is still a
    possible pair, so it belongs in the denominator).

    One scan: explode a literal array of (field, value-as-string)
    structs, then groupBy twice — both aggregations combine map-side.
    Casting to string for the common explode type is safe here because
    equality on the cast never merges distinct values of the base
    numeric/date types Spark renders canonically.
    """
    if not fields:
        raise ValueError("fields must be non-empty")
    tagged = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f).alias("field"),
                        F.col(f).cast("string").alias("val"),
                    )
                    for f in fields
                ]
            )
        ).alias("fv")
    ).select("fv.field", "fv.val")
    counts = tagged.groupBy("field", "val").agg(F.count("*").alias("c"))
    agg = counts.groupBy("field").agg(
        F.sum("c").alias("n"),
        F.coalesce(
            F.sum(F.when(F.col("val").isNotNull(), F.col("c"))), F.lit(0)
        ).alias("n_nonnull"),
        F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias(
            "n_distinct"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("val").isNotNull(),
                    F.col("c") * (F.col("c") - 1) / 2.0,
                )
            ),
            F.lit(0.0),
        ).alias("_agree_pairs"),
    )
    return agg.select(
        "field",
        "n",
        "n_nonnull",
        "n_distinct",
        F.when(
            F.col("n") > 1,
            F.col("_agree_pairs") / (F.col("n") * (F.col("n") - 1) / 2.0),
        )
        .otherwise(F.lit(0.0))
        .alias("u"),
    )


def estimate_u(df: DataFrame, *, fields: list[str]) -> dict[str, float]:
    """Collect :func:`u_probabilities` into literals for plan folding.

    Bounded driver collect: exactly ``len(fields)`` rows. Clamps into
    (0, 1) open interval so the log-odds weights stay finite even for an
    all-distinct (u→0) or constant (u→1) field.
    """
    rows = u_probabilities(df, fields=fields).collect()
    eps = 1e-9
    return {r["field"]: min(max(float(r["u"]), eps), 1.0 - eps) for r in rows}


def value_frequencies(df: DataFrame, *, field: str) -> DataFrame:
    """(val, tf) term-frequency table for one field: tf = share of
    non-null rows carrying the value. The normalizing total is a 1-row
    aggregate broadcast over the VOCABULARY-sized count table (never the
    record stream), the scan_warnings pattern."""
    counts = (
        df.filter(F.col(field).isNotNull())
        .groupBy(F.col(field).alias("val"))
        .agg(F.count("*").alias("c"))
    )
    total = counts.agg(F.sum("c").alias("_tot"))
    return counts.crossJoin(F.broadcast(total)).select(
        "val", (F.col("c") / F.col("_tot")).alias("tf")
    )


def field_pairs(
    df: DataFrame,
    *,
    id_col: str,
    block_cols: list[str],
    fields: list[str],
    max_block: int | None = DEFAULT_MAX_BLOCK,
    tf_fields: list[str] | None = None,
    hot_block_window: int | None = DEFAULT_HOT_BLOCK_WINDOW,
) -> DataFrame:
    """Within-block candidate pairs carrying every comparison field on
    both sides: (id1, id2, l_<f>, r_<f>..., *block_cols,
    from_hot_block), id1 < id2.

    The multi-field sibling of ``linkage.candidate_pairs`` with the same
    skew guard AND the same hot-block degradation: block sizes from a
    partial aggregation; blocks over the cap route through sorted-
    neighborhood pairing ordered by (block, first comparison field) —
    O(n·w) candidates instead of the r4 recall cliff (zero pairs) —
    with every field value carried on both sides, so FS scoring runs
    unchanged. ``hot_block_window=None`` restores the hard drop. As in
    ``candidate_pairs``, ``from_hot_block`` is a branch literal (filters
    on it constant-fold through the union) and the hot census is
    materialized once — empty census skips the whole fallback subtree.
    Unlike the single-field variant, null comparison values do NOT drop
    the row — Fellegi–Sunter treats missing fields as zero-evidence, so
    a record with one null attribute must still pair on the others.

    ``tf_fields`` (⊆ fields) additionally carries each record's own
    value term-frequency as ``l_tf_<f>`` / ``r_tf_<f>`` (null for null
    values) — one vocabulary-sized join per TF field on the RECORD
    stream, so the per-pair cost of term-frequency adjustment is zero.
    """
    tf_fields = tf_fields or []
    unknown = set(tf_fields) - set(fields)
    if unknown:
        raise ValueError(f"tf_fields not in fields: {sorted(unknown)}")
    keyed = df.select(
        F.col(id_col).alias("_rid"),
        *[F.col(c) for c in block_cols],
        *[F.col(f).alias(f"_v_{f}") for f in fields],
    ).filter(F.col("_rid").isNotNull())
    # null block keys never co-block (SQL join-equality semantics would
    # drop them anyway); make it explicit so the census doesn't count them
    for c in block_cols:
        keyed = keyed.filter(F.col(c).isNotNull())
    for f in tf_fields:
        vf = value_frequencies(df, field=f).withColumnsRenamed(
            {"val": f"_v_{f}", "tf": f"_tf_{f}"}
        )
        keyed = keyed.join(vf, f"_v_{f}", "left")

    val_cols = [f"_v_{f}" for f in fields] + [f"_tf_{f}" for f in tf_fields]
    hot_pairs = None
    if max_block is not None:
        hot = (
            keyed.groupBy(*block_cols)
            .agg(F.count("*").alias("_n"))
            .filter(F.col("_n") > max_block)
            .select(*block_cols)
        ).localCheckpoint(eager=True)
        cold = keyed.join(F.broadcast(hot), block_cols, "left_anti")
        if hot_block_window is not None and not hot.isEmpty():
            from dedupe_spark.operators.linkage import (
                sorted_neighborhood_pairs,
            )

            hot_rows = keyed.join(F.broadcast(hot), block_cols, "left_semi")
            snm = sorted_neighborhood_pairs(
                hot_rows,
                id_col="_rid",
                sort_cols=[*block_cols, f"_v_{fields[0]}"],
                window=hot_block_window,
                carry_sort_cols=True,
                carry_cols=val_cols,
            )
            same_block = F.lit(True)
            for c in block_cols:
                same_block = same_block & (F.col(f"l_{c}") == F.col(f"r_{c}"))
            swap = F.col("id1") > F.col("id2")

            def pick(side_l: str, side_r: str, col: str, alias: str):
                return F.when(
                    swap, F.col(f"{side_r}_{col}")
                ).otherwise(F.col(f"{side_l}_{col}")).alias(alias)

            hot_pairs = snm.filter(same_block).select(
                F.least("id1", "id2").alias("id1"),
                F.greatest("id1", "id2").alias("id2"),
                *[pick("l", "r", f"_v_{f}", f"l_{f}") for f in fields],
                *[pick("r", "l", f"_v_{f}", f"r_{f}") for f in fields],
                *[pick("l", "r", f"_tf_{f}", f"l_tf_{f}") for f in tf_fields],
                *[pick("r", "l", f"_tf_{f}", f"r_tf_{f}") for f in tf_fields],
                *[F.col(f"l_{c}").alias(c) for c in block_cols],
                F.lit(True).alias("from_hot_block"),
            )
        keyed = cold

    a = keyed.select(
        *[F.col(c) for c in block_cols],
        F.col("_rid").alias("id1"),
        *[F.col(f"_v_{f}").alias(f"l_{f}") for f in fields],
        *[F.col(f"_tf_{f}").alias(f"l_tf_{f}") for f in tf_fields],
    )
    b = keyed.select(
        *[F.col(c) for c in block_cols],
        F.col("_rid").alias("id2"),
        *[F.col(f"_v_{f}").alias(f"r_{f}") for f in fields],
        *[F.col(f"_tf_{f}").alias(f"r_tf_{f}") for f in tf_fields],
    )
    out = a.join(b, block_cols).filter(F.col("id1") < F.col("id2")).select(
        "id1",
        "id2",
        *[F.col(f"l_{f}") for f in fields],
        *[F.col(f"r_{f}") for f in fields],
        *[F.col(f"l_tf_{f}") for f in tf_fields],
        *[F.col(f"r_tf_{f}") for f in tf_fields],
        *block_cols,
        F.lit(False).alias("from_hot_block"),
    )
    if hot_pairs is not None:
        out = out.unionByName(hot_pairs)
    return out


def _check_mu(fields: list[str], m: dict[str, float], u: dict[str, float]):
    for f in fields:
        for name, d in (("m", m), ("u", u)):
            if f not in d:
                raise ValueError(f"missing {name}[{f!r}]")
            if not 0.0 < d[f] < 1.0:
                raise ValueError(
                    f"{name}[{f!r}] must be in (0,1), got {d[f]}"
                )


def fs_score(
    pairs: DataFrame,
    *,
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float],
    prior: float | None = None,
    tf_fields: list[str] | None = None,
) -> DataFrame:
    """Add per-field agreement flags and the summed log2-likelihood-ratio
    ``match_weight`` to a ``field_pairs`` output; with ``prior`` λ, also
    the Bayesian posterior ``match_probability``.

    All weights are Python-side constants folded into codegen — the plan
    is a single projection over the pair stream, no joins, no Python.
    ``agree_<f>`` is null when either side is null (missing ⇒ weight 0).

    ``tf_fields`` enables Splink-style **term-frequency adjustment**:
    on agreement the field-level ``u`` is replaced by the shared value's
    own term frequency (the probability a random record agrees with
    THIS value), so agreeing on a rare value earns more evidence than
    agreeing on a common one — ``log2(m / tf_v)`` instead of
    ``log2(m / u)``. Disagreement keeps the field-level weight (no
    single value to condition on). Requires the pairs to carry
    ``l_tf_<f>`` (``field_pairs(tf_fields=...)``); tf is clamped below
    at 1e-9 like u.
    """
    _check_mu(fields, m, u)
    tf_fields = set(tf_fields or [])
    unknown = tf_fields - set(fields)
    if unknown:
        raise ValueError(f"tf_fields not in fields: {sorted(unknown)}")
    weight = F.lit(0.0)
    out = pairs
    for f in fields:
        l, r = F.col(f"l_{f}"), F.col(f"r_{f}")
        agree = F.when(
            l.isNotNull() & r.isNotNull(), (l == r)
        )  # else null: missing
        out = out.withColumn(f"agree_{f}", agree)
        if f in tf_fields:
            # l_tf == r_tf on agreement (same value, same table)
            wa = F.log2(
                F.lit(m[f])
                / F.greatest(F.col(f"l_tf_{f}"), F.lit(1e-9))
            )
        else:
            wa = F.lit(math.log2(m[f] / u[f]))
        wd = F.lit(math.log2((1.0 - m[f]) / (1.0 - u[f])))
        weight = weight + F.when(
            F.col(f"agree_{f}").isNull(), F.lit(0.0)
        ).otherwise(F.when(F.col(f"agree_{f}"), wa).otherwise(wd))
    out = out.withColumn("match_weight", weight)
    if prior is not None:
        if not 0.0 < prior < 1.0:
            raise ValueError(f"prior must be in (0,1), got {prior}")
        odds = F.lit(prior / (1.0 - prior)) * F.pow(
            F.lit(2.0), F.col("match_weight")
        )
        out = out.withColumn("match_probability", odds / (odds + 1.0))
    return out


class GradedLevel:
    """One comparison level of a graded field: ``name``, a ``condition``
    building a boolean Column from (left, right) value Columns — or None
    for the mandatory final catch-all — and the level's m/u
    probabilities (P(level | match) / P(level | non-match))."""

    __slots__ = ("name", "condition", "m", "u")

    def __init__(self, name, condition, m, u):
        self.name = name
        self.condition = condition
        self.m = m
        self.u = u


def fs_score_graded(
    pairs: DataFrame,
    *,
    graded: dict[str, list[GradedLevel]],
    prior: float | None = None,
) -> DataFrame:
    """Multi-level Fellegi–Sunter scoring (Splink's comparison levels):
    instead of binary agree/disagree, each field resolves to the FIRST
    matching level of an ordered cascade — e.g. exact match ≫ small edit
    distance ≫ anything else — each with its own m/u, so partial
    agreement earns partial evidence (``log2(m_level/u_level)``).

    Rules enforced per field: the last level's condition must be None
    (catch-all), every m/u in (0,1), and Σm = Σu = 1 across levels
    (they are distributions over levels — Splink's same invariant).
    Missing values (null either side) contribute 0 and level name
    'missing'. Adds ``level_<f>`` (string) per field plus
    ``match_weight`` (and ``match_probability`` with ``prior``).

    Pure codegen: the cascade compiles to one nested CASE per field with
    all weights folded as literals — no joins, no Python.
    """
    import math as _math

    weight = F.lit(0.0)
    out = pairs
    for f, levels in graded.items():
        if not levels or levels[-1].condition is not None:
            raise ValueError(
                f"field {f!r}: last level must be the catch-all "
                "(condition=None)"
            )
        if any(lv.condition is None for lv in levels[:-1]):
            raise ValueError(
                f"field {f!r}: only the last level may be the catch-all"
            )
        for lv in levels:
            for nm, v in (("m", lv.m), ("u", lv.u)):
                if not 0.0 < v < 1.0:
                    raise ValueError(
                        f"field {f!r} level {lv.name!r}: {nm}={v} "
                        "not in (0,1)"
                    )
        for nm, tot in (
            ("m", sum(lv.m for lv in levels)),
            ("u", sum(lv.u for lv in levels)),
        ):
            if abs(tot - 1.0) > 1e-6:
                raise ValueError(
                    f"field {f!r}: Σ{nm} over levels must be 1, got {tot}"
                )
        l, r = F.col(f"l_{f}"), F.col(f"r_{f}")
        present = l.isNotNull() & r.isNotNull()
        lvl_col = F.when(~present, F.lit("missing"))
        w_col = F.when(~present, F.lit(0.0))
        # build first-match-wins cascade
        for lv in levels[:-1]:
            cond = present & lv.condition(l, r)
            lvl_col = lvl_col.when(cond, F.lit(lv.name))
            w_col = w_col.when(cond, F.lit(_math.log2(lv.m / lv.u)))
        last = levels[-1]
        lvl_col = lvl_col.otherwise(F.lit(last.name))
        w_col = w_col.otherwise(F.lit(_math.log2(last.m / last.u)))
        out = out.withColumn(f"level_{f}", lvl_col)
        weight = weight + w_col
    out = out.withColumn("match_weight", weight)
    if prior is not None:
        if not 0.0 < prior < 1.0:
            raise ValueError(f"prior must be in (0,1), got {prior}")
        odds = F.lit(prior / (1.0 - prior)) * F.pow(
            F.lit(2.0), F.col("match_weight")
        )
        out = out.withColumn("match_probability", odds / (odds + 1.0))
    return out


def fs_link(
    df: DataFrame,
    *,
    id_col: str,
    block_cols: list[str],
    fields: list[str],
    m: dict[str, float],
    u: dict[str, float] | None = None,
    threshold_weight: float,
    max_block: int | None = DEFAULT_MAX_BLOCK,
    hot_block_window: int | None = DEFAULT_HOT_BLOCK_WINDOW,
) -> DataFrame:
    """Full probabilistic linkage arc: block → FS-score → threshold →
    transitive clustering. Returns the ``link_records`` assignment shape
    (id, cluster_id, cluster_size, is_representative).

    ``u=None`` estimates u from the value histograms of ``df`` itself
    (one extra scan + a ≤|fields|-row driver collect). Over-cap blocks
    contribute sorted-neighborhood candidates (``field_pairs``); their
    edges cluster via the global iterative CC, never the per-block
    solver (a hot block's edge set must not land in one task) — same
    split as ``link_records``.
    """
    from pyspark.sql import Window

    from dedupe_spark.operators.cc import (
        connected_components,
        partitioned_components,
    )

    if u is None:
        u = estimate_u(df, fields=fields)
    pairs = field_pairs(
        df,
        id_col=id_col,
        block_cols=block_cols,
        fields=fields,
        max_block=max_block,
        hot_block_window=hot_block_window,
    )
    edges = (
        fs_score(pairs, fields=fields, m=m, u=u)
        .filter(F.col("match_weight") >= threshold_weight)
        .select("id1", "id2", *block_cols, "from_hot_block")
    )
    # single-pass blocking ⇒ components never cross a block (same
    # argument as link_records): solve each block exactly in one shuffle
    comp = partitioned_components(
        edges.filter(~F.col("from_hot_block")), key_cols=block_cols
    )
    if max_block is not None and hot_block_window is not None:
        hot_comp = connected_components(
            edges.filter(F.col("from_hot_block")).select("id1", "id2")
        )
        comp = comp.unionByName(hot_comp)
    ids = df.select(F.col(id_col).alias("id")).filter(F.col("id").isNotNull())
    out = ids.join(
        comp.withColumnRenamed("file_id", "id"), "id", "left"
    ).select("id", F.col("component").alias("cluster_id"))
    w = Window.partitionBy(F.coalesce(F.col("cluster_id"), F.col("id")))
    return out.select(
        "id",
        "cluster_id",
        F.when(F.col("cluster_id").isNotNull(), F.count("*").over(w)).alias(
            "cluster_size"
        ),
        F.when(
            F.col("cluster_id").isNotNull(), F.col("id") == F.min("id").over(w)
        ).alias("is_representative"),
    )


def agreement_patterns(
    scored: DataFrame, *, fields: list[str]
) -> DataFrame:
    """Contingency table of agreement patterns: one row per distinct
    (agree_<f>...) vector with its pair count — the sufficient statistic
    for EM. ≤ 3^|fields| rows (agree / disagree / missing) regardless of
    how many pairs went in; a single partial-aggregating shuffle.
    """
    return scored.groupBy(
        *[F.col(f"agree_{f}") for f in fields]
    ).agg(F.count("*").alias("n_pairs"))


def estimate_m_u(
    patterns: DataFrame | list,
    *,
    fields: list[str],
    n_iter: int = 30,
    init_m: float = 0.9,
    init_u: float = 0.1,
    init_lambda: float = 0.01,
) -> tuple[dict[str, float], dict[str, float], float]:
    """EM estimation of (m, u, λ) from an agreement-pattern contingency
    table (Winkler 1988; the unsupervised core of Splink's training).

    Runs driver-side on the collected pattern counts — bounded by
    ``3^len(fields)`` rows with ``len(fields) <= 16`` enforced, so the
    collect is a few KB however many pairs were scored. Deterministic:
    fixed init, fixed ``n_iter``, no randomness. Missing (null) agreement
    flags are ignored for that field's update (zero-evidence, matching
    ``fs_score``).
    """
    if len(fields) > MAX_EM_FIELDS:
        raise ValueError(
            f"EM supports at most {MAX_EM_FIELDS} fields, got {len(fields)}"
        )
    if isinstance(patterns, DataFrame):
        rows = patterns.collect()
    else:
        rows = patterns
    pats = [
        (tuple(r[f"agree_{f}"] for f in fields), float(r["n_pairs"]))
        for r in rows
    ]
    if not pats:
        raise ValueError("no agreement patterns to fit")
    total = sum(n for _, n in pats)
    eps = 1e-9
    m = {f: init_m for f in fields}
    u = {f: init_u for f in fields}
    lam = init_lambda
    for _ in range(n_iter):
        # E-step: responsibility of the match class per pattern
        resp = []
        for pat, n in pats:
            pm = lam
            pu = 1.0 - lam
            for f, a in zip(fields, pat):
                if a is None:
                    continue
                pm *= m[f] if a else (1.0 - m[f])
                pu *= u[f] if a else (1.0 - u[f])
            g = pm / (pm + pu) if (pm + pu) > 0 else 0.0
            resp.append((pat, n, g))
        # M-step
        wm = sum(n * g for _, n, g in resp)
        lam = min(max(wm / total, eps), 1.0 - eps)
        for i, f in enumerate(fields):
            num_m = den_m = num_u = den_u = 0.0
            for pat, n, g in resp:
                a = pat[i]
                if a is None:
                    continue
                den_m += n * g
                den_u += n * (1.0 - g)
                if a:
                    num_m += n * g
                    num_u += n * (1.0 - g)
            if den_m > 0:
                m[f] = min(max(num_m / den_m, eps), 1.0 - eps)
            if den_u > 0:
                u[f] = min(max(num_u / den_u, eps), 1.0 - eps)
    return m, u, lam


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the entity table")
    p.add_argument("--id-col", required=True)
    p.add_argument("--block-cols", required=True, help="comma-separated")
    p.add_argument("--fields", required=True, help="comma-separated")
    p.add_argument("--m", type=float, default=0.95,
                   help="m-probability applied to every field")
    p.add_argument("--threshold", type=float, default=4.0)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="fs_link")
    fields = a.fields.split(",")
    fs_link(
        spark.read.parquet(a.input),
        id_col=a.id_col,
        block_cols=a.block_cols.split(","),
        fields=fields,
        m={f: a.m for f in fields},
        threshold_weight=a.threshold,
    ).orderBy(F.desc("cluster_size"), "id").show(20, truncate=40)
