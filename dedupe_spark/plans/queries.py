"""SURVEY.md §2 operators as (spark, sf_dir) → DataFrame queries, each with
an equivalent ANSI-SQL oracle for DuckDB (driver correctness gate).

Conventions:
  * every computed column is aliased identically in Spark and SQL — the
    driver sorts columns by name and hashes values, so names must match.
  * float outputs are rounded (4 dp; big money sums 2 dp) to absorb
    accumulation-order differences between engines.
  * every top-k ORDER BY ends with a unique key so the k-set is total-order
    deterministic in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dedupe_spark.operators.dedup import exact_dedupe


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# dedup family (documents table)
# ---------------------------------------------------------------------------


def q_exact_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by sha256(text) — reference exact tier (SURVEY J1a)."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dedupe(docs, "doc_id", "text").orderBy("id")


SQL_EXACT_DEDUPE = """
WITH keyed AS (
  SELECT doc_id AS id, sha256(text) AS sha FROM documents
), g AS (
  SELECT sha, min(id) AS cluster_id, count(*) AS cluster_size
  FROM keyed GROUP BY sha
)
SELECT k.id, g.cluster_id, g.cluster_size,
       (k.id = g.cluster_id) AS is_representative
FROM keyed k JOIN g USING (sha)
"""


def _wordset_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized bag-of-words dedup key: sorted distinct tokens.

    A real training-data dedup technique (normalization-insensitive exact
    dedup); on the synthetic docs it produces non-trivial clusters."""
    docs = _t(spark, sf_dir, "documents")
    key = F.array_join(
        F.array_sort(F.array_distinct(F.split(F.trim(F.col("text")), "\\s+"))), " "
    )
    keyed = docs.select(F.col("doc_id").alias("id"), key.alias("wkey"))
    g = keyed.groupBy("wkey").agg(
        F.min("id").alias("cluster_id"), F.count("*").alias("cluster_size")
    )
    return keyed.join(g, "wkey")


_SQL_WORDSET_KEYED = """
  SELECT doc_id AS id,
         array_to_string(list_sort(list_distinct(
             regexp_split_to_array(trim(text), '\\s+'))), ' ') AS wkey
  FROM documents
"""


def q_wordset_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _wordset_clusters(spark, sf_dir)
        .select(
            "id",
            "cluster_id",
            "cluster_size",
            (F.col("id") == F.col("cluster_id")).alias("is_representative"),
        )
        .orderBy("id")
    )


SQL_WORDSET_DEDUPE = f"""
WITH keyed AS ({_SQL_WORDSET_KEYED}),
g AS (
  SELECT wkey, min(id) AS cluster_id, count(*) AS cluster_size
  FROM keyed GROUP BY wkey
)
SELECT k.id, g.cluster_id, g.cluster_size,
       (k.id = g.cluster_id) AS is_representative
FROM keyed k JOIN g USING (wkey)
"""


def q_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (duplicate_detector.py:155-189): totals over duplicate groups."""
    clusters = _wordset_clusters(spark, sf_dir)
    sizes = (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 2)
    )
    return sizes.agg(
        F.count("*").alias("total_groups"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("total_members"),
        F.coalesce(F.max("n"), F.lit(0)).alias("largest_group"),
        F.round(F.coalesce(F.avg("n"), F.lit(0.0)), 4).alias("avg_group_size"),
    )


SQL_GROUP_STATS = f"""
WITH keyed AS ({_SQL_WORDSET_KEYED}),
sizes AS (
  SELECT min(id) AS cluster_id, count(*) AS n FROM keyed GROUP BY wkey
  HAVING count(*) >= 2
)
SELECT count(*) AS total_groups,
       coalesce(sum(n), 0) AS total_members,
       coalesce(max(n), 0) AS largest_group,
       round(coalesce(avg(n), 0.0), 4) AS avg_group_size
FROM sizes
"""


def q_space_saved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (duplicate_detector.py:176-179): Σ over groups of (Σ sizes − kept size)."""
    docs = _t(spark, sf_dir, "documents")
    clusters = _wordset_clusters(spark, sf_dir).join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    per_group = (
        clusters.groupBy("cluster_id")
        .agg(
            F.count("*").alias("n"),
            (F.sum("n_chars") - F.max("n_chars")).alias("saved"),
        )
        .filter(F.col("n") >= 2)
    )
    return per_group.agg(
        F.coalesce(F.sum("saved"), F.lit(0)).alias("total_space_saved"),
        F.count("*").alias("groups_with_savings"),
    )


SQL_SPACE_SAVED = f"""
WITH keyed AS ({_SQL_WORDSET_KEYED}),
joined AS (
  SELECT k.id, k.wkey, d.n_chars, min(k.id) OVER (PARTITION BY k.wkey) AS cluster_id
  FROM keyed k JOIN documents d ON d.doc_id = k.id
),
per_group AS (
  SELECT cluster_id, count(*) AS n, sum(n_chars) - max(n_chars) AS saved
  FROM joined GROUP BY cluster_id HAVING count(*) >= 2
)
SELECT coalesce(sum(saved), 0) AS total_space_saved,
       count(*) AS groups_with_savings
FROM per_group
"""


def q_top_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1+W2 (duplicate_detector.py:100-101,206-207): top-10 groups by size."""
    clusters = _wordset_clusters(spark, sf_dir)
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count("*").alias("cluster_size"))
        .filter(F.col("cluster_size") >= 2)
        .orderBy(F.desc("cluster_size"), F.asc("cluster_id"))
        .limit(10)
    )


SQL_TOP_GROUPS = f"""
WITH keyed AS ({_SQL_WORDSET_KEYED})
SELECT min(id) AS cluster_id, count(*) AS cluster_size
FROM keyed GROUP BY wkey HAVING count(*) >= 2
ORDER BY cluster_size DESC, cluster_id ASC
LIMIT 10
"""


def q_representative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 argmax-in-group (duplicate_detector.py:113-153): best doc per lang
    by (n_chars desc, doc_id asc) — the deterministic tuple-max window."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang")
    )


SQL_REPRESENTATIVE = """
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM documents
) WHERE rn = 1
"""


def q_survivor_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3/SO2 (file_organizer.py:72-84): representatives ∪ singletons."""
    dd = exact_dedupe(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return dd.filter(
        F.col("is_representative") | (F.col("cluster_size") == 1)
    ).select("id").orderBy("id")


SQL_SURVIVOR_SELECTION = """
WITH keyed AS (
  SELECT doc_id AS id, sha256(text) AS sha FROM documents
), g AS (
  SELECT sha, min(id) AS rep, count(*) AS n FROM keyed GROUP BY sha
)
SELECT k.id FROM keyed k JOIN g USING (sha)
WHERE k.id = g.rep OR g.n = 1
"""


def q_conflict_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (file_organizer.py:194-224): name-conflict `_1,_2,…` suffixing via
    row_number — replaces the reference's sequential mutable-set state."""
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source", "lang").orderBy("doc_id")
    rn = F.row_number().over(w)
    return docs.select(
        "doc_id",
        F.when(rn == 1, F.concat_ws("_", "source", "lang"))
        .otherwise(F.concat(F.concat_ws("_", "source", "lang"), F.lit("_"), (rn - 1)))
        .alias("out_name"),
    ).orderBy("doc_id")


SQL_CONFLICT_SUFFIX = """
SELECT doc_id,
       CASE WHEN rn = 1 THEN source || '_' || lang
            ELSE source || '_' || lang || '_' || CAST(rn - 1 AS VARCHAR) END AS out_name
FROM (
  SELECT doc_id, source, lang,
         row_number() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
  FROM documents
)
"""


# ---------------------------------------------------------------------------
# histograms / error triage (S10, S11, A4, A5)
# ---------------------------------------------------------------------------


def q_lang_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11/A5 (debug_scanner.py:40-47): counts by lang, top-10."""
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("lang"))
        .limit(10)
    )


SQL_LANG_HISTOGRAM = """
SELECT lang, count(*) AS n FROM documents
GROUP BY lang ORDER BY n DESC, lang ASC LIMIT 10
"""


def q_error_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 (dedupe.py:163-170): error-type frequency, sorted desc — same
    shape over the events table's event_type."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("event_type"))
    )


SQL_ERROR_FREQUENCY = """
SELECT event_type, count(*) AS n FROM events
GROUP BY event_type ORDER BY n DESC, event_type ASC
"""


def q_anti_join_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3's anti-join shape: customers with no orders."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


SQL_ANTI_JOIN_SELECTION = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


# ---------------------------------------------------------------------------
# classic analytics (scan/filter/agg/join coverage over TPC-H-ish tables)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical scan→filter→groupBy→agg plan; exercises
    predicate pushdown + partial aggregation."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k: orders ⋈ customer ⋈ nation (nation broadcast)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count("*").alias("n_orders"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, n_name,
       round(sum(o_totalprice), 2) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# text analysis (training-data ops)
# ---------------------------------------------------------------------------


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — JVM-side split, no UDF."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), "\\s+")).alias("n_tokens"),
        F.length("text").alias("n_chars_computed"),
    ).orderBy("doc_id")


SQL_TOKEN_COUNT = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       length(text) AS n_chars_computed
FROM documents
"""


def registry() -> dict[str, tuple[Callable, str | None]]:
    """name → (query fn, oracle SQL or None for rows-only checks)."""
    return {
        "exact_dedupe": (q_exact_dedupe, SQL_EXACT_DEDUPE),
        "wordset_dedupe": (q_wordset_dedupe, SQL_WORDSET_DEDUPE),
        "group_stats": (q_group_stats, SQL_GROUP_STATS),
        "space_saved": (q_space_saved, SQL_SPACE_SAVED),
        "top_groups": (q_top_groups, SQL_TOP_GROUPS),
        "representative": (q_representative, SQL_REPRESENTATIVE),
        "survivor_selection": (q_survivor_selection, SQL_SURVIVOR_SELECTION),
        "conflict_suffix": (q_conflict_suffix, SQL_CONFLICT_SUFFIX),
        "lang_histogram": (q_lang_histogram, SQL_LANG_HISTOGRAM),
        "error_frequency": (q_error_frequency, SQL_ERROR_FREQUENCY),
        "anti_join_selection": (q_anti_join_selection, SQL_ANTI_JOIN_SELECTION),
        "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
        "top_customers": (q_top_customers, SQL_TOP_CUSTOMERS),
        "token_count": (q_token_count, SQL_TOKEN_COUNT),
    }
