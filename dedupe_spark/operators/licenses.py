"""License detection for source-code corpora.

The Stack (v1 §3, v2 §4) keeps only permissively-licensed files; license
identity comes from matching canonical header phrases (the approach of
scancode/go-license-detector reduced to its highest-precision rules).
The reference engine has no analog — this is part of the code-payload
training-data layer (SURVEY.md §2 addendum).

Detection is a first-match cascade over distinctive license-text
phrases. The phrases chosen are the legally operative sentences that
appear verbatim in every copy of the license (SPDX canonical texts), so
false positives require quoting another license's operative clause.
``unknown`` is deliberately NOT permissive — the conservative default
for a training-data filter (same safe direction as the fork detector's
under-estimated Jaccard).

Scale shape: one codegen'd projection of ``rlike`` cascades — narrow,
no shuffle, scan-bound at any corpus size; the parquet scan reads only
the content column.

Regex discipline (operators/pii.py): Java∩RE2 common subset — inline
``(?i)``, optional groups, no lookaround, no backreferences. The SQL
oracle twin consumes the same LICENSE_PATTERNS constants in the same
cascade order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dedupe_spark.functions.cascade import cascade_col, cascade_sql_case

# (spdx_id, distinctive-phrase regex, permissive) — cascade order matters
# and is shared verbatim with the SQL twin.
LICENSE_PATTERNS: list[tuple[str, str, bool]] = [
    ("MIT", r"(?i)permission is hereby granted, free of charge", True),
    ("Apache-2.0", r"(?i)apache license,? version 2\.0", True),
    (
        "GPL-family",
        r"(?i)gnu (lesser |affero )?general public license",
        False,
    ),
    (
        "BSD",
        r"(?i)redistribution and use in source and binary forms",
        True,
    ),
    (
        "Unlicense",
        r"(?i)this is free and unencumbered software",
        True,
    ),
]

UNKNOWN = "unknown"

PERMISSIVE_IDS = tuple(n for n, _, perm in LICENSE_PATTERNS if perm)


def license_col(content: Column) -> Column:
    """First-match license id, ``unknown`` if nothing matches."""
    return cascade_col(
        content, [(n, p) for n, p, _ in LICENSE_PATTERNS], UNKNOWN
    )


def detect_license(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Append ``license`` and ``permissive``; rows preserved."""
    return df.withColumn(
        "license", license_col(F.col(content_col))
    ).withColumn("permissive", F.col("license").isin(*PERMISSIVE_IDS))


def filter_permissive(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Keep only files whose detected license is permissive (the Stack's
    release filter). ``unknown`` files are dropped — conservative."""
    return detect_license(df, content_col).filter(F.col("permissive"))


def license_sql_case(expr: str) -> str:
    """The identical cascade as a DuckDB CASE expression (oracle twin)."""
    return cascade_sql_case(
        expr, [(n, p) for n, p, _ in LICENSE_PATTERNS], UNKNOWN
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--content-col", default="content")
    p.add_argument("--permissive-only", action="store_true")
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="detect_license")
    out = (
        filter_permissive(spark.read.parquet(a.input), a.content_col)
        if a.permissive_only
        else detect_license(spark.read.parquet(a.input), a.content_col)
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.groupBy("license", "permissive").count().orderBy(
            F.desc("count")
        ).show(20)
