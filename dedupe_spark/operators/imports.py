"""Import/dependency extraction from source code.

Dependency analysis over a code corpus — which modules a file pulls in —
drives contamination checks (files importing a benchmark harness),
ecosystem stats (The Stack's per-language dependency census) and
dedup-adjacent repo similarity. The reference engine has no analog —
code-payload training-data layer (SURVEY.md §2 addendum).

Four extraction conventions, one capture group each (group 1 is the
module name in every pattern, so both engines extract with group
index 1): Python ``import``/``from … import``, C ``#include`` and
JS/Node ``require('…')``.

Scale shape: ``regexp_extract_all`` over the content column is one
codegen'd projection; the explode multiplies rows by imports-per-file
(bounded, ~10¹ per file); the census aggregate is one hash shuffle with
map-side partial agg. At 10^12 files the pass is scan-bound; hot modules
(stdlib) skew the census groupBy, but a count aggregate is a pure
partial-agg — each partition contributes one row per module, so the hot
key never concentrates rows, only partial sums.

Regex discipline (operators/pii.py): Java∩RE2 common subset — explicit
classes, ``(?m)`` for line anchoring (same semantics both engines), no
lookaround, no backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PY_IMPORT_RE = r"(?m)^[ \t]*import[ \t]+([A-Za-z_][A-Za-z0-9_.]*)"
PY_FROM_RE = r"(?m)^[ \t]*from[ \t]+([A-Za-z_][A-Za-z0-9_.]*)[ \t]+import"
C_INCLUDE_RE = r'#include[ \t]*[<"]([A-Za-z0-9_./]+)[>"]'
JS_REQUIRE_RE = r"""require\(['"]([A-Za-z0-9_./@-]+)['"]\)"""

# (pattern, group index of the module name) — shared with the SQL twin.
IMPORT_PATTERNS: list[tuple[str, int]] = [
    (PY_IMPORT_RE, 1),
    (PY_FROM_RE, 1),
    (C_INCLUDE_RE, 1),
    (JS_REQUIRE_RE, 1),
]


def imports_col(content: Column) -> Column:
    """Array of all module names referenced by a file (all conventions,
    in pattern order then match order)."""
    arrays = [
        F.regexp_extract_all(content, F.lit(pat), grp)
        for pat, grp in IMPORT_PATTERNS
    ]
    return F.concat(*arrays)


def extract_imports(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("repo", "path"),
) -> DataFrame:
    """One row per (file, imported module). Files with no imports drop
    out (inner explode) — a census counts evidence, not absence."""
    return df.select(
        *id_cols, F.explode(imports_col(F.col(content_col))).alias("module")
    )


def dependency_census(
    df: DataFrame,
    content_col: str = "content",
    repo_col: str = "repo",
) -> DataFrame:
    """Per-module usage counts: total import sites and distinct repos.
    One shuffle, map-side partial agg on both measures."""
    mods = extract_imports(df, content_col, id_cols=(repo_col,))
    return mods.groupBy("module").agg(
        F.count(F.lit(1)).alias("n_imports"),
        F.countDistinct(repo_col).alias("n_repos"),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--content-col", default="content")
    p.add_argument("--repo-col", default="repo")
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="dependency_census")
    out = dependency_census(
        spark.read.parquet(a.input), a.content_col, a.repo_col
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("n_imports"), "module").show(20, truncate=50)
