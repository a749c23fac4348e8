"""Path-based file classification for source-code corpora.

The Stack (v1 §3, v2 §4) drops vendored trees (``vendor/``,
``node_modules/``, ``third_party/``), generated artifacts (protobuf
stubs, lockfiles) and minified bundles BY PATH before any content pass —
it is the cheapest filter in the pipeline and removes the largest
boilerplate mass. Test-tree detection feeds data-mixing decisions
(down-weight tests) rather than dropping. The reference engine filters
by extension only (dedupe.py's image-extension predicate); this is the
code-payload generalization (SURVEY.md §2 addendum).

Classification is a first-match cascade (most specific first):
``minified`` and ``generated`` beat ``vendored`` beats ``test`` beats
``normal`` — a minified file inside node_modules/ is the minified
problem, not the vendored one, for reporting purposes; either way it is
excluded by :func:`filter_clean_paths`.

Scale shape: one codegen'd rlike cascade over the path column — narrow,
no shuffle, and since the predicate references only ``path`` it pushes
into the scan when the source is partitioned or sorted by path prefix.

Regex discipline (operators/pii.py): Java∩RE2 common subset — explicit
classes, alternation, anchors ``(^|/)`` spelled as a group rather than
lookbehind, ``$`` only immediately after a class that excludes ``\\n``
(paths are single-line, and both engines treat end-anchoring of
newline-free strings identically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dedupe_spark.functions.cascade import cascade_col, cascade_sql_case

MINIFIED_RE = r"\.min\.(js|css)$"
GENERATED_RE = (
    r"(_pb2\.py|\.pb\.go|_generated\.[A-Za-z0-9]+|package-lock\.json"
    r"|yarn\.lock|Cargo\.lock|go\.sum)$"
)
VENDORED_RE = r"(^|/)(vendor|vendors|node_modules|third_party|3rdparty|extern(al)?s?)/"
TEST_RE = r"(^|/)(test|tests|testing|spec|__tests__)/|_test\.[A-Za-z0-9]+$|\.test\.[A-Za-z0-9]+$"

# (class, pattern) — cascade order matters, shared with the SQL twin.
PATH_CLASSES: list[tuple[str, str]] = [
    ("minified", MINIFIED_RE),
    ("generated", GENERATED_RE),
    ("vendored", VENDORED_RE),
    ("test", TEST_RE),
]

NORMAL = "normal"
# Classes excluded from a training corpus; tests are kept (down-weighted
# at mixing time, not dropped here).
EXCLUDED_CLASSES = ("minified", "generated", "vendored")


def path_class_col(path: Column) -> Column:
    """First-match path class, ``normal`` if nothing matches."""
    return cascade_col(path, PATH_CLASSES, NORMAL)


def classify_paths(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Append ``path_class``; rows preserved."""
    return df.withColumn("path_class", path_class_col(F.col(path_col)))


def filter_clean_paths(df: DataFrame, path_col: str = "path") -> DataFrame:
    """Drop minified/generated/vendored files (the Stack's path gate);
    test files survive with their class label for mixing decisions."""
    return classify_paths(df, path_col).filter(
        ~F.col("path_class").isin(*EXCLUDED_CLASSES)
    )


def path_class_sql_case(expr: str) -> str:
    """The identical cascade as a DuckDB CASE expression (oracle twin)."""
    return cascade_sql_case(expr, PATH_CLASSES, NORMAL)


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--path-col", default="path")
    p.add_argument("--clean-only", action="store_true")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="classify_paths")
    df = spark.read.parquet(a.input)
    out = (
        filter_clean_paths(df, a.path_col)
        if a.clean_only
        else classify_paths(df, a.path_col)
    )
    out.groupBy("path_class").count().orderBy(F.desc("count")).show()
