"""Function-level extraction and clone census for Python sources.

Allamanis ("The Adverse Effects of Code Duplication in Machine Learning
Models of Code", 2019) and the StarCoder2 dedup ablations both measure
duplication at FUNCTION granularity — file-level dedup misses the ~20-30%
of functions copied between otherwise-distinct files. This operator
extracts top-level Python function blocks and runs the type-2 clone
census over them (operators/clones.py supplies the normalization).
The reference engine groups whole files only — function granularity is
part of the code-payload layer (SURVEY.md §2 addendum).

Extraction is regex-only and deliberately Python-shaped: a top-level
function is a ``^def `` line plus every following line that is indented
or blank. Brace-delimited languages need balanced-brace matching, which
no regex (Java or RE2) can express — a C/JS extractor would be a Pandas
UDF with a real lexer; Python's indentation IS regular, so the JVM/RE2
path works and keeps the oracle twin exact. Nested and class-level defs
stay inside their enclosing block (top-level granularity, documented).

Scale shape: one codegen'd ``regexp_extract_all`` projection + explode
(rows × functions-per-file, bounded ~10¹), the clone normalization
projection, then one partial-agg census shuffle keyed by digest —
uniform keys, no skew handling needed.

Regex discipline: Java∩RE2 common subset — ``(?m)``, explicit classes,
no lookaround/backreferences; the inner per-line unit is bounded by
``\\n`` so the greedy outer star cannot backtrack catastrophically in
Java (RE2 is immune by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dedupe_spark.operators.clones import normalize_code_col

# A top-level def line, then any run of indented-or-blank lines.
PY_FUNC_RE = r"(?m)^def [^\n]+(?:\n(?:[ \t]+[^\n]*)?)*"

# Function name from the block's first line (block always starts "def ").
FN_NAME_RE = r"^def ([A-Za-z_][A-Za-z0-9_]*)"

# Header line + optional leading docstring (PEP 257: the first statement,
# a triple-quoted literal). Group 1 captures a triple-double body, group
# 2 a triple-single body; (?s:.*?) is non-greedy so the match stops at
# the first closing quote — a docstring containing an escaped or single
# quote is fine, one containing a bare triple-quote of its own kind is a
# documented mislabel (same discipline as operators/clones.py lexing
# caveats). Group 0 is the prefix whose removal leaves the body.
DOC_PREFIX_RE = (
    r"^def [^\n]*"
    r"(?:\n[ \t]*(?:\"\"\"((?s:.*?))\"\"\"|'''((?s:.*?))'''))?"
    r"[ \t]*\n?"
)


def py_functions_col(content: Column) -> Column:
    """Array of top-level Python function source blocks (whole matches)."""
    return F.regexp_extract_all(content, F.lit(PY_FUNC_RE), 0)


def extract_py_functions(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("repo", "path"),
) -> DataFrame:
    """One row per (file, function): ``fn_idx`` (0-based position in the
    file) and ``fn_src`` (raw source block). Files with no top-level
    functions drop out (inner explode)."""
    return df.select(
        *id_cols,
        F.posexplode(py_functions_col(F.col(content_col))).alias(
            "fn_idx", "fn_src"
        ),
    )


def extract_docstring_pairs(
    df: DataFrame,
    content_col: str = "content",
    id_cols: tuple[str, ...] = ("repo", "path"),
) -> DataFrame:
    """CodeSearchNet-style (docstring, code) training pairs: one row per
    DOCUMENTED top-level function, with ``fn_idx``, ``fn_name``,
    ``docstring`` (whitespace-trimmed) and ``code`` (the function block
    with header+docstring removed — the completion target).

    Functions without a docstring, or whose body is empty after removing
    the docstring, are dropped (CodeSearchNet keeps only documented
    non-trivial functions). A genuinely empty docstring (``\"\"\"\"\"\"``)
    trims to '' and is treated as undocumented — DuckDB's regexp_extract
    returns NULL where Spark returns '' for an unmatched group, so the
    twin-parity convention is nullif-then-drop on both engines.

    Scale shape: the function explode is map-side (rows ×
    functions-per-file); everything after it is a codegen'd projection +
    filter — no shuffle at all, scan-bound at any corpus size.
    """
    fns = extract_py_functions(df, content_col, id_cols=id_cols)
    src = F.col("fn_src")
    doc_raw = F.coalesce(
        F.nullif(F.regexp_extract(src, DOC_PREFIX_RE, 1), F.lit("")),
        F.nullif(F.regexp_extract(src, DOC_PREFIX_RE, 2), F.lit("")),
    )
    prefix = F.regexp_extract(src, DOC_PREFIX_RE, 0)
    code = F.btrim(
        F.substring(src, F.length(prefix) + F.lit(1), F.length(src)),
        F.lit(" \t\n"),
    )
    return (
        fns.select(
            *id_cols,
            "fn_idx",
            F.regexp_extract(src, FN_NAME_RE, 1).alias("fn_name"),
            F.btrim(doc_raw, F.lit(" \t\n")).alias("docstring"),
            code.alias("code"),
        )
        .filter(
            F.col("docstring").isNotNull()
            & (F.col("docstring") != "")
            & (F.col("code") != "")
        )
    )


def function_clone_census(
    df: DataFrame,
    content_col: str = "content",
    repo_col: str = "repo",
    *,
    level: str = "type2",
    min_copies: int = 2,
) -> DataFrame:
    """Per-function-digest duplication census: how many copies of each
    (normalized) function exist, across how many repos. Returns
    (fn_sha, n_copies, n_repos, sample_src) for digests with
    ≥ ``min_copies`` copies; ``sample_src`` is the lexicographically
    first raw source of the group (min partial-agg, so the census stays
    one shuffle)."""
    fns = extract_py_functions(df, content_col, id_cols=(repo_col,))
    keyed = fns.select(
        F.col(repo_col),
        "fn_src",
        F.sha2(normalize_code_col(F.col("fn_src"), level), 256).alias(
            "fn_sha"
        ),
    )
    return (
        keyed.groupBy("fn_sha")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct(repo_col).alias("n_repos"),
            F.min("fn_src").alias("sample_src"),
        )
        .filter(F.col("n_copies") >= min_copies)
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--content-col", default="content")
    p.add_argument("--repo-col", default="repo")
    p.add_argument("--level", default="type2")
    p.add_argument("--min-copies", type=int, default=2)
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="function_clone_census")
    function_clone_census(
        spark.read.parquet(a.input),
        a.content_col,
        a.repo_col,
        level=a.level,
        min_copies=a.min_copies,
    ).orderBy(F.desc("n_copies")).show(20, truncate=50)
