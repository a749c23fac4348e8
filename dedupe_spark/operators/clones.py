"""Code-clone detection — type-1/type-2 clone groups via normalization.

Clone-detection taxonomy (Roy & Cordy 2007; SourcererCC, Allamanis
"The Adverse Effects of Code Duplication" 2019): type-1 clones are
identical up to whitespace and comments; type-2 additionally allow
renamed identifiers and changed literals. Code-pretraining pipelines
dedup at exactly these levels — The Stack v2 runs a comment-stripped
near-dedup pass precisely because raw sha misses reformatted copies.
The reference engine groups byte-identical files only
(duplicate_detector.py); this extends the same exact-hash grouping to
normalized content (SURVEY.md §2 addendum).

Approach: a deterministic regex normalization chain (shared constants
with the DuckDB oracle twin), then sha256 over the normalized text, then
the usual one-shuffle group-by-hash. Type-2 folds EVERY identifier
(keywords included) to ``id`` and every number to ``0`` — a documented
over-approximation: true type-2 clone checking needs consistent
alpha-renaming (a real lexer), so fold-everything is the standard
blocking key that over-merges (e.g. ``return x`` vs ``yield x``) and
never under-merges. Use the groups as candidates; a verifier with a real
tokenizer would confirm.

Lexing caveats (documented approximations, same discipline as
operators/secrets.py): string literals are folded FIRST so comment
markers inside strings don't trigger comment stripping; an unpaired
quote inside a comment can swallow text up to the next quote;
triple-quoted Python strings are handled as three adjacent literals.
These mislabel a bounded set of pathological files — acceptable for
dedup candidates, never for semantics-preserving transforms.

Scale shape: the normalization chain is one codegen'd projection
(``regexp_replace`` stack fuses into a single whole-stage-codegen
stage), sha256 is JVM ``sha2``, grouping is one hash shuffle on the
digest — identical cost profile to the exact-dedup tier at 10^12 files.

Regex discipline: Java∩RE2 common subset only — explicit character
classes (never ``\\s``: Java's includes \\x0B, RE2's doesn't), inline
flag groups ``(?m)``/``(?s:...)``, non-greedy, no lookaround, no
backreferences.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Double- then single-quoted string literals (escape-aware, single-line).
DQ_STRING_RE = r'"(?:[^"\\\n]|\\.)*"'
SQ_STRING_RE = r"'(?:[^'\\\n]|\\.)*'"
# Block comments: non-greedy dotall body cannot skip past the terminator.
BLOCK_COMMENT_RE = r"/\*(?s:.*?)\*/"
# Line comments, split by marker: '//' (C family) is stripped always;
# '#' only for hash-comment languages — in the C family a leading '#'
# is a preprocessor directive (#include/#define), semantic content that
# must survive normalization (two files differing only in an #include
# are NOT type-1 clones). [^\n]* stops at EOL.
SLASH_COMMENT_RE = r"//[^\n]*"
HASH_COMMENT_RE = r"#[^\n]*"

# Languages whose line comments start with '#'. Lower-cased match; any
# other/unknown lang keeps its '#' lines. (Markdown is deliberately
# absent: '#' there is a heading, not a comment.)
HASH_COMMENT_LANGS = (
    "python", "py", "ruby", "rb", "shell", "sh", "bash", "zsh", "perl",
    "pl", "r", "yaml", "yml", "toml", "make", "makefile", "cmake",
    "julia", "elixir", "nim", "tcl",
)
# Type-2 folds.
NUMBER_RE = r"\b\d+(?:\.\d+)?\b"
IDENT_RE = r"\b[A-Za-z_][A-Za-z0-9_]*\b"
# Layout.
HSPACE_RE = r"[ \t]+"
LINE_EDGE_RE = r"(?m)^ +| +$"
BLANK_RUN_RE = r"\n+"

STRING_TOKEN = '"S"'

# Ordered (pattern, replacement) chains. Literal replacements only (no
# group refs), so the Spark and DuckDB replacement strings are identical.
_T2_FOLDS: list[tuple[str, str]] = [
    (NUMBER_RE, "0"),
    (IDENT_RE, "id"),
]
_LAYOUT_TAIL: list[tuple[str, str]] = [
    (HSPACE_RE, " "),
    (LINE_EDGE_RE, ""),
    (BLANK_RUN_RE, "\n"),
]

LEVELS = ("type1", "type2")


def normalization_steps(
    level: str = "type1", *, hash_comments: bool = True
) -> list[tuple[str, str]]:
    """The ordered (pattern, replacement) chain for a clone level.

    ``hash_comments=False`` omits the '#'-line rule (C-family inputs,
    where '#' opens a preprocessor directive, not a comment)."""
    if level not in LEVELS:
        raise ValueError(f"level must be one of {LEVELS}, got {level!r}")
    head = [
        (DQ_STRING_RE, STRING_TOKEN),
        (SQ_STRING_RE, STRING_TOKEN),
        (BLOCK_COMMENT_RE, " "),
        (SLASH_COMMENT_RE, " "),
    ]
    if hash_comments:
        head.append((HASH_COMMENT_RE, " "))
    folds = _T2_FOLDS if level == "type2" else []
    return head + folds + _LAYOUT_TAIL


def _chain_col(content: Column, level: str, hash_comments: bool) -> Column:
    col = content
    for pat, rep in normalization_steps(level, hash_comments=hash_comments):
        col = F.regexp_replace(col, pat, rep)
    return F.btrim(col, F.lit(" \n"))


def normalize_code_col(
    content: Column, level: str = "type1", lang: Column | None = None
) -> Column:
    """Normalized-source Column: the regex chain + edge trim, all JVM.

    With a ``lang`` Column, '#'-line stripping applies only to
    ``HASH_COMMENT_LANGS`` (lower-cased match) so C-family preprocessor
    directives survive. Without one, BOTH comment styles are stripped —
    a documented over-approximation for lang-less corpora (a '#include'
    line then folds away; pass ``lang`` whenever the schema has it)."""
    if lang is None:
        return _chain_col(content, level, True)
    return F.when(
        F.lower(lang).isin(*HASH_COMMENT_LANGS),
        _chain_col(content, level, True),
    ).otherwise(_chain_col(content, level, False))


def normalize_code_sql(
    expr: str, level: str = "type1", lang_expr: str | None = None
) -> str:
    """The identical chain as DuckDB SQL (oracle twin). Patterns are the
    same constants; single quotes doubled for the SQL literal. With
    ``lang_expr``, mirrors the lang-gated '#' rule as a CASE."""

    def chain(hash_comments: bool) -> str:
        e = expr
        for pat, rep in normalization_steps(level, hash_comments=hash_comments):
            p = pat.replace("'", "''")
            r = rep.replace("'", "''")
            e = f"regexp_replace({e}, '{p}', '{r}', 'g')"
        return f"trim({e}, ' ' || chr(10))"

    if lang_expr is None:
        return chain(True)
    langs = ", ".join(f"'{l}'" for l in HASH_COMMENT_LANGS)
    return (
        f"(CASE WHEN lower({lang_expr}) IN ({langs}) "
        f"THEN {chain(True)} ELSE {chain(False)} END)"
    )


def _lang_of(df: DataFrame, lang_col: str | None) -> Column | None:
    if lang_col is not None and lang_col in df.columns:
        return F.col(lang_col)
    return None


def clone_keys(
    df: DataFrame,
    content_col: str = "content",
    levels: tuple[str, ...] = LEVELS,
    lang_col: str | None = "lang",
) -> DataFrame:
    """Append ``t1_sha``/``t2_sha`` digest columns (one per level), one
    codegen'd projection, no shuffle. When ``lang_col`` exists in the
    schema, '#'-comment stripping is lang-gated (see
    ``normalize_code_col``)."""
    lang = _lang_of(df, lang_col)
    cols = {
        f"t{lvl[-1]}_sha": F.sha2(
            normalize_code_col(F.col(content_col), lvl, lang), 256
        )
        for lvl in levels
    }
    return df.withColumns(cols)


def clone_groups(
    df: DataFrame,
    content_col: str = "content",
    *,
    level: str = "type2",
    min_size: int = 2,
    lang_col: str | None = "lang",
) -> DataFrame:
    """Rows belonging to clone groups of ≥ ``min_size`` members, with
    ``norm_sha`` (the group key) and ``group_size`` appended. One hash
    shuffle on the digest (window count == groupBy-join without the
    join).

    Degenerate rows — NULL content, or text that normalizes to empty
    (whitespace-only / comment-only files) — are excluded BEFORE the
    window: a real corpus holds millions of empty ``__init__.py`` /
    license-header-only files that would otherwise share one norm_sha
    and land in a single window partition (the straggler/OOM shape),
    besides being reported as the corpus's "largest clone group". With
    that junk key removed the digest distributes uniformly, so no
    further skew handling is needed."""
    norm = normalize_code_col(F.col(content_col), level, _lang_of(df, lang_col))
    w = Window.partitionBy("norm_sha")
    return (
        df.withColumn("_norm", norm)
        .filter(F.col("_norm").isNotNull() & (F.col("_norm") != ""))
        .withColumn("norm_sha", F.sha2(F.col("_norm"), 256))
        .drop("_norm")
        .withColumn("group_size", F.count(F.lit(1)).over(w))
        .filter(F.col("group_size") >= min_size)
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--content-col", default="content")
    p.add_argument("--level", choices=LEVELS, default="type2")
    p.add_argument("--min-size", type=int, default=2)
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="clone_groups")
    out = clone_groups(
        spark.read.parquet(a.input),
        content_col=a.content_col,
        level=a.level,
        min_size=a.min_size,
    )
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("group_size")).show(20, truncate=50)
