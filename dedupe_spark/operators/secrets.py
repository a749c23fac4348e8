"""Secret/credential redaction for source-code corpora.

The Stack (v1 §5, v2 §5) and StarCoder both run a secrets pass before
release: cloud access keys, private-key blocks, and hard-coded credential
assignments are replaced with typed placeholder tokens. This is the
code-payload sibling of ``operators/pii.py`` (emails/IPs/phones) — the
reference engine has no analog (SURVEY.md §2 addendum).

Scale shape: pure JVM ``regexp_replace`` / ``regexp_count`` column
expressions — narrow, no shuffle, whole-stage codegen; scan-bound at any
corpus size, fuses with adjacent projections.

Regex discipline (same as pii.py): constructs with identical semantics in
Java regex (Spark) and RE2 (DuckDB oracle twin) only — character classes,
bounded repetition, inline ``(?i)``, alternation. No lookaround, no
backreferences in PATTERNS. The key=value rule keeps its left context via
a capture group, which the two engines spell differently in the
REPLACEMENT string ($1 vs \\1) — the oracle SQL uses its own dialect's
spelling, the regexes themselves are shared constants.

Redaction order is aws → private-key → assignment, each counted on the
text as it was BEFORE that stage's replacement (pii.py convention), so a
token consumed by an earlier stage is never double-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# AWS access-key IDs: fixed AKIA prefix + 16 uppercase base32 chars.
AWS_KEY_RE = r"AKIA[0-9A-Z]{16}"

# PEM private-key blocks. The body class is base64 + whitespace and
# excludes '-', so the greedy match cannot run past the END marker — no
# lazy quantifier needed (lazy/greedy parity between engines is then moot).
# Whitespace is the explicit class [ \t\n\f\r], never \s: Java's \s
# includes \x0B, RE2's doesn't, and the twin must match byte-for-byte.
PRIVATE_KEY_RE = (
    r"-----BEGIN [A-Z ]*PRIVATE KEY-----"
    r"[A-Za-z0-9+/= \t\n\f\r]*"
    r"-----END [A-Z ]*PRIVATE KEY-----"
)

# Hard-coded credential assignments: key name, = or :, quoted value of
# ≥ 8 token chars. Group 1 (name) and group 2 (separator) are preserved
# by the replacement so surrounding code still parses.
ASSIGNMENT_RE = (
    r"(?i)\b(api[_-]?key|secret|token|password)([ \t\n\f\r]*[=:][ \t\n\f\r]*)"
    r"[\"'][A-Za-z0-9_\-]{8,}[\"']"
)

AWS_TOKEN = "<AWS_KEY>"
PRIVATE_KEY_TOKEN = "<PRIVATE_KEY>"
SECRET_TOKEN = "<SECRET>"
# Spark (Java regex) replacement spelling; the DuckDB twin uses \1\2.
ASSIGNMENT_REPLACEMENT = '$1$2"' + SECRET_TOKEN + '"'


def redact_secrets(df: DataFrame, *, text_col: str = "content") -> DataFrame:
    """Replace ``text_col`` with the redacted text and append counters
    ``n_aws_keys``, ``n_private_keys``, ``n_assignments``. Row count and
    all other columns are preserved."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, AWS_KEY_RE, AWS_TOKEN)
    t2 = F.regexp_replace(t1, PRIVATE_KEY_RE, PRIVATE_KEY_TOKEN)
    t3 = F.regexp_replace(t2, ASSIGNMENT_RE, ASSIGNMENT_REPLACEMENT)
    return df.select(
        *[c for c in df.columns if c != text_col],
        t3.alias(text_col),
        F.regexp_count(t0, F.lit(AWS_KEY_RE)).alias("n_aws_keys"),
        F.regexp_count(t1, F.lit(PRIVATE_KEY_RE)).alias("n_private_keys"),
        F.regexp_count(t2, F.lit(ASSIGNMENT_RE)).alias("n_assignments"),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--text-col", default="content")
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="redact_secrets")
    out = redact_secrets(spark.read.parquet(a.input), text_col=a.text_col)
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("n_assignments")).show(20, truncate=60)
