"""PII scrubbing — redact emails, IPv4 addresses, phone numbers.

Every public pretraining pipeline runs a PII pass before release (C4
strips pages on a badword list; CCNet/RefinedWeb/Dolma redact emails,
IPs and phone numbers with exactly this regex-replace shape). The
reference engine has no analog — this is one of the training-data
operators layered on top of its dedup surface (SURVEY.md §2 addendum).

Scale shape: pure JVM ``regexp_count`` / ``regexp_replace`` column
expressions — narrow (per-row, no shuffle, whole-stage codegen), so the
pass is scan-bound at any corpus size and fuses with whatever projection
follows it. No Python anywhere.

The patterns deliberately use only regex constructs with identical
semantics in Java's engine (Spark) and RE2 (the DuckDB oracle twin):
character classes, bounded repetition and ``\\b`` — no lookaround, no
backreferences (RE2 has neither). Scrub order is email → IPv4 → phone,
each counted on the text as it was BEFORE that stage's replacement, so a
token consumed by an earlier stage is never double-counted by a later
pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"

EMAIL_TOKEN = "<EMAIL>"
IP_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def scrub_pii(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Replace ``text_col`` with the redacted text and append counters
    ``n_emails``, ``n_ips``, ``n_phones``. Row count and all other
    columns are preserved."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV4_RE, IP_TOKEN)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return df.select(
        *[c for c in df.columns if c != text_col],
        t3.alias(text_col),
        F.regexp_count(t0, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(t2, F.lit(PHONE_RE)).alias("n_phones"),
    )


if __name__ == "__main__":  # pragma: no cover — library CLI (SURVEY §3.3)
    import argparse

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("input", help="parquet path of the corpus")
    p.add_argument("--text-col", default="text")
    p.add_argument("--out", default=None, help="parquet output (default: show)")
    a = p.parse_args()

    from dedupe_spark.session import get_spark

    spark = get_spark(app_name="pii_scrub")
    out = scrub_pii(spark.read.parquet(a.input), text_col=a.text_col)
    if a.out:
        out.write.mode("overwrite").parquet(a.out)
    else:
        out.orderBy(F.desc("n_emails")).show(20, truncate=80)
