"""First-match regex cascade, with its DuckDB CASE twin.

Shared by ``operators/licenses.py`` (license-id cascade) and
``operators/pathfilters.py`` (path-class cascade): an ordered list of
``(label, pattern)`` pairs where the FIRST matching pattern wins and a
default label applies otherwise. One home for the reversed
when/otherwise construction and the SQL-twin CASE generation means a
quoting/NULL/ordering fix lands in exactly one place for both operators.

The Column form is a single codegen'd projection (no shuffle); NULL
input yields the default label in both engines (``rlike(NULL)`` is NULL
→ ``when`` falls through; ``regexp_matches(NULL)`` is NULL → CASE falls
through to ELSE).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F


def cascade_col(
    value: Column, pairs: Iterable[tuple[str, str]], default: str
) -> Column:
    """First-match label Column: built back-to-front so the first pair
    ends up as the outermost ``when`` (highest precedence)."""
    expr: Column = F.lit(default)
    for label, pat in reversed(list(pairs)):
        expr = F.when(value.rlike(pat), F.lit(label)).otherwise(expr)
    return expr


def cascade_sql_case(
    expr: str, pairs: Iterable[tuple[str, str]], default: str
) -> str:
    """The identical cascade as a DuckDB CASE expression (oracle twin).
    Single quotes in patterns/labels are doubled for the SQL literal."""

    def q(s: str) -> str:
        return s.replace("'", "''")

    whens = "\n".join(
        f"  WHEN regexp_matches({expr}, '{q(pat)}') THEN '{q(label)}'"
        for label, pat in pairs
    )
    return f"CASE\n{whens}\n  ELSE '{q(default)}'\nEND"
