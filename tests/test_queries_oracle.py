"""Mimics the driver's correctness gate: run each queries() entry on Spark
and its oracle_sql() on DuckDB over the same sf0.01 parquet, compare
row-count + column names + order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from dedupe_spark.plans.queries import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 4)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def _row_key(row):
    # null-safe total order (None < everything, then by repr) — mirrors the
    # driver's pandas canonicalizer, which sorts NaN-bearing columns fine
    return tuple((x is None, str(x)) for x in row)


def _spark_rows(df):
    cols = sorted(df.columns)
    return cols, sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_row_key
    )


def _duck_rows(con, sql):
    res = con.execute(sql)
    cols = [d[0] for d in res.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = res.fetchall()
    return sorted(cols), sorted(
        (tuple(_norm(row[i]) for i in order) for row in rows), key=_row_key
    )


CASES = [(name, fn, sql) for name, (fn, sql) in registry().items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_query_matches_oracle(spark, ddb, name, fn, sql):
    scols, srows = _spark_rows(fn(spark, SF_DIR))
    dcols, drows = _duck_rows(ddb, sql)
    assert scols == dcols, f"{name}: column mismatch {scols} vs {dcols}"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    mismatches = [i for i, (a, b) in enumerate(zip(srows, drows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"{srows[mismatches[0]]} vs {drows[mismatches[0]]}"
    )


ROWS_ONLY = [(n, fn) for n, (fn, sql) in registry().items() if sql is None]


@pytest.mark.parametrize(
    "name,fn", ROWS_ONLY, ids=[c[0] for c in ROWS_ONLY]
)
def test_rows_only_queries_run(spark, name, fn):
    """Mirror of the driver's weaker rows-only gate for queries with no
    SQL-expressible oracle (ann_topk / ivf_topk — each has an oracled
    companion): the query must run and return a stable non-empty
    schema; row count >= 0."""
    df = fn(spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.limit(5).collect()
    assert df.count() >= 0
    assert "cluster_id" in df.columns and "is_representative" in df.columns


def test_contract_shapes():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert q and set(o) <= set(q)
