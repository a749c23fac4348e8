"""Dtype-strict oracle gate (the check test_queries_oracle.py can't do).

The driver hashes TYPED pandas values: DuckDB `sum(int)` returns HUGEINT
(-> float64 via .df()) while Spark returns bigint (-> int64), so a query
can be value-identical yet red on hash (CORRECTNESS_r04:
fs_u_probabilities, cluster_agreement). The value-parity harness compares
with Python `==` where 1500 == 1500.0, so it is blind to this class.
This test compares the pandas dtype KIND column-by-column and fails on
any int-vs-float disagreement, mirroring what the driver's hash sees.

Runs at sf0.001 (dtypes are SF-invariant) to keep the sweep cheap.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from dedupe_spark.plans.queries import registry

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_DTYPES", "/root/testdata/sf0.001")
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


def _kind(dtype) -> str:
    return {"u": "i"}.get(dtype.kind, dtype.kind)


CASES = [(name, fn, sql) for name, (fn, sql) in registry().items() if sql]


@pytest.mark.parametrize("name,fn,sql", CASES, ids=[c[0] for c in CASES])
def test_oracle_dtypes_match(spark, ddb, name, fn, sql):
    sp = fn(spark, SF_DIR).toPandas()
    du = ddb.execute(sql).df()
    assert sorted(sp.columns) == sorted(du.columns), f"{name}: column names"
    bad = []
    for c in sp.columns:
        ks, kd = _kind(sp[c].dtype), _kind(du[c].dtype)
        # object-vs-concrete usually means a None-bearing column (fine for
        # the hash); int-vs-float is exactly the hazard the driver rejects
        if {ks, kd} == {"i", "f"}:
            bad.append(f"{c}: spark={sp[c].dtype} oracle={du[c].dtype}")
    assert not bad, f"{name}: hash-breaking dtype mismatch — " + "; ".join(bad)
