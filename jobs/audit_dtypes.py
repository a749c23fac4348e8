"""Dtype-strict audit of every oracled registry query.

The driver's correctness gate hashes TYPED values: a DuckDB oracle that
returns sum()-as-HUGEINT (-> float64 in pandas) against a Spark bigint
column hash-mismatches even when every value is numerically identical
(CORRECTNESS_r04: fs_u_probabilities, cluster_agreement). This audit runs
each query on Spark and its oracle on DuckDB at a small SF and compares
the pandas dtype KIND (int/float/object/bool) column by column, so the
whole class of hazard is caught locally before the driver sees it.

Usage: python jobs/audit_dtypes.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dedupe_spark.plans.queries import registry  # noqa: E402
from dedupe_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def kind(dtype) -> str:
    k = dtype.kind  # i/u -> int, f -> float, O -> object, b -> bool, M -> dt
    return {"u": "i"}.get(k, k)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audit_dtypes", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    bad = []
    for name, (fn, sql) in registry().items():
        if not sql:
            continue
        try:
            sp = fn(spark, sf_dir).toPandas()
            du = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"ERROR {e}"))
            print(f"{name}: ERROR {e}")
            continue
        issues = []
        scols, dcols = sorted(sp.columns), sorted(du.columns)
        if scols != dcols:
            issues.append(f"columns {scols} vs {dcols}")
        else:
            for c in scols:
                ks, kd = kind(sp[c].dtype), kind(du[c].dtype)
                # object-vs-concrete is usually a None-bearing column; only
                # flag the int-vs-float (hash-breaking) disagreement
                if {ks, kd} == {"i", "f"}:
                    issues.append(f"{c}: spark={sp[c].dtype} duck={du[c].dtype}")
        if issues:
            bad.append((name, "; ".join(issues)))
            print(f"{name}: MISMATCH {'; '.join(issues)}")
        else:
            print(f"{name}: ok")
    print(f"\n{len(bad)} queries with dtype mismatches")
    for n, why in bad:
        print(f"  {n}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
