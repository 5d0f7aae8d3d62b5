"""Driver-style correctness sweep: run every queries() entry AND its DuckDB
oracle on the same data; compare row multisets (order- and column-order-
insensitive), exactly like the driver's CORRECTNESS gate.

Usage:
    python scripts/oracle_sweep.py [sf_dir]     # default /root/testdata/sf0.01
    ORACLE_QUERIES=q1,q2 python scripts/oracle_sweep.py   # subset (dev loop)

For non-default sf_dirs the KG oracles are rebuilt against that sf's vault
corpus via the entry module's internals (oracle_sql() itself hardcodes the
driver's sf0.01 paths).
"""

from __future__ import annotations

import importlib.util
import math
import os
import sys
from decimal import Decimal

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
)
E = importlib.util.module_from_spec(spec)
spec.loader.exec_module(E)

from pyspark.sql import SparkSession  # noqa: E402

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in ("documents", "embeddings", "events"):
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
    )


def norm(v):
    if isinstance(v, Decimal):
        f = float(v)
        return int(f) if f.is_integer() else round(f, 9)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return int(v) if v.is_integer() else round(v, 9)
    return v


def rows(cols, data):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    # key=repr: NULL-robust ordering (None < int comparisons would raise)
    return sorted((tuple(norm(r[i]) for i in idx) for r in data), key=repr)


vault_path = E.ensure_vault_corpus(os.path.basename(os.path.normpath(SF_DIR)))
oracles = E._kg_oracles(vault_path)
oracles.update(E._datapipe_oracles())

only = {q for q in os.environ.get("ORACLE_QUERIES", "").split(",") if q}

fails = []
for name in sorted(E.queries()):
    if only and name not in only:
        continue
    df = E.queries()[name](spark, SF_DIR)
    got = rows([c.lower() for c in df.columns], [tuple(r) for r in df.collect()])
    if name in oracles:
        rel = con.sql(oracles[name])
        want = rows([c.lower() for c in rel.columns], rel.fetchall())
        status = "OK " if got == want else "MISMATCH"
        if got != want:
            fails.append(name)
    else:
        status = "rows-only"
    print(f"{name:20s} {status} rows={len(got)}")

print("queries:", len(E.queries()), "oracles:", len(oracles), "FAILS:", fails or "none")
print("entry rows:", len(E.entry(spark).collect()))
sys.exit(1 if fails else 0)
