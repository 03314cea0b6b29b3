"""Mimic the driver gate: run every queries() entry at sf0.01 against its
DuckDB oracle and compare row count + sorted columns + order-insensitive
value hash + arrow-level result types. Exit non-zero on any mismatch.

Deliberately uses a BARE SparkSession (no engine confs) — the real driver
builds its own session, and round 1 proved session-dependent behavior
(events.parquet nanos handling) only surfaces under that condition.

SPARK_GRAFT_VERIFY_SF overrides the scale (default 0.01 — the driver's
gate). Run it at 0.1 periodically: that 10x sweep is what exposed the
DECIMAL(38,10)->double conversion-ulp divergence in the revenue folds
(round 3) that sf0.01 could not reach.
"""

import importlib.util
import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

from tests.conftest import _arrow_type_class, _spark_type_class  # noqa: E402

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '16')}]")
    .appName("verify-driver-mimic")
    # local-mode driver heap holds executors too; sf10 sweeps need >6g —
    # override with SPARK_GRAFT_DRIVER_MEM (must be set before JVM launch)
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "6g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

n = len(mod.entry(spark).collect())
assert n > 0, "t1 smoke: entry() returned no rows"
print(f"t1 smoke OK ({n} rows)")

# SPARK_GRAFT_VERIFY_DIR points at any table directory (e.g. the /tmp/sf1
# scale-up from scratch/make_sf1.py); SPARK_GRAFT_VERIFY_SF picks a stock
# testdata scale
SF = os.environ.get(
    "SPARK_GRAFT_VERIFY_DIR",
    f"/root/testdata/sf{os.environ.get('SPARK_GRAFT_VERIFY_SF', '0.01')}",
)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return repr(v)


def key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


oracles = mod.oracle_sql()
failures = []
only = set(sys.argv[1:])  # optional: verify just these query names
n_checked = 0
for name, fn in sorted(mod.queries().items()):
    if only and name not in only:
        continue
    n_checked += 1
    try:
        s_df = fn(spark, SF)
        s_rows = s_df.collect()
    except Exception as e:
        print(f"{name:28s} ERR  {str(e)[:140]}")
        failures.append(name)
        continue
    if name not in oracles:
        # mimic the driver's rows-only canonicalization: pandas sort over all
        # columns — unhashable cells (lists/arrays) crash it (r02 q_approx_stats)
        try:
            import pandas as pd

            pdf = pd.DataFrame([tuple(r) for r in s_rows], columns=s_df.columns)
            pdf.sort_values(by=list(pdf.columns))
            print(f"{name:28s} rows-only: {len(s_rows)} rows (canon OK)")
        except Exception as e:
            print(f"{name:28s} FAIL rows-only canon: {str(e)[:120]}")
            failures.append(name)
        continue
    d_rel = con.sql(oracles[name])
    d_arrow = d_rel.arrow()
    d_rows = [tuple(r) for r in d_rel.fetchall()]
    d_cols = list(d_rel.columns)
    ok_cols = sorted(s_df.columns) == sorted(d_cols)
    ok_count = len(s_rows) == len(d_rows)
    # the driver hashes *typed* values: HUGEINT/DECIMAL vs BIGINT is a FAIL
    # even when every value compares equal in python
    d_types = {f.name: _arrow_type_class(f.type) for f in d_arrow.schema}
    s_types = {c: _spark_type_class(t) for c, t in s_df.dtypes}
    type_mismatch = {
        c: (s_types[c], d_types[c])
        for c in s_types
        if c in d_types and s_types[c] != d_types[c]
    }
    ok_vals = ok_cols and ok_count and key(
        [tuple(r) for r in s_rows], s_df.columns
    ) == key(d_rows, d_cols)
    ok = ok_cols and ok_count and ok_vals and not type_mismatch
    status = "OK" if ok else "FAIL"
    extra = f" types={type_mismatch}" if type_mismatch else ""
    print(f"{name:28s} {status}  rows={len(s_rows)}/{len(d_rows)} cols_ok={ok_cols} vals_ok={ok_vals}{extra}")
    if not ok:
        failures.append(name)

if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print(f"{n_checked}/{len(mod.queries())} queries verified at {SF}")
