"""Mimic the driver gate: run every queries() entry at sf0.01 against its
DuckDB oracle and compare row count + sorted columns + order-insensitive
value hash. Exit non-zero on any mismatch."""

import importlib.util
import math
import sys

import duckdb

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from iceberg_benchmark_poc_spark.core.session import get_spark  # noqa: E402

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

n = len(mod.entry(spark).collect())
assert n > 0, "t1 smoke: entry() returned no rows"
print(f"t1 smoke OK ({n} rows)")

SF = "/root/testdata/sf0.01"
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
for name, fn in sorted(mod.queries().items()):
    s_df = fn(spark, SF)
    s_rows = s_df.collect()
    if name not in oracles:
        print(f"{name:28s} rows-only: {len(s_rows)} rows")
        continue
    d_rel = con.sql(oracles[name])
    d_rows = d_rel.fetchall()
    d_cols = list(d_rel.columns)
    ok_cols = sorted(s_df.columns) == sorted(d_cols)
    ok_count = len(s_rows) == len(d_rows)
    ok_vals = ok_cols and ok_count and key(
        [tuple(r) for r in s_rows], s_df.columns
    ) == key(d_rows, d_cols)
    status = "OK" if (ok_cols and ok_count and ok_vals) else "FAIL"
    print(f"{name:28s} {status}  rows={len(s_rows)}/{len(d_rows)} cols_ok={ok_cols} vals_ok={ok_vals}")
    if status == "FAIL":
        failures.append(name)

if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print(f"all {len(mod.queries())} queries verified at sf0.01")
