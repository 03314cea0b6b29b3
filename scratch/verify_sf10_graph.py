"""sf10 spot-parity for the wedge-heavy graph pair (q_clustering_coeff,
q_jaccard_neighbors) — the round-7 COVERAGE gap.

The full-graph DuckDB oracle is infeasible at sf10 on this host: the wedge
materialization spills >78 GB of temp (measured 2026-08-16) and dies on
disk. But /tmp/sf10 is BY CONSTRUCTION 10 disjoint key-shifted sf1 shards
(scratch/make_sf1.py: every key column shifts by copy * OFFSET, so an
order's lineitems never span copies and partkey bands never overlap), and
the co-purchase graph derives from lineitem alone — edges, degrees,
triangles and wedges are all confined to one shard. Therefore:

    full-graph oracle == union over shards of the per-shard oracle
    (cc: row concat; jaccard: histogram summed by decile)

EXACTLY — not approximately. Spark runs the real full-sf10 plan (one graph,
no shard hints); only the ORACLE is sharded, with per-shard peaks at the
already-proven sf1 scale.

Shard predicate: l_partkey // PART_OFFSET = copy (PART_OFFSET = 1e6, the
smallest power of 10 above sf1's max partkey 920,000 — mirrors
make_sf1.OFFSET selection).
"""

import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

SF10 = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/sf10")
PART_OFFSET = 1_000_000
N_SHARDS = 10

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .appName("verify-sf10-graph")
    .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    .config("spark.sql.shuffle.partitions", "64")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from iceberg_benchmark_poc_spark.queries.analytic import (  # noqa: E402
    q_clustering_coeff,
    q_jaccard_neighbors,
)
from iceberg_benchmark_poc_spark.core.registry import get_query  # noqa: E402


def key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


def shard_con(copy: int) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    lo, hi = copy * PART_OFFSET, (copy + 1) * PART_OFFSET
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF10}/lineitem.parquet')"
        f" WHERE l_partkey >= {lo} AND l_partkey < {hi}"
    )
    return con


failures = []

# --- q_clustering_coeff: per-node rows, shard results concatenate ---------
s_df = q_clustering_coeff(spark, SF10)
s_rows = [tuple(r) for r in s_df.collect()]
s_cols = s_df.columns
d_rows: list[tuple] = []
oracle = get_query("q_clustering_coeff").oracle
for c in range(N_SHARDS):
    con = shard_con(c)
    d_rows.extend(tuple(r) for r in con.sql(oracle).fetchall())
    con.close()
ok = len(s_rows) == len(d_rows) and key(s_rows, s_cols) == key(d_rows, s_cols)
print(f"q_clustering_coeff   {'OK' if ok else 'FAIL'}  rows={len(s_rows)}/{len(d_rows)}")
if not ok:
    failures.append("q_clustering_coeff")

# --- q_jaccard_neighbors: <=12-row decile histogram, shards sum ------------
s_df = q_jaccard_neighbors(spark, SF10)
s_rows = [tuple(r) for r in s_df.collect()]
s_cols = s_df.columns
acc: dict[int, list[int]] = {}
oracle = get_query("q_jaccard_neighbors").oracle
for c in range(N_SHARDS):
    con = shard_con(c)
    for dec, n_edges, total_common in con.sql(oracle).fetchall():
        cur = acc.setdefault(dec, [0, 0])
        cur[0] += n_edges
        cur[1] += total_common
    con.close()
d_rows = [(dec, v[0], v[1]) for dec, v in acc.items()]
ok = len(s_rows) == len(d_rows) and key(s_rows, s_cols) == key(d_rows, s_cols)
print(f"q_jaccard_neighbors  {'OK' if ok else 'FAIL'}  rows={len(s_rows)}/{len(d_rows)}")
if not ok:
    failures.append("q_jaccard_neighbors")

if failures:
    print("FAILURES:", failures)
    sys.exit(1)
print("sf10 graph pair: 2/2 hash-exact (sharded oracle, full-graph Spark)")
