"""Shared fixtures: one SparkSession + one DuckDB connection per test run.

Tests run at sf0.001 (500-6000 rows per table) so the whole oracle-parity
suite stays fast; the driver repeats the identical comparison at sf0.01.
"""

from __future__ import annotations

import datetime
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from iceberg_benchmark_poc_spark.core.session import get_spark

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    spark = get_spark(
        app_name="engine-tests",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g", "spark.sql.autoBroadcastJoinThreshold": "10485760"},
    )
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm(v):
    """Normalize a scalar for cross-engine comparison."""
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    return v


def rows_to_key(rows, columns):
    """Order-insensitive canonical form: sort columns by name, then rows.

    Rows sort by a string key so NULLs and mixed types never raise; equality
    of the sorted lists still compares the actual values.
    """
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    normed = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(normed, key=lambda row: tuple((v is None, str(v)) for v in row))


def compare_query_to_oracle(spark, duck, name, fn, oracle):
    sdf = fn(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(oracle)
    d_cols = [c for c in rel.columns]
    d_rows = rel.fetchall()
    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), f"{name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    sk = rows_to_key(s_rows, s_cols)
    dk = rows_to_key(d_rows, d_cols)
    if sk != dk:
        diff = [(a, b) for a, b in zip(sk, dk) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs {diff}")
