"""Table IO: load the driver-provided parquet fixtures with normalized schemas.

All queries take an ``sf_dir`` (e.g. /root/testdata/sf0.01) and read the ten
tables from it. Loading goes through here so schema quirks are fixed exactly
once:

- ``events.ts`` is physically TIMESTAMP(NANOS); the session reads it as a
  BIGINT of nanoseconds (``spark.sql.legacy.parquet.nanosAsLong``) and this
  loader converts it to a microsecond TimestampType, matching what DuckDB
  produces for ``CAST(ts AS TIMESTAMP)``.

At 100 TB these reads stay embarrassingly parallel: ``spark.read.parquet`` on
a directory fans out one task per ~128 MB split (``files.maxPartitionBytes``),
and every downstream query in this package filters/projects *before* any
shuffle so Parquet pushdown and column pruning do their job (verify with
``df.explain()`` — PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

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

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # nanos -> micros truncation; identical to DuckDB TIMESTAMP_NS->TIMESTAMP.
        # MUST be integer division: float `/ 1000` rounds epoch-nanos (≈1.7e18,
        # beyond double's 2^53 exact-integer range) and lands ±1 µs off.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register the fixture tables as temp views for spark.sql access."""
    for n, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(n)
