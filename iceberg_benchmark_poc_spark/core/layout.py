"""Physical layout management: bucketing and sorted writes.

The two layout levers that decide 100 TB join/scan cost before any query
runs:

- **Bucketed tables** co-partition fact tables on their join key at write
  time: a fact-fact equi-join on the bucket key needs ZERO exchanges (both
  sides' partitioning already satisfies the join's distribution requirement).
  This is the engine's answer to the reference's DV-manifest resolution cost:
  bucket both manifests by file_path and resolution is shuffle-free forever.
- **Sorted writes** (sortBy within buckets / sortWithinPartitions before
  plain writes) give the row-group min/max locality the writer-organization
  experiment measures (tab0: 99.2x byte reduction; Iceberg DDL analog:
  ALTER TABLE ... WRITE ORDERED BY).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist df as a bucketed (and bucket-sorted) table.

    n_buckets sizes to the cluster: at 100 TB pick buckets so each bucket
    file lands near the 128 MB-1 GB sweet spot; both sides of a co-located
    join must use identical (cols, n_buckets).
    """
    writer = df.write.bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.mode("overwrite").format("parquet").saveAsTable(table)


def write_sorted(df: DataFrame, path: str, sort_cols: Sequence[str]) -> None:
    """Sorted-layout parquet write (the writer-organization policy).

    sortWithinPartitions keeps the sort shuffle-free — each task sorts its
    own partition, which is exactly what gives narrow per-row-group min/max
    ranges for pruning.
    """
    df.sortWithinPartitions(*sort_cols).write.mode("overwrite").parquet(path)


def colocated_join(spark: SparkSession, left_table: str, right_table: str, left_key: str, right_key: str) -> DataFrame:
    """Equi-join two co-bucketed tables; the plan must contain no Exchange
    (asserted in tests). Call with tables written by write_bucketed with the
    same bucket count."""
    left, right = spark.table(left_table), spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key])
