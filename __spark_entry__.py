"""Driver contract for the PySpark engine.

``entry`` runs the flagship query (writer-organization skip rate — the
reference's headline 99.2x finding) at sf0.001 as a smoke check. ``queries``
and ``oracle_sql`` expose every registered operator from
``iceberg_benchmark_poc_spark.queries`` together with its DuckDB oracle twin;
the driver executes both at sf0.01 and hash-compares results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_benchmark_poc_spark.core.registry import driver_ordered_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from iceberg_benchmark_poc_spark.queries.manifests import q_skip_rate

    return q_skip_rate(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions).

    Ordered by verification debt (never-green queries first, then stalest
    greens, round-robined across operator families) so the driver's
    wall-budget-truncated sweep converges to a recent green row for every
    query — see core/registry.py:driver_ordered_queries.
    """
    return {name: q.fn for name, q in driver_ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins; ops without one get the weaker rows-only check."""
    return {
        name: q.oracle for name, q in driver_ordered_queries().items() if q.oracle is not None
    }
