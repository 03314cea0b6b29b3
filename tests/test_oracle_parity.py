"""Every registered query must match its DuckDB oracle twin exactly
(row count + columns + order-insensitive values) — the same gate the
driver applies at sf0.01."""

from __future__ import annotations

import pytest

from iceberg_benchmark_poc_spark.core.registry import all_queries

from .conftest import SF_DIR, compare_query_to_oracle

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    q = QUERIES[name]
    if q.oracle is None:
        assert q.fn(spark, SF_DIR).count() >= 0  # rows-only check, mirroring the driver
        return
    compare_query_to_oracle(spark, duck, name, q.fn, q.oracle)
