"""Approximate and skew-aware aggregation queries.

q_salted_agg is oracle-gated (salting is a physical rewrite — the logical
result is exactly the unsalted groupBy). q_approx_stats has NO oracle twin:
HLL/quantile-sketch results are engine-specific by design, so the driver
applies its rows-only check (the documented non-SQL-expressible case); the
engine-side test instead bounds the approximation error against exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..core.io import load_table
from ..core.registry import register
from ..operators.skew import salted_count, salted_join


@register(
    "q_salted_agg",
    oracle="""
        SELECT l_returnflag, count(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
        """,
    tags=("agg", "skew"),
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof two-phase count by a low-cardinality (hence hot) key.

    l_returnflag has 3 values — the worst case for a naive shuffle (3
    reducers own everything). Salting by l_orderkey spreads each flag across
    16 partial groups; the merge shuffle carries 48 rows. Result is
    bit-identical to the plain groupBy, which is exactly what the oracle
    checks.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return salted_count(li, ["l_returnflag"], F.col("l_orderkey"), n_salts=16)


@register(
    "q_salted_join",
    oracle="""
        SELECT p_brand,
               count(*) AS n_items,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS brand_revenue
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand
        """,
    tags=("join", "skew"),
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof replicated-salt equi-join (logical result: the plain join).

    The join half of the salting family (q_salted_agg is the aggregation
    half): lineitem joins part on (l_partkey, salt) with part replicated 8x,
    so a hot part key's rows spread across 8 reducers instead of one. The
    oracle checks the unsalted join's per-brand rollup — salting is a
    physical rewrite and must be row-invisible.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, p, "l_partkey", F.col("l_orderkey"), n_salts=8)
    return joined.groupBy("p_brand").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("brand_revenue"),
    )


@register("q_approx_stats", oracle=None, tags=("agg", "approx"))
def q_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based statistics: approx distinct + approx quantiles.

    The constant-memory path for 100 TB profiling: HyperLogLog counters and
    quantile sketches merge associatively across partitions, so these run in
    one combine-shuffle pass regardless of cardinality. No oracle (sketches
    are engine-specific); tests bound the error against exact answers.

    Quantiles are returned as three scalar doubles (q50/q95/q99) rather than
    one array column: the driver's rows-only canonicalization sorts cell
    values and list cells are unhashable (r02 red row).
    """
    li = load_table(spark, sf_dir, "lineitem")
    q = F.expr("approx_percentile(l_extendedprice, array(0.5, 0.95, 0.99))")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.element_at(q, 1).alias("price_q50"),
        F.element_at(q, 2).alias("price_q95"),
        F.element_at(q, 3).alias("price_q99"),
    )
