"""Remaining analytic surface: pivot, lead/lag deltas, exact percentiles.

Not in the reference (it has no analytics engine at all) — included so a
user of a full engine finds the standard analytic toolbox present and
oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..core.fixtures import commit_log, read_log, with_fixtures
from ..core.io import load_table
from ..core.registry import register

FLAGS = ("A", "N", "R")


@register(
    "q_pivot",
    oracle="""
        SELECT CAST(l_linenumber AS INTEGER) AS l_linenumber,
               count(*) FILTER (WHERE l_returnflag = 'A') AS n_A,
               count(*) FILTER (WHERE l_returnflag = 'N') AS n_N,
               count(*) FILTER (WHERE l_returnflag = 'R') AS n_R
        FROM lineitem
        GROUP BY l_linenumber
        """,
    tags=("agg", "pivot"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: return-flag counts spread into columns per line number.

    Spark's pivot with an explicit value list stays a single aggregation
    (no second pass to discover pivot values — at scale always pass the
    list). The oracle is the equivalent FILTERed aggregation.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_linenumber")
        .pivot("l_returnflag", list(FLAGS))
        .agg(F.count(F.lit(1)))  # count(*) is not allowed inside pivot
    )
    return pivoted.select(
        "l_linenumber",
        *[F.coalesce(F.col(f), F.lit(0)).alias(f"n_{f}") for f in FLAGS],
    )


@register(
    "q_lead_lag",
    oracle=with_fixtures(
        """
        SELECT commit_id,
               commit_time_ms,
               commit_time_ms - lag(commit_time_ms) OVER w  AS delta_vs_prev,
               lead(commit_time_ms) OVER w - commit_time_ms AS delta_vs_next
        FROM commit_log
        WHERE commit_id < 100
        WINDOW w AS (ORDER BY commit_id)
        """,
        "commit_log",
    ),
    tags=("window", "lead-lag"),
)
def q_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-latency deltas between consecutive commits (lag/lead).

    The drift-detection shape for the commit-latency stream; restricted to
    the first 100 commits so the global-order window stays a bounded
    metadata scan (at scale: partition the window by day/table first).
    """
    cl = commit_log(spark, sf_dir).filter(F.col("commit_id") < 100)
    w = Window.orderBy("commit_id")
    return cl.select(
        "commit_id",
        "commit_time_ms",
        (F.col("commit_time_ms") - F.lag("commit_time_ms").over(w)).alias("delta_vs_prev"),
        (F.lead("commit_time_ms").over(w) - F.col("commit_time_ms")).alias("delta_vs_next"),
    )


@register(
    "q_percentiles",
    oracle=with_fixtures(
        """
        SELECT
          quantile_cont(ttfb_ms, 0.5)  AS p50_ttfb,
          quantile_cont(ttfb_ms, 0.95) AS p95_ttfb,
          quantile_cont(ttfb_ms, 0.99) AS p99_ttfb,
          CAST(max(ttfb_ms) AS BIGINT) AS max_ttfb
        FROM read_log
        """,
        "read_log",
    ),
    tags=("agg", "percentile"),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated latency percentiles over the read log.

    percentile() is the exact (sort-based) path — fine on metadata-scale
    logs; for data-scale columns use q_approx_stats' sketch percentiles.
    ttfb_ms is integral so the linear interpolation is exact in both
    engines (halves of integers).
    """
    rl = read_log(spark, sf_dir)
    return rl.agg(
        F.expr("percentile(ttfb_ms, 0.5)").alias("p50_ttfb"),
        F.expr("percentile(ttfb_ms, 0.95)").alias("p95_ttfb"),
        F.expr("percentile(ttfb_ms, 0.99)").alias("p99_ttfb"),
        F.max("ttfb_ms").cast("bigint").alias("max_ttfb"),
    )
