"""Remaining analytic surface: pivot, lead/lag deltas, exact percentiles.

Not in the reference (it has no analytics engine at all) — included so a
user of a full engine finds the standard analytic toolbox present and
oracle-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..core.fixtures import commit_log, read_log, with_fixtures
from ..core.io import epoch_micros, load_table
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

    With a known value list the pivot is conditional aggregation — one
    count per value in a single groupBy pass (one shuffle, map-side
    combined). Spark's built-in ``.pivot(col, values)`` plans TWO
    aggregations ((key, value) pre-agg + pivotfirst) and shuffles twice —
    reserve it for when the value list must be discovered; at scale,
    enumerate the columns (plan-asserted single-Exchange in tests).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linenumber").agg(
        *[
            F.count(F.when(F.col("l_returnflag") == f, F.lit(1))).alias(f"n_{f}")
            for f in FLAGS
        ]
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


MOV_AVG_WINDOW_S = 1800  # 30-minute trailing window


@register(
    "q_moving_avg",
    oracle=f"""
        WITH e AS (
          SELECT event_id, event_type,
                 CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
                 CAST(value AS DECIMAL(38,6)) AS v
          FROM events
          WHERE user_id % 10 = 0
        )
        SELECT event_id, event_type,
               CAST(n AS BIGINT) AS n_window,
               CAST(sv AS DOUBLE) / n AS mov_avg
        FROM (
          SELECT event_id, event_type,
                 count(*) OVER w AS n,
                 sum(v)   OVER w AS sv
          FROM e
          WINDOW w AS (
            PARTITION BY event_type ORDER BY sec
            RANGE BETWEEN {MOV_AVG_WINDOW_S} PRECEDING AND CURRENT ROW
          )
        )
        """,
    tags=("window", "range-frame", "moving-avg"),
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 30-minute moving average per event type — a RANGE frame.

    The one window-frame family the rest of the registry doesn't exercise:
    a value-range (time) frame rather than a row frame, i.e. the frame size
    varies per row. Partitioned by event_type so it scales horizontally —
    each partition sorts locally and slides one frame over it; no global
    order anywhere. The windowed sum folds through DECIMAL because sliding
    aggregation accumulates in engine-specific order (Spark re-scans the
    frame; DuckDB uses segment trees) — decimal makes the result
    order-independent and therefore bit-identical.
    """
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 10 == 0)
    # floor, not cast-truncate: both engines floor the fractional seconds the
    # same way (DuckDB's double->bigint CAST rounds, so its side floors too)
    sec = F.floor(epoch_micros("ts") / F.lit(1_000_000))
    base = e.select(
        "event_id",
        "event_type",
        sec.cast("bigint").alias("sec"),
        F.col("value").cast("decimal(38,6)").alias("v"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("sec")
        .rangeBetween(-MOV_AVG_WINDOW_S, Window.currentRow)
    )
    return base.select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_window"),
        (F.sum("v").over(w).cast("double") / F.count("*").over(w)).alias("mov_avg"),
    )
