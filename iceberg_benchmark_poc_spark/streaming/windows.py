"""Watermarked window aggregations, written once for batch AND streaming.

Each function takes any events DataFrame (static or streaming) with columns
(ts TIMESTAMP, user_id, event_type, value) and returns the windowed
aggregate. On a streaming input add ``withWatermark`` upstream (helpers here
apply it only when the input is streaming, since watermarks are meaningless
on static frames).

Batch twins live in queries/streamlike.py (date_trunc / gaps-and-islands
formulations the DuckDB oracle can check); tests assert the streaming
micro-batch outputs equal the batch results — the stream-batch unification
guarantee the engine inherits from Spark.

Scale: windowed aggregation state is partitioned by (window, keys) — state
store shards scale with executors; watermarks bound state size by evicting
closed windows, which is what makes these viable on an unbounded 100 TB/day
stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_WATERMARK = "2 hours"
SESSION_GAP = "30 minutes"


def _with_watermark(events: DataFrame, watermark: str | None) -> DataFrame:
    if events.isStreaming:
        return events.withWatermark("ts", watermark or DEFAULT_WATERMARK)
    return events


def tumbling_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour tumbling windows per event_type.

    Streaming twin of q_stream_tumbling (window.start == date_trunc('hour')).
    approx: countDistinct is not streaming-compatible, so n_users uses
    approx_count_distinct on streams; the batch twin keeps the exact count.
    """
    e = _with_watermark(events, watermark)
    distinct_users = (
        F.approx_count_distinct("user_id") if events.isStreaming else F.countDistinct("user_id")
    )
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
            distinct_users.alias("n_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


def sliding_totals(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows).

    Streaming twin of q_stream_sliding.
    """
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("win"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select(F.col("win.start").alias("window_start"), "n_events", "total_value")
    )


def session_totals(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap.

    Streaming twin of q_stream_session (which derives identical sessions via
    lag + cumulative-sum gaps-and-islands so DuckDB can oracle-check it).
    ``session_window`` merges adjacent events server-side; state per open
    session is evicted once the watermark passes the gap.
    """
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.session_window("ts", SESSION_GAP).alias("win"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
    )


def windowed_type_counts(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Per-(1-hour window, event_type) counts — the aggregation half of the
    top-K leaderboard (streaming twin of q_stream_topk's first stage).

    Ranking is NOT streaming-expressible (a rank over an open window would
    re-order on every update), so the leaderboard splits into the
    incremental windowed aggregation (this function — runs identically on
    batch and stream) and ``topk_of_counts`` applied to each emitted
    result set, exactly the foreachBatch-rank production pattern.
    """
    e = _with_watermark(events, watermark)
    return (
        e.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "event_type", "n_events")
    )


def topk_of_counts(counts: DataFrame, k: int = 3) -> DataFrame:
    """Rank a (window_start, event_type, n_events) table to the top-K per
    window with pinned tie order (count desc, type asc) — the batch-side
    finisher of the streaming leaderboard; identical to q_stream_topk's
    rank stage."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(F.desc("n_events"), F.asc("event_type"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "window_start",
            "event_type",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
