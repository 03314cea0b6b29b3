"""Streaming deduplication and stream-stream interval joins.

Both are written once for batch AND streaming inputs, like windows.py: the
same function produces the oracle-checkable batch result on a static frame
and the stateful streaming operator on a readStream frame. Tests assert the
two agree (stream-batch unification), which is what lets a 100 TB/day
pipeline run its backfill and its live path through one code path.

Scale notes:
- ``dedup_events`` state is one entry per event_id within the watermark
  horizon — ``dropDuplicatesWithinWatermark`` evicts entries once the
  watermark passes, so state is bounded by (arrival rate x horizon), not by
  stream history. Exactly the at-least-once -> effectively-once repair a
  Kafka ingest needs in front of the micro-batch committer (ingest.py).
- ``attribution_join`` is the canonical stream-stream time-interval join:
  click and purchase streams equi-join on user_id with the purchase
  constrained to [click_ts, click_ts + horizon]. Watermarks on both sides
  plus the interval bound let Spark drop join state once no future match is
  possible; shuffle is by user_id on both sides (co-partitioned equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEDUP_WATERMARK = "2 hours"
ATTRIBUTION_HORIZON_MIN = 60  # purchases attribute to clicks within 1 hour


def dedup_events(events: DataFrame, watermark: str | None = None) -> DataFrame:
    """Drop duplicate event_ids (redelivered events) from the stream.

    Streaming: ``dropDuplicatesWithinWatermark`` — two arrivals of the same
    event_id more than the watermark apart are considered distinct (their
    state has been evicted), which is the documented trade for bounded state.
    Batch twin: plain ``dropDuplicates`` over the whole frame.
    """
    if events.isStreaming:
        return events.withWatermark("ts", watermark or DEDUP_WATERMARK).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def attribution_join(
    clicks_src: DataFrame,
    purchases_src: DataFrame | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Attribute each purchase to the user's clicks in the preceding hour.

    Inner equi-join on user_id with an event-time interval bound
    (click_ts <= buy_ts <= click_ts + horizon). Pass one events frame (it is
    filtered into the two legs) or two separate frames — streaming callers
    pass two readStream instances of the same source.
    """
    purchases_src = clicks_src if purchases_src is None else purchases_src
    wm = watermark or DEDUP_WATERMARK

    clicks = clicks_src.filter(F.col("event_type") == "click")
    purchases = purchases_src.filter(F.col("event_type") == "purchase")
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", wm)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", wm)

    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("buy_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        F.col("value").alias("buy_value"),
    )
    cond = (
        (c["user_id"] == p["buy_user"])
        & (p["buy_ts"] >= c["click_ts"])
        & (p["buy_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_HORIZON_MIN} MINUTES"))
    )
    return c.join(p, cond, "inner").select(
        "user_id", "click_id", "click_ts", "buy_id", "buy_ts", "buy_value"
    )


def attribution_join_outer(
    clicks_src: DataFrame,
    purchases_src: DataFrame | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Attribution including unconverted clicks: stream-stream LEFT OUTER join.

    Same legs and interval bound as ``attribution_join``, but clicks with no
    purchase inside the horizon survive with NULL purchase columns — the
    shape every funnel/abandonment pipeline needs. In streaming mode Spark
    emits the matched rows as they join and holds each unmatched click in
    state until the watermark passes ``click_ts + horizon``; only then can
    no future purchase match, so only then is the NULL row emitted and the
    state evicted. Both watermarks plus the interval bound make that state
    bounded by (click rate x (horizon + watermark)) — without them a
    streaming outer join is unrunnable, which is why Spark rejects it.

    Batch twin: the identical plan on static frames is a plain left-outer
    interval join (q_stream_attribution_outer, oracle-gated).
    """
    purchases_src = clicks_src if purchases_src is None else purchases_src
    wm = watermark or DEDUP_WATERMARK

    clicks = clicks_src.filter(F.col("event_type") == "click")
    purchases = purchases_src.filter(F.col("event_type") == "purchase")
    if clicks.isStreaming:
        clicks = clicks.withWatermark("ts", wm)
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", wm)

    c = clicks.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("buy_user"),
        F.col("event_id").alias("buy_id"),
        F.col("ts").alias("buy_ts"),
        F.col("value").alias("buy_value"),
    )
    cond = (
        (c["user_id"] == p["buy_user"])
        & (p["buy_ts"] >= c["click_ts"])
        & (p["buy_ts"] <= c["click_ts"] + F.expr(f"INTERVAL {ATTRIBUTION_HORIZON_MIN} MINUTES"))
    )
    return c.join(p, cond, "left_outer").select(
        "user_id", "click_id", "click_ts", "buy_id", "buy_ts", "buy_value"
    )


def enrich_events(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Enrich the event stream with customer attributes: stream-static join.

    The third streaming join family next to dedup (stateful) and the
    interval join (stream-stream): a STATELESS per-batch join of the live
    stream against a slowly-changing static dimension. Spark re-plans the
    static side each micro-batch (picking up dimension updates) and, with
    the explicit broadcast, ships the dimension to every stream task — no
    shuffle ever touches the stream side, so throughput is the map-rate of
    the stream. The rollup to (mktsegment, event_type) then partial-
    aggregates; with watermarkless complete-mode output its state is one
    row per group, independent of stream length.

    Works identically on a static events frame (the oracle-gated batch
    twin q_stream_enrich) — stream-batch unification, as windows.py.
    """
    dims = customers.select(
        F.col("c_custkey").alias("cust_id"),
        "c_mktsegment",
    )
    joined = events.join(F.broadcast(dims), events.user_id == dims.cust_id)
    # fold value as exact integer cents (floor(x*100)) and divide at output:
    # summing a DOUBLE via DECIMAL would hit the double->DECIMAL rounding-tie
    # divergence (Spark HALF_UP on shortest repr vs DuckDB binary rounding);
    # the integer fold is the same IEEE chain on both engines
    return joined.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        (F.sum(F.floor(F.col("value") * 100).cast("bigint")) / 100.0).alias("total_value"),
    )
