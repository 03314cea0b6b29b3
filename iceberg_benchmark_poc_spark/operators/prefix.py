"""Distributed global prefix sum: exact running totals without a
single-partition window.

``Window.orderBy(...)`` with no partitionBy moves the whole input through
ONE task — fine for metadata-scale sets (bin-pack policy tables, commit
logs), fatal for corpus-scale ones. This operator computes the identical
running sum in two phases, the classic scan-then-offset decomposition:

1. ``repartitionByRange`` on the total order, then a per-range cumulative
   sum (window partitioned by the physical range id — each task sorts and
   scans only its own key range);
2. per-range totals (one row per range — metadata-scale by construction)
   get their own tiny prefix sum and broadcast back as base offsets.

The result is bit-identical to the global window: range boundaries only
decide where the local/global split lands, never the value. AQE-safe —
coalescing merges *adjacent* ranges, so a merged partition is still a
contiguous key range and its window re-sorts it.

The order must be total (include a unique tiebreaker column): with ties
spanning a range boundary the local scan could not reproduce the global tie
order — same caveat as the global window itself, enforced here by requiring
callers to pass a full ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_PID = "__range_pid"
_LOCAL = "__local_cum"
_BASE = "__base_offset"


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column],
    value_col: Column,
    out_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = running sum of ``value_col`` in ``order_cols`` order.

    Equivalent to ``F.sum(value_col).over(Window.orderBy(*order_cols)
    .rowsBetween(unboundedPreceding, currentRow))`` but scales: no task ever
    holds more than one key range, and the only single-partition step is the
    per-range totals table (|ranges| rows).
    """
    ranged = (
        df.repartitionByRange(num_ranges, *order_cols)
        if num_ranges is not None
        else df.repartitionByRange(*order_cols)
    )
    # spark_partition_id is non-deterministic-tagged, so Catalyst cannot push
    # it below the range exchange — it reads the post-shuffle range id.
    #
    # The lazy localCheckpoint is CORRECTNESS, not tuning: with_pid feeds two
    # consumers (the local scan and the per-range offsets), and
    # repartitionByRange draws fresh random sample boundaries on every
    # execution. The two instances normally collapse into one execution via
    # exchange reuse, but reuse is not guaranteed — a cached relation below
    # the exchange defeats it (observed: persisted input => the join side
    # and the offsets side ranged DIFFERENTLY, pids meant different key
    # ranges, silently corrupt running sums). Materializing the ranged+pid
    # relation pins ONE set of range boundaries for both consumers; the
    # exchange still executes exactly once.
    with_pid = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = with_pid.withColumn(_LOCAL, F.sum(value_col).over(w_local))
    # per-range totals: |ranges| rows — the tiny global window here is the
    # point of the decomposition
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy(_PID)
        .agg(F.sum(value_col).alias("__range_total"))  # not max(local cum): exact for negative values too
        .withColumn(_BASE, F.coalesce(F.sum("__range_total").over(w_prev), F.lit(0)))
        .select(_PID, _BASE)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.col(_LOCAL) + F.col(_BASE))
        .drop(_PID, _LOCAL, _BASE)
    )


def global_prefix_max(
    df: DataFrame,
    order_cols: list[Column],
    value_col: Column,
    out_col: str,
    num_ranges: int | None = None,
) -> DataFrame:
    """df + ``out_col`` = max of ``value_col`` over STRICTLY-PRECEDING rows
    in ``order_cols`` order (NULL for the global first row).

    The exclusive-scan sibling of :func:`global_prefix_sum` — same two-phase
    decomposition (per-range local scan + tiny per-range offset table), with
    ``max`` as the monoid and an exclusive frame, which is what dominance /
    skyline tests need ("is anything BEFORE me bigger"). The same total-order
    caveat applies: callers must pass a tie-free ordering (dedupe/collapse
    first), or rows tying across a range boundary would see a different
    'preceding' set than the single-window form.
    """
    ranged = (
        df.repartitionByRange(num_ranges, *order_cols)
        if num_ranges is not None
        else df.repartitionByRange(*order_cols)
    )
    # same two-consumer range-boundary pinning as global_prefix_sum above
    with_pid = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(eager=False)
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = with_pid.withColumn(_LOCAL, F.max(value_col).over(w_local))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        local.groupBy(_PID)
        .agg(F.max(value_col).alias("__range_max"))
        .withColumn(_BASE, F.max("__range_max").over(w_prev))
        .select(_PID, _BASE)
    )
    return (
        local.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.greatest(F.col(_LOCAL), F.col(_BASE)))
        .drop(_PID, _LOCAL, _BASE)
    )
