"""Stateful streaming operator: state must survive across micro-batches and
converge to the batch-computed truth."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.streaming import (
    split_events_for_streaming,
    stream_events,
    value_threshold_monitor,
)
from iceberg_benchmark_poc_spark.streaming.stateful import ALERT_EVERY

from .conftest import SF_DIR


def test_stateful_monitor_converges_to_batch_truth(spark, tmp_path):
    src = split_events_for_streaming(spark, SF_DIR, str(tmp_path), n_files=5)
    name = f"mon_{uuid.uuid4().hex[:8]}"
    q = (
        value_threshold_monitor(stream_events(spark, src, files_per_trigger=1))
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.table(name).collect()
    assert len(updates) > 0
    # last update per user is the final state (update mode appends per batch)
    final: dict[int, tuple] = {}
    for r in updates:  # memory sink preserves batch order
        final[r["user_id"]] = (r["n_events"], r["cum_value"], r["crossings"])

    truth = {
        r["user_id"]: (r["n"], r["total"])
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(final) == set(truth)
    for uid, (n_events, cum, crossings) in final.items():
        n_true, total_true = truth[uid]
        assert n_events == n_true, uid
        assert abs(cum - total_true) < 1e-6 * max(abs(total_true), 1), uid
        # crossings invariant under arrival order (values are non-negative)
        assert crossings == int(cum // ALERT_EVERY), uid

    # state genuinely accumulated across micro-batches: some user must have
    # been updated in more than one batch
    from collections import Counter

    per_user_updates = Counter(r["user_id"] for r in updates)
    assert max(per_user_updates.values()) > 1


def test_manifest_flush_state_machine(spark, tmp_path):
    """applyInPandasWithState flush machine: thresholds respected, flush
    sequence contiguous across micro-batches, pending remainder below both
    thresholds."""
    from iceberg_benchmark_poc_spark.streaming.stateful import manifest_flush_stream

    flush_bytes, flush_entries = 1 << 20, 64
    max_entry = 200 + 65535

    src = split_events_for_streaming(spark, SF_DIR, str(tmp_path), n_files=5)
    entries = stream_events(spark, src, files_per_trigger=1).select(
        (F.col("user_id") % 4).alias("writer_id"),
        "event_id",
        (F.lit(200) + (F.col("event_id") * 7919) % 65536).alias("entry_bytes"),
    )
    name = f"flush_{uuid.uuid4().hex[:8]}"
    q = (
        manifest_flush_stream(entries, flush_bytes=flush_bytes, flush_entries=flush_entries)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    flushes = spark.table(name).collect()
    assert len(flushes) > 0

    totals = {
        r["writer_id"]: (r["n"], r["b"])
        for r in load_table(spark, SF_DIR, "events")
        .select(
            (F.col("user_id") % 4).alias("writer_id"),
            (F.lit(200) + (F.col("event_id") * 7919) % 65536).alias("entry_bytes"),
        )
        .groupBy("writer_id")
        .agg(F.count("*").alias("n"), F.sum("entry_bytes").alias("b"))
        .collect()
    }
    per_writer: dict[int, list] = {}
    for r in flushes:
        per_writer.setdefault(r["writer_id"], []).append(r)
    assert set(per_writer) == set(totals)  # every writer flushed at least once
    for wid, fl in per_writer.items():
        fl.sort(key=lambda r: r["flush_seq"])
        # contiguous flush sequence from 0 proves state survived micro-batches
        assert [r["flush_seq"] for r in fl] == list(range(len(fl)))
        for r in fl:
            # a flush fires exactly when a threshold is crossed, never later
            assert r["flushed_bytes"] >= flush_bytes or r["n_entries"] >= flush_entries
            assert r["flushed_bytes"] < flush_bytes + max_entry
            assert r["n_entries"] <= flush_entries
        # the unflushed remainder must sit below both thresholds
        total_n, total_b = totals[wid]
        rem_n = total_n - sum(r["n_entries"] for r in fl)
        rem_b = total_b - sum(r["flushed_bytes"] for r in fl)
        assert 0 <= rem_n < flush_entries
        assert 0 <= rem_b < flush_bytes


def test_flush_batch_matches_reference_machine(spark):
    """The vectorized batch replay equals a row-at-a-time port of the
    reference's RootManifest.add_entry/flush_to_leaf loop
    (poc/utils/adaptive_tree.py:96-150)."""
    from iceberg_benchmark_poc_spark.queries.streamlike import (
        FLUSH_Q_BYTES,
        FLUSH_Q_ENTRIES,
        FLUSH_Q_WRITERS,
        q_manifest_flush,
    )

    got = [tuple(r) for r in q_manifest_flush(spark, SF_DIR).collect()]

    entries = sorted(
        (r["user_id"] % FLUSH_Q_WRITERS, r["event_id"], 200 + (r["event_id"] * 7919) % 65536)
        for r in load_table(spark, SF_DIR, "events").select("user_id", "event_id").collect()
    )
    want = []
    state: dict[int, list[int]] = {}
    for wid, eid, nbytes in entries:
        pend_e, pend_b, seq = state.get(wid, [0, 0, 0])
        pend_e, pend_b = pend_e + 1, pend_b + nbytes
        if pend_b >= FLUSH_Q_BYTES or pend_e >= FLUSH_Q_ENTRIES:
            want.append((wid, seq, pend_e, pend_b, eid))
            pend_e, pend_b, seq = 0, 0, seq + 1
        state[wid] = [pend_e, pend_b, seq]
    want.sort(key=lambda t: (t[0], t[1]))

    assert got == want
