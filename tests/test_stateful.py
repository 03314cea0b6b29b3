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
