"""Structured Streaming surface of the engine.

The reference benchmarks the *commit pattern* streaming engines create
(reference poc/test_single_file_commits.py:24-27 — single-file commits for
Kafka/Kinesis/Flink ingest) rather than stream operators. This package
provides both halves natively:

- ``ingest``  — micro-batch commit workload: file-source stream +
  ``foreachBatch`` appends with per-commit metrics (the reference's suite 5
  as a real streaming job).
- ``windows`` — watermarked tumbling / sliding / session window
  aggregations; each has a batch twin in ``queries/streamlike.py`` and the
  stream-batch equivalence is asserted in tests (Spark's unified-semantics
  guarantee is part of the engine contract).
"""

from .dedup_join import attribution_join, attribution_join_outer, dedup_events, enrich_events
from .ingest import micro_batch_commit_metrics, split_events_for_streaming, stream_events
from .stateful import value_threshold_monitor
from .windows import session_totals, sliding_totals, topk_of_counts, tumbling_counts, windowed_type_counts

__all__ = [
    "stream_events",
    "split_events_for_streaming",
    "micro_batch_commit_metrics",
    "tumbling_counts",
    "sliding_totals",
    "session_totals",
    "windowed_type_counts",
    "topk_of_counts",
    "value_threshold_monitor",
    "dedup_events",
    "attribution_join",
    "attribution_join_outer",
    "enrich_events",
]
