"""Micro-batch ingest: the reference's single-file-commit workload as a real
Structured Streaming job.

Reference suite 5 (poc/test_single_file_commits.py) hand-times JSON manifest
writes per commit to argue streaming engines can commit one file at a time.
Here the same workload is the genuine article: a file-source stream consumed
``maxFilesPerTrigger=1`` so every micro-batch is one input file, committed by
``foreachBatch`` with per-commit metrics (latency, rows, cumulative bytes) —
the numbers the reference synthesizes are measured from a live query instead.

On a cluster the sink would be an Iceberg table (``writeStream.toTable``)
and the catalog provides atomic commit + optimistic retry; parquet append
keeps this runnable offline with identical plan shape.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

#: ts must be LTZ `timestamp` here — Spark watermarks reject TIMESTAMP_NTZ
#: for event time (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The batch twins
#: operate on the NTZ-normalized column, so equivalence depends on the
#: session timezone being UTC; ``stream_events`` pins it (ensure_session_confs)
#: exactly like every batch entry point, so no streaming window's truncation
#: can shift relative to the batch twins in a non-UTC host session.
EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
)


def split_events_for_streaming(
    spark: SparkSession, sf_dir: str, out_dir: str, n_files: int = 20, time_ordered: bool = False
) -> str:
    """Materialize the events fixture as n parquet files (one per micro-batch).

    The ts column is normalized to microseconds here so the streaming schema
    is a plain TIMESTAMP (streaming readers need an explicit schema).

    ``time_ordered=False`` (default) round-robins rows, so every file spans
    the full time range — a redelivery/out-of-order torture feed. With
    ``time_ordered=True`` the files are contiguous time slices in listing
    order (repartitionByRange on ts), modeling an in-order source such as a
    time-bucketed Kafka ingest; this is the feed watermark-eviction
    semantics (outer-join null emission, state GC) need to behave — under
    the round-robin feed a multi-batch run's watermark makes everything
    after the first batch late by construction.
    """
    from ..core.io import load_table

    src = os.path.join(out_dir, "stream_src")
    ev = load_table(spark, sf_dir, "events")
    if time_ordered:
        ev = ev.repartitionByRange(n_files, "ts").sortWithinPartitions("ts")
    else:
        ev = ev.repartition(n_files)
    ev.write.mode("overwrite").parquet(src)
    if time_ordered:
        # the file source orders batches by MODIFICATION TIME, and one write
        # job finishes its part files in arbitrary task order — stamp
        # strictly increasing mtimes in part-index order (part index = range
        # partition id = time order) so maxFilesPerTrigger=1 replays the
        # slices chronologically
        parts = sorted(
            f for f in os.listdir(src) if f.startswith("part-") and not f.endswith(".crc")
        )
        base_t = int(os.path.getmtime(os.path.join(src, parts[0])))
        for i, f in enumerate(parts):
            os.utime(os.path.join(src, f), (base_t + 2 * i, base_t + 2 * i))
    return src


def stream_events(spark: SparkSession, src_dir: str, files_per_trigger: int = 1) -> DataFrame:
    """File-source stream over the split events directory."""
    from ..core.io import ensure_session_confs

    ensure_session_confs(spark)  # same pinning every batch entry point gets
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )


@dataclass
class CommitLog:
    """Driver-side commit metrics collected by foreachBatch."""

    commits: list[dict] = field(default_factory=list)

    def record(self, batch_id: int, n_rows: int, wall_ms: float, bytes_written: int) -> None:
        cum = (self.commits[-1]["cum_bytes"] if self.commits else 0) + bytes_written
        self.commits.append(
            {
                "commit_id": batch_id,
                "n_rows": n_rows,
                "commit_ms": wall_ms,
                "bytes_written": bytes_written,
                "cum_bytes": cum,
            }
        )


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, names in os.walk(path):
        for n in names:
            total += os.path.getsize(os.path.join(root, n))
    return total


def micro_batch_commit_metrics(
    spark: SparkSession,
    src_dir: str,
    sink_dir: str,
    files_per_trigger: int = 1,
) -> CommitLog:
    """Run the ingest stream to completion; return per-commit metrics.

    Every micro-batch is appended to the parquet sink and timed — commit
    latency, rows/commit, and cumulative sink bytes (the reference's
    "manifest growth" curve, measured on real files).
    """
    log = CommitLog()
    out = os.path.join(sink_dir, "sink")

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        before = _dir_bytes(out) if os.path.exists(out) else 0
        n = batch_df.count()
        # timer starts AFTER the row count: commit_ms is the write+commit
        # alone, not count-scan + write (which double-counted the read and
        # overstated per-commit latency ~2x)
        t0 = time.perf_counter()
        batch_df.write.mode("append").parquet(out)
        wall_ms = (time.perf_counter() - t0) * 1000
        log.record(batch_id, n, wall_ms, _dir_bytes(out) - before)

    q = (
        stream_events(spark, src_dir, files_per_trigger)
        .writeStream.foreachBatch(commit)
        .option("checkpointLocation", os.path.join(sink_dir, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return log


# --- exactly-once commit protocol ------------------------------------------


class ExactlyOnceSink:
    """Idempotent foreachBatch sink: replay-safe micro-batch commits.

    Structured Streaming guarantees at-least-once delivery to foreachBatch —
    after a failure the last uncommitted batch_id is REPLAYED. Exactly-once
    therefore lives in the sink: this one keeps a durable ledger of committed
    batch_ids next to the data and skips any batch it has already committed,
    the same idempotence contract an Iceberg catalog commit provides via
    snapshot CAS (the reference's concurrent-writer CAS is the contended
    version of the same idea; reference poc/test_concurrent_writers.py:57-157).

    Commit order per batch:
      1. already in ledger?  -> skip (replay detected), count it
      2. write data to a per-batch directory (re-writable: a torn write is
         overwritten by the replay, never appended twice)
      3. append one "<batch_id>\\n" line to the ledger
    A crash between 2 and 3 replays the batch into the same directory, so
    the data+ledger pair is consistent under any single failure point.

    The ledger is append-only and the committed set is cached in memory
    (loaded once per sink instance — i.e. once per stream (re)start): the
    per-commit critical path is one short O(1) append, not a read-modify-
    rewrite of the whole history (which made commit cost grow with stream
    age — r02 regression). A crash can tear the last append, leaving a
    final line with no trailing newline; the loader TRUNCATES that torn
    tail before any new append (a torn digit fragment must not merge with
    the replay's record into a phantom batch id, and — being a prefix of a
    full record — it cannot be trusted as one either). The affected batch
    then replays into its own directory and re-appends — overwrite +
    re-append converge, so exactly-once holds without fsync-per-commit.
    """

    def __init__(self, out_dir: str) -> None:
        self.out_dir = out_dir
        self.ledger_path = os.path.join(out_dir, "_committed_batches")
        self.replays_skipped = 0
        os.makedirs(out_dir, exist_ok=True)
        self._committed = self._load_ledger()

    def _load_ledger(self) -> set[int]:
        if not os.path.exists(self.ledger_path):
            return set()
        with open(self.ledger_path, "r+b") as f:
            raw = f.read()
            if raw and not raw.endswith(b"\n"):
                # torn final append: drop the fragment ON DISK so a later
                # append cannot merge with it ('12' + '123\n' -> '12123\n',
                # a phantom committed id that would silently skip a batch)
                keep = raw.rfind(b"\n") + 1  # 0 when no complete line exists
                f.truncate(keep)
                raw = raw[:keep]
        out: set[int] = set()
        for line in raw.decode().splitlines():
            line = line.strip()
            if line.isdigit():
                out.add(int(line))
        return out

    def committed(self) -> set[int]:
        return set(self._committed)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in self._committed:
            self.replays_skipped += 1
            return
        batch_df.write.mode("overwrite").parquet(
            os.path.join(self.out_dir, f"batch_id={batch_id}")
        )
        with open(self.ledger_path, "a") as f:
            f.write(f"{batch_id}\n")
        self._committed.add(batch_id)


def exactly_once_ingest(spark: SparkSession, src_dir: str, sink_dir: str) -> ExactlyOnceSink:
    """Run the ingest stream through the idempotent sink to completion."""
    sink = ExactlyOnceSink(os.path.join(sink_dir, "eo_sink"))
    q = (
        stream_events(spark, src_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(sink_dir, "eo_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return sink
