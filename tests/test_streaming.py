"""Streaming surface tests: stream-batch equivalence + micro-batch commits.

The window functions run twice — once on the static events table, once as a
Structured Streaming query over the same data (memory sink, availableNow) —
and the results must be identical (modulo the documented approx_count_distinct
substitution). This is the unified-semantics guarantee the engine exposes.
"""

from __future__ import annotations

import uuid

import pytest

from iceberg_benchmark_poc_spark.core.io import load_table
from iceberg_benchmark_poc_spark.streaming import (
    micro_batch_commit_metrics,
    session_totals,
    sliding_totals,
    split_events_for_streaming,
    stream_events,
    topk_of_counts,
    tumbling_counts,
    windowed_type_counts,
)

from .conftest import SF_DIR, rows_to_key


@pytest.fixture(scope="module")
def stream_src(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    return split_events_for_streaming(spark, SF_DIR, base, n_files=10), base


def _run_stream(spark, df, mode: str):
    name = f"t_{uuid.uuid4().hex[:8]}"
    q = df.writeStream.format("memory").queryName(name).outputMode(mode).trigger(availableNow=True).start()
    q.awaitTermination()
    return spark.table(name)


def _assert_same(a_df, b_df, drop=()):
    a_df, b_df = a_df.drop(*drop), b_df.drop(*drop)
    assert sorted(a_df.columns) == sorted(b_df.columns)
    a = rows_to_key([tuple(r) for r in a_df.collect()], a_df.columns)
    b = rows_to_key([tuple(r) for r in b_df.collect()], b_df.columns)
    assert a == b


def test_tumbling_stream_matches_batch(spark, stream_src):
    src, _ = stream_src
    batch = tumbling_counts(load_table(spark, SF_DIR, "events"))
    stream = _run_stream(spark, tumbling_counts(stream_events(spark, src)), "complete")
    # n_users is approx on the stream path (documented) — compare the rest
    _assert_same(batch, stream, drop=("n_users",))


def test_sliding_stream_matches_batch(spark, stream_src):
    src, _ = stream_src
    batch = sliding_totals(load_table(spark, SF_DIR, "events"))
    stream = _run_stream(spark, sliding_totals(stream_events(spark, src)), "complete")
    _assert_same(batch, stream)


def test_topk_stream_matches_batch_and_registered_query(spark, stream_src):
    """The leaderboard splits into a streaming windowed count + a batch rank
    (foreachBatch pattern); the composition must equal both the all-batch
    path and the registered q_stream_topk query."""
    from iceberg_benchmark_poc_spark.core.registry import all_queries

    src, _ = stream_src
    batch_counts = windowed_type_counts(load_table(spark, SF_DIR, "events"))
    stream_counts = _run_stream(
        spark, windowed_type_counts(stream_events(spark, src)), "complete"
    )
    _assert_same(topk_of_counts(batch_counts), topk_of_counts(stream_counts))
    registered = all_queries()["q_stream_topk"].fn(spark, SF_DIR)
    _assert_same(topk_of_counts(stream_counts), registered)


def test_session_stream_matches_batch(spark, stream_src):
    src, _ = stream_src
    batch = session_totals(load_table(spark, SF_DIR, "events"))
    # session-window streams only support append (watermark-gated) or
    # complete; complete keeps every session in state, which is fine for a
    # finite test stream
    stream = _run_stream(
        spark, session_totals(stream_events(spark, src, files_per_trigger=10)), "complete"
    )
    _assert_same(batch, stream)


def test_session_batch_matches_gaps_and_islands(spark):
    """session_window (engine op) == lag+cumsum formulation (oracle-checked)."""
    from iceberg_benchmark_poc_spark.queries.streamlike import q_stream_session

    via_session_window = session_totals(load_table(spark, SF_DIR, "events")).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
    via_islands = q_stream_session(spark, SF_DIR).select(
        "user_id", "session_start", "session_end", "n_events", "total_value"
    )
    _assert_same(via_session_window, via_islands)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append mode + watermark: an event arriving after its window's
    watermark deadline is dropped; the emitted window count excludes it."""
    import os
    import time

    from pyspark.sql import functions as F

    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_file(name: str, rows, mtime: float):
        df = spark.createDataFrame(rows, "ts timestamp, user_id bigint, event_type string, value double")
        path = os.path.join(src, name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    import datetime as dt

    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)
    now = time.time()
    # Spark filters late rows with the PREVIOUS batch's watermark and evicts
    # state with the current one, so a late event landing in the very batch
    # where its window closes still counts. The late event must therefore
    # arrive after the watermark has exceeded its window end for a full
    # batch; one file per trigger makes the sequence deterministic.
    # batch 0: two on-time events in the 10:00 window (wm -> 08:20)
    write_file("a", [(t(10, 5), 1, "click", 1.0), (t(10, 20), 2, "click", 1.0)], now - 100)
    # batch 1: 13:30 advances the watermark (2h default) to 11:30 > 11:00
    write_file("b", [(t(13, 30), 3, "click", 1.0)], now - 80)
    # batch 2: runs with wm 11:30 -> the 10:00 window is emitted (count 2)
    write_file("c", [(t(13, 35), 4, "click", 1.0)], now - 60)
    # batch 3: late-filter wm is now 11:30 -> the 10:40 arrival is dropped
    write_file("d", [(t(10, 40), 5, "click", 1.0), (t(13, 40), 6, "click", 1.0)], now - 40)

    stream = (
        spark.readStream.schema("ts timestamp, user_id bigint, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out = _run_stream(spark, tumbling_counts(stream), "append")
    emitted = {r["window_start"].hour: r["n_events"] for r in out.collect()}
    assert emitted[10] == 2  # the 10:40 late arrival was evicted, not counted


def test_micro_batch_commits(spark, stream_src, tmp_path):
    src, _ = stream_src
    log = micro_batch_commit_metrics(spark, src, str(tmp_path))
    assert len(log.commits) >= 1
    total_rows = sum(c["n_rows"] for c in log.commits)
    expected = load_table(spark, SF_DIR, "events").count()
    assert total_rows == expected
    # manifest-growth curve: cumulative bytes strictly increasing
    cums = [c["cum_bytes"] for c in log.commits]
    assert all(b > a for a, b in zip(cums, cums[1:]))
    assert all(c["commit_ms"] > 0 for c in log.commits)


def test_enrich_stream_matches_batch(spark, stream_src):
    """Stream-static broadcast join: stream result == batch twin."""
    from iceberg_benchmark_poc_spark.streaming.dedup_join import enrich_events

    src, _ = stream_src
    customers = load_table(spark, SF_DIR, "customer")
    batch = enrich_events(load_table(spark, SF_DIR, "events"), customers)
    stream = _run_stream(
        spark, enrich_events(stream_events(spark, src), customers), "complete"
    )
    _assert_same(batch, stream)


def test_attribution_stream_matches_batch(spark, stream_src):
    """Stream-stream interval join == the same function on the static table."""
    from iceberg_benchmark_poc_spark.streaming import attribution_join

    src, _ = stream_src
    batch = attribution_join(load_table(spark, SF_DIR, "events"))
    stream = _run_stream(
        spark,
        attribution_join(
            stream_events(spark, src, files_per_trigger=10),
            stream_events(spark, src, files_per_trigger=10),
        ),
        "append",
    )
    _assert_same(batch, stream)


def test_attribution_outer_stream_sound_and_nonvacuous(spark, tmp_path):
    """Stream-stream LEFT OUTER interval join over an in-order feed: matched
    rows equal the batch twin exactly (time-sliced batches can never evict a
    click while a matching purchase is still upstream — eviction needs
    wm > click_ts + horizon, and any later purchase within the horizon
    implies wm <= click_ts + horizon + delay at its arrival); NULL
    (unconverted-click) rows are emitted only for clicks the batch twin also
    leaves unmatched — never for a click that has a purchase in the horizon
    — and at least some are emitted (the watermark advances across the 10
    file-batches). Exact null-row equality is deliberately NOT asserted:
    clicks whose horizon the final watermark never passes legitimately stay
    in state at end-of-stream."""
    from iceberg_benchmark_poc_spark.streaming import attribution_join_outer

    src = split_events_for_streaming(
        spark, SF_DIR, str(tmp_path), n_files=10, time_ordered=True
    )
    batch = attribution_join_outer(load_table(spark, SF_DIR, "events"))
    stream = _run_stream(
        spark,
        attribution_join_outer(
            stream_events(spark, src),
            stream_events(spark, src),
            watermark="1 minute",
        ),
        "append",
    )
    cols = stream.columns
    b_matched = batch.filter("buy_id IS NOT NULL")
    s_matched = stream.filter("buy_id IS NOT NULL")
    _assert_same(b_matched, s_matched)

    b_null = {tuple(r) for r in batch.filter("buy_id IS NULL").collect()}
    s_null = {tuple(r) for r in stream.filter("buy_id IS NULL").collect()}
    assert s_null, "no unconverted clicks emitted — watermark never fired"
    assert s_null <= b_null, f"stream emitted false nulls: {sorted(s_null - b_null)[:3]}"
    assert cols == batch.columns


def test_streaming_dedup_drops_redelivered(spark, tmp_path):
    """dropDuplicatesWithinWatermark: an event_id redelivered in a later
    micro-batch (inside the watermark horizon) is emitted exactly once, and
    the streaming output equals the batch twin on the unioned input."""
    import datetime as dt
    import os
    import time

    from iceberg_benchmark_poc_spark.streaming import dedup_events

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    t = lambda h, m: dt.datetime(2026, 1, 1, h, m)
    rows_a = [(1, t(10, 0), 1, "click", 1.0, ""), (2, t(10, 5), 2, "view", 1.0, ""), (3, t(10, 10), 3, "click", 1.0, "")]
    rows_b = [(2, t(10, 5), 2, "view", 1.0, ""), (4, t(10, 20), 4, "purchase", 2.0, "")]

    src = str(tmp_path / "dedup_src")
    os.makedirs(src)
    now = time.time()
    for name, rows, mtime in (("a", rows_a, now - 100), ("b", rows_b, now - 50)):
        df = spark.createDataFrame(rows, schema)
        path = os.path.join(src, name)
        df.coalesce(1).write.mode("overwrite").parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (mtime, mtime))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src + "/*")
    )
    out = _run_stream(spark, dedup_events(stream), "append")
    assert sorted(r["event_id"] for r in out.collect()) == [1, 2, 3, 4]

    batch = dedup_events(spark.createDataFrame(rows_a + rows_b, schema))
    _assert_same(batch, out)


def test_exactly_once_sink_survives_replay(spark, stream_src, tmp_path):
    """The idempotent sink commits every row exactly once, detects replayed
    batch_ids, and a rerun of the whole stream (fresh checkpoint, same sink)
    writes nothing new — the sink-side contract that makes at-least-once
    delivery exactly-once end to end."""
    from iceberg_benchmark_poc_spark.streaming.ingest import ExactlyOnceSink, exactly_once_ingest

    src, _ = stream_src
    sink = exactly_once_ingest(spark, src, str(tmp_path))
    expected = load_table(spark, SF_DIR, "events").count()
    written = spark.read.parquet(sink.out_dir + "/batch_id=*")
    assert written.count() == expected
    n_batches = len(sink.committed())
    assert n_batches >= 1 and sink.replays_skipped == 0

    # simulate a post-crash replay of an already-committed batch
    replay = ExactlyOnceSink(sink.out_dir)
    some_batch = spark.read.parquet(sink.out_dir + f"/batch_id={min(sink.committed())}")
    replay(some_batch, min(sink.committed()))
    assert replay.replays_skipped == 1
    assert spark.read.parquet(sink.out_dir + "/batch_id=*").count() == expected

    # full-pipeline rerun with a fresh checkpoint: every batch is a replay
    import os as _os
    import shutil

    shutil.rmtree(_os.path.join(str(tmp_path), "eo_ckpt"))
    rerun = exactly_once_ingest(spark, src, str(tmp_path))
    assert rerun.replays_skipped == n_batches
    assert spark.read.parquet(rerun.out_dir + "/batch_id=*").count() == expected


def test_torn_ledger_tail_is_repaired(tmp_path):
    """A crash can tear the last ledger append; the fragment must be
    truncated on load, NOT merged with the replay's record (which would mint
    a phantom committed batch id and silently skip a future batch)."""
    from iceberg_benchmark_poc_spark.streaming.ingest import ExactlyOnceSink

    out = str(tmp_path / "eo")
    first = ExactlyOnceSink(out)
    with open(first.ledger_path, "w") as f:
        f.write("7\n12")  # batch 7 committed; '12' is a torn fragment of '123\n'

    sink = ExactlyOnceSink(out)
    assert sink.committed() == {7}  # fragment dropped, not trusted as batch 12
    with open(sink.ledger_path, "a") as f:  # the replayed batch re-appends
        f.write("123\n")
    assert ExactlyOnceSink(out).committed() == {7, 123}  # no phantom 12123


def test_salted_join_contract(spark):
    """salted_join must be row-identical to the plain join even for negative
    and NULL salt values, and must refuse small-side-preserving join types."""
    import pytest

    from pyspark.sql import functions as F

    from iceberg_benchmark_poc_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(1, -3), (1, None), (2, 5), (3, -8)], "k int, salt_src int"
    )
    small = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    from collections import Counter

    expected = Counter(map(tuple, big.join(small, "k").collect()))
    got = Counter(map(tuple, salted_join(big, small, "k", F.col("salt_src"), 4).collect()))
    assert got == expected
    left_expected = Counter(map(tuple, big.join(small, "k", "left").collect()))
    left_got = Counter(
        map(tuple, salted_join(big, small, "k", F.col("salt_src"), 4, "left").collect())
    )
    assert left_got == left_expected
    with pytest.raises(ValueError):
        salted_join(big, small, "k", F.col("salt_src"), 4, "right")
    with pytest.raises(ValueError):
        salted_join(big, small, "k", F.col("salt_src"), 4, "full")


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=50, deadline=None)
@given(
    committed=st.sets(st.integers(0, 10**6), max_size=20),
    fragment=st.text(alphabet="0123456789", min_size=1, max_size=6),
    replay_id=st.integers(0, 10**6),
)
def test_ledger_torn_tail_never_phantoms(committed, fragment, replay_id):
    """For ANY committed set and ANY torn digit fragment: loading repairs the
    tail, the fragment is never trusted as a batch id, and a subsequent
    append can never merge into a phantom id."""
    import tempfile

    from iceberg_benchmark_poc_spark.streaming.ingest import ExactlyOnceSink

    with tempfile.TemporaryDirectory() as td:
        first = ExactlyOnceSink(td)
        with open(first.ledger_path, "w") as f:
            for b in sorted(committed):
                f.write(f"{b}\n")
            f.write(fragment)  # torn append: no trailing newline

        sink = ExactlyOnceSink(td)
        assert sink.committed() == committed  # fragment dropped
        with open(sink.ledger_path, "a") as f:  # replayed batch re-appends
            f.write(f"{replay_id}\n")
        assert ExactlyOnceSink(td).committed() == committed | {replay_id}


def test_checkpoint_resume_processes_only_new_data(spark, tmp_path):
    """Kill-and-resume continuity: a second run against the SAME checkpoint
    must pick up exactly the files that arrived since the first run — no
    reprocessing, no gaps. This is the operational property that lets a
    100 TB/day ingest restart after a crash without a backfill."""
    import glob
    import os
    import shutil

    from iceberg_benchmark_poc_spark.streaming.ingest import stream_events

    full_src = split_events_for_streaming(spark, SF_DIR, str(tmp_path / "full"), n_files=8)
    files = sorted(glob.glob(os.path.join(full_src, "*.parquet")))
    assert len(files) == 8

    src = str(tmp_path / "src")
    os.makedirs(src)
    for f in files[:5]:
        shutil.copy(f, src)

    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            stream_events(spark, src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).count()

    first = run_once()
    assert first == spark.read.parquet(*files[:5]).count()

    # "crash" happened; three more files arrive; resume from the checkpoint
    for f in files[5:]:
        shutil.copy(f, src)
    second = run_once()
    total = spark.read.parquet(full_src).count()
    assert second == total  # delta processed exactly once: no dupes, no gaps
    # event_ids must be the full set, each exactly once
    from pyspark.sql import functions as F

    dup = (
        spark.read.parquet(sink)
        .groupBy("event_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
