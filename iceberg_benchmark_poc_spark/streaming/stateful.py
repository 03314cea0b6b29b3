"""Custom stateful streaming operator via applyInPandasWithState.

The escape hatch for semantics no built-in window expresses: per-key mutable
state carried across micro-batches with timeout-driven eviction. The example
operator is a per-user cumulative-value threshold monitor — it emits a record
each micro-batch per active user with the running total and how many alert
thresholds (multiples of ALERT_EVERY) the user has crossed so far.

State is one (total, crossings, n_events) triple per user: constant memory
per key, sharded across executors by the groupBy — the shape that scales to
hundreds of millions of keys. Arrow batches stream through the Python worker
exactly like mapInPandas.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_EVERY = 1000.0

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, cum_value double, crossings bigint"
STATE_SCHEMA = "cum_value double, crossings bigint, n_events bigint"


def _monitor(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        cum, crossings, n_events = state.get
    else:
        cum, crossings, n_events = 0.0, 0, 0
    for pdf in pdfs:
        n_events += len(pdf)
        cum += float(pdf["value"].sum())
    crossings = int(cum // ALERT_EVERY)
    state.update((cum, crossings, n_events))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n_events], "cum_value": [cum], "crossings": [crossings]}
    )


def value_threshold_monitor(events: DataFrame) -> DataFrame:
    """Per-user running totals + alert-threshold crossings, stateful across
    micro-batches. Works on streaming DataFrames; for batch inputs use the
    equivalent groupBy aggregate (tests assert they agree on final totals).
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _monitor,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# adaptive root-manifest flush — per-writer state machine
# ---------------------------------------------------------------------------

#: flush thresholds mirroring the reference's RootManifest state machine
#: (poc/utils/adaptive_tree.py:96-150: flush when inline bytes reach 16 MiB or
#: 2000 entries). Tests shrink them so sf0.001 produces many flushes.
FLUSH_BYTES_DEFAULT = 16 * 1024 * 1024
FLUSH_ENTRIES_DEFAULT = 2000

FLUSH_OUTPUT_SCHEMA = (
    "writer_id bigint, flush_seq bigint, n_entries bigint, flushed_bytes bigint, last_event_id bigint"
)
FLUSH_STATE_SCHEMA = "n_entries bigint, n_bytes bigint, n_flushes bigint"


FLUSH_COLUMNS = ["writer_id", "flush_seq", "n_entries", "flushed_bytes", "last_event_id"]


def _flush_scan(writer_id, ids, cum_b, pend_e, pend_b, n_flushes, flush_bytes, flush_entries):
    """Vectorized flush scan over one writer's sorted entry chunk.

    ``ids``/``cum_b`` are the chunk's event ids and cumulative entry bytes;
    (pend_e, pend_b, n_flushes) is the carried state. Returns the emitted
    flush rows and the updated state. Cumulative sums + searchsorted find
    each flush boundary, so Python work is O(flushes x log(chunk)) rather
    than per-row. Invariant pend_b < flush_bytes and pend_e < flush_entries
    holds on entry and exit (a flush fires the moment a threshold is met).
    """
    import numpy as np

    out: list[tuple[int, int, int, int, int]] = []
    n = len(ids)
    start = 0  # first unflushed row of this chunk
    while start < n:
        base_b = cum_b[start - 1] if start else 0
        # first index where pending bytes or entries cross a threshold
        i_bytes = int(np.searchsorted(cum_b, base_b - pend_b + flush_bytes))
        i_entries = start + (flush_entries - pend_e) - 1
        i = min(i_bytes, i_entries)
        if i >= n:
            break
        out.append(
            (
                writer_id,
                n_flushes,
                pend_e + i - start + 1,
                pend_b + int(cum_b[i] - base_b),
                int(ids[i]),
            )
        )
        n_flushes += 1
        pend_e, pend_b = 0, 0
        start = i + 1
    if start < n:
        pend_e += n - start
        pend_b += int(cum_b[-1] - (cum_b[start - 1] if start else 0))
    return out, pend_e, pend_b, n_flushes


def _flush_fn(flush_bytes: int, flush_entries: int):
    """Per-writer manifest-flush machine as an applyInPandasWithState function.

    Per key (writer), a GroupState triple (pending entries, pending bytes,
    flushes so far) survives micro-batches; each incoming commit entry is
    appended to the pending root manifest and a leaf flush is emitted the
    moment either threshold is crossed — exactly the reference's
    RootManifest.add_entry/flush_to_leaf cycle. One writer's stream is
    inherently sequential; scale comes from sharding writers across
    executors, constant state per key.

    (Spark 4's transformWithStateInPandas expresses the same machine with a
    named ValueState, but its driver-side transport needs protobuf, absent in
    this environment — the GroupState API is the portable equivalent.)
    """

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (writer_id,) = key
        if state.exists:
            pend_e, pend_b, n_flushes = state.get
        else:
            pend_e, pend_b, n_flushes = 0, 0, 0
        out: list[tuple[int, int, int, int, int]] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("event_id")
            rows, pend_e, pend_b, n_flushes = _flush_scan(
                writer_id,
                pdf["event_id"].to_numpy(),
                pdf["entry_bytes"].to_numpy().cumsum(),
                pend_e,
                pend_b,
                n_flushes,
                flush_bytes,
                flush_entries,
            )
            out.extend(rows)
        state.update((pend_e, pend_b, n_flushes))
        if out:
            yield pd.DataFrame(out, columns=FLUSH_COLUMNS)

    return fn


def manifest_flush_stream(
    entries: DataFrame,
    flush_bytes: int = FLUSH_BYTES_DEFAULT,
    flush_entries: int = FLUSH_ENTRIES_DEFAULT,
) -> DataFrame:
    """Leaf-flush event stream from a per-writer commit-entry stream.

    ``entries`` needs columns (writer_id, event_id, entry_bytes). Output is
    one row per flushed leaf manifest, in flush order per writer.
    """
    return (
        entries.select("writer_id", "event_id", "entry_bytes")
        .groupBy("writer_id")
        .applyInPandasWithState(
            _flush_fn(flush_bytes, flush_entries),
            outputStructType=FLUSH_OUTPUT_SCHEMA,
            stateStructType=FLUSH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def manifest_flush_batch(
    entries: DataFrame,
    flush_bytes: int = FLUSH_BYTES_DEFAULT,
    flush_entries: int = FLUSH_ENTRIES_DEFAULT,
) -> DataFrame:
    """Batch twin of :func:`manifest_flush_stream`: same machine, bounded input.

    One applyInPandas pass per writer replays the full entry log in event-id
    order through the identical ``_flush_scan`` core with empty initial
    state. Spark shuffles once on writer_id; each writer's replay is a
    single Arrow batch. Equivalence with the streaming operator holds
    whenever micro-batches deliver each writer's entries in event-id order.
    """

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("event_id")
        rows, *_ = _flush_scan(
            int(pdf["writer_id"].iloc[0]),
            pdf["event_id"].to_numpy(),
            pdf["entry_bytes"].to_numpy().cumsum(),
            0,
            0,
            0,
            flush_bytes,
            flush_entries,
        )
        return pd.DataFrame(rows, columns=FLUSH_COLUMNS)

    return (
        entries.select("writer_id", "event_id", "entry_bytes")
        .groupBy("writer_id")
        .applyInPandas(fn, schema=FLUSH_OUTPUT_SCHEMA)
    )
