"""Custom stateful streaming: applyInPandasWithState.

Beyond watermarked window aggregates (facade.py), some operators need
arbitrary per-key state — running counters, device sessions with custom
close conditions, dedup-seen sets. Structured Streaming's
``applyInPandasWithState`` is the sanctioned primitive: state is a
per-key GroupState checkpointed by the engine, the update function is an
Arrow-batched pandas callable.

Not oracle-checkable (stateful streaming has no SQL equivalent); tested by
driving a finite file stream and comparing against the batch groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("s", DoubleType())]
)


def _update_running(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) across micro-batches."""
    if state.exists:
        n, s = state.get
    else:
        n, s = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Streaming running totals keyed by user — state survives across
    micro-batches via the checkpointed GroupState."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
