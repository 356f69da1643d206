"""Custom stateful streaming: applyInPandasWithState.

Beyond watermarked window aggregates (facade.py), some operators need
arbitrary per-key state — running counters, device sessions with custom
close conditions, dedup-seen sets. Structured Streaming's
``applyInPandasWithState`` is the sanctioned primitive: state is a
per-key GroupState checkpointed by the engine, the update function is an
Arrow-batched pandas callable.

The engine-vs-batch contract IS oracle-checkable for this operator (the
drained final state per key equals the batch GROUP BY) — see
catalog/streaming.stream_stateful_running_totals. Cross-micro-batch state
carry is additionally covered in tests with a multi-file stream.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
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
    [StructField("n", LongType()), StructField("s_cents", LongType())]
)


def _update_running(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user running (count, sum) across micro-batches.

    The sum accumulates exact integer cents — floor(v*100 + 0.5) per value
    — so the final total is independent of micro-batch arrival order and
    bit-identical to any batch engine applying the same per-value floor
    (float += across batches would drift with batching order)."""
    if state.exists:
        n, s_cents = state.get
    else:
        n, s_cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].to_numpy(dtype=np.float64)
        s_cents += int(np.floor(v * 100.0 + 0.5).astype(np.int64).sum())
    state.update((n, s_cents))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [s_cents / 100.0]}
    )


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
