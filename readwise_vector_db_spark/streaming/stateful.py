"""Custom stateful streaming via ``applyInPandasWithState``.

The built-in windows (streaming/windows.py) cover tumbling/sliding/
session aggregation; this module is the escape hatch for operators whose
state transitions Spark can't express declaratively — the running
per-key accumulator every training-data pipeline eventually needs
(per-source ingest counters, first-seen dedup ledgers, quota tracking).

State model: one row per key in the state store, updated once per
micro-batch per key (the function sees the key's whole micro-batch as
Arrow-batched pandas frames).  At 100 TB the state store shards by key
across executors; pair with ``GroupStateTimeout`` TTLs in production so
abandoned keys age out — tests use ``NoTimeout`` for determinism.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id LONG, n_events LONG, total_value DOUBLE"
RUNNING_TOTALS_STATE = "n LONG, sv DOUBLE"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Cumulative per-user (event count, value sum) across micro-batches.

    Emits one update row per user per micro-batch that touched the user —
    the streaming analogue of ``groupBy(user_id).agg(count, sum)`` but
    with state carried forward indefinitely, which no watermarked window
    can express (windows forget; this accumulates).
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, sv = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            sv += float(pdf["value"].fillna(0.0).sum())
        state.update((n, sv))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [sv]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RUNNING_TOTALS_OUTPUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
