"""Custom stateful streaming operators (SURVEY.md §2B E18) via
``applyInPandasWithState`` — arbitrary per-key state with Arrow-batched
user code, the Spark-native replacement for hand-rolled stream processors.

Batch-equivalence is asserted in tests/test_streaming_stateful.py (the
driver's oracle gate covers the deterministic streaming queries in
streaming/windows.py; these operators emit per-batch incremental rows, so
their contract is "final state equals the batch answer", not row-hash
equality).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_COUNT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total_cents bigint"


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents value total), updated every
    micro-batch. State is two int64s per key — bounded, shuffle-partitioned
    by user_id, so state size scales with |keys| not |events|."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total_cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            total_cents += int(sum(int(round(v * 100)) for v in pdf["value"]))
        state.update((n, total_cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total_cents / 100.0]}
        )

    return events_stream.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_COUNT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
