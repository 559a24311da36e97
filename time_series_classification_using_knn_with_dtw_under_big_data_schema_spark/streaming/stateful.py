"""Custom stateful streaming operator via applyInPandasWithState
(engine extension; SURVEY.md §2.8 — the reference has no streaming).

``running_user_stats``: per-key running (count, sum, max) maintained in
GroupState across micro-batches — the canonical arbitrary-stateful pattern
(counters, detectors, online aggregates) the built-in windowed aggregates
can't express.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("vmax", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)


def _update(
    key: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, vmax = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            vmax = max(vmax, float(pdf["value"].max()))
    state.update((n, total, vmax))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [vmax],
        }
    )


def running_user_stats(stream: DataFrame, *, key: str = "user_id") -> DataFrame:
    """Streaming DataFrame of per-key running stats, updated each micro-batch.

    Use with ``outputMode("update")``; state lives for the query's lifetime
    (no timeout — add one for unbounded key domains in production).
    """
    return (
        stream.select(key, "value")
        .groupBy(key)
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
