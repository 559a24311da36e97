"""Streaming file sinks (engine extension; SURVEY.md §2.1 lists streaming
sources/sinks absent from the reference — its only sink is a batch
``saveAsTable``, `Team11-Project.py:199`).

``stream_to_parquet`` is the durable landing path for a scored/filtered
stream: exactly-once into a parquet directory via the file-sink commit log +
checkpointed offsets (restart resumes from the checkpoint, never duplicating
a committed micro-batch).

Scale design: the parquet file sink appends one file per partition per
micro-batch — at high rates that means a small-file problem, which is why
``sources/parquet.py::compact_parquet`` exists as the maintenance pass;
partition the stream by a low-cardinality column (``partition_by``) so
downstream scans prune, and size trigger intervals so per-batch files are
~100 MB+ at production rates.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

__all__ = ["stream_to_parquet"]


def stream_to_parquet(
    df: DataFrame,
    path: str,
    *,
    checkpoint: str,
    partition_by: Optional[Sequence[str]] = None,
    trigger_once: bool = False,
    query_name: str = "stream_to_parquet",
) -> StreamingQuery:
    """Start an append-mode parquet file-sink query for ``df``.

    ``trigger_once=True`` drains everything available then stops — the
    batch-like incremental-ingest pattern (cron-scheduled catch-up runs
    with streaming exactly-once semantics).
    """
    if not df.isStreaming:
        raise ValueError("stream_to_parquet needs a streaming DataFrame")
    w = (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
