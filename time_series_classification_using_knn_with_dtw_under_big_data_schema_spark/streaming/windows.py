"""Streaming windowed aggregation over the events stream (engine extension;
the reference has no streaming surface — SURVEY.md §2.8).

events(ts, event_type, value, user_id) -> tumbling/sliding window counts and
sums with a watermark for late data, plus session windows per user. The
driver testdata stores ts as timestamp[us] (used directly); long-nanos
inputs (a timestamp[ns] parquet read under ``nanosAsLong``) are bridged
via ``nanos_to_ts``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def nanos_to_ts(col: Column) -> Column:
    """long nanos-since-epoch -> timestamp (microsecond precision)."""
    return F.timestamp_micros((col / 1000).cast("long"))


def _event_ts(stream: DataFrame, ts_col: str) -> Column:
    """Event-time column as TimestampType: long nanos are converted;
    TIMESTAMP_NTZ (the driver parquet's type) is cast — streaming
    watermarks reject NTZ, and the session timezone is UTC so the cast is
    value-preserving."""
    dtype = dict(stream.dtypes).get(ts_col)
    if dtype == "bigint":
        return nanos_to_ts(F.col(ts_col))
    return F.col(ts_col).cast("timestamp")


def windowed_event_aggregate(
    stream: DataFrame,
    *,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Tumbling (or sliding, when ``slide`` is given) windowed counts/sums
    with late-data bound ``watermark``. Works on both streaming and batch
    DataFrames (batch ignores the watermark) — tests exploit that for
    stream/batch parity.
    """
    ts = _event_ts(stream, ts_col)
    df = stream.withColumn("_ts", ts).withWatermark("_ts", watermark)
    win = F.window("_ts", window, slide) if slide else F.window("_ts", window)
    return (
        df.groupBy(win.alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key,
            "n",
            "sum_value",
        )
    )


def sessionized_event_counts(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key: str = "user_id",
) -> DataFrame:
    """Session windows (dynamic gap-based) per key — the streaming
    sessionization pattern."""
    ts = _event_ts(stream, ts_col)
    df = stream.withColumn("_ts", ts).withWatermark("_ts", watermark)
    return (
        df.groupBy(F.session_window("_ts", gap).alias("s"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key,
            "n_events",
        )
    )
