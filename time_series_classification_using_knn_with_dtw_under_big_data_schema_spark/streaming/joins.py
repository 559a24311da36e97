"""Stream-stream event joins (engine extension; the reference has no
streaming surface — SURVEY.md §2.8 lists it absent).

``attribution_join`` is the canonical stream-stream shape: match each
conversion event to the impressions of the same key that happened at most
``within`` before it (ad attribution, funnel analysis, cause→effect
correlation). The SAME function runs on batch DataFrames — the join
condition is identical; only the watermarks (state-cleanup bounds) are
streaming-specific — so the batch twin is DuckDB-oracle-checkable while the
streaming path is tested live for stream/batch parity.

Scale design (100 TB/day event streams):
- The join is an EQUI join on the key with a time-range residual — Spark
  plans a StreamingSymmetricHashJoin keyed on ``key``; state per key is
  bounded by the two watermarks + ``within`` (late impressions and
  conversions are dropped once the watermark passes), so state size is
  O(events within the time window), not O(stream history).
- In batch mode the same plan is a shuffled hash join on the key with the
  range as a post-join filter — no nested-loop anywhere.
- Timestamps are truncated to microseconds with integer DIV (never a
  float divide: double rounding near a boundary would flip borderline
  pairs and break cross-engine parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attribution_join"]


def _event_time(df: DataFrame, ts_col: str, alias: str) -> DataFrame:
    """Normalize the event-time column to (epoch-micros long, timestamp).

    Driver testdata carries ts as timestamp[us]; long nanos (a
    timestamp[ns] parquet read under ``nanosAsLong``) is also accepted.
    Both are truncated to exact microseconds. TIMESTAMP_NTZ is cast to
    TimestampType first (unix_micros rejects NTZ); the session timezone is
    UTC so the cast is value-preserving.
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        us = F.expr(f"{ts_col} DIV 1000")
    elif dtype in ("timestamp", "timestamp_ntz"):
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    else:
        raise ValueError(f"{ts_col} must be long-nanos or timestamp, got {dtype}")
    return df.withColumn(f"{alias}_us", us).withColumn(
        f"{alias}_ts", F.timestamp_micros(F.col(f"{alias}_us"))
    )


def attribution_join(
    impressions: DataFrame,
    conversions: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    within: str = "5 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """All (impression, conversion) pairs of the same ``key`` with
    imp_ts <= conv_ts <= imp_ts + ``within``.

    Output: (key, imp_us, conv_us, delay_ms) — epoch-microsecond longs and
    the integer-exact delay. Works on streaming inputs (both sides get
    ``watermark``; Spark requires it to bound join state) and on batch
    inputs (watermark is a no-op there).
    """
    li = _event_time(impressions, ts_col, "imp").select(key, "imp_us", "imp_ts")
    ri = _event_time(conversions, ts_col, "conv").select(key, "conv_us", "conv_ts")
    if li.isStreaming:
        li = li.withWatermark("imp_ts", watermark)
    if ri.isStreaming:
        ri = ri.withWatermark("conv_ts", watermark)
    cond = (
        (li[key] == ri[key])
        & (ri["conv_ts"] >= li["imp_ts"])
        & (ri["conv_ts"] <= li["imp_ts"] + F.expr(f"INTERVAL {within}"))
    )
    return li.join(ri, cond, "inner").select(
        li[key].alias(key),
        "imp_us",
        "conv_us",
        F.expr("(conv_us - imp_us) DIV 1000").alias("delay_ms"),
    )
