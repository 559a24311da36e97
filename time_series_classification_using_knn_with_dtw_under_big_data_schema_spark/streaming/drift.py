"""Streaming distribution-drift monitoring (r6; engine extension — the
production twin of q184's batch drift detector).

A value stream is watched against a STATIC reference histogram: per
event-time window, the chi-square-shaped divergence

    drift(w) = sum_bins (p_i(w) - q_i)^2 / (p_i(w) + q_i)

where p_i(w) are the window's bin frequencies and q_i the reference's —
the libm-free PSI/KL stand-in (q184's statistic; ln() diverges across
engines and has no place in a hash-checked pipeline). An alert threshold
on drift(w) is the standard "stop mixing this crawl into the corpus"
tripwire.

Streaming constraints shape the plan: Structured Streaming allows ONE
aggregation, so the per-bin counts are ``n_bins`` conditional sums inside
the single windowed groupBy (never a (window, bin) aggregation followed by
a second reduce), and the reference joins in afterwards as a broadcast
1-row table (stream-static join, always allowed). The divergence itself is
then a per-row expression — an ascending fold over the fixed bin order, so
batch and streaming twins agree bit-for-bit and the batch twin carries a
DuckDB oracle (q187).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import _event_ts

__all__ = ["value_histogram", "stream_drift_monitor"]


def value_histogram(
    df: DataFrame,
    *,
    value_col: str = "value",
    bin_width: float = 25.0,
    n_bins: int = 16,
) -> DataFrame:
    """Static reference histogram: (bin int, ref_cnt bigint) over
    fixed-width bins ``least(floor(value / bin_width), n_bins - 1)`` —
    the q184 binning. Integer counts, order-free exact."""
    b = F.least(
        F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("long").alias("ref_cnt"))
    )


def stream_drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    *,
    window: str = "1 day",
    watermark: str = "2 days",
    ts_col: str = "ts",
    value_col: str = "value",
    bin_width: float = 25.0,
    n_bins: int = 16,
) -> DataFrame:
    """Per-window drift against the static ``reference`` histogram
    (``value_histogram`` output). Works identically on a BATCH DataFrame
    (the watermark is ignored) — tests and the q187 oracle exploit that
    batch/stream twin-ness.

    Output: (window_start, window_end, n_events, drift_stat) — append
    mode with the watermark bounding lateness. Bins empty on BOTH sides
    contribute 0 (no 0/0 NaN); raw doubles are engine-exact (ordered bin
    fold, exact divisions)."""
    ts = _event_ts(stream, ts_col)
    b = F.least(
        F.floor(F.col(value_col) / F.lit(float(bin_width))), F.lit(n_bins - 1)
    ).cast("int")
    src = stream.select(ts.alias("_ts"), b.alias("_bin")).withWatermark(
        "_ts", watermark
    )
    # THE one streaming aggregation: bin counts as conditional sums
    agg_cols = [
        F.sum(F.when(F.col("_bin") == i, 1).otherwise(0)).cast("long").alias(f"_c{i}")
        for i in range(n_bins)
    ] + [F.count(F.lit(1)).cast("long").alias("_n")]
    win = src.groupBy(F.window("_ts", window).alias("_w")).agg(*agg_cols)
    # reference as a broadcast 1-row table (stream-static join)
    ref_piv = reference.agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("bin") == i, F.col("ref_cnt"))), F.lit(0)
            )
            .cast("long")
            .alias(f"_r{i}")
            for i in range(n_bins)
        ],
        F.sum("ref_cnt").cast("long").alias("_rn"),
    )
    j = win.crossJoin(F.broadcast(ref_piv))

    def contrib(i: int):
        p = F.col(f"_c{i}").cast("double") / F.col("_n").cast("double")
        q = F.col(f"_r{i}").cast("double") / F.col("_rn").cast("double")
        return F.when((p + q) != 0, (p - q) * (p - q) / (p + q)).otherwise(
            F.lit(0.0)
        )

    drift = F.aggregate(
        F.array(*[contrib(i) for i in range(n_bins)]),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    return j.select(
        F.col("_w.start").alias("window_start"),
        F.col("_w.end").alias("window_end"),
        F.col("_n").alias("n_events"),
        drift.alias("drift_stat"),
    )
