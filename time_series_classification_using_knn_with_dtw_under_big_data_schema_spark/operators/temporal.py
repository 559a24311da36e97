"""Temporal join / resample operators (engine extension; the as-of and
gap-fill surface SURVEY.md §2.3 lists as absent from the reference —
`Team11-Project.py` has no range/as-of/interval joins at all, its time axis
is an implicit array index).

Scale design (100 TB):
- ``asof_join`` is the union-sort formulation: tag both inputs, union them,
  and forward-fill the right payload over a per-key window. ONE shuffle, on
  the join key — never a range/theta join, which Spark can only plan as
  BroadcastNestedLoopJoin / CartesianProduct with per-row predicate
  evaluation (O(|L|x|R|) pairs per key). The window sort is
  O((|L|+|R|) log) per key and spills; the payload is a single struct
  column so the fill carries one pointer per row regardless of how many
  value columns ride along.
- ``resample_ffill`` builds the per-key grid with ``sequence``+``explode``
  (executor-side, no shuffle beyond the min/max agg) and reuses
  ``asof_join``; grid density is the caller's ``step`` — the operator never
  materializes more than (range/step) rows per key.
- Skew: both operators partition by the join key only; a pathologically hot
  key serializes its window like any windowed op — pre-split hot keys with
  ``operators.skew`` helpers if profiles show it.

Determinism: ties are totally ordered. At equal timestamps the right row
sorts before the left row (as-of is inclusive: ts_r <= ts matches), and
duplicate right timestamps resolve by max payload struct — so results are
reproducible and the DuckDB ``ASOF JOIN`` oracle can mirror them exactly
(given a right side deduplicated per (key, ts), which the driver queries
enforce).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "resample_ffill"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Union[str, Sequence[str]],
    ts: str = "ts",
    right_ts: Optional[str] = None,
    value_cols: Optional[Sequence[str]] = None,
    direction: str = "backward",
    tolerance: Optional[int] = None,
    suffix: str = "_matched",
) -> DataFrame:
    """For each left row, attach the nearest right row per key at-or-before
    (``direction='backward'``) or at-or-after (``'forward'``) its timestamp.

    Output: every left column, plus ``{ts}{suffix}`` (the matched right
    timestamp, null when no match / outside ``tolerance``) and each of
    ``value_cols`` (null likewise). ``tolerance`` is in the ts column's own
    units (the engine's time axis is numeric — epoch micros by convention).

    Plan shape: union(tagged left, tagged right) -> window(partitionBy key,
    orderBy ts, side, payload) last(payload, ignorenulls) -> filter left
    rows. One Exchange; no join node at all.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown direction {direction!r}")
    on_cols = [on] if isinstance(on, str) else list(on)
    rts = right_ts or ts
    vals = list(
        value_cols
        if value_cols is not None
        else [c for c in right.columns if c not in on_cols + [rts]]
    )
    ts_matched = f"{ts}{suffix}"
    clash = set(vals + [ts_matched]) & set(left.columns)
    if clash:
        raise ValueError(f"right value columns clash with left: {sorted(clash)}")

    pay = F.struct(
        F.col(rts).alias(ts_matched), *[F.col(c) for c in vals]
    )
    pay_type = right.select(pay.alias("_pay")).schema["_pay"].dataType
    left_rest = [c for c in left.columns if c not in on_cols + [ts]]

    l_tagged = left.select(
        *on_cols,
        F.col(ts).alias("_ats"),
        F.lit(1).alias("_side"),
        *left_rest,
        F.lit(None).cast(pay_type).alias("_pay"),
    )
    r_tagged = right.select(
        *on_cols,
        F.col(rts).alias("_ats"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_rest],
        pay.alias("_pay"),
    )
    u = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        order = [F.asc("_ats"), F.asc("_side"), F.asc("_pay")]
    else:
        # scan from the future toward each left row; right-before-left at
        # equal ts keeps the match inclusive in both directions
        order = [F.desc("_ats"), F.asc("_side"), F.desc("_pay")]
    w = (
        Window.partitionBy(*on_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w)).filter(
        F.col("_side") == 1
    )
    if tolerance is not None:
        gap = (
            F.col("_ats") - F.col(f"_m.{ts_matched}")
            if direction == "backward"
            else F.col(f"_m.{ts_matched}") - F.col("_ats")
        )
        filled = filled.withColumn(
            "_m", F.when(gap <= F.lit(tolerance), F.col("_m"))
        )
    return filled.select(
        *on_cols,
        F.col("_ats").alias(ts),
        *left_rest,
        F.col(f"_m.{ts_matched}").alias(ts_matched),
        *[F.col(f"_m.{c}").alias(c) for c in vals],
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: Union[str, Sequence[str]],
    ts: str = "ts",
    start: str = "start",
    end: str = "end",
    bucket: Union[int, str] = "auto",
) -> DataFrame:
    """Inner-join each point to every same-key interval containing it
    (``start <= ts <= end``, inclusive both ends).

    Scale plan: an equi-join on (key, time-bucket), never a theta join —
    Spark can only plan the raw range predicate as BroadcastNestedLoopJoin
    (O(|P| x |I|) comparisons per key). Each interval explodes into the
    buckets it spans (``sequence`` — fan-out = length/bucket + 1), each
    point maps to its single bucket, and the exact containment predicate
    filters the equi-join output. Pick ``bucket`` near the typical interval
    length: too small inflates the interval fan-out, too large inflates
    candidate pairs per bucket. ``bucket='auto'`` derives a width from one
    small aggregate job over the intervals side: the median interval
    length, CLAMPED from below by max_length/256 — the clamp is the
    load-bearing part (a corpus of mostly degenerate intervals plus a few
    hours-long ones would otherwise pick a tiny bucket and ``sequence``
    a long interval into billions of rows). Worst-case per-interval
    fan-out is thus <= 257 buckets. The estimate only shapes the PLAN;
    the exact containment filter makes the result identical for any
    bucket choice. Output: all point columns + the intervals' non-key
    columns.
    """
    on_cols = [on] if isinstance(on, str) else list(on)
    if bucket == "auto":
        row = (
            intervals.filter(F.col(end) >= F.col(start))
            .select(((F.col(end) - F.col(start)).cast("long") + 1).alias("_len"))
            .agg(
                F.percentile_approx("_len", 0.5).alias("p50"),
                F.max("_len").alias("mx"),
            )
            .collect()[0]
        )
        p50, mx = row["p50"] or 1, row["mx"] or 1
        bucket = int(max(p50, -(-mx // 256), 1))
    elif not isinstance(bucket, int):
        raise ValueError(f"bucket must be an int or 'auto', got {bucket!r}")
    ivl_rest = [c for c in intervals.columns if c not in on_cols]
    clash = set(ivl_rest) & set(points.columns)
    if clash:
        raise ValueError(f"interval columns clash with points: {sorted(clash)}")
    b = F.lit(bucket).cast("long")
    p = points.withColumn("_bk", (F.col(ts) - F.pmod(F.col(ts), b)).cast("long"))
    # degenerate (end < start) intervals match nothing; dropping them also
    # keeps the bucket sequence ascending (Spark errors on start>stop)
    intervals = intervals.filter(F.col(end) >= F.col(start))
    i = intervals.withColumn(
        "_bk",
        F.explode(
            F.sequence(
                (F.col(start) - F.pmod(F.col(start), b)).cast("long"),
                F.col(end).cast("long"),
                b,
            )
        ),
    )
    return (
        p.join(i, on_cols + ["_bk"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_bk")
    )


def resample_ffill(
    df: DataFrame,
    *,
    key: Union[str, Sequence[str]],
    ts: str = "ts",
    step: int,
    value_cols: Optional[Sequence[str]] = None,
    suffix: str = "_obs",
) -> DataFrame:
    """Per-key regular time grid with forward-filled observations (gap-fill).

    The grid spans ``floor(min_ts/step)*step .. max_ts`` per key in ``step``
    increments (integer time units); each grid point carries the most recent
    observation at-or-before it (``{ts}{suffix}`` + value columns; the first
    grid point of a key precedes its first observation only when min_ts is
    not on the grid, in which case it is null-filled).
    """
    on_cols = [key] if isinstance(key, str) else list(key)
    grid = (
        df.groupBy(*on_cols)
        .agg(F.min(ts).alias("_mn"), F.max(ts).alias("_mx"))
        .select(
            *on_cols,
            F.explode(
                F.sequence(
                    # floor(mn/step)*step via integer-exact mn - pmod(mn, step)
                    # (no double division anywhere near the grid boundaries)
                    (F.col("_mn") - F.pmod(F.col("_mn"), F.lit(step))).cast("long"),
                    F.col("_mx").cast("long"),
                    F.lit(step).cast("long"),
                )
            ).alias(ts),
        )
    )
    return asof_join(
        grid,
        df,
        on=on_cols,
        ts=ts,
        value_cols=value_cols,
        direction="backward",
        suffix=suffix,
    )
