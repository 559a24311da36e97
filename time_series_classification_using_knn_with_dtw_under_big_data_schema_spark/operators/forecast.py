"""Exponential-smoothing forecasting (Holt's linear-trend method, 1957 —
the workhorse short-horizon forecaster): per series, the classic
recurrence

    l_t = alpha * x_t + (1 - alpha) * (l_{t-1} + b_{t-1})
    b_t = beta  * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

initialized l_1 = x_1, b_1 = x_2 - x_1 (equivalently: the fold starts
from the exact post-t=2 state (x_2, x_2 - x_1)); the h-step forecast is
l_n + h * b_n.

Engine shape: the recurrence IS a left fold — one Catalyst ``aggregate``
with a 2-element array state per row. No shuffle, no UDF, scan-bound
(the q127/q146/q148 family). A DuckDB ``list_reduce`` twin reproduces it
bit-for-bit when alpha/beta are binary-exact literals (the defaults 0.5 /
0.25 are; arbitrary smoothing constants parse to the same double in both
engines but keep the q148 lesson in mind: emit RAW doubles, never
round-6, because mirrored folds are already bit-equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["holt_forecast"]


def holt_forecast(
    series: DataFrame,
    *,
    alpha: float = 0.5,
    beta: float = 0.25,
    horizons: tuple = (1, 4),
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """(id_col, level, trend, fc_<h>...) — final smoothed level/trend and
    the h-step-ahead forecasts ``level + h * trend`` for each horizon.
    Series with fewer than 2 points yield NULLs (no trend is estimable)."""
    if not 0 < alpha <= 1 or not 0 < beta <= 1:
        raise ValueError(f"alpha/beta must be in (0, 1], got {alpha}, {beta}")
    f = F.col(features_col)
    n = F.size(f)
    x1 = F.element_at(f, 1)
    x2 = F.element_at(f, 2)
    a, b_ = float(alpha), float(beta)

    def step(acc, v):
        l_prev = F.element_at(acc, 1)
        b_prev = F.element_at(acc, 2)
        l_new = F.lit(a) * v + F.lit(1.0 - a) * (l_prev + b_prev)
        b_new = F.lit(b_) * (l_new - l_prev) + F.lit(1.0 - b_) * b_prev
        return F.array(l_new, b_new)

    # init = the state AFTER the t=2 update: with l_1=x_1, b_1=x_2-x_1 the
    # textbook t=2 step lands exactly on (l_2, b_2) = (x_2, x_2-x_1) for
    # any alpha/beta, so folding x_3.. onward from THIS init is the
    # standard recurrence with no skipped observation (self-review r5: the
    # earlier (x_1, x_2-x_1) init left the level one step behind —
    # fc_1 of [0, 10] returned 10 instead of the extrapolated 20)
    state = F.aggregate(F.slice(f, 3, n - 2), F.array(x2, x2 - x1), step)
    guarded = F.when(n >= 2, state)
    level = F.element_at(guarded, 1)
    trend = F.element_at(guarded, 2)
    cols = [
        F.col(id_col),
        level.alias("level"),
        trend.alias("trend"),
        *[
            (level + F.lit(float(h)) * trend).alias(f"fc_{h}")
            for h in horizons
        ],
    ]
    return series.select(*cols)
