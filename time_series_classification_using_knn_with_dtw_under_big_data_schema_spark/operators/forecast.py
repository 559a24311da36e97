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

__all__ = ["holt_forecast", "holt_winters_forecast"]


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


def holt_winters_forecast(
    series: DataFrame,
    *,
    period: int = 4,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.5,
    horizons: tuple = (1, 4),
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing (Winters 1960):
    level + trend + a rotating seasonal index vector, the standard
    seasonal short-horizon forecaster.

        l_t = alpha * (x_t - s_{t-p}) + (1-alpha) * (l_{t-1} + b_{t-1})
        b_t = beta * (l_t - l_{t-1}) + (1-beta) * b_{t-1}
        s_t = gamma * (x_t - l_t) + (1-gamma) * s_{t-p}

    Textbook init over the first two periods: l_p = mean(x_1..x_p),
    b_p = (mean(x_{p+1}..x_{2p}) - l_p) / p, s_j = x_j - l_p; the update
    runs t = p+1 .. n. Forecast h steps: l_n + h*b_n + s_{phase(n+h)}.
    Series shorter than 2*period yield NULLs.

    Engine shape: the WHOLE recurrence — level, trend, the p-slot
    seasonal vector, and the phase counter — is ONE Catalyst aggregate
    with a (3+p)-element array state; the phase rides IN the state (fold
    lambdas see no index), and each step rebuilds the seasonal slots with
    a transform that patches exactly one phase. Scan-bound, no shuffle,
    no UDF; binary-exact default constants and raw-double outputs (the
    q148/q151 discipline), so the DuckDB twin folds bit-identically."""
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    for nm, v in (("alpha", alpha), ("beta", beta), ("gamma", gamma)):
        if not 0 < v <= 1:
            raise ValueError(f"{nm} must be in (0, 1], got {v}")
    p = period
    a, b_, g = float(alpha), float(beta), float(gamma)
    f = F.col(features_col)
    n = F.size(f)

    def mean_slice(start, length):
        return (
            F.aggregate(
                F.slice(f, start, length), F.lit(0.0), lambda acc, v: acc + v
            )
            / F.lit(float(p))
        )

    m1 = mean_slice(1, p)
    m2 = mean_slice(p + 1, p)
    init = F.concat(
        F.array(m1, (m2 - m1) / F.lit(float(p)), F.lit(float(p))),
        F.transform(
            F.sequence(F.lit(1), F.lit(p)),
            lambda j: F.element_at(f, j.cast("int")) - m1,
        ),
    )

    def step(acc, v):
        l = F.element_at(acc, 1)
        b = F.element_at(acc, 2)
        cnt = F.element_at(acc, 3)  # t-1 of the element being consumed
        phase = (cnt % F.lit(float(p))).cast("int")  # exact small ints
        s_old = F.element_at(acc, phase + 4)
        l_new = F.lit(a) * (v - s_old) + F.lit(1.0 - a) * (l + b)
        b_new = F.lit(b_) * (l_new - l) + F.lit(1.0 - b_) * b
        s_new = F.lit(g) * (v - l_new) + F.lit(1.0 - g) * s_old
        return F.concat(
            F.array(l_new, b_new, cnt + F.lit(1.0)),
            F.transform(
                F.sequence(F.lit(0), F.lit(p - 1)),
                lambda j: F.when(j.cast("int") == phase, s_new).otherwise(
                    F.element_at(acc, (j + 4).cast("int"))
                ),
            ),
        )

    state = F.aggregate(F.slice(f, p + 1, n - p), init, step)
    guarded = F.when(n >= 2 * p, state)
    level = F.element_at(guarded, 1)
    trend = F.element_at(guarded, 2)
    cols = [F.col(id_col), level.alias("level"), trend.alias("trend")]
    for h in horizons:
        seas = F.element_at(
            guarded, ((n + F.lit(h) - 1) % p).cast("int") + 4
        )
        cols.append(
            (level + F.lit(float(h)) * trend + seas).alias(f"fc_{h}")
        )
    return series.select(*cols)
