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

__all__ = ["ar_forecast", "holt_forecast", "holt_winters_forecast"]


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


def ar_forecast(
    series: DataFrame,
    *,
    horizons: tuple = (1, 2),
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Per-series AR(2)-with-intercept least squares, solved EXACTLY by
    normal equations + Cramer's rule (r6; the classic autoregressive
    short-horizon forecaster — Box & Jenkins' AR family at fixed order,
    where the closed form keeps the whole fit oracle-exact; an iterative
    solver's float trajectory would be engine-fragile).

        y_t = c + a1 * y_{t-1} + a2 * y_{t-2} + e_t,   t = 3..n

    ONE ascending-t Catalyst ``aggregate`` fold accumulates the eight
    normal-equation sums (fixed in-state order, so a DuckDB list_reduce
    twin reproduces every intermediate bit-for-bit), then a fixed
    expression tree evaluates the 3x3 Cramer determinants. Forecasts roll
    forward recursively: fc_1 = c + a1*y_n + a2*y_{n-1};
    fc_2 = c + a1*fc_1 + a2*y_n; ...

    NULL row when the fit is undefined: n < 5 (fewer equations than
    parameters) or a singular system (det == 0 exactly — e.g. constant
    series, where the lag columns are collinear).

    Engine shape: scan-bound per-row projection (q127/q146/holt family) —
    no shuffle, no UDF, no driver loop.

    Output: (id_col, c, a1, a2, fc_<h>...) — raw doubles (q148 lesson:
    mirrored folds are already bit-equal; never round).
    """
    hs = sorted(set(int(h) for h in horizons))
    if not hs or hs[0] < 1:
        raise ValueError(f"horizons must all be >= 1, got {tuple(horizons)}")
    f = F.col(features_col)
    n = F.size(f)

    def step(acc, t):
        y = F.element_at(f, t)
        y1 = F.element_at(f, t - 1)
        y2 = F.element_at(f, t - 2)
        return F.array(
            F.element_at(acc, 1) + y1,            # S1  = sum y_{t-1}
            F.element_at(acc, 2) + y2,            # S2  = sum y_{t-2}
            F.element_at(acc, 3) + y1 * y1,       # S11
            F.element_at(acc, 4) + y2 * y2,       # S22
            F.element_at(acc, 5) + y1 * y2,       # S12
            F.element_at(acc, 6) + y,             # Sy
            F.element_at(acc, 7) + y * y1,        # Sy1
            F.element_at(acc, 8) + y * y2,        # Sy2
        )

    init = F.array(*[F.lit(0.0)] * 8)
    # n < 3: F.sequence(3, n) would run DESCENDING into index-0/OOB errors
    # (review r6) — fold over an empty index list instead; the n >= 5
    # output gate below nulls the row either way
    idx = F.when(n >= 3, F.sequence(F.lit(3), n)).otherwise(
        F.array().cast("array<int>")
    )
    s = F.aggregate(idx, init, step)
    S1, S2, S11, S22, S12, Sy, Sy1, Sy2 = [
        F.element_at(s, i + 1) for i in range(8)
    ]
    S0 = (n - 2).cast("double")

    def det3(a, b, c, d, e, g, h, i, j):
        # | a b c |
        # | d e g |   expanded along the first row, fixed op order
        # | h i j |
        return a * (e * j - g * i) - b * (d * j - g * h) + c * (d * i - e * h)

    det = det3(S0, S1, S2, S1, S11, S12, S2, S12, S22)
    det_c = det3(Sy, S1, S2, Sy1, S11, S12, Sy2, S12, S22)
    det_a1 = det3(S0, Sy, S2, S1, Sy1, S12, S2, Sy2, S22)
    det_a2 = det3(S0, S1, Sy, S1, S11, Sy1, S2, S12, Sy2)
    ok = (n >= 5) & (det != 0.0)
    c = F.when(ok, det_c / det)
    a1 = F.when(ok, det_a1 / det)
    a2 = F.when(ok, det_a2 / det)

    # element_at with n < 2 is an index-0/OOB error even on rows the fit
    # gate nulls — CaseWhen evaluates lazily per row, so the guards make
    # empty/1-point series safe (review r6)
    yn = F.when(n >= 2, F.element_at(f, n))
    yn1 = F.when(n >= 2, F.element_at(f, n - 1))
    fcs = []
    prev2, prev1 = yn1, yn
    for _ in range(hs[-1]):
        nxt = c + a1 * prev1 + a2 * prev2
        fcs.append(nxt)
        prev2, prev1 = prev1, nxt
    out = [F.col(id_col), c.alias("c"), a1.alias("a1"), a2.alias("a2")]
    for h in hs:
        out.append(fcs[h - 1].alias(f"fc_{h}"))
    return series.select(*out)


def forecast_backtest(
    series: DataFrame,
    *,
    holdout: int = 4,
    alpha: float = 0.5,
    beta: float = 0.25,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Holdout backtest of the Holt forecaster per series (r6): fit on the
    first n - holdout points, forecast h = 1..holdout, score against the
    held-out tail — the evaluation loop that turns the forecasting
    operators (q151/q155/q158) into a measured choice:

        mae       mean |fc_h - actual_h| over the holdout
        rmse      sqrt(mean squared error)
        mae_naive same for the last-value-carried-forward baseline
        mase      mae / (in-sample one-step naive MAE on the train head)
                  (Hyndman & Koehler 2006 — scale-free, < 1 means
                  "beats naive"; NULL for constant heads)

    Every metric is an ascending fold + exact division (+ one sqrt), so
    raw doubles hash cross-engine. Series shorter than holdout + 2 drop
    (Holt needs 2 train points). Per-row projection, no shuffle."""
    from pyspark.sql import functions as F

    f = F.col(features_col)
    n = F.size(f)
    base = series.filter(n >= holdout + 2).select(
        F.col(id_col),
        F.slice(f, 1, n - holdout).alias("_head"),
        F.slice(f, n - holdout + 1, holdout).alias("_act"),
    )
    fits = holt_forecast(
        base.select(F.col(id_col), F.col("_head").alias(features_col)),
        alpha=alpha,
        beta=beta,
        horizons=tuple(range(1, holdout + 1)),
        id_col=id_col,
        features_col=features_col,
    )
    j = base.join(fits, id_col)
    fc = F.array(*[F.col(f"fc_{h}") for h in range(1, holdout + 1)])
    act = F.col("_act")
    hd = F.lit(float(holdout))
    mae = F.aggregate(
        F.zip_with(fc, act, lambda p, a: F.abs(p - a)), F.lit(0.0), lambda s, v: s + v
    ) / hd
    rmse = F.sqrt(
        F.aggregate(
            F.zip_with(fc, act, lambda p, a: (p - a) * (p - a)),
            F.lit(0.0),
            lambda s, v: s + v,
        )
        / hd
    )
    last = F.element_at(F.col("_head"), -1)
    mae_naive = F.aggregate(
        F.transform(act, lambda a: F.abs(last - a)), F.lit(0.0), lambda s, v: s + v
    ) / hd
    m = F.size("_head")
    insample = F.aggregate(
        F.sequence(F.lit(2), m),
        F.lit(0.0),
        lambda s, t: s
        + F.abs(
            F.element_at("_head", t.cast("int"))
            - F.element_at("_head", (t - 1).cast("int"))
        ),
    ) / (m - 1).cast("double")
    return j.select(
        F.col(id_col),
        mae.alias("mae"),
        rmse.alias("rmse"),
        mae_naive.alias("mae_naive"),
        F.when(insample != 0, mae / insample).alias("mase"),
    )
