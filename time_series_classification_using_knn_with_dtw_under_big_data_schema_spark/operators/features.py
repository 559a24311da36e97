"""Per-series feature extraction (tsfresh-style, engine extension).

The reference classifies series by pairwise distance (KNN over Euclidean /
DTW — Team11-Project.py's whole surface). The classic scale-out
alternative is FEATURE-BASED classification: collapse each series to a
fixed vector of shape/dynamics statistics, then run any cheap classifier
(e.g. operators/classify.py's perceptron) in feature space — O(n) per
series instead of O(n*m) per PAIR, no cross join at all. At 100 TB the
pair matrix is the enemy; this operator is the escape hatch.

Every feature is a per-row fold over the series array — NO shuffle, no
UDF, pure Catalyst expressions, scan-bound. Arithmetic is fixed
left-to-right double folds (the engine-wide oracle convention), so a
DuckDB list_reduce mirror reproduces each value bit-for-bit:

    n_points        length
    mean            left-fold sum / n
    variance        left-fold sum of (x - mean)^2 / n   (population)
    vmin / vmax     order-free extrema
    mean_abs_change mean |x[i] - x[i-1]|                (0.0 for n < 2)
    zero_crossings  # sign changes of the centered series (strict <0)
    n_peaks         # strict local maxima                (0 for n < 3)
    acf1            lag-1 autocorrelation: sum d[i]*d[i+1] / sum d^2
                    (0.0 when the series is constant)

The sequence(2, n) guards follow the engine invariant: Spark sequence(a,
b) DESCENDS when b < a, so every dynamic range is wrapped in a length
conditional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["series_features"]


def _fold_sum(arr):
    return F.aggregate(
        arr, F.lit(0.0), lambda acc, v: acc + v
    )


def series_features(
    series: DataFrame,
    *,
    id_col: str = "series_id",
    features_col: str = "features",
    channel: int | None = None,
) -> DataFrame:
    """(id_col, n_points, mean, variance, vmin, vmax, mean_abs_change,
    zero_crossings, n_peaks, acf1) — one row per series, one scan, zero
    shuffles. The statistics are univariate: multichannel (nested-array)
    series must pass ``channel`` (0-based) to select which channel to
    profile — still a per-row projection, so extracting every channel is
    C independent scan-bound passes (or one pass after an upstream
    explode). A nested column without ``channel`` is rejected."""
    ftype = dict(series.dtypes).get(features_col)
    nested = bool(ftype) and ftype.startswith("array<array")
    if nested and channel is None:
        raise ValueError(
            "series_features is univariate; got nested "
            f"{ftype} in {features_col!r} — pass channel=<i> to select one"
        )
    if channel is not None:
        if not nested:
            raise ValueError(
                f"channel={channel} given but {features_col!r} is flat"
            )
        if channel < 0:
            raise ValueError(f"channel must be >= 0, got {channel}")
        # loud out-of-range guard under BOTH ANSI modes: try_element_at
        # is NULL past the end (where plain element_at would either throw
        # an opaque ANSI error or, ANSI-off, silently turn every
        # statistic NULL) — so the raise carries the real diagnosis
        src = F.transform(
            F.col(features_col),
            lambda p: F.when(
                F.try_element_at(p, F.lit(channel + 1)).isNull(),
                F.raise_error(
                    F.lit(
                        f"channel {channel} out of range (or null element) "
                        "in multichannel series"
                    )
                ),
            ).otherwise(F.try_element_at(p, F.lit(channel + 1))),
        )
    else:
        src = F.col(features_col)
    x = F.col("_x")
    n = F.size(x)
    nd = n.cast("double")
    base = series.select(
        F.col(id_col), src.alias("_x")
    ).withColumn("_mu", _fold_sum(x) / nd)
    mu = F.col("_mu")
    # centered series: the reusable intermediate for var / crossings / acf1
    d = F.transform(x, lambda v: v - mu)
    based = base.withColumn("_d", d)
    dcol = F.col("_d")
    head = lambda c: F.slice(c, 1, n - 1)  # noqa: E731 — x[1..n-1]
    tail = lambda c: F.slice(c, 2, n - 1)  # noqa: E731 — x[2..n]
    variance = _fold_sum(F.transform(dcol, lambda v: v * v)) / nd
    mac = F.when(
        n >= 2,
        _fold_sum(F.zip_with(tail(x), head(x), lambda a, b: F.abs(a - b)))
        / (nd - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    crossings = F.when(
        n >= 2,
        F.size(
            F.filter(
                F.zip_with(head(dcol), tail(dcol), lambda a, b: a * b < 0),
                lambda b: b,
            )
        ),
    ).otherwise(F.lit(0))
    peaks = F.when(
        n >= 3,
        F.size(
            F.filter(
                F.transform(
                    F.sequence(F.lit(2), n - 1),
                    lambda i: (F.element_at(x, i) > F.element_at(x, i - 1))
                    & (F.element_at(x, i) > F.element_at(x, i + 1)),
                ),
                lambda b: b,
            )
        ),
    ).otherwise(F.lit(0))
    acf_num = F.when(
        n >= 2,
        _fold_sum(F.zip_with(head(dcol), tail(dcol), lambda a, b: a * b)),
    ).otherwise(F.lit(0.0))
    acf_den = _fold_sum(F.transform(dcol, lambda v: v * v))
    acf1 = F.when(acf_den > 0, acf_num / acf_den).otherwise(F.lit(0.0))
    return based.select(
        id_col,
        n.cast("int").alias("n_points"),
        mu.alias("mean"),
        variance.alias("variance"),
        F.array_min(x).alias("vmin"),
        F.array_max(x).alias("vmax"),
        mac.alias("mean_abs_change"),
        crossings.cast("int").alias("zero_crossings"),
        peaks.cast("int").alias("n_peaks"),
        acf1.alias("acf1"),
    )
