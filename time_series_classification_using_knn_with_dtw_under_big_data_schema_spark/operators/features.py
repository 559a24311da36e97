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

__all__ = [
    "series_features", "make_rocket_kernels", "rocket_features",
    "seasonal_decompose", "cusum_changepoint", "mann_kendall", "theil_sen",
    # r6 continuation
    "acf_features", "pacf_features", "ljung_box", "periodogram",
    "periodogram_twiddles", "viterbi_regimes", "haar_features",
    "decomposition_strength", "permutation_patterns", "complexity_features",
    "sampen_counts", "twiddle_fold",
]


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


def make_rocket_kernels(n_kernels: int = 12, length: int = 7, n_beta: int = 3,
                        dilations: tuple = (1, 2)) -> list:
    """Deterministic ROCKET-family kernel bank (MiniROCKET recipe —
    Dempster et al., KDD 2021 — adapted to short series): two-valued
    integer kernels, weight beta=+2 at ``n_beta`` of ``length`` positions
    and alpha=-1 elsewhere, enumerated in lexicographic position order
    (MiniROCKET's own fixed combination set; its 'almost deterministic'
    transform becomes FULLY deterministic here — no RNG anywhere), with
    dilations cycled per kernel. Integer weights are the point: the
    convolution is an exact integer combination of the input doubles, so
    a SQL twin reproduces features bit-for-bit with zero float-literal
    hazards."""
    from itertools import combinations

    if n_beta >= length:
        raise ValueError(f"n_beta {n_beta} must be < kernel length {length}")
    out = []
    for idx, pos in enumerate(combinations(range(length), n_beta)):
        if idx >= n_kernels:
            break
        w = [-1] * length
        for p in pos:
            w[p] = 2
        out.append({"weights": w, "dilation": dilations[idx % len(dilations)]})
    if len(out) < n_kernels:
        raise ValueError(
            f"only {len(out)} distinct kernels exist for length={length}, "
            f"n_beta={n_beta}; asked for {n_kernels}"
        )
    return out


def rocket_features(
    series: DataFrame,
    *,
    kernels: list | None = None,
    n_kernels: int = 12,
    id_col: str = "series_id",
    features_col: str = "features",
    keep_cols: tuple = ("label",),
) -> DataFrame:
    """ROCKET-family convolutional features (Dempster et al. 2020/2021):
    per (series, kernel), the dilated convolution sweep and two pooled
    features — PPV (proportion of positive convolution values,
    MiniROCKET's sole feature, bias fixed at 0 rather than sample
    quantiles — documented simplification) and the ROCKET max. Output
    columns: k{i}_ppv, k{i}_max per kernel, round(6).

    Scale shape: like series_features this is a pure per-row Catalyst
    projection — NO shuffle, no UDF, no pair matrix; the O(n_positions *
    kernel_length) sweep is whole-stage codegen'd per row. The classifier
    that consumes the features (KNN/perceptron/stump) sees a fixed
    2*n_kernels-dim vector regardless of series length — the O(n)-per-row
    escape hatch from the DTW pair matrix, with convolutional (not just
    statistical) shape sensitivity.

    Series shorter than a kernel's span ((length-1)*dilation + 1) yield
    NULL for that kernel's features (sequence() guard — the engine
    invariant)."""
    ks = kernels if kernels is not None else make_rocket_kernels(n_kernels)
    f = F.col(features_col)
    n = F.size(f)
    from functools import reduce as _reduce
    from operator import add as _add

    # closure factory: F.transform inspects the lambda's arity, so the
    # kernel params must be captured, not default-arg'd
    def _conv_fn(d, w):
        return lambda p: _reduce(
            _add,
            [
                F.element_at(f, (p + j * d).cast("int")) * F.lit(wj)
                for j, wj in enumerate(w)
            ],
        )

    # TWO-STAGE projection, deliberately: the conv sweeps land as aliased
    # intermediate columns, and ppv/max read the COLUMN. Inlined, each
    # sweep would evaluate twice (once per pooled feature) — and
    # CollapseProject does NOT merge the projections here because the
    # aliases are non-cheap and multiply-referenced (measured 1.6s ->
    # 0.3s steady-state on the sf0.1 series at 12 kernels).
    inter = series.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        n.alias("_n"),
        *[
            # the when() guard is load-bearing twice over: sequence()
            # DESCENDS for n <= span (engine invariant), and the column is
            # now computed eagerly per row rather than inside the pooled
            # features' own guards
            F.when(
                n > (len(k["weights"]) - 1) * k["dilation"],
                F.transform(
                    F.sequence(
                        F.lit(1), n - (len(k["weights"]) - 1) * k["dilation"]
                    ),
                    _conv_fn(k["dilation"], k["weights"]),
                ),
            ).alias(f"_c{i}")
            for i, k in enumerate(ks)
        ],
    )
    cols = [F.col(id_col), *[F.col(c) for c in keep_cols]]
    for i, k in enumerate(ks):
        span = (len(k["weights"]) - 1) * k["dilation"]
        conv = F.col(f"_c{i}")
        ppv = F.size(F.filter(conv, lambda c: c > 0)).cast("double") / F.size(
            conv
        ).cast("double")
        cols.append(
            F.when(F.col("_n") > span, F.round(ppv, 6)).alias(f"k{i}_ppv")
        )
        cols.append(
            F.when(F.col("_n") > span, F.round(F.array_max(conv), 6)).alias(
                f"k{i}_max"
            )
        )
    return inter.select(*cols)


def seasonal_decompose(
    series: DataFrame,
    *,
    period: int = 4,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Classical additive seasonal decomposition (the
    statsmodels-`seasonal_decompose` / pre-STL textbook method), per
    series: value = trend + seasonal + residual.

    - trend: centered moving average — plain window-``period`` CMA for odd
      periods, the standard 2x``period`` MA (half-weight endpoints) for
      even periods; defined for interior positions only.
    - seasonal: per-phase mean of the detrended values (phase =
      (t-1) mod period), centered to sum to zero over one period; phases
      with no interior sample contribute 0 (short-series guard).
    - residual: value - trend - seasonal.

    One row per (series, interior position): (id_col, t, value, trend,
    seasonal, resid), t 1-based. Series shorter than period+1 produce no
    rows (the sequence guard).

    Every sum is a position-ascending left fold and every mean one IEEE
    division, so a DuckDB list_reduce twin reproduces the decomposition
    bit-for-bit. Pure per-row Catalyst expressions + one explode — no
    shuffle, no UDF: at 100 TB this is a scan-bound projection like
    series_features/rocket_features.
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    p = period
    f = F.col(features_col)
    n = F.size(f)
    half = p // 2

    pos = F.sequence(F.lit(half + 1), n - half)  # interior positions
    base = series.select(
        F.col(id_col),
        f.alias("_f"),
        n.alias("_n"),
        F.when(n >= p + 1, pos).alias("_pos"),
    ).filter(F.col("_pos").isNotNull())

    fb = F.col("_f")

    def xb(i):
        return F.element_at(fb, i.cast("int"))

    def trend_b(t):
        if p % 2:
            return (
                F.aggregate(
                    F.sequence(t - half, t + half), F.lit(0.0),
                    lambda acc, i: acc + xb(i),
                ) / F.lit(float(p))
            )
        core = F.aggregate(
            F.sequence(t - half + 1, t + half - 1),
            xb(t - half) * F.lit(0.5),
            lambda acc, i: acc + xb(i),
        )
        return (core + xb(t + half) * F.lit(0.5)) / F.lit(float(p))

    # per-phase seasonal indexes from the detrended interior, then center
    def phase_stats(j):
        sel = F.filter(F.col("_pos"), lambda t: (t - 1) % p == j)
        s = F.aggregate(
            sel, F.lit(0.0), lambda acc, t: acc + (xb(t) - trend_b(t))
        )
        c = F.size(sel)
        return F.when(c > 0, s / c.cast("double")).otherwise(F.lit(0.0))

    from functools import reduce as _reduce
    from operator import add as _add

    raw_seas = [phase_stats(j) for j in range(p)]
    with_seas = base.select(
        id_col, "_f", "_pos",
        *[sj.alias(f"_s{j}") for j, sj in enumerate(raw_seas)],
    ).withColumn(
        "_sbar",
        _reduce(_add, [F.col(f"_s{j}") for j in range(p)]) / F.lit(float(p)),
    )
    seas_arr = F.array(*[F.col(f"_s{j}") - F.col("_sbar") for j in range(p)])
    out = (
        with_seas.select(
            id_col, "_f",
            seas_arr.alias("_seas"),
            F.explode("_pos").alias("t"),
        )
        .select(
            # stage 1: trend/seasonal as aliased columns so resid reads
            # them instead of re-running the O(period) fold per row (the
            # rocket_features CollapseProject lesson; non-cheap multiply-
            # referenced aliases are NOT inlined)
            id_col,
            "t",
            xb(F.col("t")).alias("value"),
            # RAW doubles, deliberately un-rounded: the mirrored folds are
            # bit-identical cross-engine (verified: 0 ulp diffs over 1800
            # rows at sf0.01), while round(6) would DESYNC — cents/8/4
            # arithmetic makes exact 7-decimal halves common, and Spark
            # (exact-BigDecimal HALF_UP) and DuckDB (double-multiply)
            # disagree on exact halves
            trend_b(F.col("t")).alias("trend"),
            F.element_at(
                "_seas", ((F.col("t") - 1) % p + 1).cast("int")
            ).alias("seasonal"),
        )
        .select(
            id_col,
            "t",
            "value",
            "trend",
            "seasonal",
            (F.col("value") - F.col("trend") - F.col("seasonal")).alias("resid"),
        )
    )
    return out


def cusum_changepoint(
    series: DataFrame,
    *,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """CUSUM change-point detection (Page 1954 / the standard binary-
    segmentation first split): per series, the position maximizing the
    centered cumulative-sum statistic

        stat(t) = | S_t - (t/n) * S_n |,   S_t = x_1 + ... + x_t

    — large when the mean before t differs from the mean after t. Output:
    (id_col, cp_pos, stat, mean_before, mean_after) with cp_pos the
    1-based argmax (ties: smallest t) over t in [1, n-1]; series with
    n < 2 yield no row.

    Shape: prefix sums are ONE left fold carried as array state, the
    argmax one more fold over (stat, t) pairs — a per-row projection, no
    shuffle, no UDF (the q127/q146/q151 family). Every sum is position-
    ascending and the division count is fixed, so the oracle mirrors
    bit-for-bit; outputs stay RAW doubles (q148 lesson).
    """
    f = F.col(features_col)
    n = F.size(f)
    # prefix sums S_1..S_n as one fold: state = [running, S_1, ..., S_t]
    prefix = F.aggregate(
        f,
        F.array().cast("array<double>"),
        lambda acc, v: F.concat(
            acc,
            F.array(
                # try_element_at: the first step reads past the empty
                # accumulator (ANSI element_at would throw)
                F.coalesce(F.try_element_at(acc, F.lit(-1)), F.lit(0.0)) + v
            ),
        ),
    )
    base = series.select(
        F.col(id_col), f.alias("_f"), n.alias("_n"), prefix.alias("_S")
    ).filter(F.col("_n") >= 2)
    S = F.col("_S")
    total = F.element_at(S, F.col("_n").cast("int"))
    nd2 = F.col("_n").cast("double")
    # argmax over t = 1..n-1 of |S_t - (t/n)*S_n|, ties -> smallest t:
    # fold over (stat, t) structs with a (stat desc, t asc) preference
    stats = F.transform(
        F.sequence(F.lit(1), F.col("_n") - 1),
        lambda t: F.struct(
            F.abs(
                F.element_at(S, t.cast("int"))
                - (t.cast("double") / nd2) * total
            ).alias("stat"),
            t.alias("t"),
        ),
    )
    best = F.aggregate(
        stats,
        F.struct(
            F.lit(-1.0).alias("stat"), F.lit(0).cast("int").alias("t")
        ),
        lambda acc, e: F.when(e["stat"] > acc["stat"], e).otherwise(acc),
    )
    cp = F.col("_b.t")
    return base.select(
        id_col,
        F.col("_f"),
        F.col("_n"),
        F.col("_S"),
        best.alias("_b"),
    ).select(
        id_col,
        cp.alias("cp_pos"),
        F.col("_b.stat").alias("stat"),
        (
            F.element_at(F.col("_S"), cp)
            / cp.cast("double")
        ).alias("mean_before"),
        (
            (
                F.element_at(F.col("_S"), F.col("_n").cast("int"))
                - F.element_at(F.col("_S"), cp)
            )
            / (F.col("_n") - cp).cast("double")
        ).alias("mean_after"),
    )


def mann_kendall(
    series: DataFrame,
    *,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Mann-Kendall trend test per series (r6; Mann 1945 / Kendall 1975 —
    THE nonparametric monotone-trend detector, and a perfect fit for the
    engine's exactness discipline because its statistic is a pure INTEGER:

        S = sum_{i<j} sign(x_j - x_i)        in [-n(n-1)/2, n(n-1)/2]

    No variance approximation, no normal quantiles — S and the pair count
    are exact BIGINTs on any engine/partitioning, and Kendall's tau =
    S / (n(n-1)/2) is one IEEE division (oracle bit-equal). O(n^2) per
    series in series LENGTH (bounded), never corpus-sized; per-row
    projection, no shuffle.

    Output: (id_col, s_stat bigint, n_pairs bigint, tau double) —
    tau NULL when n < 2 (no pairs)."""
    f = F.col(features_col)
    n = F.size(f)
    s_stat = F.aggregate(
        F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
            F.array().cast("array<int>")
        ),
        F.lit(0).cast("bigint"),
        lambda acc, i: acc
        + F.aggregate(
            F.sequence(i + 1, n),
            F.lit(0).cast("bigint"),
            lambda a2, j: a2
            + F.signum(F.element_at(f, j) - F.element_at(f, i)).cast("bigint"),
        ),
    )
    n_pairs = (n.cast("bigint") * (n - 1).cast("bigint") / 2).cast("bigint")
    return series.select(
        F.col(id_col),
        s_stat.alias("s_stat"),
        n_pairs.alias("n_pairs"),
        F.when(
            n >= 2, s_stat.cast("double") / n_pairs.cast("double")
        ).alias("tau"),
    )


def theil_sen(
    series: DataFrame,
    *,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Theil-Sen robust slope per series (r6; Theil 1950 / Sen 1968): the
    MEDIAN of all pairwise slopes (x_j - x_i) / (j - i), i < j — up to a
    ~29% contamination breakdown point vs least squares' zero. The whole
    estimator is order-exact: slopes are single IEEE divisions, the median
    is an explicit sort + element pick (even counts average the two middle
    elements with one add + one halving — no interpolation ambiguity
    across engines). Intercept = median of (x_t - slope * t) residual
    levels, same explicit median. O(n^2) slopes per series in LENGTH
    (bounded); per-row projection, no shuffle.

    Output: (id_col, slope double, intercept double) — NULL when n < 2."""
    f = F.col(features_col)
    n = F.size(f)
    slopes = F.array_sort(
        F.flatten(
            F.transform(
                F.when(n >= 2, F.sequence(F.lit(1), n - 1)).otherwise(
                    F.array().cast("array<int>")
                ),
                lambda i: F.transform(
                    F.sequence(i + 1, n),
                    lambda j: (F.element_at(f, j) - F.element_at(f, i))
                    / (j - i).cast("double"),
                ),
            )
        )
    )

    def _median(arr):
        m = F.size(arr)
        mid = (m / 2).cast("int")
        return F.when(
            m % 2 == 1, F.element_at(arr, mid + 1)
        ).otherwise(
            (F.element_at(arr, mid) + F.element_at(arr, mid + 1)) / 2.0
        )

    slope = F.when(n >= 2, _median(slopes))
    levels = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda t: F.element_at(f, t) - slope * t.cast("double"),
        )
    )
    intercept = F.when(n >= 2, _median(levels))
    return series.select(
        F.col(id_col), slope.alias("slope"), intercept.alias("intercept")
    )


def acf_features(
    series: DataFrame,
    *,
    max_lag: int = 8,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Autocorrelation function per series + the dominant seasonal lag
    (r6): the classic periodicity detector —

        acf(l) = sum_{t<=n-l} (x_t - mean)(x_{t+l} - mean)
                 / sum_t (x_t - mean)^2

    for l = 1..min(max_lag, n-1), and dom_lag = argmax_l acf(l) (first
    match on the exact maximum, i.e. the SMALLEST dominant lag on ties).
    Everything is ascending left folds + single IEEE divisions, so raw
    doubles mirror cross-engine bit-for-bit; per-row projection, no
    shuffle, no UDF.

    Output: (id_col, acf1..acf{max_lag} double, dom_lag int). Lags >= n
    are NULL; a constant series (zero variance) or n < 2 yields all-NULL
    acfs and NULL dom_lag (no 0/0 NaNs — NaN max/position semantics are
    the one place engines disagree, so they are designed out)."""
    f = F.col(features_col)
    n = F.size(f)
    mean = (
        F.aggregate(f, F.lit(0.0), lambda a, v: a + v) / n.cast("double")
    )
    base = series.select(
        F.col(id_col), f.alias("_f"), n.alias("_n"), mean.alias("_m")
    )
    f2, n2, m2 = F.col("_f"), F.col("_n"), F.col("_m")
    c0 = F.aggregate(
        f2, F.lit(0.0), lambda a, v: a + (v - m2) * (v - m2)
    )
    L = F.least(F.lit(max_lag), n2 - 1)

    def c_at(lag: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), n2 - lag),
            F.lit(0.0),
            lambda a, t: a
            + (F.element_at(f2, t.cast("int")) - m2)
            * (F.element_at(f2, (t + lag).cast("int")) - m2),
        )

    ok = (n2 >= 2) & (c0 != 0)
    arr = F.when(
        ok, F.transform(F.sequence(F.lit(1), L), lambda l: c_at(l) / c0)
    )
    staged = base.select(
        F.col(id_col), n2.alias("_n"), c0.alias("_c0"), arr.alias("_arr"),
        L.alias("_L"),
    )
    cols = [F.col(id_col)]
    for lag in range(1, max_lag + 1):
        cols.append(
            F.when(
                F.lit(lag) <= F.col("_L"),
                F.element_at(F.col("_arr"), lag),
            ).alias(f"acf{lag}")
        )
    cols.append(
        F.when(
            F.col("_arr").isNotNull(),
            F.array_position(F.col("_arr"), F.array_max(F.col("_arr"))),
        )
        .cast("int")
        .alias("dom_lag")
    )
    return staged.select(*cols)


def periodogram_twiddles(length: int, n_freqs: int | None = None):
    """Twiddle-factor tables for ``periodogram``: for each frequency
    k = 1..n_freqs (default length//2), the cos/sin tables
    C[t] = cos(2*pi*k*t/length), S[t] = sin(2*pi*k*t/length) for t =
    0..length-1, computed ONCE in numpy and injected as plain double
    literals into BOTH the Spark plan and the DuckDB oracle (the rocket-
    kernel literal trick) — the engines never call their own cos/sin
    (libm implementations differ in the last ulp; literals can't)."""
    import math

    if n_freqs is None:
        n_freqs = length // 2
    if not (1 <= n_freqs <= length // 2):
        raise ValueError(f"n_freqs must be in [1, {length // 2}], got {n_freqs}")
    out = []
    for k in range(1, n_freqs + 1):
        cs = [math.cos(2.0 * math.pi * k * t / length) for t in range(length)]
        sn = [math.sin(2.0 * math.pi * k * t / length) for t in range(length)]
        out.append((k, cs, sn))
    return out


def twiddle_fold(arr, table, *, length: int, start=None):
    """THE literal-table dot-product fold — the exactness primitive shared
    by periodogram (q168), sfa_words (q174) and boss_classify (q180):
    ascending fold of ``arr`` (or its 1-based ``start`` window) against a
    PYTHON-literal coefficient table, so both engines parse identical
    doubles and the fold order is the engine-wide left-fold convention.
    Any change to this op order must update the generated oracle SQL in
    __spark_entry__.py in lockstep (NOTES invariant).

    r9 optimization: the fold is UNROLLED into a plain arithmetic chain —
    ``length`` is a Python literal, so ``((0.0 + x[p1]*c1) + x[p2]*c2) + …``
    builds the exact same IEEE op sequence as the ``aggregate`` lambda
    (same adds, same multiplies, same order, same NULL propagation), but
    as ordinary Add/Multiply expressions instead of a higher-order
    function: Spark never codegens HOFs, so the aggregate ran interpreted
    with a per-step lambda frame and a per-row sequence+table
    materialization. Column-level uses (the SFA/periodogram coefficient
    projections, BOSS's MCB edge pass) now whole-stage-codegen; uses
    inside a ``transform`` lambda (BOSS's per-window words) stay
    interpreted but drop the per-term lambda/sequence overhead. Values are
    bit-identical, so the generated DuckDB oracle SQL is unchanged."""
    pos = (lambda t: (start + (t - 1)).cast("int")) if start is not None else (
        lambda t: F.lit(t)
    )
    expr = F.lit(0.0)
    for t in range(1, length + 1):
        expr = expr + F.element_at(arr, pos(t)) * F.lit(float(table[t - 1]))
    return expr


def periodogram(
    series: DataFrame,
    *,
    length: int,
    n_freqs: int | None = None,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Discrete periodogram per series + dominant frequency (r6): for each
    k = 1..n_freqs,

        P(k) = (sum_t x_t cos(2 pi k t/n))^2 + (sum_t x_t sin(2 pi k t/n))^2

    — the textbook O(n^2) DFT power sweep as pure ascending folds over
    PYTHON-literal twiddle tables (see ``periodogram_twiddles``), so the
    whole spectrum is bit-exact cross-engine; dom_freq = first-match
    argmax (lowest frequency on exact ties), dom_period = length/dom_freq.

    Rows whose series length differs from ``length`` are FILTERED (the
    twiddle tables are length-specific — resample_linear upstream for
    ragged corpora). Per-row projection, no shuffle, no UDF; for long
    series at corpus scale the FFT belongs in a kernel (sbd_batch's
    pattern), but at feature-extraction lengths the literal fold IS the
    scale path (stays in the scan projection)."""
    tw = periodogram_twiddles(length, n_freqs)
    f = F.col(features_col)
    base = series.filter(F.size(f) == length)

    p_cols = []
    for k, cs, sn in tw:
        re = twiddle_fold(f, cs, length=length)
        im = twiddle_fold(f, sn, length=length)
        p_cols.append((re * re + im * im).alias(f"p{k}"))
    staged = base.select(F.col(id_col), *p_cols)
    parr = F.array(*[F.col(f"p{k}") for k, _, _ in tw])
    # staged argmax (r6 review): dom_freq computed once, dom_period derived
    # from the COLUMN in a second projection — not a verbatim re-scan
    st2 = staged.select(
        F.col(id_col),
        *[F.col(f"p{k}") for k, _, _ in tw],
        F.array_position(parr, F.array_max(parr)).cast("int").alias("dom_freq"),
    )
    return st2.select(
        "*",
        (F.lit(float(length)) / F.col("dom_freq").cast("double")).alias(
            "dom_period"
        ),
    )


def viterbi_regimes(
    series: DataFrame,
    *,
    switch_cost: float = 500.0,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Two-regime Viterbi decoding per series (r6): label every point
    low/high by the minimum-cost state path of a 2-state HMM-shaped model —
    the regime-segmentation primitive (market state labeling, sensor
    mode detection) that a per-point threshold can't do, because the
    switch penalty makes labels CONTEXTUAL (one spike inside a low regime
    stays low).

    Model, integer-exact by construction: per-series level anchors
    mu_lo = min + (max-min)/4 and mu_hi = max - (max-min)/4 (exact
    min/max + exact divisions); emission cost of state s at point x is
    round((x - mu_s)^2 * 1e6) as BIGINT micro; switching states costs
    round(switch_cost * 1e6) micro. The Viterbi DP then runs entirely in
    BIGINT (the barycenter.py micro-quantize-before-decisions rule), so
    the decoded path is identical on any engine/partitioning; ties prefer
    STAYING in the current state (<=), and the final state tie prefers
    low (<=) — total order, no RNG.

    One aggregate fold per row carrying struct(dlo, dhi, path_lo,
    path_hi) — candidate paths ride in the state (O(n^2) bounded array
    copies, fine at feature lengths); per-row projection, no shuffle, no
    UDF. Output: one row per point — (id_col, t, regime 0|1, value).
    """
    f = F.col(features_col)
    n = F.size(f)
    s_micro = int(round(float(switch_cost) * 1_000_000))
    base = series.filter(n >= 1).select(
        F.col(id_col),
        f.alias("_f"),
        F.aggregate(f, F.lit(float("inf")), lambda a, v: F.least(a, v)).alias("_mn"),
        F.aggregate(f, F.lit(float("-inf")), lambda a, v: F.greatest(a, v)).alias("_mx"),
    )
    mu_lo = (F.col("_mn") + (F.col("_mx") - F.col("_mn")) / F.lit(4.0)).alias("_mlo")
    mu_hi = (F.col("_mx") - (F.col("_mx") - F.col("_mn")) / F.lit(4.0)).alias("_mhi")
    base = base.select(F.col(id_col), F.col("_f"), mu_lo, mu_hi)

    f2 = F.col("_f")
    S = F.lit(s_micro).cast("bigint")

    def em(x: Column, mu: Column) -> Column:
        return F.round((x - mu) * (x - mu) * F.lit(1_000_000.0)).cast("bigint")

    def step(acc: Column, t: Column) -> Column:
        x = F.element_at(f2, t.cast("int"))
        e_lo = em(x, F.col("_mlo"))
        e_hi = em(x, F.col("_mhi"))
        stay_lo = acc["dlo"] <= acc["dhi"] + S
        stay_hi = acc["dhi"] <= acc["dlo"] + S
        return F.struct(
            (e_lo + F.least(acc["dlo"], acc["dhi"] + S)).alias("dlo"),
            (e_hi + F.least(acc["dhi"], acc["dlo"] + S)).alias("dhi"),
            F.array_append(
                F.when(stay_lo, acc["plo"]).otherwise(acc["phi"]), F.lit(0)
            ).alias("plo"),
            F.array_append(
                F.when(stay_hi, acc["phi"]).otherwise(acc["plo"]), F.lit(1)
            ).alias("phi"),
        )

    init = F.struct(
        F.lit(0).cast("bigint").alias("dlo"),
        F.lit(0).cast("bigint").alias("dhi"),
        F.array().cast("array<int>").alias("plo"),
        F.array().cast("array<int>").alias("phi"),
    )
    fin = F.aggregate(F.sequence(F.lit(1), F.size(f2)), init, step)
    path = F.when(fin["dlo"] <= fin["dhi"], fin["plo"]).otherwise(fin["phi"])
    staged = base.select(F.col(id_col), f2.alias("_f"), path.alias("_path"))
    ex = staged.select(
        F.col(id_col), F.col("_f"), F.posexplode(F.col("_path")).alias("_pos", "regime")
    )
    return ex.select(
        F.col(id_col),
        (F.col("_pos") + 1).cast("int").alias("t"),
        F.col("regime"),
        F.element_at(F.col("_f"), (F.col("_pos") + 1).cast("int")).alias("value"),
    )


def ljung_box(
    series: DataFrame,
    *,
    h: int = 8,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Ljung-Box portmanteau statistic per series (r6; Ljung & Box 1978):

        Q(h) = n (n + 2) * sum_{k=1..h} acf(k)^2 / (n - k)

    — the standard "is this residual series white noise?" test statistic,
    the natural follow-up to q152's residual anomalies (large Q = the
    residuals still carry structure the model missed). Reuses q167's
    exact ACF folds; the k-sum is one more ascending fold and the n(n+2)
    scale is exact integer-to-double. The STATISTIC only — the chi-square
    p-value needs a CDF whose libm varies across engines, so thresholding
    against a chosen critical value is the caller's move (Q ~ chi2(h):
    15.5 at h=8, alpha=.05).

    Output: (id_col, q_stat double, h int) — NULL q_stat when n < 2,
    zero variance, or h >= n (the acf(k) would be undefined)."""
    f = F.col(features_col)
    n = F.size(f)
    mean = F.aggregate(f, F.lit(0.0), lambda a, v: a + v) / n.cast("double")
    base = series.select(
        F.col(id_col), f.alias("_f"), n.alias("_n"), mean.alias("_m")
    )
    f2, n2, m2 = F.col("_f"), F.col("_n"), F.col("_m")
    c0 = F.aggregate(f2, F.lit(0.0), lambda a, v: a + (v - m2) * (v - m2))

    def c_at(lag: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), n2 - lag),
            F.lit(0.0),
            lambda a, t: a
            + (F.element_at(f2, t.cast("int")) - m2)
            * (F.element_at(f2, (t + lag).cast("int")) - m2),
        )

    ok = (n2 >= 2) & (c0 != 0) & (F.lit(h) < n2)
    # evaluate-once binding for the O(n) covariance fold (r6 review:
    # writing (c_at(k)/c0) * (c_at(k)/c0) inline expands to TWO full folds
    # per lag — Catalyst does not CSE across HOF subtrees); wrapping the
    # fold value as a 1-element transform binds it to a lambda variable
    ssum = F.aggregate(
        F.sequence(F.lit(1), F.lit(h)),
        F.lit(0.0),
        lambda a, k: a
        + F.element_at(
            F.transform(
                F.array(c_at(k)),
                lambda cv: (cv / c0) * (cv / c0) / (n2 - k).cast("double"),
            ),
            1,
        ),
    )
    q = (n2.cast("double") * (n2 + 2).cast("double")) * ssum
    return base.select(
        F.col(id_col),
        F.when(ok, q).alias("q_stat"),
        F.lit(h).cast("int").alias("h"),
    )


def pacf_features(
    series: DataFrame,
    *,
    max_lag: int = 8,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Partial autocorrelation per series via the Durbin-Levinson
    recursion (r6) — with q167's ACF, the Box-Jenkins model-identification
    pair (AR order = the lag where PACF cuts off; MA order = where ACF
    does):

        phi_{1,1} = acf(1)
        phi_{k,k} = (acf(k) - sum_j phi_{k-1,j} acf(k-j))
                    / (1 - sum_j phi_{k-1,j} acf(j))
        phi_{k,j} = phi_{k-1,j} - phi_{k,k} phi_{k-1,k-j}

    One fold over k carrying (phi row, pacf list); the inner sums are
    ascending folds over the CARRIED phi (a fold accumulator, not a
    re-expanded expression), so per-step cost is O(k) and the whole
    recursion mirrors fold-for-fold in a recursive CTE. Output:
    (id_col, pacf1..pacf{max_lag}) — all NULL when n <= max_lag or the
    series is constant (same all-or-nothing guard as q167; keeps
    0/0-NaN division semantics out of cross-engine hashes)."""
    f = F.col(features_col)
    n = F.size(f)
    mean = F.aggregate(f, F.lit(0.0), lambda a, v: a + v) / n.cast("double")
    base = series.select(
        F.col(id_col), f.alias("_f"), n.alias("_n"), mean.alias("_m")
    )
    f2, n2, m2 = F.col("_f"), F.col("_n"), F.col("_m")
    c0 = F.aggregate(f2, F.lit(0.0), lambda a, v: a + (v - m2) * (v - m2))

    def c_at(lag: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), n2 - lag),
            F.lit(0.0),
            lambda a, t: a
            + (F.element_at(f2, t.cast("int")) - m2)
            * (F.element_at(f2, (t + lag).cast("int")) - m2),
        )

    ok = (n2 > max_lag) & (c0 != 0)
    arr = F.when(
        ok,
        F.transform(F.sequence(F.lit(1), F.lit(max_lag)), lambda l: c_at(l) / c0),
    )
    staged = base.select(F.col(id_col), arr.alias("_a"))
    a = F.col("_a")

    def step(acc: Column, k: Column) -> Column:
        phi = acc["phi"]
        s1 = F.aggregate(
            F.sequence(F.lit(1), k - 1),
            F.lit(0.0),
            lambda s, j: s
            + F.element_at(phi, j.cast("int"))
            * F.element_at(a, (k - j).cast("int")),
        )
        s2 = F.aggregate(
            F.sequence(F.lit(1), k - 1),
            F.lit(0.0),
            lambda s, j: s
            + F.element_at(phi, j.cast("int")) * F.element_at(a, j.cast("int")),
        )
        pk = (F.element_at(a, k.cast("int")) - s1) / (F.lit(1.0) - s2)
        new_phi = F.array_append(
            F.transform(
                F.sequence(F.lit(1), k - 1),
                lambda j: F.element_at(phi, j.cast("int"))
                - pk * F.element_at(phi, (k - j).cast("int")),
            ),
            pk,
        )
        return F.struct(
            new_phi.alias("phi"), F.array_append(acc["pac"], pk).alias("pac")
        )

    init = F.struct(
        F.array(F.element_at(a, 1)).alias("phi"),
        F.array(F.element_at(a, 1)).alias("pac"),
    )
    # max_lag == 1 would make sequence(2, 1) DESCEND (repo invariant):
    # the recursion has no steps, pacf1 = acf(1) directly
    pac = F.when(
        a.isNotNull(),
        F.array(F.element_at(a, 1))
        if max_lag < 2
        else F.aggregate(F.sequence(F.lit(2), F.lit(max_lag)), init, step)["pac"],
    )
    st2 = staged.select(F.col(id_col), pac.alias("_p"))
    return st2.select(
        F.col(id_col),
        *[
            F.element_at(F.col("_p"), k).alias(f"pacf{k}")
            for k in range(1, max_lag + 1)
        ],
    )


def haar_features(
    series: DataFrame,
    *,
    levels: int = 4,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Haar wavelet multiresolution features per series (r6): the classic
    O(n) DWT — at each level, pairwise averages carry to the next level
    and pairwise half-differences become detail coefficients; output the
    final approximation (the 2^levels-point mean under Haar weighting)
    and the DETAIL ENERGY per level (sum of squared details, fine ->
    coarse). Energy by scale separates fast-wiggle series from
    slow-drift series even when their variance matches — the
    multiresolution complement to q167 (lag domain) and q168 (frequency
    domain).

    Haar ops are single IEEE adds/subtracts/halvings and ascending
    energy folds — raw doubles mirror cross-engine exactly. Series are
    truncated to their first 2^levels points; shorter rows are FILTERED
    (the pyramid needs the full dyadic block). One fold over levels
    carrying (avg array, energy list); per-row projection, no
    shuffle/UDF. Output: (id_col, approx, e1..e{levels}) — e1 is the
    finest scale."""
    block = 1 << levels
    f = F.col(features_col)
    base = series.filter(F.size(f) >= block).select(
        F.col(id_col), F.slice(f, 1, block).alias("_f")
    )

    def step(acc: Column, lvl: Column) -> Column:
        cur = acc["avg"]
        m = F.size(cur) / F.lit(2)
        pairs = F.sequence(F.lit(1), m.cast("int"))
        newavg = F.transform(
            pairs,
            lambda i: (
                F.element_at(cur, (2 * i - 1).cast("int"))
                + F.element_at(cur, (2 * i).cast("int"))
            )
            / F.lit(2.0),
        )
        energy = F.aggregate(
            pairs,
            F.lit(0.0),
            lambda s, i: s
            + (
                (
                    F.element_at(cur, (2 * i - 1).cast("int"))
                    - F.element_at(cur, (2 * i).cast("int"))
                )
                / F.lit(2.0)
            )
            * (
                (
                    F.element_at(cur, (2 * i - 1).cast("int"))
                    - F.element_at(cur, (2 * i).cast("int"))
                )
                / F.lit(2.0)
            ),
        )
        return F.struct(
            newavg.alias("avg"), F.array_append(acc["en"], energy).alias("en")
        )

    init = F.struct(
        F.col("_f").alias("avg"), F.array().cast("array<double>").alias("en")
    )
    fin = F.aggregate(F.sequence(F.lit(1), F.lit(levels)), init, step)
    staged = base.select(F.col(id_col), fin.alias("_w"))
    return staged.select(
        F.col(id_col),
        F.element_at(F.col("_w.avg"), 1).alias("approx"),
        *[
            F.element_at(F.col("_w.en"), l).alias(f"e{l}")
            for l in range(1, levels + 1)
        ],
    )


def decomposition_strength(
    series: DataFrame,
    *,
    period: int = 4,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Trend / seasonality strength per series (r6; Wang, Smyl & Hyndman's
    tsfeatures measures) on top of q148's classical decomposition:

        F_trend    = max(0, 1 - Var(R) / Var(T + R))
        F_seasonal = max(0, 1 - Var(R) / Var(S + R))

    in [0, 1] — "how much of the deseasonalized (resp. detrended)
    variation does the trend (resp. seasonality) explain". The
    model-selection dial: high F_seasonal says Holt-Winters (q155) over
    Holt (q151); both near 0 says the series is noise (q172 confirms).

    Determinism: decomposition rows collect into t-ASCENDING arrays per
    series (array_sort on a (t, ...) struct — t is unique), every mean/
    variance is an ascending fold + one exact division, strengths are
    single IEEE subtract/divide under a zero-variance NULL guard. Output:
    (id_col, n_interior, trend_strength, seasonal_strength)."""
    dec = seasonal_decompose(
        series, period=period, id_col=id_col, features_col=features_col
    )
    g = dec.groupBy(id_col).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("t").alias("t"),
                    F.col("trend").alias("tr"),
                    F.col("seasonal").alias("se"),
                    F.col("resid").alias("re"),
                )
            )
        ).alias("_rows")
    )
    rows = F.col("_rows")
    r = F.transform(rows, lambda x: x["re"])
    tr = F.transform(rows, lambda x: x["tr"] + x["re"])
    sr = F.transform(rows, lambda x: x["se"] + x["re"])
    staged = g.select(
        F.col(id_col), r.alias("_r"), tr.alias("_tr"), sr.alias("_sr")
    )

    def var(arr: Column) -> Column:
        n = F.size(arr).cast("double")
        mean = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / n
        return (
            F.aggregate(arr, F.lit(0.0), lambda a, v: a + (v - mean) * (v - mean))
            / n
        )

    vr = var(F.col("_r"))
    vtr = var(F.col("_tr"))
    vsr = var(F.col("_sr"))
    st2 = staged.select(
        F.col(id_col),
        F.size("_r").cast("int").alias("n_interior"),
        vr.alias("_vr"),
        vtr.alias("_vtr"),
        vsr.alias("_vsr"),
    )
    return st2.select(
        F.col(id_col),
        F.col("n_interior"),
        F.when(
            F.col("_vtr") != 0,
            F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vtr")),
        ).alias("trend_strength"),
        F.when(
            F.col("_vsr") != 0,
            F.greatest(F.lit(0.0), F.lit(1.0) - F.col("_vr") / F.col("_vsr")),
        ).alias("seasonal_strength"),
    )


def permutation_patterns(
    series: DataFrame,
    *,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Ordinal pattern analysis per series (r6; Bandt & Pompe 2002, order
    m = 3): every consecutive triple is reduced to its ORDER PATTERN
    (which of the 6 orderings the three values take, ties broken by
    position — a stable, total rule), and the series is summarized by the
    pattern histogram plus a diversity index. Ordinal patterns are
    amplitude-free dynamics signatures: monotone ramps concentrate on one
    pattern, alternations on two, complex dynamics spread out.

    Instead of Shannon permutation ENTROPY (whose ln() is libm-divergent
    cross-engine), the diversity is the Gini/Simpson form
    ``1 - sum (c_i / total)^2`` — an exact rational with the same
    ordering of series by diversity. Pattern code = b12*4 + b13*2 + b23
    where b_ij = [x_i precedes x_j in the stable order]; codes 2 and 5
    are logically impossible (transitivity) and stay 0.

    Output: (id_col, n_windows, c0..c7 bigint, gini double — NULL when
    n < 3). Pure per-row projections; integer counts, one division."""
    f = F.col(features_col)
    n = F.size(f)

    def lt(i: Column, j: Column) -> Column:
        xi, xj = F.element_at(f, i.cast("int")), F.element_at(f, j.cast("int"))
        return (xi < xj) | ((xi == xj) & (i < j))

    codes = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda t: lt(t, t + 1).cast("int") * 4
            + lt(t, t + 2).cast("int") * 2
            + lt(t + 1, t + 2).cast("int"),
        ),
    )
    base = series.select(F.col(id_col), codes.alias("_codes"))
    c = F.col("_codes")
    total = F.size(c).cast("double")
    cnt = lambda k: F.size(F.filter(c, lambda v: v == k)).cast("bigint")  # noqa: E731
    gini = F.lit(1.0) - F.aggregate(
        F.sequence(F.lit(0), F.lit(7)),
        F.lit(0.0),
        lambda a, k: a
        + (F.size(F.filter(c, lambda v: v == k)).cast("double") / total)
        * (F.size(F.filter(c, lambda v: v == k)).cast("double") / total),
    )
    return base.select(
        F.col(id_col),
        F.coalesce(F.size(c), F.lit(0)).cast("int").alias("n_windows"),
        *[F.coalesce(cnt(F.lit(k)), F.lit(0).cast("bigint")).alias(f"c{k}") for k in range(8)],
        F.when(c.isNotNull(), gini).alias("gini"),
    )


def complexity_features(
    series: DataFrame,
    *,
    lag: int = 1,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Nonlinearity / complexity statistics per series (r6) — the tsfresh
    classics that q45's moment features miss:

        abs_energy  sum x_t^2
        cid         sqrt(sum (x_{t+1} - x_t)^2)   (Batista et al. 2014 —
                    the 'complexity-invariant distance' normalizer)
        c3          mean of x_t * x_{t+lag} * x_{t+2lag}
                    (Schreiber & Schmitz 1997 nonlinearity measure)
        trev        mean of (x_{t+lag} - x_t)^3   (time-reversal
                    asymmetry, unnormalized numerator form)

    All ascending folds + exact divisions + one sqrt — raw doubles mirror
    cross-engine. c3/trev are NULL when the series is too short for the
    lag window (the sequence guard). Per-row projection, scan-bound."""
    f = F.col(features_col)
    n = F.size(f)
    abs_energy = F.aggregate(f, F.lit(0.0), lambda a, v: a + v * v)
    cid = F.sqrt(
        F.when(
            n >= 2,
            F.aggregate(
                F.sequence(F.lit(2), n),
                F.lit(0.0),
                lambda a, t: a
                + (
                    F.element_at(f, t.cast("int"))
                    - F.element_at(f, (t - 1).cast("int"))
                )
                * (
                    F.element_at(f, t.cast("int"))
                    - F.element_at(f, (t - 1).cast("int"))
                ),
            ),
        ).otherwise(F.lit(0.0))
    )
    c3 = F.when(
        n >= 2 * lag + 1,
        F.aggregate(
            F.sequence(F.lit(1), n - 2 * lag),
            F.lit(0.0),
            lambda a, t: a
            + F.element_at(f, t.cast("int"))
            * F.element_at(f, (t + lag).cast("int"))
            * F.element_at(f, (t + 2 * lag).cast("int")),
        )
        / (n - 2 * lag).cast("double"),
    )
    trev = F.when(
        n >= lag + 1,
        F.aggregate(
            F.sequence(F.lit(1), n - lag),
            F.lit(0.0),
            lambda a, t: a
            + (
                F.element_at(f, (t + lag).cast("int"))
                - F.element_at(f, t.cast("int"))
            )
            * (
                F.element_at(f, (t + lag).cast("int"))
                - F.element_at(f, t.cast("int"))
            )
            * (
                F.element_at(f, (t + lag).cast("int"))
                - F.element_at(f, t.cast("int"))
            ),
        )
        / (n - lag).cast("double"),
    )
    return series.select(
        F.col(id_col),
        abs_energy.alias("abs_energy"),
        cid.alias("cid"),
        c3.alias("c3"),
        trev.alias("trev"),
    )


def sampen_counts(
    series: DataFrame,
    *,
    r: float = 10.0,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Sample-entropy template-match counts per series (r6; Richman &
    Moorman 2000, m = 2): B = matching 2-point template pairs, A =
    matching 3-point template pairs, both under Chebyshev tolerance
    ``r`` and i < j (no self-matches). SampEn itself is -ln(A/B); the ln
    is libm-divergent cross-engine, so this operator outputs the INTEGER
    counts and the exact rational ratio A/B — the same regularity
    ordering (a regular series keeps its 2-matches when extended to 3
    points -> ratio near 1; noise loses them -> ratio near 0). Ratio is
    NULL when B = 0 or n < 4. O(len^2) integer folds per row, never
    corpus-quadratic; fixed raw-value tolerance (pair with znorm upstream
    for amplitude-invariant regularity)."""
    f = F.col(features_col)
    n = F.size(f)
    rl = F.lit(float(r))

    def el(i):
        return F.element_at(f, i.cast("int"))

    def cnt(last_start, extra):
        # sum over 1 <= i < j <= last_start of [templates at i, j match]
        return F.aggregate(
            F.when(last_start >= 2, F.sequence(F.lit(1), last_start - 1)).otherwise(
                F.array().cast("array<int>")
            ),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.aggregate(
                F.sequence(i + 1, last_start),
                F.lit(0).cast("bigint"),
                lambda a2, j: a2
                + F.when(
                    (F.abs(el(i) - el(j)) <= rl)
                    & (F.abs(el(i + 1) - el(j + 1)) <= rl)
                    & (
                        (F.abs(el(i + 2) - el(j + 2)) <= rl)
                        if extra
                        else F.lit(True)
                    ),
                    F.lit(1),
                )
                .otherwise(F.lit(0))
                .cast("bigint"),
            ),
        )

    b = F.when(n >= 3, cnt(n - 1, False)).otherwise(F.lit(0).cast("bigint"))
    a = F.when(n >= 4, cnt(n - 2, True)).otherwise(F.lit(0).cast("bigint"))
    staged = series.select(F.col(id_col), b.alias("b_count"), a.alias("a_count"))
    return staged.select(
        F.col(id_col),
        "b_count",
        "a_count",
        F.when(
            F.col("b_count") > 0,
            F.col("a_count").cast("double") / F.col("b_count").cast("double"),
        ).alias("match_ratio"),
    )
