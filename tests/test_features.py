"""series_features (operators/features.py): numpy-golden parity on
random/edge series, and the composition it exists for — feature-space
classification beating the pair matrix on separable series."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import (
    score_with_weights,
    train_quality_perceptron,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.features import series_features


def _numpy_features(f):
    f = np.asarray(f, dtype=np.float64)
    n = len(f)
    # left-to-right fold sums, mirroring the Spark/DuckDB op order
    mu = 0.0
    for v in f:
        mu += v
    mu /= n
    d = f - mu
    den = 0.0
    for v in d:
        den += v * v
    var = den / n
    mac = 0.0
    if n >= 2:
        for i in range(1, n):
            mac += abs(f[i] - f[i - 1])
        mac /= n - 1
    zc = int(((d[:-1] * d[1:]) < 0).sum()) if n >= 2 else 0
    pk = (
        int(((f[1:-1] > f[:-2]) & (f[1:-1] > f[2:])).sum()) if n >= 3 else 0
    )
    num = 0.0
    if n >= 2:
        for i in range(n - 1):
            num += d[i] * d[i + 1]
    acf1 = num / den if den > 0 else 0.0
    return (n, mu, var, float(f.min()), float(f.max()), mac, zc, pk, acf1)


def test_matches_numpy_golden(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(v) for v in rng.normal(0, 3, int(rng.integers(1, 40)))]) for i in range(60)]
    rows += [(100, [5.0]), (101, [1.0, 1.0, 1.0]), (102, [2.0, -2.0]),
             (103, [0.0, 1.0, 0.0, 1.0, 0.0])]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in series_features(df).collect()}
    for sid, f in rows:
        n, mu, var, vmin, vmax, mac, zc, pk, acf1 = _numpy_features(f)
        g = got[sid]
        assert g["n_points"] == n
        assert g["mean"] == mu
        assert g["variance"] == var
        assert g["vmin"] == vmin and g["vmax"] == vmax
        assert g["mean_abs_change"] == mac
        assert g["zero_crossings"] == zc
        assert g["n_peaks"] == pk
        assert g["acf1"] == acf1


def test_constant_series_safe(spark):
    df = spark.createDataFrame(
        [(1, [7.0] * 10)], "series_id long, features array<double>"
    )
    r = series_features(df).first()
    assert r["variance"] == 0.0 and r["acf1"] == 0.0 and r["zero_crossings"] == 0


def test_multichannel_rejected(spark):
    df = spark.createDataFrame(
        [(1, [[1.0, 2.0]])], "series_id long, features array<array<double>>"
    )
    with pytest.raises(ValueError, match="univariate"):
        series_features(df)


def test_feature_space_classification_on_har(spark, har_dfs):
    # the whole point of the operator: on structured series, feature-space
    # linear classification replaces the KNN pair matrix. HAR-like classes
    # differ in frequency -> zero_crossings/acf1/mac separate them; a
    # 1-vs-rest perceptron on quantized features should far exceed the
    # majority baseline (class 1 is ~25%)
    train, _ = har_dfs
    feats = series_features(train)
    # comparable feature magnitudes matter for the perceptron (no
    # per-feature learning rates): everything lands in the O(100-1000)
    # range — measured 1.0 train accuracy at 12+ epochs vs 0.77
    # (= majority collapse) with the raw-scale mix
    x = F.array(
        F.lit(1).cast("long"),
        F.round(F.col("mean") * 100).cast("long"),
        F.round(F.col("mean_abs_change") * 100).cast("long"),
        F.round(F.col("acf1") * 1000).cast("long"),
        (F.col("zero_crossings") * 100).cast("long"),
        (F.col("n_peaks") * 100).cast("long"),
    )
    labeled = (
        feats.join(train.select("series_id", "label"), "series_id")
        .select(
            F.col("series_id").alias("doc_id"),
            x.alias("x"),
            F.when(F.col("label") == 1.0, 1).otherwise(-1).alias("y"),
        )
    )
    w = train_quality_perceptron(labeled, epochs=12)
    scored = score_with_weights(labeled, w).join(
        labeled.select("doc_id", "y"), "doc_id"
    )
    acc = scored.select(
        F.avg((F.col("kept") == (F.col("y") > 0)).cast("double")).alias("a")
    ).first()["a"]
    assert acc >= 0.9, acc


def test_channel_selection_matches_flat(spark):
    rng = np.random.default_rng(5)
    mv_rows, flat0, flat1 = [], [], []
    for i in range(10):
        a = [float(v) for v in rng.normal(0, 2, 12)]
        b = [float(v) for v in rng.normal(5, 1, 12)]
        mv_rows.append((i, [[x, y] for x, y in zip(a, b)]))
        flat0.append((i, a))
        flat1.append((i, b))
    mv = spark.createDataFrame(mv_rows, "series_id long, features array<array<double>>")
    for ch, flat in ((0, flat0), (1, flat1)):
        fdf = spark.createDataFrame(flat, "series_id long, features array<double>")
        got = sorted(series_features(mv, channel=ch).collect())
        want = sorted(series_features(fdf).collect())
        assert got == want
    with pytest.raises(ValueError, match="univariate"):
        series_features(mv)
    with pytest.raises(ValueError, match="flat"):
        series_features(spark.createDataFrame(flat0, "series_id long, features array<double>"), channel=0)


def test_channel_out_of_range_raises(spark):
    df = spark.createDataFrame(
        [(1, [[1.0, 2.0], [3.0, 4.0]])],
        "series_id long, features array<array<double>>",
    )
    with pytest.raises(Exception, match="out of range"):
        series_features(df, channel=2).collect()


# ---------------------------------------------------------------------------
# rocket_features (ROCKET-family integer conv kernels)
# ---------------------------------------------------------------------------


def test_rocket_features_hand_computed(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        make_rocket_kernels,
        rocket_features,
    )

    x = [float(v) for v in [1, -2, 3, 0, 5, -1, 2, 4, -3, 1, 0, 2, -1, 3, 1, -2]]
    df = spark.createDataFrame(
        [(1, x, "a")], "series_id long, features array<double>, label string"
    )
    got = rocket_features(df, n_kernels=4).collect()[0]
    for i, k in enumerate(make_rocket_kernels(4)):
        d, w = k["dilation"], k["weights"]
        span = (len(w) - 1) * d
        conv = [
            sum(x[p + j * d] * wj for j, wj in enumerate(w))
            for p in range(len(x) - span)
        ]
        ppv = sum(1 for c in conv if c > 0) / len(conv)
        assert got[f"k{i}_ppv"] == round(ppv, 6), (i, "ppv")
        assert got[f"k{i}_max"] == round(max(conv), 6), (i, "max")


def test_rocket_features_short_series_null_guard(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import rocket_features

    # length 10: dilation-1 kernels (span 6) fit, dilation-2 (span 12) don't
    df = spark.createDataFrame(
        [(1, [float(i) for i in range(10)], "a")],
        "series_id long, features array<double>, label string",
    )
    got = rocket_features(df, n_kernels=2).collect()[0]
    assert got["k0_ppv"] is not None and got["k0_max"] is not None
    assert got["k1_ppv"] is None and got["k1_max"] is None


def test_make_rocket_kernels_validation():
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import make_rocket_kernels

    with pytest.raises(ValueError, match="n_beta"):
        make_rocket_kernels(n_beta=7, length=7)
    with pytest.raises(ValueError, match="distinct kernels"):
        make_rocket_kernels(n_kernels=100, length=4, n_beta=2)
    ks = make_rocket_kernels(12)
    assert len(ks) == 12
    assert all(sorted(set(k["weights"])) == [-1, 2] for k in ks)
    assert {k["dilation"] for k in ks} == {1, 2}


# ---------------------------------------------------------------------------
# seasonal_decompose (classical additive decomposition)
# ---------------------------------------------------------------------------


def _decompose_py(xs, p):
    n, half = len(xs), p // 2
    trend = {}
    for t in range(half + 1, n - half + 1):
        if p % 2:
            acc = 0.0
            for i in range(t - half, t + half + 1):
                acc += xs[i - 1]
            trend[t] = acc / p
        else:
            acc = xs[t - half - 1] * 0.5
            for i in range(t - half + 1, t + half):
                acc += xs[i - 1]
            trend[t] = (acc + xs[t + half - 1] * 0.5) / p
    s = []
    for j in range(p):
        sel = [t for t in trend if (t - 1) % p == j]
        acc = 0.0
        for t in sorted(sel):
            acc += xs[t - 1] - trend[t]
        s.append(acc / len(sel) if sel else 0.0)
    sbar = 0.0
    for v in s:
        sbar += v
    sbar /= p
    sc = [v - sbar for v in s]
    return {
        t: (xs[t - 1], trend[t], sc[(t - 1) % p], xs[t - 1] - trend[t] - sc[(t - 1) % p])
        for t in trend
    }


@pytest.mark.parametrize("period", [3, 4])
def test_seasonal_decompose_matches_python_replay(spark, period):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import seasonal_decompose

    rng = np.random.default_rng(2)
    rows = [
        (i, [float(x) for x in rng.normal(size=16) + 0.3 * np.arange(16)])
        for i in range(6)
    ]
    rows.append((99, [1.0] * (period)))  # too short -> no rows
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    out = seasonal_decompose(df, period=period).collect()
    feats = dict(rows)
    n_expected = sum(
        max(len(f) - 2 * (period // 2), 0) if len(f) >= period + 1 else 0
        for f in feats.values()
    )
    assert len(out) == n_expected
    for r in out:
        exp = _decompose_py(feats[r["series_id"]], period)[r["t"]]
        got = (r["value"], r["trend"], r["seasonal"], r["resid"])
        for g, e in zip(got, exp):
            assert g == pytest.approx(e, abs=1e-12)


def test_seasonal_decompose_recovers_planted_seasonality(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import seasonal_decompose

    t = np.arange(16)
    planted = np.array([3.0, 0.0, -3.0, 0.0])  # period-4 shape
    xs = 0.5 * t + planted[t % 4]
    df = spark.createDataFrame(
        [(1, [float(x) for x in xs])], "series_id long, features array<double>"
    )
    out = seasonal_decompose(df, period=4).collect()
    # trend recovers the line, seasonal the planted shape, resid ~ 0
    for r in out:
        assert r["seasonal"] == pytest.approx(planted[(r["t"] - 1) % 4], abs=1e-9)
        assert r["resid"] == pytest.approx(0.0, abs=1e-9)
        assert r["trend"] == pytest.approx(0.5 * (r["t"] - 1), abs=1e-9)
    with pytest.raises(ValueError, match="period"):
        seasonal_decompose(df, period=1)


# ---------------------------------------------------------------------------
# holt_forecast (exponential smoothing)
# ---------------------------------------------------------------------------


def test_holt_forecast_matches_python_replay_and_extrapolates(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import holt_forecast

    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.normal(size=14).cumsum()]) for i in range(5)
    ]
    rows.append((98, [7.0]))  # n < 2 -> NULLs
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in holt_forecast(df, alpha=0.5, beta=0.25).collect()}

    def replay(xs, a=0.5, b=0.25):
        l, t = xs[1], xs[1] - xs[0]  # exact post-t=2 Holt state
        for v in xs[2:]:
            ln = a * v + (1 - a) * (l + t)
            t = b * (ln - l) + (1 - b) * t
            l = ln
        return l, t

    for i, xs in rows:
        r = got[i]
        if len(xs) < 2:
            assert r["level"] is None and r["fc_1"] is None
            continue
        l, t = replay(xs)
        assert (r["level"], r["trend"]) == (l, t)
        assert r["fc_1"] == l + 1.0 * t and r["fc_4"] == l + 4.0 * t
    # clean line -> near-exact extrapolation
    lin = [float(2 * i + 1) for i in range(16)]
    lr = holt_forecast(
        spark.createDataFrame([(1, lin)], "series_id long, features array<double>")
    ).collect()[0]
    assert lr["fc_1"] == pytest.approx(33.0, abs=0.1)
    assert lr["fc_4"] == pytest.approx(39.0, abs=0.1)
    with pytest.raises(ValueError, match="alpha"):
        holt_forecast(df, alpha=0.0)


def test_cusum_changepoint_detects_shift_and_replays(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import cusum_changepoint

    rng = np.random.default_rng(7)
    rows = []
    for i in range(6):
        cp = 4 + i
        xs = np.concatenate([rng.normal(size=cp), rng.normal(size=16 - cp) + 5.0])
        rows.append((i, [float(x) for x in xs]))
    rows.append((99, [2.0]))  # n < 2 -> no row
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    out = {r["series_id"]: r for r in cusum_changepoint(df).collect()}
    assert 99 not in out and len(out) == 6
    for i, xs in rows:
        if len(xs) < 2:
            continue
        n = len(xs)
        S, run = [], 0.0
        for v in xs:
            run += v
            S.append(run)
        best = (-1.0, 0)
        for t in range(1, n):
            st = abs(S[t - 1] - (t / n) * S[n - 1])
            if st > best[0]:
                best = (st, t)
        r = out[i]
        assert (r["cp_pos"], r["stat"]) == (best[1], best[0])
        assert r["mean_before"] == S[best[1] - 1] / best[1]
        assert r["mean_after"] == (S[n - 1] - S[best[1] - 1]) / (n - best[1])
        # the planted shift at 4+i is found within 1 position
        assert abs(r["cp_pos"] - (4 + i)) <= 1


def test_holt_winters_matches_replay_and_recovers_seasonality(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import holt_winters_forecast

    rng = np.random.default_rng(9)
    rows = []
    seas = np.array([4.0, 0.0, -4.0, 0.0])
    for i in range(4):
        t = np.arange(16)
        xs = 2.0 + 0.7 * t + seas[t % 4] + rng.normal(size=16) * 0.05
        rows.append((i, [float(x) for x in xs]))
    rows.append((99, [1.0] * 7))  # n < 2*period -> NULLs
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in holt_winters_forecast(df, period=4).collect()}

    def replay(xs, p=4, a=0.5, b=0.25, g=0.5):
        m1 = 0.0
        for v in xs[:p]:
            m1 += v
        m1 /= p
        m2 = 0.0
        for v in xs[p : 2 * p]:
            m2 += v
        m2 /= p
        l, tr = m1, (m2 - m1) / p
        s = [xs[j] - m1 for j in range(p)]
        for t in range(p, len(xs)):
            ph = t % p
            so = s[ph]
            ln = a * (xs[t] - so) + (1 - a) * (l + tr)
            tr = b * (ln - l) + (1 - b) * tr
            s[ph] = g * (xs[t] - ln) + (1 - g) * so
            l = ln
        return l, tr, s

    for i, xs in rows:
        r = got[i]
        if len(xs) < 8:
            assert r["level"] is None and r["fc_1"] is None
            continue
        l, tr, s = replay(xs)
        n = len(xs)
        assert (r["level"], r["trend"]) == (l, tr)
        assert r["fc_1"] == l + 1.0 * tr + s[n % 4]
        assert r["fc_4"] == l + 4.0 * tr + s[(n + 3) % 4]
        # the planted period-4 pattern is recovered: fc_1 ~ trend line + 4
        assert r["fc_1"] == pytest.approx(2.0 + 0.7 * 16 + 4.0, abs=0.8)
    with pytest.raises(ValueError, match="gamma"):
        holt_winters_forecast(df, gamma=0.0)
    with pytest.raises(ValueError, match="period"):
        holt_winters_forecast(df, period=1)


def test_ar_forecast_exact_recovery_and_guards(spark):
    """r6 (operators/forecast.py::ar_forecast): a noiseless AR(2) process
    is recovered to machine precision by the normal-equation solve; the
    1-step forecast equals the true next value; constant (singular) and
    short series yield NULL fits; statsmodels-free numpy lstsq replay
    agrees on noisy data."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ar_forecast

    rows = []
    for sid in range(3):
        y = [float(sid), float(sid + 1)]
        for _ in range(14):
            y.append(1.0 + 0.5 * y[-1] - 0.3 * y[-2])
        rows.append((sid, y))
    rows.append((99, [5.0] * 16))       # constant -> singular
    rows.append((98, [1.0, 2.0, 3.0]))  # too short
    rng = np.random.default_rng(7)
    noisy = list(np.cumsum(rng.normal(size=20)) + 3.0)
    rows.append((50, [float(v) for v in noisy]))
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    out = {r["series_id"]: r for r in ar_forecast(df, horizons=(1, 2)).collect()}

    for sid in (0, 1, 2):
        r = out[sid]
        assert abs(r["c"] - 1.0) < 1e-6
        assert abs(r["a1"] - 0.5) < 1e-6
        assert abs(r["a2"] + 0.3) < 1e-6
        y = rows[sid][1]
        assert abs(r["fc_1"] - (1.0 + 0.5 * y[-1] - 0.3 * y[-2])) < 1e-9
        # 2-step rolls the 1-step forecast forward
        assert abs(r["fc_2"] - (r["c"] + r["a1"] * r["fc_1"] + r["a2"] * y[-1])) < 1e-9
    assert out[99]["c"] is None and out[99]["fc_1"] is None
    assert out[98]["c"] is None

    # independent least-squares replay on the noisy series
    y = np.array(noisy)
    X = np.stack([np.ones(len(y) - 2), y[1:-1], y[:-2]], axis=1)
    coef, *_ = np.linalg.lstsq(X, y[2:], rcond=None)
    r = out[50]
    assert abs(r["c"] - coef[0]) < 1e-6
    assert abs(r["a1"] - coef[1]) < 1e-6
    assert abs(r["a2"] - coef[2]) < 1e-6


def test_ar_forecast_degenerate_lengths_and_horizon_guard(spark):
    """Review r6 regressions: series with 0/1/2 points must yield NULL-fit
    rows (not index errors — the fold and tail lookups are now gated), and
    non-positive horizons must raise instead of silently aliasing fcs[-1]."""
    import pytest

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ar_forecast

    df = spark.createDataFrame(
        [(0, []), (1, [1.0]), (2, [1.0, 2.0]), (3, [1.0, 2.0, 3.0, 4.0])],
        "series_id long, features array<double>",
    )
    out = {r["series_id"]: r for r in ar_forecast(df, horizons=(1, 3)).collect()}
    assert len(out) == 4
    for sid in (0, 1, 2, 3):  # all below the n >= 5 fit gate
        assert out[sid]["c"] is None and out[sid]["fc_1"] is None and out[sid]["fc_3"] is None
    with pytest.raises(ValueError, match="horizons"):
        ar_forecast(df, horizons=(0, 2))
    with pytest.raises(ValueError, match="horizons"):
        ar_forecast(df, horizons=())


def test_mann_kendall_and_theil_sen_exact(spark):
    """r6 trend operators: integer S / exact tau for Mann-Kendall; the
    Theil-Sen slope and intercept match an independent python replay
    (explicit sorted-middle medians); degenerate n < 2 yields NULLs."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        mann_kendall,
        theil_sen,
    )

    rng = np.random.default_rng(9)
    noisy = [float(v) for v in np.cumsum(rng.normal(size=15)) + 0.4 * np.arange(15)]
    rows = [
        (0, [1.0, 2.0, 3.0, 4.0]),
        (1, [4.0, 3.0, 2.0, 1.0]),
        (2, [1.0, 1.0, 1.0]),
        (3, [5.0]),
        (4, noisy),
    ]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    mk = {r["series_id"]: (r["s_stat"], r["n_pairs"], r["tau"]) for r in mann_kendall(df).collect()}
    ts = {r["series_id"]: (r["slope"], r["intercept"]) for r in theil_sen(df).collect()}
    assert mk[0] == (6, 6, 1.0) and mk[1] == (-6, 6, -1.0) and mk[2] == (0, 3, 0.0)
    assert mk[3] == (0, 0, None)
    assert ts[0] == (1.0, 0.0) and ts[1][0] == -1.0 and ts[2][0] == 0.0
    assert ts[3] == (None, None)

    def med(v):
        v = sorted(v)
        m = len(v)
        return v[m // 2] if m % 2 else (v[m // 2 - 1] + v[m // 2]) / 2

    y = np.array(noisy)
    n = len(y)
    slopes = [(y[j] - y[i]) / (j - i) for i in range(n) for j in range(i + 1, n)]
    S = int(sum(np.sign(y[j] - y[i]) for i in range(n) for j in range(i + 1, n)))
    assert mk[4][0] == S
    assert abs(ts[4][0] - med(slopes)) < 1e-12
    sl = ts[4][0]
    # intercept: median residual level with 1-based positions (t = 1..n)
    levels = [y[t - 1] - sl * t for t in range(1, n + 1)]
    assert abs(ts[4][1] - med(levels)) < 1e-12


def test_acf_features_period_recovery_and_guards(spark):
    """acf_features (r6): planted period-4 signal -> dom_lag 4; python
    replay is bit-exact; constant and too-short series NULL out."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import acf_features

    period4 = [float(x) for x in ([1.0, 5.0, 2.0, -3.0] * 4)]
    rng = np.random.default_rng(4)
    noisy = [float(x) for x in np.sin(np.arange(16) * (2 * np.pi / 4)) * 3 + rng.normal(0, 0.1, 16)]
    rows = [
        (1, period4),
        (2, noisy),
        (3, [7.0] * 16),       # constant: zero variance
        (4, [1.0]),            # n < 2
        (5, [float(x) for x in rng.uniform(0, 10, 6)]),  # n-1 < max_lag
    ]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in acf_features(df, max_lag=8).collect()}

    assert got[1]["dom_lag"] == 4 and got[2]["dom_lag"] == 4
    assert got[3]["dom_lag"] is None and all(
        got[3][f"acf{i}"] is None for i in range(1, 9)
    )
    assert got[4]["dom_lag"] is None
    # n=6: lags 1..5 defined, 6..8 NULL
    assert got[5]["acf5"] is not None and got[5]["acf6"] is None

    def replay(x, lag):
        n = len(x)
        m = 0.0
        for v in x:
            m += v
        m /= n
        c0 = 0.0
        for v in x:
            c0 += (v - m) * (v - m)
        c = 0.0
        for t in range(n - lag):
            c += (x[t] - m) * (x[t + lag] - m)
        return c / c0
    for sid, x in ((1, period4), (2, noisy)):
        for lag in range(1, 9):
            assert got[sid][f"acf{lag}"] == replay(x, lag), (sid, lag)


def test_periodogram_dominant_frequency_and_replay(spark):
    """periodogram (r6): a pure period-4 sinusoid over 16 points has its
    power at k = 16/4 = 4; numpy replay of the literal folds is bit-exact;
    ragged rows are filtered; twiddle validation raises."""
    import math

    import numpy as np
    import pytest as _pt

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        periodogram,
        periodogram_twiddles,
    )

    sig4 = [math.sin(2 * math.pi * t / 4) * 3.0 + 1.0 for t in range(16)]
    rng = np.random.default_rng(8)
    rand = [float(x) for x in rng.uniform(0, 10, 16)]
    rows = [(1, sig4), (2, rand), (3, [1.0] * 7)]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in periodogram(df, length=16).collect()}
    assert 3 not in got  # ragged row filtered
    assert got[1]["dom_freq"] == 4 and got[1]["dom_period"] == 4.0

    tw = periodogram_twiddles(16)
    for sid, x in ((1, sig4), (2, rand)):
        for k, cs, sn in tw:
            re = 0.0
            im = 0.0
            for t in range(16):
                re += x[t] * cs[t]
                im += x[t] * sn[t]
            assert got[sid][f"p{k}"] == re * re + im * im, (sid, k)

    with _pt.raises(ValueError):
        periodogram_twiddles(16, n_freqs=9)


def test_viterbi_regimes_contextual_labels(spark):
    """viterbi_regimes (r6): recovers a low-high-low block structure, keeps
    a lone spike contextual under a high switch cost, flips it under a low
    one, and matches an independent python Viterbi replay exactly."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import viterbi_regimes

    blocks = [1.0, 1.2, 0.8, 1.1, 9.0, 9.2, 8.8, 9.1, 1.0, 0.9, 1.1, 1.0]
    spike = [5.0, 5.1, 4.9, 20.0, 5.0, 5.2, 4.8, 5.1]
    df = spark.createDataFrame(
        [(1, blocks), (2, spike)], "series_id long, features array<double>"
    )

    def decode(sc_):
        out = viterbi_regimes(df, switch_cost=sc_).collect()
        paths = {}
        for r in sorted(out, key=lambda r: (r["series_id"], r["t"])):
            paths.setdefault(r["series_id"], []).append(r["regime"])
        return paths

    lo = decode(5.0)
    assert lo[1] == [0, 0, 0, 0, 1, 1, 1, 1, 0, 0, 0, 0]
    assert lo[2][3] == 1  # cheap switches: the spike flips
    hi = decode(80.0)
    assert hi[2] == [0] * 8  # expensive switches: the spike stays low

    def replay(x, sc_):
        s = int(round(sc_ * 1_000_000))
        mn, mx = min(x), max(x)
        mlo, mhi = mn + (mx - mn) / 4.0, mx - (mx - mn) / 4.0
        dlo = dhi = 0
        plo, phi = [], []
        for v in x:
            elo = int(round((v - mlo) * (v - mlo) * 1e6))
            ehi = int(round((v - mhi) * (v - mhi) * 1e6))
            nlo = elo + min(dlo, dhi + s)
            nhi = ehi + min(dhi, dlo + s)
            nplo = (plo if dlo <= dhi + s else phi) + [0]
            nphi = (phi if dhi <= dlo + s else plo) + [1]
            dlo, dhi, plo, phi = nlo, nhi, nplo, nphi
        return plo if dlo <= dhi else phi

    for sc_, got in ((5.0, lo), (80.0, hi)):
        assert got[1] == replay(blocks, sc_)
        assert got[2] == replay(spike, sc_)


def test_ljung_box_white_noise_vs_structure(spark):
    """ljung_box (r6): a strongly autocorrelated series scores far above
    white noise; python replay is bit-exact; guards NULL."""
    import math

    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ljung_box

    rng = np.random.default_rng(12)
    noise = [float(x) for x in rng.normal(0, 1, 16)]
    trend = [math.sin(2 * math.pi * t / 8) * 5 for t in range(16)]
    rows = [(1, noise), (2, trend), (3, [4.0] * 16), (4, [1.0] * 8)]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r["q_stat"] for r in ljung_box(df, h=8).collect()}
    assert got[2] > got[1] * 3
    assert got[3] is None  # zero variance
    assert got[4] is None  # h >= n

    def replay(x, h=8):
        n = len(x)
        m = 0.0
        for v in x:
            m += v
        m /= n
        c0 = 0.0
        for v in x:
            c0 += (v - m) * (v - m)
        s = 0.0
        for k in range(1, h + 1):
            c = 0.0
            for t in range(n - k):
                c += (x[t] - m) * (x[t + k] - m)
            s += (c / c0) * (c / c0) / (n - k)
        return (n * float(n + 2)) * s
    assert got[1] == replay(noise) and got[2] == replay(trend)


def test_forecast_backtest_linear_beats_naive(spark):
    """forecast_backtest (r6): on a clean linear trend Holt extrapolates
    (mase << 1, mae ~ 0) while the naive baseline trails by the slope;
    a constant head NULLs mase; short series drop; python replay exact."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import forecast_backtest

    lin = [float(2 * t + 1) for t in range(16)]
    const = [5.0] * 10 + [5.0, 5.0, 5.0, 5.0]
    rows = [(1, lin), (2, const), (3, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in forecast_backtest(df, holdout=4).collect()}
    assert 3 not in got  # shorter than holdout + 2
    r1 = got[1]
    assert r1["mae"] < 1e-9 and r1["rmse"] < 1e-9
    assert abs(r1["mae_naive"] - (2 + 4 + 6 + 8) / 4) < 1e-9
    assert r1["mase"] < 0.01
    r2 = got[2]
    assert r2["mae"] == 0.0 and r2["mase"] is None  # constant: naive has 0 in-sample MAE

    # replay r1 exactly
    head, act = lin[:12], lin[12:]
    l, b = head[1], head[1] - head[0]
    for x in head[2:]:
        nl = 0.5 * x + 0.5 * (l + b)
        b = 0.25 * (nl - l) + 0.75 * b
        l = nl
    fc = [l + h * b for h in (1.0, 2.0, 3.0, 4.0)]
    mae = 0.0
    for p, a in zip(fc, act):
        mae += abs(p - a)
    mae /= 4.0
    assert got[1]["mae"] == mae


def test_pacf_durbin_levinson_replay_and_cutoff(spark):
    """pacf_features (r6): bit-exact vs an independent python
    Durbin-Levinson; pacf1 == acf1; on an AR(1) path the lag-1 partial
    dominates every later one; guards NULL."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import pacf_features

    rng = np.random.default_rng(33)
    x = [0.0]
    for _ in range(255):
        x.append(0.8 * x[-1] + float(rng.normal(0, 1)))
    ar1 = [float(v) for v in x]
    rnd = [float(v) for v in rng.uniform(0, 10, 16)]
    rows = [(1, ar1), (2, rnd), (3, [4.0] * 16), (4, [1.0] * 8)]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in pacf_features(df, max_lag=8).collect()}
    assert all(got[3][f"pacf{k}"] is None for k in range(1, 9))  # constant
    assert all(got[4][f"pacf{k}"] is None for k in range(1, 9))  # n <= max_lag

    def replay(xs, K=8):
        n = len(xs)
        m = 0.0
        for v in xs:
            m += v
        m /= n
        c0 = 0.0
        for v in xs:
            c0 += (v - m) * (v - m)
        a = []
        for lag in range(1, K + 1):
            c = 0.0
            for t in range(n - lag):
                c += (xs[t] - m) * (xs[t + lag] - m)
            a.append(c / c0)
        a = [None] + a  # 1-based
        phi = [a[1]]
        pac = [a[1]]
        for k in range(2, K + 1):
            s1 = 0.0
            s2 = 0.0
            for j in range(1, k):
                s1 += phi[j - 1] * a[k - j]
                s2 += phi[j - 1] * a[j]
            pk = (a[k] - s1) / (1.0 - s2)
            phi = [phi[j - 1] - pk * phi[k - j - 1] for j in range(1, k)] + [pk]
            pac.append(pk)
        return pac

    for sid, xs in ((1, ar1), (2, rnd)):
        exp = replay(xs)
        for k in range(1, 9):
            assert got[sid][f"pacf{k}"] == exp[k - 1], (sid, k)
    # AR(1): partial autocorrelation cuts off after lag 1 (256-pt path:
    # later partials are sampling noise ~1/sqrt(n))
    assert abs(got[1]["pacf1"]) > 3 * max(abs(got[1][f"pacf{k}"]) for k in range(2, 9))


def test_haar_features_scale_separation_and_replay(spark):
    """haar_features (r6): a fast alternation puts its energy at the
    finest scale, a slow two-block step at the coarsest; approx is the
    global mean for dyadic input; python pyramid replay is bit-exact;
    short rows filter."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import haar_features

    fast = [float((-1) ** t) * 3.0 for t in range(16)]          # +-3 alternation
    slow = [0.0] * 8 + [8.0] * 8                                # one coarse step
    rows = [(1, fast), (2, slow), (3, [1.0] * 7)]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in haar_features(df, levels=4).collect()}
    assert 3 not in got
    assert got[1]["e1"] > 0 and got[1]["e2"] == got[1]["e3"] == got[1]["e4"] == 0.0
    assert got[2]["e4"] > 0 and got[2]["e1"] == got[2]["e2"] == got[2]["e3"] == 0.0
    assert got[2]["approx"] == 4.0

    def replay(x):
        avg = list(x)
        en = []
        for _ in range(4):
            na, e = [], 0.0
            for i in range(len(avg) // 2):
                na.append((avg[2 * i] + avg[2 * i + 1]) / 2.0)
                d = (avg[2 * i] - avg[2 * i + 1]) / 2.0
                e += d * d
            avg, _ = na, en.append(e)
        return avg[0], en
    for sid, x in ((1, fast), (2, slow)):
        ap, en = replay(x)
        assert got[sid]["approx"] == ap
        assert [got[sid][f"e{l}"] for l in range(1, 5)] == en


def test_decomposition_strength_discriminates(spark):
    """decomposition_strength (r6): a clean linear trend maxes
    trend_strength; a pure period-4 signal maxes seasonal_strength;
    noise sits low on both; strengths live in [0, 1]."""
    import math

    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import decomposition_strength

    rng = np.random.default_rng(6)
    lin = [float(3 * t) for t in range(16)]
    seas = [math.sin(2 * math.pi * t / 4) * 5 for t in range(16)]
    noise = [float(v) for v in rng.normal(0, 1, 16)]
    df = spark.createDataFrame(
        [(1, lin), (2, seas), (3, noise)],
        "series_id long, features array<double>",
    )
    got = {r["series_id"]: r for r in decomposition_strength(df, period=4).collect()}
    for r in got.values():
        for c in ("trend_strength", "seasonal_strength"):
            assert r[c] is None or 0.0 <= r[c] <= 1.0
    assert got[1]["trend_strength"] > 0.99
    assert got[2]["seasonal_strength"] > 0.99
    assert got[2]["trend_strength"] < 0.6
    assert got[3]["trend_strength"] < 0.9 and got[3]["seasonal_strength"] < 0.9


def test_permutation_patterns_dynamics_signatures(spark):
    """permutation_patterns (r6): a monotone ramp concentrates on ONE
    pattern (gini 0), an alternation on two (gini 0.5), noise spreads;
    impossible codes (2, 5) stay zero; n < 3 NULLs gini."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import permutation_patterns

    rng = np.random.default_rng(17)
    rows = [
        (1, [float(t) for t in range(16)]),            # ramp
        (2, [float((-1) ** t) for t in range(16)]),    # alternation
        (3, [float(v) for v in rng.uniform(0, 1, 64)]),
        (4, [1.0, 2.0]),
    ]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in permutation_patterns(df).collect()}
    for r in got.values():
        assert r["c2"] == 0 and r["c5"] == 0  # transitivity-impossible
    assert got[1]["gini"] == 0.0 and got[1]["c7"] == 14
    assert abs(got[2]["gini"] - 0.5) < 1e-12
    assert got[3]["gini"] > 0.6
    assert got[4]["gini"] is None and got[4]["n_windows"] == 0


def test_complexity_features_semantics(spark):
    """complexity_features (r6): a straight line is time-reversal
    SYMMETRIC (trev 0) and less complex (lower cid) than an alternation
    of the same span; python replay bit-exact; short-series guards."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import complexity_features

    line = [float(t) for t in range(16)]
    rline = list(reversed(line))
    alt = [float(7.5 + 7.5 * (-1) ** t) for t in range(16)]
    rows = [(1, line), (2, alt), (3, [2.0]), (4, [1.0, 5.0]), (5, rline)]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in complexity_features(df, lag=1).collect()}
    # unit increments: mean cube = 1; time reversal flips the sign
    assert got[1]["trev"] == 1.0 and got[5]["trev"] == -1.0
    assert got[2]["cid"] > got[1]["cid"]    # alternation is busier
    assert got[3]["c3"] is None and got[3]["trev"] is None and got[3]["cid"] == 0.0
    assert got[4]["c3"] is None and got[4]["trev"] is not None

    def replay(x):
        ae = 0.0
        for v in x:
            ae += v * v
        s = 0.0
        for t in range(1, len(x)):
            s += (x[t] - x[t - 1]) * (x[t] - x[t - 1])
        import math
        cid = math.sqrt(s)
        c3 = 0.0
        for t in range(len(x) - 2):
            c3 += x[t] * x[t + 1] * x[t + 2]
        c3 /= len(x) - 2
        tr = 0.0
        for t in range(len(x) - 1):
            d = x[t + 1] - x[t]
            tr += (d * d) * d
        tr /= len(x) - 1
        return ae, cid, c3, tr
    for sid, x in ((1, line), (2, alt)):
        ae, cid, c3, tr = replay(x)
        r = got[sid]
        assert (r["abs_energy"], r["cid"], r["c3"], r["trev"]) == (ae, cid, c3, tr)


def test_sampen_counts_regularity_ordering(spark):
    """sampen_counts (r6): a constant series keeps every 2-match when
    extended to 3 points (ratio 1); noise at the tolerance scale loses
    most (ratio well below); python replay exact; short-series guards."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import sampen_counts

    rng = np.random.default_rng(14)
    const = [5.0] * 16
    noise = [float(v) for v in rng.uniform(0, 100, 16)]
    rows = [(1, const), (2, noise), (3, [1.0, 2.0, 3.0])]
    df = spark.createDataFrame(rows, "series_id long, features array<double>")
    got = {r["series_id"]: r for r in sampen_counts(df, r=10.0).collect()}
    # the maximum possible ratio at n=16: every template matches, so
    # A/B = C(14,2)/C(15,2) = 91/105 (start ranges differ by one)
    assert got[1]["match_ratio"] == 91 / 105
    assert got[2]["match_ratio"] is None or got[2]["match_ratio"] < 91 / 105
    assert got[3]["a_count"] == 0  # n < 4: no 3-templates

    def replay(x, r=10.0):
        n = len(x)
        def cnt(last, m):
            c = 0
            for i in range(last - 1):
                for j in range(i + 1, last):
                    if all(abs(x[i + t] - x[j + t]) <= r for t in range(m)):
                        c += 1
            return c
        return cnt(n - 1, 2) if n >= 3 else 0, cnt(n - 2, 3) if n >= 4 else 0
    for sid, x in ((1, const), (2, noise)):
        b, a = replay(x)
        assert (got[sid]["b_count"], got[sid]["a_count"]) == (b, a)
