"""Learned quality filter (operators/classify.py): the distributed
averaged perceptron must be bit-identical to a pure-numpy replay of the
same integer recurrence (the oracle contract), reach accuracy 1.0 on a
separable fixture (the classic perceptron guarantee), and the serve-side
scorer must reproduce exact int64 dots declaratively."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import (
    QUALITY_FEATURE_DIM,
    doc_quality_features,
    score_with_weights,
    train_quality_perceptron,
)


def _numpy_perceptron(X, y, epochs, averaged=True):
    X = np.asarray(X, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    w = np.zeros(X.shape[1], dtype=np.int64)
    acc = np.zeros_like(w)
    for _ in range(epochs):
        mis = (y * (X @ w)) <= 0
        w = w + (y[mis, None] * X[mis]).sum(axis=0)
        acc = acc + w
    return acc if averaged else w


def _labeled_df(spark, X, y):
    rows = [(int(i), [int(v) for v in x], int(lbl)) for i, (x, lbl) in enumerate(zip(X, y))]
    return spark.createDataFrame(rows, "doc_id long, x array<bigint>, y int")


@pytest.fixture(scope="module")
def rand_xy():
    rng = np.random.default_rng(7)
    X = rng.integers(-9, 10, size=(200, 4))
    X[:, 0] = 1
    y = np.where(rng.random(200) < 0.5, 1, -1)
    return X, y


@pytest.mark.parametrize("averaged", [True, False])
@pytest.mark.parametrize("epochs", [1, 3, 5])
def test_matches_numpy_replay(spark, rand_xy, epochs, averaged):
    X, y = rand_xy
    got = (
        train_quality_perceptron(
            _labeled_df(spark, X, y), epochs=epochs, averaged=averaged
        )
        .orderBy("dim")
        .collect()
    )
    want = _numpy_perceptron(X, y, epochs, averaged)
    assert [r["weight"] for r in got] == [int(v) for v in want]


def test_separable_reaches_perfect_accuracy(spark):
    # y = sign(2*x1 - x2 + 3) restricted to margin >= 5: a wide-margin
    # separable set, which the BATCH perceptron separates in a handful of
    # epochs (the online convergence theorem doesn't transfer to batch
    # updates — a margin-1 variant of this fixture needs ~1000 epochs)
    rng = np.random.default_rng(3)
    X = np.column_stack(
        [np.ones(300, dtype=np.int64), rng.integers(-20, 21, 300), rng.integers(-20, 21, 300)]
    )
    raw = 2 * X[:, 1] - X[:, 2] + 3
    keep = np.abs(raw) >= 5
    X, raw = X[keep], raw[keep]
    y = np.where(raw > 0, 1, -1)
    df = _labeled_df(spark, X, y)
    w = train_quality_perceptron(df, epochs=12, averaged=False)
    scored = score_with_weights(df, w).join(
        df.select("doc_id", "y"), "doc_id"
    )
    acc = scored.select(
        F.avg((F.col("kept") == (F.col("y") > 0)).cast("double")).alias("a")
    ).first()["a"]
    assert acc == 1.0


def test_converged_epochs_are_stable(spark):
    # once every row is classified with positive margin, further epochs
    # add a zero gradient: last-w is constant, averaged grows linearly
    X = np.array([[1, 5], [1, -5]], dtype=np.int64)
    y = np.array([1, -1])
    df = _labeled_df(spark, X, y)
    w3 = train_quality_perceptron(df, epochs=3, averaged=False).orderBy("dim").collect()
    w9 = train_quality_perceptron(df, epochs=9, averaged=False).orderBy("dim").collect()
    assert [r["weight"] for r in w3] == [r["weight"] for r in w9]
    assert [r["weight"] for r in w3] == list(_numpy_perceptron(X, y, 3, False))


def test_score_with_weights_exact_dot(spark, rand_xy):
    X, y = rand_xy
    df = _labeled_df(spark, X, y)
    w = train_quality_perceptron(df, epochs=2)
    wv = np.array(
        [r["weight"] for r in w.orderBy("dim").collect()], dtype=np.int64
    )
    got = {
        r["doc_id"]: (r["score"], r["kept"])
        for r in score_with_weights(df, w).collect()
    }
    for i, x in enumerate(X):
        s = int(np.asarray(x, dtype=np.int64) @ wv)
        assert got[i] == (s, s > 0)


def test_doc_quality_features_shape(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown foxes jumped over a lazy dog the end"),
         (2, ""), (3, "word")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["x"] for r in doc_quality_features(docs).collect()}
    assert all(len(v) == QUALITY_FEATURE_DIM for v in rows.values())
    # doc 1: 11 tokens; stopwords the/a/the = 3; 10 distinct; 4 tokens of
    # length >= 5 (quick brown foxes jumped)
    assert rows[1] == [1, 11 - 53, 3 - 8, 10 - 30, 4 - 20]
    assert rows[2] == [1, -53, -8, -30, -20]


def test_validation_errors(spark):
    df = _labeled_df(spark, np.array([[1, 2]]), np.array([1]))
    with pytest.raises(ValueError, match="epochs"):
        train_quality_perceptron(df, epochs=0)
    empty = df.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        train_quality_perceptron(empty)
    ragged = spark.createDataFrame(
        [(1, [1, 2], 1), (2, [1], -1)], "doc_id long, x array<bigint>, y int"
    )
    with pytest.raises(Exception, match="ragged feature arrays"):
        train_quality_perceptron(ragged)
    bad = spark.createDataFrame(
        [(1, [1, 2], 0)], "doc_id long, x array<bigint>, y int"
    )
    with pytest.raises(Exception, match="label must be -1 or \\+1"):
        train_quality_perceptron(bad)


def test_epoch_sweep_matches_numpy(spark, rand_xy):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import (
        perceptron_epoch_sweep,
    )

    X, y = rand_xy
    X = np.asarray(X, dtype=np.int64)
    got = {
        r.epoch: (r.n_correct, r.n_total, r.accuracy)
        for r in perceptron_epoch_sweep(
            _labeled_df(spark, X, y), epochs=4
        ).collect()
    }
    w = np.zeros(X.shape[1], dtype=np.int64)
    acc = np.zeros_like(w)
    for t in range(1, 5):
        mis = (y * (X @ w)) <= 0
        w = w + (y[mis, None] * X[mis]).sum(axis=0)
        acc = acc + w
        s = X @ acc
        n_correct = int((((y > 0) & (s > 0)) | ((y < 0) & (s <= 0))).sum())
        assert got[t] == (n_correct, len(y), n_correct / len(y))


def test_epoch_sweep_validation(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import (
        perceptron_epoch_sweep,
    )

    df = _labeled_df(spark, np.array([[1, 2]]), np.array([1]))
    with pytest.raises(ValueError, match="epochs"):
        perceptron_epoch_sweep(df, epochs=0)
    with pytest.raises(ValueError, match="empty"):
        perceptron_epoch_sweep(df.filter(F.lit(False)))


def _numpy_best_stump(X, y):
    # brute force over every (dim, observed value, polarity)
    best = None
    n = len(y)
    for dim in range(X.shape[1]):
        for v in np.unique(X[:, dim]):
            le = X[:, dim] <= v
            for pol in (1, -1):
                pred = np.where(le, pol, -pol)
                err = int((pred != y).sum())
                key = (err, dim, int(v), -pol)  # pol DESC on ties
                if best is None or key < best[0]:
                    best = (key, (dim, int(v), pol, err, n))
    return best[1]


def test_stump_matches_bruteforce(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import train_stump

    rng = np.random.default_rng(13)
    for trial in range(4):
        n = int(rng.integers(5, 60))
        d = int(rng.integers(1, 5))
        X = rng.integers(-8, 9, size=(n, d))
        y = np.where(rng.random(n) < 0.5, 1, -1)
        df = _labeled_df(spark, X, y)
        r = train_stump(df).first()
        assert (r.dim, r.threshold, r.polarity, r.n_errors, r.n_total) == _numpy_best_stump(X, y)


def test_stump_on_separable_threshold(spark):
    # y determined by x[1] <= 3: the stump must find exactly that rule
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import (
        score_stump,
        train_stump,
    )

    rng = np.random.default_rng(17)
    X = np.column_stack([rng.integers(0, 100, 80), rng.integers(0, 10, 80)])
    y = np.where(X[:, 1] <= 3, 1, -1)
    df = _labeled_df(spark, X, y)
    r = train_stump(df).first()
    assert (r.dim, r.threshold, r.polarity, r.n_errors) == (1, 3, 1, 0)
    scored = {s.doc_id: s.kept for s in score_stump(df, train_stump(df)).collect()}
    for i in range(len(y)):
        assert scored[i] == (y[i] > 0)


def test_stump_label_guard(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import train_stump

    bad = spark.createDataFrame(
        [(1, [1, 2], 7)], "doc_id long, x array<bigint>, y int"
    )
    with pytest.raises(Exception, match="label must be -1 or \\+1"):
        train_stump(bad).collect()


def test_null_label_raises_not_silently_dropped(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.classify import (
        perceptron_epoch_sweep,
    )

    withnull = spark.createDataFrame(
        [(1, [1, 2], 1), (2, [3, 4], None)],
        "doc_id long, x array<bigint>, y int",
    )
    with pytest.raises(Exception, match="label must be -1 or \\+1"):
        train_quality_perceptron(withnull)
    with pytest.raises(Exception, match="label must be -1 or \\+1"):
        perceptron_epoch_sweep(withnull)
    bad = spark.createDataFrame(
        [(1, [1, 2], 2)], "doc_id long, x array<bigint>, y int"
    )
    with pytest.raises(Exception, match="label must be -1 or \\+1"):
        perceptron_epoch_sweep(bad)


def test_conformal_knn_separable_and_exact_rationals(spark, har_dfs):
    """conformal_knn (r6): on the separable HAR fixture the true label's
    p-value is the per-test maximum for almost every test point; every
    p-value is an exact rational k/(n_cal+1); candidate rows cover the
    proper split's label set."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import conformal_knn

    train, test = har_dfs
    out = conformal_knn(test, train).collect()
    truth = {r["series_id"]: r["label"] for r in test.collect()}
    labels = {r["label"] for r in out}
    assert len(labels) == 4

    n_cal = train.filter("pmod(series_id, 3) = 1").count()
    # calibration rows whose label is missing from proper would drop;
    # HAR has all 4 classes in both splits, so the count is exact
    by_test = {}
    for r in out:
        assert 0.0 < r["p_value"] <= 1.0
        k = r["p_value"] * (n_cal + 1)
        assert abs(k - round(k)) < 1e-9  # exact rational
        by_test.setdefault(r["test_id"], []).append((r["p_value"], r["label"]))
    hits = sum(
        1 for tid, ps in by_test.items() if max(ps)[1] == truth[tid]
    )
    assert hits / len(by_test) >= 0.9

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
