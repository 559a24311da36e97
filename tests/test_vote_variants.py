"""weighted_vote / knn_regress_predict (operators/vote.py): hand-computed
goldens including tie-breaks and the rank-ordered float fold discipline."""

from __future__ import annotations

import pytest

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    knn_regress_predict,
    weighted_vote,
)

SCHEMA = "test_id long, train_id long, train_label string, d double, rank int"


def test_weighted_vote_nearest_outvotes_majority(spark):
    # label 'a' has ONE tight neighbor (d=0.1); 'b' has two distant ones.
    # unweighted majority would pick 'b'; weights 1/(1+d) pick 'a'.
    rows = [
        (1, 10, "a", 0.1, 1),
        (1, 11, "b", 4.0, 2),
        (1, 12, "b", 5.0, 3),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = weighted_vote(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r["predicted_label"] == "a"
    assert r["weight"] == pytest.approx(1.0 / 1.1, abs=0)


def test_weighted_vote_fold_order_and_ties(spark):
    # exact fold: weights accumulate in rank order within each label
    rows = [
        (2, 20, "x", 1.0, 1),
        (2, 21, "y", 1.0, 2),
        (2, 22, "x", 3.0, 3),
        (2, 23, "y", 3.0, 4),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r["predicted_label"]: r for r in weighted_vote(df).collect()}
    # both labels have identical weight sums -> best_rank tie-break: x (rank 1)
    assert list(out) == ["x"]
    expected = (0.0 + 1.0 / 2.0) + 1.0 / 4.0
    assert out["x"]["weight"] == expected


def test_weighted_vote_label_tiebreak(spark):
    # equal weight AND equal best_rank impossible with row_number ranks, but
    # equal weight with different best_rank: smaller best_rank wins even if
    # the label sorts later
    rows = [
        (3, 30, "z", 2.0, 1),
        (3, 31, "a", 2.0, 2),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = weighted_vote(df).collect()
    assert out[0]["predicted_label"] == "z"


def test_knn_regress_predict_golden(spark):
    rows = [
        (1, 10, 2.0, 1),
        (1, 11, 4.0, 2),
        (1, 12, 9.0, 3),
        (2, 10, 5.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "test_id long, train_id long, train_target double, rank int"
    )
    got = {r["test_id"]: r["prediction"] for r in knn_regress_predict(df).collect()}
    assert got[1] == ((2.0 + 4.0) + 9.0) / 3.0
    assert got[2] == 5.0


def test_knn_cross_validate_har(spark, har_dfs):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_cross_validate

    train, test = har_dfs
    series = train.unionByName(test)
    out = knn_cross_validate(series, folds=4, k=3).collect()
    n_total = series.count()
    assert sum(r["n_test"] for r in out) == n_total
    assert {r["fold"] for r in out} == {0, 1, 2, 3}
    for r in out:
        # separable archetypes: every fold classifies well
        assert r["accuracy"] >= 0.8, (r["fold"], r["accuracy"])
        assert r["n_correct"] <= r["n_test"]
    with pytest.raises(ValueError):
        knn_cross_validate(series, folds=1)

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
