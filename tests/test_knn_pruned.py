"""Two-phase PAA-pruned KNN: exactness for euclidean with generous candidate
budget, recall for DTW, accuracy preservation."""

import pytest
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    knn_join,
    knn_join_pruned,
    majority_vote,
    accuracy,
)

LENGTH = 24  # har_dfs series length (tests/conftest.py)


def test_pruned_euclidean_matches_exact(spark, har_dfs):
    train_df, test_df = har_dfs
    exact = knn_join(test_df, train_df, metric="euclidean", k=5)
    pruned = knn_join_pruned(
        test_df, train_df, metric="euclidean", k=5, length=LENGTH,
        paa_segments=4, candidates_per_test=40,
    )
    ek = {(r.test_id, r.train_id, r.rank) for r in exact.collect()}
    pk = {(r.test_id, r.train_id, r.rank) for r in pruned.collect()}
    assert pk == ek  # generous candidate budget -> exact on this data


def test_pruned_fastdtw_recall_and_accuracy(spark, har_dfs):
    train_df, test_df = har_dfs
    exact = knn_join(test_df, train_df, metric="fastdtw", k=3)
    pruned = knn_join_pruned(
        test_df, train_df, metric="fastdtw", k=3, length=LENGTH,
        paa_segments=4, candidates_per_test=30,
    )
    ek = {(r.test_id, r.train_id) for r in exact.collect()}
    pk = {(r.test_id, r.train_id) for r in pruned.collect()}
    recall = len(ek & pk) / len(ek)
    assert recall >= 0.9, f"pruned DTW recall {recall}"

    pred = majority_vote(pruned, key="test_id", label="train_label", rank="rank")
    truth = test_df.withColumnRenamed("series_id", "test_id")
    row = accuracy(pred, truth, key="test_id").collect()[0]
    assert row.accuracy >= 0.9


def test_pruned_shrinks_expensive_pairs(spark, har_dfs):
    """The whole point: the exact-metric phase sees only C*N_test pairs."""
    train_df, test_df = har_dfs
    n_train, n_test = train_df.count(), test_df.count()
    C = 10
    pruned = knn_join_pruned(
        test_df, train_df, metric="euclidean", k=3, length=LENGTH,
        paa_segments=4, candidates_per_test=C,
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # phase-1 rank filter present (candidate cap), phase-2 rank cap present
    assert "_crank" in plan
    assert pruned.count() <= n_test * 3

def test_pruned_chunked_phase1_matches_broadcast(spark, har_dfs):
    """strategy='chunked' runs phase-1 candidate generation through the
    block scorer (the 100 TB sketch-side path); on tie-free data the
    candidate set — and hence the final top-k — matches the broadcast
    plan exactly."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join_pruned

    train_df, test_df = har_dfs
    a = knn_join_pruned(
        test_df, train_df, metric="euclidean", k=3, length=24,
        paa_segments=6, strategy="broadcast",
    )
    b = knn_join_pruned(
        test_df, train_df, metric="euclidean", k=3, length=24,
        paa_segments=6, strategy="chunked",
    )
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, a.collect()))
    plan = b._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" in plan

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
