"""KNN operator tests: tie-break parity with the reference's heapq/Counter
semantics, self-exclusion, strategy equivalence, end-to-end accuracy floor."""

import heapq
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    accuracy,
    knn_classify,
    knn_join,
    knn_predict_1nn,
    majority_vote,
)


def _py_reference_knn(train_rows, test_rows, k):
    """Reference semantics in pure Python (Team11-Project.py:166-199):
    per-test heapq.nsmallest(k) over (distance, label), dist != 0 excluded,
    Counter.most_common vote with insertion (distance) order tie-break."""
    preds = {}
    for tid, tf, _ in test_rows:
        dists = []
        for rid, rf, rl in train_rows:
            d = float(np.linalg.norm(np.array(tf) - np.array(rf)))
            if d != 0:
                dists.append((d, rl))
        top = heapq.nsmallest(k, dists)
        preds[tid] = Counter(l for _, l in top).most_common(1)[0][0]
    return preds


def test_knn_matches_python_reference(spark, har_dfs):
    train_df, test_df = har_dfs
    train_rows = [(r.series_id, r.features, r.label) for r in train_df.collect()]
    test_rows = [(r.series_id, r.features, r.label) for r in test_df.collect()]
    expected = _py_reference_knn(train_rows, test_rows, k=5)
    got = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_df, train_df, metric="euclidean", k=5).collect()
    }
    assert got == expected


def test_strategies_agree(spark, har_dfs):
    train_df, test_df = har_dfs
    a = knn_join(test_df, train_df, k=3, strategy="broadcast").collect()
    b = knn_join(test_df, train_df, k=3, strategy="shuffle").collect()
    key = lambda r: (r.test_id, r.rank)
    assert sorted(map(tuple, a), key=lambda t: (t[0], t[4])) == sorted(
        map(tuple, b), key=lambda t: (t[0], t[4])
    )


def test_self_exclusion(spark):
    # a test series identical to a train series: zero distance excluded
    rows = [(1, [1.0, 2.0], 1.0), (2, [9.0, 9.0], 2.0)]
    train = spark.createDataFrame(rows, "series_id long, features array<double>, label double")
    test = spark.createDataFrame([(10, [1.0, 2.0], 1.0)], "series_id long, features array<double>, label double")
    nn = knn_join(test, train, k=5).collect()
    assert [r.train_id for r in nn] == [2]
    nn2 = knn_join(test, train, k=5, exclude_zero=False).collect()
    assert [r.train_id for r in sorted(nn2, key=lambda r: r.rank)] == [1, 2]


def test_topk_tiebreak_distance_then_label(spark):
    # two train rows equidistant from the test row -> label asc wins rank 1
    train = spark.createDataFrame(
        [(1, [0.0, 1.0], 5.0), (2, [1.0, 0.0], 3.0), (3, [4.0, 4.0], 1.0)],
        "series_id long, features array<double>, label double",
    )
    test = spark.createDataFrame([(10, [0.0, 0.0], 0.0)], "series_id long, features array<double>, label double")
    nn = sorted(knn_join(test, train, k=2).collect(), key=lambda r: r.rank)
    assert [r.train_label for r in nn] == [3.0, 5.0]


def test_vote_tiebreak_best_rank(spark):
    # 2 votes each; label B holds the nearest neighbor -> B wins (Counter
    # insertion-order semantics)
    rows = [
        (1, "B", 1), (1, "A", 2), (1, "A", 3), (1, "B", 4),
    ]
    df = spark.createDataFrame(rows, "test_id long, train_label string, rank int")
    got = majority_vote(df).collect()
    assert got[0].predicted_label == "B"


def test_1nn_matches_k1_classify(spark, har_dfs):
    train_df, test_df = har_dfs
    via_minby = {
        r.test_id: r.predicted_label
        for r in knn_predict_1nn(test_df, train_df, metric="euclidean").collect()
    }
    via_window = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_df, train_df, metric="euclidean", k=1).collect()
    }
    assert via_minby == via_window


@pytest.mark.parametrize("metric", ["euclidean", "fastdtw"])
def test_end_to_end_accuracy_floor(spark, har_dfs, metric):
    train_df, test_df = har_dfs
    pred = knn_classify(test_df, train_df, metric=metric, k=3)
    truth = test_df.withColumnRenamed("series_id", "test_id")
    row = accuracy(pred, truth, key="test_id").collect()[0]
    assert row.n_rows == test_df.count()
    assert row.accuracy >= 0.9, f"{metric} accuracy {row.accuracy}"


def test_dtw_knn_matches_fastdtw_reference_semantics(spark, har_dfs):
    """Predictions from the banded-DTW metric equal a pure-Python
    fastdtw(radius=1)-based reference KNN on separable data."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import (
        fastdtw_pair,
    )

    train_df, test_df = har_dfs
    train_rows = [(r.series_id, r.features, r.label) for r in train_df.collect()][:40]
    test_rows = [(r.series_id, r.features, r.label) for r in test_df.collect()][:10]
    train_small = spark.createDataFrame(train_rows, "series_id long, features array<double>, label double")
    test_small = spark.createDataFrame(test_rows, "series_id long, features array<double>, label double")

    preds = {}
    for tid, tf, _ in test_rows:
        dists = []
        for rid, rf, rl in train_rows:
            d = fastdtw_pair(tf, rf, radius=1)
            if d != 0:
                dists.append((d, rl))
        top = heapq.nsmallest(3, dists)
        preds[tid] = Counter(l for _, l in top).most_common(1)[0][0]

    got = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_small, train_small, metric="fastdtw", k=3).collect()
    }
    assert got == preds
