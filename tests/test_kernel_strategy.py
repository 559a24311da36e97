"""strategy='kernel' (pair-free broadcast KNN) parity with the declarative
plans, across metrics, plus its error surface."""

import math

import pytest

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    knn_classify,
    knn_join,
)


@pytest.mark.parametrize("metric", ["euclidean", "manhattan", "chebyshev", "fastdtw"])
def test_kernel_matches_declarative(spark, har_dfs, metric):
    train_df, test_df = har_dfs
    a = sorted(map(tuple, knn_join(test_df, train_df, metric=metric, k=4).collect()))
    b = sorted(
        map(tuple, knn_join(test_df, train_df, metric=metric, k=4, strategy="kernel").collect())
    )
    assert [x[:3] + (x[4],) for x in a] == [x[:3] + (x[4],) for x in b]
    assert all(math.isclose(x[3], y[3], rel_tol=1e-9) for x, y in zip(a, b))


def test_kernel_classify_end_to_end(spark, har_dfs):
    train_df, test_df = har_dfs
    via_kernel = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_df, train_df, metric="euclidean", k=3, strategy="kernel").collect()
    }
    via_plan = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_df, train_df, metric="euclidean", k=3).collect()
    }
    assert via_kernel == via_plan


def test_kernel_rejects_ragged_train(spark):
    train = spark.createDataFrame(
        [(1, [1.0, 2.0], "a"), (2, [1.0, 2.0, 3.0], "b")],
        "series_id long, features array<double>, label string",
    )
    test = spark.createDataFrame([(9, [1.0, 1.0], "a")], "series_id long, features array<double>, label string")
    with pytest.raises(ValueError, match="fixed-length"):
        knn_join(test, train, k=1, strategy="kernel")


def test_kernel_rejects_unsupported_metric(spark, har_dfs):
    train_df, test_df = har_dfs
    with pytest.raises(ValueError, match="does not support metric"):
        knn_join(test_df, train_df, metric="cosine", strategy="kernel")


def test_kernel_oversize_falls_back_without_collect(spark, har_dfs):
    """A train side over max_broadcast_bytes must NOT be materialized on the
    driver: the kernel strategy degrades to the chunked block scorer (r5 —
    applyInPandas cells, no MapInPandas broadcast-variable node), BIT-
    identical to the unguarded kernel and matching the declarative plan
    under the kernel contract (exact ranks, 1e-9 distances)."""
    train_df, test_df = har_dfs
    guarded = knn_join(
        test_df, train_df, metric="euclidean", k=4, strategy="kernel",
        max_broadcast_bytes=64,  # ~8 doubles: any real train side exceeds it
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan  # kernel path not taken
    assert "FlatMapGroupsInPandas" in plan  # chunked block scorer taken
    kernel = knn_join(test_df, train_df, metric="euclidean", k=4, strategy="kernel")
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, kernel.collect())
    )
    a = sorted(map(tuple, knn_join(test_df, train_df, metric="euclidean", k=4).collect()))
    b = sorted(map(tuple, guarded.collect()))
    assert [x[:3] + (x[4],) for x in a] == [x[:3] + (x[4],) for x in b]
    assert all(math.isclose(x[3], y[3], rel_tol=1e-9) for x, y in zip(a, b))


def test_kernel_fastdtw_oversize_falls_back(spark, har_dfs):
    """Same guard on the DTW path: results match the kernel answer, the plan
    is the declarative pandas_udf one (ArrowEvalPython, not MapInPandas)."""
    train_df, test_df = har_dfs
    guarded = knn_join(
        test_df, train_df, metric="fastdtw", k=3, strategy="kernel",
        max_broadcast_bytes=64,
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    kernel = knn_join(test_df, train_df, metric="fastdtw", k=3, strategy="kernel")
    a = sorted(map(tuple, guarded.collect()))
    b = sorted(map(tuple, kernel.collect()))
    assert [x[:3] + (x[4],) for x in a] == [x[:3] + (x[4],) for x in b]
    assert all(math.isclose(x[3], y[3], rel_tol=1e-9) for x, y in zip(a, b))


def test_ann_kernel_oversize_falls_back(spark):
    """ann_brute_topk's kernel guard: oversize corpus stays distributed and
    matches the declarative answer bit-for-bit."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_brute_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    guarded = ann_brute_topk(emb.limit(10), emb, k=3, strategy="kernel",
                             max_broadcast_bytes=64)
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan
    declarative = ann_brute_topk(emb.limit(10), emb, k=3)
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, declarative.collect())
    )


def test_kernel_no_label(spark, har_dfs):
    train_df, test_df = har_dfs
    nn = knn_join(test_df, train_df, k=2, strategy="kernel", label_col=None)
    assert set(nn.columns) == {"test_id", "train_id", "distance", "rank"}
    assert nn.count() == test_df.count() * 2


# ------------------------------------------------- strategy='reverse' -----
# r9: broadcast-the-TEST kernel for the serve regime (train over budget,
# query side fits) — zero array exchange, train streamed in place.


@pytest.mark.parametrize("metric", ["euclidean", "fastdtw", "twed"])
def test_reverse_matches_kernel(spark, har_dfs, metric):
    train_df, test_df = har_dfs
    a = sorted(map(tuple, knn_join(
        test_df, train_df, metric=metric, k=4, strategy="kernel").collect()))
    b = sorted(map(tuple, knn_join(
        test_df, train_df, metric=metric, k=4, strategy="reverse").collect()))
    assert [x[:3] + (x[4],) for x in a] == [x[:3] + (x[4],) for x in b]
    assert all(math.isclose(x[3], y[3], rel_tol=0, abs_tol=0) for x, y in zip(a, b))


def test_reverse_matches_kernel_ragged_and_banded(spark):
    import random

    rng = random.Random(7)
    train = spark.createDataFrame(
        [(i, [rng.random() for _ in range(16 - (i % 3) * 4)], ("a", "b")[i % 2])
         for i in range(60)],
        "series_id long, features array<double>, label string",
    )
    test = spark.createDataFrame(
        [(100 + i, [rng.random() for _ in range(16 - (i % 3) * 4)], "q")
         for i in range(9)],
        "series_id long, features array<double>, label string",
    )
    for kw in [dict(metric="dtw", band=2), dict(metric="erp")]:
        a = sorted(map(tuple, knn_join(
            test, train, k=3, strategy="kernel", **kw).collect()))
        b = sorted(map(tuple, knn_join(
            test, train, k=3, strategy="reverse", **kw).collect()))
        assert a == b, kw


def test_reverse_no_label_and_guard_routing(spark):
    import random

    rng = random.Random(11)
    train = spark.createDataFrame(
        [(i, [rng.random() for _ in range(16)], "a") for i in range(200)],
        "series_id long, features array<double>, label string",
    )
    test = spark.createDataFrame(
        [(900 + i, [rng.random() for _ in range(16)], "q") for i in range(5)],
        "series_id long, features array<double>, label string",
    )
    nn = knn_join(test, train, k=2, strategy="reverse", label_col=None)
    assert set(nn.columns) == {"test_id", "train_id", "distance", "rank"}
    assert nn.count() == 10
    # guard routing: train est (200*16*8=25600) over budget, test est
    # (5*16*8=640) within budget//8 -> the kernel guard must pick the
    # reverse plan (MapInPandas over train, no grid exchange)
    guarded = knn_join(
        test, train, metric="euclidean", k=2, strategy="kernel",
        max_broadcast_bytes=8000,
    )
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    kernel = knn_join(test, train, metric="euclidean", k=2, strategy="kernel")
    assert sorted(map(tuple, guarded.collect())) == sorted(
        map(tuple, kernel.collect())
    )


def test_reverse_rejects_oversized_test(spark, har_dfs):
    train_df, test_df = har_dfs
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        knn_join(test_df, train_df, k=2, strategy="reverse",
                 max_broadcast_bytes=64)


def test_ann_reverse_matches_kernel_and_guard_routes(spark):
    """r9: ann_brute_topk strategy='reverse' (broadcast-the-query serve
    plan) — exact equality with the kernel/declarative answers, and the
    kernel guard picks it when the corpus is over budget but the query
    side fits budget // 8."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_brute_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    qs = emb.limit(6)
    a = sorted(map(tuple, ann_brute_topk(qs, emb, k=3, strategy="kernel").collect()))
    b = sorted(map(tuple, ann_brute_topk(qs, emb, k=3, strategy="reverse").collect()))
    assert a == b
    d = sorted(map(tuple, ann_brute_topk(qs, emb, k=3).collect()))
    assert a == d
    # corpus est: 120 * dim * 8; query est: 6 * dim * 8. A budget between
    # 8 * query_est and corpus_est forces the guard onto the reverse plan.
    dim = len(emb.first()["embedding"])
    budget = 8 * 6 * dim * 8 + 8
    assert budget < 120 * dim * 8
    guarded = ann_brute_topk(qs, emb, k=3, strategy="kernel",
                             max_broadcast_bytes=budget)
    plan = guarded._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "FlatMapGroupsInPandas" not in plan
    assert sorted(map(tuple, guarded.collect())) == a


def test_ann_reverse_rejects_oversized_query(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_brute_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    with pytest.raises(ValueError, match="max_broadcast_bytes"):
        ann_brute_topk(emb.limit(10), emb, k=3, strategy="reverse",
                       max_broadcast_bytes=64)


def test_ann_quantized_reverse_matches_kernel(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_quantized_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(120)
    qs = emb.limit(6)
    a = sorted(map(tuple, ann_quantized_topk(qs, emb, k=3, strategy="kernel").collect()))
    b = sorted(map(tuple, ann_quantized_topk(qs, emb, k=3, strategy="reverse").collect()))
    assert a == b
    dim = len(emb.first()["embedding"])
    budget = 8 * 6 * dim * 2 + 8   # int16 wire estimate
    guarded = ann_quantized_topk(qs, emb, k=3, strategy="kernel",
                                 max_broadcast_bytes=budget)
    assert sorted(map(tuple, guarded.collect())) == a


def test_batched_emit_many_rows_per_call_bit_parity(spark):
    """r10 (VERDICT r9 #7): the scoring core's top-k emit is batched
    across a kernel call's test rows (one lexsort with the row index as
    primary key). Pin bit-identity against the declarative plan in
    exactly the regime the batching targets — a NARROW train side
    (n_train << 1024, so rows_per > 1 packs many test rows per call)
    with heavy integer ties, exact-zero duplicate pairs, and string
    labels — across kernel/chunked/reverse and k spanning under/over the
    per-row neighbor count."""
    import random

    rng = random.Random(20260818)
    train_rows = [
        (100 + i, [float(rng.randint(0, 2)) for _ in range(6)],
         ["aa", "bb", "cc"][i % 3])
        for i in range(7)
    ]
    test_rows = [
        (i, [float(rng.randint(0, 2)) for _ in range(6)]) for i in range(50)
    ]
    # exact duplicates of train rows -> d == 0 pairs under exclude_zero
    for j in (0, 3):
        test_rows[j] = (test_rows[j][0], list(train_rows[j][1]))
    train = spark.createDataFrame(
        train_rows, "series_id long, features array<double>, label string"
    )
    test = spark.createDataFrame(test_rows, "series_id long, features array<double>")
    for metric in ("euclidean", "dtw", "twed"):
        kw = {"band": 2} if metric == "dtw" else {}
        for k in (1, 4, 10):
            ref = sorted(
                map(tuple, knn_join(test, train, metric=metric, k=k, **kw).collect())
            )
            for strategy in ("kernel", "chunked", "reverse"):
                got = sorted(
                    map(
                        tuple,
                        knn_join(
                            test, train, metric=metric, k=k, strategy=strategy, **kw
                        ).collect(),
                    )
                )
                assert got == ref, (metric, k, strategy)
