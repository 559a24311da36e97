"""Chunked (block nested-loop) ANN fallback: bit-identity with the broadcast
kernel and the declarative plan, multi-block tiling, and plan shape.

The chunked path is the 100 TB no-broadcast regime for ann_brute_topk /
ann_quantized_topk (VERDICT r4 #2): neither side fits in one executor as a
broadcast variable, so the cross product is tiled into (query-block x
corpus-block) cells scored inside applyInPandas. Because per-pair arithmetic
is independent of blocking and the global rerank window reproduces the
kernel's (dist, neighbor_id) lexsort, results must be IDENTICAL — these
tests pin that contract with block_bytes forced tiny so every run exercises
real multi-block tiling.
"""
from __future__ import annotations

import numpy as np
import pytest

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.similarity import (
    ann_brute_topk,
    ann_quantized_topk,
)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(7)
    rows = [
        (int(i), [float(x) for x in rng.normal(0, 1, 16)]) for i in range(200)
    ]
    # a few zero vectors to exercise the zero-norm branch
    rows[13] = (13, [0.0] * 16)
    rows[77] = (77, [0.0] * 16)
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _collect(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("exclude_self", [True, False])
def test_chunked_brute_matches_kernel(spark, emb, exclude_self):
    """Multi-block chunked == kernel, bit-for-bit (distances included)."""
    kernel = ann_brute_topk(
        emb.limit(23), emb, k=5, strategy="kernel", exclude_self=exclude_self
    )
    # 200 rows x 16 dims x 8B = 25.6 KB; block_bytes=2048 forces ~13 corpus
    # blocks and multi-query-blocks too
    chunked = ann_brute_topk(
        emb.limit(23), emb, k=5, strategy="chunked",
        exclude_self=exclude_self, block_bytes=2048,
    )
    assert _collect(chunked) == _collect(kernel)


def test_chunked_brute_matches_declarative(spark):
    """Zero-free fixture: the SQL fold keeps 0/0 as NaN while Arrow paths
    surface it as null, so the declarative comparison pins the (vastly
    dominant) finite-distance contract; null handling vs the KERNEL is
    pinned above with the zero-vector fixture."""
    rng = np.random.default_rng(11)
    rows = [(int(i), [float(x) for x in rng.normal(0, 1, 16)]) for i in range(150)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    declarative = ann_brute_topk(df.limit(17), df, k=4, strategy="declarative")
    chunked = ann_brute_topk(
        df.limit(17), df, k=4, strategy="chunked", block_bytes=4096
    )
    assert _collect(chunked) == _collect(declarative)


@pytest.mark.parametrize("exclude_self", [True, False])
def test_chunked_quantized_matches_kernel(spark, emb, exclude_self):
    kernel = ann_quantized_topk(
        emb.limit(19), emb, k=5, strategy="kernel", exclude_self=exclude_self
    )
    chunked = ann_quantized_topk(
        emb.limit(19), emb, k=5, strategy="chunked",
        exclude_self=exclude_self, block_bytes=2048,
    )
    assert _collect(chunked) == _collect(kernel)


def test_oversize_guard_routes_to_chunked(spark, emb):
    """max_broadcast_bytes exceeded -> the kernel strategy degrades to the
    chunked block scorer (FlatMapGroupsInPandas in the plan, no broadcast
    variable collect), with results identical to the kernel answer."""
    guarded = ann_brute_topk(
        emb.limit(11), emb, k=3, strategy="kernel", max_broadcast_bytes=1024
    )
    plan = guarded._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" in plan
    kernel = ann_brute_topk(emb.limit(11), emb, k=3, strategy="kernel")
    assert _collect(guarded) == _collect(kernel)


def test_quantized_oversize_guard_routes_to_chunked(spark, emb):
    guarded = ann_quantized_topk(
        emb.limit(11), emb, k=3, strategy="kernel", max_broadcast_bytes=512
    )
    plan = guarded._jdf.queryExecution().toString()
    assert "FlatMapGroupsInPandas" in plan
    kernel = ann_quantized_topk(emb.limit(11), emb, k=3, strategy="kernel")
    assert _collect(guarded) == _collect(kernel)


def test_chunked_single_block_degenerate(spark, emb):
    """block_bytes larger than everything -> one cell; still correct."""
    kernel = ann_brute_topk(emb.limit(7), emb, k=3, strategy="kernel")
    chunked = ann_brute_topk(
        emb.limit(7), emb, k=3, strategy="chunked", block_bytes=1 << 30
    )
    assert _collect(chunked) == _collect(kernel)
