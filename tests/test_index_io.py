"""save_index/load_index (sources/index_io.py): dict-of-DataFrames index
persistence for the build-once/serve-many operators. Round-trips must be
serving-identical: search results from a loaded index == results from the
in-memory build."""
from __future__ import annotations

import numpy as np
import pytest

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
    load_index,
    save_index,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat"),
        (3, "dogs and cats living together"),
        (4, "a completely unrelated document about spark sql engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_index_roundtrip_serving_identical(spark, docs, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bm25_build,
        bm25_search,
        bm25_search_pruned,
    )

    qs = spark.createDataFrame(
        [(10, "the cat"), (11, "spark engines")], "query_id long, query_text string"
    )
    built = bm25_build(docs)
    path = str(tmp_path / "bm25_idx")
    # partition_by term: the layout a 100 TB index would use so the
    # query-vocabulary join prunes files instead of scanning the index
    save_index(built, path, partition_by={"tf": ["term"]})
    loaded = load_index(spark, path)
    assert set(loaded) == {"tf", "df", "stats"}
    a = sorted(map(tuple, bm25_search(qs, built, k=3).collect()))
    b = sorted(map(tuple, bm25_search(qs, loaded, k=3).collect()))
    assert a == b
    aw = sorted(map(tuple, bm25_search_pruned(qs, built, k=3, max_postings=2).collect()))
    bw = sorted(map(tuple, bm25_search_pruned(qs, loaded, k=3, max_postings=2).collect()))
    assert aw == bw


def test_ivfpq_index_roundtrip_serving_identical(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        ivfpq_build,
        ivfpq_search,
    )

    rng = np.random.default_rng(3)
    rows = [(int(i), [float(x) for x in rng.normal(0, 1, 16)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    idx = ivfpq_build(emb, n_lists=4, n_subspaces=4, n_codes=8, dim=16)
    path = str(tmp_path / "ivfpq_idx")
    save_index(idx, path, partition_by={"codes": ["cell"]})
    loaded = load_index(spark, path)
    assert set(loaded) == {"centroids", "codebook", "codes", "params"}
    q = emb.limit(6)
    a = sorted(map(tuple, ivfpq_search(
        q, idx, emb, k=3, n_probe=2, rerank=16, n_subspaces=4, dim=16
    ).collect()))
    b = sorted(map(tuple, ivfpq_search(
        q, loaded, emb, k=3, n_probe=2, rerank=16, n_subspaces=4, dim=16
    ).collect()))
    assert a == b


def test_save_index_rejects_unsafe_names_and_empty(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="empty index"):
        save_index({}, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="path-safe"):
        save_index({"a/b": docs}, str(tmp_path / "x"))
    with pytest.raises(ValueError, match="path-safe"):
        save_index({"_meta": docs}, str(tmp_path / "x"))


def test_load_index_missing_path_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="does not exist"):
        load_index(spark, str(tmp_path / "nope"))
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no index tables"):
        load_index(spark, str(tmp_path / "empty"))


def test_term_partitioned_tf_prunes_on_read(spark, docs, tmp_path):
    """The layout claim behind partition_by={'tf': ['term']}: a term filter
    on the loaded index reaches the scan as a PartitionFilter (directory
    pruning), so a query-vocabulary join against a term-partitioned tf
    reads only the matching term directories instead of the whole index."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import bm25_build

    path = str(tmp_path / "bm25_part")
    save_index(bm25_build(docs), path, partition_by={"tf": ["term"]})
    tf = load_index(spark, path)["tf"]
    filtered = tf.filter(tf.term == "cat")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "term" in plan.split("PartitionFilters", 1)[1][:200]
    # and the filter actually prunes: only the cat partition's rows surface
    rows = filtered.collect()
    assert rows and all(r.term == "cat" for r in rows)


def test_perceptron_model_roundtrip_serving_identical(spark, docs, tmp_path):
    """The trained quality-filter weights persist through the same
    save_index/load_index layout as BM25/IVF-PQ — integer weights, so the
    reloaded model scores bit-identically."""
    from pyspark.sql import functions as F

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        doc_quality_features,
        score_with_weights,
        train_quality_perceptron,
    )

    labeled = doc_quality_features(docs).join(
        docs.select(
            "doc_id",
            F.when(F.length("text") > 25, 1).otherwise(-1).alias("y"),
        ),
        "doc_id",
    )
    w = train_quality_perceptron(labeled, epochs=3)
    path = str(tmp_path / "quality_model")
    save_index({"weights": w}, path)
    w2 = load_index(spark, path)["weights"]
    assert sorted((r.dim, r.weight) for r in w2.collect()) == sorted(
        (r.dim, r.weight) for r in w.collect()
    )
    want = {(r.doc_id, r.score, r.kept) for r in score_with_weights(labeled, w).collect()}
    got = {(r.doc_id, r.score, r.kept) for r in score_with_weights(labeled, w2).collect()}
    assert got == want


def test_overwrite_removes_stale_tables(spark, docs, tmp_path):
    """Re-saving a DIFFERENT index at the same path must not leave the
    previous index's tables behind (load_index would serve a stale mix)."""
    path = str(tmp_path / "reused_index")
    a = docs.select("doc_id").limit(1)
    save_index({"tf": a, "df": a, "stats": a}, path)
    save_index({"centroids": a, "codes": a}, path, mode="overwrite")
    assert sorted(load_index(spark, path)) == ["centroids", "codes"]

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
