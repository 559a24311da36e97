"""Closes the last three reference data-model surfaces (r1 verdict items
6/7/9): the Hive-metastore table round-trip (reference S1,
Team11-Project.py:43-46 reads via spark.table; :199/:513 writes via
saveAsTable), the MLlib VectorUDT boundary (VectorAssembler output,
Team11-Project.py:107-110), and the wide per-timestep projection
(feature_1..feature_N, Team11-Project.py:68-74)."""

import math

import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions import series_to_columns
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
    events_to_series,
    load_table,
    save_table,
)

SF = "/root/testdata/sf0.001"


def test_save_as_table_spark_table_roundtrip(spark, tmp_path):
    """save_table(name) -> metastore table -> spark.table(name) reads the
    identical rows: the reference's actual S1 scan surface."""
    series = events_to_series(load_table(spark, SF, "events"), length=8).limit(50)
    name = "t_roundtrip_series"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a crashed earlier run can leave an orphan managed-table location that
    # DROP TABLE (which no longer knows it) won't clean
    import shutil

    loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{loc}/{name}", ignore_errors=True)
    save_table(series, name)
    back = spark.table(name)
    # parquet write/read normalizes nullability flags; types must match
    assert back.schema.simpleString() == series.schema.simpleString()
    a = sorted(map(tuple, series.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
    # catalog sees it as a real managed table
    assert any(t.name == name for t in spark.catalog.listTables())
    spark.sql(f"DROP TABLE {name}")


def test_vector_udt_boundary_roundtrip(spark):
    """array<double> -> MLlib VectorUDT -> array<double> round-trip, the
    VectorAssembler-output boundary (Team11-Project.py:107-110). The engine
    computes on native arrays; this is the documented bridge for pipelines
    that hand over ml.linalg vectors."""
    from pyspark.ml.functions import array_to_vector, vector_to_array

    series = events_to_series(load_table(spark, SF, "events"), length=8).limit(20)
    as_vec = series.select(
        "series_id", array_to_vector("features").alias("features_vec")
    )
    assert "vector" in as_vec.schema["features_vec"].dataType.typeName()
    back = as_vec.select(
        "series_id", vector_to_array("features_vec").alias("features")
    )
    orig = {r.series_id: list(r.features) for r in series.collect()}
    got = {r.series_id: list(r.features) for r in back.collect()}
    assert set(orig) == set(got)
    for k in orig:
        assert all(
            math.isclose(x, y, rel_tol=1e-12) for x, y in zip(orig[k], got[k])
        )


def test_vector_udt_feeds_mllib(spark):
    """The bridged vectors are real MLlib vectors: a VectorAssembler-style
    consumer (here: Summarizer) accepts them."""
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.stat import Summarizer

    series = events_to_series(load_table(spark, SF, "events"), length=8).limit(20)
    v = series.select(array_to_vector("features").alias("v"))
    row = v.select(Summarizer.mean(F.col("v")).alias("m")).first()
    assert len(row.m) == 8


def test_series_to_columns_wide_projection(spark):
    """series_to_columns reproduces the reference's feature_1..feature_N wide
    layout from the native array column — values positionally identical,
    plan is pure GetArrayItem projections (no UDF, no shuffle)."""
    series = events_to_series(load_table(spark, SF, "events"), length=8).limit(30)
    wide = series_to_columns(series, 8)
    assert [c for c in wide.columns if c.startswith("feature_")] == [
        f"feature_{i}" for i in range(1, 9)
    ]
    narrow = {r.series_id: list(r.features) for r in series.collect()}
    for r in wide.collect():
        expect = narrow[r.series_id]
        got = [r[f"feature_{i}"] for i in range(1, 9)]
        assert got == expect
    # the projection itself adds no shuffle and no UDF: over a plain parquet
    # scan (no upstream series-build aggregation) the whole plan is scan+project
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(5)
    plan = (
        series_to_columns(emb, 4, features_col="embedding")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # projection only — no shuffle
    assert "Python" not in plan  # no UDF


def test_series_to_columns_rejects_missing_column(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id long, features array<double>")
    out = series_to_columns(df, 2)
    assert out.columns == ["id", "feature_1", "feature_2"]
    assert out.first()["feature_2"] == 2.0
