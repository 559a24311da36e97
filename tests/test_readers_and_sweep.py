"""File-format readers + the k-sweep validation harness."""

from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    k_sweep,
    knn_classify,
    accuracy,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
    parse_series_text,
    read_csv,
    read_json,
    read_text,
)


def test_read_text_to_series(spark, tmp_path):
    """The reference's full raw-ingest path: text file -> 1-column DataFrame
    -> parsed series (Team11-Project.py:38-62 without the UDF/column loop)."""
    p = tmp_path / "raw.txt"
    p.write_text(" 0.1 0.2  0.3 \n1 2 3\n")
    df = read_text(spark, str(p))
    assert df.columns == ["value"]
    parsed = parse_series_text(df)
    got = sorted([r.features for r in parsed.collect()])
    assert got == [[0.1, 0.2, 0.3], [1.0, 2.0, 3.0]]


def test_read_csv_schema_explicit(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("id,v\n1,2.5\n2,3.5\n")
    df = read_csv(spark, str(p), "id long, v double")
    assert df.count() == 2 and dict(df.dtypes) == {"id": "bigint", "v": "double"}


def test_read_json(spark, tmp_path):
    p = tmp_path / "d.json"
    p.write_text('{"id": 1, "xs": [1.0, 2.0]}\n{"id": 2, "xs": []}\n')
    df = read_json(spark, str(p), "id long, xs array<double>")
    assert {r.id: r.xs for r in df.collect()} == {1: [1.0, 2.0], 2: []}


def test_k_sweep_consistent_with_single_runs(spark, har_dfs):
    train_df, test_df = har_dfs
    sweep = {r.k: (r.n_correct, r.accuracy) for r in
             k_sweep(test_df, train_df, ks=[1, 5], metric="euclidean").collect()}
    truth = test_df.withColumnRenamed("series_id", "test_id")
    for k in (1, 5):
        single = accuracy(
            knn_classify(test_df, train_df, metric="euclidean", k=k), truth,
            key="test_id",
        ).collect()[0]
        assert sweep[k] == (single.n_correct, single.accuracy)
