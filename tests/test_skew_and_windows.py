"""Salted join equivalence + streaming windowed aggregation."""

from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    salted_join,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
    sessionized_event_counts,
    windowed_event_aggregate,
)


def test_salted_join_matches_plain_join(spark):
    # 90% of rows share one hot key
    rows = [(1 if i % 10 else i, i) for i in range(1000)]
    skewed = spark.createDataFrame(rows, "k long, v long")
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "k long, name string")
    plain = skewed.join(dim, "k").select("k", "v", "name")
    salted = salted_join(skewed, dim, "k", salts=8).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left(spark):
    skewed = spark.createDataFrame([(1, 1), (1, 2), (99, 3)], "k long, v long")
    dim = spark.createDataFrame([(1, "a")], "k long, name string")
    out = salted_join(skewed, dim, "k", how="left").collect()
    assert len(out) == 3
    assert {r.v: r.name for r in out} == {1: "a", 2: "a", 3: None}


def test_windowed_aggregate_stream_matches_batch(spark, tmp_path):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("ts", "event_type", "value")
    )
    batch = windowed_event_aggregate(events, window="1 hour")
    expected = sorted(map(tuple, batch.collect()))

    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)
    agg = windowed_event_aggregate(stream, window="1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("winagg")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(map(tuple, spark.sql("SELECT * FROM winagg").collect()))
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 0


def test_session_windows_batch(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = sessionized_event_counts(events, gap="1 hour")
    rows = out.collect()
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)
    assert all(r.session_end > r.session_start for r in rows)


def test_stateful_running_stats_across_batches(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        running_user_stats,
    )

    schema = "user_id long, value double"
    src = str(tmp_path / "src")
    spark.createDataFrame([(1, 1.0), (1, 2.0), (2, 5.0)], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rs")
        .start()
    )
    try:
        q.processAllAvailable()
        # second micro-batch: state must carry over
        spark.createDataFrame([(1, 10.0)], schema).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT * FROM rs WHERE user_id = 1 ORDER BY n_events DESC LIMIT 1"
        ).collect()
    finally:
        q.stop()
    assert rows[0].n_events == 3
    assert rows[0].total_value == 13.0
    assert rows[0].max_value == 10.0
