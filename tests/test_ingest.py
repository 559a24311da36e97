"""Text ingest + series building (SURVEY.md §3.1 replacement pipeline)."""

from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
    cast_all,
    events_to_series,
    parse_series_text,
    split_train_test,
    with_row_id,
)


def test_parse_series_text_handles_messy_spacing(spark):
    rows = [
        (" 0.5 -1.25  3.0 ",),
        ("1 2   3",),
        ("  7.5",),
    ]
    df = spark.createDataFrame(rows, "value string")
    got = [r.features for r in parse_series_text(df).collect()]
    assert got == [[0.5, -1.25, 3.0], [1.0, 2.0, 3.0], [7.5]]


def test_parse_is_pure_sql_no_python(spark):
    # the plan must not contain a BatchEvalPython node (reference used a UDF)
    df = spark.createDataFrame([("1 2 3",)], "value string")
    plan = parse_series_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_cast_all(spark):
    df = spark.createDataFrame([("1", "2.5")], "a string, b string")
    row = cast_all(df).collect()[0]
    assert row.a == 1.0 and row.b == 2.5
    assert dict(cast_all(df).dtypes) == {"a": "double", "b": "double"}


def test_with_row_id_unique(spark):
    df = spark.range(100).toDF("x")
    ids = [r.row_id for r in with_row_id(df).collect()]
    assert len(set(ids)) == 100
    dense = [r.row_id for r in with_row_id(df, dense=True).collect()]
    assert sorted(dense) == list(range(1, 101))


def test_events_to_series_deterministic_order(spark):
    rows = [
        # key, ts(long ns), event_id, value, event_type — same ts on two rows:
        # event_id tiebreak orders them
        (1, 100, 1, 1.0, "a"),
        (1, 100, 2, 2.0, "a"),
        (1, 50, 0, 0.5, "b"),
        (2, 10, 3, 9.0, "b"),
        (2, 20, 4, 8.0, "b"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double, event_type string")
    got = {r.series_id: (r.features, r.label) for r in events_to_series(df).collect()}
    assert got[1] == ([0.5, 1.0, 2.0], "a")
    assert got[2] == ([9.0, 8.0], "b")


def test_events_to_series_label_mode_tiebreak(spark):
    # tie between event types -> lexicographically smallest wins
    rows = [(1, i, i, float(i), t) for i, t in enumerate(["z", "c", "z", "c"])]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double, event_type string")
    assert events_to_series(df).collect()[0].label == "c"


def test_events_to_series_length_filter(spark):
    rows = [(1, i, i, float(i), "a") for i in range(5)] + [(2, 0, 9, 1.0, "a")]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_id long, value double, event_type string")
    got = events_to_series(df, length=3).collect()
    assert len(got) == 1 and len(got[0].features) == 3


def test_split_train_test_partition(spark):
    df = spark.createDataFrame([(i, [1.0], "x") for i in range(20)], "series_id long, features array<double>, label string")
    train, test = split_train_test(df)
    assert train.count() + test.count() == 20
    assert test.filter((F.col("series_id") % 4) != 0).count() == 0


def test_bucketed_join_is_shuffle_free(spark):
    """Two tables bucketed on the join key with equal bucket counts must
    SortMergeJoin with no Exchange on either side (the write-once-shuffle,
    join-many-times contract save_table_bucketed exists for)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import save_table_bucketed

    a = spark.createDataFrame([(i, f"a{i}") for i in range(100)], "k long, av string")
    b = spark.createDataFrame([(i % 50, f"b{i}") for i in range(100)], "k long, bv string")
    save_table_bucketed(a, "bkt_a", bucket_cols="k", num_buckets=4, sort_cols="k")
    save_table_bucketed(b, "bkt_b", bucket_cols="k", num_buckets=4, sort_cols="k")
    try:
        # bucketed reads ignore AQE-forced broadcast only if SMJ is preferred
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == 100  # 50 b-keys x 2 matches each
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_partitioned_write_prunes(spark, tmp_path):
    """A filter on the partition column must prune to matching directories
    (PartitionFilters on the scan; non-matching dirs never opened) and the
    full round-trip must preserve the data."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
        save_table_partitioned,
    )
    import os

    df = spark.createDataFrame(
        [(i, ["en", "fr", "de"][i % 3], float(i)) for i in range(90)],
        "id long, lang string, v double",
    )
    path = str(tmp_path / "parted")
    save_table_partitioned(df, path, partition_cols="lang")
    assert sorted(
        d for d in os.listdir(path) if d.startswith("lang=")
    ) == ["lang=de", "lang=en", "lang=fr"]

    back = spark.read.parquet(path)
    assert back.count() == 90
    one = back.filter(F.col("lang") == "en")
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120]
    assert one.count() == 30
    assert {r.id % 3 for r in one.collect()} == {0}


def test_compact_parquet_reduces_files(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
        compact_parquet,
    )
    import os

    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    df = spark.range(10_000).selectExpr("id", "id * 2 AS v")
    df.repartition(64).write.parquet(src)
    n_small = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_small == 64

    n_files = compact_parquet(spark, src, dst, target_file_bytes=10 * 1024 * 1024)
    assert n_files == 1
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert n_out == 1
    back = spark.read.parquet(dst)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).collect()[0][0] == df.agg(F.sum("v")).collect()[0][0]


def test_upsert_partitions_refreshes_only_touched(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import upsert_partitions

    path = str(tmp_path / "t")
    day1 = spark.createDataFrame([(1, "d1"), (2, "d1"), (3, "d2")], "id long, day string")
    upsert_partitions(day1, path, partition_by="day")
    assert spark.read.parquet(path).count() == 3

    # rewrite ONLY d2 with new content; d1 must survive untouched
    fix = spark.createDataFrame([(30, "d2"), (31, "d2")], "id long, day string")
    upsert_partitions(fix, path, partition_by="day")
    back = spark.read.parquet(path)
    assert back.count() == 4
    assert sorted(r.id for r in back.filter("day = 'd1'").collect()) == [1, 2]
    assert sorted(r.id for r in back.filter("day = 'd2'").collect()) == [30, 31]
    # conf restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") != "dynamic"
        or spark.conf.get("spark.sql.sources.partitionOverwriteMode") == "static"
    )


def test_zorder_write_tightens_file_stats(spark, tmp_path):
    """The point of z-ordering: per-file parquet footer min/max boxes get
    dramatically tighter on BOTH curve dimensions than an unsorted write,
    so selective filters on either column skip most files. Asserted from
    the real parquet metadata, not a proxy."""
    import glob

    import pyarrow.parquet as pq

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import zorder_write

    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    plain = str(tmp_path / "plain")
    zord = str(tmp_path / "zord")
    li.repartition(16).write.mode("overwrite").parquet(plain)
    zorder_write(li, zord, zorder_by=["l_partkey", "l_suppkey"], bits=16, num_files=16)

    def mean_box_area(path):
        areas = []
        for f in glob.glob(f"{path}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                spans = {}
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    name = col.path_in_schema
                    if name in ("l_partkey", "l_suppkey"):
                        st = col.statistics
                        spans[name] = st.max - st.min + 1
                areas.append(spans["l_partkey"] * spans["l_suppkey"])
        return sum(areas) / len(areas)

    plain_area = mean_box_area(plain)
    z_area = mean_box_area(zord)
    # random layout: every file spans ~the full (partkey x suppkey) space;
    # z-order: contiguous curve segments -> orders of magnitude tighter
    assert z_area < plain_area / 4, (z_area, plain_area)

    # and the data is intact
    a = spark.read.parquet(plain).count()
    b = spark.read.parquet(zord).count()
    assert a == b == li.count()
