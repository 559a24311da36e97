"""Estimator/Transformer wrapper + Structured Streaming scoring."""

import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml import (
    KnnDtwClassifier,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    knn_classify,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
    score_stream,
)


def test_estimator_transform_matches_operator(spark, har_dfs):
    train_df, test_df = har_dfs
    model = KnnDtwClassifier(k=3, metric="euclidean").fit(train_df)
    out = model.transform(test_df)
    assert "predicted_label" in out.columns
    via_model = {r.series_id: r.predicted_label for r in out.collect()}
    via_op = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_df, train_df, metric="euclidean", k=3).collect()
    }
    assert via_model == via_op


def test_estimator_k1_fast_path(spark, har_dfs):
    train_df, test_df = har_dfs
    model = KnnDtwClassifier(k=1, metric="euclidean").fit(train_df)
    out = {r.series_id: r.predicted_label for r in model.transform(test_df).collect()}
    via_op = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_df, train_df, metric="euclidean", k=1).collect()
    }
    assert out == via_op


def test_estimator_neighbors_surface(spark, har_dfs):
    train_df, test_df = har_dfs
    model = KnnDtwClassifier(k=4).fit(train_df)
    nn = model.neighbors(test_df.limit(3))
    rows = nn.collect()
    assert set(nn.columns) == {"test_id", "train_id", "train_label", "distance", "rank"}
    assert max(r.rank for r in rows) <= 4


def test_estimator_in_pipeline(spark, har_dfs):
    from pyspark.ml import Pipeline

    train_df, test_df = har_dfs
    pipe = Pipeline(stages=[KnnDtwClassifier(k=3, metric="fastdtw")])
    model = pipe.fit(train_df)
    out = model.transform(test_df.limit(5))
    assert out.count() == 5


def test_crossvalidator_tunes_k(spark, har_dfs):
    """Full MLlib interop: ParamGridBuilder + CrossValidator + a stock
    Evaluator tune k over the lazy KNN estimator (the reference's manual
    k-sweep loop, Team11-Project.py:237-322, as native MLlib tuning)."""
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator
    from pyspark.ml.tuning import CrossValidator, ParamGridBuilder

    train_df, _ = har_dfs
    est = KnnDtwClassifier(metric="euclidean")
    grid = ParamGridBuilder().addGrid(est.k, [1, 3]).build()
    ev = MulticlassClassificationEvaluator(
        labelCol="label", predictionCol="predicted_label", metricName="accuracy"
    )
    cv = CrossValidator(
        estimator=est, estimatorParamMaps=grid, evaluator=ev,
        numFolds=2, parallelism=1, seed=7,
    )
    cvm = cv.fit(train_df.limit(60))
    assert len(cvm.avgMetrics) == 2
    assert max(cvm.avgMetrics) > 0.5  # separable synthetic: KNN must work
    assert cvm.bestModel.getOrDefault(cvm.bestModel.k) in (1, 3)


@pytest.mark.parametrize("k", [1, 3])
def test_streaming_scores_match_batch(spark, har_dfs, tmp_path, k):
    train_df, test_df = har_dfs
    # write the "stream" as parquet files and read them back as a file stream
    src = str(tmp_path / "stream_src")
    test_small = test_df.limit(10)
    test_small.write.parquet(src)

    stream = spark.readStream.schema(test_small.schema).parquet(src)
    scored = score_stream(stream, train_df, metric="euclidean", k=k)
    q = (
        scored.writeStream.outputMode("complete")
        .format("memory")
        .queryName(f"scored_k{k}")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.test_id: r.predicted_label
            for r in spark.sql(f"SELECT * FROM scored_k{k}").collect()
        }
    finally:
        q.stop()

    expect = {
        r.test_id: r.predicted_label
        for r in knn_classify(test_small, train_df, metric="euclidean", k=k).collect()
    }
    assert got == expect


def test_streaming_dedup_matches_batch(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        stream_dedup_exact,
        stream_dedup_fingerprint,
    )

    rows = [
        (1, "alpha beta"),
        (2, "alpha beta"),   # exact dup of 1
        (3, "gamma delta"),
        (4, "alpha beta"),   # another dup
        (5, "epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src = str(tmp_path / "dedup_src")
    df.write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    for name, op in [
        ("dd_exact", lambda s: stream_dedup_exact(s, key_cols=["text"])),
        ("dd_fp", lambda s: stream_dedup_fingerprint(s)),
    ]:
        q = (
            op(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
            got = {r.text for r in spark.sql(f"SELECT * FROM {name}").collect()}
        finally:
            q.stop()
        assert got == {"alpha beta", "gamma delta", "epsilon"}
        # exactly one survivor per content group
        n = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
        assert n == 3


def test_streaming_dedup_watermarked(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import stream_dedup_exact
    from pyspark.sql import functions as F

    rows = [(i, "same content", f"2024-01-01 00:0{i}:00") for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts_s string").select(
        "doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts")
    )
    src = str(tmp_path / "dedup_wm_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = stream_dedup_exact(
        stream, key_cols=["text"], event_time_col="ts", within="10 minutes"
    )
    q = out.writeStream.outputMode("append").format("memory").queryName("dd_wm").start()
    try:
        q.processAllAvailable()
        n = spark.sql("SELECT count(*) AS n FROM dd_wm").collect()[0].n
    finally:
        q.stop()
    # all three arrive inside one watermark window -> one survivor
    assert n == 1


def test_stream_stream_attribution_matches_batch(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import attribution_join

    base = 1_700_000_000_000_000_000  # epoch ns
    m = 60_000_000_000  # one minute in ns
    imps = [(1, base), (1, base + 10 * m), (2, base), (3, base + 5 * m)]
    convs = [
        (1, base + 3 * m),    # joins imp@0 only
        (1, base + 12 * m),   # joins imp@0? no (>5m); joins imp@10m
        (2, base + 20 * m),   # outside window -> no pair
        (3, base + 5 * m),    # delay 0 pair
    ]
    imp_df = spark.createDataFrame(imps, "user_id long, ts long")
    conv_df = spark.createDataFrame(convs, "user_id long, ts long")

    expected = sorted(
        tuple(r)
        for r in attribution_join(imp_df, conv_df, within="5 minutes").collect()
    )
    assert len(expected) == 3
    delays = {(r[0], r[3]) for r in expected}
    assert delays == {(1, 180_000), (1, 120_000), (3, 0)}

    imp_src, conv_src = str(tmp_path / "imp"), str(tmp_path / "conv")
    imp_df.write.parquet(imp_src)
    conv_df.write.parquet(conv_src)
    imp_s = spark.readStream.schema(imp_df.schema).parquet(imp_src)
    conv_s = spark.readStream.schema(conv_df.schema).parquet(conv_src)
    out = attribution_join(imp_s, conv_s, within="5 minutes", watermark="1 hour")
    assert out.isStreaming
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("attrib")
        .start()
    )
    try:
        q.processAllAvailable()
        got = sorted(tuple(r) for r in spark.sql("SELECT * FROM attrib").collect())
    finally:
        q.stop()
    assert got == expected


def test_attribution_join_rejects_bad_ts_type(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import attribution_join

    df = spark.createDataFrame([(1, "x")], "user_id long, ts string")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="long-nanos or timestamp"):
        attribution_join(df, df)


def test_stream_to_parquet_sink(spark, tmp_path):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import stream_to_parquet

    df = spark.range(100).selectExpr("id", "id % 3 AS part")
    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_to_parquet(
        stream, out, checkpoint=ckpt, partition_by=["part"], trigger_once=True
    )
    q.awaitTermination(120)
    back = spark.read.parquet(out)
    assert back.count() == 100
    assert {r.part for r in back.select("part").distinct().collect()} == {0, 1, 2}
    # restart with the same checkpoint: no new data -> no duplicates
    q2 = stream_to_parquet(
        spark.readStream.schema(df.schema).parquet(src),
        out,
        checkpoint=ckpt,
        partition_by=["part"],
        trigger_once=True,
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 100


def test_stream_to_parquet_rejects_batch_df(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import stream_to_parquet

    import pytest as _pytest

    with _pytest.raises(ValueError, match="streaming"):
        stream_to_parquet(spark.range(1), "/tmp/x", checkpoint="/tmp/c")


def test_estimator_forwards_band_and_radius(spark):
    """KnnDtwClassifier exposes band / fastdtwRadius and they reach the
    kernel (predictions can differ between radius settings; band=-1 means
    unconstrained)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml.estimator import KnnDtwClassifier
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join

    rows_tr = [(i, [float((i * 7 + j * 3) % 11) for j in range(24)], "a" if i % 2 else "b")
               for i in range(12)]
    rows_te = [(100 + i, [float((i * 5 + j * 2) % 13) for j in range(24)], "a")
               for i in range(4)]
    tr = spark.createDataFrame(rows_tr, "series_id long, features array<double>, label string")
    te = spark.createDataFrame(rows_te, "series_id long, features array<double>, label string")
    m = KnnDtwClassifier(k=3, metric="fastdtw", fastdtwRadius=3).fit(tr)
    nb = m.neighbors(te)
    exp = knn_join(te, tr, metric="fastdtw", k=3, fastdtw_radius=3)
    got = sorted((r.test_id, r.train_id, round(r.distance, 9)) for r in nb.collect())
    want = sorted((r.test_id, r.train_id, round(r.distance, 9)) for r in exp.collect())
    assert got == want
    # banded dtw through the estimator == knn_join at the same band
    m2 = KnnDtwClassifier(k=2, metric="dtw", band=2).fit(tr)
    got2 = sorted((r.test_id, r.train_id, round(r.distance, 9))
                  for r in m2.neighbors(te).collect())
    want2 = sorted((r.test_id, r.train_id, round(r.distance, 9))
                   for r in knn_join(te, tr, metric="dtw", band=2, k=2).collect())
    assert got2 == want2
    assert m.transform(te).count() == 4


def test_model_save_load_roundtrip(spark, tmp_path):
    """save_model/load_model: the reloaded lazy learner predicts exactly
    what the original does, params included (non-default k/metric/band)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml.estimator import (
        KnnDtwClassifier,
        load_model,
        save_model,
    )

    rows_tr = [(i, [float((i * 3 + j) % 7) for j in range(12)], "a" if i % 3 else "b")
               for i in range(9)]
    rows_te = [(100 + i, [float((i + j * 2) % 5) for j in range(12)], "a") for i in range(3)]
    tr = spark.createDataFrame(rows_tr, "series_id long, features array<double>, label string")
    te = spark.createDataFrame(rows_te, "series_id long, features array<double>, label string")
    m = KnnDtwClassifier(k=3, metric="dtw", band=2).fit(tr)
    p = str(tmp_path / "knn_model")
    save_model(m, p)
    m2 = load_model(spark, p)
    assert m2.getOrDefault(m2.k) == 3 and m2.getOrDefault(m2.metric) == "dtw"
    assert m2.getOrDefault(m2.band) == 2
    a = sorted((r.series_id, r.predicted_label) for r in m.transform(te).collect())
    b = sorted((r.series_id, r.predicted_label) for r in m2.transform(te).collect())
    assert a == b
    # overwrite contract
    save_model(m, p, overwrite=True)
    import pytest as _pytest

    with _pytest.raises(Exception):
        save_model(m, p)  # no overwrite -> parquet write fails


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """The streaming HLL drain equals the batch registers bit-for-bit —
    the monotone-max state contract (streaming/sketch.py)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        hll_registers,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        stream_hll_registers,
    )

    df = spark.range(1, 3_001).selectExpr("id AS k")
    src = str(tmp_path / "hll_src")
    # several files so the stream processes multiple input splits
    df.repartition(4).write.parquet(src)

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_hll_registers(stream, "k")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r.b, r.m) for r in spark.sql("SELECT * FROM hll_regs").collect()
        }
    finally:
        q.stop()
    batch = {(r.b, r.m) for r in hll_registers(df, "k").collect()}
    assert streamed == batch


def test_stateless_scoring_matches_batch(spark, har_dfs):
    """score_stream_stateless (append-mode, zero state) must predict exactly
    what knn_classify / score_stream predict — the packed-broadcast top-k +
    vote expressions are the same ranking and tie orders."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import score_stream_stateless

    train_df, test_df = har_dfs
    for k in (1, 5):
        # batch DataFrames run through the same code path (no stream needed
        # for the semantics check; streaming legs below cover the sink)
        got = {
            r.test_id: r.predicted_label
            for r in score_stream_stateless(test_df, train_df, k=k).collect()
        }
        expect = {
            r.test_id: r.predicted_label
            for r in knn_classify(test_df, train_df, metric="euclidean", k=k).collect()
        }
        assert got == expect


def test_stateless_scoring_rejects_dtw(spark, har_dfs):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import score_stream_stateless

    train_df, test_df = har_dfs
    with pytest.raises(ValueError, match="expression metrics"):
        score_stream_stateless(test_df, train_df, metric="fastdtw")


def _wait_for_rows(spark, path, minimum, timeout=90.0):
    import time as _time

    t0 = _time.monotonic()
    while _time.monotonic() - t0 < timeout:
        try:
            if spark.read.parquet(path).count() >= minimum:
                return True
        except Exception:
            pass  # sink dir not created yet
        _time.sleep(0.2)
    return False


def test_streaming_kill_resume_exactly_once_dedup(spark, tmp_path):
    """The r4 restart soak (VERDICT r3 #7), dedup leg: a LIVE dedup->parquet
    query is killed mid-stream (source still growing), then resumed from
    the checkpoint. Exactly-once must hold end-to-end: the sink's commit
    log never duplicates a committed micro-batch, and the dropDuplicates
    STATE is restored — a duplicate arriving after the restart of content
    seen before the kill must still be dropped."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        stream_dedup_fingerprint,
        stream_to_parquet,
    )

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    def add_file(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    # phase 1: four files, one duplicate INSIDE the phase
    add_file([(0, "alpha"), (1, "beta")])
    add_file([(2, "gamma")])
    add_file([(3, "alpha")])  # in-phase dup: dropped by live state
    add_file([(4, "delta")])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_to_parquet(
        stream_dedup_fingerprint(stream), out, checkpoint=ckpt,
        query_name="soak_dedup_1",
    )
    try:
        assert _wait_for_rows(spark, out, 1), "no batch committed before the kill"
    finally:
        q.stop()  # kill mid-stream: phase-2 files don't exist yet
    committed_before = spark.read.parquet(out).count()
    assert committed_before >= 1

    # phase 2: more files — a CROSS-KILL duplicate ("alpha" again) and a
    # phase-2-internal duplicate
    add_file([(5, "epsilon"), (6, "alpha")])  # alpha seen before the kill
    add_file([(7, "zeta"), (8, "epsilon")])   # in-phase dup

    q2 = stream_to_parquet(
        stream_dedup_fingerprint(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        ),
        out,
        checkpoint=ckpt,
        trigger_once=True,  # drain everything outstanding, then stop
        query_name="soak_dedup_2",
    )
    q2.awaitTermination(180)

    back = spark.read.parquet(out)
    texts = [r.text for r in back.collect()]
    # exactly-once: one row per distinct content, nothing duplicated by the
    # restart, nothing lost
    assert sorted(texts) == ["alpha", "beta", "delta", "epsilon", "gamma", "zeta"]


def test_streaming_kill_resume_exactly_once_scoring(spark, har_dfs, tmp_path):
    """Restart soak, scoring leg: stateless append-mode scoring through the
    exactly-once file sink, killed while the source is still growing and
    resumed from the checkpoint. Every test row is scored EXACTLY once and
    predictions equal the batch classifier's."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        score_stream_stateless,
        stream_to_parquet,
    )

    train_df, test_df = har_dfs
    rows = test_df.limit(10).collect()
    schema = test_df.schema
    src = str(tmp_path / "ssrc")
    out = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")

    def add_file(batch):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)

    for i in range(0, 6, 2):  # phase 1: rows 0..5 in three files
        add_file(rows[i : i + 2])

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_to_parquet(
        score_stream_stateless(stream, train_df, k=3), out, checkpoint=ckpt,
        query_name="soak_score_1",
    )
    try:
        assert _wait_for_rows(spark, out, 1), "no batch committed before the kill"
    finally:
        q.stop()

    for i in range(6, 10, 2):  # phase 2: rows 6..9
        add_file(rows[i : i + 2])

    q2 = stream_to_parquet(
        score_stream_stateless(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
            train_df,
            k=3,
        ),
        out,
        checkpoint=ckpt,
        trigger_once=True,
        query_name="soak_score_2",
    )
    q2.awaitTermination(180)

    got = spark.read.parquet(out).collect()
    assert len(got) == 10  # exactly once per test row — no dupes, no losses
    got_map = {r.test_id: r.predicted_label for r in got}
    expect = {
        r.test_id: r.predicted_label
        for r in knn_classify(
            spark.createDataFrame(rows, schema), train_df, metric="euclidean", k=3
        ).collect()
    }
    assert got_map == expect


@pytest.fixture()
def bm25_docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog chased the cat"),
        (3, "dogs and cats living together"),
        (4, "a completely unrelated document about spark sql engines"),
        (5, "cat cat cat repetition heavy cat"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_stream_bm25_batch_twin_matches_bm25_topk(spark, bm25_docs):
    """score_stream_bm25's projection applied to a BATCH frame reproduces
    bm25_topk's scores bit-for-bit on the index's own corpus."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import bm25_topk
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        bm25_query_index,
        score_stream_bm25,
    )

    qs = spark.createDataFrame(
        [(10, "the cat"), (11, "spark engines"), (12, "zebra unseen")],
        "query_id long, query_text string",
    )
    idx = bm25_query_index(bm25_docs, qs)
    got = {
        (r.query_id, r.doc_id): r.score
        for r in score_stream_bm25(bm25_docs, idx).collect()
    }
    want = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(bm25_docs, qs, k=10).collect()
    }
    assert got == want  # exact float equality: identical IEEE trees
    # the all-unseen-terms query matches nothing
    assert not [k for k in got if k[0] == 12]


def test_stream_bm25_append_mode_file_stream(spark, bm25_docs, tmp_path):
    """End-to-end: standing queries score a parquet file stream in APPEND
    mode (stateless — no watermark, no state store), and an unseen term
    arriving in the stream scores with df=0 (maximally rare)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        bm25_query_index,
        score_stream_bm25,
    )

    qs = spark.createDataFrame(
        [(10, "the cat"), (12, "zebra")], "query_id long, query_text string"
    )
    idx = bm25_query_index(bm25_docs, qs)

    new_docs = spark.createDataFrame(
        [(100, "a zebra escaped the zoo"), (101, "nothing relevant here")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "bm25_stream_src")
    new_docs.write.parquet(src)
    stream = spark.readStream.schema(new_docs.schema).parquet(src)
    out = score_stream_bm25(stream, idx)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("bm25_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM bm25_stream").collect()
    finally:
        q.stop()
    got = {(r.query_id, r.doc_id): r.score for r in rows}
    # doc 100 matches query 10 ("the") and query 12 (unseen "zebra", df=0)
    assert (10, 100) in got and (12, 100) in got
    # df=0 idf = (N + 0.5)/0.5 + 1 = 12: unseen term dominates
    assert got[(12, 100)] > got[(10, 100)]
    # doc 101 shares no term with any query
    assert not [k for k in got if k[1] == 101]


def test_stream_quality_batch_twin_matches_batch_scorer(spark):
    """score_stream_quality on a BATCH frame reproduces
    doc_quality_features + score_with_weights bit-for-bit."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        doc_quality_features,
        score_with_weights,
        train_quality_perceptron,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import score_stream_quality
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, ("the quick value row " * (i + 1)).strip()) for i in range(20)],
        "doc_id long, text string",
    )
    labeled = doc_quality_features(docs).join(
        docs.select(
            "doc_id",
            F.when(F.length("text") > 60, 1).otherwise(-1).alias("y"),
        ),
        "doc_id",
    )
    w = train_quality_perceptron(labeled, epochs=3)
    want = {
        r.doc_id: (r.score, r.kept)
        for r in score_with_weights(labeled, w).collect()
    }
    got = {
        r.doc_id: (r.score, r.kept)
        for r in score_stream_quality(docs, w).collect()
    }
    assert got == want


def test_stream_quality_append_mode_file_stream(spark, tmp_path):
    """The standing quality filter scores a parquet file stream in APPEND
    mode — stateless, no watermark, no state store."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import score_stream_quality

    w = spark.createDataFrame(
        [(0, 10), (1, 3), (2, 0), (3, 0), (4, 0)], "dim int, weight bigint"
    )
    new_docs = spark.createDataFrame(
        [(100, " ".join(["tok"] * 60)), (101, "x")],
        "doc_id long, text string",
    )
    src = str(tmp_path / "quality_stream_src")
    new_docs.write.parquet(src)
    stream = spark.readStream.schema(new_docs.schema).parquet(src)
    q = (
        score_stream_quality(stream, w)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("quality_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM quality_stream").collect()
    finally:
        q.stop()
    got = {r.doc_id: (r.score, r.kept) for r in rows}
    # w = [10, 3, 0, 0, 0]: score = 10 + 3*(n_tokens - 53)
    assert got[100] == (10 + 3 * (60 - 53), True)
    assert got[101] == (10 + 3 * (1 - 53), False)


def test_estimator_k1_kernel_strategy(spark, har_dfs):
    """r5 review fix: k=1 with strategy='kernel' used to crash in
    knn_predict_1nn's strategy guard; it now routes through
    knn_classify(k=1), whose top-1 tie order equals min_by's."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml import KnnDtwClassifier

    train_df, test_df = har_dfs
    preds = {}
    for strat in ("broadcast", "kernel"):
        m = (
            KnnDtwClassifier(k=1, metric="euclidean", strategy=strat)
            .fit(train_df)
        )
        preds[strat] = {
            (r.series_id, r.predicted_label)
            for r in m.transform(test_df).collect()
        }
    assert preds["kernel"] == preds["broadcast"]


def test_stream_drift_monitor_matches_batch(spark, tmp_path):
    """stream_drift_monitor (r6): live stream (complete mode) ==
    batch twin EXACTLY; reference-like days sit near 0 drift, the
    planted regime shift scores high."""
    import datetime as dt

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        stream_drift_monitor,
        value_histogram,
    )

    rows = []
    base = dt.datetime(2024, 3, 1)
    eid = 0
    for day in range(10):
        for j in range(40):
            # days 0-4: values 5..45 (bins 0-1); days 5-9: 300+ (bin 12+)
            v = 5.0 + j if day < 5 else 300.0 + j
            rows.append((eid, base + dt.timedelta(days=day, minutes=j), v))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    src = str(tmp_path / "drift_src")
    df.write.parquet(src)

    cutoff = base + dt.timedelta(days=5)
    ref = value_histogram(df.filter(F.col("ts") < F.lit(cutoff)))
    batch = sorted(
        tuple(r) for r in stream_drift_monitor(df, ref, window="1 day").collect()
    )

    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        stream_drift_monitor(stream, ref, window="1 day")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("drift_live")
        .start()
    )
    try:
        q.processAllAvailable()
        live = sorted(
            tuple(r) for r in spark.sql("SELECT * FROM drift_live").collect()
        )
    finally:
        q.stop()
    assert live == batch  # bit parity, including drift_stat doubles

    by_day = {r[0].day: r[3] for r in batch}
    assert all(by_day[d] < 0.05 for d in range(1, 6))   # March 1-5: like ref
    assert all(by_day[d] > 0.5 for d in range(6, 11))   # March 6-10: shifted


def test_streaming_kill_resume_drift_monitor(spark, tmp_path):
    """r7 (VERDICT r6 #7): the drift monitor under the kill/resume soak
    the scoring and dedup pipelines already carry. A LIVE append-mode
    drift->parquet query is killed mid-stream (source still growing),
    then resumed from the checkpoint with availableNow. Exactly-once
    must hold: no window is emitted twice across the restart, and every
    emitted row — including a day whose events SPAN the kill — is
    bitwise identical to the batch twin (watermark + window state
    restored, not recomputed from the partial stream)."""
    import datetime as dt

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        stream_drift_monitor,
        stream_to_parquet,
        value_histogram,
    )

    base = dt.datetime(2024, 3, 1)
    schema = "event_id long, ts timestamp, value double"

    def day_rows(day, js, eid0):
        # days 0-4 reference-like (bins 0-1), later days shifted (bin 12+)
        return [
            (eid0 + j, base + dt.timedelta(days=day, minutes=j),
             (5.0 + j) if day < 5 else (300.0 + j))
            for j in js
        ]

    all_rows = []
    src = str(tmp_path / "drift_src")
    out = str(tmp_path / "drift_out")
    ckpt = str(tmp_path / "drift_ckpt")

    def add_file(rows):
        all_rows.extend(rows)
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    # phase 1: days 0-2 whole, day 3 FIRST HALF (the span-the-kill day)
    add_file(day_rows(0, range(40), 0))
    add_file(day_rows(1, range(40), 100))
    add_file(day_rows(2, range(40), 200))
    add_file(day_rows(3, range(20), 300))

    ref_df = spark.createDataFrame(day_rows(0, range(40), 90000), schema)
    ref = value_histogram(ref_df)

    def monitored(stream):
        return stream_drift_monitor(
            stream, ref, window="1 day", watermark="1 minute"
        )

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = stream_to_parquet(
        monitored(stream), out, checkpoint=ckpt, query_name="soak_drift_1"
    )
    try:
        assert _wait_for_rows(spark, out, 1), "no window committed before the kill"
    finally:
        q.stop()  # kill mid-stream: phase-2 files don't exist yet
    before = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert len(before) >= 1

    # phase 2: day 3 SECOND HALF, days 4-6, and a day-9 sentinel that
    # advances the watermark far enough to close everything through day 6
    add_file(day_rows(3, range(20, 40), 320))
    add_file(day_rows(4, range(40), 400))
    add_file(day_rows(5, range(40), 500))
    add_file(day_rows(6, range(40), 600))
    add_file(day_rows(9, range(40), 900))

    q2 = stream_to_parquet(
        monitored(
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        ),
        out,
        checkpoint=ckpt,
        trigger_once=True,
        query_name="soak_drift_2",
    )
    q2.awaitTermination(180)

    got = [tuple(r) for r in spark.read.parquet(out).collect()]
    # exactly-once: no window emitted twice across the restart
    starts = [g[0] for g in got]
    assert len(starts) == len(set(starts)), got
    # bit parity with the batch twin on every emitted window — the
    # span-the-kill day 3 proves restored aggregation state (its window
    # must hold ALL 40 events, half ingested before the kill)
    batch_df = spark.createDataFrame(all_rows, schema)
    twin = {tuple(r) for r in monitored(batch_df).collect()}
    assert set(got) <= twin, set(got) - twin
    by_day = {g[0].day: g for g in got}
    assert set(by_day) >= {1, 2, 3, 4, 5, 6, 7}, sorted(by_day)
    # the span-the-kill day: window starting Mar 4 (= day index 3) must
    # hold all 40 events even though only 20 were ingested before the kill
    assert by_day[4][2] == 40, by_day[4]


def test_stateless_scoring_edit_metrics_match_batch(spark):
    """r7: the edit-distance family's nested-fold DPs are pure Catalyst
    expressions, so score_stream_stateless accepts them inside the
    candidate-transform lambda — predictions must equal knn_classify for
    every metric (same ranking and tie orders; symmetric metrics, so the
    packed (train, stream) argument order changes nothing)."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        score_stream_stateless,
    )

    rng = np.random.default_rng(5)

    def mk(n, off):
        return [
            (off + i, [float(x) for x in rng.uniform(0, 100, 12)], f"c{i % 3}")
            for i in range(n)
        ]

    schema = "series_id long, features array<double>, label string"
    train = spark.createDataFrame(mk(30, 0), schema)
    test = spark.createDataFrame(mk(10, 100), schema)
    for m in ("lcss", "edr", "erp", "twed", "msm"):
        got = {
            r.test_id: r.predicted_label
            for r in score_stream_stateless(test, train, metric=m, k=3).collect()
        }
        exp = {
            r.test_id: r.predicted_label
            for r in knn_classify(test, train, metric=m, k=3).collect()
        }
        assert got == exp, m


def test_vector_boundary_composes_with_stock_mllib(spark, har_dfs):
    """VERDICT r7 #6: the M1 MLlib vector boundary must actually exist and
    interop with real pyspark.ml stages — KnnDtwClassifier output composes
    with a stock StandardScaler via to_vector, and from_vector round-trips
    back to the engine's native array<double> bit-exactly. assemble_vector
    is the expression twin of the reference's VectorAssembler
    (Team11-Project.py:107-110)."""
    from pyspark.ml.feature import StandardScaler
    from pyspark.ml.linalg import DenseVector
    from pyspark.sql import functions as F

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml import (
        assemble_vector,
        from_vector,
        to_vector,
    )

    train_df, test_df = har_dfs
    model = KnnDtwClassifier(k=3, metric="euclidean").fit(train_df)
    preds = model.transform(test_df)

    # KNN output -> vector -> stock MLlib stage
    vec = preds.withColumn("fvec", to_vector(F.col("features")))
    assert str(vec.schema["fvec"].dataType).startswith("VectorUDT")
    scaler = StandardScaler(inputCol="fvec", outputCol="scaled", withMean=True)
    scaled = scaler.fit(vec).transform(vec)
    assert scaled.count() == test_df.count()
    assert "predicted_label" in scaled.columns  # KNN output survived the stage

    # from_vector round-trip is bit-exact back to array<double>
    rt = vec.select(
        "features", from_vector(F.col("fvec")).alias("back")
    ).collect()
    for r in rt:
        assert list(r.features) == list(r.back)

    # assemble_vector == VectorAssembler semantics on scalar columns
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], "x double, y double, z double")
    got = df.select(assemble_vector(F.col("x"), F.col("y"), F.col("z")).alias("v")).collect()[0].v
    assert got == DenseVector([1.0, 2.0, 3.0])

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
