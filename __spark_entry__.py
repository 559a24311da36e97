"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  -> flagship 1-NN/k-NN FastDTW classification on sf0.001.
queries()     -> one callable per implemented operator (SURVEY.md §2).
oracle_sql()  -> DuckDB twins for every SQL-expressible query.

Determinism discipline (so order-insensitive value hashes match):
- float sums use exact integer-cents arithmetic: sum(cast(round(x*100) as
  bigint)) — identical in both engines regardless of summation order;
- per-row float folds (distances) are left-associative elementwise folds in
  BOTH engines (Spark ``aggregate``/``zip_with`` vs DuckDB ``list_reduce``/
  ``list_transform``) — bit-identical IEEE op order;
- every ranking carries a total-order tie-break (…, label, id);
- events.ts is timestamp[us] in the driver parquet (verified r2); temporal
  queries normalize it to epoch-microsecond longs via ``_ts_us`` which
  branches on the ACTUAL dtype (bigint nanos from a nanosAsLong read vs
  timestamp/timestamp_ntz), matching DuckDB's ``epoch_us(ts)`` exactly
  under the UTC session timezone.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import (
    HASH_BASE,
    HASH_P,
    LANG_MARKERS,
    MINHASH_A,
    MINHASH_B,
    STOPWORDS,
    char_hash,
    lang_id,
    normalize_text,
    quality_score,
    stopword_ratio,
    token_count,
    word_tokens,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import tokens as tokens_fn
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions import paa, series_features, znorm
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.arrays import resample_linear
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.edit_distance import (
    EDR_EPS,
    ERP_GAP,
    LCSS_EPS,
    TWED_LAM,
    TWED_NU,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    accuracy,
    k_sweep,
    ann_brute_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    dedup_components,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_pairwise_jaccard,
    knn_classify,
    knn_join,
    knn_join_lb,
    knn_join_pruned,
    knn_predict_1nn,
    majority_vote,
    simhash,
    asof_join,
    interval_join,
    resample_ffill,
    hash_sample,
    kmv_distinct,
    random_project,
    repetition_stats,
    stratified_sample,
    tfidf_topk,
    chunk_documents,
    decontaminate,
    pack_sequences,
    profile_table,
    salted_join,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import dedup_incremental
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import (
    bloom_semi_join,
    histogram,
    mixture_sample,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
    events_to_series,
    load_table,
    parse_series_text,
    split_train_test,
)

SERIES_LEN = 16


def _prep(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the driver's plain session defaults to 200 shuffle partitions — at
    # sf0.01 that is 200 near-empty tasks per exchange; size to the box
    spark.conf.set(
        "spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_CPUS", "32")
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _prep(spark)
    return load_table(spark, sf_dir, name)


def _ts_us(df: DataFrame, col: str = "ts"):
    """Epoch-microseconds (long) from an event-time column, whatever its
    physical dtype: bigint (a timestamp[ns] parquet read under
    ``nanosAsLong``) -> integer DIV 1000; timestamp / timestamp_ntz (the
    driver testdata's timestamp[us]) -> unix_micros under the UTC session
    timezone. Both match DuckDB's ``epoch_us(ts)`` exactly."""
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        return F.expr(f"{col} DIV 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def _series(spark: SparkSession, sf_dir: str):
    events = _t(spark, sf_dir, "events")
    series = events_to_series(events, length=SERIES_LEN)
    return split_train_test(series)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: classify event-series by k-NN FastDTW (reference Model 1
    semantics: crossJoin + distance + top-k + vote; Team11-Project.py:368-381)
    on sf0.001."""
    train, test = _series(spark, "/root/testdata/sf0.001")
    return knn_classify(test, train, metric="fastdtw", k=3)


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q01_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape (A1/A2 aggregates) with exact-cents arithmetic."""
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c * 100).cast("long")
    e4 = lambda c: F.round(c * 10000).cast("long")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1999-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(e4(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("sum_disc_e4"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q02_filter_project(spark, sf_dir):
    """Predicate + projection pushed to the parquet scan (P1/P6)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") > 45)
    ).select("l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("qty"))


def _q03_join_enrich(spark, sf_dir):
    """Equi-join chain (J1): orders -> customer -> nation, exact-cents rollup."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
        )
    )


def _q04_topk_per_group(spark, sf_dir):
    """Window top-k (K1): top-3 orders per customer by price, total tie order."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank")
    )


def _q05_min_by(spark, sf_dir):
    """min_by aggregate (A6): cheapest order per customer, deterministic ties."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.min_by(F.col("o_orderkey"), F.struct("o_totalprice", "o_orderkey")).alias("cheapest_orderkey"),
        F.round(F.min("o_totalprice") * 100).cast("long").alias("min_cents"),
    )


def _q06_mode_vote(spark, sf_dir):
    """Majority vote (A5) through the engine operator: modal order priority per
    customer; Counter-compatible tie-break via per-customer recency rank."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    neighbors = o.withColumn("rank", F.row_number().over(w))
    return majority_vote(neighbors, key="o_custkey", label="o_orderpriority")


def _q07_parse_series(spark, sf_dir):
    """Text-series ingest (F1-F4/P8/U1 replacement) on messy literal rows."""
    rows = [
        (1, " 0.5 -1.25  3.0 "),
        (2, "1 2   3"),
        (3, "  7.5"),
        (4, "10 20 30 40"),
    ]
    df = spark.createDataFrame(rows, "id int, value string")
    parsed = parse_series_text(df)
    return parsed.select(
        "id",
        F.size("features").alias("n_points"),
        F.element_at("features", 1).alias("first_v"),
        F.element_at("features", -1).alias("last_v"),
        F.aggregate("features", F.lit(0.0), lambda a, v: a + v).alias("total"),
    )


def _q08_series_build(spark, sf_dir):
    """events -> per-key ordered series (S-bridge; SURVEY §1.1) summary."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    return s.select(
        "series_id",
        F.size("features").alias("n_points"),
        F.element_at("features", 1).alias("first_v"),
        F.element_at("features", -1).alias("last_v"),
        "label",
    )


def _q09_knn_pairs(spark, sf_dir):
    """The core similarity join (J2/J3 + K1): euclidean top-5 neighbor ranks."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="euclidean", k=5, strategy="broadcast")
    return nn.select("test_id", "train_id", "rank")


def _q10_knn_classify(spark, sf_dir):
    """Full reference pipeline (M2): crossJoin -> distance -> top-k -> vote."""
    train, test = _series(spark, sf_dir)
    return knn_classify(test, train, metric="euclidean", k=5)


def _q11_knn_1nn(spark, sf_dir):
    """Model-2 fast path (A6): 1-NN via min_by, no window."""
    train, test = _series(spark, sf_dir)
    p = knn_predict_1nn(test, train, metric="euclidean")
    return p.select("test_id", "predicted_label", F.round("distance", 6).alias("distance"))


def _q12_knn_accuracy(spark, sf_dir):
    """Accuracy eval (A7, id-keyed J1 — not the reference's fragile
    vector-equality join J4)."""
    train, test = _series(spark, sf_dir)
    pred = knn_classify(test, train, metric="euclidean", k=5)
    return accuracy(pred, test.withColumnRenamed("series_id", "test_id"), key="test_id")


def _q13_knn_dtw(spark, sf_dir):
    """FastDTW classification (U2 pandas_udf path) — FAITHFUL FastDTW
    (Salvador & Chan 2007 recursive coarsening, fastdtw(radius=1) defaults,
    Team11-Project.py:339-341) via the batched kernel
    functions/dtw_kernel.py::fastdtw_batch; pinned to fastdtw_pair semantics
    in tests/test_dtw_kernel.py::test_fastdtw_batch_matches_pair, and the
    fixed-band stand-in's divergence from it is quantified in
    test_banded_vs_faithful_divergence. ORACLE (r6): the multi-resolution
    recursion IS SQL-expressible over the fixed 16-point series — the
    DuckDB twin replays the full algorithm (coarsen -> coarse DP ->
    path backtrack -> radius-1 window expansion -> windowed DP, unrolled
    over the [16, 8, 4, 2] level chain; see _fdtw_dist_sql) with bit-exact
    distances (natural-recurrence op order, one IEEE add per cell), so the
    driver's rows+schema+hash gate applies in full."""
    train, test = _series(spark, sf_dir)
    return knn_classify(test, train, metric="fastdtw", k=5)


def _q14_set_ops(spark, sf_dir):
    """Set operations (§2.6): union / intersect / except on order keys."""
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000).select("o_orderkey")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    return spark.createDataFrame(
        [(0,)], "dummy int"
    ).select(
        F.lit(hi.union(urgent).distinct().count()).alias("n_union"),
        F.lit(hi.intersect(urgent).count()).alias("n_intersect"),
        F.lit(hi.subtract(urgent).count()).alias("n_except"),
    )


def _q15_conditional(spark, sf_dir):
    """Conditional projection (P5 when/otherwise) + rollup counts."""
    o = _t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return o.groupBy(bucket.alias("price_bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
    )


def _q16_dedup_exact(spark, sf_dir):
    """Exact dedup (hash-groupBy; keep min id per content group)."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_exact(docs)


def _q17_dedup_jaccard(spark, sf_dir):
    """Exhaustive n-gram-Jaccard near-dup pairs (oracle-grade quadratic path;
    restricted to doc_id < 300 to bound the O(N^2))."""
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return dedup_pairwise_jaccard(docs, threshold=0.5)


def _q18_dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup pairs (the scale path): shingle -> minhash ->
    band buckets -> bucket join -> exact-jaccard verify. hash_mode='kernel'
    is the Arrow-batched twin of the portable hash spec — bit-identical
    values (test_pipeline_ops::test_kernel_matches_expression_lsh), so the
    DuckDB oracle still mirrors it exactly."""
    docs = _t(spark, sf_dir, "documents")
    return dedup_minhash_lsh(docs, threshold=0.5, max_bucket_size=64, hash_mode="kernel")


def _q19_simhash(spark, sf_dir):
    """Per-document SimHash signatures (token-hash bit voting). Kernel mode:
    doc-local Arrow kernel, zero shuffle, integers identical to the
    explode->groupBy expression plan the oracle mirrors
    (test_pipeline_ops::test_simhash_kernel_matches_expr)."""
    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, mode="kernel")


def _q20_text_stats(spark, sf_dir):
    """Token counting + document fingerprint (rolling char hash)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_m"),
        char_hash(F.col("text")).alias("fingerprint"),
    )


def _q21_lang_id(spark, sf_dir):
    """Marker-word language-ID heuristic + agreement with the labeled lang."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id(F.col("text")).alias("lang_pred"),
        (lang_id(F.col("text")) == F.col("lang")).cast("int").alias("agrees"),
    )


def _q22_quality(spark, sf_dir):
    """Quality scoring (length/stopword/punct ratio blend)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(quality_score(F.col("text")), 6).alias("quality"),
        F.round(stopword_ratio(F.col("text")), 6).alias("stop_ratio"),
    )


def _q23_ann_cosine(spark, sf_dir):
    """Brute-force cosine top-k over the embedding column (similarity-search
    baseline; generalized KNN core)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_brute_topk(q, emb, k=5, strategy="kernel")


def _q24_ann_lsh(spark, sf_dir):
    """Hyperplane-LSH approximate cosine top-k (the scale path; deterministic
    hash-derived planes so even the approximation is oracle-checkable)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_lsh_topk(q, emb, k=5)


def _q25_knn_pruned(spark, sf_dir):
    """Two-phase pruned KNN (PAA sketch candidates -> exact rerank): the
    100 TB scale path for the similarity join. Euclidean metric so both
    phases are SQL-expressible and the oracle mirrors them exactly."""
    train, test = _series(spark, sf_dir)
    nn = knn_join_pruned(
        test,
        train,
        metric="euclidean",
        k=5,
        length=SERIES_LEN,
        paa_segments=4,
        candidates_per_test=20,
    )
    return nn.select("test_id", "train_id", "rank")


def _q26_vector_equality_join(spark, sf_dir):
    """The reference's J4 accuracy join, faithfully: predictions keyed by the
    whole feature VECTOR, joined back to the test set on array equality, with
    the abs-diff==0 correctness predicate (Team11-Project.py:218-225). Kept
    for parity; q12 is the id-keyed fix (SURVEY.md §2.3 J4 design note)."""
    train, test = _series_numeric(spark, sf_dir)
    nn = knn_join(test, train, metric="euclidean", k=1, keep_features=True)
    preds = nn.select(
        F.col("test_features").alias("Test_point"),
        F.col("train_label").alias("Predicted_label"),
    )
    joined = preds.join(test, preds["Test_point"] == test["features"], "inner")
    joined = joined.withColumn("abs_diff", F.abs(F.col("Predicted_label") - F.col("label")))
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("abs_diff") == 0).cast("long")).alias("n_correct"),
    )


def _series_numeric(spark, sf_dir):
    """Series with a numeric label (series_id % 6), for the reference's
    float-label arithmetic paths (abs-diff accuracy, F5)."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN, label_from=None).withColumn(
        "label", (F.col("series_id") % 6).cast("double")
    )
    return split_train_test(s)


def _q27_dense_row_ids(spark, sf_dir):
    """W1: dense row_number ids — the reference minted them over a
    constant-key global window (single-partition hazard, Team11-Project.py:
    93-97); here the window orders by a real key so the result is
    deterministic AND the hazard is explicit in the plan."""
    c = _t(spark, sf_dir, "customer")
    w = Window.orderBy(F.asc("c_custkey"))
    return c.select("c_custkey").withColumn(
        "row_id", F.row_number().over(w).cast("long")
    )


def _q28_k_sweep(spark, sf_dir):
    """The reference's k-hyperparameter validation loop (five separate
    full-cross-product cluster runs, Team11-Project.py:237-322) as ONE query
    over a shared neighbor table."""
    train, test = _series(spark, sf_dir)
    return k_sweep(test, train, ks=[1, 3, 5], metric="euclidean")


def _q29_rollup(spark, sf_dir):
    """Grouping sets / rollup (SURVEY §2.4 'absent' — free via Catalyst):
    rollup over (returnflag, linestatus) with exact-cents sums."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_cents"),
        )
    )


def _q30_pivot(spark, sf_dir):
    """Pivot (absent category): order counts per priority pivoted by status."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    # pivot yields null for empty cells; the SQL mirror (count FILTER) yields 0
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ("F", "O", "P")],
    )


def _q31_semi_anti(spark, sf_dir):
    """Semi/anti joins (absent category): customers with vs without orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    semi = c.join(o, "c_custkey", "left_semi").select("c_custkey")
    anti = c.join(o, "c_custkey", "left_anti").select("c_custkey")
    return semi.withColumn("has_orders", F.lit(1)).unionByName(
        anti.withColumn("has_orders", F.lit(0))
    )


def _q32_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events table (batch twin of the
    streaming session_window path) — expressed with lag + cumulative gap
    count so the SQL oracle mirrors it exactly."""
    e = _t(spark, sf_dir, "events")
    # DuckDB's parquet reader truncates the ns timestamps to us — compare and
    # output in microseconds on both sides
    gap_us = 2 * 3600 * 1_000_000  # 2 hours
    e = e.select("user_id", _ts_us(e).alias("ts_us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = e.withColumn(
        "_new",
        (F.col("ts_us") - F.lag("ts_us").over(w) > gap_us).cast("int"),
    )
    flagged = flagged.withColumn(
        "session_no",
        F.sum(F.coalesce(F.col("_new"), F.lit(1))).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return flagged.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("session_start_us"),
        F.max("ts_us").alias("session_end_us"),
    )


def _q33_tumbling_window(spark, sf_dir):
    """Tumbling time-window aggregation (batch twin of streaming windows):
    1-day buckets via integer epoch arithmetic on the nano timestamps —
    engine-portable, no timezone surface."""
    e = _t(spark, sf_dir, "events")
    day_us = 86400 * 1_000_000
    # floor explicitly: Spark's long cast truncates while DuckDB's rounds
    bucket = F.floor(_ts_us(e) / day_us).cast("long")
    return e.groupBy(bucket.alias("day_bucket"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.round(F.col("value") * 100).cast("long")) / 100.0, 2).alias("sum_value"),
    )


def _q37_running_windows(spark, sf_dir):
    """Running/sliding window aggregates (cumulative sum, lag, 3-row moving
    average) per customer in (o_orderdate, o_orderkey) total order — integer
    cents keep every sum exact; the moving average divides two exact
    integers so the double matches bit-wise cross-engine."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    w3 = w.rowsBetween(-2, 0)
    d = o.select("o_custkey", "o_orderkey", "o_orderdate", cents.alias("_c"))
    return d.select(
        "o_custkey",
        "o_orderkey",
        F.sum("_c").over(wc).alias("run_cents"),
        F.lag("_c").over(w).alias("prev_cents"),
        (
            F.sum("_c").over(w3).cast("double") / F.count(F.lit(1)).over(w3)
        ).alias("avg3"),
    )


def _q38_date_parts(spark, sf_dir):
    """Date/time scalar functions (SURVEY §2.7 family): extract parts,
    truncate to month, day-difference arithmetic — outputs as ints/longs so
    cross-engine timestamp formatting never reaches the hash."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.datediff(
            F.lit("1998-12-31").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("days_to_end"),
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias("month_start_epoch"),
    )


def _q39_json_extract(spark, sf_dir):
    """JSON scalar functions on an embedded payload column (engine surface
    for semi-structured ingest): path extraction, typed cast, array index."""
    rows = [
        (1, '{"user": {"id": 7, "name": "ada"}, "tags": ["x", "y"], "score": 3.5}'),
        (2, '{"user": {"id": 9, "name": "bob"}, "tags": [], "score": 1.25}'),
        (3, '{"user": {"id": 11}, "tags": ["z"]}'),
        (4, "not json at all"),
    ]
    df = spark.createDataFrame(rows, "id int, payload string")
    return df.select(
        "id",
        F.get_json_object("payload", "$.user.id").cast("long").alias("user_id"),
        F.get_json_object("payload", "$.user.name").alias("user_name"),
        F.get_json_object("payload", "$.tags[0]").alias("first_tag"),
        F.get_json_object("payload", "$.score").cast("double").alias("score"),
    )


def _media_rows() -> list[tuple[int, str, int, int]]:
    """Deterministic printable-ASCII media payloads (no RNG: byte streams
    must be reproducible as SQL literals for the oracle)."""
    rows = []
    for i in range(24):
        s = "".join(chr(32 + (i * 7 + j * 3) % 95) for j in range(48))
        rows.append((i, s, 64 + i % 5, 48))
    return rows


def _q40_multimodal_features(spark, sf_dir):
    """Multimodal decode plumbing end-to-end: binary payload -> mapInPandas
    feature extraction. The stubbed decode is sha256-derived (deterministic),
    and DuckDB has the same sha256 — so even this Python-kernel path gets an
    EXACT oracle (features are u4-LE words of the digest / 2^32; all doubles
    exact, no rounding anywhere)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
    )

    data = [
        (i, bytearray(s, "ascii"), ("image", w, h, 0))
        for i, s, w, h in _media_rows()
    ]
    df = spark.createDataFrame(data, MEDIA_SCHEMA)
    feats = decode_image_features(df, n_features=8)
    return feats.select(
        "media_id",
        "width",
        "height",
        "mean_luma",
        *[F.element_at("feature", k + 1).alias(f"f{k}") for k in range(8)],
    )


def _sql_multimodal() -> str:
    """Oracle for q40: sha256 hex -> little-endian u4 words -> /2^32,
    mirroring operators/multimodal.py::_fake_decode exactly."""

    def dv(pos: int) -> str:
        return f"(strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1)"

    def byte(j: int) -> str:
        return f"(16 * {dv(2 * j + 1)} + {dv(2 * j + 2)})"

    def u4(k: int) -> str:
        return " + ".join(f"{byte(4 * k + j)} * {256 ** j}" for j in range(4))

    feats = ", ".join(
        f"cast({u4(k)} AS double) / 4294967296.0 AS f{k}" for k in range(8)
    )
    mean = "(" + " + ".join(f"f{k}" for k in range(8)) + ") / 8.0"
    values = ",\n                ".join(
        "({}, '{}', {}, {})".format(i, s.replace("'", "''"), w, h)
        for i, s, w, h in _media_rows()
    )
    return f"""
        WITH m(media_id, payload, width, height) AS (VALUES
                {values}
        ),
        h AS (
            SELECT media_id, width, height, sha256(payload) AS hx FROM m
        ),
        f AS (
            SELECT media_id, width, height, {feats} FROM h
        )
        SELECT media_id, cast(width AS int) AS width,
               cast(height AS int) AS height, {mean} AS mean_luma,
               {", ".join(f"f{k}" for k in range(8))}
        FROM f
    """


def _q41_frame_sampling(spark, sf_dir):
    """Video frame-sampling fan-out (every 10th frame index per media row
    with frames) — the explode-over-metadata plumbing of the multimodal
    pipeline, minus the stubbed byte extraction."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    data = [
        (i, bytearray(s, "ascii"), ("video" if i % 3 == 0 else "image", w, h, (i % 3 == 0) * (20 + i)))
        for i, s, w, h in _media_rows()
    ]
    df = spark.createDataFrame(data, MEDIA_SCHEMA)
    return sample_frames(df, every_n=10).select("media_id", "frame_index")


def _q42_asof_join(spark, sf_dir):
    """As-of join (backward, inclusive): each click event attaches the most
    recent at-or-before purchase of the same user. Union-sort plan — ONE
    shuffle on user_id, no join node at all (SURVEY §2.3 lists range/as-of
    joins as absent from the reference; Spark's own planner would turn the
    range predicate into a nested-loop join, so the engine rewrites it).
    DuckDB mirrors with its native ASOF LEFT JOIN. The right side is
    deduplicated per (user_id, ts) so both engines' duplicate-ts resolution
    is vacuous; values are untouched parquet doubles — exact hash match."""
    e = _t(spark, sf_dir, "events")
    ev = e.select(
        "user_id", _ts_us(e).alias("ts_us"), "event_id", "event_type", "value"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts_us", "event_id"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("purchase_value"))
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        ts="ts_us",
        value_cols=["purchase_value"],
        suffix="_purchase",
    )


def _q43_gap_fill(spark, sf_dir):
    """Gap-fill / resample: per-user daily grid (aligned to day boundaries
    via integer-exact mn - mn%step), forward-filled with the most recent
    observation at-or-before each grid point. Grid is sequence+explode
    (executor-side); the fill reuses the as-of union-sort plan. DuckDB
    oracle: generate_series + native ASOF LEFT JOIN."""
    e = _t(spark, sf_dir, "events")
    day_us = 86400 * 1_000_000
    obs = (
        e.select("user_id", _ts_us(e).alias("ts_us"), "value")
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("value"))
    )
    return resample_ffill(
        obs, key="user_id", ts="ts_us", step=day_us, value_cols=["value"]
    )


def _q44_kmv_distinct(spark, sf_dir):
    """K-minimum-values approximate distinct count of lineitem part keys —
    the deterministic (portable-hash) counterpart of approx_count_distinct,
    so the sketch itself is oracle-checkable bit-for-bit. Plan: one scan,
    per-partition top-k merge (TakeOrderedAndProject), O(k) memory."""
    li = _t(spark, sf_dir, "lineitem")
    return kmv_distinct(li, key="l_partkey", k=256)


def _q45_hash_sample(spark, sf_dir):
    """Deterministic 10% Bernoulli sample of lineitem keyed on l_orderkey:
    no RNG, no shuffle — whole orders sample together (referential
    integrity with an identically-keyed orders sample), and re-runs and
    other engines draw the identical sample. Output aggregated per return
    flag so the check pins both membership and the sampled values."""
    li = _t(spark, sf_dir, "lineitem")
    s = hash_sample(li, key="l_orderkey", fraction=0.10)
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return s.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(cents).alias("sum_cents"),
    )


def _q46_token_topk(spark, sf_dir):
    """Corpus-wide token frequency top-k (text-analysis surface): explode
    word tokens -> count -> global top 20 with a total-order tie-break
    (count desc, token asc). Map-side partial aggregation carries the
    heavy-hitter counts; only the grouped table is shuffled."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(F.explode(word_tokens(F.col("text"))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    # orderBy+limit -> TakeOrderedAndProject: per-partition top-20 then one
    # tiny merge — the global rank window only ever sees 20 rows
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(20)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    return top.select(
        F.row_number().over(w).alias("rank"), "token", "n"
    )


def _q47_class_centroids(spark, sf_dir):
    """Per-label embedding centroids in fixed-point arithmetic: float32
    components scale exactly to int64 (round(x*1e6)), integer sums are
    order-independent, and the final division is one double op — so the
    centroid doubles hash-match across engines despite distributed
    summation. Output long form (label, dim, n, centroid): no array
    rebuild, map-side partial agg on (label, dim)."""
    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "_x")
    )
    fixed = F.round(F.col("_x") * 1_000_000).cast("long")
    return (
        e.select("label", "dim", fixed.alias("_f"))
        .groupBy("label", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("_f").alias("_s"))
        .select(
            "label",
            "dim",
            "n",
            (
                F.col("_s").cast("double")
                / (F.col("n") * F.lit(1_000_000)).cast("double")
            ).alias("centroid"),
        )
    )


def _q48_interval_join(spark, sf_dir):
    """Interval (range-containment) join via the bucketized equi-join
    rewrite: purchase events joined into the gap-sessions (q32) of the
    same user that contain them, then counted per session. Spark's native
    plan for `ts BETWEEN start AND end` is BroadcastNestedLoopJoin; the
    operator turns it into an equi-join on (user_id, time_bucket). The
    oracle is the plain theta join DuckDB can afford at sf scale."""
    sessions = _q32_sessionize(spark, sf_dir).select(
        "user_id",
        "session_no",
        F.col("session_start_us").alias("start_us"),
        F.col("session_end_us").alias("end_us"),
    )
    e = _t(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .select("user_id", _ts_us(e).alias("ts_us"), "event_id")
    )
    joined = interval_join(
        purchases,
        sessions,
        on="user_id",
        ts="ts_us",
        start="start_us",
        end="end_us",
        bucket=2 * 3600 * 1_000_000,  # the q32 session gap: ~interval scale
    )
    return joined.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_purchases")
    )


def _q49_sql_api(spark, sf_dir):
    """The engine's SQL surface (the reference has no SQL parser at all —
    Spark's comes free): a literal spark.sql() query with a CTE, an
    equi-join, and a scalar subquery — customers whose lifetime order
    value exceeds 2x the all-customer average. Integer cents keep the
    aggregate exact; the avg division is one double op on exact ints, so
    the comparison is engine-portable."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH cust_tot AS (
            SELECT o_custkey,
                   sum(cast(round(o_totalprice * 100) AS bigint)) AS cents
            FROM v_orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, cents
        FROM v_customer JOIN cust_tot ON c_custkey = o_custkey
        WHERE cents > 2 * (SELECT avg(cents) FROM cust_tot)
        """
    )


def _q50_znorm(spark, sf_dir):
    """Per-series z-normalization (functions/arrays.py::znorm — the
    standard preprocessing before DTW/Euclidean matching): mean and
    variance via the same left-fold both engines evaluate, one transform
    pass to normalize, so every normalized double matches bit-for-bit."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    z = znorm(F.col("features"))
    return s.select(
        "series_id",
        F.element_at(z, 1).alias("z_first"),
        F.element_at(z, -1).alias("z_last"),
    )


def _q36_percentiles(spark, sf_dir):
    """Exact grouped percentiles over integer cents (the OLAP quantile
    surface). Spark `percentile` and DuckDB `quantile_cont` share the
    (n-1)*p linear-interpolation definition, so doubles match bit-for-bit
    on integer inputs."""
    li = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    pcts = F.expr(
        "percentile(_cents, array(0.25D, 0.5D, 0.9D, 0.99D))"
    )
    return (
        li.select("l_returnflag", cents.alias("_cents"))
        .groupBy("l_returnflag")
        .agg(pcts.alias("_p"))
        .select(
            "l_returnflag",
            F.element_at("_p", 1).alias("p25"),
            F.element_at("_p", 2).alias("p50"),
            F.element_at("_p", 3).alias("p90"),
            F.element_at("_p", 4).alias("p99"),
        )
    )


def _q35_dedup_components(spark, sf_dir):
    """Near-dup pairs -> connected components -> keep/drop per document
    (min-id canonical). Pregel-style min-label propagation over the LSH
    pair set; DuckDB oracle is a recursive-CTE transitive closure."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup_minhash_lsh(docs, threshold=0.5, max_bucket_size=64, hash_mode="kernel")
    return dedup_components(docs, pairs)


def _q34_ann_ivf(spark, sf_dir):
    """IVF (inverted-file) approximate cosine top-k: deterministic seed
    centroids -> corpus partitioned into lists (the one index-build shuffle)
    -> n_probe lists searched per query -> exact rerank. The partition-and-
    probe scale path alongside q24's LSH."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_ivf_topk(q, emb, k=5, n_lists=16, n_probe=4)


def _q51_tfidf(spark, sf_dir):
    """Per-document top-3 TF-IDF terms (operators/corpus.py::tfidf_topk).
    idf = (N+1)/(df+1) — the no-logarithm raw-frequency variant, so the
    score is two IEEE ops on exact integers and hash-matches any engine;
    rank tie-break (score desc, term asc) is a total order."""
    docs = _t(spark, sf_dir, "documents")
    return tfidf_topk(docs, k=3)


def _q52_repetition(spark, sf_dir):
    """Gopher-style repetition quality signals per document
    (operators/corpus.py::repetition_stats): distinct-token ratio and the
    most-frequent-bigram fraction — the standard boilerplate/degenerate-
    repetition filters in a pre-training pipeline."""
    docs = _t(spark, sf_dir, "documents")
    return repetition_stats(docs)


def _q53_stratified_sample(spark, sf_dir):
    """Deterministic fixed-quota stratified sample: 20 documents per
    language by portable-hash rank (operators/sketch.py::stratified_sample)
    — the balanced-training-mix primitive; no RNG, so the SAMPLE ITSELF is
    oracle-checked, not just its size."""
    docs = _t(spark, sf_dir, "documents")
    s = stratified_sample(docs, strata="lang", key="doc_id", n=20)
    return s.select("lang", "doc_id", "sample_rank")


def _q54_random_projection(spark, sf_dir):
    """Random-projection (Johnson-Lindenstrauss) dim reduction 64 -> 8 over
    the embedding column (operators/similarity.py::random_project): hash-
    derived deterministic planes, left-fold dots — every projected double
    hash-matches the SQL oracle. The cheap front-end for ANN/cluster at
    scale."""
    emb = _t(spark, sf_dir, "embeddings")
    return random_project(emb, out_dim=8, dim=64)


def _q55_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/corpus.py::decontaminate):
    flag train docs sharing any word 4-gram with the 'benchmark' subset
    (doc_id % 17 == 0 stands in for an eval set on the synthetic corpus;
    real pipelines use 8-13-grams a la GPT-3 Appendix C). Eval n-gram set
    is broadcast — no corpus-sized shuffle."""
    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    return decontaminate(tr, ev, n=4)


def _q56_chunk_documents(spark, sf_dir):
    """Fixed-size token-window chunking (operators/corpus.py::
    chunk_documents): each doc split into consecutive 32-token training
    chunks; shuffle-free fan-out plan."""
    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(docs, chunk_tokens=32)


def _q57_pack_sequences(spark, sf_dir):
    """Streaming-concatenation sequence packing (operators/corpus.py::
    pack_sequences): bucket-sharded greedy packing of the token stream into
    capacity-256 context windows; one shuffle (window by bucket)."""
    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(docs, capacity=256, n_buckets=8)


def _q61_incremental_dedup(spark, sf_dir):
    """Incremental ingestion dedup (operators/dedup.py::dedup_incremental):
    the 'new batch' (doc_id >= 400) anti-joins its content fingerprints
    against the existing corpus (doc_id < 400); only fingerprint-new,
    batch-unique docs are admitted. Raw text never shuffles — fingerprints
    do."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < 400)
    batch = docs.filter(F.col("doc_id") >= 400)
    return dedup_incremental(batch, corpus)


def _q62_histogram(spark, sf_dir):
    """Fixed-width histogram (operators/sketch.py::histogram) of order
    totals: 20 buckets over [0, 600000); bucket expression is the same
    IEEE op sequence on both engines so every count matches exactly."""
    return histogram(
        _t(spark, sf_dir, "orders"), "o_totalprice", bins=20, lo=0.0, hi=600_000.0
    )


def _q63_multiway_join(spark, sf_dir):
    """TPC-H Q5-shaped 6-table join: revenue per nation for one region and
    a 2-year date window, exact-cents. Pure declarative plan — Catalyst
    broadcast-joins the three dim tables (region/nation/supplier at this
    SF), pushes r_name + date filters into the scans, and reorders the
    join tree; the engine adds nothing by hand (SURVEY §4: join reordering
    'free the moment the plan is DataFrame-native')."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .filter(
            (F.col("r_name") == "ASIA")
            & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000).cast("long")
            ).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _q64_normalize_text(spark, sf_dir):
    """ASCII-level text normalization (functions/text.py::normalize_text):
    lowercase, strip non-[a-z0-9 ], collapse whitespace — the canonical
    form feeding dedup/fingerprints. Shuffle-free row-wise plan."""
    docs = _t(spark, sf_dir, "documents")
    norm = normalize_text(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.size(tokens_fn(norm)).alias("n_tokens"),
    )


def _q65_series_features(spark, sf_dir):
    """Per-series summary featurization (functions/arrays.py::
    series_features): n/mean/std/min/max/least-squares slope, every
    statistic a left-fold or min/max over the features array — the cheap
    6-number sketch of a 561-point series for blocking and first-pass
    filtering before DTW KNN. Exact cross-engine (left-fold invariant)."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    return s.select("series_id", series_features(F.col("features")).alias("_f")).select(
        "series_id", "_f.n", "_f.mean", "_f.std", "_f.vmin", "_f.vmax", "_f.slope"
    )


def _q66_paa(spark, sf_dir):
    """Piecewise Aggregate Approximation (functions/arrays.py::paa): each
    16-point series to 4 segment means — the codegen'd sketch that powers
    knn_join_pruned's lower-bound prefilter (q25); exposed standalone so
    the sketch itself is oracle-checked."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    p = paa(F.col("features"), 4, SERIES_LEN)
    return s.select(
        "series_id",
        F.element_at(p, 1).alias("p1"),
        F.element_at(p, 2).alias("p2"),
        F.element_at(p, 3).alias("p3"),
        F.element_at(p, 4).alias("p4"),
    )


def _q67_bloom_semi_join(spark, sf_dir):
    """Bloom-prefiltered semi join (operators/sketch.py::bloom_semi_join):
    lineitem rows whose supplier has acctbal > 9000 — the bitmap bit-tests
    cut the fact-side shuffle before the exact semi join confirms. Result
    set == the plain semi join, which is the oracle."""
    li = _t(spark, sf_dir, "lineitem")
    dim = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    out = bloom_semi_join(li, dim, "l_suppkey")
    return out.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_cents"),
    )


def _q68_knn_outliers(spark, sf_dir):
    """Distance-based outlier scoring (kNN outlier — Ramaswamy et al. 2000
    'Efficient algorithms for mining outliers'): each series scored by the
    mean distance to its 4 nearest neighbors (self excluded) — reuses
    knn_join wholesale. The per-rank pivot keeps the 4-term sum in a FIXED
    left-assoc order so the double matches the oracle exactly (a plain
    avg() aggregates in nondeterministic order)."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    nn = knn_join(s, s, metric="euclidean", k=4, strategy="broadcast")
    piv = nn.groupBy("test_id").agg(
        *[
            F.max(F.when(F.col("rank") == i, F.col("distance"))).alias(f"d{i}")
            for i in (1, 2, 3, 4)
        ]
    )
    return piv.select(
        "test_id",
        "d1",
        ((F.col("d1") + F.col("d2") + F.col("d3") + F.col("d4")) / 4).alias(
            "outlier_score"
        ),
    )


def _q69_quality_filter(spark, sf_dir):
    """Percentile-gated corpus curation: keep documents whose quality score
    is at or above the corpus p75 — the 'top quartile' training-mix filter.
    The threshold is computed over INTEGER micro-units (round(q*1e6)) so
    the exact percentile interpolation is integer-fed and cross-engine
    bit-stable (q36's trick); at 100 TB swap percentile for
    approx_percentile — one pass, no global sort."""
    docs = _t(spark, sf_dir, "documents")
    qi = F.round(quality_score(F.col("text")) * 1_000_000).cast("long")
    scored = docs.select("doc_id", qi.alias("q_micro"))
    thresh = scored.agg(
        F.expr("percentile(q_micro, 0.75D)").alias("_t")
    )
    return (
        scored.crossJoin(F.broadcast(thresh))
        .filter(F.col("q_micro").cast("double") >= F.col("_t"))
        .select("doc_id", "q_micro")
    )


def _q60_attribution_join(spark, sf_dir):
    """Stream-stream attribution join, batch twin (streaming/joins.py::
    attribution_join): every (view -> click) pair of the same user with the
    click at most 4 hours after the view. Equi-join on user_id with the
    time range as residual — in streaming it is a watermark-bounded
    StreamingSymmetricHashJoin (live parity test in
    tests/test_ml_and_streaming.py); in batch this exact plan, which the
    DuckDB oracle hash-matches."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import attribution_join

    e = _t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view")
    clicks = e.filter(F.col("event_type") == "click")
    return attribution_join(views, clicks, key="user_id", within="4 hours")


def _q70_knn_dtw_exact(spark, sf_dir):
    """Exact (unbanded) DTW KNN with a REAL SQL oracle: the DuckDB twin
    computes the full DTW dynamic program in a recursive CTE (one DP ROW
    per recursion level, the row's sequential cur[j-1] dependency expressed
    as a list_reduce building the row left-to-right). Distances rounded to
    6 decimals on both sides: the Python kernel evaluates the recurrence in
    prefix-scan form (functions/dtw_kernel.py), an fp-reassociation of the
    naive DP the CTE runs, so the two agree to ~1e-13 relative but not to
    the last ulp. This makes the DTW *distance operator itself*
    oracle-checked — q13's FastDTW path (recursive coarsening, not
    SQL-expressible) stays rows-only by design."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="dtw", band=None, k=3)
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q71_series_resample(spark, sf_dir):
    """Linear-interpolation length normalization (functions/arrays.py::
    resample_linear): 16-point series resampled to 8 points — the bridge
    that lets ragged series enter fixed-length paths (batch DTW kernel,
    PAA, broadcast KNN matrices). Endpoint-exact lerp, bit-mirrored by the
    oracle."""
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    r = resample_linear(F.col("features"), 8)
    return s.select(
        "series_id", *[F.element_at(r, t + 1).alias(f"r{t + 1}") for t in range(8)]
    )


def _q72_mixture_sample(spark, sf_dir):
    """Deterministic mixture sampling (operators/sketch.py::mixture_sample):
    per-language keep probabilities (en .25 / de .5 / es .75 / fr 1.0,
    default .1) as ONE pushdown-friendly filter on the portable key hash —
    the pre-training data-mix reweighting primitive, RNG-free and
    referentially consistent."""
    docs = _t(spark, sf_dir, "documents")
    out = mixture_sample(
        docs,
        strata_col="lang",
        weights={"en": 0.25, "de": 0.5, "es": 0.75, "fr": 1.0},
        default=0.1,
        key="doc_id",
    )
    return out.select("doc_id", "lang")


def _q73_curation_pipeline(spark, sf_dir):
    """END-TO-END corpus curation in ONE plan — the full pre-training
    hygiene chain composed from this engine's operators:
    normalize_text -> median quality gate (integer-micro percentile) ->
    exact dedup on the normalized fingerprint (min-id survivor) ->
    per-language mixture downweighting -> 32-token chunking.
    Output: (doc_id, chunk_id, n_tokens). Every stage is individually
    oracle-checked (q64/q69/q16/q72/q56); this query proves they COMPOSE:
    one DuckDB CTE chain hash-matches the whole pipeline."""
    docs = _t(spark, sf_dir, "documents")
    norm = docs.select(
        "doc_id", "lang", normalize_text(F.col("text")).alias("norm_text"),
        F.round(quality_score(F.col("text")) * 1_000_000).cast("long").alias("q_micro"),
    )
    thresh = norm.agg(F.expr("percentile(q_micro, 0.5D)").alias("_t"))
    gated = (
        norm.crossJoin(F.broadcast(thresh))
        .filter(F.col("q_micro").cast("double") >= F.col("_t"))
        .drop("_t")
    )
    deduped = (
        gated.withColumn("_fp", char_hash(F.col("norm_text")))
        .groupBy("_fp")
        .agg(
            F.min_by(F.struct("doc_id", "lang", "norm_text"), F.col("doc_id")).alias("_s")
        )
        .select("_s.doc_id", "_s.lang", "_s.norm_text")
    )
    mixed = mixture_sample(
        deduped,
        strata_col="lang",
        weights={"en": 0.5, "de": 1.0, "es": 1.0, "fr": 1.0},
        default=0.25,
        key="doc_id",
    )
    chunks = chunk_documents(mixed, chunk_tokens=32, text_col="norm_text")
    return chunks.select("doc_id", "chunk_id", "n_tokens")


def _q58_profile_table(spark, sf_dir):
    """One-scan column profiling (operators/profile.py::profile_table):
    nulls / exact distinct / numeric min-max per column of orders, single
    agg row unpivoted via explode(array(struct)). distinct_mode='approx'
    (HLL++, no Expand) is the 100 TB path; exact is the oracle-checkable
    one used here."""
    return profile_table(_t(spark, sf_dir, "orders"))


def _q59_salted_join(spark, sf_dir):
    """Skew-salted equi-join (operators/skew.py::salted_join): lineitem
    (skewed side, salted) x orders replicated over 4 salts, then exact-cents
    revenue per order priority. Result set is identical to the plain join —
    which is exactly what the oracle asserts cross-engine."""
    li = _t(spark, sf_dir, "lineitem")
    orders = (
        _t(spark, sf_dir, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .select("l_orderkey", "o_orderpriority")
    )
    j = salted_join(li, orders, "l_orderkey", salts=4)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("rev_cents"),
    )


def _q74_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-dup pairs (operators/dedup.py::dedup_embedding):
    hyperplane-LSH bucket candidates (same deterministic plane spec as q24)
    verified by exact left-fold cosine <= 0.65 — the semantic-dedup member
    of the dedup family. The oracle rebuilds the identical buckets in SQL,
    so even the approximation's recall is hash-checked, not trusted."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dedup_embedding

    emb = _t(spark, sf_dir, "embeddings")
    return dedup_embedding(emb, threshold=0.65, strategy="lsh")


def _q75_token_rarity(spark, sf_dir):
    """Corpus-frequency document scoring (operators/corpus.py::token_rarity):
    per-doc sum/mean of each token occurrence's corpus-wide count — the
    integer-exact stand-in for unigram log-probability (transcendental logs
    can't hash-match cross-engine; exact integer sums + one final division
    can). Complements repetition (q52) and heuristic quality (q22) in the
    curation signal set."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import token_rarity

    docs = _t(spark, sf_dir, "documents")
    return token_rarity(docs)


def _q76_ml_estimator(spark, sf_dir):
    """The pyspark.ml surface (SURVEY §2.9 M2: the reference's Estimator/
    Transformer shape, Team11-Project.py:233-322): KnnDtwClassifier.fit ->
    model.transform, euclidean k=5 — the SAME classification q10 runs
    through the functional API, re-projected to (test_id, predicted_label)
    so q10's oracle applies verbatim. Proves the ml wrapper end-to-end
    (param plumbing, fit/copy semantics, transform join) under the driver
    gate, not just local tests."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml import KnnDtwClassifier

    train, test = _series(spark, sf_dir)
    model = KnnDtwClassifier(k=5, metric="euclidean", idCol="series_id").fit(train)
    out = model.transform(test)
    return out.select(F.col("series_id").alias("test_id"), "predicted_label")


def _q77_source_quota(spark, sf_dir):
    """Quality-aware per-source curation quota: the top 50 documents of EVERY
    source by (quality desc, doc_id asc) — the 'balance the training mix
    across sources, keep each source's best' selection. Integer-micro
    quality scores (q22's formula) keep the ranking cross-engine exact;
    WindowGroupLimit makes the per-source top-k map-side partial, so the
    shuffle carries <= 50 rows per source per partition."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.topk import topk_per_key

    docs = _t(spark, sf_dir, "documents")
    qi = F.round(quality_score(F.col("text")) * 1_000_000).cast("long")
    scored = docs.select("source", "doc_id", qi.alias("q_micro"))
    top = topk_per_key(scored, "source", [F.desc("q_micro"), F.asc("doc_id")], 50)
    return top.select("source", "doc_id", "q_micro", "rank")


def _q78_fingerprint(spark, sf_dir):
    """Document fingerprinting (functions/text.py::char_hash): the
    polynomial rolling hash per document plus duplicate-fingerprint counts —
    the compact identity column an incremental dedup ledger stores instead
    of full text (dedup_incremental's fingerprint column, q61). Pure
    codegen'd fold; one scan + one map-side-partial count."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.select("doc_id", char_hash(F.col("text")).alias("fingerprint"))
    counts = fp.groupBy("fingerprint").agg(F.count(F.lit(1)).alias("n_docs"))
    return fp.join(counts, "fingerprint").select("doc_id", "fingerprint", "n_docs")


def _q79_sink_roundtrip(spark, sf_dir):
    """Partitioned parquet SINK under the driver gate (reference S3,
    Team11-Project.py:199 saveAsTable): aggregate lineitem, write it
    Hive-partitioned by l_returnflag (sources/parquet.py::
    save_table_partitioned), read the directory back, return the read-back
    rows — so the oracle checks the values actually survived the
    write/read round-trip, partition-encoding included. Writes inside the
    repo (.sink_roundtrip/, gitignored), mode=overwrite for rerun safety."""
    import os as _os

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import save_table_partitioned

    li = _t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias("sum_cents"),
    )
    out = _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)),
        ".sink_roundtrip",
        _os.path.basename(sf_dir.rstrip("/")) or "sf",
    )
    save_table_partitioned(agg, out, partition_cols="l_returnflag")
    back = spark.read.parquet(out)
    return back.select("l_returnflag", "l_linestatus", "n", "sum_cents")


def _q80_cube(spark, sf_dir):
    """CUBE + grouping_id (completes the grouping-sets family next to q29's
    ROLLUP): all four aggregation levels of (orderstatus, orderpriority)
    in one pass, gid disambiguating which dims each row aggregates out —
    Expand-based, single shuffle, exact-cents sums."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("sum_cents"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "sum_cents")
    )


def _q81_time_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: hour AND day granularities of
    the events stream in ONE scan via GROUPING SETS on two derived bucket
    columns (the TimescaleDB rollup shape; one Expand, one shuffle — at
    100 TB you materialize exactly this output as the serving table).
    Buckets are integer epoch divisions of the microsecond timeline
    (engine-portable, no timezone surface); sums are exact cents."""
    e = _t(spark, sf_dir, "events")
    hour_us = 3600 * 1_000_000
    day_us = 24 * hour_us
    e.select(
        _ts_us(e).alias("ts_us"), "event_type", "value"
    ).createOrReplaceTempView("v_events_rollup")
    return spark.sql(f"""
        SELECT CASE WHEN grouping(hb) = 0 THEN 'hour' ELSE 'day' END AS gran,
               coalesce(hb, db) AS bucket, event_type,
               count(*) AS n,
               sum(cast(round(value * 100) AS bigint)) AS sum_cents
        FROM (SELECT ts_us DIV {hour_us} AS hb, ts_us DIV {day_us} AS db,
                     event_type, value
              FROM v_events_rollup)
        GROUP BY GROUPING SETS ((hb, event_type), (db, event_type))
    """)


def _q82_zorder(spark, sf_dir):
    """Z-order (Morton) curve values for multi-column data skipping
    (sources/zorder.py::zvalue): the deterministic bit-interleave that
    zorder_write range-partitions parquet files on. Computed over
    (l_partkey, l_suppkey) clamped to 10 bits and aggregated per z-bucket
    so the query output stays small while pinning every interleaved bit —
    the layout machinery itself is oracle-checked, not trusted. The
    footer-stats skipping effect is asserted from real parquet metadata in
    tests/test_ingest.py::test_zorder_write_tightens_file_stats."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import zvalue

    li = _t(spark, sf_dir, "lineitem")
    z = zvalue([F.col("l_partkey"), F.col("l_suppkey")], bits=10)
    return (
        li.select((z % 4096).alias("z_bucket"))
        .groupBy("z_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _q83_image_resize(spark, sf_dir):
    """Multimodal resize plumbing (operators/multimodal.py::resize_image):
    REAL nearest-neighbor index math ((oi*h)//out_h, (oj*w)//out_w) over
    the sha256-tiled stubbed decode — like q40, the deterministic stand-in
    makes even this mapInPandas path exactly oracle-checkable (DuckDB
    recomputes every sampled byte from the same digest)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        resize_image,
    )

    data = [
        (i, bytearray(s, "ascii"), ("image", w, h, 0))
        for i, s, w, h in _media_rows()
    ]
    df = spark.createDataFrame(data, MEDIA_SCHEMA)
    return resize_image(df, out_w=4, out_h=4).select(
        "media_id", "out_w", "out_h", "pixels", "px_checksum", "mean_px"
    )


def _sql_image_resize(out_w: int = 4, out_h: int = 4) -> str:
    """Oracle for q83: sample byte ((oi*h)//out_h * w + (oj*w)//out_w) % 32
    of sha256(payload) for each output cell — dynamic hex-position byte
    extraction, mirroring resize_image exactly."""

    def byte_at(pos: str) -> str:
        # pos: 0-based byte index expression into the 32-byte digest hex
        d1 = f"(strpos('0123456789abcdef', substr(hx, 2 * ({pos}) + 1, 1)) - 1)"
        d2 = f"(strpos('0123456789abcdef', substr(hx, 2 * ({pos}) + 2, 1)) - 1)"
        return f"(16 * {d1} + {d2})"

    cells = [
        byte_at(
            f"((({oi} * height) // {out_h}) * width + (({oj} * width) // {out_w})) % 32"
        )
        for oi in range(out_h)
        for oj in range(out_w)
    ]
    px_list = ", ".join(f"cast({c} AS double)" for c in cells)
    total = " + ".join(f"cast({c} AS bigint)" for c in cells)
    values = ",\n                ".join(
        "({}, '{}', {}, {})".format(i, s.replace("'", "''"), w, h)
        for i, s, w, h in _media_rows()
    )
    return f"""
        WITH m(media_id, payload, width, height) AS (VALUES
                {values}
        ),
        h AS (SELECT media_id, width, height, sha256(payload) AS hx FROM m)
        SELECT media_id,
               cast({out_w} AS int) AS out_w,
               cast({out_h} AS int) AS out_h,
               [{px_list}] AS pixels,
               cast({total} AS bigint) AS px_checksum,
               cast({total} AS double) / {out_w * out_h}.0 AS mean_px
        FROM h
    """


def _q84_count_min(spark, sf_dir):
    """Count-min-sketch heavy hitters (operators/sketch.py::count_min_topk):
    exact top-20 token counts next to their CMS estimates from a 4x256
    bounded-memory sketch — deterministic portable hashes make even the
    sketch's collision pattern oracle-exact. cms_n >= n always (the CMS
    overestimate guarantee; test-pinned)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import count_min_topk

    docs = _t(spark, sf_dir, "documents")
    return count_min_topk(docs, k=20, depth=4, width=256)


def _sql_count_min(k: int = 20, depth: int = 4, width: int = 256) -> str:
    """Oracle for q84 — same token stream, same (h*A_r+B_r)%P%width bucket
    spec, same min-over-depth estimate."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import MINHASH_A, MINHASH_B

    fold = _sql_char_fold("token")
    buckets_entries = " UNION ALL ".join(
        f"SELECT token, {r} AS r, ((h * {MINHASH_A[r]} + {MINHASH_B[r]}) % {HASH_P}) % {width} AS bucket FROM th"
        for r in range(depth)
    )
    top_buckets = ", ".join(
        f"(({fold} * {MINHASH_A[r]} + {MINHASH_B[r]}) % {HASH_P}) % {width} AS _b{r}"
        for r in range(depth)
    )
    joins = " ".join(
        f"JOIN (SELECT bucket AS _b{r}, c AS _c{r} FROM counters WHERE r = {r}) j{r} USING (_b{r})"
        for r in range(depth)
    )
    least = "least(" + ", ".join(f"_c{r}" for r in range(depth)) + ")"
    return f"""
        WITH toks AS (SELECT unnest({_SQL_TOKENS}) AS token FROM documents),
        th AS (SELECT token, {fold} AS h FROM toks),
        entries AS ({buckets_entries}),
        counters AS (SELECT r, bucket, count(*) AS c FROM entries GROUP BY r, bucket),
        exact AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
        top AS (SELECT token, n FROM exact ORDER BY n DESC, token ASC LIMIT {k}),
        tb AS (SELECT token, n, {top_buckets} FROM top)
        SELECT token, n, cast({least} AS bigint) AS cms_n
        FROM tb {joins}
    """


def _q85_native_session_window(spark, sf_dir):
    """Spark's NATIVE session_window operator in batch (q32 gates the
    manual lag+cumsum twin; this gates the built-in): gap-merged sessions
    per user with Spark's session semantics — session end = last event +
    gap. Output in epoch micros so the DuckDB mirror (the same gap-split
    scan plus an explicit +gap on the end) hash-matches exactly."""
    e = _t(spark, sf_dir, "events")
    gap_us = 2 * 3600 * 1_000_000
    ev = e.select(
        "user_id", F.timestamp_micros(_ts_us(e)).alias("_ts"), "event_id"
    )
    return (
        ev.groupBy(F.session_window("_ts", "2 hours").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "n_events",
        )
    )


def _q86_knn_pruned_admissible(spark, sf_dir):
    """EXACT pruned DTW KNN (operators/knn.py::knn_join_lb): LB_Keogh-family
    admissible lower bound + filter-and-verify, provably identical to brute
    force — so its oracle IS q70's brute-force recursive-CTE DTW DP. A tiny
    candidate budget (C=4) forces the phase-3 completeness path to do real
    work, making the oracle a proof that the pruning is lossless, not just
    that the bound is usually good. Distances rounded exactly as q70
    (prefix-scan vs naive DP fp reassociation, ~1e-13 relative)."""
    train, test = _series(spark, sf_dir)
    nn = knn_join_lb(
        test, train, metric="dtw", k=3, length=SERIES_LEN, candidates_per_test=4
    )
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q87_kmeans(spark, sf_dir):
    """Distributed k-means over the embedding table (operators/cluster.py::
    kmeans_assign): deterministic lowest-id seeds, 2 Lloyd assignment
    passes, FIXED-POINT exact centroid refit (int64-micro sums are
    order-independent under partial aggregation; one double division per
    component) — which is what makes an ITERATIVE algorithm's result
    hash-checkable by a DuckDB oracle. Fills the k-means hook
    similarity.py's IVF docstring left open."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assign(emb, k=8, iters=2)


def _q88_semantic_dedup(spark, sf_dir):
    """SemDeDup-style semantic near-dup pruning (operators/cluster.py::
    semantic_dedup): k-means clusters (q87's exact iterates) as the
    candidate generator, exact cosine <= 0.65 inside each cluster,
    keep-lowest-id. The cluster-bucketed complement of q74's LSH-bucketed
    dedup_embedding — candidates come from the data's own density
    structure instead of random projections."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.65, k=8, iters=2)


def _q89_span_dedup(spark, sf_dir):
    """Boilerplate-span removal (operators/corpus.py::remove_common_spans):
    the C4/RefinedWeb line-dedup shape in token form — 8-token spans
    occurring in >= 3 distinct documents are removed from every document.
    Rebuilt text + per-doc span counts are all hash-checked."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.corpus import remove_common_spans

    docs = _t(spark, sf_dir, "documents")
    return remove_common_spans(docs, span_tokens=8, min_docs=3)


def _q90_ann_quantized(spark, sf_dir):
    """Int8-quantized cosine top-k (operators/similarity.py::
    ann_quantized_topk): symmetric per-vector quantization, then ranking by
    exact INT64 dot/norm arithmetic — 8x fewer candidate-join bytes than
    the float pipeline and a fully deterministic ranking (integer sums are
    order-free). Same query slice as q23, so recall vs the float brute
    force is directly comparable."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.similarity import ann_quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_quantized_topk(q, emb, k=5)


def _q91_corpus_shuffle(spark, sf_dir):
    """Deterministic global training-data shuffle: shard by a portable
    seeded hash of the doc id (the functions/text.py char-fold spec), order
    within shards by (hash, id). The pre-training 'shuffle then shard'
    step, with no RNG state to ship: any engine reproduces the exact
    permutation. The within-shard row_number is a DISTRIBUTED window
    (partitioned by shard) — never the single-partition global-window
    hazard SURVEY §4 flags."""
    docs = _t(spark, sf_dir, "documents")
    h = char_hash(F.concat(F.lit("shuf42:"), F.col("doc_id").cast("string")))
    sharded = docs.select("doc_id", h.alias("_h"), (h % 8).cast("int").alias("shard"))
    w = Window.partitionBy("shard").orderBy(F.asc("_h"), F.asc("doc_id"))
    return sharded.select(
        "doc_id", "shard", F.row_number().over(w).alias("pos")
    )


def _q92_decontaminate_fuzzy(spark, sf_dir):
    """FUZZY decontamination (operators/corpus.py::decontaminate_fuzzy):
    train docs whose minhash signature agrees with some eval doc's on >= 8
    of 16 components (estimated shingle-Jaccard >= 0.5) — the
    near-verbatim-leak complement of q55's exact n-gram pass. Same eval
    split convention as q55 (doc_id % 17 == 0); signatures are the portable
    minhash spec q18 banks on, so the oracle mirrors them exactly."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import decontaminate_fuzzy

    docs = _t(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 17 == 0)
    tr = docs.filter(F.col("doc_id") % 17 != 0)
    return decontaminate_fuzzy(tr, ev, min_agree=8)


def _q93_ann_ivf_kmeans(spark, sf_dir):
    """IVF search seeded by REFIT k-means centroids (the integration hook
    q34's docstring promised): kmeans_centroids' fixed-point-exact iterates
    (q87's machinery, k=16) feed ann_ivf_topk(centroids=...) — index
    partitioning now follows the data's density structure instead of raw
    lowest-id seeds, at identical plan shape (broadcast centroid table,
    one index-build shuffle, n_probe lists per query). The whole composed
    pipeline — 4 Lloyd passes AND the IVF assign/probe/rerank on top — is
    hash-checked by one oracle. iters=4 / n_probe=8 are the r4 retune
    (VERDICT r3 #3): on the weakly-clustered synthetic embeddings recall
    vs brute went 0.54 -> ~0.87 at sf0.01; on genuinely clustered data the
    recall-vs-probes fixture (tests/test_cluster_ops.py) pins >= 0.85 at
    n_probe=2 already."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb, k=16, iters=4).select(
        F.col("cluster").alias("list_id"), "vector"
    )
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_ivf_topk(q, emb, k=5, n_probe=8, centroids=cent)


def _q94_image_decode_real(spark, sf_dir):
    """REAL image decoding under the oracle gate: payloads are genuine PNG
    bytes (pure-stdlib encoder, functions/png.py) of closed-form gradient
    images — pixel(i,j) = (i*7 + j*13 + 31*id) mod 256 — decoded by the
    engine's builtin PNG codec (zlib inflate + scanline unfiltering, NO
    imaging library) and nearest-neighbor resized. The oracle cannot parse
    PNG, and doesn't need to: it recomputes the expected pixels from the
    generative formula — so a hash match proves the DECODER itself is
    correct, not merely stable. width/height come from the decoded IHDR;
    checksums are integer-exact."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_image_features,
        resize_image,
        synthetic_png_media,
    )

    _prep(spark)
    media = synthetic_png_media(spark, n=24)
    dims = decode_image_features(media, decoder="builtin").select(
        "media_id", "width", "height"
    )
    rs = resize_image(media, decoder="builtin", out_w=4, out_h=4).select(
        "media_id", "px_checksum", F.round("mean_px", 6).alias("mean_px")
    )
    return dims.join(rs, "media_id")


def _q95_audio_decode_real(spark, sf_dir):
    """REAL audio decoding under the oracle gate (the WAV twin of q94):
    payloads are genuine RIFF/PCM16 bytes (pure-stdlib codec,
    functions/wav.py) of closed-form integer waveforms —
    s[t] = ((t*t*7 + t*13 + 31*id) mod 4096) - 2048 — decoded by the
    engine's builtin parser (no audio library) into exact integer
    statistics. The oracle recomputes peak / sum of squares / sign-flip
    count from the formula, so the hash match proves the RIFF parser and
    the statistics are correct end-to-end."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_audio_features,
        synthetic_wav_media,
    )

    _prep(spark)
    media = synthetic_wav_media(spark, n=16, n_samples=256)
    return decode_audio_features(media, decoder="builtin")


def _q96_ann_lsh_multiprobe(spark, sf_dir):
    """Multi-probe hyperplane LSH under the oracle gate: each query probes
    the 2 neighboring buckets per table obtained by flipping its
    lowest-|margin| hyperplane bits (operators/similarity.py::
    make_lsh_buckets_udf probes=2). q24 grades the probes=0 default; this
    grades the probing itself — the bit-flip choice ORDER (stable ascending
    |margin|, tie by plane index) is deterministic hash-derived arithmetic,
    so even the widened candidate set hash-matches an exact SQL mirror.
    Recall on the sf0.01 embeddings lifts 0.61 -> 0.90 at probes=3
    (test-pinned in test_pipeline_ops) with zero new shuffles and no extra
    corpus-side storage — the scale story multi-probe exists for."""
    _prep(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_lsh_topk(q, emb, k=5, probes=2)


def _q97_hash_embed(spark, sf_dir):
    """Feature-hashing text embedder (operators/corpus.py::hash_embed):
    word tokens -> signed hashed buckets (Weinberger et al. 2009 hashing
    trick) -> L2-normalized array<double>[64]. Gives raw text corpora a
    deterministic, model-free embedding column so the engine's entire
    vector surface (ann_*, dedup_embedding, semantic_dedup, kmeans,
    quantize) composes onto documents. Integer-exact bucket sums + the
    engine-wide left-fold norm make the doubles bit-reproducible — the
    oracle recomputes the embedding end-to-end in SQL. Grades the default
    zero-shuffle Arrow kernel path (bit-identical to the declarative
    'expr' mirror, equality test-pinned in test_corpus_ops)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import hash_embed

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    return hash_embed(docs, dim=64)


def _q98_text_knn(spark, sf_dir):
    """Model-free text similarity search END-TO-END on raw documents:
    hash_embed (q97) composed through exact cosine top-k (ann_brute_topk,
    kernel strategy — bit-identical to the declarative fold). Zero-vector
    docs are filtered on both sides (cosine is undefined there; NaN
    ordering is engine-specific). The oracle recomputes the embedding AND
    the ranking in one SQL pipeline — the q73 composed-oracle template."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import hash_embed

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    emb = hash_embed(docs, dim=64).filter(
        F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x))) > 0
    ).cache()
    q = emb.filter(F.col("doc_id") % 50 == 0)
    return ann_brute_topk(
        q, emb, k=3, id_col="doc_id", vec_col="embedding", strategy="kernel"
    )


def _q99_video_decode_real(spark, sf_dir):
    """REAL video-frame decoding under the oracle gate — the third member
    of the real-decode modality triad (q94 PNG image, q95 WAV audio, this
    = animated GIF video). Payloads are genuine multi-frame GIF89a bytes
    (pure-stdlib codec with full variable-width LZW, functions/gif.py) of
    closed-form frames px(f,x,y,id) = (x*7 + y*13 + f*29 + id*31) mod 256;
    the engine samples every 2nd frame (sample_frames' stride semantics)
    and emits exact integer pixel statistics. The oracle recomputes the
    expected pixels from the formula, so the hash match proves the LZW
    DECODER and frame extraction are correct end-to-end."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_video_frames,
        synthetic_gif_media,
    )

    _prep(spark)
    media = synthetic_gif_media(spark, n=12, w=8, h=6, n_frames=5)
    return decode_video_frames(media, decoder="builtin", every=2)


def _q100_redact_pii(spark, sf_dir):
    """PII scrubbing (operators/corpus.py::redact_pii): emails / URLs /
    phone numbers replaced with typed placeholders + per-category counts,
    patterns pinned to the Java-regex/RE2 common subset so Spark and
    DuckDB match byte-for-byte. The synthetic documents contain no PII, so
    the query first ENRICHES deterministically (doc_id-keyed contact
    lines) — the oracle applies the identical enrichment, making the
    redaction itself the thing under test. Pure per-row projection: no
    shuffle, no UDF — scan-bound at 100 TB, as a corpus scrub should be."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import redact_pii

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" reach me at user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(F.lit(" see https://example.org/page/"), F.col("doc_id").cast("string"), F.lit(" now")),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 5 == 0, F.lit(" call 555-867-5309")).otherwise(F.lit("")),
        ).alias("text"),
    )
    return redact_pii(enriched)


def _q101_ngram_lm(spark, sf_dir):
    """Bigram language-model fluency scoring (operators/corpus.py::
    ngram_lm_score): add-one-smoothed bigram probabilities trained on the
    corpus itself, per-doc mean bigram probability folded in position
    order — the CCNet perplexity-filter shape with an integer-exact /
    correctly-rounded-IEEE formulation so the DuckDB oracle hash-matches
    bit-for-bit (no ln(); same reasoning as q51's raw-frequency idf)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ngram_lm_score

    _prep(spark)
    return ngram_lm_score(_t(spark, sf_dir, "documents"))


def _q102_bpe_train(spark, sf_dir):
    """Distributed BPE merge-table training (operators/bpe.py::train_bpe,
    Sennrich et al. 2016) on the doc_id % 10 == 0 sub-corpus, 12 merges.
    Iterative argmax with total-order tie-breaks; every step runs on the
    VOCAB-sized weighted symbol table, driver traffic is 1 row per step.
    The oracle reproduces the full training loop as a recursive CTE with
    aggregation in the recursive term (the q70 DTW-DP technique), so an
    ITERATIVE algorithm gets an exact hash-graded proof."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import train_bpe

    _prep(spark)
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    merges = train_bpe(docs, num_merges=12)
    return spark.createDataFrame(
        [(s, a, b, c) for (s, a, b, c) in merges],
        "step int, a string, b string, weight bigint",
    )


def _q103_bpe_encode(spark, sf_dir):
    """BPE encoding of the FULL corpus (operators/bpe.py::bpe_encode) with
    the q102-trained merge table: distinct words encoded once through the
    codegen'd merge-fold chain, broadcast-joined back onto the pos-exploded
    token stream, per-doc token counts + portable char-fold fingerprint of
    the space-joined BPE stream. The oracle re-trains via the recursive
    CTE, re-encodes with a second recursion over merge steps, and must
    reproduce every per-doc fingerprint — end-to-end tokenizer parity."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bpe_encode,
        train_bpe,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs.filter(F.col("doc_id") % 10 == 0), num_merges=12)
    return bpe_encode(docs, merges)


def _q111_bpe_ids(spark, sf_dir):
    """Token-ID emission (operators/bpe.py::bpe_encode(emit='ids')) — the
    integer sequence a training pipeline actually consumes. Deterministic
    id space with NO vocabulary table: single characters keep their
    codepoint, merged tokens get 0x110000 + rank (past Unicode, so the
    spaces never collide; duplicate merge outputs take their EARLIEST
    rank). Graded output: per-doc token count + position-ordered id-fold
    checksum — sensitive to every id at every position."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bpe_encode,
        train_bpe,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs.filter(F.col("doc_id") % 10 == 0), num_merges=12)
    return bpe_encode(docs, merges, emit="ids").select(
        "doc_id", "n_words", "n_bpe_tokens", "ids_checksum"
    )


def _q110_sax_words(spark, sf_dir):
    """SAX symbolization (functions/arrays.py::sax_word — Lin et al. 2003):
    znorm -> 4-segment PAA -> Gaussian-breakpoint letters, giving each
    16-point event series a 4-letter word plus its block size (series
    sharing a word = iSAX-style candidate block for DTW KNN). Pure
    codegen'd folds + literal comparisons — cross-engine exact."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions import sax_word

    _prep(spark)
    events = _t(spark, sf_dir, "events")
    s = events_to_series(events, length=SERIES_LEN)
    w = s.select(
        "series_id",
        sax_word(F.col("features"), 4, SERIES_LEN, alphabet=4).alias("word"),
    )
    from pyspark.sql import Window as _W

    return w.select(
        "series_id",
        "word",
        F.count(F.lit(1)).over(_W.partitionBy("word")).cast("int").alias("block_size"),
    )


def _q109_tokenizer_pipeline(spark, sf_dir):
    """END-TO-END tokenizer-era curation in ONE plan — the round-3 third
    session's operators composed: bigram-LM fluency gate (median
    integer-micro threshold over q101's bit-exact avg_prob) ->
    leakage-safe source-hash split (q108) -> BPE encode with the
    q102-trained merge table -> per-split token accounting. Output: one
    row per split — (split, n_docs, total_bpe_tokens, fp_checksum), where
    fp_checksum is the sum of per-doc char-fold fingerprints of the BPE
    stream (order-insensitive, integer-exact), so the hash match is
    sensitive to every stage including each document's exact
    tokenization. Each stage is individually oracle-checked
    (q101/q108/q102/q103); this query proves they COMPOSE.

    Shared-stage consolidation (VERDICT r3 #6): the LM-score table feeds
    BOTH the median-threshold aggregate and the survivor join, and the
    survivor set feeds BOTH the split assignment and the BPE encode — each
    is materialized ONCE via an eager localCheckpoint, so the bigram-LM
    derivation and the fluency-gate subtree run once and every branch
    plans against the truncated leaf instead of re-deriving the whole
    upstream pipeline (exchanges executed end-to-end: 132 -> 25 = 14 lm +
    3 survivors + 8 final; result hash unchanged). Same
    lineage-truncation discipline as the
    dedup_components Pregel loop; the localCheckpoint-vs-reliable-
    checkpoint durability tradeoff documented there applies."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bpe_encode,
        leakage_safe_split,
        ngram_lm_score,
        train_bpe,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    lm = ngram_lm_score(docs).select(
        "doc_id",
        F.round(F.col("avg_prob") * 1_000_000).cast("long").alias("p_micro"),
    ).localCheckpoint(eager=True)
    thresh = lm.agg(F.expr("percentile(p_micro, 0.5D)").alias("_t"))
    surv = (
        docs.join(lm, "doc_id")
        .crossJoin(F.broadcast(thresh))
        .filter(F.col("p_micro").cast("double") >= F.col("_t"))
        .select("doc_id", "source", "text")
    ).localCheckpoint(eager=True)
    split = leakage_safe_split(
        surv, group="source", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")
    merges = train_bpe(docs.filter(F.col("doc_id") % 10 == 0), num_merges=12)
    enc = bpe_encode(surv, merges)
    return (
        enc.join(split, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bpe_tokens").cast("bigint").alias("total_bpe_tokens"),
            F.sum("bpe_fingerprint").cast("bigint").alias("fp_checksum"),
        )
    )


def _q108_leakage_safe_split(spark, sf_dir):
    """Group-hash train/val/test assignment (operators/sketch.py::
    leakage_safe_split): every document of the same SOURCE lands in the
    same split — the structural guard against the near-duplicate-leakage
    contamination bug (correlated examples from one unit spanning train
    and eval). Pure per-row projection on the portable hash, no RNG, no
    shuffle before the small per-(source, split) count aggregate that
    exhibits the invariant: each source appears under exactly ONE split."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import leakage_safe_split

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    out = leakage_safe_split(
        docs, group="source", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def _q107_hll_distinct(spark, sf_dir):
    """Portable HyperLogLog distinct-count sketch (operators/sketch.py::
    hll_distinct) over lineitem.l_partkey: murmur3-finalizer mixing (the
    affine hash measurably fails HLL's geometric-tail requirement —
    sketch.py comment), register max per bucket (mergeable map-side
    partial), bucket-ordered power-of-two fold. hll_raw is bit-exact
    cross-engine (every 2^-M_j term is exact in binary); the ln()-based
    small-range correction stays OUT of the graded projection per the
    repo's no-transcendentals oracle rule."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import hll_distinct

    _prep(spark)
    li = _t(spark, sf_dir, "lineitem")
    return hll_distinct(li, "l_partkey").select(
        "n_present", "zero_regs", F.round("hll_raw", 6).alias("hll_raw")
    )


def _q106_set_similarity_join(spark, sf_dir):
    """Prefix-filtered EXACT set-similarity self-join (operators/dedup.py::
    set_similarity_join — AllPairs/PPJoin family): every jaccard >= 0.5
    shingle pair over the FULL corpus with no quadratic pass. Rare-first
    canonical order makes prefix join buckets small by construction
    (built-in skew mitigation); a size filter prunes further; survivors
    get one exact verification. Losslessness is test-pinned against the
    brute-force quadratic (q17's path) and the oracle mirrors the SAME
    prefix-filter algorithm in SQL, so both engines run the scale
    algorithm — not the oracle-only quadratic."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import set_similarity_join

    _prep(spark)
    return set_similarity_join(_t(spark, sf_dir, "documents"), threshold=0.5)


def _q105_jpeg_decode_real(spark, sf_dir):
    """REAL baseline-JPEG decoding under the oracle gate (the JPEG leg of
    the q94/q95/q99 modality suite): payloads are genuine JPEG bytes built
    at the COEFFICIENT level (functions/jpeg.py::encode_jpeg_coeffs,
    DC-only blocks, quant step 8), decoded by the engine's pure-stdlib
    baseline decoder (marker parse + canonical Huffman + dequant + IDCT,
    NO imaging library) through the same mapInPandas operators as PNG
    (payload sniffing in decode_builtin_gray). A DC-only block with q=8
    decodes to the exact flat value DC+128, so the oracle recomputes every
    expected pixel from the closed form — a hash match proves the real
    entropy-decode + IDCT path, not merely stability."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_image_features,
        resize_image,
        synthetic_jpeg_media,
    )

    _prep(spark)
    media = synthetic_jpeg_media(spark, n=24)
    dims = decode_image_features(media, decoder="builtin").select(
        "media_id", "width", "height"
    )
    rs = resize_image(media, decoder="builtin", out_w=4, out_h=4).select(
        "media_id", "px_checksum", F.round("mean_px", 6).alias("mean_px")
    )
    return dims.join(rs, "media_id")


def _q112_jpeg_progressive_real(spark, sf_dir):
    """REAL PROGRESSIVE-JPEG decoding under the oracle gate (VERDICT r3 #4
    — real crawled corpora are heavily progressive): payloads are genuine
    SOF2 streams (functions/jpeg.py::encode_jpeg_coeffs_progressive — DC
    successive approximation + refinement, two AC spectral bands with EOB
    runs and correction-bit refinement scans) with NONZERO AC coefficients,
    decoded by the engine's pure-stdlib Annex-G decoder through the same
    mapInPandas operators as q105. Every pixel has the closed form
    128 + dc + sum c_k*8*B(u_k,x)*B(v_k,y) over the fixed zigzag pattern
    (orthonormal DCT basis), all > 1e-3 from rounding boundaries, so the
    oracle recomputes the expected pixels with cos() directly — a hash
    match proves the full progressive entropy decode (DC+AC first and
    refinement scans) AND the IDCT, not merely stability."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_image_features,
        resize_image,
        synthetic_progressive_jpeg_media,
    )

    _prep(spark)
    media = synthetic_progressive_jpeg_media(spark, n=24)
    dims = decode_image_features(media, decoder="builtin").select(
        "media_id", "width", "height"
    )
    rs = resize_image(media, decoder="builtin", out_w=16, out_h=16).select(
        "media_id", "px_checksum", F.round("mean_px", 6).alias("mean_px")
    )
    return dims.join(rs, "media_id")


def _q113_knn_dtw_multichannel(spark, sf_dir):
    """MULTICHANNEL exact-DTW KNN (VERDICT r3 #5): series are one vector
    per timestep (array<array<double>> — channel 0 = event value, channel 1
    = length(event_type)), scored by dependent DTW (one shared warp path,
    per-channel SUMMED |a-b| cost — the fastdtw package's own vector-point
    semantics). The kernels (functions/dtw_kernel.py dtw_pair/dtw_batch/
    fastdtw_batch) all take the (batch, length, channels) path, golden-
    tested against an independent O(n*m) multivariate DP. The oracle
    extends q70's recursive-CTE dynamic program with the 2-channel cost —
    the multivariate DTW *distance operator itself* is hash-checked."""
    events = _t(spark, sf_dir, "events").withColumn(
        "ch2", F.length("event_type").cast("double")
    )
    series = events_to_series(events, value=["value", "ch2"], length=SERIES_LEN)
    train, test = split_train_test(series)
    nn = knn_join(test, train, metric="dtw", band=None, k=3)
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q114_source_cap(spark, sf_dir):
    """Domain-frequency capping (operators/corpus.py::cap_per_source — the
    RefinedWeb/C4 per-domain cap): keep at most 20 docs per source,
    preferring highest token count (total order: n_tokens DESC, doc_id
    ASC). One rank window on the group key; WindowGroupLimit makes the
    per-map-partition limit partial, which is what tames the mega-domain
    skew case this operator exists for."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import cap_per_source

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    out = cap_per_source(docs, cap=20)
    return out.select("doc_id", "source", "n_tokens", F.col("rank").cast("int").alias("rank"))


def _q115_ann_pq(spark, sf_dir):
    """Product-quantization ANN with exact rerank (operators/similarity.py::
    ann_pq_topk — the FAISS IVF-PQ scoring shape, r4): per-subspace
    k-means codebooks (hash-ranked spread seeds, fixed-point refit), corpus
    quantized to 8 codes/vector (~32x less candidate-join traffic than
    brute float), per-query ADC distance tables broadcast into the
    code-space cross join, top-64 shortlist scored EXACTLY and re-ranked.
    The oracle replays the ENTIRE chain — subspace k-means training,
    encoding, the ordered ADC fold, shortlist, exact rerank — so the hash
    match proves PQ end-to-end (recall measured separately in tests:
    1.0 on clustered blobs at this shortlist)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_pq_topk

    _prep(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_pq_topk(q, emb, k=5, rerank=64)


def _q116_ann_ivfpq(spark, sf_dir):
    """Residual IVF-PQ (operators/similarity.py::ann_ivfpq_topk) — the
    full FAISS production index as ONE Catalyst plan: coarse k-means cells
    (q93's machinery) partition the corpus, PQ codebooks train on the
    RESIDUALS v - cell_centroid (Jegou et al. 2011 SIV), queries probe 4
    cells with a per-cell ADC table over their own residual, candidates
    score as ordered code-lookup folds, top-64 re-ranks exactly. The
    oracle replays the COMPLETE index build and search — coarse Lloyd
    training, residuals, subspace PQ training, encoding, per-cell ADC,
    shortlist, rerank. Measured recall vs brute-L2: 0.988 on clustered
    blobs (the index's design regime)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_ivfpq_topk

    _prep(spark)
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_ivfpq_topk(q, emb, k=5, n_lists=16, n_probe=4, rerank=64)


def _q104_duplicate_spans(spark, sf_dir):
    """Maximal cross-document duplicated token regions (operators/corpus.py
    ::duplicate_spans — the Lee et al. 2021 ExactSubstr dedup shape):
    stride-1 8-token windows hashed with the portable char-fold spec,
    windows in >= 2 distinct docs are duplicated, per-doc islands merged
    with the lag + running-sum trick. The shuffle key is the 8-byte hash,
    never the window text."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import duplicate_spans

    _prep(spark)
    return duplicate_spans(_t(spark, sf_dir, "documents"), n=8, min_docs=2)


def _q117_bm25(spark, sf_dir):
    """Okapi BM25 top-10 retrieval (operators/corpus.py::bm25_topk) — the
    standard lexical ranker for RAG / retrieval pipelines, as one Catalyst
    plan: (doc, term, dl) tf groupBy, vocabulary-sized df table, broadcast
    query-term list, cents-trick integer score sum, WindowGroupLimit
    top-k. Query workload: every doc_id % 23 == 0 document's first 6
    tokens. Engine extension beyond the reference surface."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import bm25_topk

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens_fn(F.col("text")), 1, 6)).alias(
            "query_text"
        ),
    )
    return bm25_topk(docs, qs, k=10)


def _q123_knn_chunked(spark, sf_dir):
    """The chunked block-scorer KNN (operators/knn.py::_knn_chunked, r5) —
    the too-big-to-broadcast regime where neither a driver collect
    (strategy='kernel') nor a broadcast join is allowed: test x train tiles
    into block cells via ONE hash-assign shuffle per side, each cell scored
    by the kernel's numpy/C metrics inside applyInPandas, global
    WindowGroupLimit rerank. Ranks are identical to every other strategy
    (distance floats may differ from the SQL fold in the last ulp, hence
    the rank-only projection — same contract as q09, whose oracle this
    shares)."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="euclidean", k=5, strategy="chunked")
    return nn.select("test_id", "train_id", "rank")


def _q124_ann_quantized_chunked(spark, sf_dir):
    """The chunked block scorer through the INT8-quantized ANN
    (operators/similarity.py::ann_quantized_topk(strategy='chunked')) —
    q90's workload with the no-broadcast physical plan. Because every
    accumulated quantity is an exact int64 and the final distance is two
    correctly-rounded IEEE ops, the chunked result is bit-identical to
    kernel AND declarative — so unlike q123 (rank-only), this entry
    hash-proves the chunked path on FULL columns: q90's oracle replays
    verbatim."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.similarity import ann_quantized_topk

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    return ann_quantized_topk(q, emb, k=5, strategy="chunked")


def _q119_bm25_pruned(spark, sf_dir):
    """BM25 with impact-ordered posting truncation (operators/corpus.py::
    bm25_topk(max_postings=20)) — the hot-term skew guard for 100 TB
    corpora: each query term keeps its 20 highest-contribution matches
    (exact micro-unit order, WindowGroupLimit-bounded map-side) before the
    per-query sum, so a stopword-ish term can never turn the match
    shuffle corpus-sized. Same workload as q117."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import bm25_topk

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens_fn(F.col("text")), 1, 6)).alias(
            "query_text"
        ),
    )
    return bm25_topk(docs, qs, k=10, max_postings=20)


def _q120_bm25_served(spark, sf_dir):
    """BM25 through the build-once/serve-many split (operators/corpus.py::
    bm25_build + bm25_search, r5 — the persistence mirror of
    ivfpq_build/ivfpq_search): the corpus-sized index (tf partitioned-by-
    term-able, vocabulary-sized df, 1-row stats) is built once; the serve
    call joins only the query vocabulary against it — no corpus scan per
    query batch. Result contract: bit-identical to q117 (same workload,
    same oracle chain), which is exactly what the oracle checks."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bm25_build,
        bm25_search,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens_fn(F.col("text")), 1, 6)).alias(
            "query_text"
        ),
    )
    return bm25_search(qs, bm25_build(docs), k=10)


def _q121_bm25_wand(spark, sf_dir):
    """LOSSLESS dynamic-pruned BM25 (operators/corpus.py::
    bm25_search_pruned) — the exact WAND-flavored sibling of q119's static
    truncation, same filter-and-verify shape as knn_join_lb: top-5
    impact-ordered postings per query term, exact re-score of surviving
    candidates, per-query completeness certificate (tail-bound sum vs the
    k-th exact candidate score), and full-scoring ESCALATION for queries
    the certificate can't prove. Result contract: identical to unpruned
    q117 for every query — the oracle IS the full-chain replay. max_postings=5
    is deliberately aggressive so the gate exercises both the proven path
    and the escalation path on real data."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bm25_build,
        bm25_search_pruned,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens_fn(F.col("text")), 1, 6)).alias(
            "query_text"
        ),
    )
    # serving contract (bm25_search_pruned docstring): the index is
    # persisted/cached — the WAND plan reads tf in both the rank pass and
    # the verify pass, and caching is what a serving job does; without it
    # the tokenize+groupBy chain would re-execute per branch
    index = {n: t.cache() for n, t in bm25_build(docs).items()}
    return bm25_search_pruned(qs, index, k=10, max_postings=5)


def _q122_bm25_wand_certificate(spark, sf_dir):
    """The VERIFY pass of q121, oracled on its own (r4 verdict #7: 'with
    the verify pass oracled'): per query — candidate count after top-5
    posting truncation, theta (k-th exact candidate score, micro-units),
    the admissible tail-bound sum over truncated terms, and the proven
    flag (tail_sum == 0 OR (n_cand >= k AND tail_sum < theta)). The DuckDB
    twin replays the whole certificate computation."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        bm25_build,
        bm25_search_pruned,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    qs = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens_fn(F.col("text")), 1, 6)).alias(
            "query_text"
        ),
    )
    index = {n: t.cache() for n, t in bm25_build(docs).items()}
    return bm25_search_pruned(
        qs, index, k=10, max_postings=5, certificate=True
    )


def _q118_hybrid_retrieval(spark, sf_dir):
    """Hybrid lexical+semantic retrieval with reciprocal-rank fusion
    (operators/corpus.py::rrf_fuse; Cormack et al. 2009) — the production
    RAG recipe: a BM25 top-10 leg (q117's workload) and a cosine-ANN
    top-10 leg over the same id space (documents.doc_id == embeddings
    .vec_id in the testdata schema), fused by 1/(60 + rank) with
    micro-unit integer sums. Both legs are workload-bounded, so fusion
    never touches the corpus."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        ann_brute_topk,
        bm25_topk,
        rrf_fuse,
    )

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    qs = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("query_id"),
        F.concat_ws(" ", F.slice(tokens_fn(F.col("text")), 1, 6)).alias(
            "query_text"
        ),
    )
    lex = bm25_topk(docs, qs, k=10)
    sem = ann_brute_topk(
        emb.filter(F.col("vec_id") % 23 == 0), emb, k=10, strategy="kernel"
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lex, sem], k=10)


_QUALITY_LABEL_CHARS = 290  # weak-label spec constant (see q125 docstring)


def _quality_labeled_features(spark, sf_dir):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.caching import register_cache
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import doc_quality_features

    docs = _t(spark, sf_dir, "documents")
    feats = doc_quality_features(docs)
    labels = docs.select(
        "doc_id",
        F.when(F.col("n_chars") > _QUALITY_LABEL_CHARS, 1)
        .otherwise(-1)
        .alias("y"),
    )
    # featurize ONCE: every training epoch (and the serve pass) rescans
    # this table — (id, x[5] int64, y) is ~50 bytes/doc vs KBs of text, so
    # caching it is the persistable-feature-table shape, not a corpus pin
    return register_cache(feats.join(labels, "doc_id").cache())


def _q125_quality_classifier(spark, sf_dir):
    """Trained quality classifier (operators/classify.py::
    train_quality_perceptron) — the CCNet/fastText curation recipe as a
    distributed operator: a cheap weak label (here n_chars > 290,
    standing in for seed-set membership — the signal you have on a
    labeled sliver and want everywhere) is distilled into a linear model
    over integer token-count features. Averaged batch perceptron, 4
    epochs, every margin/gradient an exact order-free int64 — so the
    TRAINED WEIGHTS themselves are hash-provable: the oracle replays all
    4 epochs as chained CTEs (the q87 k-means trick applied to gradient
    descent). Measured train accuracy 0.99 at sf0.01 (majority class
    0.53). Per epoch: one column-pruned corpus scan, weights ride as
    codegen literals, driver traffic = dim rows."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import train_quality_perceptron

    _prep(spark)
    return train_quality_perceptron(
        _quality_labeled_features(spark, sf_dir), epochs=4
    )


def _q126_quality_filter(spark, sf_dir):
    """The serve side of q125 (operators/classify.py::score_with_weights):
    apply the trained weights to every document — exact int64 dot score,
    kept = score > 0. Fully declarative: the dim-row model aggregates to
    one array row, broadcasts into the corpus scan, and the filter runs
    wherever the corpus lives (zero corpus shuffles — the shape a 100 TB
    quality filter needs). The oracle replays training AND scoring."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        score_with_weights,
        train_quality_perceptron,
    )

    _prep(spark)
    labeled = _quality_labeled_features(spark, sf_dir)
    w = train_quality_perceptron(labeled, epochs=4)
    return score_with_weights(labeled, w)


def _q127_series_features(spark, sf_dir):
    """Per-series feature extraction (operators/features.py::
    series_features) — the feature-based-classification escape hatch from
    the reference's pairwise-distance paradigm: 9 shape/dynamics
    statistics (mean, variance, extrema, mean |Δ|, zero crossings, peaks,
    lag-1 autocorrelation) as pure per-row left-fold expressions. One
    scan, ZERO shuffles beyond the series build itself — at 100 TB this
    replaces the O(n·m)-per-pair cross join with O(n)-per-series work
    (feed the vectors to classify.py's perceptron, kmeans, or the ANN
    family). Every fold is IEEE-order-mirrored by the DuckDB oracle."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import series_features
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    events = _t(spark, sf_dir, "events")
    series = events_to_series(events, length=SERIES_LEN)
    return series_features(series)


def _q128_epoch_sweep(spark, sf_dir):
    """Training-curve sweep for the learned quality filter (operators/
    classify.py::perceptron_epoch_sweep) — the epochs analog of q28's
    k-sweep (the reference sweeps KNN's k at Team11-Project.py:237-476;
    this sweeps the perceptron's one capacity knob). Per epoch: the exact
    integer n_correct of the deployable averaged model on the training
    corpus. The oracle replays every epoch AND every count — the whole
    learning curve is hash-proven."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import perceptron_epoch_sweep

    _prep(spark)
    return perceptron_epoch_sweep(
        _quality_labeled_features(spark, sf_dir), epochs=4
    )


def _q129_stump(spark, sf_dir):
    """Exact decision-stump induction (operators/classify.py::
    train_stump) — threshold-RULE learning for curation filters, the
    fully-declarative sibling of the perceptron: NO epochs, NO driver
    loop; one (dim, value) groupBy shuffle, one running-sum window over
    the pre-aggregated value table, one TakeOrdered top-1. The winning
    (dim, threshold, polarity, exact error count) rule on the q125
    weak-label workload."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import train_stump

    _prep(spark)
    return train_stump(_quality_labeled_features(spark, sf_dir))


def _q130_stump_filter(spark, sf_dir):
    """The serve side of q129 (operators/classify.py::score_stump):
    the 1-row learned rule broadcasts into the corpus scan, kept =
    predicted > 0. The oracle replays rule induction AND scoring."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        score_stump,
        train_stump,
    )

    _prep(spark)
    labeled = _quality_labeled_features(spark, sf_dir)
    return score_stump(labeled, train_stump(labeled))


def _q131_series_classifier(spark, sf_dir):
    """Feature-space time-series classification, composed end-to-end
    under ONE oracle: events -> series (q08) -> shape/dynamics features
    (q127) -> fixed-scale integer quantization -> averaged perceptron
    (q125's machinery, dim=6) on a 1-vs-rest label (label == 'click').
    The scale story: this pipeline is O(n) per series with zero pair
    joins — the alternative the reference's O(n*m)-per-PAIR KNN needs at
    100 TB. Honest measurement: on THIS testdata the event values carry
    no label signal (accuracy ~= majority, same information-theoretic
    wall as ann_lsh probes=0 on structureless data — q12's KNN is the
    graded accuracy surface); the HAR fixture test
    (tests/test_features.py) pins 1.0 train accuracy where structure
    exists. The graded rows are the trained weights — hash-proven
    through series build, ten feature folds, rounding, and four training
    epochs."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.caching import register_cache
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        series_features,
        train_quality_perceptron,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    events = _t(spark, sf_dir, "events")
    series = events_to_series(events, length=SERIES_LEN)
    feats = series_features(series)
    x = F.array(
        F.lit(1).cast("long"),
        F.round(F.col("mean") * 100).cast("long"),
        F.round(F.col("mean_abs_change") * 100).cast("long"),
        F.round(F.col("acf1") * 1000).cast("long"),
        (F.col("zero_crossings") * 100).cast("long"),
        (F.col("n_peaks") * 100).cast("long"),
    )
    labeled = (
        feats.join(series.select("series_id", "label"), "series_id")
        .select(
            F.col("series_id").alias("doc_id"),
            x.alias("x"),
            F.when(F.col("label") == "click", 1).otherwise(-1).alias("y"),
        )
    )
    # featurize once: epochs + the dim probe rescan this tiny table
    labeled = register_cache(labeled.cache())
    return train_quality_perceptron(labeled, epochs=4)


# SAX / subsequence-analytics geometry (q132-q137) — FIXED constants shared
# with the DuckDB oracles below
_SAX_NSEG, _SAX_A = 8, 4            # whole-series symbolization (q132/q133)
_MP_M, _MP_EXCL = 8, 4              # matrix-profile window / exclusion zone
_BOP_NSEG, _BOP_A = 4, 4            # per-window SAX word geometry (q136/q137)


def _q132_sax_symbols(spark, sf_dir):
    """SAX symbolization (operators/sax.py::sax_symbolize — Lin et al.
    2003): znorm -> PAA -> equiprobable-Gaussian-breakpoint discretization,
    each series compressed to an 8-char word. Pure per-row codegen folds,
    ZERO shuffles beyond the series build — the byte-frugal representation
    the reference's raw-vector pipeline (Team11-Project.py:122, full
    561-double rows through every join) lacks at 100 TB. Every fold
    (mean, var, segment means, breakpoint counts) is IEEE-order-mirrored
    by the oracle."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import sax_symbolize
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    out = sax_symbolize(
        series, n_segments=_SAX_NSEG, alphabet_size=_SAX_A, length=SERIES_LEN
    )
    return out.select("series_id", "label", "sax_word")


def _q133_sax_knn(spark, sf_dir):
    """Symbol-space KNN classification (operators/sax.py::
    sax_knn_classify): the q10 classifier re-run on SAX words — MINDIST^2
    ranking (a LOWER BOUND of Euclidean on the z-normalized originals)
    with the reference's heapq tie order (Team11-Project.py:180) and
    Counter-parity vote. The cross join moves 8 small ints per series
    instead of 16 doubles (561 -> 8 at reference scale: ~1/280th the
    bytes) — the scale answer when even the PAA-pruned raw join is too
    heavy."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import sax_knn_classify, sax_symbolize

    _prep(spark)
    train, test = _series(spark, sf_dir)
    tr = sax_symbolize(
        train, n_segments=_SAX_NSEG, alphabet_size=_SAX_A, length=SERIES_LEN
    )
    te = sax_symbolize(
        test, n_segments=_SAX_NSEG, alphabet_size=_SAX_A, length=SERIES_LEN
    )
    return sax_knn_classify(
        te,
        tr,
        k=5,
        alphabet_size=_SAX_A,
        length=SERIES_LEN,
        n_segments=_SAX_NSEG,
    )


def _q134_matrix_profile(spark, sf_dir):
    """Matrix profile (operators/motif.py::matrix_profile — Yeh et al.
    2016): each length-8 window's nearest non-trivial neighbor WITHIN its
    series (z-normalized sq-Euclidean, exclusion zone 4). Default plan
    (r9): the map-only Arrow kernel — a row IS a whole series, so the
    per-series quadratic runs vectorized with ZERO shuffles; bit-equal
    (test-pinned) to the declarative twin (windows explode + ONE
    series_id-shuffled self-join + WindowGroupLimit min with (d,
    nn_start) total order), which this oracle mirrors. The
    subsequence-anomaly primitive the reference's whole-series KNN cannot
    express."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import matrix_profile
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return matrix_profile(series, _MP_M, exclusion=_MP_EXCL)


def _q135_series_discords(spark, sf_dir):
    """Discord/motif selection over the matrix profile (operators/
    motif.py::series_discords): per series, the window whose nearest
    neighbor is farthest (the anomaly) and nearest (the repeated shape).
    Both ranks share one partitioning — a single extra shuffle over
    q134's profile."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import matrix_profile, series_discords
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return series_discords(matrix_profile(series, _MP_M, exclusion=_MP_EXCL))


def _q136_motif_words(spark, sf_dir):
    """Corpus-scale motif counting (operators/motif.py::motif_words):
    every sliding window -> SAX word, aggregated globally into
    (word, n_windows, n_series). The shuffle key space is BOUNDED by
    alphabet^segments (256 here), so 'what shapes recur across the
    corpus' stays one bounded-key aggregation at 100 TB — the
    cross-series scale path where the exact per-series matrix profile
    (q134) would be quadratic."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import motif_words
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return motif_words(
        series, _MP_M, n_segments=_BOP_NSEG, alphabet_size=_BOP_A
    )


def _q137_bop_classify(spark, sf_dir):
    """Bag-of-Patterns classification (Lin et al. 2012; operators/
    motif.py::bop_histograms + bop_classify): windows -> SAX words ->
    numerosity-reduced per-series histograms -> 1-NN under the EXACT
    integer squared histogram distance ||a||^2+||b||^2-2<a,b> (sparse
    word-join dot product; int64 end to end, no float-order hazards).
    The norm cross join moves 2 ints per pair vs the reference's full
    feature rows."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import bop_classify, bop_histograms

    _prep(spark)
    train, test = _series(spark, sf_dir)
    th = bop_histograms(
        test.drop("label"), _MP_M, n_segments=_BOP_NSEG, alphabet_size=_BOP_A
    )
    rh = bop_histograms(
        train, _MP_M, n_segments=_BOP_NSEG, alphabet_size=_BOP_A
    )
    return bop_classify(th, rh, k=1)


def _q138_knn_weighted(spark, sf_dir):
    """Distance-weighted KNN vote (operators/vote.py::weighted_vote): the
    standard wkNN refinement of the reference's unweighted Counter vote —
    each of the 5 nearest neighbors votes with weight 1/(1+d). Float
    weight sums fold over the RANK-SORTED neighbor array (never an
    order-undefined groupBy float sum), so the oracle's
    list(... ORDER BY rank) fold is bit-identical."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join, weighted_vote

    _prep(spark)
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="euclidean", k=5, strategy="broadcast")
    return weighted_vote(nn, dist="distance")


def _q139_knn_regress(spark, sf_dir):
    """KNN regression (operators/vote.py::knn_regress_predict): predict a
    numeric per-series target (the series' mean value) as the mean of the
    5 nearest neighbors' targets — the regression twin of q10's vote,
    sharing the identical neighbor plan (J2/J3 + K1). The prediction mean
    folds in rank order for cross-engine determinism; output carries the
    actual target so the oracle hashes the full (prediction, actual)
    surface."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join, knn_regress_predict

    _prep(spark)
    train, test = _series(spark, sf_dir)
    target = (
        F.aggregate(F.col("features"), F.lit(0.0), lambda a, v: a + v)
        / F.size("features").cast("double")
    )
    train_t = train.select(
        F.col("series_id").alias("train_id"), target.alias("train_target")
    )
    nn = knn_join(test, train, metric="euclidean", k=5, strategy="broadcast")
    nb = nn.join(train_t, "train_id")
    pred = knn_regress_predict(nb)
    actual = test.select(
        F.col("series_id").alias("test_id"), target.alias("actual")
    )
    return pred.join(actual, "test_id")


# q140 query pattern: a spike shape, z-normalized driver-side with the
# engine's fold order; BOTH the Spark literal and the oracle literal embed
# the identical normalized floats
_Q140_PATTERN_RAW = [0.0, 0.5, 2.0, 4.0, 2.0, 0.5, 0.0, -0.5]


def _q140_subsequence_search(spark, sf_dir):
    """Anchored subsequence search (operators/motif.py::
    subsequence_search): top-25 windows across the WHOLE corpus closest to
    a given query pattern (z-normalized sq-Euclidean). Map-only window
    explode, pattern shipped as a plan literal (no join), then
    TakeOrderedAndProject — per-partition top-k, k-row driver merge, NO
    global sort shuffle. The 'find this shape in 100 TB of telemetry'
    primitive."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import subsequence_search
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return subsequence_search(series, _Q140_PATTERN_RAW, k=25)


def _q141_knn_cv(spark, sf_dir):
    """k-fold cross-validation in ONE plan (operators/evaluate.py::
    knn_cross_validate — the fold analog of q28's k-sweep trick): every
    series is a test row once (fold = id % 4), neighbors come from the
    other folds via a single fold-inequality cross join, and all four
    per-fold accuracies come out of one WindowGroupLimit + vote +
    aggregate chain. Loop-based CV would run the reference's full cross
    product 4 times (Team11-Project.py re-ran ~20 cluster-minutes per
    hyperparameter point); this is the same pair volume as ONE run."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_cross_validate
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return knn_cross_validate(series, folds=4, k=5)


def _q143_ts_kmedoids(spark, sf_dir):
    """DTW k-medoids clustering (operators/cluster.py::ts_kmedoids): the
    clustering sibling of the reference's KNN classifier — PAM-style
    seed -> assign -> medoid-update -> reassign where the centroid is an
    actual corpus series, so DTW (no mean defined) clusters without
    barycenter math. Spread-hash seeds (q72 spec), micro-rounded distances
    before every decision (integer-exact argmins on any engine/partition
    order), total-order tie-breaks. The oracle replays the ENTIRE
    algorithm: the q70 recursive-CTE DTW builds the pair-distance matrix,
    then window argmins mirror both assignment passes and the
    sum-of-distances medoid update — an iterative clustering algorithm
    with a hash-graded proof (the q102/q125 playbook). Spark computes only
    the staged pairs (n*k + within-cluster); the oracle's full matrix is a
    superset, so the staged results coincide."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ts_kmedoids
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return ts_kmedoids(series, k=4, metric="dtw")


def _q145_sbd_kmedoids(spark, sf_dir):
    """k-medoids under shape-based distance — the k-Shape-flavored
    clustering (cluster by cross-correlation shape similarity, not
    warping): ts_kmedoids(metric='sbd') composes q143's PAM machinery
    with q142's distance, and because sbd() is a pure Catalyst expression
    the WHOLE clustering algorithm is declarative — zero Python, every
    stage whole-stage-codegen'd. Distances are micro-rounded before every
    decision, and since Spark and DuckDB compute the sbd folds bit-
    identically, the micro table is exactly equal on both sides. The
    oracle merges q142's fold SQL into q143's full-replay chain."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ts_kmedoids
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return ts_kmedoids(series, k=4, metric="sbd")


def _q146_rocket_features(spark, sf_dir):
    """ROCKET-family convolutional series features (operators/features.py::
    rocket_features; Dempster et al. 2020/2021): 12 deterministic
    MiniROCKET-shaped integer kernels (beta=+2 at 3 of 7 positions,
    alpha=-1, dilations 1/2), per kernel the PPV and max of the dilated
    convolution sweep. Pure per-row Catalyst projection — no shuffle, no
    UDF, no pair matrix: the O(n)-per-series convolutional alternative to
    the DTW cross join (q127's statistical features, upgraded to shape-
    sensitive conv features). Integer kernel weights make the oracle
    trivial-exact: the convolution is an integer combination of input
    doubles, mirrored term-for-term."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import rocket_features
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return rocket_features(series, n_kernels=12)


def _q147_rocket_knn(spark, sf_dir):
    """Series classification IN ROCKET FEATURE SPACE: q146's 24 conv
    features assembled into a fixed-dim vector, then the reference's own
    Model-2 pipeline (euclidean 5-NN + majority vote, q10) over the
    vectors — the published ROCKET recipe with the linear classifier
    swapped for the engine's KNN. At 100 TB this replaces the
    O(len^2)-per-pair DTW matrix with an O(len)-per-row projection and a
    24-dim distance — the pair stage cost drops by ~len^2/24. Oracle:
    q146's feature SQL feeds q09/q10's exact KNN+vote chain."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import rocket_features

    _prep(spark)
    train, test = _series(spark, sf_dir)
    names = [n for i in range(12) for n in (f"k{i}_ppv", f"k{i}_max")]
    vec = lambda df: rocket_features(df, n_kernels=12).select(
        "series_id", F.array(*names).alias("features"), "label"
    )
    return knn_classify(vec(test), vec(train), metric="euclidean", k=5)


def _q148_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition (operators/features.py::
    seasonal_decompose — the statsmodels/pre-STL textbook method), period
    4: centered 2x4 moving-average trend (half-weight endpoints, the
    quarterly convention), per-phase detrended means centered to zero as
    the seasonal component, residual as the remainder. One row per
    (series, interior position). Pure per-row folds + one explode — no
    shuffle, no UDF, scan-bound at 100 TB like q127/q146. Every sum is a
    position-ascending left fold and every mean one IEEE division, so the
    oracle reproduces the decomposition bit-for-bit."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import seasonal_decompose
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return seasonal_decompose(series, period=4)


def _q149_dba_barycenters(spark, sf_dir):
    """DTW Barycenter Averaging (operators/barycenter.py::dba_update;
    Petitjean et al. 2011) seeded by q143's medoids — one DBA iteration of
    DTW k-means: assign with ts_kmedoids, then every member aligns to its
    cluster medoid under INTEGER-quantized DTW (micro costs -> exact int64
    DP, fixed diagonal/up/left tie rule) and each barycenter coordinate
    becomes the mean of its aligned member values (micro-int sums, one
    IEEE division). The oracle replays the warping PATH itself — a DP
    recursion accumulating the full integer cost matrix, then a second
    recursion walking the backtrace — on top of the q143 k-medoids replay:
    three chained recursive algorithms under one hash."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dba_update, ts_kmedoids
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.caching import register_cache

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    # bounded (one row per series); two consumers (members + medoid join)
    asn = register_cache(ts_kmedoids(series, k=4, metric="dtw").cache())
    members = series.join(
        asn.select("series_id", F.col("medoid_id").alias("bary_id")), "series_id"
    )
    meds = asn.select(F.col("medoid_id").alias("bary_id")).distinct()
    barys = meds.join(
        series, meds["bary_id"] == series["series_id"]
    ).select("bary_id", F.col("features").alias("bary_features"))
    return dba_update(members, barys)


def _q150_dtw_kmeans(spark, sf_dir):
    """Full DTW k-means iteration (operators/barycenter.py::
    dtw_kmeans_dba, iters=1): medoid seeding (q143) -> DBA barycenter
    update (q149) -> reassignment of every series to its nearest REFINED
    barycenter under exact DTW. The oracle chains FIVE recursions — the
    k-medoids pair matrix, the k-medoids replay, the integer DP, the
    backtrace walk, and a final double-cost DTW recursion between every
    series and the refined (real-valued) barycenters — and hash-proves
    the resulting assignment. The warping-aware Lloyd loop the
    reference's classification-only surface never had."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dtw_kmeans_dba
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return dtw_kmeans_dba(series, k=4, iters=1)


def _q151_holt_forecast(spark, sf_dir):
    """Holt linear-trend exponential smoothing (operators/forecast.py::
    holt_forecast): the classic level/trend recurrence folded left-to-
    right per series from the exact post-t=2 state (alpha=0.5, beta=0.25 —
    binary-exact constants), plus
    1-step and 4-step forecasts level + h*trend. The recurrence IS one
    Catalyst aggregate with a 2-element array state — no shuffle, no UDF,
    scan-bound. RAW doubles (q148 lesson: mirrored folds are bit-equal;
    rounding only desyncs). The oracle runs the identical fold with
    [x, 0.0]-padded elements (list_reduce needs uniform element types)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import holt_forecast
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return holt_forecast(series, alpha=0.5, beta=0.25, horizons=(1, 4))


def _q152_residual_anomalies(spark, sf_dir):
    """Decomposition-residual anomaly detection (composes q148, the
    STL-residual-threshold recipe): a position is anomalous when its
    seasonal-decomposition residual exceeds 3 robust-sigma —
    integer-exactly, rm^2 * n > 9 * sum(rm^2) over micro-rounded
    residuals, so the flag is an order-free integer comparison (no float
    groupBy sums, no sqrt). Output: every interior position with its
    residual micro value and flag. One extra (series) groupBy over q148's
    scan-bound decomposition."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import seasonal_decompose
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    d = seasonal_decompose(series, period=4).select(
        "series_id", "t",
        F.round(F.col("resid") * 1_000_000).cast("long").alias("resid_micro"),
    )
    # decimal(38,0) arithmetic for the comparison (self-review r5): long
    # rm^2*n wraps silently past ~9.2e18 (residual ~300 already reaches
    # 1e17 squared) while the DuckDB side computes in HUGEINT — decimal38
    # is Spark's exact 128-bit twin, so both engines stay exact and equal
    rm_d = F.col("resid_micro").cast("decimal(38,0)")
    stats = d.groupBy("series_id").agg(
        F.sum(rm_d * rm_d).alias("_ss"),
        F.count(F.lit(1)).alias("_n"),
    )
    return d.join(stats, "series_id").select(
        "series_id", "t", "resid_micro",
        (
            rm_d * rm_d * F.col("_n").cast("decimal(38,0)")
            > F.lit(9).cast("decimal(38,0)") * F.col("_ss")
        ).alias("is_anomaly"),
    )


def _q153_dba_classify(spark, sf_dir):
    """Nearest-DBA-prototype classification (operators/barycenter.py::
    dba_classify) — the SCALE answer to the reference's own problem: one
    DBA barycenter per class (supervised: members grouped by label,
    assignments never move), test series labeled by nearest prototype
    under exact DTW. Scoring cost O(n_test * n_classes) vs the
    reference's O(n_test * n_train) cross join. Oracle: per-class
    spread-hash seeds, the integer-DP + backtrace-walk recursions
    aligning every train series to its class seed, barycenter rebuild,
    and a final double-cost DTW recursion of every test series against
    the k class prototypes — hash-proving predictions end to end."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dba_classify

    _prep(spark)
    train, test = _series(spark, sf_dir)
    return dba_classify(test, train)


def _q154_cusum_changepoint(spark, sf_dir):
    """CUSUM change-point detection (operators/features.py::
    cusum_changepoint; Page 1954): per series the argmax over t of
    |S_t - (t/n) S_n| — the mean-shift first-split statistic — plus the
    before/after means. Prefix sums ride as ONE array-state fold, the
    argmax one more fold with a (stat desc, t asc) preference; a per-row
    projection, no shuffle, no UDF. Raw doubles (q148 lesson); the
    oracle mirrors the prefix fold and replaces the argmax fold with the
    equivalent (stat DESC, t ASC) row_number — decisions coincide because
    the stat doubles are bit-equal."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import cusum_changepoint
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return cusum_changepoint(series)


def _q155_holt_winters(spark, sf_dir):
    """Holt-Winters additive triple exponential smoothing (operators/
    forecast.py::holt_winters_forecast; Winters 1960), period 4: level +
    trend + a rotating 4-slot seasonal vector as ONE aggregate with a
    7-element array state — the phase counter rides IN the state (fold
    lambdas see no index) and each step patches exactly one seasonal
    slot. Textbook two-period init; forecasts l + h*b + s_phase(n+h).
    Binary-exact constants (0.5/0.25/0.5), raw doubles; the oracle folds
    [x]-padded elements through the identical recurrence."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import holt_winters_forecast
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import events_to_series

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return holt_winters_forecast(series, period=4, horizons=(1, 4))


def _q156_knn_dtw_mc_pruned(spark, sf_dir):
    """MULTICHANNEL exact pruned DTW KNN (r6, VERDICT r5 #5): q113's
    dependent-DTW brute force re-run through operators/knn.py::knn_join_lb
    with channel-wise envelope/PAA sketches. Per-channel LB_paa bounds sum
    to an admissible bound on the shared-warp-path summed cost, so the
    filter-and-verify chain stays LOSSLESS on nested input — this query's
    oracle is deliberately q113's brute-force recursive-CTE DP verbatim:
    hash equality proves the pruned plan returns bit-identical neighbors.
    Candidate budget deliberately starved (C = k) so phase 3 does real
    completeness work at the gate scale."""
    events = _t(spark, sf_dir, "events").withColumn(
        "ch2", F.length("event_type").cast("double")
    )
    series = events_to_series(events, value=["value", "ch2"], length=SERIES_LEN)
    train, test = split_train_test(series)
    nn = knn_join_lb(
        test,
        train,
        metric="dtw",
        band=None,
        k=3,
        length=SERIES_LEN,
        channels=2,
        candidates_per_test=3,
    )
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q157_shapelet_rule(spark, sf_dir):
    """Shapelet discovery (r6; operators/shapelet.py::shapelet_stump —
    Ye & Keogh 2009 made integer-exact): deterministic spread-hash
    candidate subsequences (2 series/class, length 8, stride 4) ->
    per-series min-subsequence squared distances (ascending-j folds,
    micro-rounded BIGINT) -> the classify.py stump search for the
    minimum-error (candidate, threshold, polarity) rule, one-vs-rest on
    the majority label. The oracle replays candidate selection, every
    distance fold, and the stump argmin under the shared total order."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import shapelet_stump

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return shapelet_stump(series, window=8, stride=4, per_class=2)


def _q158_ar_forecast(spark, sf_dir):
    """AR(2)-with-intercept least squares per series (r6; operators/
    forecast.py::ar_forecast): eight normal-equation sums in ONE
    ascending-t fold, 3x3 Cramer solve as a fixed expression tree,
    recursive 1- and 2-step forecasts. Raw doubles (the q148 rule); the
    oracle mirrors each sum as its own ascending left fold (identical
    per-element arithmetic and accumulation order -> bit-equal), then
    the same Cramer tree. NULL fit on short (<5 pts) or singular
    (constant) series."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ar_forecast

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return ar_forecast(series, horizons=(1, 2))


def _q159_sbd_1nn_lag(spark, sf_dir):
    """Lead-lag alignment (r6; functions/distance.py::sbd_align): each
    test series' SBD-nearest train neighbor PLUS the shift that best
    aligns them — lag = argmax_s sum_t a[t+s]*b[t] (b delayed by L ->
    lag = -L, sign pinned in tests), first-match tie-break on the exact
    max correlation. One struct expression shares the cross-correlation
    sweep between distance and argmax; the oracle extends q142's
    bit-exact fold mirror with list_position."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.distance import sbd_align

    _prep(spark)
    train, test = _series(spark, sf_dir)
    t = test.select(F.col("series_id").alias("test_id"), F.col("features").alias("_tf"))
    r = train.select(
        F.col("series_id").alias("train_id"),
        F.col("features").alias("_rf"),
        F.col("label").alias("train_label"),
    )
    pairs = (
        t.crossJoin(F.broadcast(r))
        .withColumn("_r", sbd_align(F.col("_tf"), F.col("_rf")))
        .filter(F.col("_r.sbd") != 0)
    )
    w = Window.partitionBy("test_id").orderBy(
        F.asc("_r.sbd"), F.asc("train_label"), F.asc("train_id")
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "test_id",
            "train_id",
            F.col("_r.lag").alias("lag"),
            F.round("_r.sbd", 6).alias("sbd"),
        )
    )


def _q160_mann_kendall(spark, sf_dir):
    """Mann-Kendall monotone-trend test per series (r6; operators/
    features.py::mann_kendall): S = sum_{i<j} sign(x_j - x_i) — a pure
    INTEGER statistic, exact on any engine/partitioning; tau = S / pairs
    is the one IEEE division. O(len^2) per row, never corpus-quadratic."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import mann_kendall

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return mann_kendall(series)


def _q161_theil_sen(spark, sf_dir):
    """Theil-Sen robust trend line per series (r6; operators/features.py::
    theil_sen): median of all pairwise slopes + median residual level as
    the intercept — explicit sort + element-pick medians (even counts
    average the middle two), so the whole estimator is order-exact and
    the oracle mirrors it value-for-value."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import theil_sen

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return theil_sen(series)


def _q162_knn_lcss(spark, sf_dir):
    """LCSS-distance KNN (r6; functions/edit_distance.py::lcss_dist —
    Vlachos et al. ICDE 2002): longest-common-subsequence alignment under
    a match tolerance (eps=10, ~0.2 sigma of events.value), distance =
    1 - LCSS/min(n, m). The ENTIRE DP runs as a pure Catalyst nested fold
    (outer aggregate over rows, inner aggregate building each row with the
    acc[-1] left-cell dependency) — an integer-state KNN metric with ZERO
    Python. The oracle replays the identical DP as a q70-style recursive
    CTE; integer state means exactness needs no rounding anywhere."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="lcss", k=3)
    return nn.select("test_id", "train_id", "rank", "distance")


def _q163_knn_edr(spark, sf_dir):
    """EDR-distance KNN (r6; edit distance on real sequences, Chen et al.
    SIGMOD 2005) through strategy='kernel': the anti-diagonal batched
    numpy DP (functions/edit_distance.py::edr_batch) scores each Arrow
    test batch against the broadcast train matrix — integer edit counts,
    so the kernel, the Catalyst fold twin, and the recursive-CTE oracle
    agree exactly by construction (kernel==expression pinned in
    tests/test_edit_distance.py)."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="edr", k=3, strategy="kernel")
    return nn.select("test_id", "train_id", "rank", "distance")


def _q164_knn_erp(spark, sf_dir):
    """ERP-distance KNN (r6; edit distance with real penalty, Chen & Ng
    VLDB 2004 — the edit-family member that is a TRUE metric) through
    strategy='kernel'. Float DP, but every cell is one IEEE add + an exact
    3-way min on top of predecessor cells, so cell values are identical
    whatever order they're evaluated in: the numpy anti-diagonal kernel
    hash-matches the DuckDB row-by-row recursive CTE to the last ulp —
    no round() anywhere in this query."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="erp", k=3, strategy="kernel")
    return nn.select("test_id", "train_id", "rank", "distance")


def _q165_knn_twed(spark, sf_dir):
    """TWED-distance KNN (r6; Marteau TPAMI 2009 — time-warped edit
    distance, the stiffness-parameterized elastic metric) through
    strategy='kernel'. Index timestamps, a_0=b_0=0 padding, +inf borders;
    nu/lambda folded into literals in Python so both engines parse the
    identical doubles. Like ERP, every DP cell is a fixed add tree + an
    exact 3-way min — the anti-diagonal kernel hash-matches the
    recursive-CTE replay with no rounding."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="twed", k=3, strategy="kernel")
    return nn.select("test_id", "train_id", "rank", "distance")


def _q166_lof_outliers(spark, sf_dir):
    """Local Outlier Factor (r6; operators/knn.py::knn_lof — Breunig et
    al. SIGMOD 2000): density-relative anomaly scores over the all-vs-all
    euclidean 5-NN self-join. Exactly-k neighborhoods under the engine's
    total tie order; every float sum folds over the RANK-SORTED neighbor
    list, all other ops single correctly-rounded IEEE ops -> kdist/lrd/lof
    are raw doubles and still hash-exact. Complements q68's global
    mean-distance score with the density-RELATIVE one (the score that
    finds an outlier sitting next to a dense cluster)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_lof

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return knn_lof(series, k=5)


def _q167_acf_dominant_lag(spark, sf_dir):
    """Autocorrelation function + dominant seasonal lag per series (r6;
    operators/features.py::acf_features): acf(1..8) as ascending
    mean-centered product folds over one IEEE division each, dom_lag =
    first-match argmax (smallest lag on exact ties). Raw doubles, no
    rounding; constant/short series are designed to NULL (never 0/0 NaN,
    whose max/position semantics diverge across engines). The
    periodicity-detection primitive feeding seasonal_decompose's period
    choice (q148) and Holt-Winters' slot count (q155)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import acf_features

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return acf_features(series, max_lag=8)


def _q168_periodogram(spark, sf_dir):
    """Discrete periodogram + dominant frequency per series (r6;
    operators/features.py::periodogram): P(k) = (sum x_t cos)^2 +
    (sum x_t sin)^2 for k=1..8 over PYTHON-LITERAL twiddle tables — the
    rocket-kernel literal trick applied to the DFT, so the spectrum is
    bit-exact cross-engine (engines never call their own cos/sin, whose
    libm last-ulp differences would break hashes). dom_freq = first-match
    argmax; dom_period = length/dom_freq. The frequency-domain complement
    of q167's lag-domain ACF."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import periodogram

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return periodogram(series, length=SERIES_LEN)


def _q169_conformal_knn(spark, sf_dir):
    """Split-conformal KNN p-values (r6; operators/classify.py::
    conformal_knn — Vovk's inductive conformal prediction): per test x
    candidate label, p = (#{calibration alpha_i >= alpha(x,y)} + 1) /
    (n_cal + 1) with the 1-NN same/other distance-ratio nonconformity.
    MIN aggregates + INTEGER rank counts + one division — p-values are
    exact rationals, no float accumulation anywhere. The
    finite-sample-valid uncertainty layer the reference's bare argmax
    vote lacks."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import conformal_knn

    train, test = _series(spark, sf_dir)
    return conformal_knn(test, train)


def _q170_viterbi_regimes(spark, sf_dir):
    """Two-regime Viterbi decoding per series (r6; operators/features.py::
    viterbi_regimes): minimum-cost low/high state path with a switching
    penalty — contextual regime labels a per-point threshold can't give
    (a lone spike inside a low regime stays low). Emission costs and the
    switch penalty are micro-quantized BIGINTs before ANY decision
    (the barycenter.py rule), so the full DP + backtrace is integer-exact
    on any engine; the oracle replays the recursion with candidate paths
    carried in the CTE state."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import viterbi_regimes

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return viterbi_regimes(series, switch_cost=500.0)


def _q171_fluss_segmentation(spark, sf_dir):
    """FLUSS semantic segmentation (r6; operators/motif.py::
    fluss_segmentation — Gharghabi et al. ICDM 2017): regime-change
    positions from matrix-profile arc density. Arc counts via a +1/-1
    delta prefix sum (one window cumsum — never a positions x arcs join),
    the idealized-curve correction as single IEEE divisions, boundary =
    first-match argmin over the interior zone. m=4 windows (znormalized,
    exclusion 2) on the 16-pt series."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import fluss_segmentation

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return fluss_segmentation(series, m=4)


def _q172_ljung_box(spark, sf_dir):
    """Ljung-Box portmanteau statistic per series (r6; operators/
    features.py::ljung_box): Q(h=8) = n(n+2) sum acf(k)^2/(n-k) — the
    white-noise test over q167's exact ACF folds; one more ascending
    fold + an exact integer-to-double scale. Statistic only (chi-square
    CDFs are libm-divergent cross-engine); raw doubles hash-green."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ljung_box

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return ljung_box(series, h=8)


def _q173_knn_impute(spark, sf_dir):
    """KNN imputation (r6; operators/knn.py::knn_impute — the KNNimpute
    recipe): a deterministic ~14% mask (position t of series s goes NULL
    when (s + t - 1) % 7 == 2 — referentially stable, no RNG) is filled
    from the 3 nearest donors under mean-squared-difference over
    CO-OBSERVED positions; donors NULL at the target position filter out
    before the rank-ordered mean fold. One row per missing position,
    n_donors degrades gracefully."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_impute

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    sid = F.col("series_id")
    masked = series.select(
        sid,
        F.transform(
            F.col("features"),
            lambda x, i: F.when(
                F.pmod(sid + i, F.lit(7)) == 2, F.lit(None).cast("double")
            ).otherwise(x),
        ).alias("features"),
    )
    return knn_impute(masked, k=3)


def _q174_sfa_words(spark, sf_dir):
    """SFA symbolic words (r6; operators/sax.py::sfa_words — Schäfer &
    Högqvist EDBT 2012, the BOSS-family symbolization): first-4 Fourier
    coefficients from the q168 literal twiddles, micro-rounded to BIGINT,
    binned by per-dimension CORPUS quartiles (Spark percentile == DuckDB
    quantile_cont on integer input — the q36 trick), concatenated in
    dimension order. SAX bins time; SFA bins frequency."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import sfa_words

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return sfa_words(series, length=SERIES_LEN, n_coeffs=4)


def _q175_forecast_backtest(spark, sf_dir):
    """Holdout forecast backtest (r6; operators/forecast.py::
    forecast_backtest): Holt fit on the first 12 points, h=1..4 scored
    against the held-out tail — MAE/RMSE/naive-baseline MAE/MASE
    (Hyndman & Koehler 2006), every metric an ascending fold + exact
    division (+ one sqrt). Raw doubles hash-green; the evaluation loop
    that makes q151/q155/q158 a measured choice."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import forecast_backtest

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return forecast_backtest(series, holdout=4)


def _q176_pacf(spark, sf_dir):
    """Partial autocorrelation via Durbin-Levinson (r6; operators/
    features.py::pacf_features): the Box-Jenkins identification pair's
    second half — one fold over k carrying (phi row, pacf list), inner
    sums ascending folds over the CARRIED accumulator. Raw doubles; the
    all-or-nothing NULL guard (n <= max_lag or constant) keeps division
    NaNs out of the hash. Oracle = the identical recursion as a
    recursive CTE."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import pacf_features

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return pacf_features(series, max_lag=8)


def _q177_haar_features(spark, sf_dir):
    """Haar wavelet multiresolution features (r6; operators/features.py::
    haar_features): 4-level pairwise average/half-difference pyramid on
    the 16-pt series — final approximation + detail energy per scale
    (fine -> coarse). Single IEEE halvings and ascending energy folds;
    the lag/frequency/scale feature triad with q167/q168."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import haar_features

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return haar_features(series, levels=4)


def _q178_decomposition_strength(spark, sf_dir):
    """Trend/seasonality strength (r6; operators/features.py::
    decomposition_strength — the Wang-Smyl-Hyndman tsfeatures measures):
    F_trend = max(0, 1 - Var(R)/Var(T+R)), F_seasonal analogous, over
    q148's exact decomposition rows collected t-ascending. The
    model-selection dial for q151-vs-q155; raw doubles hash-green."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import decomposition_strength

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return decomposition_strength(series, period=4)


def _q179_permutation_patterns(spark, sf_dir):
    """Ordinal pattern histogram + Gini diversity (r6; operators/
    features.py::permutation_patterns — Bandt & Pompe 2002 with the
    libm-free Gini/Simpson diversity): stable order-m=3 pattern codes,
    integer counts, one exact division per term. Amplitude-free dynamics
    signatures for the feature-space classifiers."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import permutation_patterns

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return permutation_patterns(series)


def _q180_boss_classify(spark, sf_dir):
    """BOSS 1-NN (r6; operators/sax.py::boss_classify — Schäfer DMKD
    2015): length-8 windows -> SFA words (literal-twiddle folds,
    micro-rounded, TRAIN-quartile MCB bins) -> numerosity reduction ->
    sparse integer word histograms -> the asymmetric BOSS distance
    (tn2 - 2*dot + shared-b2, three INTEGER aggregates) -> 1-NN. The
    frequency-domain sibling of q137's Bag-of-Patterns; engine-exact end
    to end."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import boss_classify

    train, test = _series(spark, sf_dir)
    return boss_classify(test, train, m=8, n_coeffs=2)


def _q181_complexity_features(spark, sf_dir):
    """Complexity / nonlinearity features (r6; operators/features.py::
    complexity_features): abs-energy, the CID complexity normalizer
    (Batista et al. 2014), Schreiber-Schmitz c3, time-reversal asymmetry
    — ascending folds, exact divisions, one sqrt; lag guards NULL."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import complexity_features

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return complexity_features(series, lag=1)


def _q182_label_leadlag(spark, sf_dir):
    """Label-group lead-lag network (r6): per-label MEAN series via
    integer-micro sums (order-free exact on any partitioning — the
    deterministic alternative to a float groupBy mean), then every label
    pair aligned with sbd_align (q159's primitive): which behavioral
    group LEADS which, and by how many steps. Group count is bounded, so
    the pair stage is a tiny broadcast cross join over L(L-1)/2 rows —
    the 100 TB shape is one scan + one bounded-key aggregate."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.distance import sbd_align

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    ex = series.select("label", F.posexplode("features").alias("_pos", "_v"))
    g = ex.groupBy("label", "_pos").agg(
        F.sum(F.round(F.col("_v") * F.lit(1_000_000.0)).cast("long")).alias("_sm"),
        F.count(F.lit(1)).alias("_c"),
    )
    m = g.select(
        "label",
        "_pos",
        (
            (F.col("_sm").cast("double") / F.col("_c").cast("double"))
            / F.lit(1_000_000.0)
        ).alias("_mu"),
    )
    arr = m.groupBy("label").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("_pos").alias("p"), F.col("_mu").alias("v")))
            ),
            lambda x: x["v"],
        ).alias("_mf")
    )
    a = arr.select(F.col("label").alias("label_a"), F.col("_mf").alias("_fa"))
    b = arr.select(F.col("label").alias("label_b"), F.col("_mf").alias("_fb"))
    pairs = a.crossJoin(F.broadcast(b)).filter(F.col("label_a") < F.col("label_b"))
    r = sbd_align(F.col("_fa"), F.col("_fb"))
    return pairs.select(
        "label_a",
        "label_b",
        r["lag"].alias("lag"),
        F.round(r["sbd"], 6).alias("sbd"),
    )


def _q183_early_classification(spark, sf_dir):
    """Early classification sweep (r6; the ECTS question — how soon can
    the stream be labeled?): the q12 accuracy chain at prefix lengths
    4/8/12/16, one row each. Slicing commutes with the prefix fold, so
    each stage is exactly q12's integer-exact pipeline on shorter
    arrays; the earliness-vs-accuracy curve is the operational knob for
    streaming classifiers (q16's scoring twin)."""
    train, test = _series(spark, sf_dir)
    truth = test.withColumnRenamed("series_id", "test_id")
    parts = []
    for p in (4, 8, 12, 16):
        tr = train.withColumn("features", F.slice("features", 1, p))
        te = test.withColumn("features", F.slice("features", 1, p))
        pred = knn_classify(te, tr, metric="euclidean", k=5)
        parts.append(
            accuracy(pred, truth, key="test_id").select(
                F.lit(p).cast("int").alias("prefix_len"),
                "n_rows",
                "n_correct",
                "accuracy",
            )
        )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionAll(x)
    return out


def _q184_drift_detect(spark, sf_dir):
    """Distribution drift between the early and late halves of the event
    stream (r6): exact-median time split, fixed-width value bins, and a
    chi-square-shaped divergence sum_bins (p_i - q_i)^2 / (p_i + q_i)
    over INTEGER bin counts — the libm-free stand-in for PSI/KL (ln()
    diverges across engines; this statistic ranks drift identically).
    The per-bin fold runs over the BIN-SORTED collected array (bounded:
    <= 16 bins), so the one float accumulation is ordered. The
    data-quality gate a training pipeline runs before mixing a new crawl
    into an old corpus. Output: one row — (n_early, n_late, drift_stat,
    top_bin)."""
    events = _t(spark, sf_dir, "events")
    ev = events.select(_ts_us(events).alias("_ts"), F.col("value").alias("_v"))
    mid = ev.agg(F.expr("percentile(_ts, 0.5D)").alias("_mid"))
    binned = ev.crossJoin(F.broadcast(mid)).select(
        F.when(F.col("_ts").cast("double") <= F.col("_mid"), F.lit(0))
        .otherwise(F.lit(1))
        .alias("_half"),
        F.least(F.floor(F.col("_v") / F.lit(25.0)), F.lit(15)).cast("int").alias("_bin"),
    )
    g = binned.groupBy("_bin").agg(
        F.sum(F.when(F.col("_half") == 0, 1).otherwise(0)).cast("long").alias("_ce"),
        F.sum(F.when(F.col("_half") == 1, 1).otherwise(0)).cast("long").alias("_cl"),
    )
    tot = g.agg(
        F.sum("_ce").cast("long").alias("_te"), F.sum("_cl").cast("long").alias("_tl")
    )
    per = g.crossJoin(F.broadcast(tot)).select(
        "_bin",
        "_ce",
        "_cl",
        (
            (
                F.col("_ce").cast("double") / F.col("_te").cast("double")
                - F.col("_cl").cast("double") / F.col("_tl").cast("double")
            )
            * (
                F.col("_ce").cast("double") / F.col("_te").cast("double")
                - F.col("_cl").cast("double") / F.col("_tl").cast("double")
            )
            / (
                F.col("_ce").cast("double") / F.col("_te").cast("double")
                + F.col("_cl").cast("double") / F.col("_tl").cast("double")
            )
        ).alias("_c"),
        "_te",
        "_tl",
    )
    agg = per.groupBy("_te", "_tl").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("_bin").alias("b"), F.col("_c").alias("c")))
        ).alias("_arr")
    )
    return agg.select(
        F.col("_te").alias("n_early"),
        F.col("_tl").alias("n_late"),
        F.aggregate(F.col("_arr"), F.lit(0.0), lambda a, x: a + x["c"]).alias(
            "drift_stat"
        ),
        F.element_at(
            F.col("_arr"),
            F.array_position(
                F.transform(F.col("_arr"), lambda x: x["c"]),
                F.array_max(F.transform(F.col("_arr"), lambda x: x["c"])),
            ).cast("int"),
        )["b"].alias("top_bin"),
    )


def _q185_knn_msm(spark, sf_dir):
    """MSM-distance KNN (r6; functions/edit_distance.py::msm_dist —
    Stefan, Athitsos & Das TKDE 2013, Move-Split-Merge): the last classic
    elastic METRIC, completing the family DTW / LCSS / EDR / ERP / TWED /
    MSM. strategy='kernel' (sequential borders + anti-diagonal interior);
    every candidate is one IEEE add of a compare-selected cost, so the
    kernel hash-matches the recursive-CTE replay with raw doubles."""
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="msm", k=3, strategy="kernel")
    return nn.select("test_id", "train_id", "rank", "distance")


def _q186_sampen_counts(spark, sf_dir):
    """Sample-entropy match counts (r6; operators/features.py::
    sampen_counts — Richman & Moorman 2000, the ln-free form): integer
    2-template and 3-template match counts under Chebyshev tolerance +
    the exact rational A/B regularity ratio (SampEn = -ln of it; ln is
    libm-divergent, the ratio orders series identically). O(len^2)
    integer folds per row."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import sampen_counts

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return sampen_counts(series, r=10.0)


def _q187_stream_drift_twin(spark, sf_dir):
    """Streaming drift monitor, batch twin (r6; streaming/drift.py::
    stream_drift_monitor): per epoch-aligned 1-day window, the q184
    chi-square-shaped divergence of the window's value histogram against
    a static reference (the first 15 days) — the single-aggregation
    streaming plan (per-bin conditional sums + a broadcast 1-row
    reference join + an ordered bin fold) run in batch mode, where it is
    SQL-oracle-checkable; live-stream parity with this exact twin is
    pinned in tests/test_ml_and_streaming.py."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        stream_drift_monitor,
        value_histogram,
    )

    events = _t(spark, sf_dir, "events")
    cutoff = 1705363200000000  # 2024-01-16T00:00:00Z in epoch micros
    ref = value_histogram(events.filter(_ts_us(events) < F.lit(cutoff)))
    return stream_drift_monitor(events, ref, window="1 day", watermark="2 days")


def _q188_knn_twed_multichannel(spark, sf_dir):
    """MULTICHANNEL TWED KNN (r7, VERDICT r6 #6): q113's 2-channel series
    (value + length(event_type)) scored by the INDEPENDENT-CHANNEL-SUM
    lift of TWED — each channel runs the univariate Marteau DP on its own
    slice, distances summed over ascending channel index (a sum of
    metrics is a metric, so the lift keeps TWED's triangle inequality;
    contrast with q113's dependent DTW, which shares ONE warp path with a
    per-channel-summed point cost). strategy='kernel' routes through
    edit_distance._channel_sum (3-D batch -> per-channel anti-diagonal
    DP); the Catalyst expression twin (functions/edit_distance.py::
    multichannel) is bit-identical — every per-channel cell is one IEEE
    add tree + an exact 3-way min and the channel fold is the same
    ascending left fold — so the per-channel recursive-CTE oracle
    hash-matches raw doubles, no rounding."""
    events = _t(spark, sf_dir, "events").withColumn(
        "ch2", F.length("event_type").cast("double")
    )
    series = events_to_series(events, value=["value", "ch2"], length=SERIES_LEN)
    train, test = split_train_test(series)
    nn = knn_join(test, train, metric="twed", k=3, strategy="kernel")
    return nn.select("test_id", "train_id", "rank", "distance")


def _q189_knn_lcss_multichannel(spark, sf_dir):
    """MULTICHANNEL LCSS KNN (r7): the integer-state member of the
    edit family through the same independent-channel-sum lift as q188 —
    per-channel LCSS distances (each 1 - count/min(n,m), an exact
    integer count and ONE division) summed over ascending channels.
    Together q188 (float DP cells) and q189 (integer DP cells) pin both
    arithmetic regimes of the lift. Broadcast strategy here — the pure
    Catalyst `multichannel(lcss_dist)` expression (evaluate-once channel
    bindings), the plan the oracle replays row by row. eps is the
    engine default (10.0), informative on channel 0 (events.value) and
    near-saturating on channel 1 (event_type length) — exactly the
    mixed-scale regime a per-channel eps metric has to survive."""
    events = _t(spark, sf_dir, "events").withColumn(
        "ch2", F.length("event_type").cast("double")
    )
    series = events_to_series(events, value=["value", "ch2"], length=SERIES_LEN)
    train, test = split_train_test(series)
    nn = knn_join(test, train, metric="lcss", k=3, strategy="broadcast")
    return nn.select("test_id", "train_id", "rank", "distance")


def _q190_stream_stateless_twin(spark, sf_dir):
    """Stateless streaming scorer, batch twin WITH ORACLE (r7;
    streaming/scoring.py::score_stream_stateless): the append-mode
    production scorer — train packed into ONE broadcast row, each
    incoming series evaluates candidates + top-k + vote as pure codegen
    expressions inside a transform lambda — run in batch mode where its
    whole pipeline is SQL-replayable. Metric here is TWED (the r7
    expression-metric extension: the edit DPs evaluate inside HOF
    lambdas where Python UDFs cannot). The oracle composes q165's
    recursive-CTE TWED DP with q10's vote CTE (votes DESC, min-rank ASC
    — the Counter.most_common insertion-order parity `_vote_expr`
    reproduces via (votes, size - array_position) struct max), so the
    STREAMING component's exact semantics are hash-graded, not just
    test-pinned against knn_classify."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.streaming import (
        score_stream_stateless,
    )

    train, test = _series(spark, sf_dir)
    return score_stream_stateless(test, train, metric="twed", k=3)


def _q191_lof_twed(spark, sf_dir):
    """ELASTIC-METRIC LOF (r7): density-relative outliers under TWED
    instead of q166's euclidean — the shape a telemetry corpus actually
    needs (a series can be a euclidean outlier through pure phase shift;
    an elastic metric scores it by alignment cost). Runs the C-kernel
    strategy and STAYS hash-exact: unlike euclidean (whose kernel
    reassociates the coordinate fold), every TWED cell is an
    order-independent add tree + exact min, so kernel == expression ==
    recursive CTE bitwise, and LOF's downstream float sums are all
    rank-sorted folds (q166's contract). The oracle composes q165's TWED
    recursion into q166's LOF chain — two proven oracles, one new
    capability, zero rounding."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_lof

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return knn_lof(series, k=5, metric="twed", strategy="kernel")


def _q192_conformal_twed(spark, sf_dir):
    """ELASTIC CONFORMAL CLASSIFICATION (r7): split-conformal KNN
    p-values under TWED instead of q169's euclidean — with q191 this
    completes the KNN-stack x elastic-metric matrix (classify q165,
    outliers q191, calibrated p-values q192). The 1-NN-ratio
    nonconformity score now measures alignment cost, so a
    phase-shifted test series is conforming when its shape matches its
    label's exemplars. p-values stay exact rationals: the TWED DP is
    order-independent per cell, the score is one MIN per label + one
    division, the rank count is an integer. Oracle: q169's conformal
    chain with both distance CTEs replaced by q165's recursion."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import conformal_knn

    train, test = _series(spark, sf_dir)
    return conformal_knn(test, train, metric="twed")


def _q193_kmedoids_twed(spark, sf_dir):
    """ELASTIC k-MEDOIDS (r7): q143's PAM chain under TWED — the
    clustering cell of the KNN-stack x elastic-metric matrix (classify
    q165, outliers q191, p-values q192, clusters q193). Medoids are
    actual corpus series, so the metric needs no mean — exactly why PAM
    is the clustering that composes with ANY engine metric; every TWED
    distance is micro-rounded (round(d*1e6) -> long) before any argmin,
    so assignment and medoid-update decisions are integer-exact on any
    engine. Oracle: q143's seed/assign/update/reassign chain verbatim on
    a TWED distance matrix (q165's recursion)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ts_kmedoids

    _prep(spark)
    series = events_to_series(_t(spark, sf_dir, "events"), length=SERIES_LEN)
    return ts_kmedoids(series, k=4, metric="twed")


def _q194_conformal_set(spark, sf_dir):
    """CONFORMAL PREDICTION SET (r7; operators/classify.py::
    conformal_set): the eps=0.1 label set {y : p(x,y) > 0.1} over q192's
    TWED p-values — the calibrated-uncertainty API with the
    split-conformal finite-sample guarantee P(y_true in C_eps) >= 1-eps
    under exchangeability (Vovk et al.); an ambiguous series gets a
    LARGER set instead of a silently wrong point label. Membership is an
    exact comparison (exact-rational p vs the literal eps), so the
    oracle is q192's chain + the same filter; empirical coverage is
    fuzz-swept (tools/fuzz_sweep.py conformal mode)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import conformal_set

    train, test = _series(spark, sf_dir)
    return conformal_set(test, train, metric="twed", eps=0.1)


def _q195_knn_twed_lb_pruned(spark, sf_dir):
    """LOSSLESS TWED KNN PRUNING (r7; operators/knn.py::
    knn_join_lb_metric — the edit-family sibling of q86's LB_Keogh
    filter-and-verify): the triangle-inequality anchor bound
    d(a,b) >= |d(a,z) - d(b,z)| (TWED is a metric, Marteau 2009;
    property-fuzzed) with z = [0], so the pair-level prefilter moves one
    SCALAR per series. Three lossless phases (top-C candidates by LB ->
    exact verify -> tau-completeness escalation) return BIT-IDENTICAL
    results to brute force — this oracle IS q165's brute TWED recursion,
    so the hash match proves the pruning lost nothing."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join_lb_metric

    train, test = _series(spark, sf_dir)
    nn = knn_join_lb_metric(test, train, metric="twed", k=3)
    return nn.select("test_id", "train_id", "rank", "distance")


def _q196_knn_twed_lb_gated(spark, sf_dir):
    """SAMPLED PRUNE-RATE GATE on the lossless anchor prefilter (r8,
    VERDICT r7 #5; operators/knn.py::_estimated_prune_rate): with
    min_prune_rate set, phases 1-2 run first on a deterministic 8-test
    sample; when the estimated prune rate is below threshold (the
    structureless regime where the scalar bound is information-weak and
    the prefilter is pure overhead) the call bypasses to the brute
    kernel path. EITHER branch is bit-identical to brute force — this
    oracle is the same q165 brute TWED recursion as q195's, so the hash
    match proves the gate never changes the answer, only the plan."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join_lb_metric

    train, test = _series(spark, sf_dir)
    nn = knn_join_lb_metric(test, train, metric="twed", k=3, min_prune_rate=0.05)
    return nn.select("test_id", "train_id", "rank", "distance")


def _q199_knn_dtw_lb_gated(spark, sf_dir):
    """SAMPLED PRUNE-RATE GATE, DTW side (r8 — q196's twin for
    knn_join_lb's LB_Keogh-family envelope prefilter): the driver-side
    probe replays the PAA-envelope bound + banded-DTW scoring on a
    bounded sample and bypasses to the brute kernel when estimated
    pruning is under threshold. Either branch is exact, so the oracle is
    q86's — i.e. q70's brute-force recursive-CTE DTW DP — and the hash
    match proves the gate changes plans, never answers."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join_lb

    train, test = _series(spark, sf_dir)
    nn = knn_join_lb(
        test, train, metric="dtw", k=3, length=SERIES_LEN,
        candidates_per_test=4, min_prune_rate=0.05,
    )
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q200_knn_dtw_ragged(spark, sf_dir):
    """RAGGED exact-DTW KNN through the grouped kernel strategy (r9,
    VERDICT r8 #4; operators/knn.py::_score_block_groups): mixed-length
    series (16/12/8 points by id) score through per-length rectangular
    batch-kernel calls whose per-group top-ks merge to one exact global
    top-k — the regime that previously required a fixed-length train side
    (and rerouted oversized ragged corpora to the 4.6x-measured
    declarative shuffle plan). The oracle is q70's recursive-CTE DTW DP —
    its per-pair len(fa)/len(fb) recursion is already length-agnostic —
    over the same ragged slices, so the grouped-merge path is hash-proven
    lossless, not just strategy-consistent."""
    train, test = _series(spark, sf_dir)
    rag_len = F.lit(SERIES_LEN) - (F.col("series_id") % 3).cast("int") * 4

    def rag(df):
        return df.select(
            "series_id",
            F.slice("features", F.lit(1), rag_len).alias("features"),
            "label",
        )

    nn = knn_join(
        rag(test), rag(train), metric="dtw", band=None, k=3, strategy="kernel"
    )
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q201_knn_dtw_ragged_chunked(spark, sf_dir):
    """RAGGED exact-DTW KNN through the CHUNKED BLOCK GRID (r9;
    operators/knn.py::_knn_chunked): the no-broadcast reroute the byte
    guard takes when the train side exceeds ``max_broadcast_bytes`` —
    both sides hash into (test-block x train-block) cells (one cell per
    task since r9), each cell regroups its ragged slice by length into
    rectangular kernel calls, per-cell top-ks re-rank globally under the
    (distance, label, id) total order. Until now the grid was proven by
    strategy-parity tests only; this query puts it under the DRIVER
    ORACLE GATE — the oracle is q200's length-agnostic recursive-CTE DTW
    DP over the same ragged slices, so a hash match proves the
    grid + per-length grouping + global re-rank pipeline lossless
    against brute force."""
    train, test = _series(spark, sf_dir)
    rag_len = F.lit(SERIES_LEN) - (F.col("series_id") % 3).cast("int") * 4

    def rag(df):
        return df.select(
            "series_id",
            F.slice("features", F.lit(1), rag_len).alias("features"),
            "label",
        )

    nn = knn_join(
        rag(test), rag(train), metric="dtw", band=None, k=3, strategy="chunked"
    )
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def _q198_knn_twed_mc_lb_pruned(spark, sf_dir):
    """MULTICHANNEL lossless TWED pruning (r8; operators/knn.py::
    knn_join_lb_metric(channels=2) — closing the symmetry with q156's
    multichannel LB_Keogh path): the independent-channel-sum lift of TWED
    is itself a metric (sum of metrics — q188's argument), so the
    triangle-inequality anchor bound holds for the SUMMED distance with
    ref(x) = sum_c d_c(x_c, [0]) (the mc lift scored against one all-zero
    timestep). Three lossless phases on scalar refs, verify through the
    (P, L, C) C kernels. The oracle IS q188's brute multichannel TWED
    recursion — the hash match proves the mc pruning lost nothing."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import knn_join_lb_metric

    events = _t(spark, sf_dir, "events").withColumn(
        "ch2", F.length("event_type").cast("double")
    )
    series = events_to_series(events, value=["value", "ch2"], length=SERIES_LEN)
    train, test = split_train_test(series)
    nn = knn_join_lb_metric(test, train, metric="twed", k=3, channels=2)
    return nn.select("test_id", "train_id", "rank", "distance")


def _q197_vector_boundary_roundtrip(spark, sf_dir):
    """MLlib VECTOR BOUNDARY (r8, VERDICT r7 #6; ml/vector.py — SURVEY
    §2.9 M1, the reference's VectorAssembler interop at
    Team11-Project.py:107-110): array<float> -> VectorUDT (JVM-side
    ``array_to_vector``) -> back to array<float> (``vector_to_array``)
    must be the identity, because float->double widening is exact and the
    float32 return narrows back losslessly. The oracle selects the
    embeddings unchanged — a hash match proves the boundary loses
    nothing, so stock pyspark.ml stages can be composed without value
    drift."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.ml import (
        from_vector,
        to_vector,
    )

    _prep(spark)
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        from_vector(to_vector(F.col("embedding")), "float32").alias("embedding_rt"),
    )


def _q144_importance_resample(spark, sf_dir):
    """DSIR-shaped importance resampling (operators/corpus.py::
    importance_resample; Xie et al. NeurIPS 2023): hashed unigram+bigram
    bucket counts, add-one smoothed target/raw likelihood ratios in
    LINEAR domain (the q101/q51 no-ln() playbook: exact BIGINT products,
    one IEEE division per bucket, micro-rounded), per-doc count-weighted
    mean ratio as an integer score, exact-percentile keep gate (q73).
    Target distribution here: the English sub-corpus — the classic
    'make the raw crawl look like the curated set' selection. The oracle
    replays featurization (portable char-fold bucket hash), both
    distributions, the ratio table, scoring, and the quantile gate."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import importance_resample

    _prep(spark)
    docs = _t(spark, sf_dir, "documents")
    return importance_resample(
        docs, docs.filter(F.col("lang") == "en"),
        n_buckets=64, keep_fraction=0.25,
    )


def _q142_sbd_knn(spark, sf_dir):
    """Shape-based-distance KNN (functions/distance.py::sbd): k-Shape's
    NCC_c distance (Paparrizos & Gravano, SIGMOD 2015) — 1 minus the
    maximum coefficient-normalized cross-correlation over all 2n-1 shifts.
    The alignment-free complement of DTW (a time-SHIFTED series is near,
    where euclidean sees it as far) and, unlike DTW, a pure Catalyst
    expression: the whole shift sweep is transform(sequence)+aggregate
    folds, whole-stage codegen'd, zero Python. Same broadcast cross join +
    WindowGroupLimit shape as q09/q70; the oracle mirrors every fold in
    list_transform/list_reduce (bit-exact: IEEE mul/div/sqrt + exact max,
    same op order)."""
    _prep(spark)
    train, test = _series(spark, sf_dir)
    nn = knn_join(test, train, metric="sbd", k=3, strategy="broadcast")
    return nn.select(
        "test_id", "train_id", "rank", F.round("distance", 6).alias("distance")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q01_pricing_summary": _q01_pricing_summary,
        "q02_filter_project": _q02_filter_project,
        "q03_join_enrich": _q03_join_enrich,
        "q04_topk_per_group": _q04_topk_per_group,
        "q05_min_by": _q05_min_by,
        "q06_mode_vote": _q06_mode_vote,
        "q07_parse_series": _q07_parse_series,
        "q08_series_build": _q08_series_build,
        "q09_knn_pairs": _q09_knn_pairs,
        "q10_knn_classify": _q10_knn_classify,
        "q11_knn_1nn": _q11_knn_1nn,
        "q12_knn_accuracy": _q12_knn_accuracy,
        "q13_knn_dtw": _q13_knn_dtw,
        "q14_set_ops": _q14_set_ops,
        "q15_conditional": _q15_conditional,
        "q16_dedup_exact": _q16_dedup_exact,
        "q17_dedup_jaccard": _q17_dedup_jaccard,
        "q18_dedup_minhash_lsh": _q18_dedup_minhash_lsh,
        "q19_simhash": _q19_simhash,
        "q20_text_stats": _q20_text_stats,
        "q21_lang_id": _q21_lang_id,
        "q22_quality": _q22_quality,
        "q23_ann_cosine": _q23_ann_cosine,
        "q24_ann_lsh": _q24_ann_lsh,
        "q25_knn_pruned": _q25_knn_pruned,
        "q26_vector_equality_join": _q26_vector_equality_join,
        "q27_dense_row_ids": _q27_dense_row_ids,
        "q28_k_sweep": _q28_k_sweep,
        "q29_rollup": _q29_rollup,
        "q30_pivot": _q30_pivot,
        "q31_semi_anti": _q31_semi_anti,
        "q32_sessionize": _q32_sessionize,
        "q33_tumbling_window": _q33_tumbling_window,
        "q34_ann_ivf": _q34_ann_ivf,
        "q35_dedup_components": _q35_dedup_components,
        "q36_percentiles": _q36_percentiles,
        "q37_running_windows": _q37_running_windows,
        "q38_date_parts": _q38_date_parts,
        "q39_json_extract": _q39_json_extract,
        "q40_multimodal_features": _q40_multimodal_features,
        "q41_frame_sampling": _q41_frame_sampling,
        "q42_asof_join": _q42_asof_join,
        "q43_gap_fill": _q43_gap_fill,
        "q44_kmv_distinct": _q44_kmv_distinct,
        "q45_hash_sample": _q45_hash_sample,
        "q46_token_topk": _q46_token_topk,
        "q47_class_centroids": _q47_class_centroids,
        "q48_interval_join": _q48_interval_join,
        "q49_sql_api": _q49_sql_api,
        "q50_znorm": _q50_znorm,
        "q51_tfidf": _q51_tfidf,
        "q52_repetition": _q52_repetition,
        "q53_stratified_sample": _q53_stratified_sample,
        "q54_random_projection": _q54_random_projection,
        "q55_decontaminate": _q55_decontaminate,
        "q56_chunk_documents": _q56_chunk_documents,
        "q57_pack_sequences": _q57_pack_sequences,
        "q58_profile_table": _q58_profile_table,
        "q59_salted_join": _q59_salted_join,
        "q60_attribution_join": _q60_attribution_join,
        "q61_incremental_dedup": _q61_incremental_dedup,
        "q62_histogram": _q62_histogram,
        "q63_multiway_join": _q63_multiway_join,
        "q64_normalize_text": _q64_normalize_text,
        "q65_series_features": _q65_series_features,
        "q66_paa": _q66_paa,
        "q67_bloom_semi_join": _q67_bloom_semi_join,
        "q68_knn_outliers": _q68_knn_outliers,
        "q69_quality_filter": _q69_quality_filter,
        "q70_knn_dtw_exact": _q70_knn_dtw_exact,
        "q71_series_resample": _q71_series_resample,
        "q72_mixture_sample": _q72_mixture_sample,
        "q73_curation_pipeline": _q73_curation_pipeline,
        "q74_dedup_embedding": _q74_dedup_embedding,
        "q75_token_rarity": _q75_token_rarity,
        "q76_ml_estimator": _q76_ml_estimator,
        "q77_source_quota": _q77_source_quota,
        "q78_fingerprint": _q78_fingerprint,
        "q79_sink_roundtrip": _q79_sink_roundtrip,
        "q80_cube": _q80_cube,
        "q81_time_rollup": _q81_time_rollup,
        "q82_zorder": _q82_zorder,
        "q83_image_resize": _q83_image_resize,
        "q84_count_min": _q84_count_min,
        "q85_native_session_window": _q85_native_session_window,
        "q86_knn_pruned_admissible": _q86_knn_pruned_admissible,
        "q87_kmeans": _q87_kmeans,
        "q88_semantic_dedup": _q88_semantic_dedup,
        "q89_span_dedup": _q89_span_dedup,
        "q90_ann_quantized": _q90_ann_quantized,
        "q91_corpus_shuffle": _q91_corpus_shuffle,
        "q92_decontaminate_fuzzy": _q92_decontaminate_fuzzy,
        "q93_ann_ivf_kmeans": _q93_ann_ivf_kmeans,
        "q94_image_decode_real": _q94_image_decode_real,
        "q95_audio_decode_real": _q95_audio_decode_real,
        "q96_ann_lsh_multiprobe": _q96_ann_lsh_multiprobe,
        "q97_hash_embed": _q97_hash_embed,
        "q98_text_knn": _q98_text_knn,
        "q99_video_decode_real": _q99_video_decode_real,
        "q100_redact_pii": _q100_redact_pii,
        "q101_ngram_lm": _q101_ngram_lm,
        "q102_bpe_train": _q102_bpe_train,
        "q103_bpe_encode": _q103_bpe_encode,
        "q104_duplicate_spans": _q104_duplicate_spans,
        "q105_jpeg_decode_real": _q105_jpeg_decode_real,
        "q106_set_similarity_join": _q106_set_similarity_join,
        "q107_hll_distinct": _q107_hll_distinct,
        "q108_leakage_safe_split": _q108_leakage_safe_split,
        "q109_tokenizer_pipeline": _q109_tokenizer_pipeline,
        "q110_sax_words": _q110_sax_words,
        "q111_bpe_ids": _q111_bpe_ids,
        "q112_jpeg_progressive_real": _q112_jpeg_progressive_real,
        "q113_knn_dtw_multichannel": _q113_knn_dtw_multichannel,
        "q114_source_cap": _q114_source_cap,
        "q115_ann_pq": _q115_ann_pq,
        "q116_ann_ivfpq": _q116_ann_ivfpq,
        "q117_bm25": _q117_bm25,
        "q118_hybrid_retrieval": _q118_hybrid_retrieval,
        "q119_bm25_pruned": _q119_bm25_pruned,
        "q120_bm25_served": _q120_bm25_served,
        "q121_bm25_wand": _q121_bm25_wand,
        "q122_bm25_wand_certificate": _q122_bm25_wand_certificate,
        "q123_knn_chunked": _q123_knn_chunked,
        "q124_ann_quantized_chunked": _q124_ann_quantized_chunked,
        "q125_quality_classifier": _q125_quality_classifier,
        "q126_quality_filter": _q126_quality_filter,
        "q127_series_features": _q127_series_features,
        "q128_epoch_sweep": _q128_epoch_sweep,
        "q129_stump": _q129_stump,
        "q130_stump_filter": _q130_stump_filter,
        "q131_series_classifier": _q131_series_classifier,
        "q132_sax_symbols": _q132_sax_symbols,
        "q133_sax_knn": _q133_sax_knn,
        "q134_matrix_profile": _q134_matrix_profile,
        "q135_series_discords": _q135_series_discords,
        "q136_motif_words": _q136_motif_words,
        "q137_bop_classify": _q137_bop_classify,
        "q138_knn_weighted": _q138_knn_weighted,
        "q139_knn_regress": _q139_knn_regress,
        "q140_subsequence_search": _q140_subsequence_search,
        "q141_knn_cv": _q141_knn_cv,
        "q142_sbd_knn": _q142_sbd_knn,
        "q143_ts_kmedoids": _q143_ts_kmedoids,
        "q144_importance_resample": _q144_importance_resample,
        "q145_sbd_kmedoids": _q145_sbd_kmedoids,
        "q146_rocket_features": _q146_rocket_features,
        "q147_rocket_knn": _q147_rocket_knn,
        "q148_seasonal_decompose": _q148_seasonal_decompose,
        "q149_dba_barycenters": _q149_dba_barycenters,
        "q150_dtw_kmeans": _q150_dtw_kmeans,
        "q151_holt_forecast": _q151_holt_forecast,
        "q152_residual_anomalies": _q152_residual_anomalies,
        "q153_dba_classify": _q153_dba_classify,
        "q154_cusum_changepoint": _q154_cusum_changepoint,
        "q155_holt_winters": _q155_holt_winters,
        "q156_knn_dtw_mc_pruned": _q156_knn_dtw_mc_pruned,
        "q157_shapelet_rule": _q157_shapelet_rule,
        "q158_ar_forecast": _q158_ar_forecast,
        "q159_sbd_1nn_lag": _q159_sbd_1nn_lag,
        "q160_mann_kendall": _q160_mann_kendall,
        "q161_theil_sen": _q161_theil_sen,
        "q162_knn_lcss": _q162_knn_lcss,
        "q163_knn_edr": _q163_knn_edr,
        "q164_knn_erp": _q164_knn_erp,
        "q165_knn_twed": _q165_knn_twed,
        "q166_lof_outliers": _q166_lof_outliers,
        "q167_acf_dominant_lag": _q167_acf_dominant_lag,
        "q168_periodogram": _q168_periodogram,
        "q169_conformal_knn": _q169_conformal_knn,
        "q170_viterbi_regimes": _q170_viterbi_regimes,
        "q171_fluss_segmentation": _q171_fluss_segmentation,
        "q172_ljung_box": _q172_ljung_box,
        "q173_knn_impute": _q173_knn_impute,
        "q174_sfa_words": _q174_sfa_words,
        "q175_forecast_backtest": _q175_forecast_backtest,
        "q176_pacf": _q176_pacf,
        "q177_haar_features": _q177_haar_features,
        "q178_decomposition_strength": _q178_decomposition_strength,
        "q179_permutation_patterns": _q179_permutation_patterns,
        "q180_boss_classify": _q180_boss_classify,
        "q181_complexity_features": _q181_complexity_features,
        "q182_label_leadlag": _q182_label_leadlag,
        "q183_early_classification": _q183_early_classification,
        "q184_drift_detect": _q184_drift_detect,
        "q185_knn_msm": _q185_knn_msm,
        "q186_sampen_counts": _q186_sampen_counts,
        "q187_stream_drift_twin": _q187_stream_drift_twin,
        "q188_knn_twed_multichannel": _q188_knn_twed_multichannel,
        "q189_knn_lcss_multichannel": _q189_knn_lcss_multichannel,
        "q190_stream_stateless_twin": _q190_stream_stateless_twin,
        "q191_lof_twed": _q191_lof_twed,
        "q192_conformal_twed": _q192_conformal_twed,
        "q193_kmedoids_twed": _q193_kmedoids_twed,
        "q194_conformal_set": _q194_conformal_set,
        "q195_knn_twed_lb_pruned": _q195_knn_twed_lb_pruned,
        "q196_knn_twed_lb_gated": _q196_knn_twed_lb_gated,
        "q197_vector_boundary_roundtrip": _q197_vector_boundary_roundtrip,
        "q198_knn_twed_mc_lb_pruned": _q198_knn_twed_mc_lb_pruned,
        "q199_knn_dtw_lb_gated": _q199_knn_dtw_lb_gated,
        "q200_knn_dtw_ragged": _q200_knn_dtw_ragged,
        "q201_knn_dtw_ragged_chunked": _q201_knn_dtw_ragged_chunked,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

# Shared CTE: the event-series table + train/test split, mirroring
# sources/series.py::events_to_series + split_train_test exactly.
_SERIES_CTE = f"""
pts AS (
    SELECT user_id, list(value ORDER BY ts, event_id) AS vals
    FROM events GROUP BY user_id
),
sized AS (
    SELECT user_id, vals[1:{SERIES_LEN}] AS features
    FROM pts WHERE len(vals) >= {SERIES_LEN}
),
labels AS (
    SELECT user_id, event_type AS label FROM (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY count(*) DESC, event_type ASC) AS rk
        FROM events GROUP BY user_id, event_type
    ) WHERE rk = 1
),
series AS (
    SELECT s.user_id AS series_id, s.features, l.label
    FROM sized s JOIN labels l USING (user_id)
),
train AS (SELECT * FROM series WHERE series_id % 4 != 0),
test  AS (SELECT * FROM series WHERE series_id % 4 = 0)
"""

# PAM k-medoids replay (q143/q145): seeds -> assign-1 -> sum-of-distances
# medoid update -> assign-2, all argmins as row_number windows with total-
# order tie-breaks, over a `dmat` (ia, ib, dm BIGINT micro) CTE the caller
# supplies (DTW recursion for q143, SBD folds for q145). k = 4.
_SQL_KMEDOIDS_TAIL = """seeds AS (
            SELECT series_id AS mid FROM series
            ORDER BY ((series_id % 1000000007) * 654435747 + 40503)
                     % 1000000007 ASC, series_id ASC
            LIMIT 4
        ),
        a1 AS (
            SELECT id, mid FROM (
                SELECT d.ia AS id, d.ib AS mid, d.dm,
                       row_number() OVER (PARTITION BY d.ia
                           ORDER BY d.dm ASC, d.ib ASC) AS rk
                FROM dmat d JOIN seeds s ON d.ib = s.mid
            ) WHERE rk = 1
        ),
        sums AS (
            SELECT m1.mid AS cm, m1.id AS cand, sum(d.dm) AS s
            FROM a1 m1 JOIN a1 m2 ON m1.mid = m2.mid
            JOIN dmat d ON d.ia = m1.id AND d.ib = m2.id
            GROUP BY m1.mid, m1.id
        ),
        med2 AS (
            SELECT cand AS mid FROM (
                SELECT cand, row_number() OVER (PARTITION BY cm
                           ORDER BY s ASC, cand ASC) AS rk
                FROM sums
            ) WHERE rk = 1
        ),
        a2 AS (
            SELECT id, mid, dm FROM (
                SELECT d.ia AS id, d.ib AS mid, d.dm,
                       row_number() OVER (PARTITION BY d.ia
                           ORDER BY d.dm ASC, d.ib ASC) AS rk
                FROM dmat d JOIN med2 m ON d.ib = m.mid
            ) WHERE rk = 1
        )"""

# final projection shared by q143/q145 (q149 extends a2 instead)
_SQL_KMEDOIDS_SELECT = (
    "SELECT id AS series_id, mid AS medoid_id, dm AS dist_micro FROM a2"
)

def _sql_rocket_exprs() -> "list[tuple[str, str]]":
    """(name, expr) per ROCKET feature over a `features` list column —
    mirrors operators/features.py::rocket_features bit-for-bit: integer
    two-valued kernels (zero float-literal hazards), left-assoc dilated
    convolution terms, exact max / exact count-ratio PPV, round(6), NULL
    when the series is shorter than the kernel span."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.features import (
        make_rocket_kernels,
    )

    out = []
    for i, k in enumerate(make_rocket_kernels()):
        d, w = k["dilation"], k["weights"]
        span = (len(w) - 1) * d
        terms = " + ".join(
            f"features[p + {j * d}] * {wj}" for j, wj in enumerate(w)
        )
        conv = (
            f"list_transform(range(1, len(features) - {span} + 1),"
            f" p -> {terms})"
        )
        out.append((
            f"k{i}_ppv",
            f"round(CASE WHEN len(features) > {span} THEN"
            f" cast(len(list_filter({conv}, c -> c > 0)) AS double)"
            f" / cast(len(features) - {span} AS double) END, 6)",
        ))
        out.append((
            f"k{i}_max",
            f"round(CASE WHEN len(features) > {span} THEN"
            f" list_reduce({conv}, (x, y) -> greatest(x, y)) END, 6)",
        ))
    return out


# left-fold squared-euclidean — same IEEE op order as Spark's
# aggregate(zip_with(...)) (init 0.0 + left fold == DuckDB's no-init left fold
# because 0.0 + x == x for the non-negative squared terms)
_SQDIST = (
    "list_reduce(list_transform(range(1, len(t.features)+1),"
    " i -> (t.features[i]-r.features[i])*(t.features[i]-r.features[i])),"
    " (x,y) -> x+y)"
)

_KNN_TOPK_CTE = f"""
pairs AS (
    SELECT t.series_id AS test_id, r.series_id AS train_id,
           r.label AS train_label, {_SQDIST} AS d
    FROM test t CROSS JOIN train r
),
ranked AS (
    SELECT *, row_number() OVER (PARTITION BY test_id
                                 ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
    FROM pairs WHERE d != 0
),
topk AS (SELECT * FROM ranked WHERE rank <= 5)
"""

_VOTE_SQL = """
votes AS (
    SELECT test_id, train_label, count(*) AS votes, min(rank) AS best_rank
    FROM topk GROUP BY test_id, train_label
),
sel AS (
    SELECT *, row_number() OVER (PARTITION BY test_id
                                 ORDER BY votes DESC, best_rank ASC, train_label ASC) AS vrk
    FROM votes
)
"""


# --- faithful-FastDTW oracle (q13) ----------------------------------------
#
# Salvador & Chan 2007 (the reference's `fastdtw` dependency,
# Team11-Project.py:339-341) replayed ENTIRELY in DuckDB SQL: recursive
# half-resolution coarsening, full DP at the coarsest level, warp-path
# backtracking, radius-1 window expansion, windowed DP at each finer level.
# SERIES_LEN is fixed (16), so the level chain [16, 8, 4, 2] is known at
# SQL-generation time and the per-level (DP recursion -> choice rows ->
# backtrack recursion -> interval expansion) chain is unrolled level by
# level — the q150 multi-recursion pattern, three levels deeper.
#
# Float parity is EXACT (bit-identical at sf0.001 and sf0.01, all pairs):
# every DP cell is pred_best + |a_i - b_j| (one IEEE add), coarsening is
# (x0 + x1) / 2.0, and the path tie order (vertical > horizontal > diagonal,
# strict < to switch) mirrors functions/dtw_kernel.py::_dtw_with_path /
# dtw_c's compiled fastdtw_level, so no rounding is needed anywhere.
# Out-of-window cells use the kernel's own finite-unreachable sentinel
# (1e18 — any reachable 16-pt cost is astronomically below it).

_FDTW_SENT = "1e18"
_FDTW_RADIUS = 1


def _fdtw_level_chain(n: int, radius: int = _FDTW_RADIUS) -> list:
    """FastDTW level lengths: halve (dropping an odd tail, _reduce_by_half)
    while the coarsest level is still >= radius + 2."""
    out = [n]
    while out[-1] >= radius + 2:
        out.append((out[-1] - out[-1] % 2) // 2)
    return out


def _fdtw_coarsen(src: str, n_src: int) -> str:
    """One _reduce_by_half step: (x[2i-1] + x[2i]) / 2.0, 1-indexed lists."""
    return (
        f"list_transform(range(1, {n_src // 2 + 1}), "
        f"i -> ({src}[2*i-1] + {src}[2*i]) / 2.0)"
    )


def _fdtw_dp_cte(lv: int, n: int, m: int, a: str, b: str, win_src: str) -> str:
    """Windowed-DP recursion over DP rows i (the q70 list_reduce technique):
    dp{lv} emits (keys, i, vals) where vals is the full-width m-list of row
    i's DP values, sentinel outside [lo[i], hi[i]]. Row 0 is the cumsum base
    (virtual origin (-1,-1)=0 reachable only diagonally from (0,0)); each
    later cell = |a_i-b_j| + least(vertical, diagonal, horizontal) with the
    horizontal term being the just-built acc[-1] — the sequential cur[j-1]
    dependency expressed as a left fold."""
    base_row = (
        f"list_transform("
        f"list_reduce(list_prepend([abs({a}[1] - {b}[1])],"
        f" list_transform(range(2, {m + 1}), j -> [abs({a}[1] - {b}[j])])),"
        f" (acc, e) -> list_append(acc, acc[-1] + e[1])),"
        f" (v, j) -> CASE WHEN j - 1 > hi[1] THEN {_FDTW_SENT} ELSE v END)"
    )
    step_elems = (
        f"list_transform(range(1, {m + 1}), j -> ["
        f"CASE WHEN j - 1 < lo[i + 1] OR j - 1 > hi[i + 1] THEN 1.0 ELSE 0.0 END,"
        f" abs({a}[i + 1] - {b}[j]), vals[j],"
        f" CASE WHEN j > 1 THEN vals[j - 1] ELSE {_FDTW_SENT} END])"
    )
    step_row = (
        f"list_reduce(list_prepend("
        f"[CASE WHEN lo[i + 1] > 0 THEN {_FDTW_SENT}"
        f" ELSE abs({a}[i + 1] - {b}[1]) + vals[1] END],"
        f" {step_elems}[2:]),"
        f" (acc, e) -> list_append(acc,"
        f" CASE WHEN e[1] = 1.0 THEN {_FDTW_SENT}"
        f" ELSE e[2] + least(e[3], e[4], acc[-1]) END))"
    )
    return f"""dp{lv} AS (
        SELECT test_id, train_id, {a}, {b}, lo, hi, 1 AS i, {base_row} AS vals
        FROM {win_src}
        UNION ALL
        SELECT test_id, train_id, {a}, {b}, lo, hi, i + 1, {step_row} AS vals
        FROM dp{lv} WHERE i < {n}
    )"""


def _fdtw_choice_ctes(lv: int, n: int, m: int) -> str:
    """Per-cell predecessor choices (0 vertical, 1 horizontal, 2 diagonal;
    earliest-candidate-wins tie order of _dtw_with_path), derived by joining
    adjacent DP rows; assembled row-major into chs."""
    row0 = f"list_transform(range(1, {m + 1}), j -> CASE WHEN j = 1 THEN 2 ELSE 1 END)"
    rowi = (
        f"list_transform(range(1, {m + 1}), j -> CASE"
        f" WHEN (CASE WHEN j > 1 THEN p.vals[j - 1] ELSE {_FDTW_SENT} END)"
        f"  < least(p.vals[j],"
        f"    CASE WHEN j > 1 THEN c.vals[j - 1] ELSE {_FDTW_SENT} END) THEN 2"
        f" WHEN (CASE WHEN j > 1 THEN c.vals[j - 1] ELSE {_FDTW_SENT} END)"
        f"  < p.vals[j] THEN 1"
        f" ELSE 0 END)"
    )
    return f"""ch{lv} AS (
        SELECT test_id, train_id, 1 AS i, {row0} AS cr
        FROM dp{lv} WHERE i = 1
        UNION ALL
        SELECT c.test_id, c.train_id, c.i, {rowi} AS cr
        FROM dp{lv} c JOIN dp{lv} p
          ON c.test_id = p.test_id AND c.train_id = p.train_id
         AND p.i = c.i - 1
        WHERE c.i > 1
    ),
    chs{lv} AS (
        SELECT test_id, train_id, list(cr ORDER BY i) AS chs
        FROM ch{lv} GROUP BY test_id, train_id
    )"""


def _fdtw_bt_ctes(lv: int, n: int, m: int) -> str:
    """Backtrack-walk recursion from (n-1, m-1) to (0, 0) following the
    stored choices; per-row path column spans (pmin, pmax) maintained as in
    dtw_kernel._backtrack_batch (leaving row i pins pmin[i]; entering row
    i-1 pins pmax[i-1]; pmin[0] forced 0 at the end)."""
    pmin0 = f"list_transform(range(1, {n + 1}), r -> {m - 1})"
    pmax0 = (
        f"list_transform(range(1, {n + 1}), "
        f"r -> CASE WHEN r = {n} THEN {m - 1} ELSE 0 END)"
    )
    return f"""bt{lv} AS (
        SELECT test_id, train_id, chs, {n - 1} AS i, {m - 1} AS j,
               {pmin0} AS pmin, {pmax0} AS pmax
        FROM chs{lv}
        UNION ALL
        SELECT test_id, train_id, chs,
               CASE WHEN chs[i + 1][j + 1] = 1 THEN i ELSE i - 1 END,
               CASE WHEN chs[i + 1][j + 1] = 0 THEN j ELSE j - 1 END,
               CASE WHEN chs[i + 1][j + 1] != 1
                    THEN list_transform(pmin,
                         (v, r) -> CASE WHEN r = i + 1 THEN j ELSE v END)
                    ELSE pmin END,
               CASE WHEN chs[i + 1][j + 1] != 1 AND i >= 1
                    THEN list_transform(pmax, (v, r) -> CASE WHEN r = i
                         THEN CASE WHEN chs[i + 1][j + 1] = 0 THEN j ELSE j - 1 END
                         ELSE v END)
                    ELSE pmax END
        FROM bt{lv} WHERE i > 0 OR j > 0
    ),
    span{lv} AS (
        SELECT test_id, train_id,
               list_transform(pmin,
                   (v, r) -> CASE WHEN r = 1 THEN 0 ELSE v END) AS pmin,
               pmax
        FROM bt{lv} WHERE i = 0 AND j = 0
    )"""


def _fdtw_expand_cte(
    lv: int, n_c: int, n_f: int, m_f: int, a_f: str, b_f: str, feat_src: str
) -> str:
    """Coarse path spans -> fine-level windows (dtw_kernel._expand_batch's
    interval form of _expand_window): dilate each row span over the
    2*radius+1 surrounding rows on n_c + radius extension rows, pad by
    radius, upsample 2x, clip to [0, m_f - 1]."""
    r = _FDTW_RADIUS
    n_e = n_c + r
    imax, imin = "9223372036854775807", "-9223372036854775807"
    lo_ext = (
        f"list_transform(range(0, {n_e}), e -> least("
        f"CASE WHEN e - 1 >= 0 AND e - 1 <= {n_c - 1} THEN s.pmin[e] ELSE {imax} END,"
        f" CASE WHEN e <= {n_c - 1} THEN s.pmin[e + 1] ELSE {imax} END,"
        f" CASE WHEN e + 1 <= {n_c - 1} THEN s.pmin[e + 2] ELSE {imax} END) - {r})"
    )
    hi_ext = (
        f"list_transform(range(0, {n_e}), e -> greatest("
        f"CASE WHEN e - 1 >= 0 AND e - 1 <= {n_c - 1} THEN s.pmax[e] ELSE {imin} END,"
        f" CASE WHEN e <= {n_c - 1} THEN s.pmax[e + 1] ELSE {imin} END,"
        f" CASE WHEN e + 1 <= {n_c - 1} THEN s.pmax[e + 2] ELSE {imin} END) + {r})"
    )
    lo_f = (
        f"list_transform(range(0, {n_f}), i -> greatest(0, least("
        f"2 * loe[least(i // 2, {n_e - 1}) + 1], {m_f - 1})))"
    )
    hi_f = (
        f"list_transform(range(0, {n_f}), i -> greatest(0, least("
        f"2 * hie[least(i // 2, {n_e - 1}) + 1] + 1, {m_f - 1})))"
    )
    return f"""ext{lv} AS (
        SELECT test_id, train_id, {lo_ext} AS loe, {hi_ext} AS hie
        FROM span{lv} s
    ),
    win{lv - 1} AS (
        SELECT e.test_id, e.train_id, f.{a_f}, f.{b_f},
               {lo_f} AS lo, {hi_f} AS hi
        FROM ext{lv} e JOIN {feat_src} f
          ON e.test_id = f.test_id AND e.train_id = f.train_id
    )"""


def _fdtw_dist_sql(n: int, series_cte: str) -> str:
    """WITH-RECURSIVE body ending in dd(test_id, train_id, train_label,
    dist): faithful FastDTW radius=1 for every test x train pair of
    fixed-length-n series."""
    chain = _fdtw_level_chain(n)
    L = len(chain)
    parts = [
        series_cte,
        """pairs AS (
        SELECT t.series_id AS test_id, r.series_id AS train_id,
               r.label AS train_label, t.features AS a0, r.features AS b0
        FROM test t CROSS JOIN train r
    )""",
    ]
    prev = "pairs"
    for li in range(1, L):
        parts.append(
            f"""lvl{li} AS (
        SELECT *, {_fdtw_coarsen(f'a{li - 1}', chain[li - 1])} AS a{li},
                  {_fdtw_coarsen(f'b{li - 1}', chain[li - 1])} AS b{li}
        FROM {prev}
    )"""
        )
        prev = f"lvl{li}"
    feat_src = prev
    lc, n_c = L - 1, chain[L - 1]
    parts.append(
        f"""win{lc} AS (
        SELECT test_id, train_id, a{lc}, b{lc},
               list_transform(range(0, {n_c}), r -> 0) AS lo,
               list_transform(range(0, {n_c}), r -> {n_c - 1}) AS hi
        FROM {feat_src}
    )"""
    )
    for li in range(L - 1, 0, -1):
        nl = chain[li]
        parts.append(_fdtw_dp_cte(li, nl, nl, f"a{li}", f"b{li}", f"win{li}"))
        parts.append(_fdtw_choice_ctes(li, nl, nl))
        parts.append(_fdtw_bt_ctes(li, nl, nl))
        nf = chain[li - 1]
        parts.append(
            _fdtw_expand_cte(li, nl, nf, nf, f"a{li - 1}", f"b{li - 1}", feat_src)
        )
    parts.append(_fdtw_dp_cte(0, n, n, "a0", "b0", "win0"))
    parts.append(
        f"""dd AS (
        SELECT d.test_id, d.train_id, p.train_label, d.vals[{n}] AS dist
        FROM dp0 d JOIN pairs p
          ON d.test_id = p.test_id AND d.train_id = p.train_id
        WHERE d.i = {n}
    )"""
    )
    return "WITH RECURSIVE " + ",\n".join(parts)


# --- portable-hash SQL fragments (mirror functions/text.py bit-for-bit) ----


def _sql_char_fold(expr: str) -> str:
    """Polynomial char-fold hash of a string expression (= char_hash)."""
    return (
        f"list_reduce(list_prepend(cast(0 AS bigint),"
        f" list_transform(range(1, len({expr})+1),"
        f" i -> cast(ascii(substr({expr}, i, 1)) AS bigint))),"
        f" (h, c) -> (h * {HASH_BASE} + c) % {HASH_P})"
    )


_SQL_TOKENS = (
    "list_filter(string_split_regex(lower(trim(text)), '\\s+'), x -> x != '')"
)

# distinct char-5-gram shingles (= char_shingles(n=5))
_SQL_SHINGLES = (
    "CASE WHEN len(text) >= 5 THEN"
    " list_distinct(list_transform(range(1, len(text)-3), i -> substr(text, i, 5)))"
    " ELSE [] END"
)

_SQL_JACCARD = (
    "cast(len(list_intersect(_sa, _sb)) AS double)"
    " / cast(len(list_distinct(list_concat(_sa, _sb))) AS double)"
)


def _sql_minhash_sig(num_hashes: int = 16) -> str:
    """array of minhash values from a 'hashes' bigint-list column."""
    parts = [
        f"list_min(list_transform(hashes, h -> ({MINHASH_A[j]} * h + {MINHASH_B[j]}) % {HASH_P}))"
        for j in range(num_hashes)
    ]
    return "[" + ", ".join(parts) + "]"


_SQL_SHINGLE_TABLE = f"""
sh AS (
    SELECT doc_id, {_SQL_SHINGLES} AS shingles
    FROM documents
),
shh AS (
    SELECT doc_id, shingles,
           list_transform(shingles, s -> {_sql_char_fold('s')}) AS hashes
    FROM sh
)
"""


def _sql_sqdist(a: str, b: str) -> str:
    """Left-fold squared euclidean between two named list columns."""
    return (
        f"list_reduce(list_prepend(cast(0.0 AS double),"
        f" list_transform(range(1, len({a})+1),"
        f" i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i]))), (x, y) -> x + y)"
    )


def _sql_paa(arr: str, segments: int, length: int) -> str:
    """PAA sketch (= functions/arrays.py::paa, bit-identical fold order)."""
    seg = length // segments
    parts = [
        f"list_reduce(list_prepend(cast(0.0 AS double),"
        f" {arr}[{i * seg + 1}:{i * seg + seg}]), (a, v) -> a + v) / {float(seg)}"
        for i in range(segments)
    ]
    return "[" + ", ".join(parts) + "]"


def _sql_dot(a: str, b: str) -> str:
    """Left-fold dot product (= functions/distance.py::dot, bit-identical)."""
    return (
        f"list_reduce(list_prepend(cast(0.0 AS double),"
        f" list_transform(range(1, len({a})+1), i -> {a}[i] * {b}[i])),"
        f" (x, y) -> x + y)"
    )


def _sql_random_proj(out_dim: int = 8, dim: int = 64, plane_offset: int = 7001) -> str:
    """Mirror of operators/similarity.py::random_project — same hash-derived
    plane coefficients as the LSH oracle, left-fold dot per output dim."""

    def coeff(plane: int, d: int) -> str:
        v = f"(cast(1103515245 AS bigint) * ({plane} * 1009 + {d}) + 12345) % {HASH_P}"
        return f"(cast({v} AS double) / {HASH_P} - 0.5)"

    def proj(j: int) -> str:
        prods = ", ".join(
            f"v[{d + 1}] * {coeff(plane_offset + j, d)}" for d in range(dim)
        )
        return (
            f"round(list_reduce(list_prepend(cast(0.0 AS double), [{prods}]),"
            f" (x, y) -> x + y), 6) AS p{j}"
        )

    cols = ", ".join(proj(j) for j in range(out_dim))
    return f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        )
        SELECT vec_id, {cols} FROM c
    """


def _sql_ann_lsh(planes: int = 4, tables: int = 8, dim: int = 64, k: int = 5) -> str:
    """Mirror of operators/similarity.py::ann_lsh_topk — the hyperplane
    coefficients are hash-derived integers, so even the LSH approximation is
    exactly reproducible in SQL."""

    def coeff(plane: int, d: int) -> str:
        v = f"(cast(1103515245 AS bigint) * ({plane} * 1009 + {d}) + 12345) % {HASH_P}"
        return f"(cast({v} AS double) / {HASH_P} - 0.5)"

    def bucket(t: int) -> str:
        terms = []
        for p in range(planes):
            plane = t * 131 + p
            prods = ", ".join(f"v[{d + 1}] * {coeff(plane, d)}" for d in range(dim))
            proj = (
                f"list_reduce(list_prepend(cast(0.0 AS double), [{prods}]),"
                f" (x, y) -> x + y)"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END)")
        return "cast(" + " + ".join(terms) + " AS bigint)"

    buckets_cols = ", ".join(f"{bucket(t)} AS bucket_{t}" for t in range(tables))
    unpivot = " UNION ALL ".join(
        f"SELECT vec_id, v, {t} AS tbl, bucket_{t} AS bucket FROM vb"
        for t in range(tables)
    )
    return f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        vb AS (SELECT vec_id, v, {buckets_cols} FROM c),
        entries AS ({unpivot}),
        qe AS (SELECT * FROM entries WHERE vec_id % 25 = 0),
        cands AS (
            SELECT DISTINCT q.vec_id AS query_id, q.v AS qv,
                            e.vec_id AS neighbor_id, e.v AS cv
            FROM qe q JOIN entries e ON q.tbl = e.tbl AND q.bucket = e.bucket
            WHERE q.vec_id != e.vec_id
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   1.0 - {_sql_dot("qv", "cv")}
                         / (sqrt({_sql_dot("qv", "qv")}) * sqrt({_sql_dot("cv", "cv")})) AS d
            FROM cands
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY d ASC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(d, 6) AS cos_dist
        FROM ranked WHERE rank <= {k}
    """


def _sql_ann_lsh_multiprobe(
    planes: int = 4, tables: int = 8, dim: int = 64, k: int = 5, probes: int = 2
) -> str:
    """Mirror of ann_lsh_topk(probes=2) — q24's oracle plus query-side probe
    buckets: per (vector, table), flip the ``probes`` hyperplane bits with
    the smallest |projection| (ties by plane index — numpy stable argsort
    parity). Projections are the same left-fold doubles the bucket signs
    use, so the flip ORDER is exactly reproducible in SQL."""

    def coeff(plane: int, d: int) -> str:
        v = f"(cast(1103515245 AS bigint) * ({plane} * 1009 + {d}) + 12345) % {HASH_P}"
        return f"(cast({v} AS double) / {HASH_P} - 0.5)"

    arms = []
    for t in range(tables):
        for p in range(planes):
            plane = t * 131 + p
            prods = ", ".join(f"v[{d + 1}] * {coeff(plane, d)}" for d in range(dim))
            proj = (
                f"list_reduce(list_prepend(cast(0.0 AS double), [{prods}]),"
                f" (x, y) -> x + y)"
            )
            arms.append(f"SELECT vec_id, {t} AS tbl, {p} AS p, {proj} AS proj FROM c")
    unpivot = " UNION ALL ".join(arms)
    return f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        proj_rows AS ({unpivot}),
        vb AS (
            SELECT vec_id, tbl,
                   cast(sum(CASE WHEN proj > 0
                            THEN cast(1 AS bigint) << p ELSE 0 END) AS bigint) AS bucket
            FROM proj_rows GROUP BY vec_id, tbl
        ),
        flips AS (
            SELECT vec_id, tbl, p,
                   row_number() OVER (PARTITION BY vec_id, tbl
                                      ORDER BY abs(proj) ASC, p ASC) AS r
            FROM proj_rows
        ),
        qentries AS (
            SELECT vec_id, tbl, bucket FROM vb WHERE vec_id % 25 = 0
            UNION ALL
            SELECT f.vec_id, f.tbl,
                   xor(b.bucket, cast(1 AS bigint) << f.p) AS bucket
            FROM flips f JOIN vb b ON f.vec_id = b.vec_id AND f.tbl = b.tbl
            WHERE f.r <= {probes} AND f.vec_id % 25 = 0
        ),
        cands AS (
            SELECT DISTINCT q.vec_id AS query_id, e.vec_id AS neighbor_id
            FROM qentries q JOIN vb e ON q.tbl = e.tbl AND q.bucket = e.bucket
            WHERE q.vec_id != e.vec_id
        ),
        scored AS (
            SELECT cd.query_id, cd.neighbor_id,
                   1.0 - {_sql_dot("qc.v", "nc.v")}
                         / (sqrt({_sql_dot("qc.v", "qc.v")})
                            * sqrt({_sql_dot("nc.v", "nc.v")})) AS d
            FROM cands cd
            JOIN c qc ON qc.vec_id = cd.query_id
            JOIN c nc ON nc.vec_id = cd.neighbor_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY d ASC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(d, 6) AS cos_dist
        FROM ranked WHERE rank <= {k}
    """


def _sql_hash_embed_cte(dim: int = 64) -> str:
    """CTE chain ending in he(doc_id, v) — the hash_embed mirror: char-fold
    token hash, signed bucket sums (integer-exact), left-fold L2 norm.
    Case folding is the 26-entry ASCII translate (ascii_word_tokens), not
    lower(): engines' Unicode lower() mappings diverge off-ASCII."""
    sums_cols = ", ".join(
        f"cast(sum(CASE WHEN h % {dim} = {i} THEN s ELSE 0 END) AS bigint) AS c{i}"
        for i in range(dim)
    )
    arr = ", ".join(f"cast(coalesce(s.c{i}, 0) AS double)" for i in range(dim))
    return f"""
        toks AS (
            SELECT doc_id,
                   unnest(regexp_extract_all(
                       translate(text, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                 'abcdefghijklmnopqrstuvwxyz'),
                       '[a-z0-9]+')) AS tok
            FROM documents
        ),
        hashed AS (
            SELECT doc_id, {_sql_char_fold('tok')} AS h FROM toks
        ),
        signed AS (
            SELECT doc_id, h,
                   CASE WHEN h % {2 * dim} >= {dim} THEN -1 ELSE 1 END AS s
            FROM hashed
        ),
        sums AS (SELECT doc_id, {sums_cols} FROM signed GROUP BY doc_id),
        vecs AS (
            SELECT d.doc_id, [{arr}] AS rawv
            FROM documents d LEFT JOIN sums s USING (doc_id)
        ),
        he AS (
            SELECT doc_id,
                   CASE WHEN sqrt({_sql_dot("rawv", "rawv")}) > 0
                        THEN list_transform(rawv,
                             x -> x / sqrt({_sql_dot("rawv", "rawv")}))
                        ELSE rawv END AS v
            FROM vecs
        )"""


def _sql_dedup_embedding(planes: int = 4, tables: int = 8, dim: int = 64,
                         threshold: float = 0.65) -> str:
    """Mirror of operators/dedup.py::dedup_embedding (strategy='lsh') — the
    same hash-derived hyperplane spec as _sql_ann_lsh, id_a < id_b pairs
    sharing any bucket, exact left-fold cosine filter."""

    def coeff(plane: int, d: int) -> str:
        v = f"(cast(1103515245 AS bigint) * ({plane} * 1009 + {d}) + 12345) % {HASH_P}"
        return f"(cast({v} AS double) / {HASH_P} - 0.5)"

    def bucket(t: int) -> str:
        terms = []
        for p in range(planes):
            plane = t * 131 + p
            prods = ", ".join(f"v[{d + 1}] * {coeff(plane, d)}" for d in range(dim))
            proj = (
                f"list_reduce(list_prepend(cast(0.0 AS double), [{prods}]),"
                f" (x, y) -> x + y)"
            )
            terms.append(f"(CASE WHEN {proj} > 0 THEN {2**p} ELSE 0 END)")
        return "cast(" + " + ".join(terms) + " AS bigint)"

    buckets_cols = ", ".join(f"{bucket(t)} AS bucket_{t}" for t in range(tables))
    unpivot = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, bucket_{t} AS bucket FROM vb"
        for t in range(tables)
    )
    return f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        vb AS (SELECT vec_id, v, {buckets_cols} FROM c),
        entries AS ({unpivot}),
        pairs AS (
            SELECT DISTINCT x.vec_id AS id_a, y.vec_id AS id_b
            FROM entries x JOIN entries y
              ON x.tbl = y.tbl AND x.bucket = y.bucket AND x.vec_id < y.vec_id
        ),
        scored AS (
            SELECT p.id_a, p.id_b,
                   1.0 - {_sql_dot("a.v", "b.v")}
                         / (sqrt({_sql_dot("a.v", "a.v")}) * sqrt({_sql_dot("b.v", "b.v")})) AS d
            FROM pairs p
            JOIN c a ON p.id_a = a.vec_id
            JOIN c b ON p.id_b = b.vec_id
        )
        SELECT id_a, id_b, round(d, 6) AS cos_dist
        FROM scored WHERE d <= {threshold}
    """


def _sql_ann_ivf(n_lists: int = 16, n_probe: int = 4, k: int = 5) -> str:
    """Mirror of operators/similarity.py::ann_ivf_topk — seed centroids are
    the n_lists lowest vec_ids, assignment/probe/rerank all use the same
    left-fold cosine, (dist, id) total-order tie-breaks throughout."""

    def cos(a: str, b: str) -> str:
        return (
            f"1.0 - {_sql_dot(a, b)}"
            f" / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"
        )

    return f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        cent AS (
            SELECT vec_id AS list_id, v AS lv FROM c ORDER BY vec_id LIMIT {n_lists}
        ),
        asn0 AS (
            SELECT c.vec_id AS neighbor_id, cent.list_id, c.v AS cv,
                   {cos("c.v", "cent.lv")} AS d
            FROM c CROSS JOIN cent
        ),
        asn AS (
            SELECT neighbor_id, list_id, cv FROM (
                SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                             ORDER BY d ASC, list_id ASC) AS rn
                FROM asn0
            ) WHERE rn = 1
        ),
        probe0 AS (
            SELECT q.vec_id AS query_id, cent.list_id, q.v AS qv,
                   {cos("q.v", "cent.lv")} AS d
            FROM (SELECT * FROM c WHERE vec_id % 25 = 0) q CROSS JOIN cent
        ),
        probes AS (
            SELECT query_id, list_id, qv FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY d ASC, list_id ASC) AS rn
                FROM probe0
            ) WHERE rn <= {n_probe}
        ),
        cands AS (
            SELECT p.query_id, p.qv, a.neighbor_id, a.cv
            FROM probes p JOIN asn a USING (list_id)
            WHERE p.query_id != a.neighbor_id
        ),
        scored AS (
            SELECT query_id, neighbor_id, {cos("qv", "cv")} AS d
            FROM cands
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY d ASC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(d, 6) AS cos_dist
        FROM ranked WHERE rank <= {k}
    """


def _sql_k_sweep(ks=(1, 3, 5)) -> str:
    """Mirror of operators/evaluate.py::k_sweep over the shared top-k table."""
    branches = []
    for k in ks:
        branches.append(f"""
        SELECT {k} AS k, count(*) AS n_rows,
               cast(sum(cast(predicted_label = label AS bigint)) AS bigint) AS n_correct,
               avg(cast(predicted_label = label AS double)) AS accuracy
        FROM (
            SELECT p.test_id, p.predicted_label, t.label FROM (
                SELECT test_id, train_label AS predicted_label FROM (
                    SELECT test_id, train_label,
                           row_number() OVER (PARTITION BY test_id
                               ORDER BY votes DESC, best_rank ASC, train_label ASC) AS vrk
                    FROM (SELECT test_id, train_label, count(*) AS votes,
                                 min(rank) AS best_rank
                          FROM topk WHERE rank <= {k}
                          GROUP BY test_id, train_label)
                ) WHERE vrk = 1
            ) p JOIN test t ON p.test_id = t.series_id
        )""")
    return f"WITH {_SERIES_CTE}, {_KNN_TOPK_CTE} " + " UNION ALL ".join(branches)


def _sql_lang_counts() -> str:
    cols = []
    for code, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        cols.append(
            f"len(list_filter(toks, t -> list_contains([{lst}], t))) AS n_{code}"
        )
    return ", ".join(cols)


def _sql_lsh_pairs() -> str:
    """q18 oracle body: the full shingle->minhash->capped-band->verify
    pipeline; also embedded as the pair source of the q35 components
    oracle."""
    return f"""
            WITH {_SQL_SHINGLE_TABLE},
            shd AS (
                SELECT doc_id, list_distinct(hashes) AS hashes FROM shh
            ),
            sigs AS (
                SELECT doc_id, {_sql_minhash_sig(16)} AS sig FROM shd
            ),
            bands AS (
                {" UNION ALL ".join(
                    "SELECT doc_id, " + str(b) + " AS band, concat_ws('-', "
                    + ", ".join(f"sig[{b * 4 + r + 1}]" for r in range(4))
                    + ") AS key FROM sigs"
                    for b in range(4)
                )}
            ),
            ok_buckets AS (
                SELECT band, key FROM bands GROUP BY band, key HAVING count(*) <= 64
            ),
            capped AS (
                SELECT b.* FROM bands b JOIN ok_buckets USING (band, key)
            ),
            cands AS (
                SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM capped a JOIN capped b USING (band, key)
                WHERE a.doc_id < b.doc_id
            ),
            pre AS (
                SELECT c.id_a, c.id_b
                FROM cands c
                JOIN sigs ga ON c.id_a = ga.doc_id
                JOIN sigs gb ON c.id_b = gb.doc_id
                WHERE cast(len(list_filter(
                          list_transform(range(1, len(ga.sig)+1),
                              i -> CASE WHEN ga.sig[i] = gb.sig[i] THEN 1 ELSE 0 END),
                          v -> v = 1)) AS double) / 16.0 >= 0.25
            ),
            verified AS (
                SELECT p.id_a, p.id_b, sa.hashes AS _sa, sb.hashes AS _sb
                FROM pre p
                JOIN shd sa ON p.id_a = sa.doc_id
                JOIN shd sb ON p.id_b = sb.doc_id
            )
            SELECT id_a, id_b, round({_SQL_JACCARD}, 6) AS jac
            FROM verified WHERE {_SQL_JACCARD} >= 0.5
        """


def _sql_lerp(t: int, out_len: int) -> str:
    """One output point of resample_linear: same op order as the Spark expr
    (t * (n-1) as double / (L-1), floor/frac, lo/hi lerp)."""
    pos = (
        f"(cast({t} AS double) * cast(len(features) - 1 AS double)"
        f" / cast({out_len - 1} AS double))"
    )
    lo = f"cast(floor({pos}) AS int)"
    frac = f"({pos} - floor({pos}))"
    v_lo = f"features[{lo} + 1]"
    v_hi = f"features[least({lo} + 2, len(features))]"
    return f"({v_lo} * (1.0 - {frac}) + {v_hi} * {frac})"


def _sql_profile(table: str, numeric: set[str], cols: list[str]) -> str:
    """UNION ALL twin of profile_table: one SELECT of the same aggregates
    per column (DuckDB has no 1-row-unpivot idiom worth mirroring)."""
    parts = []
    for c in cols:
        mn = f"cast(min({c}) AS double)" if c in numeric else "cast(NULL AS double)"
        mx = f"cast(max({c}) AS double)" if c in numeric else "cast(NULL AS double)"
        parts.append(
            f"SELECT '{c}' AS col_name, count(*) AS n_rows,"
            f" cast(sum(cast({c} IS NULL AS int)) AS bigint) AS n_nulls,"
            f" cast(sum(cast({c} IS NULL AS int)) AS double) / cast(count(*) AS double) AS null_frac,"
            f" count(DISTINCT {c}) AS n_distinct,"
            f" {mn} AS min_num, {mx} AS max_num FROM {table}"
        )
    return " UNION ALL ".join(parts)


def _sql_sqd(a: str, b: str) -> str:
    """Left-fold squared-euclidean (= functions/distance.py::sq_euclidean,
    bit-identical: zip_with squares first, then the 0.0-seeded sum fold)."""
    return (
        f"list_reduce(list_prepend(cast(0.0 AS double),"
        f" list_transform(range(1, len({a})+1),"
        f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))),"
        f" (x, y) -> x + y)"
    )


def _sql_kmeans_ctes(
    k: int = 8, scale: int = 1_000_000, dim: int = 64, iters: int = 2,
    seed: str = "lowid",
) -> str:
    """Mirror of operators/cluster.py::kmeans_assign(k, iters): seed =
    lowest-k vec_ids, argmin assignment with (dist, cluster) tie-break,
    fixed-point int64-micro centroid refit, reassign — ``iters``
    assignment passes (``iters - 1`` refits). Ends at CTEs
    ``asn{iters-1}`` (vec_id, cluster) and ``cent{iters-1}`` (cluster,
    cv) with ``c`` (vec_id, v) still in scope."""

    def assign(cent: str, out: str) -> str:
        return f"""{out}0 AS (
            SELECT c.vec_id, {cent}.cluster,
                   row_number() OVER (PARTITION BY c.vec_id
                                      ORDER BY {_sql_sqd('c.v', f'{cent}.cv')} ASC,
                                               {cent}.cluster ASC) AS rn
            FROM c CROSS JOIN {cent}
        ), {out} AS (SELECT vec_id, cluster FROM {out}0 WHERE rn = 1)"""

    def refit(asn: str, csums: str, cent: str) -> str:
        return f"""{csums} AS (
            SELECT a.cluster, d.dim, count(*) AS n,
                   sum(cast(round(c.v[d.dim + 1] * {scale}) AS bigint)) AS s
            FROM {asn} a JOIN c USING (vec_id)
            CROSS JOIN (SELECT unnest(range(0, {dim})) AS dim) d
            GROUP BY a.cluster, d.dim
        ),
        {cent} AS (
            SELECT cluster,
                   list(cast(s AS double) / cast(n * {scale} AS double)
                        ORDER BY dim) AS cv
            FROM {csums} GROUP BY cluster
        )"""

    parts = [
        f"""c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        cent0 AS (
            SELECT vec_id AS cluster, v AS cv FROM c
            ORDER BY {"((vec_id % 1000000007) * 654435747 + 40503) % 1000000007, vec_id" if seed == "spread" else "vec_id"}
            LIMIT {k}
        ),
        {assign('cent0', 'asn0')}"""
    ]
    for i in range(1, max(iters, 1)):
        parts.append(refit(f"asn{i - 1}", f"csums{i}", f"cent{i}"))
        parts.append(assign(f"cent{i}", f"asn{i}"))
    return ",\n        ".join(parts)


def _sql_quantized_ann(k: int = 5, every: int = 25) -> str:
    """Mirror of operators/similarity.py::ann_quantized_topk: per-vector
    symmetric int8 quantization, INT64 dot/norm ranking."""
    idot = (
        "list_reduce(list_prepend(cast(0 AS bigint),"
        " list_transform(range(1, len({a})+1),"
        " i -> cast({a}[i] * {b}[i] AS bigint))), (x, y) -> x + y)"
    )

    def d(a, b):
        return idot.format(a=a, b=b)

    return f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        qt AS (
            SELECT vec_id,
                   CASE WHEN amax > 0
                        THEN list_transform(v, x -> cast(round(x * 127.0 / amax) AS int))
                        ELSE list_transform(v, x -> 0) END AS qvec
            FROM (SELECT vec_id, v,
                         list_max(list_transform(v, x -> abs(x))) AS amax
                  FROM c)
        ),
        cand AS (
            SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                   q.qvec AS qa, e.qvec AS qb
            FROM (SELECT * FROM qt WHERE vec_id % {every} = 0) q
            CROSS JOIN qt e
            WHERE q.vec_id != e.vec_id
        ),
        scored AS (
            SELECT query_id, neighbor_id,
                   CASE WHEN {d('qa', 'qa')} > 0 AND {d('qb', 'qb')} > 0
                        THEN 1.0 - cast({d('qa', 'qb')} AS double)
                             / (sqrt(cast({d('qa', 'qa')} AS double))
                                * sqrt(cast({d('qb', 'qb')} AS double)))
                        ELSE 1.0 END AS d
            FROM cand
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY d ASC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(d, 6) AS q_cos_dist
        FROM ranked WHERE rank <= {k}
    """


def _sql_span_dedup(span: int = 8, min_docs: int = 3) -> str:
    """Mirror of operators/corpus.py::remove_common_spans."""
    return f"""
        WITH base AS (
            SELECT doc_id, {_SQL_TOKENS} AS t FROM documents
        ),
        spans AS (
            SELECT doc_id, pos,
                   array_to_string(t[pos * {span} + 1 : pos * {span} + {span}], ' ') AS s
            FROM (SELECT doc_id, t,
                         unnest(range(0, cast(ceil(len(t) / {span}.0) AS bigint))) AS pos
                  FROM base WHERE len(t) >= 1)
        ),
        common AS (
            SELECT s FROM spans GROUP BY s
            HAVING count(DISTINCT doc_id) >= {min_docs}
        ),
        kept AS (
            SELECT * FROM spans WHERE s NOT IN (SELECT s FROM common)
        ),
        rebuilt AS (
            SELECT doc_id, count(*) AS n_kept,
                   string_agg(s, ' ' ORDER BY pos) AS cleaned
            FROM kept GROUP BY doc_id
        ),
        totals AS (SELECT doc_id, count(*) AS n_spans FROM spans GROUP BY doc_id)
        SELECT t.doc_id, cast(t.n_spans AS int) AS n_spans,
               cast(coalesce(r.n_kept, 0) AS int) AS n_kept,
               coalesce(r.cleaned, '') AS cleaned_text
        FROM totals t LEFT JOIN rebuilt r USING (doc_id)
    """


def _sql_ann_ivf_kmeans(
    k: int = 5, n_probe: int = 8, n_lists: int = 16, iters: int = 4
) -> str:
    """Mirror of the q93 composition: _sql_kmeans_ctes(k=n_lists, iters)
    produces the refit centroid table cent{iters-1}, then the IVF
    assign/probe/rerank CTEs (same cosine folds and tie-breaks as
    _sql_ann_ivf) run against it."""

    def cos(a: str, b: str) -> str:
        return (
            f"1.0 - {_sql_dot(a, b)}"
            f" / (sqrt({_sql_dot(a, a)}) * sqrt({_sql_dot(b, b)}))"
        )

    return f"""
        WITH {_sql_kmeans_ctes(k=n_lists, iters=iters)},
        cent AS (SELECT cluster AS list_id, cv AS lv FROM cent{iters - 1}),
        iasn0 AS (
            SELECT c.vec_id AS neighbor_id, cent.list_id, c.v AS cv,
                   {cos("c.v", "cent.lv")} AS d
            FROM c CROSS JOIN cent
        ),
        iasn AS (
            SELECT neighbor_id, list_id, cv FROM (
                SELECT *, row_number() OVER (PARTITION BY neighbor_id
                                             ORDER BY d ASC, list_id ASC) AS rn
                FROM iasn0
            ) WHERE rn = 1
        ),
        probe0 AS (
            SELECT q.vec_id AS query_id, cent.list_id, q.v AS qv,
                   {cos("q.v", "cent.lv")} AS d
            FROM (SELECT * FROM c WHERE vec_id % 25 = 0) q CROSS JOIN cent
        ),
        probes AS (
            SELECT query_id, list_id, qv FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY d ASC, list_id ASC) AS rn
                FROM probe0
            ) WHERE rn <= {n_probe}
        ),
        cands AS (
            SELECT p.query_id, p.qv, a.neighbor_id, a.cv
            FROM probes p JOIN iasn a USING (list_id)
            WHERE p.query_id != a.neighbor_id
        ),
        scored AS (
            SELECT query_id, neighbor_id, {cos("qv", "cv")} AS d
            FROM cands
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY d ASC, neighbor_id ASC) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(d, 6) AS cos_dist
        FROM ranked WHERE rank <= {k}
    """



def _sql_sqd_n(a: str, b: str, n: int) -> str:
    """Left-fold squared distance over the first n positions (the sq_euclidean
    zip_with+aggregate op order)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(range(1, {n + 1}),"
        f" i -> ({a}[i]-{b}[i])*({a}[i]-{b}[i]))), (x, y) -> x + y)"
    )


def _sql_pq_ctes(
    src: str, pfx: str = "pq", n_subspaces: int = 8, n_codes: int = 16, d: int = 8
) -> str:
    """Mirror of operators/similarity.py::pq_train + pq_encode over a source
    relation ``src`` with columns (vec_id, v): hash-ranked spread seeds,
    one fixed-point refit, nearest-code encoding. Emits prefixed CTEs ending at
    ``{pfx}cent`` (subspace, code, cv) and ``{pfx}codes``
    (vec_id, subspace, code)."""
    sqd = _sql_sqd_n
    return f"""{pfx}sub AS (
            SELECT {src}.vec_id, m.m AS subspace,
                   list_slice({src}.v, m.m*{d}+1, m.m*{d}+{d}) AS sv
            FROM {src}, (SELECT unnest(range(0, {n_subspaces})) AS m) m(m)
        ),
        {pfx}cent0 AS (
            SELECT subspace, rn - 1 AS code, sv AS cv FROM (
                SELECT *, row_number() OVER (PARTITION BY subspace
                           ORDER BY ((vec_id % 1000000007) * 654435747
                                     + 40503) % 1000000007, vec_id) AS rn
                FROM {pfx}sub
            ) WHERE rn <= {n_codes}
        ),
        {pfx}asn0 AS (
            SELECT vec_id, subspace, code FROM (
                SELECT s.vec_id, s.subspace, c0.code,
                       row_number() OVER (PARTITION BY s.vec_id, s.subspace
                           ORDER BY {sqd('s.sv', 'c0.cv', d)} ASC, c0.code ASC) AS rn
                FROM {pfx}sub s JOIN {pfx}cent0 c0 USING (subspace)
            ) WHERE rn = 1
        ),
        {pfx}csums AS (
            SELECT a.subspace, a.code, dd.dim, count(*) AS n,
                   sum(cast(round(s.sv[dd.dim + 1] * 1000000) AS bigint)) AS sm
            FROM {pfx}asn0 a
            JOIN {pfx}sub s ON s.vec_id = a.vec_id AND s.subspace = a.subspace
            CROSS JOIN (SELECT unnest(range(0, {d})) AS dim) dd
            GROUP BY a.subspace, a.code, dd.dim
        ),
        {pfx}cent AS (
            SELECT subspace, code,
                   list(cast(sm AS double) / cast(n * 1000000 AS double)
                        ORDER BY dim) AS cv
            FROM {pfx}csums GROUP BY subspace, code
        ),
        {pfx}codes AS (
            SELECT vec_id, subspace, code FROM (
                SELECT s.vec_id, s.subspace, c1.code,
                       row_number() OVER (PARTITION BY s.vec_id, s.subspace
                           ORDER BY {sqd('s.sv', 'c1.cv', d)} ASC, c1.code ASC) AS rn
                FROM {pfx}sub s JOIN {pfx}cent c1 USING (subspace)
            ) WHERE rn = 1
        )"""


def _sql_bm25_ctes(mod: int = 23, qlen: int = 6, max_postings: int = 0) -> str:
    """Mirror of operators/corpus.py::bm25_topk over the documents table
    with the q117 workload (every doc_id % ``mod`` == 0 document's first
    ``qlen`` tokens as a query): rational ln()-free idf, k1=1.2 / b=0.75
    saturation in the operator's exact left-assoc double tree, per-term
    contributions rounded to integer micro-units. ``max_postings`` > 0
    replays the impact-ordered posting truncation (per-(query, term)
    top-M by contribution desc, doc asc). Emits CTEs ending at
    ``bmranked`` (query_id, doc_id, score_micro, rank)."""
    trunc = (
        f""",
        bmtrunc AS (
            SELECT query_id, doc_id, c FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id, term
                            ORDER BY c DESC, doc_id ASC) AS prn
                FROM contrib
            ) WHERE prn <= {max_postings}
        )"""
        if max_postings
        else ""
    )
    src = "bmtrunc" if max_postings else "contrib"
    return f"""tok AS (
            SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
        ),
        qt AS (
            SELECT DISTINCT doc_id AS query_id,
                   unnest(list_slice(toks, 1, {qlen})) AS term
            FROM tok WHERE doc_id % {mod} = 0
        ),
        tfe AS (
            SELECT doc_id, len(toks) AS dl, unnest(toks) AS term FROM tok
        ),
        tf AS (
            SELECT doc_id, dl, term, count(*) AS tf
            FROM tfe GROUP BY doc_id, dl, term
        ),
        dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        stats AS (
            SELECT count(DISTINCT doc_id) AS n_docs,
                   sum(len(toks)) AS total_tokens
            FROM tok
        ),
        contrib AS (
            SELECT q.query_id, t.doc_id, t.term, d.df,
                   CAST(round(
                       ((CAST(s.n_docs - d.df AS double) + 0.5)
                            / (CAST(d.df AS double) + 0.5) + 1.0)
                       * ((CAST(t.tf AS double) * (1.2 + 1.0))
                            / (CAST(t.tf AS double)
                               + 1.2 * (1.0 - 0.75
                                        + 0.75 * (CAST(t.dl AS double)
                                                  / (CAST(s.total_tokens AS double)
                                                     / CAST(s.n_docs AS double))))))
                       * 1000000.0, 0) AS BIGINT) AS c
            FROM tf t
            JOIN qt q USING (term)
            JOIN dfq d USING (term)
            CROSS JOIN stats s
        ){trunc},
        bmscored AS (
            SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS score_micro
            FROM {src} GROUP BY query_id, doc_id
        ),
        bmranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY score_micro DESC, doc_id ASC) AS rank
            FROM bmscored
        )"""


def _sql_quality_pf_body() -> str:
    """The q125 workload's pf body: doc_quality_features + the n_chars
    weak label over ``documents``."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import STOPWORDS

    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return f"""
            SELECT doc_id,
                   CASE WHEN n_chars > {_QUALITY_LABEL_CHARS}
                        THEN 1 ELSE -1 END AS y,
                   [cast(1 AS bigint),
                    cast(len(t) AS bigint) - 53,
                    cast(len(list_filter(t, tk -> list_contains({stops}, tk)))
                         AS bigint) - 8,
                    cast(len(list_distinct(t)) AS bigint) - 30,
                    cast(len(list_filter(t, tk -> len(tk) >= 5))
                         AS bigint) - 20] AS x
            FROM (SELECT doc_id, n_chars, {_SQL_TOKENS} AS t FROM documents)"""


def _sql_perceptron_ctes(
    epochs: int = 4, dim: int = 5, pf_body: "str | None" = None
) -> str:
    """Mirror of operators/classify.py::train_quality_perceptron(epochs,
    averaged=True): chained CTEs replay every epoch — the q87 k-means
    technique applied to gradient descent. All arithmetic is int64
    (order-free sums), so the trained weights hash-match bit for bit.
    ``pf_body`` is the labeled-features SELECT producing (doc_id, y, x)
    — default is the q125 documents workload (_sql_quality_pf_body);
    q131 passes the series-features featurization instead. Ends at
    ``pa{epochs}`` (1 row, averaged weight list) with ``pf`` (doc_id, y,
    x) and ``pd`` (dim) in scope."""

    def margin(x: str, w: str) -> str:
        return (
            f"list_reduce(list_prepend(cast(0 AS bigint),"
            f" list_transform(range(1, {dim + 1}),"
            f" j -> {x}[j] * {w}[j])), (a, b) -> a + b)"
        )

    parts = [
        f"""pf AS ({pf_body if pf_body is not None else _sql_quality_pf_body()}
        ),
        pd AS (SELECT unnest(range(0, {dim})) AS dim),
        pw0 AS (SELECT list_transform(range(0, {dim}),
                                      i -> cast(0 AS bigint)) AS w),
        pa0 AS (SELECT list_transform(range(0, {dim}),
                                      i -> cast(0 AS bigint)) AS a)"""
    ]
    for t in range(1, epochs + 1):
        parts.append(
            f"""pm{t} AS (
            SELECT f.y, f.x FROM pf f CROSS JOIN pw{t - 1} w
            WHERE f.y * {margin('f.x', 'w.w')} <= 0
        ),
        pg{t} AS (
            SELECT d.dim,
                   cast(coalesce(sum(m.y * m.x[d.dim + 1]), 0) AS BIGINT) AS g
            FROM pd d LEFT JOIN pm{t} m ON true
            GROUP BY d.dim
        ),
        pw{t} AS (
            SELECT list(p.w[g.dim + 1] + g.g ORDER BY g.dim) AS w
            FROM pg{t} g CROSS JOIN pw{t - 1} p
        ),
        pa{t} AS (
            SELECT list_transform(range(1, {dim + 1}),
                                  i -> p.a[i] + w.w[i]) AS a
            FROM pa{t - 1} p CROSS JOIN pw{t} w
        )"""
        )
    return ",\n        ".join(parts)


def _sql_stump_ctes() -> str:
    """Mirror of operators/classify.py::train_stump on the q125 workload:
    explode to (dim, value, label), per-value counts, dim-partitioned
    running sums, both polarities, total-order argmin. Ends at ``sbest``
    (1 row) with ``pf``/``pd`` in scope (via _sql_perceptron_ctes' pf)."""
    return f"""{_sql_perceptron_ctes(epochs=0)},
        sex AS (
            SELECT f.y, d.dim, f.x[d.dim + 1] AS v
            FROM pf f CROSS JOIN pd d
        ),
        spv AS (
            SELECT dim, v,
                   sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS pos,
                   sum(CASE WHEN y < 0 THEN 1 ELSE 0 END) AS neg
            FROM sex GROUP BY dim, v
        ),
        scum AS (
            SELECT dim, v,
                   sum(pos) OVER (PARTITION BY dim ORDER BY v) AS cpos,
                   sum(neg) OVER (PARTITION BY dim ORDER BY v) AS cneg,
                   sum(pos) OVER (PARTITION BY dim) AS p,
                   sum(neg) OVER (PARTITION BY dim) AS n
            FROM spv
        ),
        srules AS (
            SELECT dim, v, 1 AS pol, cneg + p - cpos AS err, p + n AS total
            FROM scum
            UNION ALL
            SELECT dim, v, -1 AS pol, cpos + n - cneg AS err, p + n AS total
            FROM scum
        ),
        sbest AS (
            SELECT * FROM srules
            ORDER BY err ASC, dim ASC, v ASC, pol DESC LIMIT 1
        )"""


def _sql_series_features_ctes() -> str:
    """Mirror of operators/features.py::series_features over the _SERIES_CTE
    ``series`` table: CTEs sf0/sf1/sf2 + ``sfeat`` (all 10 columns) — every
    statistic's fold runs the identical IEEE op sequence the Spark
    expressions run. Shared by q127 (graded directly) and q131 (feeds the
    perceptron featurization)."""
    return """sf0 AS (
            SELECT series_id, features AS x, len(features) AS n,
                   list_reduce(list_prepend(cast(0.0 AS double), features),
                               (a, v) -> a + v) / len(features) AS mu
            FROM series
        ),
        sf1 AS (
            SELECT *, list_transform(x, v -> v - mu) AS d FROM sf0
        ),
        sf2 AS (
            SELECT *,
                   list_reduce(list_prepend(cast(0.0 AS double),
                       list_transform(d, v -> v * v)), (a, v) -> a + v) AS den,
                   CASE WHEN n >= 2 THEN
                       list_reduce(list_prepend(cast(0.0 AS double),
                           list_transform(range(1, n), i -> d[i] * d[i + 1])),
                           (a, v) -> a + v)
                   ELSE 0.0 END AS num
            FROM sf1
        ),
        sfeat AS (
        SELECT series_id,
               cast(n AS int) AS n_points,
               mu AS mean,
               den / n AS variance,
               list_min(x) AS vmin,
               list_max(x) AS vmax,
               CASE WHEN n >= 2 THEN
                   list_reduce(list_prepend(cast(0.0 AS double),
                       list_transform(range(2, n + 1),
                                      i -> abs(x[i] - x[i - 1]))),
                       (a, v) -> a + v) / (n - 1)
               ELSE 0.0 END AS mean_abs_change,
               cast(CASE WHEN n >= 2 THEN
                   len(list_filter(list_transform(range(2, n + 1),
                       i -> d[i - 1] * d[i] < 0), b -> b))
               ELSE 0 END AS int) AS zero_crossings,
               cast(CASE WHEN n >= 3 THEN
                   len(list_filter(list_transform(range(2, n),
                       i -> x[i] > x[i - 1] AND x[i] > x[i + 1]), b -> b))
               ELSE 0 END AS int) AS n_peaks,
               CASE WHEN den > 0 THEN num / den ELSE 0.0 END AS acf1
        FROM sf2
        )"""


def _sql_fold0(list_expr: str) -> str:
    """Left-fold sum with a 0.0 init (list_prepend trick) — the DuckDB twin
    of Spark's F.aggregate(arr, lit(0.0), acc + v)."""
    return (
        f"list_reduce(list_prepend(cast(0.0 AS double), {list_expr}),"
        f" (a, v) -> a + v)"
    )


def _sql_betas(alphabet_size: int) -> str:
    """SAX breakpoint literal list — same constants as operators/sax.py."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sax import SAX_BREAKPOINTS

    return "[" + ", ".join(repr(b) for b in SAX_BREAKPOINTS[alphabet_size]) + "]"


def _sql_sax_ctes(nseg: int, a: int, length: int) -> str:
    """Whole-series SAX chain over ``series`` -> ``scodes`` (series_id,
    label, codes). Mirrors sax_codes: znorm (mean/var folds, 1e-300 std
    guard) -> PAA segment-mean folds -> breakpoint-count discretization —
    identical IEEE op order to the Spark expressions."""
    seg = length // nseg
    betas = _sql_betas(a)
    return f"""sx0 AS (
            SELECT series_id, label, features AS x,
                   {_sql_fold0('features')} / len(features) AS mu,
                   {_sql_fold0('list_transform(features, v -> v * v)')}
                       / len(features) AS s2n
            FROM series
        ),
        sx1 AS (
            SELECT series_id, label,
                   list_transform(x, v -> (v - mu)
                       / sqrt(greatest(s2n - mu * mu, 1e-300))) AS z
            FROM sx0
        ),
        sx2 AS (
            SELECT series_id, label,
                   list_transform(range(0, {nseg}), g ->
                       {_sql_fold0(f'z[g * {seg} + 1 : g * {seg} + {seg}]')}
                           / {float(seg)!r}) AS p
            FROM sx1
        ),
        scodes AS (
            SELECT series_id, label,
                   list_transform(p, v ->
                       len(list_filter({betas}, b -> v >= b))) AS codes
            FROM sx2
        )"""


_SQL_SAX_WORD = (
    "array_to_string(list_transform(codes, c ->"
    " substr('abcdefghij', cast(c AS int) + 1, 1)), '')"
)


def _sql_mindist_sq(nseg: int, a: int, length: int, ca: str, cb: str) -> str:
    """Scaled squared MINDIST between two code-array expressions — mirrors
    sax_mindist_sq's zip/fold (cells, then acc + cell^2, then scale)."""
    betas = _sql_betas(a)
    cell = (
        f"(CASE WHEN abs({ca}[i] - {cb}[i]) <= 1 THEN 0.0"
        f" ELSE {betas}[greatest({ca}[i], {cb}[i])]"
        f" - {betas}[least({ca}[i], {cb}[i]) + 1] END)"
    )
    return (
        f"{float(length) / float(nseg)!r} * list_reduce("
        f"list_prepend(cast(0.0 AS double),"
        f" list_transform(range(1, {nseg} + 1), i -> {cell})),"
        f" (a, v) -> a + v * v)"
    )


def _sql_window_ctes(m: int) -> str:
    """Sliding-window chain over ``series`` -> ``wz`` (series_id, start,
    zw): per-window znorm with the same mean/var folds and std guard as
    subsequence_windows(znormalize=True)."""
    return f"""widx AS (
            SELECT series_id, features,
                   unnest(range(1, len(features) - {m} + 2)) AS start
            FROM series WHERE len(features) >= {m}
        ),
        wraw AS (
            SELECT series_id, start,
                   features[start : start + {m} - 1] AS w
            FROM widx
        ),
        wst AS (
            SELECT series_id, start, w,
                   {_sql_fold0('w')} / len(w) AS mu,
                   {_sql_fold0('list_transform(w, v -> v * v)')} / len(w) AS s2n
            FROM wraw
        ),
        wz AS (
            SELECT series_id, start,
                   list_transform(w, v -> (v - mu)
                       / sqrt(greatest(s2n - mu * mu, 1e-300))) AS zw
            FROM wst
        )"""


def _sql_matrix_profile_ctes(m: int, excl: int) -> str:
    """wz self-join -> ``mprof`` ranked per (series_id, start); rk = 1 rows
    are the matrix profile. Distance fold mirrors sq_euclidean's zip/fold."""
    d = (
        f"list_reduce(list_prepend(cast(0.0 AS double),"
        f" list_transform(range(1, {m} + 1), i ->"
        f" (a.zw[i] - b.zw[i]) * (a.zw[i] - b.zw[i]))), (x, y) -> x + y)"
    )
    return f"""mpp AS (
            SELECT a.series_id AS series_id, a.start AS start,
                   b.start AS nn_start, {d} AS d
            FROM wz a JOIN wz b
              ON a.series_id = b.series_id
             AND abs(a.start - b.start) >= {excl}
        ),
        mprof AS (
            SELECT series_id, start, nn_start, d,
                   row_number() OVER (PARTITION BY series_id, start
                                      ORDER BY d ASC, nn_start ASC) AS rk
            FROM mpp
        )"""


def _sql_window_word_ctes(m: int, nseg: int, a: int) -> str:
    """wz -> per-window SAX word (``ww``: series_id, start, word) — the
    _window_words mirror (each window already znormed by the wz chain,
    matching sax_codes' internal znorm on the slice)."""
    seg = m // nseg
    betas = _sql_betas(a)
    return f"""wp AS (
            SELECT series_id, start,
                   list_transform(range(0, {nseg}), g ->
                       {_sql_fold0(f'zw[g * {seg} + 1 : g * {seg} + {seg}]')}
                           / {float(seg)!r}) AS p
            FROM wz
        ),
        wc AS (
            SELECT series_id, start,
                   list_transform(p, v ->
                       len(list_filter({betas}, b -> v >= b))) AS codes
            FROM wp
        ),
        ww AS (
            SELECT series_id, start, {_SQL_SAX_WORD} AS word FROM wc
        )"""


def oracle_sql() -> dict[str, str]:
    out = {
        "q01_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   cast(sum(cast(round(l_quantity) AS bigint)) AS bigint) AS sum_qty,
                   cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint) AS sum_base_cents,
                   cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 10000) AS bigint)) AS bigint) AS sum_disc_e4,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1999-12-01 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q02_filter_project": """
            SELECT l_orderkey, l_linenumber, cast(round(l_quantity) AS bigint) AS qty
            FROM lineitem WHERE l_returnflag = 'R' AND l_quantity > 45
        """,
        "q03_join_enrich": """
            SELECT n.n_name AS nation, count(*) AS n_orders,
                   cast(sum(cast(round(o.o_totalprice * 100) AS bigint)) AS bigint) AS sum_cents
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name
        """,
        "q04_topk_per_group": """
            SELECT o_custkey, o_orderkey, rank FROM (
                SELECT o_custkey, o_orderkey,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "q05_min_by": """
            SELECT o_custkey, cheapest_orderkey, min_cents FROM (
                SELECT o_custkey, o_orderkey AS cheapest_orderkey,
                       cast(round(min(o_totalprice) OVER (PARTITION BY o_custkey) * 100) AS bigint) AS min_cents,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice ASC, o_orderkey ASC) AS rk
                FROM orders
            ) WHERE rk = 1
        """,
        "q06_mode_vote": """
            WITH neighbors AS (
                SELECT o_custkey, o_orderpriority,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate ASC, o_orderkey ASC) AS rank
                FROM orders
            ),
            votes AS (
                SELECT o_custkey, o_orderpriority, count(*) AS votes, min(rank) AS best_rank
                FROM neighbors GROUP BY o_custkey, o_orderpriority
            ),
            sel AS (
                SELECT *, row_number() OVER (PARTITION BY o_custkey
                                             ORDER BY votes DESC, best_rank ASC, o_orderpriority ASC) AS vrk
                FROM votes
            )
            SELECT o_custkey, o_orderpriority AS predicted_label FROM sel WHERE vrk = 1
        """,
        "q07_parse_series": """
            WITH raw(id, value) AS (VALUES
                (1, ' 0.5 -1.25  3.0 '),
                (2, '1 2   3'),
                (3, '  7.5'),
                (4, '10 20 30 40')
            ),
            parsed AS (
                SELECT id,
                       list_transform(
                           list_filter(string_split_regex(trim(value), '\\s+'),
                                       x -> trim(x) != ''),
                           x -> cast(x AS double)) AS features
                FROM raw
            )
            SELECT cast(id AS int) AS id,
                   cast(len(features) AS int) AS n_points,
                   features[1] AS first_v,
                   features[-1] AS last_v,
                   list_reduce(list_prepend(cast(0.0 AS double), features), (a, v) -> a + v) AS total
            FROM parsed
        """,
        "q08_series_build": f"""
            WITH {_SERIES_CTE}
            SELECT series_id, cast(len(features) AS int) AS n_points,
                   features[1] AS first_v, features[-1] AS last_v, label
            FROM series
        """,
        "q50_znorm": f"""
            WITH {_SERIES_CTE},
            stats AS (
                SELECT series_id, features,
                       list_reduce(list_prepend(cast(0.0 AS double), features),
                                   (a, v) -> a + v) / cast(len(features) AS double) AS mu,
                       list_reduce(list_prepend(cast(0.0 AS double), features),
                                   (a, v) -> a + v * v) / cast(len(features) AS double) AS m2
                FROM series
            ),
            zed AS (
                SELECT series_id,
                       sqrt(greatest(m2 - mu * mu, 1e-300)) AS sd, mu, features
                FROM stats
            )
            SELECT series_id,
                   (features[1] - mu) / sd AS z_first,
                   (features[-1] - mu) / sd AS z_last
            FROM zed
        """,
        "q09_knn_pairs": f"""
            WITH {_SERIES_CTE}, {_KNN_TOPK_CTE}
            SELECT test_id, train_id, cast(rank AS int) AS rank FROM topk
        """,
        "q10_knn_classify": f"""
            WITH {_SERIES_CTE}, {_KNN_TOPK_CTE}, {_VOTE_SQL}
            SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1
        """,
        # the ml Estimator runs the exact q10 computation through fit/transform
        "q76_ml_estimator": f"""
            WITH {_SERIES_CTE}, {_KNN_TOPK_CTE}, {_VOTE_SQL}
            SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1
        """,
        "q11_knn_1nn": f"""
            WITH {_SERIES_CTE}, {_KNN_TOPK_CTE}
            SELECT test_id, train_label AS predicted_label,
                   round(sqrt(d), 6) AS distance
            FROM topk WHERE rank = 1
        """,
        "q12_knn_accuracy": f"""
            WITH {_SERIES_CTE}, {_KNN_TOPK_CTE}, {_VOTE_SQL},
            pred AS (SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1),
            joined AS (
                SELECT p.predicted_label, t.label
                FROM pred p JOIN test t ON p.test_id = t.series_id
            )
            SELECT count(*) AS n_rows,
                   cast(sum(cast(predicted_label = label AS bigint)) AS bigint) AS n_correct,
                   avg(cast(predicted_label = label AS double)) AS accuracy
            FROM joined
        """,
        # faithful FastDTW replayed entirely in DuckDB (coarsen -> coarse DP
        # -> backtrack -> expand -> windowed DP, unrolled over the fixed
        # [16, 8, 4, 2] level chain); distances bit-exact vs the kernel, so
        # the same top-5 + vote tail as q10 finishes the pipeline
        "q13_knn_dtw": f"""
            {_fdtw_dist_sql(SERIES_LEN, _SERIES_CTE)},
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY test_id
                            ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
                FROM dd WHERE dist != 0
            ),
            topk AS (SELECT * FROM ranked WHERE rank <= 5),
            {_VOTE_SQL}
            SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1
        """,
        "q14_set_ops": """
            WITH hi AS (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000),
                 urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
            SELECT
                cast((SELECT count(*) FROM (SELECT * FROM hi UNION SELECT * FROM urgent)) AS int) AS n_union,
                cast((SELECT count(*) FROM (SELECT * FROM hi INTERSECT SELECT * FROM urgent)) AS int) AS n_intersect,
                cast((SELECT count(*) FROM (SELECT * FROM hi EXCEPT SELECT * FROM urgent)) AS int) AS n_except
        """,
        "q15_conditional": """
            SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                        WHEN o_totalprice < 150000 THEN 'mid'
                        ELSE 'high' END AS price_bucket,
                   count(*) AS n,
                   cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS sum_cents
            FROM orders
            GROUP BY 1
        """,
        "q16_dedup_exact": """
            SELECT min(doc_id) AS doc_id, count(*) AS n_dups
            FROM documents GROUP BY text
        """,
        "q17_dedup_jaccard": f"""
            WITH sh AS (
                SELECT doc_id, {_SQL_SHINGLES} AS shingles
                FROM documents WHERE doc_id < 300
            ),
            pairs AS (
                SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                       a.shingles AS _sa, b.shingles AS _sb
                FROM sh a JOIN sh b ON a.doc_id < b.doc_id
            )
            SELECT id_a, id_b, round({_SQL_JACCARD}, 6) AS jac
            FROM pairs WHERE {_SQL_JACCARD} >= 0.5
        """,
        "q18_dedup_minhash_lsh": _sql_lsh_pairs(),
        "q35_dedup_components": f"""
            WITH RECURSIVE pairs AS ({_sql_lsh_pairs()}),
            sym AS (
                SELECT id_a AS src, id_b AS dst FROM pairs
                UNION
                SELECT id_b AS src, id_a AS dst FROM pairs
            ),
            reach(v, lab) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.v
            ),
            comp AS (SELECT v AS doc_id, min(lab) AS component FROM reach GROUP BY v)
            SELECT doc_id, component, doc_id = component AS keep FROM comp
        """,
        "q19_simhash": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
            ),
            tokh AS (
                SELECT doc_id, {_sql_char_fold('tok')} AS h FROM tok
            ),
            votes AS (
                SELECT doc_id,
                       {", ".join(f"sum(((h >> {i}) & 1) * 2 - 1) AS _b{i}" for i in range(32))}
                FROM tokh GROUP BY doc_id
            )
            SELECT doc_id,
                   cast({" + ".join(f"(CASE WHEN _b{i} > 0 THEN {2**i} ELSE 0 END)" for i in range(32))} AS bigint) AS simhash
            FROM votes
        """,
        "q20_text_stats": f"""
            SELECT doc_id,
                   cast(len({_SQL_TOKENS}) AS int) AS n_tokens,
                   cast(length(text) AS int) AS n_chars_m,
                   {_sql_char_fold('text')} AS fingerprint
            FROM documents
        """,
        "q21_lang_id": f"""
            WITH t AS (
                SELECT doc_id, lang, text, {_SQL_TOKENS} AS toks FROM documents
            ),
            counts AS (
                SELECT doc_id, lang, text, {_sql_lang_counts()},
                       len(list_filter(range(1, len(text)+1),
                           i -> ascii(substr(text, i, 1)) >= {0x4E00})) > 0 AS cjk
                FROM t
            ),
            pred AS (
                SELECT doc_id, lang,
                       CASE WHEN cjk THEN 'zh'
                            WHEN greatest(n_de, n_en, n_es, n_fr) = 0 THEN 'und'
                            WHEN n_de = greatest(n_de, n_en, n_es, n_fr) THEN 'de'
                            WHEN n_en = greatest(n_de, n_en, n_es, n_fr) THEN 'en'
                            WHEN n_es = greatest(n_de, n_en, n_es, n_fr) THEN 'es'
                            ELSE 'fr' END AS lang_pred
                FROM counts
            )
            SELECT doc_id, lang_pred, cast(lang_pred = lang AS int) AS agrees
            FROM pred
        """,
        "q22_quality": f"""
            WITH t AS (
                SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents
            ),
            m AS (
                SELECT doc_id, text, toks,
                       cast(len(toks) AS double) AS n_tok,
                       cast(list_reduce(list_prepend(cast(0 AS bigint),
                            list_transform(toks, x -> cast(length(x) AS bigint))),
                            (a, v) -> a + v) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS wl,
                       cast(len(list_filter(toks, x -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS)}], x))) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS stop_r,
                       cast(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS double)
                         / cast(greatest(length(text), 1) AS double) AS punct_r
                FROM t
            )
            SELECT doc_id,
                   round(least(n_tok / 20.0, 1.0) * 0.4
                         + (CASE WHEN wl >= 2.0 AND wl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
                         + least(stop_r * 4.0, 1.0) * 0.2
                         + (1.0 - least(punct_r * 5.0, 1.0)) * 0.2, 6) AS quality,
                   round(stop_r, 6) AS stop_ratio
            FROM m
        """,
        "q23_ann_cosine": f"""
            WITH c AS (
                SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
                FROM embeddings
            ),
            q AS (SELECT * FROM c WHERE vec_id % 25 = 0),
            pairs AS (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       1.0 - {_sql_dot("q.v", "c.v")}
                             / (sqrt({_sql_dot("q.v", "q.v")}) * sqrt({_sql_dot("c.v", "c.v")})) AS d
                FROM q CROSS JOIN c
                WHERE q.vec_id != c.vec_id
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY query_id
                                             ORDER BY d ASC, neighbor_id ASC) AS rank
                FROM pairs
            )
            SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
                   round(d, 6) AS cos_dist
            FROM ranked WHERE rank <= 5
        """,
        "q24_ann_lsh": _sql_ann_lsh(),
        "q34_ann_ivf": _sql_ann_ivf(),
        "q40_multimodal_features": _sql_multimodal(),
        "q41_frame_sampling": f"""
            WITH m(media_id, n_frames) AS (VALUES
                {", ".join(f"({i}, {20 + i})" for i, _, _, _ in _media_rows() if i % 3 == 0)}
            )
            SELECT media_id, cast(frame_index AS int) AS frame_index
            FROM (
                SELECT media_id, unnest(range(0, n_frames, 10)) AS frame_index
                FROM m WHERE n_frames > 0
            )
        """,
        "q42_asof_join": """
            WITH ev AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type, value
                FROM events
            ),
            clicks AS (
                SELECT user_id, ts_us, event_id FROM ev WHERE event_type = 'click'
            ),
            purch AS (
                SELECT user_id, ts_us, max(value) AS purchase_value
                FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2
            )
            SELECT c.user_id, c.ts_us, c.event_id,
                   p.ts_us AS ts_us_purchase, p.purchase_value
            FROM clicks c
            ASOF LEFT JOIN purch p
              ON c.user_id = p.user_id AND c.ts_us >= p.ts_us
        """,
        "q43_gap_fill": """
            WITH obs AS (
                SELECT user_id, epoch_us(ts) AS ts_us, max(value) AS value
                FROM events GROUP BY 1, 2
            ),
            b AS (
                SELECT user_id, min(ts_us) AS mn, max(ts_us) AS mx
                FROM obs GROUP BY 1
            ),
            g AS (
                SELECT user_id,
                       unnest(generate_series(mn - mn % 86400000000, mx,
                                              86400000000)) AS ts_us
                FROM b
            )
            SELECT g.user_id, g.ts_us, o.ts_us AS ts_us_obs, o.value
            FROM g
            ASOF LEFT JOIN obs o
              ON g.user_id = o.user_id AND g.ts_us >= o.ts_us
        """,
        "q44_kmv_distinct": """
            WITH h AS (
                SELECT DISTINCT
                    ((l_partkey % 1000000007) * 654435747 + 40503) % 1000000007 AS hh
                FROM lineitem WHERE l_partkey IS NOT NULL
            ),
            top AS (SELECT hh FROM h ORDER BY hh LIMIT 256)
            SELECT count(*) AS k_used, max(hh) AS kth_min,
                   CASE WHEN count(*) < 256 THEN cast(count(*) AS double)
                        ELSE 255.0 * 1000000007.0 / cast(max(hh) AS double)
                   END AS est_distinct
            FROM top
        """,
        "q45_hash_sample": """
            WITH s AS (
                SELECT * FROM lineitem
                WHERE (((l_orderkey % 1000000007) * 654435747 + 40503)
                       % 1000000007) % 1000000 < 100000
            )
            SELECT l_returnflag, count(*) AS n_rows,
                   count(DISTINCT l_orderkey) AS n_orders,
                   cast(sum(cast(round(l_extendedprice * 100) AS bigint))
                        AS bigint) AS sum_cents
            FROM s GROUP BY 1
        """,
        "q46_token_topk": """
            WITH toks AS (
                SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
                FROM documents
            ),
            counts AS (SELECT token, count(*) AS n FROM toks GROUP BY token)
            SELECT cast(row_number() OVER (ORDER BY n DESC, token ASC) AS int) AS rank,
                   token, n
            FROM counts
            QUALIFY rank <= 20
        """,
        "q47_class_centroids": """
            WITH ex AS (
                SELECT label,
                       unnest(list_transform(range(1, len(embedding)+1),
                              i -> {'d': i - 1, 'x': embedding[i]})) AS u
                FROM embeddings
            )
            SELECT label, cast(u['d'] AS int) AS dim, count(*) AS n,
                   cast(sum(cast(round(cast(u['x'] AS double) * 1000000)
                                 AS bigint)) AS double)
                     / cast(count(*) * 1000000 AS double) AS centroid
            FROM ex GROUP BY 1, 2
        """,
        "q48_interval_join": """
            WITH flagged AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                       CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
                            THEN 1
                            WHEN lag(ts) OVER w IS NULL THEN 1
                            ELSE 0 END AS _new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            numbered AS (
                SELECT user_id, ts_us,
                       cast(sum(_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS bigint) AS session_no
                FROM flagged
            ),
            sessions AS (
                SELECT user_id, session_no,
                       min(ts_us) AS start_us, max(ts_us) AS end_us
                FROM numbered GROUP BY user_id, session_no
            ),
            purchases AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id
                FROM events WHERE event_type = 'purchase'
            )
            SELECT s.user_id, s.session_no, count(*) AS n_purchases
            FROM purchases p
            JOIN sessions s
              ON p.user_id = s.user_id
             AND p.ts_us BETWEEN s.start_us AND s.end_us
            GROUP BY 1, 2
        """,
        "q49_sql_api": """
            WITH cust_tot AS (
                SELECT o_custkey,
                       cast(sum(cast(round(o_totalprice * 100) AS bigint))
                            AS bigint) AS cents
                FROM orders GROUP BY o_custkey
            )
            SELECT c_custkey, c_name, cents
            FROM customer JOIN cust_tot ON c_custkey = o_custkey
            WHERE cents > 2 * (SELECT avg(cents) FROM cust_tot)
        """,
        "q38_date_parts": """
            SELECT o_orderkey,
                   cast(year(o_orderdate) AS int) AS yr,
                   cast(month(o_orderdate) AS int) AS mo,
                   cast(day(o_orderdate) AS int) AS dom,
                   cast(quarter(o_orderdate) AS int) AS qtr,
                   cast(date_diff('day', cast(o_orderdate AS date),
                                  DATE '1998-12-31') AS int) AS days_to_end,
                   cast(epoch(date_trunc('month', o_orderdate)) AS bigint)
                       AS month_start_epoch
            FROM orders
        """,
        "q39_json_extract": """
            WITH j(id, payload) AS (VALUES
                (1, '{"user": {"id": 7, "name": "ada"}, "tags": ["x", "y"], "score": 3.5}'),
                (2, '{"user": {"id": 9, "name": "bob"}, "tags": [], "score": 1.25}'),
                (3, '{"user": {"id": 11}, "tags": ["z"]}'),
                (4, 'not json at all')
            )
            SELECT cast(id AS int) AS id,
                   cast(CASE WHEN json_valid(payload)
                             THEN json_extract_string(payload, '$.user.id')
                        END AS bigint) AS user_id,
                   CASE WHEN json_valid(payload)
                        THEN json_extract_string(payload, '$.user.name')
                   END AS user_name,
                   CASE WHEN json_valid(payload)
                        THEN json_extract_string(payload, '$.tags[0]')
                   END AS first_tag,
                   cast(CASE WHEN json_valid(payload)
                             THEN json_extract_string(payload, '$.score')
                        END AS double) AS score
            FROM j
        """,
        "q37_running_windows": """
            WITH d AS (
                SELECT o_custkey, o_orderkey, o_orderdate,
                       cast(round(o_totalprice * 100) AS bigint) AS c
                FROM orders
            )
            SELECT o_custkey, o_orderkey,
                   cast(sum(c) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING) AS bigint) AS run_cents,
                   lag(c) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) AS prev_cents,
                   cast(sum(c) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS 2 PRECEDING) AS double)
                   / count(*) OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate, o_orderkey
                                    ROWS 2 PRECEDING) AS avg3
            FROM d
        """,
        "q36_percentiles": """
            WITH c AS (
                SELECT l_returnflag,
                       cast(round(l_extendedprice * 100) AS bigint) AS cents
                FROM lineitem
            ),
            g AS (
                SELECT l_returnflag,
                       quantile_cont(cents, [0.25, 0.5, 0.9, 0.99]) AS p
                FROM c GROUP BY l_returnflag
            )
            SELECT l_returnflag, p[1] AS p25, p[2] AS p50, p[3] AS p90,
                   p[4] AS p99
            FROM g
        """,
        "q29_rollup": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint) AS sum_cents
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        "q30_pivot": """
            SELECT o_orderpriority,
                   count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
                   count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
                   count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
            FROM orders GROUP BY o_orderpriority
        """,
        "q31_semi_anti": """
            SELECT c_custkey, 1 AS has_orders FROM customer c
            WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
            UNION ALL
            SELECT c_custkey, 0 AS has_orders FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "q32_sessionize": """
            WITH flagged AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                       CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
                            THEN 1
                            WHEN lag(ts) OVER w IS NULL THEN 1
                            ELSE 0 END AS _new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            numbered AS (
                SELECT user_id, ts_us,
                       cast(sum(_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS bigint) AS session_no
                FROM flagged
            )
            SELECT user_id, session_no, count(*) AS n_events,
                   min(ts_us) AS session_start_us,
                   max(ts_us) AS session_end_us
            FROM numbered GROUP BY user_id, session_no
        """,
        "q33_tumbling_window": """
            SELECT cast(floor(epoch_us(ts) / 86400000000.0) AS bigint) AS day_bucket,
                   event_type, count(*) AS n,
                   round(sum(cast(round(value * 100) AS bigint)) / 100.0, 2) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "q26_vector_equality_join": f"""
            WITH pts AS (
                SELECT user_id, list(value ORDER BY ts, event_id) AS vals
                FROM events GROUP BY user_id
            ),
            series2 AS (
                SELECT user_id AS series_id, vals[1:{SERIES_LEN}] AS features,
                       cast(user_id % 6 AS double) AS label
                FROM pts WHERE len(vals) >= {SERIES_LEN}
            ),
            train AS (SELECT * FROM series2 WHERE series_id % 4 != 0),
            test  AS (SELECT * FROM series2 WHERE series_id % 4 = 0),
            nn AS (
                SELECT test_id, train_label FROM (
                    SELECT t.series_id AS test_id, r.label AS train_label,
                           row_number() OVER (
                               PARTITION BY t.series_id
                               ORDER BY {_sql_sqdist("t.features", "r.features")} ASC,
                                        r.label ASC, r.series_id ASC) AS rk
                    FROM test t CROSS JOIN train r
                    WHERE {_sql_sqdist("t.features", "r.features")} != 0
                ) WHERE rk = 1
            ),
            preds AS (
                SELECT t.features AS Test_point, n.train_label AS Predicted_label
                FROM nn n JOIN test t ON n.test_id = t.series_id
            ),
            joined AS (
                SELECT p.Predicted_label, s.label
                FROM preds p JOIN test s ON p.Test_point = s.features
            )
            SELECT count(*) AS n_rows,
                   cast(sum(cast(abs(Predicted_label - label) = 0 AS bigint)) AS bigint) AS n_correct
            FROM joined
        """,
        "q27_dense_row_ids": """
            SELECT c_custkey,
                   cast(row_number() OVER (ORDER BY c_custkey ASC) AS bigint) AS row_id
            FROM customer
        """,
        "q28_k_sweep": _sql_k_sweep((1, 3, 5)),
        "q25_knn_pruned": f"""
            WITH {_SERIES_CTE},
            tp AS (
                SELECT series_id, features, {_sql_paa("features", 4, SERIES_LEN)} AS p
                FROM test
            ),
            rp AS (
                SELECT series_id, features, label, {_sql_paa("features", 4, SERIES_LEN)} AS p
                FROM train
            ),
            coarse AS (
                SELECT t.series_id AS test_id, r.series_id AS train_id,
                       {_sql_sqdist("t.p", "r.p")} AS cd
                FROM tp t CROSS JOIN rp r
            ),
            cands AS (
                SELECT test_id, train_id FROM (
                    SELECT *, row_number() OVER (PARTITION BY test_id
                                                 ORDER BY cd ASC, train_id ASC) AS crank
                    FROM coarse
                ) WHERE crank <= 20
            ),
            exact AS (
                SELECT c.test_id, c.train_id, r.label AS train_label,
                       {_sql_sqdist("t.features", "r.features")} AS d
                FROM cands c
                JOIN tp t ON c.test_id = t.series_id
                JOIN rp r ON c.train_id = r.series_id
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY test_id
                                             ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
                FROM exact WHERE d != 0
            )
            SELECT test_id, train_id, cast(rank AS int) AS rank
            FROM ranked WHERE rank <= 5
        """,
        "q51_tfidf": f"""
            WITH tok AS (
                SELECT doc_id, unnest({_SQL_TOKENS}) AS term FROM documents
            ),
            tf AS (
                SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
            ),
            dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
            scored AS (
                SELECT t.doc_id, t.term, t.tf, d.df,
                       cast(t.tf AS double)
                       * (cast(n.n_docs + 1 AS double) / cast(d.df + 1 AS double)) AS score
                FROM tf t JOIN dfq d USING (term) CROSS JOIN n
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY doc_id
                                             ORDER BY score DESC, term ASC) AS rank
                FROM scored
            )
            SELECT doc_id, cast(rank AS int) AS rank, term, tf, df,
                   round(score, 6) AS score
            FROM ranked WHERE rank <= 3
        """,
        "q52_repetition": f"""
            WITH t AS (
                SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
            ),
            base AS (
                SELECT doc_id,
                       cast(len(toks) AS int) AS n_tokens,
                       cast(len(list_distinct(toks)) AS int) AS n_distinct,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1])) AS bigram
                FROM t WHERE len(toks) >= 2
            ),
            counts AS (
                SELECT doc_id, n_tokens, n_distinct, bigram, count(*) AS c
                FROM base GROUP BY doc_id, n_tokens, n_distinct, bigram
            ),
            agg AS (
                SELECT doc_id, n_tokens, n_distinct, max(c) AS top
                FROM counts GROUP BY doc_id, n_tokens, n_distinct
            )
            SELECT doc_id, n_tokens, n_distinct,
                   cast(n_distinct AS double) / cast(n_tokens AS double) AS distinct_ratio,
                   cast(top AS double) / cast(n_tokens - 1 AS double) AS top_bigram_frac
            FROM agg
        """,
        "q53_stratified_sample": """
            WITH ranked AS (
                SELECT lang, doc_id,
                       row_number() OVER (
                           PARTITION BY lang
                           ORDER BY ((doc_id % 1000000007) * 654435747 + 40503)
                                    % 1000000007 ASC,
                                    doc_id ASC) AS sample_rank
                FROM documents
            )
            SELECT lang, doc_id, cast(sample_rank AS int) AS sample_rank
            FROM ranked WHERE sample_rank <= 20
        """,
        "q54_random_projection": _sql_random_proj(out_dim=8, dim=64),
        # word 4-grams; eval set = doc_id % 17 == 0; n_hits = distinct
        # contaminated grams per train doc (mirrors operators/corpus.py::
        # decontaminate: per-doc DISTINCT gram explode -> join -> count)
        "q55_decontaminate": f"""
            WITH tok AS (
                SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
            ),
            ng AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                           range(1, len(toks) - 4 + 2),
                           i -> array_to_string(toks[i:i+3], ' ')))) AS gram
                FROM tok WHERE len(toks) >= 4
            ),
            ev AS (SELECT DISTINCT gram FROM ng WHERE doc_id % 17 = 0),
            hits AS (
                SELECT t.doc_id, count(*) AS n_hits
                FROM ng t JOIN ev USING (gram)
                WHERE t.doc_id % 17 != 0
                GROUP BY t.doc_id
            )
            SELECT d.doc_id,
                   coalesce(h.n_hits, 0) AS n_hits,
                   coalesce(h.n_hits, 0) > 0 AS contaminated
            FROM documents d LEFT JOIN hits h USING (doc_id)
            WHERE d.doc_id % 17 != 0
        """,
        # 32-token chunks; slice bounds are 1-based inclusive in DuckDB
        # (toks[a:b]) vs (start, length) in Spark slice()
        "q56_chunk_documents": f"""
            WITH tok AS (
                SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents
            ),
            c AS (
                SELECT doc_id, toks,
                       unnest(range(0, cast(ceil(len(toks) / 32.0) AS bigint))) AS chunk_id
                FROM tok WHERE len(toks) >= 1
            )
            SELECT doc_id, cast(chunk_id AS int) AS chunk_id,
                   cast(len(toks[chunk_id*32+1 : chunk_id*32+32]) AS int) AS n_tokens,
                   array_to_string(toks[chunk_id*32+1 : chunk_id*32+32], ' ') AS chunk_text
            FROM c
        """,
        # capacity-256 streaming packing over 8 id-mod buckets; pack_id =
        # floor(exclusive-prefix-token-count / capacity)
        "q57_pack_sequences": f"""
            WITH t AS (
                SELECT doc_id, doc_id % 8 AS bucket,
                       cast(len({_SQL_TOKENS}) AS int) AS ntok
                FROM documents
            ),
            p AS (
                SELECT bucket, doc_id, ntok,
                       cast(floor((sum(ntok) OVER (
                               PARTITION BY bucket ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                           ) - ntok) / 256) AS bigint) AS pack_id
                FROM t
            )
            SELECT bucket, pack_id, count(*) AS n_docs,
                   cast(sum(ntok) AS bigint) AS total_tokens
            FROM p GROUP BY bucket, pack_id
        """,
        "q58_profile_table": _sql_profile(
            "orders",
            numeric={"o_orderkey", "o_custkey", "o_totalprice"},
            cols=[
                "o_orderkey",
                "o_custkey",
                "o_orderstatus",
                "o_totalprice",
                "o_orderdate",
                "o_orderpriority",
            ],
        ),
        # epoch-ns -> micros by integer division on BOTH engines (a float
        # divide would flip borderline pairs at the 4h boundary)
        "q60_attribution_join": """
            WITH i AS (
                SELECT user_id, epoch_ns(ts) // 1000 AS imp_us
                FROM events WHERE event_type = 'view'
            ),
            c AS (
                SELECT user_id, epoch_ns(ts) // 1000 AS conv_us
                FROM events WHERE event_type = 'click'
            )
            SELECT i.user_id, i.imp_us, c.conv_us,
                   (c.conv_us - i.imp_us) // 1000 AS delay_ms
            FROM i JOIN c ON i.user_id = c.user_id
            WHERE c.conv_us >= i.imp_us
              AND c.conv_us <= i.imp_us + 14400000000
        """,
        "q61_incremental_dedup": f"""
            WITH bfp AS (
                SELECT doc_id, {_sql_char_fold('text')} AS fingerprint
                FROM documents WHERE doc_id >= 400
            ),
            batch_best AS (
                SELECT fingerprint, min(doc_id) AS doc_id
                FROM bfp GROUP BY fingerprint
            ),
            corpus_fps AS (
                SELECT DISTINCT {_sql_char_fold('text')} AS fingerprint
                FROM documents WHERE doc_id < 400
            )
            SELECT b.doc_id, b.fingerprint
            FROM batch_best b ANTI JOIN corpus_fps c USING (fingerprint)
        """,
        # bucket = floor(((x-lo)/(hi-lo))*bins), clamped — identical IEEE
        # op order in both engines
        "q62_histogram": """
            WITH b AS (
                SELECT cast(greatest(0, least(19,
                           floor(((o_totalprice - 0.0) / 600000.0) * 20))) AS int) AS bucket
                FROM orders WHERE o_totalprice IS NOT NULL
            )
            SELECT bucket,
                   cast(bucket * 30000.0 AS double) AS lo_edge,
                   cast((bucket + 1) * 30000.0 AS double) AS hi_edge,
                   count(*) AS n
            FROM b GROUP BY bucket
        """,
        "q63_multiway_join": """
            SELECT n.n_name,
                   cast(sum(cast(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS bigint)) AS bigint) AS revenue_e4,
                   count(*) AS n_items
            FROM customer c
            JOIN orders o   ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
            JOIN nation n   ON s.s_nationkey = n.n_nationkey
            JOIN region r   ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n.n_name
        """,
        "q64_normalize_text": """
            WITH n AS (
                SELECT doc_id,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text
                FROM documents
            )
            SELECT doc_id, norm_text,
                   cast(len(list_filter(string_split_regex(lower(trim(norm_text)), '\\s+'),
                        x -> x != '')) AS int) AS n_tokens
            FROM n
        """,
        # left-fold stats: same IEEE op sequence as aggregate()/zip_with()
        "q65_series_features": f"""
            WITH {_SERIES_CTE},
            st AS (
                SELECT series_id,
                       cast(len(features) AS double) AS nd,
                       cast(len(features) AS int) AS n,
                       list_reduce(list_prepend(0.0, features), (a, v) -> a + v) AS s1,
                       list_reduce(list_prepend(0.0,
                           list_transform(features, v -> v * v)), (a, v) -> a + v) AS s2,
                       list_reduce(list_prepend(0.0,
                           list_transform(range(0, len(features)),
                                          i -> features[i + 1] * i)), (a, v) -> a + v) AS sxy,
                       list_aggregate(features, 'min') AS vmin,
                       list_aggregate(features, 'max') AS vmax
                FROM series
            )
            SELECT series_id, n,
                   s1 / nd AS mean,
                   sqrt(greatest(s2 / nd - (s1 / nd) * (s1 / nd), 0.0)) AS std,
                   vmin, vmax,
                   (nd * sxy - (nd * (nd - 1) / 2.0) * s1)
                   / (nd * (nd * (nd - 1) * (2 * nd - 1) / 6.0)
                      - (nd * (nd - 1) / 2.0) * (nd * (nd - 1) / 2.0)) AS slope
            FROM st
        """,
        "q66_paa": f"""
            WITH {_SERIES_CTE}
            SELECT series_id,
                   list_reduce(list_prepend(0.0, features[1:4]),  (a, v) -> a + v) / 4.0 AS p1,
                   list_reduce(list_prepend(0.0, features[5:8]),  (a, v) -> a + v) / 4.0 AS p2,
                   list_reduce(list_prepend(0.0, features[9:12]), (a, v) -> a + v) / 4.0 AS p3,
                   list_reduce(list_prepend(0.0, features[13:16]),(a, v) -> a + v) / 4.0 AS p4
            FROM series
        """,
        # bloom false positives die in the exact semi join -> plain semi join
        "q67_bloom_semi_join": """
            SELECT l.l_suppkey,
                   count(*) AS n_items,
                   cast(sum(cast(round(l.l_extendedprice * 100) AS bigint)) AS bigint) AS rev_cents
            FROM lineitem l
            SEMI JOIN (SELECT s_suppkey FROM supplier WHERE s_acctbal > 9000) s
                 ON l.l_suppkey = s.s_suppkey
            GROUP BY l.l_suppkey
        """,
        # the full curation chain as one CTE pipeline (stages are q64/q69/
        # q16/q72/q56's oracles composed); arg_min picks the min-id
        # survivor's payload like Spark's min_by(struct, doc_id)
        "q73_curation_pipeline": f"""
            WITH t AS (
                SELECT doc_id, lang, text, {_SQL_TOKENS} AS toks FROM documents
            ),
            m AS (
                SELECT doc_id, lang,
                       trim(regexp_replace(regexp_replace(lower(text),
                            '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm_text,
                       cast(len(toks) AS double) AS n_tok,
                       cast(list_reduce(list_prepend(cast(0 AS bigint),
                            list_transform(toks, x -> cast(length(x) AS bigint))),
                            (a, v) -> a + v) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS wl,
                       cast(len(list_filter(toks, x -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS)}], x))) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS stop_r,
                       cast(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS double)
                         / cast(greatest(length(text), 1) AS double) AS punct_r
                FROM t
            ),
            s AS (
                SELECT doc_id, lang, norm_text,
                       cast(round((least(n_tok / 20.0, 1.0) * 0.4
                             + (CASE WHEN wl >= 2.0 AND wl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
                             + least(stop_r * 4.0, 1.0) * 0.2
                             + (1.0 - least(punct_r * 5.0, 1.0)) * 0.2) * 1000000) AS bigint) AS q_micro
                FROM m
            ),
            th AS (SELECT quantile_cont(q_micro, 0.5) AS _t FROM s),
            gated AS (
                SELECT s.doc_id, s.lang, s.norm_text
                FROM s, th WHERE cast(s.q_micro AS double) >= th._t
            ),
            dedup AS (
                SELECT min(doc_id) AS doc_id,
                       arg_min(lang, doc_id) AS lang,
                       arg_min(norm_text, doc_id) AS norm_text
                FROM gated
                GROUP BY {_sql_char_fold('norm_text')}
            ),
            mixed AS (
                SELECT * FROM dedup
                WHERE (((doc_id % 1000000007) * 654435747 + 40503) % 1000000007)
                      % 1000000 <
                      CASE lang
                          WHEN 'en' THEN 500000
                          WHEN 'de' THEN 1000000
                          WHEN 'es' THEN 1000000
                          WHEN 'fr' THEN 1000000
                          ELSE 250000
                      END
            ),
            tok2 AS (
                SELECT doc_id,
                       list_filter(string_split_regex(lower(trim(norm_text)), '\\s+'),
                                   x -> x != '') AS toks
                FROM mixed
            ),
            c AS (
                SELECT doc_id, toks,
                       unnest(range(0, cast(ceil(len(toks) / 32.0) AS bigint))) AS chunk_id
                FROM tok2 WHERE len(toks) >= 1
            )
            SELECT doc_id, cast(chunk_id AS int) AS chunk_id,
                   cast(len(toks[chunk_id*32+1 : chunk_id*32+32]) AS int) AS n_tokens
            FROM c
        """,
        # lerp mirrored per output index; Spark evaluates t*(n-1)/ (L-1)
        # then floor/frac — identical op order here
        "q71_series_resample": f"""
            WITH {_SERIES_CTE}
            SELECT series_id,
                   {", ".join(_sql_lerp(t, 8) + f" AS r{t + 1}" for t in range(8))}
            FROM series
        """,
        "q74_dedup_embedding": _sql_dedup_embedding(4, 8, 64, 0.65),
        "q75_token_rarity": f"""
            WITH toks AS (
                SELECT doc_id, unnest({_SQL_TOKENS}) AS tok FROM documents
            ),
            vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
            per_doc AS (
                SELECT doc_id, cast(count(*) AS int) AS n_tokens,
                       cast(sum(cnt) AS bigint) AS freq_sum
                FROM toks JOIN vocab USING (tok)
                GROUP BY doc_id
            )
            SELECT d.doc_id,
                   coalesce(p.n_tokens, 0) AS n_tokens,
                   coalesce(p.freq_sum, 0) AS freq_sum,
                   CASE WHEN p.n_tokens IS NOT NULL
                        THEN cast(p.freq_sum AS double) / p.n_tokens
                   END AS mean_token_freq
            FROM documents d LEFT JOIN per_doc p USING (doc_id)
        """,
        "q72_mixture_sample": """
            SELECT doc_id, lang FROM documents
            WHERE (((doc_id % 1000000007) * 654435747 + 40503) % 1000000007)
                  % 1000000 <
                  CASE lang
                      WHEN 'en' THEN 250000
                      WHEN 'de' THEN 500000
                      WHEN 'es' THEN 750000
                      WHEN 'fr' THEN 1000000
                      ELSE 100000
                  END
        """,
        # the full DTW dynamic program as a recursive CTE: one DP row per
        # recursion level; the within-row cur[j-1] dependency is a
        # list_reduce building the row left-to-right (elements are
        # [cost, prev[j], prev[j-1]] triples so the fold stays list<double>
        # -> list<double>). round(6) absorbs the kernel's prefix-scan fp
        # reassociation (~1e-13 relative).
        "q70_knn_dtw_exact": f"""
            WITH RECURSIVE {_SERIES_CTE},
            pairs AS (
                SELECT t.series_id AS test_id, r.series_id AS train_id,
                       r.label AS train_label, t.features AS fa, r.features AS fb
                FROM test t CROSS JOIN train r
            ),
            dp AS (
                SELECT test_id, train_id, train_label, fa, fb, 1 AS i,
                       list_transform(range(1, len(fb)+1),
                           j -> list_reduce(list_prepend(0.0,
                                    list_transform(range(1, j+1), k -> abs(fa[1]-fb[k]))),
                                (x, y) -> x + y)) AS row
                FROM pairs
                UNION ALL
                SELECT test_id, train_id, train_label, fa, fb, i+1,
                       list_reduce(
                           list_prepend([row[1] + abs(fa[i+1]-fb[1])],
                               list_transform(range(2, len(fb)+1),
                                   j -> [abs(fa[i+1]-fb[j]), row[j], row[j-1]])),
                           (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
                FROM dp WHERE i < len(fa)
            ),
            dd AS (
                SELECT test_id, train_id, train_label, row[-1] AS dist
                FROM dp WHERE i = len(fa)
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY test_id
                            ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
                FROM dd WHERE dist != 0
            )
            SELECT test_id, train_id, cast(rank AS int) AS rank,
                   round(dist, 6) AS distance
            FROM ranked WHERE rank <= 3
        """,
        # all-vs-all kNN (self excluded), fixed left-assoc 4-term mean
        "q68_knn_outliers": f"""
            WITH {_SERIES_CTE},
            pairs AS (
                SELECT t.series_id AS test_id, r.series_id AS train_id,
                       r.label AS train_label, sqrt({_SQDIST}) AS d
                FROM series t CROSS JOIN series r
            ),
            ranked AS (
                SELECT *, row_number() OVER (PARTITION BY test_id
                             ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
                FROM pairs WHERE d != 0
            ),
            piv AS (
                SELECT test_id,
                       max(CASE WHEN rank = 1 THEN d END) AS d1,
                       max(CASE WHEN rank = 2 THEN d END) AS d2,
                       max(CASE WHEN rank = 3 THEN d END) AS d3,
                       max(CASE WHEN rank = 4 THEN d END) AS d4
                FROM ranked WHERE rank <= 4 GROUP BY test_id
            )
            SELECT test_id, d1, (d1 + d2 + d3 + d4) / 4 AS outlier_score
            FROM piv
        """,
        # integer-micro quality feeds the exact percentile (q36's trick)
        "q69_quality_filter": f"""
            WITH t AS (
                SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents
            ),
            m AS (
                SELECT doc_id,
                       cast(len(toks) AS double) AS n_tok,
                       cast(list_reduce(list_prepend(cast(0 AS bigint),
                            list_transform(toks, x -> cast(length(x) AS bigint))),
                            (a, v) -> a + v) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS wl,
                       cast(len(list_filter(toks, x -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS)}], x))) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS stop_r,
                       cast(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS double)
                         / cast(greatest(length(text), 1) AS double) AS punct_r
                FROM t
            ),
            s AS (
                SELECT doc_id,
                       cast(round((least(n_tok / 20.0, 1.0) * 0.4
                             + (CASE WHEN wl >= 2.0 AND wl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
                             + least(stop_r * 4.0, 1.0) * 0.2
                             + (1.0 - least(punct_r * 5.0, 1.0)) * 0.2) * 1000000) AS bigint) AS q_micro
                FROM m
            ),
            th AS (SELECT quantile_cont(q_micro, 0.75) AS _t FROM s)
            SELECT s.doc_id, s.q_micro
            FROM s, th WHERE cast(s.q_micro AS double) >= th._t
        """,
        "q77_source_quota": f"""
            WITH t AS (
                SELECT source, doc_id, text, {_SQL_TOKENS} AS toks FROM documents
            ),
            m AS (
                SELECT source, doc_id,
                       cast(len(toks) AS double) AS n_tok,
                       cast(list_reduce(list_prepend(cast(0 AS bigint),
                            list_transform(toks, x -> cast(length(x) AS bigint))),
                            (a, v) -> a + v) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS wl,
                       cast(len(list_filter(toks, x -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS)}], x))) AS double)
                         / cast(greatest(len(toks), 1) AS double) AS stop_r,
                       cast(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS double)
                         / cast(greatest(length(text), 1) AS double) AS punct_r
                FROM t
            ),
            s AS (
                SELECT source, doc_id,
                       cast(round((least(n_tok / 20.0, 1.0) * 0.4
                             + (CASE WHEN wl >= 2.0 AND wl <= 12.0 THEN 1.0 ELSE 0.0 END) * 0.2
                             + least(stop_r * 4.0, 1.0) * 0.2
                             + (1.0 - least(punct_r * 5.0, 1.0)) * 0.2) * 1000000) AS bigint) AS q_micro
                FROM m
            ),
            ranked AS (
                SELECT source, doc_id, q_micro,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY q_micro DESC, doc_id ASC) AS rank
                FROM s
            )
            SELECT source, doc_id, q_micro, cast(rank AS int) AS rank
            FROM ranked WHERE rank <= 50
        """,
        "q83_image_resize": _sql_image_resize(4, 4),
        "q84_count_min": _sql_count_min(20, 4, 256),
        # Spark session semantics: window end = last event + gap
        "q85_native_session_window": """
            WITH flagged AS (
                SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                       CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 7200000000
                            THEN 1
                            WHEN lag(ts) OVER w IS NULL THEN 1
                            ELSE 0 END AS _new
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            numbered AS (
                SELECT user_id, ts_us,
                       cast(sum(_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                            AS bigint) AS session_no
                FROM flagged
            )
            SELECT user_id,
                   min(ts_us) AS session_start_us,
                   max(ts_us) + 7200000000 AS session_end_us,
                   count(*) AS n_events
            FROM numbered GROUP BY user_id, session_no
        """,
        "q82_zorder": f"""
            WITH z AS (
                SELECT ({" + ".join(
                    f"(((greatest(0, least(l_partkey, 1023)) >> {b}) & 1) << {2 * b})"
                    for b in range(10)
                )} + {" + ".join(
                    f"(((greatest(0, least(l_suppkey, 1023)) >> {b}) & 1) << {2 * b + 1})"
                    for b in range(10)
                )}) % 4096 AS z_bucket
                FROM lineitem
            )
            SELECT z_bucket, count(*) AS n FROM z GROUP BY z_bucket
        """,
        "q81_time_rollup": """
            SELECT CASE WHEN grouping(hb) = 0 THEN 'hour' ELSE 'day' END AS gran,
                   coalesce(hb, db) AS bucket, event_type,
                   count(*) AS n,
                   cast(sum(cast(round(value * 100) AS bigint)) AS bigint) AS sum_cents
            FROM (SELECT epoch_us(ts) // 3600000000 AS hb,
                         epoch_us(ts) // 86400000000 AS db,
                         event_type, value
                  FROM events)
            GROUP BY GROUPING SETS ((hb, event_type), (db, event_type))
        """,
        "q80_cube": """
            SELECT o_orderstatus, o_orderpriority,
                   cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                        AS bigint) AS gid,
                   count(*) AS n,
                   cast(sum(cast(round(o_totalprice * 100) AS bigint)) AS bigint) AS sum_cents
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "q79_sink_roundtrip": """
            SELECT l_returnflag, l_linestatus, count(*) AS n,
                   cast(sum(cast(round(l_extendedprice * 100) AS bigint)) AS bigint) AS sum_cents
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "q78_fingerprint": f"""
            WITH fp AS (
                SELECT doc_id, {_sql_char_fold('text')} AS fingerprint
                FROM documents
            ),
            c AS (SELECT fingerprint, count(*) AS n_docs FROM fp GROUP BY fingerprint)
            SELECT fp.doc_id, fp.fingerprint, c.n_docs
            FROM fp JOIN c USING (fingerprint)
        """,
        # the salt is internal: salted result set == plain join result set
        "q59_salted_join": """
            SELECT o.o_orderpriority,
                   count(*) AS n_items,
                   cast(sum(cast(round(l.l_extendedprice * 100) AS bigint)) AS bigint) AS rev_cents
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "q87_kmeans": f"""
            WITH {_sql_kmeans_ctes()}
            SELECT vec_id, cluster FROM asn1
        """,
        "q88_semantic_dedup": f"""
            WITH {_sql_kmeans_ctes()},
            pairs AS (
                SELECT a1.vec_id AS ida, a2.vec_id AS idb
                FROM asn1 a1 JOIN asn1 a2
                  ON a1.cluster = a2.cluster AND a1.vec_id < a2.vec_id
            ),
            dropped AS (
                SELECT DISTINCT p.idb AS vec_id
                FROM pairs p
                JOIN c va ON p.ida = va.vec_id
                JOIN c vb ON p.idb = vb.vec_id
                WHERE 1.0 - {_sql_dot('va.v', 'vb.v')}
                      / (sqrt({_sql_dot('va.v', 'va.v')})
                         * sqrt({_sql_dot('vb.v', 'vb.v')})) <= 0.65
            )
            SELECT a.vec_id, a.cluster, (d.vec_id IS NULL) AS kept
            FROM asn1 a LEFT JOIN dropped d USING (vec_id)
        """,
        "q89_span_dedup": _sql_span_dedup(),
        "q90_ann_quantized": _sql_quantized_ann(),
        "q91_corpus_shuffle": f"""
            WITH h AS (
                SELECT doc_id,
                       {_sql_char_fold("('shuf42:' || cast(doc_id AS varchar))")} AS _h
                FROM documents
            )
            SELECT doc_id, cast(_h % 8 AS int) AS shard,
                   cast(row_number() OVER (PARTITION BY _h % 8
                                           ORDER BY _h ASC, doc_id ASC) AS int) AS pos
            FROM h
        """,
        "q92_decontaminate_fuzzy": f"""
            WITH {_SQL_SHINGLE_TABLE},
            shd AS (SELECT doc_id, list_distinct(hashes) AS hashes FROM shh),
            sigs AS (
                SELECT doc_id, {_sql_minhash_sig(16)} AS sig FROM shd
                WHERE len(hashes) >= 1
            ),
            ev AS (
                SELECT doc_id AS eval_id, j.j AS j, sig[j.j + 1] AS v
                FROM sigs, (SELECT unnest(range(0, 16)) AS j) j(j)
                WHERE doc_id % 17 = 0
            ),
            tr AS (
                SELECT doc_id, j.j AS j, sig[j.j + 1] AS v
                FROM sigs, (SELECT unnest(range(0, 16)) AS j) j(j)
                WHERE doc_id % 17 != 0
            ),
            agr AS (
                SELECT tr.doc_id, ev.eval_id, count(*) AS n
                FROM tr JOIN ev USING (j, v)
                GROUP BY tr.doc_id, ev.eval_id
            ),
            mx AS (SELECT doc_id, max(n) AS m FROM agr GROUP BY doc_id)
            SELECT b.doc_id,
                   cast(coalesce(m.m, 0) AS int) AS max_agree,
                   (coalesce(m.m, 0) >= 8) AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 17 != 0) b
            LEFT JOIN mx m USING (doc_id)
        """,
    "q93_ann_ivf_kmeans": _sql_ann_ivf_kmeans(),
    }
    out["q94_image_decode_real"] = """
        WITH m AS (
            SELECT i.i AS media_id,
                   cast(8 + i.i % 5 AS int) AS width,
                   cast(6 + i.i % 4 AS int) AS height
            FROM (SELECT unnest(range(0, 24)) AS i) i(i)
        ),
        px AS (
            SELECT m.media_id,
                   ((((oi.oi * m.height) // 4) * 7
                     + ((oj.oj * m.width) // 4) * 13
                     + 31 * m.media_id) % 256) AS v
            FROM m,
                 (SELECT unnest(range(0, 4)) AS oi) oi(oi),
                 (SELECT unnest(range(0, 4)) AS oj) oj(oj)
        ),
        sums AS (
            SELECT media_id, cast(sum(v) AS bigint) AS px_checksum FROM px
            GROUP BY media_id
        )
        SELECT m.media_id, m.width, m.height, s.px_checksum,
               round(cast(s.px_checksum AS double) / 16.0, 6) AS mean_px
        FROM m JOIN sums s USING (media_id)
    """
    out["q95_audio_decode_real"] = """
        WITH m AS (
            SELECT i.i AS media_id, cast(8000 + 100 * i.i AS int) AS sample_rate
            FROM (SELECT unnest(range(0, 16)) AS i) i(i)
        ),
        s AS (
            SELECT m.media_id, t.t AS t,
                   ((t.t * t.t * 7 + t.t * 13 + 31 * m.media_id) % 4096) - 2048 AS v
            FROM m, (SELECT unnest(range(0, 256)) AS t) t(t)
        ),
        flips AS (
            SELECT media_id, t, v,
                   CASE WHEN t > 0 AND ((v >= 0) !=
                        (lag(v) OVER (PARTITION BY media_id ORDER BY t) >= 0))
                        THEN 1 ELSE 0 END AS flip
            FROM s
        ),
        agg AS (
            SELECT media_id,
                   cast(count(*) AS int) AS n_samples,
                   cast(max(abs(v)) AS int) AS peak,
                   cast(sum(v * v) AS bigint) AS sum_sq,
                   cast(sum(flip) AS int) AS zero_crossings
            FROM flips GROUP BY media_id
        )
        SELECT m.media_id, m.sample_rate, a.n_samples, a.peak, a.sum_sq,
               a.zero_crossings
        FROM m JOIN agg a USING (media_id)
    """
    out["q96_ann_lsh_multiprobe"] = _sql_ann_lsh_multiprobe()
    out["q99_video_decode_real"] = """
        WITH m AS (SELECT unnest(range(0, 12)) AS media_id),
        f AS (
            SELECT m.media_id, fi.fi AS frame_index
            FROM m, (SELECT unnest(range(0, 5, 2)) AS fi) fi(fi)
        ),
        px AS (
            SELECT f.media_id, f.frame_index,
                   (x.x * 7 + y.y * 13 + f.frame_index * 29
                    + f.media_id * 31) % 256 AS v
            FROM f,
                 (SELECT unnest(range(0, 8)) AS x) x(x),
                 (SELECT unnest(range(0, 6)) AS y) y(y)
        ),
        agg AS (
            SELECT media_id, frame_index,
                   cast(sum(v) AS bigint) AS px_checksum
            FROM px GROUP BY media_id, frame_index
        )
        SELECT media_id, cast(frame_index AS int) AS frame_index,
               cast(8 AS int) AS width, cast(6 AS int) AS height,
               px_checksum,
               round(cast(px_checksum AS double) / 48.0, 6) AS mean_px
        FROM agg
    """
    out["q100_redact_pii"] = r"""
        WITH enriched AS (
            SELECT doc_id,
                   text
                   || CASE WHEN doc_id % 3 = 0
                           THEN ' reach me at user' || cast(doc_id AS varchar)
                                || '@example.com' ELSE '' END
                   || CASE WHEN doc_id % 4 = 0
                           THEN ' see https://example.org/page/'
                                || cast(doc_id AS varchar) || ' now' ELSE '' END
                   || CASE WHEN doc_id % 5 = 0
                           THEN ' call 555-867-5309' ELSE '' END AS text
            FROM documents
        )
        SELECT doc_id,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(text,
                     '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}',
                     '<EMAIL>', 'g'),
                   'https?://[^\s]+', '<URL>', 'g'),
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS redacted,
               cast(len(regexp_extract_all(text,
                 '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')) AS int)
                 AS n_emails,
               cast(len(regexp_extract_all(text, 'https?://[^\s]+')) AS int)
                 AS n_urls,
               cast(len(regexp_extract_all(text,
                 '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS int) AS n_phones
        FROM enriched
    """
    out["q97_hash_embed"] = f"""
        WITH {_sql_hash_embed_cte()}
        SELECT doc_id, v AS embedding FROM he
    """
    out["q98_text_knn"] = f"""
        WITH {_sql_hash_embed_cte()},
        nz AS (SELECT * FROM he WHERE len(list_filter(v, x -> x != 0)) > 0),
        q AS (SELECT * FROM nz WHERE doc_id % 50 = 0),
        pairs AS (
            SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
                   1.0 - {_sql_dot("q.v", "c.v")}
                         / (sqrt({_sql_dot("q.v", "q.v")})
                            * sqrt({_sql_dot("c.v", "c.v")})) AS d
            FROM q CROSS JOIN nz c
            WHERE q.doc_id != c.doc_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY d ASC, neighbor_id ASC) AS rank
            FROM pairs
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(d, 6) AS cos_dist
        FROM ranked WHERE rank <= 3
    """
    # q86 (exact PRUNED DTW KNN) must equal brute force by construction —
    # its oracle is q70's brute-force recursive-CTE DP, verbatim
    out["q86_knn_pruned_admissible"] = out["q70_knn_dtw_exact"]

    out["q101_ngram_lm"] = f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
        b0 AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                          i -> {{'pos': i, 'w1': toks[i], 'w2': toks[i+1]}})) AS s
            FROM t WHERE len(toks) >= 2
        ),
        b AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2 FROM b0),
        cb AS (SELECT w1, w2, cast(count(*) AS bigint) AS cb
               FROM b GROUP BY w1, w2),
        cu AS (SELECT w1, cast(sum(cb) AS bigint) AS cu FROM cb GROUP BY w1),
        v AS (SELECT cast(count(DISTINCT w) AS bigint) AS v
              FROM (SELECT unnest(toks) AS w FROM t)),
        sc AS (
            SELECT b.doc_id, b.pos,
                   cast(cb.cb + 1 AS double) / cast(cu.cu + v.v AS double) AS p
            FROM b JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
        ),
        pd AS (
            SELECT doc_id, cast(count(*) AS int) AS n_bigrams,
                   list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                               (a, x) -> a + x) AS s
            FROM sc GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(pd.n_bigrams, 0) AS n_bigrams,
               coalesce(pd.s / cast(pd.n_bigrams AS double), 0.0) AS avg_prob
        FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)
    """

    # BPE (q102/q103): greedy left-to-right merge application as a list
    # fold; training as a recursive CTE whose recursive term aggregates
    # over the working table (pair argmax) — the q70 technique extended
    # with a second reference to the recursive table (rows + argmax).
    def _sql_bpe_apply(syms: str, a: str, b: str) -> str:
        return f"""list_reduce(
               list_prepend(cast([] AS varchar[]),
                            list_transform({syms}, s -> [s])),
               (acc, v) -> CASE
                   WHEN len(acc) > 0 AND acc[len(acc)] = {a} AND v[1] = {b}
                   THEN list_append(acc[1:len(acc)-1], {a} || {b})
                   ELSE list_append(acc, v[1]) END)"""

    _bpe_train_ctes = f"""
        words AS (
            SELECT w AS word, cast(count(*) AS bigint) AS freq
            FROM (SELECT unnest({_SQL_TOKENS}) AS w
                  FROM documents WHERE doc_id % 10 = 0)
            GROUP BY w
        ),
        r AS (
            SELECT 0 AS step, '' AS ma, '' AS mb, cast(0 AS bigint) AS mc,
                   word, freq, string_split(word, '') AS syms
            FROM words
            UNION ALL
            SELECT a.step + 1, best.a, best.b, best.c, a.word, a.freq,
                   {_sql_bpe_apply("a.syms", "best.a", "best.b")} AS syms
            FROM r a,
                 (SELECT p.a AS a, p.b AS b, cast(sum(freq) AS bigint) AS c
                  FROM (SELECT freq,
                               unnest(list_transform(range(1, len(syms)),
                                      i -> {{'a': syms[i], 'b': syms[i+1]}})) AS p
                        FROM r WHERE len(syms) >= 2) px(freq, p)
                  GROUP BY p.a, p.b
                  ORDER BY c DESC, a ASC, b ASC
                  LIMIT 1) best
            WHERE a.step < 12
        )"""

    out["q102_bpe_train"] = f"""
        WITH RECURSIVE {_bpe_train_ctes}
        SELECT DISTINCT cast(step AS int) AS step, ma AS a, mb AS b,
               mc AS weight
        FROM r WHERE step >= 1
    """

    out["q103_bpe_encode"] = f"""
        WITH RECURSIVE {_bpe_train_ctes},
        merges AS (SELECT DISTINCT step, ma AS a, mb AS b
                   FROM r WHERE step >= 1),
        n_merges AS (SELECT cast(count(*) AS int) AS nm FROM merges),
        allwords AS (
            SELECT DISTINCT unnest({_SQL_TOKENS}) AS word FROM documents
        ),
        e AS (
            SELECT 0 AS step, word, string_split(word, '') AS syms
            FROM allwords
            UNION ALL
            SELECT e.step + 1, e.word,
                   CASE WHEN m.a IS NULL THEN e.syms
                        ELSE {_sql_bpe_apply("e.syms", "m.a", "m.b")} END
            FROM e
            LEFT JOIN merges m ON m.step = e.step + 1
            CROSS JOIN n_merges
            WHERE e.step < n_merges.nm
        ),
        enc AS (SELECT word, syms FROM e, n_merges WHERE step = n_merges.nm),
        seq AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) + 1),
                          i -> {{'pos': i, 'w': toks[i]}})) AS s
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
        ),
        j AS (
            SELECT seq.doc_id, s.pos AS pos, enc.syms
            FROM seq JOIN enc ON enc.word = s.w
        ),
        g AS (
            SELECT doc_id, cast(count(*) AS int) AS n_words,
                   flatten(list(syms ORDER BY pos)) AS flat
            FROM j GROUP BY doc_id
        ),
        fp AS (
            SELECT d.doc_id,
                   coalesce(array_to_string(g.flat, ' '), '') AS joined,
                   coalesce(g.n_words, 0) AS n_words,
                   coalesce(cast(len(g.flat) AS int), 0) AS n_bpe_tokens
            FROM (SELECT doc_id FROM documents) d LEFT JOIN g USING (doc_id)
        )
        SELECT doc_id, n_words, n_bpe_tokens,
               {_sql_char_fold("joined")} AS bpe_fingerprint
        FROM fp
    """

    # group hash = char fold of source; intervals [0, .8), [.8, .9),
    # [.9, 1.0) of denom=1e6 in dict order (train, val, test)
    out["q108_leakage_safe_split"] = f"""
        WITH h AS (
            SELECT source,
                   (({_sql_char_fold("source")} * 654435747 + 40503)
                    % 1000000007) % 1000000 AS hv
            FROM documents
        )
        SELECT source,
               CASE WHEN hv < 800000 THEN 'train'
                    WHEN hv < 900000 THEN 'val'
                    ELSE 'test' END AS split,
               cast(count(*) AS bigint) AS n_docs
        FROM h GROUP BY source, split
    """

    # portable murmur3-finalizer mix (operators/sketch.py::mix32), every
    # intermediate < 2^63: mod-2^32 multiplies split into 16-bit halves
    def _sql_mul32(e: str, c: int) -> str:
        return (
            f"((({e}) & 65535) * {c}"
            f" + (((({e}) >> 16) * {c}) % 65536) * 65536) % 4294967296"
        )

    def _sql_mix32(e: str) -> str:
        h1 = f"(({e}) % 4294967296)"
        h2 = f"(xor({h1}, {h1} >> 16))"
        h3 = f"({_sql_mul32(h2, 0x85EBCA6B)})"
        h4 = f"(xor({h3}, {h3} >> 13))"
        h5 = f"({_sql_mul32(h4, 0xC2B2AE35)})"
        return f"xor({h5}, {h5} >> 16)"

    _hll_alpha = 0.7213 / (1.0 + 1.079 / 256)
    out["q107_hll_distinct"] = f"""
        WITH h AS (
            SELECT {_sql_mix32("l_partkey")} AS h FROM lineitem
        ),
        br AS (
            SELECT h % 256 AS b,
                   24 + 1 - list_max(list_prepend(0,
                       list_transform(range(0, 24),
                           k -> CASE WHEN (((h // 256) % 16777216) >> k) & 1 = 1
                                THEN k + 1 ELSE 0 END))) AS r
            FROM h
        ),
        regs AS (SELECT b, max(r) AS m FROM br GROUP BY b),
        agg AS (
            SELECT list_reduce(list_prepend(0.0,
                       list_transform(list(m ORDER BY b),
                           mm -> power(2.0, -cast(mm AS double)))),
                       (a, x) -> a + x) AS sp,
                   cast(count(*) AS bigint) AS n_present
            FROM regs
        )
        SELECT cast(n_present AS int) AS n_present,
               cast(256 - n_present AS int) AS zero_regs,
               round(cast({_hll_alpha!r} AS double) * cast(65536 AS double)
                     / (sp + cast(256 - n_present AS double)), 6) AS hll_raw
        FROM agg
    """

    # prefix-filter mirror (NOT the quadratic brute): same canonical
    # (df ASC, token ASC) order, same |d| - ceil(t|d|) + 1 prefix, same
    # size filter, same exact verify — near-linear on both engines
    out["q106_set_similarity_join"] = f"""
        WITH sh AS (SELECT doc_id AS id, {_SQL_SHINGLES} AS s FROM documents),
        toks AS (SELECT id, unnest(s) AS tok FROM sh),
        freq AS (SELECT tok, cast(count(*) AS bigint) AS df
                 FROM toks GROUP BY tok),
        ordered AS (
            SELECT id, list(tok ORDER BY df, tok) AS sorted_toks,
                   cast(count(*) AS int) AS sz
            FROM toks JOIN freq USING (tok) GROUP BY id
        ),
        pref AS (
            SELECT id, sz,
                   unnest(sorted_toks[1:(sz - cast(ceil(sz * 0.5 - 1e-9) AS int)
                                         + 1)]) AS tok
            FROM ordered
        ),
        cand AS (
            SELECT DISTINCT a.id AS id_a, b.id AS id_b
            FROM pref a JOIN pref b
              ON a.tok = b.tok AND a.id < b.id
             AND cast(b.sz AS double) >= cast(a.sz AS double) * 0.5 - 1e-9
             AND cast(b.sz AS double) * 0.5 <= cast(a.sz AS double) + 1e-9
        ),
        pairs AS (
            SELECT c.id_a, c.id_b, sa.s AS _sa, sb.s AS _sb
            FROM cand c
            JOIN sh sa ON sa.id = c.id_a
            JOIN sh sb ON sb.id = c.id_b
        ),
        scored AS (SELECT id_a, id_b, {_SQL_JACCARD} AS j FROM pairs)
        SELECT id_a, id_b, round(j, 6) AS jac
        FROM scored WHERE j >= 0.5
    """

    # JPEG DC-only closed form: block (by, bx) of image i is the flat
    # value ((31*i + 13*bx + 7*by) % 200) + 28; resize reads source pixel
    # ((oi*h)//4, (oj*w)//4) — block index = that // 8
    # q113: q70's recursive-CTE DTW dynamic program with the 2-channel
    # summed point cost (dependent multivariate DTW); same round(6)
    # discipline absorbing the kernel's prefix-scan fp reassociation
    _mvcost_first = "(abs(fa[1][1]-fb[k][1]) + abs(fa[1][2]-fb[k][2]))"
    _mvcost_row1 = "(abs(fa[i+1][1]-fb[1][1]) + abs(fa[i+1][2]-fb[1][2]))"
    _mvcost_j = "(abs(fa[i+1][1]-fb[j][1]) + abs(fa[i+1][2]-fb[j][2]))"
    out["q113_knn_dtw_multichannel"] = f"""
        WITH RECURSIVE ptsm AS (
            SELECT user_id,
                   list([value, cast(length(event_type) AS double)]
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        ),
        sizedm AS (
            SELECT user_id, vals[1:{SERIES_LEN}] AS features
            FROM ptsm WHERE len(vals) >= {SERIES_LEN}
        ),
        labels AS (
            SELECT user_id, event_type AS label FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type ASC) AS rk
                FROM events GROUP BY user_id, event_type
            ) WHERE rk = 1
        ),
        series AS (
            SELECT s.user_id AS series_id, s.features, l.label
            FROM sizedm s JOIN labels l USING (user_id)
        ),
        train AS (SELECT * FROM series WHERE series_id % 4 != 0),
        test  AS (SELECT * FROM series WHERE series_id % 4 = 0),
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM test t CROSS JOIN train r
        ),
        dp AS (
            SELECT test_id, train_id, train_label, fa, fb, 1 AS i,
                   list_transform(range(1, len(fb)+1),
                       j -> list_reduce(list_prepend(0.0,
                                list_transform(range(1, j+1),
                                    k -> {_mvcost_first})),
                            (x, y) -> x + y)) AS row
            FROM pairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa, fb, i+1,
                   list_reduce(
                       list_prepend([row[1] + {_mvcost_row1}],
                           list_transform(range(2, len(fb)+1),
                               j -> [{_mvcost_j}, row[j], row[j-1]])),
                       (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
            FROM dp WHERE i < len(fa)
        ),
        dd AS (
            SELECT test_id, train_id, train_label, row[-1] AS dist
            FROM dp WHERE i = len(fa)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM dd WHERE dist != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank,
               round(dist, 6) AS distance
        FROM ranked WHERE rank <= 3
    """

    # q156 (r6): the multichannel LB-pruned KNN is lossless, so its oracle
    # IS q113's brute-force dependent-DTW dynamic program, verbatim — hash
    # equality proves filter-and-verify returns the brute-force answer
    out["q156_knn_dtw_mc_pruned"] = out["q113_knn_dtw_multichannel"]

    # q160/q161 (r6): integer Mann-Kendall S + order-exact Theil-Sen
    # medians — nested ascending folds / explicit sort + element pick,
    # mirroring the Spark expressions value-for-value
    out["q160_mann_kendall"] = f"""
        WITH {_SERIES_CTE},
        base AS (
            SELECT series_id, features AS f, len(features) AS n FROM series
        ),
        stat AS (
            SELECT series_id, n,
                   list_reduce(list_prepend(cast(0 AS bigint),
                       list_transform(range(1, n), i ->
                           list_reduce(list_prepend(cast(0 AS bigint),
                               list_transform(range(i + 1, n + 1),
                                   j -> cast(sign(f[j] - f[i]) AS bigint))),
                               (a, v) -> a + v))),
                       (a, v) -> a + v) AS s_stat,
                   cast(n * (n - 1) / 2 AS bigint) AS n_pairs
            FROM base
        )
        SELECT series_id, s_stat, n_pairs,
               CASE WHEN n >= 2
                    THEN cast(s_stat AS double) / cast(n_pairs AS double)
               END AS tau
        FROM stat
    """
    out["q161_theil_sen"] = f"""
        WITH {_SERIES_CTE},
        base AS (
            SELECT series_id, features AS f, len(features) AS n FROM series
        ),
        sl AS (
            SELECT series_id, f, n,
                   list_sort(flatten(list_transform(range(1, n), i ->
                       list_transform(range(i + 1, n + 1),
                           j -> (f[j] - f[i]) / cast(j - i AS double))))) AS ss
            FROM base
        ),
        med AS (
            SELECT series_id, f, n,
                   CASE WHEN n < 2 THEN NULL
                        WHEN len(ss) % 2 = 1 THEN ss[len(ss) // 2 + 1]
                        ELSE (ss[len(ss) // 2] + ss[len(ss) // 2 + 1]) / 2.0
                   END AS slope
            FROM sl
        ),
        lev AS (
            SELECT series_id, slope,
                   list_sort(list_transform(range(1, n + 1),
                       t -> f[t] - slope * cast(t AS double))) AS ls,
                   n
            FROM med
        )
        SELECT series_id, slope,
               CASE WHEN n < 2 THEN NULL
                    WHEN len(ls) % 2 = 1 THEN ls[len(ls) // 2 + 1]
                    ELSE (ls[len(ls) // 2] + ls[len(ls) // 2 + 1]) / 2.0
               END AS intercept
        FROM lev
    """

    # q162-q164 (r6): edit-distance family (LCSS/EDR/ERP) — each KNN's full
    # DP replayed as a q70-style recursive CTE: one DP row per recursion
    # level (boundary column j=0 included, so row[j+1] = dp[i][j]), the
    # row's sequential left-cell dependency as a list_reduce with acc[-1].
    # LCSS/EDR state is INTEGER (exact on any engine); ERP cells are each
    # ONE IEEE add + an exact 3-way least, identical in any evaluation
    # order — so all three hash-match the Spark side with NO rounding.
    def _edit_knn_sql(init_row: str, step_row: str, final: str) -> str:
        return f"""
        WITH RECURSIVE {_SERIES_CTE},
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM test t CROSS JOIN train r
        ),
        dp AS (
            SELECT test_id, train_id, train_label, fa, fb, 0 AS i,
                   {init_row} AS row
            FROM pairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa, fb, i + 1,
                   {step_row} AS row
            FROM dp WHERE i < len(fa)
        ),
        dd AS (
            SELECT test_id, train_id, train_label, {final} AS dist
            FROM dp WHERE i = len(fa)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM dd WHERE dist != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank, dist AS distance
        FROM ranked WHERE rank <= 3
        """

    out["q162_knn_lcss"] = _edit_knn_sql(
        "list_transform(range(0, len(fb) + 1), j -> 0)",
        f"""list_reduce(
               list_prepend([0],
                   list_transform(range(1, len(fb) + 1),
                       j -> [CASE WHEN abs(fa[i+1] - fb[j]) <= {LCSS_EPS}
                                  THEN 1 ELSE 0 END, row[j], row[j+1]])),
               (acc, e) -> list_append(acc,
                   CASE WHEN e[1] = 1 THEN e[2] + 1
                        ELSE greatest(e[3], acc[-1]) END))""",
        "1.0 - cast(row[-1] AS double) / cast(least(len(fa), len(fb)) AS double)",
    )
    out["q163_knn_edr"] = _edit_knn_sql(
        "list_transform(range(0, len(fb) + 1), j -> cast(j AS integer))",
        f"""list_reduce(
               list_prepend([cast(i + 1 AS integer)],
                   list_transform(range(1, len(fb) + 1),
                       j -> [CASE WHEN abs(fa[i+1] - fb[j]) <= {EDR_EPS}
                                  THEN 0 ELSE 1 END, row[j], row[j+1]])),
               (acc, e) -> list_append(acc,
                   least(e[2] + e[1], e[3] + 1, acc[-1] + 1)))""",
        "cast(row[-1] AS double) / cast(greatest(len(fa), len(fb)) AS double)",
    )
    out["q164_knn_erp"] = _edit_knn_sql(
        f"""list_reduce(
               list_prepend([0.0],
                   list_transform(range(1, len(fb) + 1),
                       j -> [abs({ERP_GAP} - fb[j])])),
               (acc, e) -> list_append(acc, acc[-1] + e[1]))""",
        f"""list_reduce(
               list_prepend([row[1] + abs(fa[i+1] - {ERP_GAP})],
                   list_transform(range(1, len(fb) + 1),
                       j -> [abs(fa[i+1] - fb[j]), row[j], row[j+1],
                             abs({ERP_GAP} - fb[j])])),
               (acc, e) -> list_append(acc,
                   least(e[2] + e[1],
                         e[3] + abs(fa[i+1] - {ERP_GAP}),
                         acc[-1] + e[4])))""",
        "row[-1]",
    )

    # q165 (r6): TWED — same recursive-row replay with +inf borders and the
    # a_0 = b_0 = 0 padding convention; nu/lambda constants are folded in
    # PYTHON (2*nu, nu+lambda) and injected as the same repr literal both
    # engines parse to the identical double
    _twed_nu2 = repr(2.0 * TWED_NU)
    _twed_gap = repr(TWED_NU + TWED_LAM)
    _twed_aprev = "(CASE WHEN i + 1 = 1 THEN 0.0 ELSE fa[i] END)"
    _twed_bprev = "(CASE WHEN j = 1 THEN 0.0 ELSE fb[j-1] END)"
    out["q165_knn_twed"] = _edit_knn_sql(
        "list_prepend(0.0, list_transform(range(1, len(fb) + 1),"
        " j -> cast('infinity' AS double)))",
        f"""list_reduce(
               list_prepend([cast('infinity' AS double)],
                   list_transform(range(1, len(fb) + 1),
                       j -> [(abs(fa[i+1] - fb[j])
                              + abs({_twed_aprev} - {_twed_bprev}))
                             + {_twed_nu2} * cast(abs((i + 1) - j) AS double),
                             row[j], row[j+1],
                             abs(fb[j] - {_twed_bprev}) + {_twed_gap}])),
               (acc, e) -> list_append(acc,
                   least(e[2] + e[1],
                         e[3] + (abs(fa[i+1] - {_twed_aprev}) + {_twed_gap}),
                         acc[-1] + e[4])))""",
        "row[-1]",
    )

    # q188 (r7): multichannel TWED — the INDEPENDENT-CHANNEL-SUM lift.
    # Each channel runs q165's recursion on its own slice (the dp CTE
    # carries one row array per channel); dist = row1[-1] + row2[-1], the
    # same ascending-channel left fold as the engine's _channel_sum /
    # multichannel lifter, so raw doubles hash-match with no rounding.
    def _twed_init(fb: str) -> str:
        return (
            f"list_prepend(0.0, list_transform(range(1, len({fb}) + 1),"
            " j -> cast('infinity' AS double)))"
        )

    def _twed_step(fa: str, fb: str, row: str) -> str:
        aprev = f"(CASE WHEN i + 1 = 1 THEN 0.0 ELSE {fa}[i] END)"
        bprev = f"(CASE WHEN j = 1 THEN 0.0 ELSE {fb}[j-1] END)"
        return f"""list_reduce(
               list_prepend([cast('infinity' AS double)],
                   list_transform(range(1, len({fb}) + 1),
                       j -> [(abs({fa}[i+1] - {fb}[j])
                              + abs({aprev} - {bprev}))
                             + {_twed_nu2} * cast(abs((i + 1) - j) AS double),
                             {row}[j], {row}[j+1],
                             abs({fb}[j] - {bprev}) + {_twed_gap}])),
               (acc, e) -> list_append(acc,
                   least(e[2] + e[1],
                         e[3] + (abs({fa}[i+1] - {aprev}) + {_twed_gap}),
                         acc[-1] + e[4])))"""

    out["q188_knn_twed_multichannel"] = f"""
        WITH RECURSIVE ptsm AS (
            SELECT user_id,
                   list([value, cast(length(event_type) AS double)]
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        ),
        sizedm AS (
            SELECT user_id, vals[1:{SERIES_LEN}] AS features
            FROM ptsm WHERE len(vals) >= {SERIES_LEN}
        ),
        labels AS (
            SELECT user_id, event_type AS label FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type ASC) AS rk
                FROM events GROUP BY user_id, event_type
            ) WHERE rk = 1
        ),
        series AS (
            SELECT s.user_id AS series_id, s.features, l.label
            FROM sizedm s JOIN labels l USING (user_id)
        ),
        train AS (SELECT * FROM series WHERE series_id % 4 != 0),
        test  AS (SELECT * FROM series WHERE series_id % 4 = 0),
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label,
                   list_transform(t.features, v -> v[1]) AS fa1,
                   list_transform(r.features, v -> v[1]) AS fb1,
                   list_transform(t.features, v -> v[2]) AS fa2,
                   list_transform(r.features, v -> v[2]) AS fb2
            FROM test t CROSS JOIN train r
        ),
        dp AS (
            SELECT test_id, train_id, train_label, fa1, fb1, fa2, fb2,
                   0 AS i,
                   {_twed_init("fb1")} AS row1,
                   {_twed_init("fb2")} AS row2
            FROM pairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa1, fb1, fa2, fb2,
                   i + 1,
                   {_twed_step("fa1", "fb1", "row1")} AS row1,
                   {_twed_step("fa2", "fb2", "row2")} AS row2
            FROM dp WHERE i < len(fa1)
        ),
        dd AS (
            SELECT test_id, train_id, train_label,
                   row1[-1] + row2[-1] AS dist
            FROM dp WHERE i = len(fa1)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM dd WHERE dist != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank, dist AS distance
        FROM ranked WHERE rank <= 3
    """

    # q189 (r7): multichannel LCSS — the INTEGER-state twin of q188's
    # float lift: per channel, q162's integer-count recursion on the
    # slice; dist = (1 - cnt1/min) + (1 - cnt2/min), the same ascending
    # channel fold. Hash-exact: integer counts + one division per channel
    # + one add.
    def _lcss_init(fb: str) -> str:
        return f"list_transform(range(0, len({fb}) + 1), j -> 0)"

    def _lcss_step(fa: str, fb: str, row: str) -> str:
        return f"""list_reduce(
               list_prepend([0],
                   list_transform(range(1, len({fb}) + 1),
                       j -> [CASE WHEN abs({fa}[i+1] - {fb}[j]) <= {LCSS_EPS}
                                  THEN 1 ELSE 0 END, {row}[j], {row}[j+1]])),
               (acc, e) -> list_append(acc,
                   CASE WHEN e[1] = 1 THEN e[2] + 1
                        ELSE greatest(e[3], acc[-1]) END))"""

    def _lcss_final(fa: str, fb: str, row: str) -> str:
        return (
            f"(1.0 - cast({row}[-1] AS double)"
            f" / cast(least(len({fa}), len({fb})) AS double))"
        )

    out["q189_knn_lcss_multichannel"] = f"""
        WITH RECURSIVE ptsm AS (
            SELECT user_id,
                   list([value, cast(length(event_type) AS double)]
                        ORDER BY ts, event_id) AS vals
            FROM events GROUP BY user_id
        ),
        sizedm AS (
            SELECT user_id, vals[1:{SERIES_LEN}] AS features
            FROM ptsm WHERE len(vals) >= {SERIES_LEN}
        ),
        labels AS (
            SELECT user_id, event_type AS label FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC, event_type ASC) AS rk
                FROM events GROUP BY user_id, event_type
            ) WHERE rk = 1
        ),
        series AS (
            SELECT s.user_id AS series_id, s.features, l.label
            FROM sizedm s JOIN labels l USING (user_id)
        ),
        train AS (SELECT * FROM series WHERE series_id % 4 != 0),
        test  AS (SELECT * FROM series WHERE series_id % 4 = 0),
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label,
                   list_transform(t.features, v -> v[1]) AS fa1,
                   list_transform(r.features, v -> v[1]) AS fb1,
                   list_transform(t.features, v -> v[2]) AS fa2,
                   list_transform(r.features, v -> v[2]) AS fb2
            FROM test t CROSS JOIN train r
        ),
        dp AS (
            SELECT test_id, train_id, train_label, fa1, fb1, fa2, fb2,
                   0 AS i,
                   {_lcss_init("fb1")} AS row1,
                   {_lcss_init("fb2")} AS row2
            FROM pairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa1, fb1, fa2, fb2,
                   i + 1,
                   {_lcss_step("fa1", "fb1", "row1")} AS row1,
                   {_lcss_step("fa2", "fb2", "row2")} AS row2
            FROM dp WHERE i < len(fa1)
        ),
        dd AS (
            SELECT test_id, train_id, train_label,
                   {_lcss_final("fa1", "fb1", "row1")}
                   + {_lcss_final("fa2", "fb2", "row2")} AS dist
            FROM dp WHERE i = len(fa1)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM dd WHERE dist != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank, dist AS distance
        FROM ranked WHERE rank <= 3
    """

    # q190 (r7): the stateless streaming scorer's batch twin — q165's TWED
    # recursion + q10's vote CTE. (votes DESC, best_rank ASC) mirrors
    # _vote_expr's (votes, size - first_position) struct max exactly:
    # array_position finds the label's FIRST slot in the rank-sorted
    # candidate array = min(rank).
    out["q190_stream_stateless_twin"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM test t CROSS JOIN train r
        ),
        dp AS (
            SELECT test_id, train_id, train_label, fa, fb, 0 AS i,
                   {_twed_init("fb")} AS row
            FROM pairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa, fb, i + 1,
                   {_twed_step("fa", "fb", "row")} AS row
            FROM dp WHERE i < len(fa)
        ),
        dd AS (
            SELECT test_id, train_id, train_label, row[-1] AS dist
            FROM dp WHERE i = len(fa)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM dd WHERE dist != 0
        ),
        topk AS (SELECT * FROM ranked WHERE rank <= 3),
        votes AS (
            SELECT test_id, train_label, count(*) AS votes, min(rank) AS best_rank
            FROM topk GROUP BY test_id, train_label
        ),
        sel AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY votes DESC, best_rank ASC, train_label ASC) AS vrk
            FROM votes
        )
        SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1
    """

    # q191 (r7): TWED-metric LOF — q165's recursion replaces q166's
    # euclidean pairs CTE; everything downstream (knn rank, kdist, reach,
    # rank-sorted lrd folds, the final ratio) is q166's chain verbatim.
    out["q191_lof_twed"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        allp AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   t.features AS fa, r.features AS fb
            FROM series t CROSS JOIN series r
        ),
        dpw AS (
            SELECT test_id, train_id, fa, fb, 0 AS i,
                   {_twed_init("fb")} AS row
            FROM allp
            UNION ALL
            SELECT test_id, train_id, fa, fb, i + 1,
                   {_twed_step("fa", "fb", "row")} AS row
            FROM dpw WHERE i < len(fa)
        ),
        pairs AS (
            SELECT test_id, train_id, row[-1] AS d
            FROM dpw WHERE i = len(fa)
        ),
        knn AS (
            SELECT * FROM (
                SELECT test_id, train_id, d,
                       row_number() OVER (PARTITION BY test_id
                           ORDER BY d ASC, train_id ASC) AS rank
                FROM pairs WHERE d != 0
            ) WHERE rank <= 5
        ),
        kd AS (
            SELECT test_id AS oid, max(d) AS kdist
            FROM knn GROUP BY test_id
        ),
        reach AS (
            SELECT n.test_id, n.rank, greatest(kd.kdist, n.d) AS v
            FROM knn n JOIN kd ON n.train_id = kd.oid
        ),
        lrd AS (
            SELECT test_id AS lid,
                   cast(count(*) AS double)
                   / list_reduce(list_prepend(0.0, list(v ORDER BY rank)),
                                 (a, b) -> a + b) AS lrd
            FROM reach GROUP BY test_id
        ),
        nbl AS (
            SELECT n.test_id, n.rank, l.lrd AS lo
            FROM knn n JOIN lrd l ON n.train_id = l.lid
        ),
        slo AS (
            SELECT test_id,
                   list_reduce(list_prepend(0.0, list(lo ORDER BY rank)),
                               (a, b) -> a + b) AS s,
                   cast(count(*) AS double) AS c
            FROM nbl GROUP BY test_id
        )
        SELECT s.test_id AS series_id, kd.kdist AS kdist, l.lrd AS lrd,
               (s.s / s.c) / l.lrd AS lof
        FROM slo s JOIN lrd l ON s.test_id = l.lid
        JOIN kd ON s.test_id = kd.oid
    """

    # q192 (r7): TWED conformal — q169's chain with BOTH distance CTEs
    # (cal x proper, test x proper) replaced by q165's recursion; the
    # mins/alphas/rank-count/rational-p stages are q169's verbatim.
    out["q192_conformal_twed"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        proper AS (
            SELECT series_id AS pid, features AS pf, label AS plab
            FROM train WHERE series_id % 3 != 1
        ),
        cal AS (
            SELECT series_id AS cid, features AS cf, label AS clab
            FROM train WHERE series_id % 3 = 1
        ),
        cdp AS (
            SELECT c.cid, c.clab, p.plab, c.cf AS fa, p.pf AS fb, 0 AS i,
                   {_twed_init("p.pf")} AS row
            FROM cal c CROSS JOIN proper p
            UNION ALL
            SELECT cid, clab, plab, fa, fb, i + 1,
                   {_twed_step("fa", "fb", "row")} AS row
            FROM cdp WHERE i < len(fa)
        ),
        cpairs AS (
            SELECT cid, clab, plab, row[-1] AS d FROM cdp WHERE i = len(fa)
        ),
        cmin AS (
            SELECT cid, clab, plab, min(d) AS dmin
            FROM cpairs WHERE d != 0 GROUP BY cid, clab, plab
        ),
        csame AS (SELECT cid, dmin AS ds FROM cmin WHERE plab = clab),
        cdiff AS (
            SELECT cid, min(dmin) AS dd FROM cmin
            WHERE plab != clab GROUP BY cid
        ),
        alphas AS (
            SELECT s.ds / d.dd AS ai FROM csame s JOIN cdiff d USING (cid)
        ),
        nc AS (SELECT cast(count(*) AS bigint) AS ncal FROM alphas),
        tdp AS (
            SELECT t.series_id AS test_id, p.plab, t.features AS fa,
                   p.pf AS fb, 0 AS i,
                   {_twed_init("p.pf")} AS row
            FROM test t CROSS JOIN proper p
            UNION ALL
            SELECT test_id, plab, fa, fb, i + 1,
                   {_twed_step("fa", "fb", "row")} AS row
            FROM tdp WHERE i < len(fa)
        ),
        tpairs AS (
            SELECT test_id, plab, row[-1] AS d FROM tdp WHERE i = len(fa)
        ),
        tmin AS (
            SELECT test_id, plab, min(d) AS dmin
            FROM tpairs WHERE d != 0 GROUP BY test_id, plab
        ),
        tdiff AS (
            SELECT a.test_id, a.plab AS label, min(b.dmin) AS dd
            FROM tmin a JOIN tmin b
              ON a.test_id = b.test_id AND a.plab != b.plab
            GROUP BY a.test_id, a.plab
        ),
        axy AS (
            SELECT m.test_id, m.plab AS label, m.dmin / d.dd AS alpha
            FROM tmin m JOIN tdiff d
              ON m.test_id = d.test_id AND m.plab = d.label
        ),
        cnt AS (
            SELECT test_id, label, alpha,
                   cast(count(a.ai) AS bigint) AS ge
            FROM axy LEFT JOIN alphas a ON a.ai >= axy.alpha
            GROUP BY test_id, label, alpha
        )
        SELECT test_id, label, alpha,
               cast(ge + 1 AS double) / cast(ncal + 1 AS double) AS p_value
        FROM cnt CROSS JOIN nc
    """

    # q194 (r7): the eps=0.1 prediction set — q192's chain + the exact
    # membership filter (rational p vs the literal eps).
    out["q194_conformal_set"] = (
        "SELECT * FROM (" + out["q192_conformal_twed"] + ") WHERE p_value > 0.1"
    )

    # q193 (r7): TWED k-medoids — q143's PAM chain (seeds by the q72
    # spread hash, two assigns, the medoid-update argmin) verbatim on a
    # TWED distance matrix; micro-rounding makes every decision integer.
    out["q193_kmedoids_twed"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        allp AS (
            SELECT a.series_id AS ia, a.features AS fa,
                   b.series_id AS ib, b.features AS fb
            FROM series a CROSS JOIN series b
        ),
        dpw AS (
            SELECT ia, ib, fa, fb, 0 AS i,
                   {_twed_init("fb")} AS row
            FROM allp
            UNION ALL
            SELECT ia, ib, fa, fb, i + 1,
                   {_twed_step("fa", "fb", "row")} AS row
            FROM dpw WHERE i < len(fa)
        ),
        dmat AS (
            SELECT ia, ib, cast(round(row[-1] * 1000000) AS bigint) AS dm
            FROM dpw WHERE i = len(fa)
        ),
        seeds AS (
            SELECT series_id AS mid FROM series
            ORDER BY ((series_id % 1000000007) * 654435747 + 40503)
                     % 1000000007 ASC, series_id ASC
            LIMIT 4
        ),
        a1 AS (
            SELECT id, mid FROM (
                SELECT d.ia AS id, d.ib AS mid, d.dm,
                       row_number() OVER (PARTITION BY d.ia
                           ORDER BY d.dm ASC, d.ib ASC) AS rk
                FROM dmat d JOIN seeds s ON d.ib = s.mid
            ) WHERE rk = 1
        ),
        sums AS (
            SELECT m1.mid AS cm, m1.id AS cand, sum(d.dm) AS s
            FROM a1 m1 JOIN a1 m2 ON m1.mid = m2.mid
            JOIN dmat d ON d.ia = m1.id AND d.ib = m2.id
            GROUP BY m1.mid, m1.id
        ),
        med2 AS (
            SELECT cand AS mid FROM (
                SELECT cand, row_number() OVER (PARTITION BY cm
                           ORDER BY s ASC, cand ASC) AS rk
                FROM sums
            ) WHERE rk = 1
        ),
        a2 AS (
            SELECT id, mid, dm FROM (
                SELECT d.ia AS id, d.ib AS mid, d.dm,
                       row_number() OVER (PARTITION BY d.ia
                           ORDER BY d.dm ASC, d.ib ASC) AS rk
                FROM dmat d JOIN med2 m ON d.ib = m.mid
            ) WHERE rk = 1
        )
        SELECT id AS series_id, mid AS medoid_id, dm AS dist_micro FROM a2
    """

    # q195 (r7): lossless anchor-bound pruning — the oracle IS q165's
    # brute-force TWED recursion; hash equality proves filter-and-verify
    # returned the brute answer.
    out["q195_knn_twed_lb_pruned"] = out["q165_knn_twed"]

    # q196 (r8): the sampled prune-rate gate wraps the same lossless
    # machinery — whichever branch the probe picks, the answer is the
    # brute TWED recursion, so the oracle is q165's too.
    out["q196_knn_twed_lb_gated"] = out["q165_knn_twed"]

    # q197 (r8): the MLlib vector boundary is the identity on
    # array<float> (exact float->double->float round-trip)
    out["q197_vector_boundary_roundtrip"] = """
        SELECT vec_id, embedding AS embedding_rt FROM embeddings
    """

    # q198 (r8): multichannel anchor-bound pruning — whichever pairs the
    # scalar prefilter drops, the answer is q188's brute multichannel
    # TWED recursion.
    out["q198_knn_twed_mc_lb_pruned"] = out["q188_knn_twed_multichannel"]

    # q199 (r8): the DTW-side prune-rate gate — whichever branch the
    # probe picks, the answer is q70's brute DTW DP (q86's contract).
    out["q199_knn_dtw_lb_gated"] = out["q70_knn_dtw_exact"]

    # q200 (r9): ragged-series DTW KNN through the grouped kernel strategy
    # — q70's DP recursion verbatim (it is already per-pair-length), run
    # over per-id truncated slices, so the per-length group merge is
    # hash-proven against brute force on genuinely mixed-length input.
    out["q200_knn_dtw_ragged"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        rt AS (
            SELECT series_id,
                   features[1:({SERIES_LEN} - cast(series_id % 3 AS int) * 4)] AS features,
                   label
            FROM train
        ),
        tt AS (
            SELECT series_id,
                   features[1:({SERIES_LEN} - cast(series_id % 3 AS int) * 4)] AS features,
                   label
            FROM test
        ),
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM tt t CROSS JOIN rt r
        ),
        dp AS (
            SELECT test_id, train_id, train_label, fa, fb, 1 AS i,
                   list_transform(range(1, len(fb)+1),
                       j -> list_reduce(list_prepend(0.0,
                                list_transform(range(1, j+1), k -> abs(fa[1]-fb[k]))),
                            (x, y) -> x + y)) AS row
            FROM pairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa, fb, i+1,
                   list_reduce(
                       list_prepend([row[1] + abs(fa[i+1]-fb[1])],
                           list_transform(range(2, len(fb)+1),
                               j -> [abs(fa[i+1]-fb[j]), row[j], row[j-1]])),
                       (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
            FROM dp WHERE i < len(fa)
        ),
        dd AS (
            SELECT test_id, train_id, train_label, row[-1] AS dist
            FROM dp WHERE i = len(fa)
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM dd WHERE dist != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank,
               round(dist, 6) AS distance
        FROM ranked WHERE rank <= 3
    """

    # q201 (r9): the chunked block grid on the same ragged slices — the
    # grid is exact by construction, so its oracle IS q200's brute DP.
    out["q201_knn_dtw_ragged_chunked"] = out["q200_knn_dtw_ragged"]

    # q166 (r6): LOF — k-distances, reach-dists, lrd and the final ratio
    # all mirror the engine exactly: rank-sorted list folds for every float
    # sum, greatest/sqrt/divide are single correctly-rounded IEEE ops, so
    # raw doubles hash-match
    out["q166_lof_outliers"] = f"""
        WITH {_SERIES_CTE},
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   sqrt({_SQDIST}) AS d
            FROM series t CROSS JOIN series r
        ),
        knn AS (
            SELECT * FROM (
                SELECT test_id, train_id, d,
                       row_number() OVER (PARTITION BY test_id
                           ORDER BY d ASC, train_id ASC) AS rank
                FROM pairs WHERE d != 0
            ) WHERE rank <= 5
        ),
        kd AS (
            SELECT test_id AS oid, max(d) AS kdist
            FROM knn GROUP BY test_id
        ),
        reach AS (
            SELECT n.test_id, n.rank, greatest(kd.kdist, n.d) AS v
            FROM knn n JOIN kd ON n.train_id = kd.oid
        ),
        lrd AS (
            SELECT test_id AS lid,
                   cast(count(*) AS double)
                   / list_reduce(list_prepend(0.0, list(v ORDER BY rank)),
                                 (a, b) -> a + b) AS lrd
            FROM reach GROUP BY test_id
        ),
        nbl AS (
            SELECT n.test_id, n.rank, l.lrd AS lo
            FROM knn n JOIN lrd l ON n.train_id = l.lid
        ),
        slo AS (
            SELECT test_id,
                   list_reduce(list_prepend(0.0, list(lo ORDER BY rank)),
                               (a, b) -> a + b) AS s,
                   cast(count(*) AS double) AS c
            FROM nbl GROUP BY test_id
        )
        SELECT s.test_id AS series_id, kd.kdist AS kdist, l.lrd AS lrd,
               (s.s / s.c) / l.lrd AS lof
        FROM slo s JOIN lrd l ON s.test_id = l.lid
        JOIN kd ON s.test_id = kd.oid
    """

    # q173 (r6): KNN imputation — co-observed msd ranking + filtered
    # rank-ordered mean folds; the mask is the same (s + t - 1) % 7 == 2
    # expression (Spark's transform index is 0-based, the SQL t 1-based)
    out["q173_knn_impute"] = f"""
        WITH {_SERIES_CTE},
        msk AS (
            SELECT series_id, list_transform(range(1, len(features) + 1),
                t -> CASE WHEN (series_id + t - 1) % 7 = 2 THEN NULL
                          ELSE features[t] END) AS f
            FROM series
        ),
        ipairs AS (
            SELECT a.series_id AS aid, b.series_id AS bid, b.f AS bf,
                   list_filter(list_transform(range(1, len(a.f) + 1),
                       t -> CASE WHEN a.f[t] IS NOT NULL
                                  AND b.f[t] IS NOT NULL
                             THEN (a.f[t] - b.f[t]) * (a.f[t] - b.f[t]) END),
                       x -> x IS NOT NULL) AS obs
            FROM msk a CROSS JOIN msk b WHERE a.series_id != b.series_id
        ),
        pd AS (
            SELECT aid, bid, bf, len(obs) AS nobs,
                   list_reduce(list_prepend(0.0, obs), (x, y) -> x + y) AS s
            FROM ipairs WHERE len(obs) >= 1
        ),
        irk AS (
            SELECT aid, bid, bf,
                   row_number() OVER (PARTITION BY aid
                       ORDER BY s / cast(nobs AS double) ASC, bid ASC) AS r
            FROM pd
        ),
        itopk AS (SELECT * FROM irk WHERE r <= 3),
        miss AS (
            SELECT series_id AS aid, t FROM (
                SELECT series_id, f, unnest(range(1, len(f) + 1)) AS t
                FROM msk
            ) WHERE f[t] IS NULL
        ),
        dv AS (
            SELECT m.aid, m.t, k.r, k.bf[m.t] AS v
            FROM miss m JOIN itopk k ON m.aid = k.aid
            WHERE k.bf[m.t] IS NOT NULL
        ),
        ig AS (
            SELECT aid, t, cast(count(*) AS bigint) AS n_donors,
                   list_reduce(list_prepend(0.0, list(v ORDER BY r)),
                               (x, y) -> x + y)
                     / cast(count(*) AS double) AS imputed
            FROM dv GROUP BY aid, t
        )
        SELECT m.aid AS series_id, cast(m.t AS int) AS t,
               cast(coalesce(g.n_donors, 0) AS bigint) AS n_donors,
               g.imputed
        FROM miss m LEFT JOIN ig g ON m.aid = g.aid AND m.t = g.t
    """

    # q172 (r6): Ljung-Box — q167's acf folds squared into one more
    # ascending k-fold; n(n+2) scale exact
    _lb_c = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, n - k + 1),"
        " t -> (f[t] - m) * (f[t + k] - m))), (a, v) -> a + v)"
    )
    out["q172_ljung_box"] = f"""
        WITH {_SERIES_CTE},
        base AS (
            SELECT series_id, features AS f, len(features) AS n,
                   list_reduce(list_prepend(0.0, features), (a, v) -> a + v)
                     / cast(len(features) AS double) AS m
            FROM series
        ),
        st AS (
            SELECT series_id, f, n, m,
                   list_reduce(list_prepend(0.0,
                       list_transform(f, v -> (v - m) * (v - m))),
                       (a, v) -> a + v) AS c0
            FROM base
        )
        SELECT series_id,
               CASE WHEN n >= 2 AND c0 != 0 AND 8 < n THEN
                   (cast(n AS double) * cast(n + 2 AS double)) *
                   list_reduce(list_prepend(0.0,
                       list_transform(range(1, 9), k ->
                           ({_lb_c} / c0) * ({_lb_c} / c0)
                           / cast(n - k AS double))),
                       (a, v) -> a + v)
               END AS q_stat,
               cast(8 AS int) AS h
        FROM st
    """

    # q171 (r6): FLUSS — q134's matrix-profile CTEs (m=4, excl=2) + integer
    # delta prefix-sum arc counts + the idealized-curve correction
    out["q171_fluss_segmentation"] = f"""
        WITH {_SERIES_CTE},
        {_sql_window_ctes(4)},
        {_sql_matrix_profile_ctes(4, 2)},
        prof AS (SELECT series_id, start, nn_start FROM mprof WHERE rk = 1),
        lw AS (
            SELECT series_id, len(features) - 4 + 1 AS L
            FROM series WHERE len(features) - 4 + 1 >= 2
        ),
        deltas AS (
            SELECT series_id, least(start, nn_start) AS p, 1 AS dlt FROM prof
            UNION ALL
            SELECT series_id, greatest(start, nn_start) AS p, -1 AS dlt
            FROM prof
        ),
        dsum AS (
            SELECT series_id, p, cast(sum(dlt) AS bigint) AS dl
            FROM deltas GROUP BY series_id, p
        ),
        frame AS (SELECT series_id, L, unnest(range(1, L)) AS p FROM lw),
        jj AS (
            SELECT f.series_id, f.L, f.p, coalesce(d.dl, 0) AS dl
            FROM frame f LEFT JOIN dsum d
              ON f.series_id = d.series_id AND f.p = d.p
        ),
        ac AS (
            SELECT series_id, L, p,
                   cast(sum(dl) OVER (PARTITION BY series_id ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS bigint) AS arcs
            FROM jj
        ),
        cc AS (
            SELECT series_id, p, arcs,
                   least(1.0, cast(arcs AS double) /
                       (((2.0 * cast(p AS double)) * cast(L - p AS double))
                        / cast(L AS double))) AS cac,
                   (p >= 4 AND p <= L - 4) AS zone
            FROM ac
        ),
        frk AS (
            SELECT *, row_number() OVER (PARTITION BY series_id
                ORDER BY zone DESC, cac ASC, p ASC) AS r
            FROM cc
        )
        SELECT series_id, cast(p AS int) AS p, arcs, cac,
               (zone AND r = 1) AS is_boundary
        FROM frk
    """

    # q170 (r6): 2-regime Viterbi — integer-micro DP with candidate paths
    # carried in the recursion state; ties prefer staying / the low state
    _vs = int(round(500.0 * 1_000_000))
    out["q170_viterbi_regimes"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        vbase AS (
            SELECT series_id, features AS f,
                   list_reduce(list_prepend(cast('infinity' AS double),
                       features), (x, y) -> least(x, y)) AS mn,
                   list_reduce(list_prepend(cast('-infinity' AS double),
                       features), (x, y) -> greatest(x, y)) AS mx
            FROM series WHERE len(features) >= 1
        ),
        mus AS (
            SELECT series_id, f,
                   mn + (mx - mn) / 4.0 AS mlo,
                   mx - (mx - mn) / 4.0 AS mhi
            FROM vbase
        ),
        dp AS (
            SELECT series_id, f, mlo, mhi, 0 AS t,
                   cast(0 AS bigint) AS dlo, cast(0 AS bigint) AS dhi,
                   cast([] AS integer[]) AS plo, cast([] AS integer[]) AS phi
            FROM mus
            UNION ALL
            SELECT series_id, f, mlo, mhi, t + 1,
                   cast(round((f[t+1] - mlo) * (f[t+1] - mlo) * 1000000.0)
                        AS bigint) + least(dlo, dhi + {_vs}),
                   cast(round((f[t+1] - mhi) * (f[t+1] - mhi) * 1000000.0)
                        AS bigint) + least(dhi, dlo + {_vs}),
                   list_append(CASE WHEN dlo <= dhi + {_vs} THEN plo
                                    ELSE phi END, 0),
                   list_append(CASE WHEN dhi <= dlo + {_vs} THEN phi
                                    ELSE plo END, 1)
            FROM dp WHERE t < len(f)
        ),
        fin AS (
            SELECT series_id, f,
                   CASE WHEN dlo <= dhi THEN plo ELSE phi END AS path
            FROM dp WHERE t = len(f)
        ),
        ex AS (
            SELECT series_id, f, path,
                   unnest(range(1, len(f) + 1)) AS tt
            FROM fin
        )
        SELECT series_id, cast(tt AS int) AS t, path[tt] AS regime,
               f[tt] AS value
        FROM ex
    """

    # q169 (r6): split-conformal KNN — joins + MIN aggregates + integer
    # rank counts + one division; p-values are exact rationals
    def _cq_d(a: str, b: str) -> str:
        return (
            f"sqrt(list_reduce(list_transform(range(1, len({a}) + 1),"
            f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y))"
        )

    out["q169_conformal_knn"] = f"""
        WITH {_SERIES_CTE},
        proper AS (
            SELECT series_id AS pid, features AS pf, label AS plab
            FROM train WHERE series_id % 3 != 1
        ),
        cal AS (
            SELECT series_id AS cid, features AS cf, label AS clab
            FROM train WHERE series_id % 3 = 1
        ),
        cpairs AS (
            SELECT c.cid, c.clab, p.plab, {_cq_d("c.cf", "p.pf")} AS d
            FROM cal c CROSS JOIN proper p
        ),
        cmin AS (
            SELECT cid, clab, plab, min(d) AS dmin
            FROM cpairs WHERE d != 0 GROUP BY cid, clab, plab
        ),
        csame AS (SELECT cid, dmin AS ds FROM cmin WHERE plab = clab),
        cdiff AS (
            SELECT cid, min(dmin) AS dd FROM cmin
            WHERE plab != clab GROUP BY cid
        ),
        alphas AS (
            SELECT s.ds / d.dd AS ai FROM csame s JOIN cdiff d USING (cid)
        ),
        nc AS (SELECT cast(count(*) AS bigint) AS ncal FROM alphas),
        tpairs AS (
            SELECT t.series_id AS test_id, p.plab,
                   {_cq_d("t.features", "p.pf")} AS d
            FROM test t CROSS JOIN proper p
        ),
        tmin AS (
            SELECT test_id, plab, min(d) AS dmin
            FROM tpairs WHERE d != 0 GROUP BY test_id, plab
        ),
        tdiff AS (
            SELECT a.test_id, a.plab AS label, min(b.dmin) AS dd
            FROM tmin a JOIN tmin b
              ON a.test_id = b.test_id AND a.plab != b.plab
            GROUP BY a.test_id, a.plab
        ),
        axy AS (
            SELECT m.test_id, m.plab AS label, m.dmin / d.dd AS alpha
            FROM tmin m JOIN tdiff d
              ON m.test_id = d.test_id AND m.plab = d.label
        ),
        cnt AS (
            SELECT test_id, label, alpha,
                   cast(count(a.ai) AS bigint) AS ge
            FROM axy LEFT JOIN alphas a ON a.ai >= axy.alpha
            GROUP BY test_id, label, alpha
        )
        SELECT test_id, label, alpha,
               cast(ge + 1 AS double) / cast(ncal + 1 AS double) AS p_value
        FROM cnt CROSS JOIN nc
    """

    # q168 (r6): periodogram — the SAME numpy-computed twiddle literals the
    # Spark plan uses (periodogram_twiddles), folded identically; engines
    # never call their own cos/sin
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        periodogram_twiddles as _ptw,
    )

    def _pg_fold(table):
        lits = "[" + ", ".join(repr(c) for c in table) + "]"
        return (
            "list_reduce(list_prepend(0.0, list_transform("
            f"range(1, {SERIES_LEN} + 1), t -> f[t] * ({lits})[t])), "
            "(a, v) -> a + v)"
        )

    _pg = _ptw(SERIES_LEN)
    _pg_sums = ",\n                   ".join(
        f"{_pg_fold(cs)} AS re{k}, {_pg_fold(sn)} AS im{k}" for k, cs, sn in _pg
    )
    _pg_ps = ", ".join(f"re{k} * re{k} + im{k} * im{k} AS p{k}" for k, _, _ in _pg)
    _pg_arr = "[" + ", ".join(f"p{k}" for k, _, _ in _pg) + "]"
    _pg_pos = (
        f"list_position({_pg_arr}, "
        f"list_reduce({_pg_arr}, (x, y) -> greatest(x, y)))"
    )
    out["q168_periodogram"] = f"""
        WITH {_SERIES_CTE},
        base AS (
            SELECT series_id, features AS f FROM series
            WHERE len(features) = {SERIES_LEN}
        ),
        sums AS (
            SELECT series_id,
                   {_pg_sums}
            FROM base
        ),
        ps AS (SELECT series_id, {_pg_ps} FROM sums)
        SELECT series_id, {", ".join(f"p{k}" for k, _, _ in _pg)},
               cast({_pg_pos} AS int) AS dom_freq,
               {float(SERIES_LEN)!r} / cast({_pg_pos} AS double) AS dom_period
        FROM ps
    """

    # q187 (r6): streaming drift twin — epoch-aligned day windows, per-bin
    # conditional sums, the q184 divergence as an ordered 16-term fold
    def _sd_contrib(i: int) -> str:
        p = f"(cast(c{i} AS double) / cast(n AS double))"
        q = f"(cast(r{i} AS double) / cast(rn AS double))"
        return (
            f"CASE WHEN ({p} + {q}) != 0 THEN"
            f" ({p} - {q}) * ({p} - {q}) / ({p} + {q}) ELSE 0.0 END"
        )

    _sd_rpv = ", ".join(
        f"cast(coalesce(max(CASE WHEN bin = {i} THEN rc END), 0) AS bigint)"
        f" AS r{i}"
        for i in range(16)
    )
    _sd_cs = ",\n                   ".join(
        f"cast(sum(CASE WHEN bin = {i} THEN 1 ELSE 0 END) AS bigint) AS c{i}"
        for i in range(16)
    )
    _sd_arr = "[" + ", ".join(_sd_contrib(i) for i in range(16)) + "]"
    out["q187_stream_drift_twin"] = f"""
        WITH sdev AS (
            SELECT epoch_us(ts) AS t,
                   cast(least(floor(value / 25.0), 15) AS int) AS bin
            FROM events
        ),
        sdref AS (
            SELECT bin, cast(count(*) AS bigint) AS rc
            FROM sdev WHERE t < 1705363200000000 GROUP BY bin
        ),
        sdrpv AS (
            SELECT {_sd_rpv}, cast(sum(rc) AS bigint) AS rn FROM sdref
        ),
        sdwin AS (
            SELECT t // 86400000000 AS day,
                   {_sd_cs},
                   cast(count(*) AS bigint) AS n
            FROM sdev GROUP BY day
        )
        SELECT make_timestamp(day * 86400000000) AS window_start,
               make_timestamp((day + 1) * 86400000000) AS window_end,
               n AS n_events,
               list_reduce(list_prepend(0.0, {_sd_arr}),
                           (a, v) -> a + v) AS drift_stat
        FROM sdwin CROSS JOIN sdrpv
    """

    # q186 (r6): SampEn counts — nested integer folds (the mann_kendall
    # shape), exact rational ratio
    def _se_cnt(last: str, extra: bool) -> str:
        third = (
            " AND abs(f[i+2] - f[j+2]) <= 10.0" if extra else ""
        )
        return f"""CASE WHEN {last} >= 2 THEN
            list_reduce(list_prepend(cast(0 AS bigint),
                list_transform(range(1, {last}), i ->
                    list_reduce(list_prepend(cast(0 AS bigint),
                        list_transform(range(i + 1, {last} + 1), j ->
                            cast(CASE WHEN abs(f[i] - f[j]) <= 10.0
                                       AND abs(f[i+1] - f[j+1]) <= 10.0{third}
                                  THEN 1 ELSE 0 END AS bigint))),
                        (a, v) -> a + v))),
                (a, v) -> a + v)
        ELSE cast(0 AS bigint) END"""

    out["q186_sampen_counts"] = f"""
        WITH {_SERIES_CTE},
        sbase AS (
            SELECT series_id, features AS f, len(features) AS n FROM series
        ),
        sc AS (
            SELECT series_id,
                   CASE WHEN n >= 3 THEN {_se_cnt("(n - 1)", False)}
                        ELSE cast(0 AS bigint) END AS b_count,
                   CASE WHEN n >= 4 THEN {_se_cnt("(n - 2)", True)}
                        ELSE cast(0 AS bigint) END AS a_count
            FROM sbase
        )
        SELECT series_id, b_count, a_count,
               CASE WHEN b_count > 0 THEN
                   cast(a_count AS double) / cast(b_count AS double)
               END AS match_ratio
        FROM sc
    """

    # q185 (r6): MSM — DP starts at (1,1) (no zero boundary), so this
    # recursion inits at i=1 instead of the _edit_knn_sql i=0 template;
    # the c literal folds in Python (repr round-trip)
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.edit_distance import (
        MSM_C as _MSM_C,
    )

    def _msm_c_sql(x: str, y: str, z: str) -> str:
        c = repr(float(_MSM_C))
        return (
            f"(CASE WHEN ({y} <= {x} AND {x} <= {z})"
            f" OR ({y} >= {x} AND {x} >= {z}) THEN {c}"
            f" ELSE {c} + least(abs({x} - {y}), abs({x} - {z})) END)"
        )

    out["q185_knn_msm"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        mpairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM test t CROSS JOIN train r
        ),
        mdp AS (
            SELECT test_id, train_id, train_label, fa, fb, 1 AS i,
                   list_reduce(
                       list_prepend([abs(fa[1] - fb[1])],
                           list_transform(range(2, len(fb) + 1),
                               j -> [{_msm_c_sql("fb[j]", "fb[j-1]", "fa[1]")}])),
                       (acc, e) -> list_append(acc, acc[-1] + e[1])) AS row
            FROM mpairs
            UNION ALL
            SELECT test_id, train_id, train_label, fa, fb, i + 1,
                   list_reduce(
                       list_prepend(
                           [row[1] + {_msm_c_sql("fa[i+1]", "fa[i]", "fb[1]")}],
                           list_transform(range(2, len(fb) + 1),
                               j -> [abs(fa[i+1] - fb[j]), row[j-1], row[j],
                                     {_msm_c_sql("fa[i+1]", "fa[i]", "fb[j]")},
                                     {_msm_c_sql("fb[j]", "fb[j-1]", "fa[i+1]")}])),
                       (acc, e) -> list_append(acc,
                           least(e[2] + e[1], e[3] + e[4],
                                 acc[-1] + e[5]))) AS row
            FROM mdp WHERE i < len(fa)
        ),
        mdd AS (
            SELECT test_id, train_id, train_label, row[-1] AS dist
            FROM mdp WHERE i = len(fa)
        ),
        mrk AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY dist ASC, train_label ASC, train_id ASC) AS rank
            FROM mdd WHERE dist != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank,
               dist AS distance
        FROM mrk WHERE rank <= 3
    """

    # q184 (r6): drift detection — exact-median split, integer bin counts,
    # chi-square-shaped divergence with a bin-ordered fold
    _dd_p = "cast(ce AS double) / cast(te AS double)"
    _dd_q = "cast(cl AS double) / cast(tl AS double)"
    out["q184_drift_detect"] = f"""
        WITH ev AS (SELECT epoch_us(ts) AS t, value AS v FROM events),
        md AS (SELECT quantile_cont(t, 0.5) AS mid FROM ev),
        binned AS (
            SELECT CASE WHEN cast(t AS double) <= mid THEN 0 ELSE 1 END AS half,
                   cast(least(floor(v / 25.0), 15) AS int) AS bin
            FROM ev CROSS JOIN md
        ),
        g AS (
            SELECT bin,
                   cast(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                        AS bigint) AS ce,
                   cast(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                        AS bigint) AS cl
            FROM binned GROUP BY bin
        ),
        tt AS (
            SELECT cast(sum(ce) AS bigint) AS te,
                   cast(sum(cl) AS bigint) AS tl
            FROM g
        ),
        per AS (
            SELECT bin, te, tl,
                   ({_dd_p} - {_dd_q}) * ({_dd_p} - {_dd_q})
                   / ({_dd_p} + {_dd_q}) AS c
            FROM g CROSS JOIN tt
        ),
        arr AS (
            SELECT te, tl, list(c ORDER BY bin) AS cs,
                   list(bin ORDER BY bin) AS bs
            FROM per GROUP BY te, tl
        )
        SELECT te AS n_early, tl AS n_late,
               list_reduce(list_prepend(0.0, cs), (a, v) -> a + v)
                 AS drift_stat,
               bs[list_position(cs,
                   list_reduce(cs, (x, y) -> greatest(x, y)))] AS top_bin
        FROM arr
    """

    # q183 (r6): early classification — q12's chain per prefix length,
    # distance folds over the first p coordinates
    def _ec_block(p: int) -> str:
        sq = (
            f"list_reduce(list_transform(range(1, {p} + 1),"
            " i -> (t.features[i]-r.features[i])*(t.features[i]-r.features[i])),"
            " (x,y) -> x+y)"
        )
        return f"""epairs{p} AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, {sq} AS d
            FROM test t CROSS JOIN train r
        ),
        eranked{p} AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
            FROM epairs{p} WHERE d != 0
        ),
        etopk{p} AS (SELECT * FROM eranked{p} WHERE rank <= 5),
        evotes{p} AS (
            SELECT test_id, train_label, count(*) AS votes,
                   min(rank) AS best_rank
            FROM etopk{p} GROUP BY test_id, train_label
        ),
        esel{p} AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY votes DESC, best_rank ASC, train_label ASC) AS vrk
            FROM evotes{p}
        ),
        eacc{p} AS (
            SELECT cast({p} AS int) AS prefix_len,
                   count(*) AS n_rows,
                   cast(sum(cast(p.train_label = t.label AS bigint))
                        AS bigint) AS n_correct,
                   avg(cast(p.train_label = t.label AS double)) AS accuracy
            FROM (SELECT test_id, train_label FROM esel{p} WHERE vrk = 1) p
            JOIN test t ON p.test_id = t.series_id
        )"""

    out["q183_early_classification"] = f"""
        WITH {_SERIES_CTE},
        {", ".join(_ec_block(p) for p in (4, 8, 12, 16))}
        SELECT * FROM eacc4
        UNION ALL SELECT * FROM eacc8
        UNION ALL SELECT * FROM eacc12
        UNION ALL SELECT * FROM eacc16
    """

    # q182 (r6): label lead-lag — integer-micro group means (order-free)
    # + the q159 sbd_align fold mirror over label pairs
    out["q182_label_leadlag"] = f"""
        WITH {_SERIES_CTE},
        lex AS (
            SELECT label, f, unnest(range(1, len(f) + 1)) AS t
            FROM (SELECT label, features AS f FROM series)
        ),
        lg AS (
            SELECT label, t,
                   cast(sum(cast(round(f[t] * 1000000.0) AS bigint))
                        AS bigint) AS sm,
                   cast(count(*) AS bigint) AS c
            FROM lex GROUP BY label, t
        ),
        lm AS (
            SELECT label,
                   list((cast(sm AS double) / cast(c AS double)) / 1000000.0
                        ORDER BY t) AS mf
            FROM lg GROUP BY label
        ),
        lp AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   a.mf AS fa, b.mf AS fb
            FROM lm a JOIN lm b ON a.label < b.label
        ),
        lsc AS (
            SELECT label_a, label_b,
                   CASE WHEN nrm = 0 THEN 1.0
                        ELSE 1.0 - list_reduce(cc, (x, y) -> greatest(x, y))
                                   / nrm
                   END AS d,
                   CASE WHEN nrm = 0 THEN 0
                        ELSE cast(list_position(cc,
                                 list_reduce(cc, (x, y) -> greatest(x, y)))
                             - len(fa) AS int)
                   END AS lag
            FROM (
                SELECT *,
                       sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fa, x -> x * x)), (x, y) -> x + y))
                     * sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fb, x -> x * x)), (x, y) -> x + y))
                       AS nrm,
                       list_transform(range(1 - len(fa), len(fa)), s ->
                           list_reduce(list_prepend(0.0,
                               list_transform(range(1, len(fa) - abs(s) + 1),
                                   t -> fa[t + greatest(s, 0)]
                                        * fb[t - least(s, 0)])),
                               (x, y) -> x + y)) AS cc
                FROM lp
            )
        )
        SELECT label_a, label_b, lag, round(d, 6) AS sbd FROM lsc
    """

    # q181 (r6): complexity features — ascending folds, lag guards
    out["q181_complexity_features"] = f"""
        WITH {_SERIES_CTE}
        SELECT series_id,
               list_reduce(list_prepend(0.0,
                   list_transform(features, v -> v * v)),
                   (a, v) -> a + v) AS abs_energy,
               sqrt(CASE WHEN len(features) >= 2 THEN
                   list_reduce(list_prepend(0.0,
                       list_transform(range(2, len(features) + 1),
                           t -> (features[t] - features[t-1])
                                * (features[t] - features[t-1]))),
                       (a, v) -> a + v)
               ELSE 0.0 END) AS cid,
               CASE WHEN len(features) >= 3 THEN
                   list_reduce(list_prepend(0.0,
                       list_transform(range(1, len(features) - 1),
                           t -> features[t] * features[t+1] * features[t+2])),
                       (a, v) -> a + v)
                   / cast(len(features) - 2 AS double)
               END AS c3,
               CASE WHEN len(features) >= 2 THEN
                   list_reduce(list_prepend(0.0,
                       list_transform(range(1, len(features)),
                           t -> (features[t+1] - features[t])
                                * (features[t+1] - features[t])
                                * (features[t+1] - features[t]))),
                       (a, v) -> a + v)
                   / cast(len(features) - 1 AS double)
               END AS trev
        FROM series
    """

    # q179 (r6): ordinal patterns — stable lt() comparisons, integer
    # counts, Gini diversity as exact rationals
    _pp_lt = (
        "(CASE WHEN features[{i}] < features[{j}]"
        " OR (features[{i}] = features[{j}] AND {i} < {j})"
        " THEN 1 ELSE 0 END)"
    )
    _pp_code = (
        _pp_lt.format(i="t", j="t + 1") + " * 4 + "
        + _pp_lt.format(i="t", j="t + 2") + " * 2 + "
        + _pp_lt.format(i="t + 1", j="t + 2")
    )
    _pp_cnt = (
        "cast(coalesce(len(list_filter(codes, v -> v = {k})), 0) AS bigint)"
    )
    out["q179_permutation_patterns"] = f"""
        WITH {_SERIES_CTE},
        pb AS (
            SELECT series_id,
                   CASE WHEN len(features) >= 3 THEN
                       list_transform(range(1, len(features) - 1),
                           t -> {_pp_code})
                   END AS codes
            FROM series
        )
        SELECT series_id,
               cast(coalesce(len(codes), 0) AS int) AS n_windows,
               {", ".join(_pp_cnt.format(k=k) + f" AS c{k}" for k in range(8))},
               CASE WHEN codes IS NOT NULL THEN
                   1.0 - list_reduce(list_prepend(0.0,
                       list_transform(range(0, 8), k ->
                           (cast(len(list_filter(codes, v -> v = k)) AS double)
                            / cast(len(codes) AS double))
                           * (cast(len(list_filter(codes, v -> v = k)) AS double)
                              / cast(len(codes) AS double)))),
                       (a, v) -> a + v)
               END AS gini
        FROM pb
    """

    # q177 (r6): Haar pyramid — recursive halving CTE carrying
    # (avg list, energy list); pure adds/halvings + ascending folds
    out["q177_haar_features"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        hbase AS (
            SELECT series_id, features[1 : 16] AS f
            FROM series WHERE len(features) >= 16
        ),
        hdp AS (
            SELECT series_id, 0 AS lvl, f AS avg,
                   cast([] AS double[]) AS en
            FROM hbase
            UNION ALL
            SELECT series_id, lvl + 1,
                   list_transform(range(1, len(avg) // 2 + 1),
                       i -> (avg[2*i - 1] + avg[2*i]) / 2.0),
                   list_append(en,
                       list_reduce(list_prepend(0.0,
                           list_transform(range(1, len(avg) // 2 + 1),
                               i -> ((avg[2*i - 1] - avg[2*i]) / 2.0)
                                    * ((avg[2*i - 1] - avg[2*i]) / 2.0))),
                           (s, v) -> s + v))
            FROM hdp WHERE lvl < 4
        )
        SELECT series_id, avg[1] AS approx,
               en[1] AS e1, en[2] AS e2, en[3] AS e3, en[4] AS e4
        FROM hdp WHERE lvl = 4
    """

    # q176 (r6): Durbin-Levinson PACF — the q167 acf folds feeding a
    # recursive CTE that carries (phi row, pacf list); pk's expression is
    # duplicated per use (identical value DAG, the engine does the same)
    _dl_s1 = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, k + 1),"
        " j -> phi[j] * a[k + 1 - j])), (s, v) -> s + v)"
    )
    _dl_s2 = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, k + 1),"
        " j -> phi[j] * a[j])), (s, v) -> s + v)"
    )
    _dl_pk = f"((a[k + 1] - {_dl_s1}) / (1.0 - {_dl_s2}))"
    _pacf_c = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, n - l + 1),"
        " t -> (f[t] - m) * (f[t + l] - m))), (x, v) -> x + v)"
    )
    out["q176_pacf"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        pbase AS (
            SELECT series_id, features AS f, len(features) AS n,
                   list_reduce(list_prepend(0.0, features), (a, v) -> a + v)
                     / cast(len(features) AS double) AS m
            FROM series
        ),
        pstt AS (
            SELECT series_id, f, n, m,
                   list_reduce(list_prepend(0.0,
                       list_transform(f, v -> (v - m) * (v - m))),
                       (a, v) -> a + v) AS c0
            FROM pbase
        ),
        par AS (
            SELECT series_id,
                   CASE WHEN n > 8 AND c0 != 0 THEN
                       list_transform(range(1, 9), l -> {_pacf_c} / c0)
                   END AS a
            FROM pstt
        ),
        pdp AS (
            SELECT series_id, a, 1 AS k,
                   [a[1]] AS phi, [a[1]] AS pac
            FROM par WHERE a IS NOT NULL
            UNION ALL
            SELECT series_id, a, k + 1,
                   list_append(list_transform(range(1, k + 1),
                       j -> phi[j] - {_dl_pk} * phi[k + 1 - j]), {_dl_pk}),
                   list_append(pac, {_dl_pk})
            FROM pdp WHERE k < 8
        )
        SELECT p.series_id,
               {", ".join(f"d.pac[{k}] AS pacf{k}" for k in range(1, 9))}
        FROM par p LEFT JOIN (SELECT series_id, pac FROM pdp WHERE k = 8) d
          USING (series_id)
    """

    # q175 (r6): Holt holdout backtest — q151's recurrence on the train
    # head + elementwise error folds, exact divisions, one sqrt
    out["q175_forecast_backtest"] = f"""
        WITH {_SERIES_CTE},
        fb AS (
            SELECT series_id,
                   features[1 : len(features) - 4] AS head,
                   features[len(features) - 3 :] AS act
            FROM series WHERE len(features) >= 6
        ),
        fst AS (
            SELECT series_id, head, act,
                   list_reduce(
                       list_prepend([head[2], head[2] - head[1]],
                           list_transform(head[3:], x -> [x, 0.0])),
                       (acc, e) -> [
                           0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                           0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                                   - acc[1]) + 0.75 * acc[2]
                       ]) AS s
            FROM fb
        ),
        ffc AS (
            SELECT series_id, head, act,
                   [s[1] + 1.0 * s[2], s[1] + 2.0 * s[2],
                    s[1] + 3.0 * s[2], s[1] + 4.0 * s[2]] AS fc
            FROM fst
        ),
        fm AS (
            SELECT series_id,
                   list_reduce(list_prepend(0.0, list_transform(range(1, 5),
                       h -> abs(fc[h] - act[h]))), (a, v) -> a + v) / 4.0
                     AS mae,
                   sqrt(list_reduce(list_prepend(0.0,
                       list_transform(range(1, 5),
                           h -> (fc[h] - act[h]) * (fc[h] - act[h]))),
                       (a, v) -> a + v) / 4.0) AS rmse,
                   list_reduce(list_prepend(0.0,
                       list_transform(act, a -> abs(head[-1] - a))),
                       (a, v) -> a + v) / 4.0 AS mae_naive,
                   list_reduce(list_prepend(0.0,
                       list_transform(range(2, len(head) + 1),
                           t -> abs(head[t] - head[t - 1]))),
                       (a, v) -> a + v)
                     / cast(len(head) - 1 AS double) AS insample
            FROM ffc
        )
        SELECT series_id, mae, rmse, mae_naive,
               CASE WHEN insample != 0 THEN mae / insample END AS mase
        FROM fm
    """

    # q174 (r6): SFA words — the q168 twiddle folds micro-rounded, MCB
    # quartile edges via quantile_cont == percentile on integer input
    # (q36), digit concat in dimension order
    _sfa_dims = []
    for _i, (_k, _cs, _sn) in enumerate(_pg[:4]):
        _sfa_dims.append((2 * _i, _cs))
        _sfa_dims.append((2 * _i + 1, _sn))
    _sfa_co = ",\n                   ".join(
        f"cast(round(({_pg_fold(tab)}) * 1000000.0) AS bigint) AS cm{d}"
        for d, tab in _sfa_dims
    )
    _sfa_long = "\n            UNION ALL ".join(
        f"SELECT series_id, {d} AS dim, cm{d} AS cm FROM sfaco"
        for d, _ in _sfa_dims
    )
    out["q174_sfa_words"] = f"""
        WITH {_SERIES_CTE},
        sfabase AS (
            SELECT series_id, features AS f FROM series
            WHERE len(features) = {SERIES_LEN}
        ),
        sfaco AS (
            SELECT series_id,
                   {_sfa_co}
            FROM sfabase
        ),
        sfalong AS (
            {_sfa_long}
        ),
        sfaedges AS (
            SELECT dim, quantile_cont(cm, 0.25) AS e1,
                   quantile_cont(cm, 0.5) AS e2,
                   quantile_cont(cm, 0.75) AS e3
            FROM sfalong GROUP BY dim
        ),
        sfasym AS (
            SELECT l.series_id, l.dim,
                   CASE WHEN cast(l.cm AS double) <= e.e1 THEN 0
                        WHEN cast(l.cm AS double) <= e.e2 THEN 1
                        WHEN cast(l.cm AS double) <= e.e3 THEN 2
                        ELSE 3 END AS s
            FROM sfalong l JOIN sfaedges e ON l.dim = e.dim
        )
        SELECT series_id,
               string_agg(cast(s AS varchar), '' ORDER BY dim) AS sfa_word
        FROM sfasym GROUP BY series_id
    """

    # q180 (r6): BOSS — SFA window words with TRAIN-learned MCB edges,
    # numerosity reduction, asymmetric integer distance; every float
    # crossing micro-rounds before a decision
    _bs_tabs = []
    for _i, (_k, _cs, _sn) in enumerate(_ptw(8, 2)):
        _bs_tabs.append((2 * _i, _cs))
        _bs_tabs.append((2 * _i + 1, _sn))

    def _bs_cm(tab) -> str:
        lits = "[" + ", ".join(repr(c) for c in tab) + "]"
        return (
            "cast(round((list_reduce(list_prepend(0.0, "
            "list_transform(range(1, 9), "
            f"t -> f[s + t - 1] * ({lits})[t])), (a, v) -> a + v))"
            " * 1000000.0) AS bigint)"
        )

    _bs_dims_sql = "\n            UNION ALL ".join(
        f"SELECT {d} AS dim, {_bs_cm(tab)} AS cm FROM bwin"
        for d, tab in _bs_tabs
    )
    _bs_piv = ", ".join(
        f"max(CASE WHEN dim = {d} THEN {q} END) AS {q}_{d}"
        for d, _ in _bs_tabs
        for q in ("e1", "e2", "e3")
    )
    _bs_word = " || ".join(
        f"(CASE WHEN cast({_bs_cm(tab)} AS double) <= e1_{d} THEN '0'"
        f" WHEN cast({_bs_cm(tab)} AS double) <= e2_{d} THEN '1'"
        f" WHEN cast({_bs_cm(tab)} AS double) <= e3_{d} THEN '2'"
        f" ELSE '3' END)"
        for d, tab in _bs_tabs
    )
    out["q180_boss_classify"] = f"""
        WITH {_SERIES_CTE},
        bwin AS (
            SELECT features AS f,
                   unnest(range(1, len(features) - 8 + 2)) AS s
            FROM train WHERE len(features) >= 8
        ),
        bdims AS (
            {_bs_dims_sql}
        ),
        bedges AS (
            SELECT dim, quantile_cont(cm, 0.25) AS e1,
                   quantile_cont(cm, 0.5) AS e2,
                   quantile_cont(cm, 0.75) AS e3
            FROM bdims GROUP BY dim
        ),
        bpv AS (SELECT {_bs_piv} FROM bedges),
        bwt AS (
            SELECT t.series_id AS sid, t.features AS f FROM test t
        ),
        bwr AS (
            SELECT r.series_id AS sid, r.label AS lbl, r.features AS f
            FROM train r
        ),
        bwords_t AS (
            SELECT sid, list_transform(range(1, len(f) - 8 + 2),
                       s -> {_bs_word}) AS words
            FROM bwt CROSS JOIN bpv
        ),
        bwords_r AS (
            SELECT sid, lbl, list_transform(range(1, len(f) - 8 + 2),
                       s -> {_bs_word}) AS words
            FROM bwr CROSS JOIN bpv
        ),
        bnr_t AS (
            SELECT sid, list_filter(list_transform(range(1, len(words) + 1),
                       i -> CASE WHEN i = 1 OR words[i] != words[i - 1]
                                 THEN words[i] END),
                       x -> x IS NOT NULL) AS words
            FROM bwords_t
        ),
        bnr_r AS (
            SELECT sid, lbl,
                   list_filter(list_transform(range(1, len(words) + 1),
                       i -> CASE WHEN i = 1 OR words[i] != words[i - 1]
                                 THEN words[i] END),
                       x -> x IS NOT NULL) AS words
            FROM bwords_r
        ),
        bh_t AS (
            SELECT sid, word, cast(count(*) AS bigint) AS cnt
            FROM (SELECT sid, unnest(words) AS word FROM bnr_t)
            GROUP BY sid, word
        ),
        bh_r AS (
            SELECT sid, lbl, word, cast(count(*) AS bigint) AS cnt
            FROM (SELECT sid, lbl, unnest(words) AS word FROM bnr_r)
            GROUP BY sid, lbl, word
        ),
        btn2 AS (
            SELECT sid AS test_id, cast(sum(cnt * cnt) AS bigint) AS n2
            FROM bh_t GROUP BY sid
        ),
        bdots AS (
            SELECT t.sid AS test_id, r.sid AS train_id,
                   cast(sum(t.cnt * r.cnt) AS bigint) AS dot,
                   cast(sum(r.cnt * r.cnt) AS bigint) AS b2
            FROM bh_t t JOIN bh_r r USING (word)
            GROUP BY t.sid, r.sid
        ),
        brl AS (SELECT DISTINCT sid AS train_id, lbl AS train_label FROM bh_r),
        bprs AS (
            SELECT n.test_id, l.train_id, l.train_label,
                   cast(n.n2 - 2 * coalesce(d.dot, 0)
                        + coalesce(d.b2, 0) AS bigint) AS dd
            FROM btn2 n CROSS JOIN brl l
            LEFT JOIN bdots d
              ON d.test_id = n.test_id AND d.train_id = l.train_id
        ),
        bsel AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY dd ASC, train_label ASC, train_id ASC) AS rk
            FROM bprs
        )
        SELECT test_id, train_label AS predicted_label,
               dd AS boss_distance
        FROM bsel WHERE rk = 1
    """

    # q167 (r6): ACF + dominant lag — mean/variance/covariance ascending
    # folds, one IEEE division per lag, first-match argmax; NULL design
    # keeps NaN max/position semantics out of the hash
    out["q167_acf_dominant_lag"] = f"""
        WITH {_SERIES_CTE},
        base AS (
            SELECT series_id, features AS f, len(features) AS n,
                   list_reduce(list_prepend(0.0, features), (a, v) -> a + v)
                     / cast(len(features) AS double) AS m
            FROM series
        ),
        st AS (
            SELECT series_id, f, n, m,
                   list_reduce(list_prepend(0.0,
                       list_transform(f, v -> (v - m) * (v - m))),
                       (a, v) -> a + v) AS c0,
                   least(8, n - 1) AS L
            FROM base
        ),
        ar AS (
            SELECT series_id, n, c0, L,
                   CASE WHEN n >= 2 AND c0 != 0 THEN
                       list_transform(range(1, L + 1), l ->
                           list_reduce(list_prepend(0.0,
                               list_transform(range(1, n - l + 1),
                                   t -> (f[t] - m) * (f[t + l] - m))),
                               (a, v) -> a + v) / c0)
                   END AS arr
            FROM st
        )
        SELECT series_id,
               {", ".join(f"CASE WHEN {lag} <= L THEN arr[{lag}] END AS acf{lag}" for lag in range(1, 9))},
               CASE WHEN arr IS NOT NULL THEN
                   cast(list_position(arr,
                       list_reduce(arr, (x, y) -> greatest(x, y))) AS int)
               END AS dom_lag
        FROM ar
    """

    # q159 (r6): q142's bit-exact SBD fold mirror + list_position argmax
    # (first match — same tie rule as F.array_position) for the lag
    out["q159_sbd_1nn_lag"] = f"""
        WITH {_SERIES_CTE},
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM test t CROSS JOIN train r
        ),
        scored AS (
            SELECT test_id, train_id, train_label,
                   CASE WHEN nrm = 0 THEN 1.0
                        ELSE 1.0 - list_reduce(cc, (x, y) -> greatest(x, y))
                                   / nrm
                   END AS d,
                   CASE WHEN nrm = 0 THEN 0
                        ELSE cast(list_position(cc,
                                 list_reduce(cc, (x, y) -> greatest(x, y)))
                             - len(fa) AS int)
                   END AS lag
            FROM (
                SELECT *,
                       sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fa, x -> x * x)), (x, y) -> x + y))
                     * sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fb, x -> x * x)), (x, y) -> x + y))
                       AS nrm,
                       list_transform(range(1 - len(fa), len(fa)), s ->
                           list_reduce(list_prepend(0.0,
                               list_transform(range(1, len(fa) - abs(s) + 1),
                                   t -> fa[t + greatest(s, 0)]
                                        * fb[t - least(s, 0)])),
                               (x, y) -> x + y)) AS cc
                FROM pairs
            )
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
            FROM scored WHERE d != 0
        )
        SELECT test_id, train_id, lag, round(d, 6) AS sbd
        FROM ranked WHERE rank = 1
    """

    # q158 (r6): AR(2) normal equations — each sum its own ascending left
    # fold (bit-equal to the Spark 8-state fold: same per-element products,
    # same accumulation order), then the identical Cramer expression tree
    _arf = lambda expr: (
        "list_reduce(list_prepend(0.0, list_transform(range(3, n + 1), "
        f"t -> {expr})), (a, v) -> a + v)"
    )
    out["q158_ar_forecast"] = f"""
        WITH {_SERIES_CTE},
        sums AS (
            SELECT series_id, features AS f, len(features) AS n,
                   {_arf("f[t - 1]")} AS s1,
                   {_arf("f[t - 2]")} AS s2,
                   {_arf("f[t - 1] * f[t - 1]")} AS s11,
                   {_arf("f[t - 2] * f[t - 2]")} AS s22,
                   {_arf("f[t - 1] * f[t - 2]")} AS s12,
                   {_arf("f[t]")} AS sy,
                   {_arf("f[t] * f[t - 1]")} AS sy1,
                   {_arf("f[t] * f[t - 2]")} AS sy2
            FROM series
        ),
        dets AS (
            SELECT *, cast(n - 2 AS double) AS s0,
                   cast(n - 2 AS double) * (s11 * s22 - s12 * s12)
                     - s1 * (s1 * s22 - s12 * s2)
                     + s2 * (s1 * s12 - s11 * s2) AS det,
                   sy * (s11 * s22 - s12 * s12)
                     - s1 * (sy1 * s22 - s12 * sy2)
                     + s2 * (sy1 * s12 - s11 * sy2) AS det_c,
                   cast(n - 2 AS double) * (sy1 * s22 - s12 * sy2)
                     - sy * (s1 * s22 - s12 * s2)
                     + s2 * (s1 * sy2 - sy1 * s2) AS det_a1,
                   cast(n - 2 AS double) * (s11 * sy2 - sy1 * s12)
                     - s1 * (s1 * sy2 - sy1 * s2)
                     + sy * (s1 * s12 - s11 * s2) AS det_a2
            FROM sums
        ),
        fit AS (
            SELECT series_id, f, n,
                   CASE WHEN n >= 5 AND det != 0.0 THEN det_c / det END AS c,
                   CASE WHEN n >= 5 AND det != 0.0 THEN det_a1 / det END AS a1,
                   CASE WHEN n >= 5 AND det != 0.0 THEN det_a2 / det END AS a2
            FROM dets
        ),
        h1 AS (
            SELECT *, c + a1 * f[n] + a2 * f[n - 1] AS fc_1 FROM fit
        )
        SELECT series_id, c, a1, a2, fc_1,
               c + a1 * fc_1 + a2 * f[n] AS fc_2
        FROM h1
    """

    # q157 (r6): shapelet rule induction — candidate selection (per-label
    # spread-hash top-2, windows of 8 at stride 4), per-(series, candidate)
    # min-subsequence squared distance (ascending-j fold, micro BIGINT),
    # then the q130 stump-argmin machinery over (dim = cand_id - 1, dm)
    out["q157_shapelet_rule"] = f"""
        WITH {_SERIES_CTE},
        tgt AS (
            SELECT label FROM series GROUP BY label
            ORDER BY count(*) DESC, label ASC LIMIT 1
        ),
        picked AS (
            SELECT series_id, label, features FROM (
                SELECT *, row_number() OVER (PARTITION BY label
                    ORDER BY ((series_id % 1000000007) * 654435747 + 40503)
                             % 1000000007 ASC, series_id ASC) AS rk
                FROM series
            ) WHERE rk <= 2
        ),
        cands AS (
            SELECT row_number() OVER (
                       ORDER BY label ASC, source_series_id ASC, start ASC
                   ) AS cand_id,
                   source_series_id, label, start, shapelet
            FROM (
                SELECT series_id AS source_series_id, label,
                       cast(s AS bigint) AS start,
                       features[s : s + 7] AS shapelet
                FROM picked, generate_series(1, {SERIES_LEN} - 8 + 1, 4) g(s)
            )
        ),
        featrows AS (
            SELECT s.series_id, c.cand_id,
                   cast(round(list_min(list_transform(
                       range(1, {SERIES_LEN} - 8 + 2),
                       st -> list_reduce(list_prepend(0.0,
                           list_transform(range(0, 8),
                               j -> (s.features[st + j] - c.shapelet[j + 1])
                                  * (s.features[st + j] - c.shapelet[j + 1]))),
                           (a, v) -> a + v))) * 1000000) AS bigint) AS dm,
                   CASE WHEN s.label = (SELECT label FROM tgt)
                        THEN 1 ELSE -1 END AS y
            FROM series s CROSS JOIN cands c
        ),
        sex AS (SELECT y, cand_id - 1 AS dim, dm AS v FROM featrows),
        spv AS (
            SELECT dim, v,
                   sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS pos,
                   sum(CASE WHEN y < 0 THEN 1 ELSE 0 END) AS neg
            FROM sex GROUP BY dim, v
        ),
        scum AS (
            SELECT dim, v,
                   sum(pos) OVER (PARTITION BY dim ORDER BY v) AS cpos,
                   sum(neg) OVER (PARTITION BY dim ORDER BY v) AS cneg,
                   sum(pos) OVER (PARTITION BY dim) AS p,
                   sum(neg) OVER (PARTITION BY dim) AS n
            FROM spv
        ),
        srules AS (
            SELECT dim, v, 1 AS pol, cneg + p - cpos AS err, p + n AS total
            FROM scum
            UNION ALL
            SELECT dim, v, -1 AS pol, cpos + n - cneg AS err, p + n AS total
            FROM scum
        ),
        sbest AS (
            SELECT * FROM srules
            ORDER BY err ASC, dim ASC, v ASC, pol DESC LIMIT 1
        )
        SELECT cast(c.cand_id AS int) AS cand_id,
               c.source_series_id,
               cast(c.start AS int) AS start,
               cast(8 AS int) AS "window",
               b.v AS threshold_micro,
               b.pol AS polarity,
               cast(b.err AS bigint) AS n_errors,
               cast(b.total AS bigint) AS n_total,
               c.shapelet
        FROM sbest b JOIN cands c ON b.dim + 1 = c.cand_id
    """

    # q116: residual IVF-PQ full replay — coarse kmeans CTEs (lowest-id
    # seeds, the q87/q93 machinery) + residuals + the prefixed PQ chain on
    # residuals + per-(query, cell) ADC tables + shortlist + exact rerank
    out["q116_ann_ivfpq"] = f"""
        WITH {_sql_kmeans_ctes(k=16, seed="spread")},
        resid AS (
            SELECT c.vec_id, a.cluster AS cell,
                   list_transform(range(1, 65), i -> c.v[i] - ct.cv[i]) AS v
            FROM c
            JOIN asn1 a USING (vec_id)
            JOIN cent1 ct ON ct.cluster = a.cluster
        ),
        rsrc AS (SELECT vec_id, v FROM resid),
        {_sql_pq_ctes('rsrc')},
        qpr AS (
            SELECT query_id, cell, qr FROM (
                SELECT c.vec_id AS query_id, ct.cluster AS cell,
                       list_transform(range(1, 65), i -> c.v[i] - ct.cv[i]) AS qr,
                       row_number() OVER (PARTITION BY c.vec_id
                           ORDER BY {_sql_sqd_n('c.v', 'ct.cv', 64)} ASC,
                                    ct.cluster ASC) AS rn
                FROM c CROSS JOIN cent1 ct
                WHERE c.vec_id % 25 = 0
            ) WHERE rn <= 4
        ),
        qdt AS (
            SELECT p.query_id, p.cell, m.m AS subspace, c1.code,
                   {_sql_sqd_n('list_slice(p.qr, m.m*8+1, m.m*8+8)', 'c1.cv', 8)} AS d
            FROM qpr p
            CROSS JOIN (SELECT unnest(range(0, 8)) AS m) m(m)
            JOIN pqcent c1 ON c1.subspace = m.m
        ),
        kc AS (
            SELECT pc.vec_id, pc.subspace, pc.code, r.cell
            FROM pqcodes pc JOIN (SELECT DISTINCT vec_id, cell FROM resid) r
            USING (vec_id)
        ),
        adc AS (
            SELECT q.query_id, k.vec_id AS neighbor_id,
                   list_reduce(list_prepend(0.0, list(q.d ORDER BY q.subspace)),
                               (x, y) -> x + y) AS score
            FROM kc k
            JOIN qdt q ON q.cell = k.cell AND q.subspace = k.subspace
                      AND q.code = k.code
            WHERE q.query_id != k.vec_id
            GROUP BY q.query_id, k.vec_id
        ),
        cand AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                            ORDER BY score ASC, neighbor_id ASC) AS rn
                FROM adc
            ) WHERE rn <= 64
        ),
        exact AS (
            SELECT cand.query_id, cand.neighbor_id,
                   {_sql_sqd_n('qc.v', 'nc.v', 64)} AS e
            FROM cand
            JOIN c qc ON qc.vec_id = cand.query_id
            JOIN c nc ON nc.vec_id = cand.neighbor_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY e ASC, neighbor_id ASC) AS rank
            FROM exact
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(e, 6) AS l2_dist
        FROM ranked WHERE rank <= 5
    """

    # q115: full PQ replay — subspace k-means (hash-ranked spread seeds,
    # int64-micro refit), encode, ordered ADC fold, top-64 shortlist,
    # exact rerank
    out["q115_ann_pq"] = f"""
        WITH c AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        {_sql_pq_ctes('c')},
        qdt AS (
            SELECT s.vec_id AS query_id, s.subspace, c1.code,
                   {_sql_sqd_n('s.sv', 'c1.cv', 8)} AS d
            FROM pqsub s JOIN pqcent c1 USING (subspace)
            WHERE s.vec_id % 25 = 0
        ),
        adc AS (
            SELECT q.query_id, k.vec_id AS neighbor_id,
                   list_reduce(list_prepend(0.0, list(q.d ORDER BY q.subspace)),
                               (x, y) -> x + y) AS score
            FROM pqcodes k
            JOIN qdt q ON q.subspace = k.subspace AND q.code = k.code
            WHERE q.query_id != k.vec_id
            GROUP BY q.query_id, k.vec_id
        ),
        cand AS (
            SELECT query_id, neighbor_id FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                            ORDER BY score ASC, neighbor_id ASC) AS rn
                FROM adc
            ) WHERE rn <= 64
        ),
        exact AS (
            SELECT cand.query_id, cand.neighbor_id,
                   {_sql_sqd_n('qc.v', 'nc.v', 64)} AS e
            FROM cand
            JOIN c qc ON qc.vec_id = cand.query_id
            JOIN c nc ON nc.vec_id = cand.neighbor_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY e ASC, neighbor_id ASC) AS rank
            FROM exact
        )
        SELECT query_id, neighbor_id, cast(rank AS int) AS rank,
               round(e, 6) AS l2_dist
        FROM ranked WHERE rank <= 5
    """

    # q114: per-source cap — same window total order as the Spark plan
    out["q114_source_cap"] = f"""
        WITH t AS (
            SELECT doc_id, source, cast(len({_SQL_TOKENS}) AS int) AS n_tokens
            FROM documents
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY source
                        ORDER BY n_tokens DESC, doc_id ASC) AS rank
            FROM t
        )
        SELECT doc_id, source, n_tokens, cast(rank AS int) AS rank
        FROM ranked WHERE rank <= 20
    """

    # q112: progressive-JPEG decode with nonzero AC — the oracle recomputes
    # every pixel from the closed IDCT form (orthonormal basis B(0,t) =
    # sqrt(1/8), B(u,t) = cos((2t+1) u pi/16)/2; fixture margins > 1e-3 from
    # every rounding boundary, so cos()-based doubles round identically on
    # any engine). x = pixel row (vertical / DCT u), y = column (v).
    out["q112_jpeg_progressive_real"] = """
        WITH g AS (
            SELECT m.i AS media_id, x.x AS x, y.y AS y
            FROM (SELECT unnest(range(0, 24)) AS i) m(i),
                 (SELECT unnest(range(0, 16)) AS x) x(x),
                 (SELECT unnest(range(0, 16)) AS y) y(y)
        ),
        px AS (
            SELECT media_id,
                   128.0
                   + (((31 * media_id + 13 * (y // 8) + 7 * (x // 8)) % 200) - 100)
                   + CASE WHEN x < 8 AND y < 8 THEN
                         ((5 * media_id + 1) % 7 - 3) * 8
                           * sqrt(0.125) * 0.5 * cos((2 * (y % 8) + 1) * pi() / 16)
                       + ((3 * media_id + 2) % 5 - 2) * 8
                           * 0.5 * cos((2 * (x % 8) + 1) * 2 * pi() / 16) * sqrt(0.125)
                       + ((media_id % 3) - 1) * 8
                           * 0.5 * cos((2 * (x % 8) + 1) * pi() / 16)
                           * 0.5 * cos((2 * (y % 8) + 1) * 2 * pi() / 16)
                     ELSE 0 END
                   + CASE WHEN x < 8 AND y >= 8 THEN
                         ((media_id + 2) % 5 - 2) * 8
                           * 0.5 * cos((2 * (x % 8) + 1) * pi() / 16) * sqrt(0.125)
                     ELSE 0 END
                   + CASE WHEN x >= 8 AND y < 8 THEN
                         ((media_id + 1) % 5 - 2) * 8
                           * 0.5 * cos((2 * (x % 8) + 1) * pi() / 16) * sqrt(0.125)
                     ELSE 0 END
                   AS v
            FROM g
        ),
        sums AS (
            SELECT media_id, cast(sum(round(v)) AS bigint) AS px_checksum
            FROM px GROUP BY media_id
        )
        SELECT media_id, cast(16 AS int) AS width, cast(16 AS int) AS height,
               px_checksum,
               round(cast(px_checksum AS double) / 256.0, 6) AS mean_px
        FROM sums
    """

    out["q105_jpeg_decode_real"] = """
        WITH m AS (
            SELECT i.i AS media_id,
                   cast(8 * (2 + i.i % 3) AS int) AS width,
                   cast(8 * (1 + i.i % 2) AS int) AS height
            FROM (SELECT unnest(range(0, 24)) AS i) i(i)
        ),
        px AS (
            SELECT m.media_id,
                   ((31 * m.media_id
                     + 13 * (((oj.oj * m.width) // 4) // 8)
                     + 7 * (((oi.oi * m.height) // 4) // 8)) % 200) + 28 AS v
            FROM m,
                 (SELECT unnest(range(0, 4)) AS oi) oi(oi),
                 (SELECT unnest(range(0, 4)) AS oj) oj(oj)
        ),
        sums AS (
            SELECT media_id, cast(sum(v) AS bigint) AS px_checksum FROM px
            GROUP BY media_id
        )
        SELECT m.media_id, m.width, m.height, s.px_checksum,
               round(cast(s.px_checksum AS double) / 16.0, 6) AS mean_px
        FROM m JOIN sums s USING (media_id)
    """

    # ids: q103's chain + the deterministic id map (codepoint for single
    # chars, 0x110000 + earliest rank for merged tokens)
    out["q111_bpe_ids"] = f"""
        WITH RECURSIVE {_bpe_train_ctes},
        merges AS (SELECT DISTINCT step, ma AS a, mb AS b
                   FROM r WHERE step >= 1),
        n_merges AS (SELECT cast(count(*) AS int) AS nm FROM merges),
        mt AS (SELECT a || b AS tok, cast(min(step) AS bigint) AS mstep
               FROM merges GROUP BY a || b),
        allwords AS (
            SELECT DISTINCT unnest({_SQL_TOKENS}) AS word FROM documents
        ),
        e AS (
            SELECT 0 AS step, word, string_split(word, '') AS syms
            FROM allwords
            UNION ALL
            SELECT e.step + 1, e.word,
                   CASE WHEN m.a IS NULL THEN e.syms
                        ELSE {_sql_bpe_apply("e.syms", "m.a", "m.b")} END
            FROM e
            LEFT JOIN merges m ON m.step = e.step + 1
            CROSS JOIN n_merges
            WHERE e.step < n_merges.nm
        ),
        enc AS (SELECT word, syms FROM e, n_merges WHERE step = n_merges.nm),
        seq AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) + 1),
                          i -> {{'pos': i, 'w': toks[i]}})) AS s
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents) dt
        ),
        j AS (
            SELECT seq.doc_id, s.pos AS pos, enc.syms
            FROM seq JOIN enc ON enc.word = s.w
        ),
        g AS (
            SELECT doc_id, cast(count(*) AS int) AS n_words,
                   flatten(list(syms ORDER BY pos)) AS flat
            FROM j GROUP BY doc_id
        ),
        ex AS (
            SELECT g.doc_id,
                   unnest(list_transform(range(1, len(g.flat) + 1),
                          i -> {{'pos': i, 'sym': g.flat[i]}})) AS u
            FROM g
        ),
        ids AS (
            SELECT ex.doc_id, u.pos AS pos,
                   CASE WHEN length(u.sym) = 1 THEN cast(ascii(u.sym) AS bigint)
                        ELSE 1114112 + mt.mstep - 1 END AS tid
            FROM ex LEFT JOIN mt ON mt.tok = u.sym
        ),
        ck AS (
            SELECT doc_id,
                   list_reduce(list_prepend(cast(0 AS bigint),
                       list(tid ORDER BY pos)),
                       (h, i) -> (h * 31 + i) % 1000000007) AS ids_checksum
            FROM ids GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(g.n_words, 0) AS n_words,
               coalesce(cast(len(g.flat) AS int), 0) AS n_bpe_tokens,
               coalesce(ck.ids_checksum, 0) AS ids_checksum
        FROM (SELECT doc_id FROM documents) d
        LEFT JOIN g USING (doc_id) LEFT JOIN ck USING (doc_id)
    """

    # SAX: q50's znorm folds + q66's PAA folds + CASE at the published
    # breakpoint literals (-0.67 / 0.0 / 0.67 for alphabet 4)
    _sax_seg = (
        "list_reduce(list_prepend(0.0, z[{lo}:{hi}]), (a, v) -> a + v) / 4.0"
    )
    _sax_letter = (
        "CASE WHEN {p} < -0.67 THEN 'a' WHEN {p} < 0.0 THEN 'b'"
        " WHEN {p} < 0.67 THEN 'c' ELSE 'd' END"
    )
    _sax_segs = [
        _sax_seg.format(lo=1 + 4 * i, hi=4 + 4 * i) for i in range(4)
    ]
    out["q110_sax_words"] = f"""
        WITH {_SERIES_CTE},
        stats AS (
            SELECT series_id, features,
                   list_reduce(list_prepend(cast(0.0 AS double), features),
                               (a, v) -> a + v) / cast(len(features) AS double) AS mu,
                   list_reduce(list_prepend(cast(0.0 AS double), features),
                               (a, v) -> a + v * v) / cast(len(features) AS double) AS m2
            FROM series
        ),
        zed AS (
            SELECT series_id,
                   list_transform(features,
                       v -> (v - mu) / sqrt(greatest(m2 - mu * mu, 1e-300))) AS z
            FROM stats
        ),
        pa AS (
            SELECT series_id,
                   {_sax_segs[0]} AS p1, {_sax_segs[1]} AS p2,
                   {_sax_segs[2]} AS p3, {_sax_segs[3]} AS p4
            FROM zed
        ),
        w AS (
            SELECT series_id,
                   {_sax_letter.format(p="p1")} || {_sax_letter.format(p="p2")}
                   || {_sax_letter.format(p="p3")} || {_sax_letter.format(p="p4")}
                       AS word
            FROM pa
        )
        SELECT series_id, word,
               cast(count(*) OVER (PARTITION BY word) AS int) AS block_size
        FROM w
    """

    # q109: the composed pipeline — q101's LM chain + median gate + q108's
    # split + q102/q103's BPE recursions, restricted to the survivor set
    out["q109_tokenizer_pipeline"] = f"""
        WITH RECURSIVE {_bpe_train_ctes},
        merges AS (SELECT DISTINCT step, ma AS a, mb AS b
                   FROM r WHERE step >= 1),
        n_merges AS (SELECT cast(count(*) AS int) AS nm FROM merges),
        t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
        b0 AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks)),
                          i -> {{'pos': i, 'w1': toks[i], 'w2': toks[i+1]}})) AS s
            FROM t WHERE len(toks) >= 2
        ),
        b AS (SELECT doc_id, s.pos AS pos, s.w1 AS w1, s.w2 AS w2 FROM b0),
        cb AS (SELECT w1, w2, cast(count(*) AS bigint) AS cb
               FROM b GROUP BY w1, w2),
        cu AS (SELECT w1, cast(sum(cb) AS bigint) AS cu FROM cb GROUP BY w1),
        v AS (SELECT cast(count(DISTINCT w) AS bigint) AS v
              FROM (SELECT unnest(toks) AS w FROM t)),
        sc AS (
            SELECT b.doc_id, b.pos,
                   cast(cb.cb + 1 AS double) / cast(cu.cu + v.v AS double) AS p
            FROM b JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN v
        ),
        pd AS (
            SELECT doc_id, cast(count(*) AS int) AS n_bigrams,
                   list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                               (a, x) -> a + x) AS s
            FROM sc GROUP BY doc_id
        ),
        lmsc AS (
            SELECT d.doc_id,
                   cast(round(coalesce(pd.s / cast(pd.n_bigrams AS double),
                                       0.0) * 1000000) AS bigint) AS p_micro
            FROM (SELECT doc_id FROM documents) d LEFT JOIN pd USING (doc_id)
        ),
        med AS (SELECT quantile_cont(p_micro, 0.5) AS tt FROM lmsc),
        surv AS (
            SELECT doc_id, source, text
            FROM documents JOIN lmsc USING (doc_id), med
            WHERE cast(p_micro AS double) >= med.tt
        ),
        spl AS (
            SELECT doc_id,
                   CASE WHEN hv < 800000 THEN 'train'
                        WHEN hv < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         (({_sql_char_fold("source")} * 654435747 + 40503)
                          % 1000000007) % 1000000 AS hv
                  FROM surv) hh
        ),
        allwords AS (
            SELECT DISTINCT unnest({_SQL_TOKENS}) AS word FROM surv
        ),
        e AS (
            SELECT 0 AS step, word, string_split(word, '') AS syms
            FROM allwords
            UNION ALL
            SELECT e.step + 1, e.word,
                   CASE WHEN m.a IS NULL THEN e.syms
                        ELSE {_sql_bpe_apply("e.syms", "m.a", "m.b")} END
            FROM e
            LEFT JOIN merges m ON m.step = e.step + 1
            CROSS JOIN n_merges
            WHERE e.step < n_merges.nm
        ),
        enc AS (SELECT word, syms FROM e, n_merges WHERE step = n_merges.nm),
        seq AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) + 1),
                          i -> {{'pos': i, 'w': toks[i]}})) AS s
            FROM (SELECT doc_id, {_SQL_TOKENS} AS toks FROM surv) st
        ),
        j AS (
            SELECT seq.doc_id, s.pos AS pos, enc.syms
            FROM seq JOIN enc ON enc.word = s.w
        ),
        g AS (
            SELECT doc_id, flatten(list(syms ORDER BY pos)) AS flat
            FROM j GROUP BY doc_id
        ),
        fp AS (
            SELECT d.doc_id,
                   coalesce(array_to_string(g.flat, ' '), '') AS joined,
                   coalesce(cast(len(g.flat) AS int), 0) AS n_bpe_tokens
            FROM (SELECT doc_id FROM surv) d LEFT JOIN g USING (doc_id)
        ),
        perdoc AS (
            SELECT doc_id, n_bpe_tokens,
                   {_sql_char_fold("joined")} AS bfp
            FROM fp
        )
        SELECT s.split,
               cast(count(*) AS bigint) AS n_docs,
               cast(sum(perdoc.n_bpe_tokens) AS bigint) AS total_bpe_tokens,
               cast(sum(perdoc.bfp) AS bigint) AS fp_checksum
        FROM perdoc JOIN spl s USING (doc_id)
        GROUP BY s.split
    """

    out["q104_duplicate_spans"] = f"""
        WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
        g0 AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - 8 + 2),
                          i -> {{'p': i,
                                'gs': array_to_string(toks[i:i+7], ' ')}})) AS s
            FROM t WHERE len(toks) >= 8
        ),
        g AS (SELECT doc_id, s.p AS p, {_sql_char_fold("s.gs")} AS h FROM g0),
        common AS (
            SELECT h FROM g GROUP BY h HAVING count(DISTINCT doc_id) >= 2
        ),
        hits AS (SELECT doc_id, p FROM g JOIN common USING (h)),
        flagged AS (
            SELECT doc_id, p,
                   CASE WHEN p - coalesce(
                            lag(p) OVER (PARTITION BY doc_id ORDER BY p),
                            -1000000000) <= 8
                        THEN 0 ELSE 1 END AS new_isl
            FROM hits
        ),
        isl AS (
            SELECT doc_id, p,
                   sum(new_isl) OVER (PARTITION BY doc_id ORDER BY p
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS island
            FROM flagged
        )
        SELECT doc_id, cast(island AS int) AS island,
               cast(min(p) AS int) AS span_start,
               cast(max(p) + 7 AS int) AS span_end,
               cast(max(p) + 7 - min(p) + 1 AS int) AS span_tokens,
               cast(count(*) AS int) AS n_windows
        FROM isl GROUP BY doc_id, island
    """

    # q117: Okapi BM25 full replay — same rational idf, same left-assoc
    # double expression tree as operators/corpus.py::bm25_topk, per-term
    # contributions rounded to integer micro-units (cents trick) so the
    # per-query sum is order-independent. (1.2 + 1.0) stays an engine-side
    # literal fold, mirroring the Spark plan's (lit(k1) + lit(1.0)).
    out["q117_bm25"] = f"""
        WITH {_sql_bm25_ctes()}
        SELECT query_id, cast(rank AS int) AS rank, doc_id,
               CAST(score_micro AS double) / 1000000.0 AS score
        FROM bmranked WHERE rank <= 10
    """

    # q120: BM25 through the build/search persistence split — the serve
    # path must reproduce the composed chain exactly, so the oracle IS
    # q117's replay
    out["q120_bm25_served"] = out["q117_bm25"]

    # q123: chunked block-scorer KNN — identical ranks to every other
    # strategy, so the oracle IS q09's replay
    out["q123_knn_chunked"] = out["q09_knn_pairs"]

    # q124: chunked quantized ANN — integer arithmetic makes the chunked
    # path bit-identical on every column, so q90's oracle replays verbatim
    out["q124_ann_quantized_chunked"] = out["q90_ann_quantized"]

    # q121: lossless WAND-pruned BM25 — exact by construction, so the
    # oracle is q117's full-chain replay (any pruning loss = hash mismatch)
    out["q121_bm25_wand"] = out["q117_bm25"]

    # q122: the WAND completeness certificate — truncate to top-5 postings
    # per (query, term), exact re-score of candidates, tail-bound sum vs
    # the k-th candidate score; the full verify-pass replay
    out["q122_bm25_wand_certificate"] = f"""
        WITH {_sql_bm25_ctes()},
        kept AS (
            SELECT query_id, term, df, doc_id, c,
                   row_number() OVER (PARTITION BY query_id, term
                               ORDER BY c DESC, doc_id ASC) AS prn
            FROM contrib
        ),
        keptf AS (SELECT * FROM kept WHERE prn <= 5),
        tails AS (
            SELECT query_id, term, max(df) AS df, min(c) AS minkept
            FROM keptf GROUP BY query_id, term
        ),
        tailsum AS (
            SELECT query_id,
                   CAST(sum(CASE WHEN df > 5 THEN minkept ELSE 0 END)
                        AS BIGINT) AS tail_sum_micro
            FROM tails GROUP BY query_id
        ),
        cand AS (SELECT DISTINCT query_id, doc_id FROM keptf),
        exact AS (
            SELECT c2.query_id, c2.doc_id, CAST(sum(c2.c) AS BIGINT) AS s
            FROM contrib c2 JOIN cand USING (query_id, doc_id)
            GROUP BY c2.query_id, c2.doc_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY s DESC, doc_id ASC) AS rnk
            FROM exact
        ),
        theta AS (
            SELECT query_id, min(s) AS theta FROM ranked
            WHERE rnk <= 10 GROUP BY query_id
        ),
        nc AS (SELECT query_id, count(*) AS n_cand FROM exact GROUP BY query_id)
        SELECT n.query_id,
               CAST(n.n_cand AS BIGINT) AS n_candidates,
               t.theta AS theta_micro,
               s.tail_sum_micro,
               (s.tail_sum_micro = 0
                OR (n.n_cand >= 10 AND s.tail_sum_micro < t.theta)) AS proven
        FROM nc n JOIN theta t ON n.query_id = t.query_id
        JOIN tailsum s ON n.query_id = s.query_id
    """

    # q119: BM25 with impact-ordered posting truncation — the q117 chain
    # with the per-(query, term) top-20 contribution window spliced in
    out["q119_bm25_pruned"] = f"""
        WITH {_sql_bm25_ctes(max_postings=20)}
        SELECT query_id, cast(rank AS int) AS rank, doc_id,
               CAST(score_micro AS double) / 1000000.0 AS score
        FROM bmranked WHERE rank <= 10
    """

    # q118: hybrid retrieval — the BM25 chain (q117) + a brute-cosine leg
    # (q23's fold, %23 workload, top-10) fused by 1/(60 + rank) in integer
    # micro-units (operators/corpus.py::rrf_fuse)
    out["q118_hybrid_retrieval"] = f"""
        WITH {_sql_bm25_ctes()},
        lex AS (
            SELECT query_id, doc_id, rank FROM bmranked WHERE rank <= 10
        ),
        cv AS (
            SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
            FROM embeddings
        ),
        qv AS (SELECT * FROM cv WHERE vec_id % 23 = 0),
        cpairs AS (
            SELECT qv.vec_id AS query_id, cv.vec_id AS doc_id,
                   1.0 - {_sql_dot("qv.v", "cv.v")}
                         / (sqrt({_sql_dot("qv.v", "qv.v")})
                            * sqrt({_sql_dot("cv.v", "cv.v")})) AS d
            FROM qv CROSS JOIN cv
            WHERE qv.vec_id != cv.vec_id
        ),
        sem AS (
            SELECT query_id, doc_id, rank FROM (
                SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY d ASC, doc_id ASC) AS rank
                FROM cpairs
            ) WHERE rank <= 10
        ),
        legs AS (
            SELECT * FROM lex UNION ALL SELECT * FROM sem
        ),
        fused AS (
            SELECT query_id, doc_id,
                   CAST(sum(CAST(round(1000000.0
                                       / (60.0 + CAST(rank AS double)), 0)
                                 AS BIGINT)) AS BIGINT) AS micro
            FROM legs GROUP BY query_id, doc_id
        ),
        franked AS (
            SELECT *, row_number() OVER (PARTITION BY query_id
                        ORDER BY micro DESC, doc_id ASC) AS rank
            FROM fused
        )
        SELECT query_id, cast(rank AS int) AS rank, doc_id,
               CAST(micro AS double) / 1000000.0 AS rrf_score
        FROM franked WHERE rank <= 10
    """
    # q127: per-series feature extraction — every statistic is a
    # left-fold whose DuckDB mirror runs the identical IEEE op sequence
    out["q127_series_features"] = f"""
        WITH {_SERIES_CTE},
        {_sql_series_features_ctes()}
        SELECT * FROM sfeat
    """

    # q125: averaged-perceptron quality classifier — the oracle replays
    # all 4 training epochs (chained CTEs); the graded rows ARE the model
    out["q125_quality_classifier"] = f"""
        WITH {_sql_perceptron_ctes(epochs=4)}
        SELECT cast(d.dim AS int) AS dim, a.a[d.dim + 1] AS weight
        FROM pd d CROSS JOIN pa4 a
    """

    # q126: the trained filter applied to the corpus — training replay +
    # one exact int64 dot per document
    out["q126_quality_filter"] = f"""
        WITH {_sql_perceptron_ctes(epochs=4)},
        pscored AS (
            SELECT f.doc_id,
                   list_reduce(list_prepend(cast(0 AS bigint),
                       list_transform(range(1, 6), j -> f.x[j] * a.a[j])),
                       (x, y) -> x + y) AS score
            FROM pf f CROSS JOIN pa4 a
        )
        SELECT doc_id, score, score > 0 AS kept FROM pscored
    """

    # q128: the learning curve — per-epoch exact correct counts of the
    # averaged model, replayed epoch by epoch
    legs = []
    for t in range(1, 5):
        legs.append(f"""
        SELECT {t} AS epoch,
               CAST(count(*) FILTER (WHERE (f.y > 0 AND s > 0)
                                        OR (f.y < 0 AND s <= 0)) AS BIGINT)
                   AS n_correct,
               CAST(count(*) AS BIGINT) AS n_total
        FROM (SELECT f.y,
                     list_reduce(list_prepend(cast(0 AS bigint),
                         list_transform(range(1, 6),
                                        j -> f.x[j] * a.a[j])),
                         (p, q) -> p + q) AS s
              FROM pf f CROSS JOIN pa{t} a) f""")
    union = " UNION ALL ".join(legs)
    out["q128_epoch_sweep"] = f"""
        WITH {_sql_perceptron_ctes(epochs=4)},
        sweep AS ({union})
        SELECT cast(epoch AS int) AS epoch, n_correct, n_total,
               cast(n_correct AS double) / cast(n_total AS double)
                   AS accuracy
        FROM sweep
    """

    # q129: declarative stump induction — one hash-proven argmin rule
    out["q129_stump"] = f"""
        WITH {_sql_stump_ctes()}
        SELECT cast(dim AS int) AS dim, cast(v AS bigint) AS threshold,
               cast(pol AS int) AS polarity, cast(err AS bigint) AS n_errors,
               cast(total AS bigint) AS n_total
        FROM sbest
    """

    # q130: the stump rule applied to the corpus — induction + scoring
    out["q130_stump_filter"] = f"""
        WITH {_sql_stump_ctes()},
        sscored AS (
            SELECT f.doc_id,
                   CASE WHEN f.x[b.dim + 1] <= b.v THEN b.pol
                        ELSE -b.pol END AS predicted
            FROM pf f CROSS JOIN sbest b
        )
        SELECT doc_id, cast(predicted AS int) AS predicted,
               predicted > 0 AS kept
        FROM sscored
    """

    # q131: the composed feature-space series classifier — series build +
    # ten feature folds + quantization + 4 perceptron epochs, one hash
    pf131 = """
            SELECT f.series_id AS doc_id,
                   CASE WHEN s.label = 'click' THEN 1 ELSE -1 END AS y,
                   [cast(1 AS bigint),
                    cast(round(f.mean * 100) AS bigint),
                    cast(round(f.mean_abs_change * 100) AS bigint),
                    cast(round(f.acf1 * 1000) AS bigint),
                    cast(f.zero_crossings * 100 AS bigint),
                    cast(f.n_peaks * 100 AS bigint)] AS x
            FROM sfeat f JOIN series s USING (series_id)"""
    out["q131_series_classifier"] = f"""
        WITH {_SERIES_CTE},
        {_sql_series_features_ctes()},
        {_sql_perceptron_ctes(epochs=4, dim=6, pf_body=pf131)}
        SELECT cast(d.dim AS int) AS dim, a.a[d.dim + 1] AS weight
        FROM pd d CROSS JOIN pa4 a
    """

    # q132: SAX symbolization — every fold (znorm mean/var, PAA segment
    # means, breakpoint counts) mirrored in IEEE order; the word is a
    # deterministic string concat
    out["q132_sax_symbols"] = f"""
        WITH {_SERIES_CTE},
        {_sql_sax_ctes(8, 4, SERIES_LEN)}
        SELECT series_id, label, {_SQL_SAX_WORD} AS sax_word FROM scodes
    """

    # q133: symbol-space KNN — MINDIST^2 ranking with the reference heapq
    # tie order, Counter-parity vote (q10's discipline on SAX words)
    out["q133_sax_knn"] = f"""
        WITH {_SERIES_CTE},
        {_sql_sax_ctes(8, 4, SERIES_LEN)},
        strain AS (SELECT * FROM scodes WHERE series_id % 4 != 0),
        stest  AS (SELECT * FROM scodes WHERE series_id % 4 = 0),
        spairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label,
                   {_sql_mindist_sq(8, 4, SERIES_LEN, 't.codes', 'r.codes')} AS d
            FROM stest t CROSS JOIN strain r
        ),
        sranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
            FROM spairs
        ),
        topk AS (SELECT * FROM sranked WHERE rank <= 5),
        {_VOTE_SQL.strip().rstrip()}
        SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1
    """

    # q134: matrix profile — per-window znorm folds + self-join with the
    # exclusion zone, min per window under (d, nn_start) total order
    out["q134_matrix_profile"] = f"""
        WITH {_SERIES_CTE},
        {_sql_window_ctes(8)},
        {_sql_matrix_profile_ctes(8, 4)}
        SELECT series_id, start, nn_start, d AS profile_d
        FROM mprof WHERE rk = 1
    """

    # q135: discord/motif argmax/argmin over the q134 profile
    out["q135_series_discords"] = f"""
        WITH {_SERIES_CTE},
        {_sql_window_ctes(8)},
        {_sql_matrix_profile_ctes(8, 4)},
        prof AS (
            SELECT series_id, start, nn_start, d AS profile_d
            FROM mprof WHERE rk = 1
        ),
        pr2 AS (
            SELECT *,
                   row_number() OVER (PARTITION BY series_id
                       ORDER BY profile_d DESC, start ASC) AS rd,
                   row_number() OVER (PARTITION BY series_id
                       ORDER BY profile_d ASC, start ASC) AS rm
            FROM prof
        )
        SELECT d.series_id, d.start AS discord_start,
               d.profile_d AS discord_d,
               m.start AS motif_start, m.profile_d AS motif_d
        FROM (SELECT * FROM pr2 WHERE rd = 1) d
        JOIN (SELECT * FROM pr2 WHERE rm = 1) m USING (series_id)
    """

    # q136: corpus-scale motif words — bounded-vocabulary aggregation of
    # per-window SAX words
    out["q136_motif_words"] = f"""
        WITH {_SERIES_CTE},
        {_sql_window_ctes(8)},
        {_sql_window_word_ctes(8, 4, 4)}
        SELECT word, count(*) AS n_windows,
               cast(count(DISTINCT series_id) AS bigint) AS n_series
        FROM ww GROUP BY word
    """

    # q137: Bag-of-Patterns 1-NN — numerosity-reduced word histograms,
    # EXACT int64 distance ||a||^2 + ||b||^2 - 2<a,b> via the sparse
    # word-join dot product (absent pairs coalesce to dot = 0)
    out["q137_bop_classify"] = f"""
        WITH {_SERIES_CTE},
        {_sql_window_ctes(8)},
        {_sql_window_word_ctes(8, 4, 4)},
        wl AS (
            SELECT series_id, list(word ORDER BY start) AS words
            FROM ww GROUP BY series_id
        ),
        wnr AS (
            SELECT series_id,
                   list_filter(list_transform(range(1, len(words) + 1),
                       i -> CASE WHEN i = 1 OR words[i] != words[i - 1]
                                 THEN words[i] END),
                       x -> x IS NOT NULL) AS words
            FROM wl
        ),
        hcnt AS (
            SELECT series_id, word, cast(count(*) AS bigint) AS cnt
            FROM (SELECT series_id, unnest(words) AS word FROM wnr)
            GROUP BY series_id, word
        ),
        thist AS (
            SELECT series_id, word, cnt FROM hcnt WHERE series_id % 4 = 0
        ),
        rhist AS (
            SELECT h.series_id, s.label, h.word, h.cnt
            FROM hcnt h JOIN series s ON h.series_id = s.series_id
            WHERE h.series_id % 4 != 0
        ),
        tn AS (
            SELECT series_id, cast(sum(cnt * cnt) AS bigint) AS n2
            FROM thist GROUP BY series_id
        ),
        rn AS (
            SELECT series_id, label, cast(sum(cnt * cnt) AS bigint) AS n2
            FROM rhist GROUP BY series_id, label
        ),
        dots AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   cast(sum(t.cnt * r.cnt) AS bigint) AS dot
            FROM thist t JOIN rhist r USING (word)
            GROUP BY t.series_id, r.series_id
        ),
        bpairs AS (
            SELECT tn.series_id AS test_id, rn.series_id AS train_id,
                   rn.label AS train_label,
                   tn.n2 + rn.n2 - 2 * coalesce(d.dot, 0) AS d
            FROM tn CROSS JOIN rn
            LEFT JOIN dots d
              ON d.test_id = tn.series_id AND d.train_id = rn.series_id
        ),
        brk AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY d ASC, train_label ASC, train_id ASC) AS rk
            FROM bpairs
        )
        SELECT test_id, train_label AS predicted_label FROM brk WHERE rk = 1
    """

    # q138: distance-weighted vote — the per-label weight sum folds over
    # list(sqrt(d) ORDER BY rank), bit-matching Spark's rank-sorted array
    # fold (never an order-undefined float groupBy sum)
    out["q138_knn_weighted"] = f"""
        WITH {_SERIES_CTE},
        {_KNN_TOPK_CTE},
        wv AS (
            SELECT test_id, train_label, min(rank) AS best_rank,
                   list_reduce(list_prepend(cast(0.0 AS double),
                       list(sqrt(d) ORDER BY rank)),
                       (a, v) -> a + 1.0 / (1.0 + v)) AS wsum
            FROM topk GROUP BY test_id, train_label
        ),
        wsel AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY wsum DESC, best_rank ASC, train_label ASC) AS vrk
            FROM wv
        )
        SELECT test_id, train_label AS predicted_label, wsum AS weight
        FROM wsel WHERE vrk = 1
    """

    # q139: KNN regression — the prediction mean folds neighbor targets in
    # rank order; targets are the same left-fold series means on both sides
    out["q139_knn_regress"] = f"""
        WITH {_SERIES_CTE},
        {_KNN_TOPK_CTE},
        tgt AS (
            SELECT series_id,
                   {_sql_fold0('features')} / len(features) AS target
            FROM series
        ),
        nb AS (
            SELECT k.test_id, k.rank, t.target AS train_target
            FROM topk k JOIN tgt t ON k.train_id = t.series_id
        ),
        pr AS (
            SELECT test_id,
                   list_reduce(list_prepend(cast(0.0 AS double),
                       list(train_target ORDER BY rank)), (a, v) -> a + v)
                       / count(*) AS prediction
            FROM nb GROUP BY test_id
        )
        SELECT p.test_id, p.prediction, t2.target AS actual
        FROM pr p JOIN tgt t2 ON p.test_id = t2.series_id
    """

    # q140: anchored subsequence search — same wz window chain as q134;
    # the normalized pattern literal is byte-identical to the Spark plan's
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.motif import _py_znorm_fold

    _pat = _py_znorm_fold(_Q140_PATTERN_RAW)
    _pat_sql = "[" + ", ".join(repr(v) for v in _pat) + "]"
    _pat_d = (
        f"list_reduce(list_prepend(cast(0.0 AS double),"
        f" list_transform(range(1, {len(_pat)} + 1), i ->"
        f" (zw[i] - ({_pat_sql})[i]) * (zw[i] - ({_pat_sql})[i]))),"
        f" (x, y) -> x + y)"
    )
    out["q140_subsequence_search"] = f"""
        WITH {_SERIES_CTE},
        {_sql_window_ctes(len(_pat))}
        SELECT series_id, start, {_pat_d} AS d
        FROM wz
        ORDER BY d ASC, series_id ASC, start ASC
        LIMIT 25
    """

    # q141: one-plan k-fold CV — fold-inequality cross join, q09's rank
    # order and dist != 0 quirk, q10's vote, q12's exact-count accuracy
    out["q141_knn_cv"] = f"""
        WITH {_SERIES_CTE},
        cvp AS (
            SELECT a.series_id AS test_id, a.series_id % 4 AS fold,
                   a.label AS actual,
                   b.series_id AS train_id, b.label AS train_label,
                   list_reduce(list_transform(range(1, len(a.features) + 1),
                       i -> (a.features[i] - b.features[i])
                            * (a.features[i] - b.features[i])),
                       (x, y) -> x + y) AS d
            FROM series a JOIN series b
              ON b.series_id % 4 != a.series_id % 4
        ),
        cvr AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
            FROM cvp WHERE d != 0
        ),
        cvk AS (SELECT * FROM cvr WHERE rank <= 5),
        cvv AS (
            SELECT test_id, train_label, count(*) AS votes,
                   min(rank) AS best_rank
            FROM cvk GROUP BY test_id, train_label
        ),
        cvs AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY votes DESC, best_rank ASC, train_label ASC) AS vrk
            FROM cvv
        ),
        cvpred AS (
            SELECT s.test_id, s.train_label AS predicted_label,
                   p.fold, p.actual
            FROM cvs s JOIN (SELECT DISTINCT test_id, fold, actual FROM cvp) p
              ON s.test_id = p.test_id
            WHERE s.vrk = 1
        )
        SELECT fold, count(*) AS n_test,
               cast(sum(CASE WHEN predicted_label = actual THEN 1 ELSE 0 END)
                    AS bigint) AS n_correct,
               avg(CASE WHEN predicted_label = actual
                        THEN 1.0 ELSE 0.0 END) AS accuracy
        FROM cvpred GROUP BY fold
    """

    # q142: shape-based distance — norms, the 2n-1 shift cross-correlation
    # sweep, and the max are all mirrored fold-for-fold (exact max + IEEE
    # mul/div/sqrt in the Spark expression's op order); d != 0 is q09's
    # exclude-zero quirk
    out["q142_sbd_knn"] = f"""
        WITH {_SERIES_CTE},
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label, t.features AS fa, r.features AS fb
            FROM test t CROSS JOIN train r
        ),
        scored AS (
            SELECT test_id, train_id, train_label,
                   CASE WHEN nrm = 0 THEN 1.0
                        ELSE 1.0 - list_reduce(cc, (x, y) -> greatest(x, y))
                                   / nrm
                   END AS d
            FROM (
                SELECT *,
                       sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fa, x -> x * x)), (x, y) -> x + y))
                     * sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fb, x -> x * x)), (x, y) -> x + y))
                       AS nrm,
                       list_transform(range(1 - len(fa), len(fa)), s ->
                           list_reduce(list_prepend(0.0,
                               list_transform(range(1, len(fa) - abs(s) + 1),
                                   t -> fa[t + greatest(s, 0)]
                                        * fb[t - least(s, 0)])),
                               (x, y) -> x + y)) AS cc
                FROM pairs
            )
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                        ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
            FROM scored WHERE d != 0
        )
        SELECT test_id, train_id, cast(rank AS int) AS rank,
               round(d, 6) AS distance
        FROM ranked WHERE rank <= 3
    """

    # q143: full k-medoids replay — the q70 DTW recursion over ALL series
    # pairs builds the distance matrix in micro-longs, then window argmins
    # replay assign-1, the medoid-update sum, and assign-2 (every decision
    # integer-exact; seeds = 4 smallest by the q72 affine hash)
    out["q143_ts_kmedoids"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        allp AS (
            SELECT a.series_id AS ia, a.features AS fa,
                   b.series_id AS ib, b.features AS fb
            FROM series a CROSS JOIN series b
        ),
        dp AS (
            SELECT ia, ib, fa, fb, 1 AS i,
                   list_transform(range(1, len(fb)+1),
                       j -> list_reduce(list_prepend(0.0,
                                list_transform(range(1, j+1), k -> abs(fa[1]-fb[k]))),
                            (x, y) -> x + y)) AS row
            FROM allp
            UNION ALL
            SELECT ia, ib, fa, fb, i+1,
                   list_reduce(
                       list_prepend([row[1] + abs(fa[i+1]-fb[1])],
                           list_transform(range(2, len(fb)+1),
                               j -> [abs(fa[i+1]-fb[j]), row[j], row[j-1]])),
                       (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
            FROM dp WHERE i < len(fa)
        ),
        dmat AS (
            SELECT ia, ib, cast(round(row[-1] * 1000000) AS bigint) AS dm
            FROM dp WHERE i = len(fa)
        ),
        {_SQL_KMEDOIDS_TAIL}
        {_SQL_KMEDOIDS_SELECT}
    """

    # q145: same PAM replay over the SBD distance matrix — the q142 folds
    # produce doubles bit-equal to the Spark expression, so the micro table
    # (and every downstream decision) is exactly equal by construction
    out["q145_sbd_kmedoids"] = f"""
        WITH {_SERIES_CTE},
        allp AS (
            SELECT a.series_id AS ia, a.features AS fa,
                   b.series_id AS ib, b.features AS fb
            FROM series a CROSS JOIN series b
        ),
        dmat AS (
            SELECT ia, ib,
                   cast(round(
                       CASE WHEN nrm = 0 THEN 1.0
                            ELSE 1.0 - list_reduce(cc, (x, y) -> greatest(x, y))
                                       / nrm
                       END * 1000000) AS bigint) AS dm
            FROM (
                SELECT ia, ib,
                       sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fa, x -> x * x)), (x, y) -> x + y))
                     * sqrt(list_reduce(list_prepend(0.0,
                            list_transform(fb, x -> x * x)), (x, y) -> x + y))
                       AS nrm,
                       list_transform(range(1 - len(fa), len(fa)), s ->
                           list_reduce(list_prepend(0.0,
                               list_transform(range(1, len(fa) - abs(s) + 1),
                                   t -> fa[t + greatest(s, 0)]
                                        * fb[t - least(s, 0)])),
                               (x, y) -> x + y)) AS cc
                FROM allp
            )
        ),
        {_SQL_KMEDOIDS_TAIL}
        {_SQL_KMEDOIDS_SELECT}
    """

    # q146/q147: ROCKET features — integer kernels mirror term-for-term;
    # q147 pipes the feature vectors through q09/q10's exact KNN+vote chain
    _rk = _sql_rocket_exprs()
    _rk_select = ",\n               ".join(f"{e} AS {n}" for n, e in _rk)
    _rk_vec = "[" + ", ".join(e for _, e in _rk) + "]"
    out["q146_rocket_features"] = f"""
        WITH {_SERIES_CTE}
        SELECT series_id, label,
               {_rk_select}
        FROM series
    """
    out["q147_rocket_knn"] = f"""
        WITH {_SERIES_CTE},
        ftr AS (SELECT series_id, label, {_rk_vec} AS fv FROM train),
        fte AS (SELECT series_id, label, {_rk_vec} AS fv FROM test),
        pairs AS (
            SELECT t.series_id AS test_id, r.series_id AS train_id,
                   r.label AS train_label,
                   list_reduce(list_transform(range(1, len(t.fv) + 1),
                       i -> (t.fv[i] - r.fv[i]) * (t.fv[i] - r.fv[i])),
                       (x, y) -> x + y) AS d
            FROM fte t CROSS JOIN ftr r
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY test_id
                ORDER BY d ASC, train_label ASC, train_id ASC) AS rank
            FROM pairs WHERE d != 0
        ),
        topk AS (SELECT * FROM ranked WHERE rank <= 5),
        {_VOTE_SQL.strip().lstrip()}
        SELECT test_id, train_label AS predicted_label FROM sel WHERE vrk = 1
    """

    # q148: additive decomposition replay — the 2x4 MA trend expression is
    # generated once and spliced at every use site (identical op order:
    # half-weight init, ascending core fold, half-weight tail, one divide)
    def _tr4(t: str) -> str:
        return (
            f"(list_reduce(list_prepend(f[{t}-2] * 0.5,"
            f" list_transform(range({t}-1, {t}+2), i -> f[i])),"
            f" (x, y) -> x + y) + f[{t}+2] * 0.5) / 4.0"
        )

    def _s4(j: int) -> str:
        sel = f"list_filter(pos, t -> (t-1) % 4 = {j})"
        return (
            f"CASE WHEN len({sel}) > 0 THEN"
            f" list_reduce(list_prepend(0.0,"
            f" list_transform({sel}, t -> f[t] - {_tr4('t')})),"
            f" (x, y) -> x + y) / cast(len({sel}) AS double)"
            f" ELSE 0.0 END"
        )

    out["q148_seasonal_decompose"] = f"""
        WITH {_SERIES_CTE},
        b AS (
            SELECT series_id, features AS f,
                   range(3, len(features) - 1) AS pos
            FROM series WHERE len(features) >= 5
        ),
        sea AS (
            SELECT series_id, f, pos,
                   {_s4(0)} AS s0, {_s4(1)} AS s1,
                   {_s4(2)} AS s2, {_s4(3)} AS s3
            FROM b
        ),
        cen AS (
            SELECT *, (((s0 + s1) + s2) + s3) / 4.0 AS sbar FROM sea
        ),
        ex AS (
            SELECT series_id, f,
                   [s0 - sbar, s1 - sbar, s2 - sbar, s3 - sbar] AS seas,
                   unnest(pos) AS t
            FROM cen
        )
        SELECT series_id, cast(t AS int) AS t, f[t] AS value,
               {_tr4('t')} AS trend,
               seas[(t-1) % 4 + 1] AS seasonal,
               f[t] - {_tr4('t')} - seas[(t-1) % 4 + 1] AS resid
        FROM ex
    """

    # q178 (r6): decomposition strengths — q148's chain + t-ordered list
    # folds for each variance, zero-variance NULL guards
    def _ds_var(col: str) -> str:
        mean = (
            f"(list_reduce(list_prepend(0.0, {col}), (a, v) -> a + v)"
            f" / cast(len({col}) AS double))"
        )
        return (
            f"(list_reduce(list_prepend(0.0, list_transform({col},"
            f" v -> (v - {mean}) * (v - {mean}))), (a, v) -> a + v)"
            f" / cast(len({col}) AS double))"
        )

    out["q178_decomposition_strength"] = f"""
        WITH {_SERIES_CTE},
        b AS (
            SELECT series_id, features AS f,
                   range(3, len(features) - 1) AS pos
            FROM series WHERE len(features) >= 5
        ),
        sea AS (
            SELECT series_id, f, pos,
                   {_s4(0)} AS s0, {_s4(1)} AS s1,
                   {_s4(2)} AS s2, {_s4(3)} AS s3
            FROM b
        ),
        cen AS (
            SELECT *, (((s0 + s1) + s2) + s3) / 4.0 AS sbar FROM sea
        ),
        ex AS (
            SELECT series_id, f,
                   [s0 - sbar, s1 - sbar, s2 - sbar, s3 - sbar] AS seas,
                   unnest(pos) AS t
            FROM cen
        ),
        dec AS (
            SELECT series_id, t,
                   {_tr4('t')} AS trend,
                   seas[(t-1) % 4 + 1] AS seasonal,
                   f[t] - {_tr4('t')} - seas[(t-1) % 4 + 1] AS resid
            FROM ex
        ),
        gl AS (
            SELECT series_id,
                   cast(count(*) AS int) AS n_interior,
                   list(resid ORDER BY t) AS r,
                   list(trend + resid ORDER BY t) AS tr,
                   list(seasonal + resid ORDER BY t) AS sr
            FROM dec GROUP BY series_id
        ),
        gv AS (
            SELECT series_id, n_interior,
                   {_ds_var('r')} AS vr,
                   {_ds_var('tr')} AS vtr,
                   {_ds_var('sr')} AS vsr
            FROM gl
        )
        SELECT series_id, n_interior,
               CASE WHEN vtr != 0
                    THEN greatest(0.0, 1.0 - vr / vtr) END AS trend_strength,
               CASE WHEN vsr != 0
                    THEN greatest(0.0, 1.0 - vr / vsr) END AS seasonal_strength
        FROM gv
    """

    # q149/q150: DBA on top of the q143 replay — recursion 3 (integer DP,
    # accumulating the FULL cost matrix) + recursion 4 (backtrace walk with
    # the diagonal/up/left tie rule); the shared chain ends at `walk`
    _dba_chain = f"""{_SERIES_CTE},
        allp AS (
            SELECT a.series_id AS ia, a.features AS fa,
                   b.series_id AS ib, b.features AS fb
            FROM series a CROSS JOIN series b
        ),
        dp AS (
            SELECT ia, ib, fa, fb, 1 AS i,
                   list_transform(range(1, len(fb)+1),
                       j -> list_reduce(list_prepend(0.0,
                                list_transform(range(1, j+1), k -> abs(fa[1]-fb[k]))),
                            (x, y) -> x + y)) AS row
            FROM allp
            UNION ALL
            SELECT ia, ib, fa, fb, i+1,
                   list_reduce(
                       list_prepend([row[1] + abs(fa[i+1]-fb[1])],
                           list_transform(range(2, len(fb)+1),
                               j -> [abs(fa[i+1]-fb[j]), row[j], row[j-1]])),
                       (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
            FROM dp WHERE i < len(fa)
        ),
        dmat AS (
            SELECT ia, ib, cast(round(row[-1] * 1000000) AS bigint) AS dm
            FROM dp WHERE i = len(fa)
        ),
        {_SQL_KMEDOIDS_TAIL},
        mem AS (
            SELECT a2.mid AS bid, a2.id AS sid, s.features AS mf
            FROM a2 JOIN series s ON s.series_id = a2.id
        ),
        bfe AS (
            SELECT b.bid, s.features AS bf
            FROM (SELECT DISTINCT mid AS bid FROM a2) b
            JOIN series s ON s.series_id = b.bid
        ),
        pairq AS (
            SELECT m.bid, m.sid,
                   list_transform(f.bf, x -> cast(round(x * 1000000) AS bigint)) AS bm,
                   list_transform(m.mf, x -> cast(round(x * 1000000) AS bigint)) AS mm
            FROM mem m JOIN bfe f ON f.bid = m.bid
        ),
        dpi AS (
            SELECT bid, sid, bm, mm, 1 AS i,
                   [list_transform(range(1, len(mm)+1),
                       j -> list_reduce(list_prepend(cast(0 AS bigint),
                                list_transform(range(1, j+1), k -> abs(bm[1]-mm[k]))),
                            (x, y) -> x + y))] AS mat
            FROM pairq
            UNION ALL
            SELECT bid, sid, bm, mm, i+1,
                   list_append(mat,
                       list_reduce(
                           list_prepend([mat[i][1] + abs(bm[i+1]-mm[1])],
                               list_transform(range(2, len(mm)+1),
                                   j -> [abs(bm[i+1]-mm[j]), mat[i][j], mat[i][j-1]])),
                           (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1])))) AS mat
            FROM dpi WHERE i < len(bm)
        ),
        walk AS (
            SELECT bid, sid, mm, mat, len(mat) AS i, len(mm) AS j
            FROM dpi WHERE i = len(bm)
            UNION ALL
            SELECT bid, sid, mm, mat,
                   CASE WHEN i = 1 THEN 1
                        WHEN j = 1 THEN i - 1
                        WHEN mat[i-1][j-1] <= mat[i-1][j]
                             AND mat[i-1][j-1] <= mat[i][j-1] THEN i - 1
                        WHEN mat[i-1][j] <= mat[i][j-1] THEN i - 1
                        ELSE i
                   END AS i,
                   CASE WHEN i = 1 THEN j - 1
                        WHEN j = 1 THEN j
                        WHEN mat[i-1][j-1] <= mat[i-1][j]
                             AND mat[i-1][j-1] <= mat[i][j-1] THEN j - 1
                        WHEN mat[i-1][j] <= mat[i][j-1] THEN j
                        ELSE j - 1
                   END AS j
            FROM walk WHERE NOT (i = 1 AND j = 1)
        )"""

    out["q149_dba_barycenters"] = f"""
        WITH RECURSIVE {_dba_chain}
        SELECT bid AS bary_id, cast(i AS int) AS pos,
               cast(count(*) AS int) AS n_aligned,
               cast(cast(sum(mm[j]) AS bigint) AS double)
               / cast(count(*) * 1000000 AS double) AS bary
        FROM walk GROUP BY bid, i
    """

    # q150: the full k-means iteration — rebuild the refined barycenter
    # arrays (pos-ordered lists of the q149 means), then recursion 5: a
    # double-cost DTW DP between EVERY series and every refined barycenter,
    # micro-rounded argmin with the (dist, cluster) tie order
    out["q150_dtw_kmeans"] = f"""
        WITH RECURSIVE {_dba_chain},
        bary2 AS (
            SELECT bid, list(bary ORDER BY pos) AS bf2 FROM (
                SELECT bid, i AS pos,
                       cast(cast(sum(mm[j]) AS bigint) AS double)
                       / cast(count(*) * 1000000 AS double) AS bary
                FROM walk GROUP BY bid, i
            ) GROUP BY bid
        ),
        rp AS (
            SELECT s.series_id AS sid, b.bid, b.bf2 AS ra, s.features AS rb
            FROM series s CROSS JOIN bary2 b
        ),
        dpr AS (
            SELECT sid, bid, ra, rb, 1 AS i,
                   list_transform(range(1, len(rb)+1),
                       j -> list_reduce(list_prepend(0.0,
                                list_transform(range(1, j+1), k -> abs(ra[1]-rb[k]))),
                            (x, y) -> x + y)) AS row
            FROM rp
            UNION ALL
            SELECT sid, bid, ra, rb, i+1,
                   list_reduce(
                       list_prepend([row[1] + abs(ra[i+1]-rb[1])],
                           list_transform(range(2, len(rb)+1),
                               j -> [abs(ra[i+1]-rb[j]), row[j], row[j-1]])),
                       (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
            FROM dpr WHERE i < len(ra)
        ),
        dr AS (
            SELECT sid, bid, cast(round(row[-1] * 1000000) AS bigint) AS dm
            FROM dpr WHERE i = len(ra)
        )
        SELECT sid AS series_id, bid AS cluster, dm AS dist_micro FROM (
            SELECT sid, bid, dm,
                   row_number() OVER (PARTITION BY sid
                       ORDER BY dm ASC, bid ASC) AS rk
            FROM dr
        ) WHERE rk = 1
    """

    # q151: the Holt fold with [x, 0.0]-padded elements; binary-exact
    # 0.5/0.25/0.75 literals, raw doubles out
    out["q151_holt_forecast"] = f"""
        WITH {_SERIES_CTE},
        st AS (
            SELECT series_id,
                   CASE WHEN len(features) >= 2 THEN
                       list_reduce(
                           list_prepend([features[2], features[2] - features[1]],
                               list_transform(features[3:], x -> [x, 0.0])),
                           (acc, e) -> [
                               0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                               0.25 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                                       - acc[1]) + 0.75 * acc[2]
                           ])
                   END AS s
            FROM series
        )
        SELECT series_id, s[1] AS level, s[2] AS trend,
               s[1] + 1.0 * s[2] AS fc_1,
               s[1] + 4.0 * s[2] AS fc_4
        FROM st
    """

    # q152: q148's decomposition CTEs + micro residuals + the integer
    # 3-sigma comparison (rm^2 * n > 9 * sum(rm^2), order-free)
    out["q152_residual_anomalies"] = f"""
        WITH {_SERIES_CTE},
        b AS (
            SELECT series_id, features AS f,
                   range(3, len(features) - 1) AS pos
            FROM series WHERE len(features) >= 5
        ),
        sea AS (
            SELECT series_id, f, pos,
                   {_s4(0)} AS s0, {_s4(1)} AS s1,
                   {_s4(2)} AS s2, {_s4(3)} AS s3
            FROM b
        ),
        cen AS (
            SELECT *, (((s0 + s1) + s2) + s3) / 4.0 AS sbar FROM sea
        ),
        ex AS (
            SELECT series_id, f,
                   [s0 - sbar, s1 - sbar, s2 - sbar, s3 - sbar] AS seas,
                   unnest(pos) AS t
            FROM cen
        ),
        rm AS (
            SELECT series_id, cast(t AS int) AS t,
                   cast(round((f[t] - {_tr4('t')} - seas[(t-1) % 4 + 1])
                              * 1000000) AS bigint) AS resid_micro
            FROM ex
        ),
        stats AS (
            -- ss stays HUGEINT (internal only): the comparison below is
            -- then 128-bit exact, matching Spark's decimal(38,0) twin
            SELECT series_id,
                   sum(resid_micro * resid_micro) AS ss,
                   count(*) AS n
            FROM rm GROUP BY series_id
        )
        SELECT r.series_id, r.t, r.resid_micro,
               r.resid_micro * r.resid_micro * s.n > 9 * s.ss AS is_anomaly
        FROM rm r JOIN stats s USING (series_id)
    """

    # q153: supervised DBA prototypes — per-class spread-hash seeds, the
    # q149 integer-DP/backtrace recursions with bid = LABEL, barycenter
    # rebuild, then the q150 double-cost DTW recursion of test vs the k
    # class prototypes and the (dist, label) argmin
    out["q153_dba_classify"] = f"""
        WITH RECURSIVE {_SERIES_CTE},
        seeds AS (
            SELECT label AS bid, features AS bf FROM (
                SELECT label, features,
                       row_number() OVER (PARTITION BY label
                           ORDER BY ((series_id % 1000000007) * 654435747
                                     + 40503) % 1000000007 ASC,
                                    series_id ASC) AS rk
                FROM train
            ) WHERE rk = 1
        ),
        pairq AS (
            SELECT t.label AS bid, t.series_id AS sid,
                   list_transform(s.bf, x -> cast(round(x * 1000000) AS bigint)) AS bm,
                   list_transform(t.features, x -> cast(round(x * 1000000) AS bigint)) AS mm
            FROM train t JOIN seeds s ON s.bid = t.label
        ),
        dpi AS (
            SELECT bid, sid, bm, mm, 1 AS i,
                   [list_transform(range(1, len(mm)+1),
                       j -> list_reduce(list_prepend(cast(0 AS bigint),
                                list_transform(range(1, j+1), k -> abs(bm[1]-mm[k]))),
                            (x, y) -> x + y))] AS mat
            FROM pairq
            UNION ALL
            SELECT bid, sid, bm, mm, i+1,
                   list_append(mat,
                       list_reduce(
                           list_prepend([mat[i][1] + abs(bm[i+1]-mm[1])],
                               list_transform(range(2, len(mm)+1),
                                   j -> [abs(bm[i+1]-mm[j]), mat[i][j], mat[i][j-1]])),
                           (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1])))) AS mat
            FROM dpi WHERE i < len(bm)
        ),
        walk AS (
            SELECT bid, sid, mm, mat, len(mat) AS i, len(mm) AS j
            FROM dpi WHERE i = len(bm)
            UNION ALL
            SELECT bid, sid, mm, mat,
                   CASE WHEN i = 1 THEN 1
                        WHEN j = 1 THEN i - 1
                        WHEN mat[i-1][j-1] <= mat[i-1][j]
                             AND mat[i-1][j-1] <= mat[i][j-1] THEN i - 1
                        WHEN mat[i-1][j] <= mat[i][j-1] THEN i - 1
                        ELSE i
                   END AS i,
                   CASE WHEN i = 1 THEN j - 1
                        WHEN j = 1 THEN j
                        WHEN mat[i-1][j-1] <= mat[i-1][j]
                             AND mat[i-1][j-1] <= mat[i][j-1] THEN j - 1
                        WHEN mat[i-1][j] <= mat[i][j-1] THEN j
                        ELSE j - 1
                   END AS j
            FROM walk WHERE NOT (i = 1 AND j = 1)
        ),
        bary2 AS (
            SELECT bid, list(bary ORDER BY pos) AS bf2 FROM (
                SELECT bid, i AS pos,
                       cast(cast(sum(mm[j]) AS bigint) AS double)
                       / cast(count(*) * 1000000 AS double) AS bary
                FROM walk GROUP BY bid, i
            ) GROUP BY bid
        ),
        rp AS (
            SELECT s.series_id AS sid, b.bid, b.bf2 AS ra, s.features AS rb
            FROM test s CROSS JOIN bary2 b
        ),
        dpr AS (
            SELECT sid, bid, ra, rb, 1 AS i,
                   list_transform(range(1, len(rb)+1),
                       j -> list_reduce(list_prepend(0.0,
                                list_transform(range(1, j+1), k -> abs(ra[1]-rb[k]))),
                            (x, y) -> x + y)) AS row
            FROM rp
            UNION ALL
            SELECT sid, bid, ra, rb, i+1,
                   list_reduce(
                       list_prepend([row[1] + abs(ra[i+1]-rb[1])],
                           list_transform(range(2, len(rb)+1),
                               j -> [abs(ra[i+1]-rb[j]), row[j], row[j-1]])),
                       (acc, e) -> list_append(acc, e[1] + least(e[2], e[3], acc[-1]))) AS row
            FROM dpr WHERE i < len(ra)
        ),
        dr AS (
            SELECT sid, bid, cast(round(row[-1] * 1000000) AS bigint) AS dm
            FROM dpr WHERE i = len(ra)
        )
        SELECT sid AS test_id, bid AS predicted_label, dm AS dist_micro FROM (
            SELECT sid, bid, dm,
                   row_number() OVER (PARTITION BY sid
                       ORDER BY dm ASC, bid ASC) AS rk
            FROM dr
        ) WHERE rk = 1
    """

    # q154: prefix-sum fold mirrored element-for-element ([x]-padded for
    # uniform list_reduce types); argmax as the equivalent ranked window
    out["q154_cusum_changepoint"] = f"""
        WITH {_SERIES_CTE},
        b AS (
            SELECT series_id, features AS f, len(features) AS n,
                   list_reduce(list_prepend(CAST([] AS DOUBLE[]),
                       list_transform(features, x -> [x])),
                       (acc, e) -> list_append(acc,
                           coalesce(acc[-1], 0.0) + e[1])) AS S
            FROM series WHERE len(features) >= 2
        ),
        st AS (
            SELECT series_id, f, n, S, unnest(range(1, n)) AS t
            FROM b
        ),
        scored AS (
            SELECT series_id, n, S, t,
                   abs(S[t] - (cast(t AS double) / cast(n AS double)) * S[n])
                       AS stat
            FROM st
        ),
        sel AS (
            SELECT *, row_number() OVER (PARTITION BY series_id
                       ORDER BY stat DESC, t ASC) AS rk
            FROM scored
        )
        SELECT series_id, cast(t AS int) AS cp_pos, stat,
               S[t] / cast(t AS double) AS mean_before,
               (S[n] - S[t]) / cast(n - t AS double) AS mean_after
        FROM sel WHERE rk = 1
    """

    # q155: the Holt-Winters fold — state [l, b, counter, s0..s3], the
    # phase from the in-state counter, one seasonal slot patched per step;
    # every splice preserves the Spark op order exactly
    _hw_m1 = "(list_reduce(list_prepend(0.0, features[1:4]), (x, y) -> x + y) / 4.0)"
    _hw_m2 = "(list_reduce(list_prepend(0.0, features[5:8]), (x, y) -> x + y) / 4.0)"
    out["q155_holt_winters"] = f"""
        WITH {_SERIES_CTE},
        st AS (
            SELECT series_id,
                   CASE WHEN len(features) >= 8 THEN
                       list_reduce(
                           list_prepend(
                               list_concat(
                                   [{_hw_m1},
                                    ({_hw_m2} - {_hw_m1}) / 4.0,
                                    4.0],
                                   list_transform(range(1, 5),
                                       j -> features[j] - {_hw_m1})),
                               list_transform(features[5:], x -> [x])),
                           (acc, e) -> list_concat(
                               [0.5 * (e[1] - acc[cast(acc[3] % 4.0 AS bigint) + 4]) + 0.5 * (acc[1] + acc[2]),
                                0.25 * ((0.5 * (e[1] - acc[cast(acc[3] % 4.0 AS bigint) + 4]) + 0.5 * (acc[1] + acc[2])) - acc[1]) + 0.75 * acc[2],
                                acc[3] + 1.0],
                               list_transform(range(0, 4),
                                   j -> CASE WHEN j = cast(acc[3] % 4.0 AS bigint) % 4
                                             THEN 0.5 * (e[1] - (0.5 * (e[1] - acc[cast(acc[3] % 4.0 AS bigint) + 4]) + 0.5 * (acc[1] + acc[2]))) + 0.5 * acc[cast(acc[3] % 4.0 AS bigint) + 4]
                                             ELSE acc[j + 4] END)))
                   END AS s, len(features) AS n
            FROM series
        )
        SELECT series_id, s[1] AS level, s[2] AS trend,
               s[1] + 1.0 * s[2] + s[cast((n + 1 - 1) % 4 AS bigint) + 4] AS fc_1,
               s[1] + 4.0 * s[2] + s[cast((n + 4 - 1) % 4 AS bigint) + 4] AS fc_4
        FROM st
    """

    # q144: DSIR replay — portable char-fold bucket hash, add-one smoothed
    # linear-domain ratios (exact BIGINT products, one IEEE division each,
    # micro-rounded), integer count-weighted mean score, quantile_cont gate
    out["q144_importance_resample"] = f"""
        WITH toks AS (
            SELECT doc_id, {_SQL_TOKENS} AS tk FROM documents
        ),
        feats0 AS (
            SELECT doc_id, unnest(list_concat(tk,
                CASE WHEN len(tk) >= 2
                     THEN list_transform(range(1, len(tk)),
                              i -> tk[i] || ' ' || tk[i+1])
                     ELSE [] END)) AS g
            FROM toks
        ),
        rawf AS (
            SELECT doc_id, bucket, count(*) AS c FROM (
                SELECT doc_id, {_sql_char_fold('g')} % 64 AS bucket
                FROM feats0
            ) GROUP BY doc_id, bucket
        ),
        tgtf AS (
            SELECT f.bucket, sum(f.c) AS t
            FROM rawf f JOIN documents d USING (doc_id)
            WHERE d.lang = 'en' GROUP BY f.bucket
        ),
        tot AS (
            SELECT (SELECT sum(r.c) FROM rawf r) AS rt,
                   (SELECT coalesce(sum(t.t), 0) FROM tgtf t) AS tt
        ),
        ratio AS (
            SELECT rb.bucket,
                   cast(round(
                       cast((coalesce(tg.t, 0) + 1) * (tot.rt + 64) AS double)
                       / cast((rb.r + 1) * (tot.tt + 64) AS double)
                       * 1000000) AS bigint) AS rm
            FROM (SELECT bucket, sum(c) AS r FROM rawf GROUP BY bucket) rb
            LEFT JOIN tgtf tg USING (bucket) CROSS JOIN tot
        ),
        sc AS (
            SELECT f.doc_id,
                   cast(round(cast(sum(f.c * ra.rm) AS double)
                              / cast(sum(f.c) AS double)) AS bigint)
                       AS score_micro
            FROM rawf f JOIN ratio ra USING (bucket)
            GROUP BY f.doc_id
        ),
        alld AS (
            SELECT d.doc_id, coalesce(s.score_micro, 0) AS score_micro
            FROM documents d LEFT JOIN sc s USING (doc_id)
        ),
        th AS (SELECT quantile_cont(score_micro, 0.75) AS _t FROM alld)
        SELECT doc_id, score_micro,
               cast(score_micro AS double) >= _t AS kept
        FROM alld CROSS JOIN th
    """

    return out
