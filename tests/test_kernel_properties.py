"""Property tests: Arrow kernel twins == portable expression spec.

The engine's oracle story leans on 'kernel paths produce bit-identical
values to the expression spec the DuckDB oracle mirrors'. These tests
hammer that claim with generated inputs — mixed lengths, whitespace
shapes, repeated shingles, non-ASCII codepoints — rather than the fixture
corpus only.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import HASH_BASE, HASH_P
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import (
    make_shingle_minhash_udf,
    minhash_signature,
    shingle_sets,
    simhash,
)

# printable ASCII + a few multibyte codepoints (ascii()/ord() parity check)
ALPHABET = st.sampled_from(list("abcdefgh XYZ012.,!\t\n") + ["é", "ß", "中"])
TEXTS = st.lists(st.text(alphabet=ALPHABET, min_size=0, max_size=40), min_size=1, max_size=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_shingle_minhash_kernel_matches_expression(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    kern = make_shingle_minhash_udf(5, 16).asNondeterministic()
    got = {
        r.doc_id: (list(r.k.hashes), list(r.k.sig))
        for r in df.select("doc_id", kern(F.col("text")).alias("k")).collect()
    }
    exp_sh = shingle_sets(df, n=5).select(
        "doc_id",
        F.array_distinct("hashes").alias("h"),
    )
    expect = {
        r.doc_id: (list(r.h), list(r.sig))
        for r in exp_sh.select(
            "doc_id", "h", minhash_signature(F.col("h"), 16).alias("sig")
        ).collect()
    }
    assert got == expect


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=TEXTS)
def test_simhash_kernel_matches_expression(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    expr = sorted(map(tuple, simhash(df, text_col="text").collect()))
    kern = sorted(map(tuple, simhash(df, text_col="text", mode="kernel").collect()))
    assert expr == kern


def test_udtf_matches_declarative_twin(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.udtf_surface import (
        SeriesSegmentStats,
        series_segment_stats_declarative,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]), (2, [10.0, 20.0])],
        "sid long, features array<double>",
    )
    spark.udtf.register("seg_stats", SeriesSegmentStats)
    df.createOrReplaceTempView("ts_udtf_in")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT sid, s.* FROM ts_udtf_in, "
            "LATERAL seg_stats(features, 3) s"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in series_segment_stats_declarative(df, seg_len=3)
        .select("sid", "seg_idx", "seg_mean", "seg_min", "seg_max")
        .collect()
    )
    assert got == want
    # 7-long series -> 2 full segments; 2-long -> 0
    assert len(got) == 2
