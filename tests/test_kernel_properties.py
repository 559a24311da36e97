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


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 2**20), min_size=1, max_size=12),
    st.integers(0, 2**20),
)
def test_zvalue_bits_invertible(xs, y):
    """The Morton interleave spec (sources/zorder.py::zvalue) is a bijection
    on clamped inputs: decoding the z-value's bit lanes recovers every
    clamped coordinate exactly. The pure-python mirror here IS the spec the
    Column expression implements (pinned cross-engine via q82's oracle)."""
    bits = 10
    cols = xs[:4] + [y]  # 2..5 dims
    ncols = len(cols)
    if ncols * bits > 63:
        return
    clamped = [min(max(v, 0), (1 << bits) - 1) for v in cols]
    z = 0
    for i, v in enumerate(clamped):
        for b in range(bits):
            z += ((v >> b) & 1) << (b * ncols + i)
    # decode
    back = []
    for i in range(ncols):
        v = 0
        for b in range(bits):
            v |= ((z >> (b * ncols + i)) & 1) << b
        back.append(v)
    assert back == clamped


@settings(max_examples=25, deadline=None)
@given(
    st.integers(2, 40),
    st.integers(2, 40),
    st.integers(1, 2),
    st.integers(0, 10_000),
)
def test_fastdtw_batch_pair_property(n, m, radius, seed):
    """fastdtw_batch == fastdtw_pair across arbitrary (n, m, radius) —
    hypothesis sweeps the ragged/edge shapes the fixed-size tests miss.
    fp-near-tied warp paths may legitimately diverge (bounded)."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import (
        fastdtw_batch,
        fastdtw_pair,
    )

    rng = np.random.default_rng(seed)
    A = np.cumsum(rng.standard_normal((6, n)), axis=1)
    B = np.cumsum(rng.standard_normal((6, m)), axis=1)
    got = fastdtw_batch(A, B, radius=radius)
    want = np.array([fastdtw_pair(a, b, radius=radius) for a, b in zip(A, B)])
    rel = np.abs(got - want) / np.maximum(np.abs(want), 1e-12)
    assert (rel < 1e-9).mean() >= 0.5
    assert rel.max() < 0.25


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 30),
    n_frames=st.integers(1, 6),
    seed=st.integers(0, 2**31),
)
def test_gif_codec_roundtrip_property(w, h, n_frames, seed):
    """encode -> decode is the identity for any frame geometry (identity
    grayscale palette makes luma == index, so equality is exact)."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.gif import (
        decode_gif_gray,
        encode_gif_gray,
    )

    rng = np.random.default_rng(seed)
    frames = [
        rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n_frames)
    ]
    back = decode_gif_gray(encode_gif_gray(frames))
    assert len(back) == n_frames
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))


def test_dtw_batch_seeded_shape_sweep():
    """Seeded mini-sweep over random (n, m, bs, band, radius) combinations
    — the fast permanent version of the r3 fuzz that caught the
    infeasible-band sentinel leak. Exact equality with the per-pair
    references, including inf rows."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import (
        dtw_batch,
        dtw_pair,
        fastdtw_batch,
        fastdtw_pair,
    )

    rng = np.random.default_rng(1234)
    for trial in range(12):
        n = int(rng.integers(2, 60))
        m = int(rng.integers(2, 60))
        bs = int(rng.integers(1, 8))
        A = np.cumsum(rng.normal(size=(bs, n)), axis=1)
        B = np.cumsum(rng.normal(size=(bs, m)), axis=1)
        band = [None, 0, 2, 9][trial % 4]
        got = dtw_batch(A, B, band=band)
        ref = np.array([dtw_pair(a, b, band=band) for a, b in zip(A, B)])
        assert np.array_equal(got, ref), (trial, n, m, bs, band)
        radius = [1, 2][trial % 2]
        got = fastdtw_batch(A, B, radius=radius)
        ref = np.array([fastdtw_pair(a, b, radius=radius) for a, b in zip(A, B)])
        # exact on the C route; numpy route may flip fp near-ties — accept
        # either exact equality or the documented tiny-divergence envelope
        rel = np.abs(got - ref) / np.maximum(ref, 1e-12)
        assert (rel < 0.05).all(), (trial, n, m, bs, radius)

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
