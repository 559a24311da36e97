"""DTW kernel unit layer (FIXTURES.md F5 golden micro-cases + parity)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import (
    dtw_batch,
    dtw_pair,
    fastdtw_pair,
)


def test_identical_series_zero():
    assert dtw_pair([1, 2, 3], [1, 2, 3]) == 0.0
    assert fastdtw_pair([1, 2, 3, 4, 5, 6], [1, 2, 3, 4, 5, 6]) == 0.0


def test_golden_micro_cases():
    # [0,0,1] vs [0,1,1]: warping aligns perfectly -> 0
    assert dtw_pair([0, 0, 1], [0, 1, 1]) == 0.0
    # constant vs shifted constant: no warp helps; n * |delta|
    assert dtw_pair([1, 1, 1, 1], [2, 2, 2, 2]) == 4.0
    # one-element vs n-element: sum of |a - b_j|
    assert dtw_pair([5.0], [1.0, 2.0, 3.0]) == pytest.approx(4 + 3 + 2)
    # classic warp: [1,2,3] vs [1,1,2,2,3,3] aligns exactly
    assert dtw_pair([1, 2, 3], [1, 1, 2, 2, 3, 3]) == 0.0


def test_batch_matches_scalar_full_and_banded():
    rng = np.random.default_rng(7)
    A = rng.normal(size=(40, 31))
    B = rng.normal(size=(40, 31))
    assert np.allclose(dtw_batch(A, B), [dtw_pair(a, b) for a, b in zip(A, B)])
    assert np.allclose(
        dtw_batch(A, B, band=4), [dtw_pair(a, b, band=4) for a, b in zip(A, B)]
    )


def test_band_upper_bounds_exact():
    # constraining the path can only increase the optimum
    rng = np.random.default_rng(11)
    A = rng.normal(size=(20, 29))
    B = rng.normal(size=(20, 29))
    exact = dtw_batch(A, B)
    for band in (1, 3, 8):
        banded = dtw_batch(A, B, band=band)
        assert (banded >= exact - 1e-9).all()


def test_fastdtw_upper_bounds_exact_and_converges():
    rng = np.random.default_rng(13)
    for _ in range(10):
        a = rng.normal(size=23)
        b = rng.normal(size=23)
        exact = dtw_pair(a, b)
        prev = None
        f = fastdtw_pair(a, b, radius=1)
        assert f >= exact - 1e-9
        # radius big enough -> exact (window covers the full matrix)
        assert fastdtw_pair(a, b, radius=30) == pytest.approx(exact)


def test_ragged_lengths():
    assert dtw_pair([1, 2, 3, 4, 5], [1, 3, 5]) == pytest.approx(2.0)
    assert fastdtw_pair([1, 2, 3, 4, 5], [1, 3, 5]) == pytest.approx(2.0)


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=20),
    st.lists(st.floats(-100, 100, allow_nan=False), min_size=2, max_size=20),
)
def test_dtw_properties(a, b):
    d = dtw_pair(a, b)
    assert d >= 0
    # symmetry
    assert dtw_pair(b, a) == pytest.approx(d)
    # bounded above by aligning everything through the corner path
    ub = sum(abs(x - b[0]) for x in a) + sum(abs(a[-1] - y) for y in b)
    assert d <= ub + 1e-9
