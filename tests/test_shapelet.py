"""Shapelet discovery (r6, operators/shapelet.py): separable-bump
recovery, determinism, candidate geometry, feature exactness vs a pure
Python replay, and input guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    shapelet_candidates,
    shapelet_features,
    shapelet_stump,
)


def _bump_df(spark, n=40, length=16, lo=4, hi=8, amp=5.0, seed=3):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        x = rng.normal(size=length) * 0.3
        if i % 2 == 0:
            x[lo:hi] += amp
        rows.append((i, [float(v) for v in x], "a" if i % 2 == 0 else "b"))
    return spark.createDataFrame(
        rows, "series_id long, features array<double>, label string"
    )


def test_shapelet_recovers_separable_bump(spark):
    df = _bump_df(spark)
    out = shapelet_stump(df, window=4, stride=2, per_class=2).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_errors"] == 0  # the bump is perfectly separable
    assert r["n_total"] == 40
    assert r["window"] == 4
    assert len(r["shapelet"]) == 4
    # deterministic end to end
    out2 = shapelet_stump(df, window=4, stride=2, per_class=2).collect()
    assert [tuple(x) for x in out] == [tuple(x) for x in out2]


def test_shapelet_candidate_geometry(spark):
    df = _bump_df(spark, n=12)
    cands = shapelet_candidates(df, window=4, stride=4, per_class=2).collect()
    # 2 labels x 2 series x starts {1, 5, 9, 13} = 16 candidates
    assert len(cands) == 16
    ids = sorted(c["cand_id"] for c in cands)
    assert ids == list(range(1, 17))  # dense, 1-based
    for c in cands:
        assert len(c["shapelet"]) == 4
        assert 1 <= c["start"] <= 13
    # ordering: label asc, source id asc, start asc
    ordered = sorted(cands, key=lambda c: c["cand_id"])
    keys = [(c["label"], c["source_series_id"], c["start"]) for c in ordered]
    assert keys == sorted(keys)


def test_shapelet_features_match_python_replay(spark):
    df = _bump_df(spark, n=10)
    cands = shapelet_candidates(df, window=4, stride=4, per_class=1)
    feats = {
        r["series_id"]: list(r["x"])
        for r in shapelet_features(df, cands, window=4).collect()
    }
    series = {r["series_id"]: np.array(r["features"]) for r in df.collect()}
    cand_rows = sorted(cands.collect(), key=lambda c: c["cand_id"])
    for sid, x in series.items():
        for ci, c in enumerate(cand_rows):
            sh = np.array(c["shapelet"])
            dmin = min(
                float(((x[s : s + 4] - sh) ** 2).sum())
                for s in range(0, len(x) - 4 + 1)
            )
            assert feats[sid][ci] == round(dmin * 1_000_000), (sid, ci)


def test_shapelet_target_label_override_and_guards(spark):
    df = _bump_df(spark)
    # explicit minority target still learns a perfect rule (polarity flips)
    r = shapelet_stump(df, window=4, stride=2, per_class=2, target_label="b").collect()[0]
    assert r["n_errors"] == 0
    with pytest.raises(ValueError, match=">= 1"):
        shapelet_candidates(df, window=0, stride=2)
    with pytest.raises(ValueError, match="empty"):
        shapelet_stump(df.filter(F.lit(False)), window=4, stride=2)


def test_shapelet_short_series_raise_clearly(spark):
    """Review r6 regression: a series shorter than the window anywhere in
    the corpus must produce a CLEAR error naming the window and length,
    not an opaque descending-sequence/index engine failure."""
    df = _bump_df(spark, n=8)
    short = spark.createDataFrame(
        [(100, [1.0, 2.0], "a")],
        "series_id long, features array<double>, label string",
    )
    with pytest.raises(Exception, match="window=4 exceeds series length 2"):
        shapelet_stump(df.unionByName(short), window=4, stride=2).collect()
    with pytest.raises(Exception, match="window=4 exceeds series length"):
        shapelet_candidates(short, window=4, stride=2).collect()
