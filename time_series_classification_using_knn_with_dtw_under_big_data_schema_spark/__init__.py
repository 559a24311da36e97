"""PySpark-native time-series KNN/DTW analytics engine.

A brand-new, idiomatic DataFrame/Catalyst re-expression of the capabilities of
EmaanBashir/Time-Series-Classification-using-KNN-with-DTW-under-Big-Data-Schema
(reference: a Databricks notebook doing brute-force KNN classification over
fixed-length time series with Euclidean / FastDTW distances — see SURVEY.md).

Design rules (SURVEY.md §7):
- DataFrames end-to-end; no RDD API anywhere.
- One irreducible Python kernel: the DTW pandas_udf (Arrow-batched,
  numpy-vectorized across pair batches).
- Everything else is Catalyst-expressible: the KNN similarity join is
  crossJoin (+ optional broadcast hint) -> distance expression -> window
  top-k (WindowGroupLimit gives map-side partial top-k) -> mode vote.
"""

from . import functions, operators, sources  # noqa: F401

__version__ = "0.1.0"
