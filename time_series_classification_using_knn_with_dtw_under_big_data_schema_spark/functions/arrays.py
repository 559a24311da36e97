"""Array/series transforms used by the scale path (not in the reference —
engine extensions for 100 TB operation, SURVEY.md §4 'worth adding').

``paa`` (Piecewise Aggregate Approximation) powers the two-phase pruned KNN:
a cheap codegen'd lower-bound distance on PAA sketches prunes the cross
product before the exact (Python-kernel) DTW runs on survivors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def paa(arr: Column, n_segments: int, length: int) -> Column:
    """Piecewise Aggregate Approximation: mean of each of n_segments equal
    chunks of a fixed-``length`` array — pure SQL, codegen'd.
    """
    seg = length // n_segments
    segments = [
        F.aggregate(
            F.slice(arr, i * seg + 1, seg), F.lit(0.0), lambda acc, v: acc + v
        )
        / F.lit(float(seg))
        for i in range(n_segments)
    ]
    return F.array(*segments)


def znorm(arr: Column) -> Column:
    """Z-normalize a series (mean 0, std 1) — standard TS preprocessing."""
    n = F.size(arr).cast("double")
    mean = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / n
    var = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v * v) / n - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(1e-300)))
    return F.transform(arr, lambda v: (v - mean) / std)
