"""Shapelet discovery — learn the single most class-discriminative
(subsequence, threshold) rule (Ye & Keogh 2009, "Time Series Shapelets";
engine extension past the reference's whole-series KNN surface,
Team11-Project.py has no subsequence learning at all).

The textbook algorithm scores every candidate subsequence by information
gain of its best distance split — float entropies whose ordering is
engine-fragile. This implementation keeps the ENTIRE search integer-exact
by scoring candidates with the classify.py stump criterion instead: the
(candidate, threshold, polarity) rule minimizing exact integer
misclassification error under a total order (the same split family;
minimum-error and maximum-gain pick the same boundary whenever classes are
separable, and the integer counts make every engine agree to the last
tie-break). The pipeline is the shapelet-transform shape:

1. CANDIDATES — a deterministic bounded set: the ``per_class``
   spread-hash-ranked series of every label (cluster.py's portable affine
   id hash — reproducible sampling, no RNG), each cut into windows of
   ``window`` points at ``stride``. Candidate count is
   n_labels * per_class * n_starts — broadcast-sized by construction.
2. MIN-DISTANCE FEATURES — for every (series, candidate): the minimum over
   window starts of the squared euclidean distance between the candidate
   and the series window (ascending-j fold, micro-rounded to BIGINT) — a
   pure codegen projection over the broadcast candidate table; the only
   corpus-sized stages are this scan and one groupBy(series) regroup.
3. RULE SEARCH — classify.py::train_stump over the per-series feature
   array (dim = candidate id): declarative, no driver loop, exact integer
   errors.

Output: ONE row of rule + provenance —
(cand_id, source_series_id, start, window, threshold_micro, polarity,
n_errors, n_total, shapelet array<double>).

Scale shape (100 TB): candidates are k rows (broadcast); the feature scan
is embarrassingly parallel; the stump's only corpus-sized stage is a
map-side partial aggregation (see train_stump). Nothing quadratic in the
corpus anywhere.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .classify import train_stump
from .cluster import _spread_hash

__all__ = ["shapelet_candidates", "shapelet_features", "shapelet_stump"]

_SCALE = 1_000_000


def _guarded_size(col, window: int):
    """Series length, or a CLEAR error when a series is shorter than the
    window (otherwise F.sequence runs descending into opaque index-0/OOB
    engine errors — review r6; the classify.py declarative-raise pattern,
    so the guard costs no extra pass over the corpus)."""
    return F.when(
        F.size(col) < window,
        F.raise_error(
            F.concat(
                F.lit(f"shapelet window={window} exceeds series length "),
                F.size(col).cast("string"),
            )
        ),
    ).otherwise(F.size(col))


def shapelet_candidates(
    series: DataFrame,
    *,
    window: int,
    stride: int,
    per_class: int = 2,
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """Deterministic bounded candidate subsequences.

    Per label: the ``per_class`` series ranked first by the portable
    spread hash (id tie-break), each cut at starts 1, 1+stride, ...
    (1-based, while start + window - 1 <= length). cand_id is a dense
    row_number over (label ASC, series_id ASC, start ASC) — the stable
    dim order the stump search and the oracle share.

    Output: (cand_id, source_series_id, label, start, shapelet).
    """
    if window < 1 or stride < 1 or per_class < 1:
        raise ValueError("window, stride, per_class must all be >= 1")
    w = Window.partitionBy(label_col).orderBy(
        _spread_hash(F.col(id_col)).asc(), F.col(id_col).asc()
    )
    picked = (
        series.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= per_class)
        .drop("_rk")
    )
    starts = F.sequence(
        F.lit(1), _guarded_size(F.col(features_col), window) - window + 1,
        F.lit(stride),
    )
    cands = picked.select(
        F.col(id_col).alias("source_series_id"),
        F.col(label_col).alias("label"),
        F.explode(starts).alias("start"),
        F.col(features_col).alias("_f"),
    ).select(
        "source_series_id",
        "label",
        "start",
        F.slice(F.col("_f"), F.col("start"), window).alias("shapelet"),
    )
    cw = Window.orderBy(
        F.asc("label"), F.asc("source_series_id"), F.asc("start")
    )
    # global row_number over a BOUNDED table (n_labels * per_class *
    # n_starts rows) — not the corpus-id hazard of SURVEY §4
    return cands.withColumn("cand_id", F.row_number().over(cw)).select(
        "cand_id", "source_series_id", "label", "start", "shapelet"
    )


def shapelet_features(
    series: DataFrame,
    candidates: DataFrame,
    *,
    window: int,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """Per-series min-subsequence-distance feature vector.

    For every (series, candidate): min over starts s of
    sum_j (x[s+j] - c[j+1])^2 (ascending-j fold — the engine's exact
    IEEE order), micro-rounded to BIGINT. Features are regrouped into one
    array per series ordered by cand_id.

    Output: (id_col, x array<bigint>) — train_stump's input shape.
    """
    dmin = F.array_min(
        F.transform(
            F.sequence(
                F.lit(1), _guarded_size(F.col(features_col), window) - window + 1
            ),
            lambda s: F.aggregate(
                F.sequence(F.lit(0), F.lit(window - 1)),
                F.lit(0.0),
                lambda acc, j: acc
                + (
                    F.element_at(F.col(features_col), s + j)
                    - F.element_at(F.col("shapelet"), j + 1)
                )
                * (
                    F.element_at(F.col(features_col), s + j)
                    - F.element_at(F.col("shapelet"), j + 1)
                ),
            ),
        )
    )
    pairs = series.crossJoin(
        F.broadcast(candidates.select("cand_id", "shapelet"))
    ).select(
        F.col(id_col),
        F.col("cand_id"),
        F.round(dmin * _SCALE).cast("long").alias("_dm"),
    )
    return pairs.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("cand_id", "_dm"))),
            lambda e: e["_dm"],
        ).alias("x")
    )


def shapelet_stump(
    series: DataFrame,
    *,
    window: int = 8,
    stride: int = 4,
    per_class: int = 2,
    target_label: Optional[str] = None,
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """End-to-end shapelet rule induction (module docstring).

    ``target_label``: the one-vs-rest positive class; default = the
    majority label ((count DESC, label ASC) total order — a bounded 1-row
    driver read, the classify.py collect-audit pattern).

    Output: 1 row — (cand_id int, source_series_id, start int,
    window int, threshold_micro bigint, polarity int, n_errors bigint,
    n_total bigint, shapelet array<double>).
    """
    from ..caching import register_cache

    # the pipeline reads the series table four times (majority label,
    # candidate ranking, the feature scan, the label join) — cache the
    # projected columns once (register_cache: LRU-evictable outside a
    # cache_scope) instead of recomputing the upstream series build per
    # consumer
    series = register_cache(
        series.select(id_col, features_col, label_col).cache()
    )
    if target_label is None:
        top = (
            series.groupBy(label_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .orderBy(F.desc("_n"), F.asc(label_col))
            .first()
        )
        if top is None:
            raise ValueError("empty series input")
        target_label = top[0]
    cands = shapelet_candidates(
        series,
        window=window,
        stride=stride,
        per_class=per_class,
        id_col=id_col,
        features_col=features_col,
        label_col=label_col,
    )
    feats = shapelet_features(
        series, cands, window=window, id_col=id_col, features_col=features_col
    )
    labeled = feats.join(
        series.select(
            F.col(id_col),
            F.when(F.col(label_col) == target_label, 1)
            .otherwise(-1)
            .alias("y"),
        ),
        id_col,
    )
    rule = train_stump(labeled, features_col="x", label_col="y")
    return (
        rule.join(
            F.broadcast(cands), rule["dim"] + 1 == cands["cand_id"]
        ).select(
            F.col("cand_id").cast("int").alias("cand_id"),
            "source_series_id",
            F.col("start").cast("int").alias("start"),
            F.lit(window).cast("int").alias("window"),
            F.col("threshold").alias("threshold_micro"),
            "polarity",
            "n_errors",
            "n_total",
            "shapelet",
        )
    )
