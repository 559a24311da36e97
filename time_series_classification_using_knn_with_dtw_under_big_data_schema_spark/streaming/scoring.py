"""Structured Streaming scoring (engine extension — the reference has no
streaming surface at all, SURVEY.md §2.8; its Report frames "real-time" as
motivation only).

Pattern: a stream of series scored against a STATIC broadcast train set —
stream-static join, fully supported by Structured Streaming:

    stream.crossJoin(broadcast(train)) -> distance -> per-row best-k via
    aggregation-free windowless min_by... except window functions aren't
    allowed on streams, so the top-k/vote is re-expressed as a streaming
    groupBy over (test row), which IS allowed in update/complete modes — or,
    for the common k=1 case, a plain min_by aggregate.

The k>1 vote path uses collect_list + slice inside one aggregate (bounded:
<= |train| elements per test row, and the train side is broadcast-static).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.distance import DISTANCES, make_dtw_udf, make_fastdtw_udf, sq_euclidean


def _metric_fn(metric: str, band: Optional[int], fastdtw_radius: int = 1):
    if metric == "euclidean":
        return None
    if metric == "dtw":
        return make_dtw_udf(band)
    if metric == "fastdtw":
        # same override rule as operators/knn.py: explicit band -> exact
        # banded DTW, else the faithful recursive kernel
        return (make_dtw_udf(band) if band is not None
                else make_fastdtw_udf(fastdtw_radius))
    return DISTANCES[metric]


def score_stream(
    stream: DataFrame,
    train: DataFrame,
    *,
    metric: str = "euclidean",
    k: int = 1,
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
    band: Optional[int] = None,
    fastdtw_radius: int = 1,
) -> DataFrame:
    """Score a stream of series against a static train set.

    Returns a streaming DataFrame (test_id, predicted_label) suitable for
    ``writeStream`` in update/complete output mode (it contains a streaming
    aggregation keyed on the stream row id).
    """
    t = stream.select(F.col(id_col).alias("test_id"), F.col(features_col).alias("_tf"))
    r = train.select(
        F.col(id_col).alias("train_id"),
        F.col(features_col).alias("_rf"),
        F.col(label_col).alias("train_label"),
    )
    pairs = t.join(F.broadcast(r))  # stream-static cross join
    fn = _metric_fn(metric, band, fastdtw_radius)
    dist = sq_euclidean(F.col("_tf"), F.col("_rf")) if fn is None else fn(
        F.col("_tf"), F.col("_rf")
    )
    pairs = pairs.withColumn("_d", dist).filter(F.col("_d") != 0)

    if k == 1:
        agg = pairs.groupBy("test_id").agg(
            F.min_by(
                F.col("train_label"), F.struct("_d", "train_label", "train_id")
            ).alias("predicted_label")
        )
        return agg

    # k > 1: gather (distance, label) pairs per test row, sort, slice k, vote
    # with the Counter-compatible tie order — all inside one aggregate so the
    # plan stays a single streaming groupBy.
    gathered = pairs.groupBy("test_id").agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct("_d", "train_label", "train_id"))),
            1,
            k,
        ).alias("_topk")
    )
    # votes: for each distinct label among the k, (count, first-rank); pick
    # max votes, then min first-rank, then label asc
    labels = F.transform(F.col("_topk"), lambda s: s["train_label"])
    distinct_labels = F.array_distinct(labels)
    # (votes DESC, first-position ASC) is a total order here: distinct labels
    # can't share a first position, so no further label tie-break is needed —
    # max of (votes, size - first_position) structs picks the winner, matching
    # the Counter.most_common insertion-order semantics (operators/vote.py).
    scored = F.transform(
        distinct_labels,
        lambda lab: F.struct(
            F.size(F.filter(labels, lambda x: x == lab)).alias("votes"),
            (F.size(labels) - F.array_position(labels, lab)).alias("neg_first"),
            lab.alias("lab"),
        ),
    )
    best = F.array_max(scored)
    return gathered.select("test_id", best["lab"].alias("predicted_label"))
