"""Majority-vote (mode) aggregate (SURVEY.md §2.4 A5).

Reference: ``Counter(labels).most_common(1)[0][0]`` over the k nearest labels
(Team11-Project.py:162-163, 343-344). ``Counter.most_common`` breaks count
ties by insertion order; the labels were inserted in distance-sorted order, so
the tied label containing the NEAREST neighbor wins. Reproduced exactly and
deterministically: rank candidate labels by

    (votes DESC, best_rank ASC, label ASC)

where best_rank = the label's nearest member's rank. The trailing label ASC
makes the op total-order deterministic even when two tied labels share a
best_rank (impossible when rank comes from row_number, kept for safety).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def majority_vote(
    neighbors: DataFrame,
    key: str = "test_id",
    label: str = "train_label",
    rank: str = "rank",
    *,
    out_col: str = "predicted_label",
) -> DataFrame:
    """(key, label, rank) neighbor rows -> one (key, out_col) row per key."""
    votes = neighbors.groupBy(key, label).agg(
        F.count(F.lit(1)).alias("votes"), F.min(rank).alias("best_rank")
    )
    w = Window.partitionBy(key).orderBy(
        F.desc("votes"), F.asc("best_rank"), F.asc(label)
    )
    return (
        votes.withColumn("_vrk", F.row_number().over(w))
        .filter(F.col("_vrk") == 1)
        .select(F.col(key), F.col(label).alias(out_col))
    )


def weighted_vote(
    neighbors: DataFrame,
    key: str = "test_id",
    label: str = "train_label",
    dist: str = "d",
    rank: str = "rank",
    *,
    out_col: str = "predicted_label",
) -> DataFrame:
    """Distance-weighted KNN vote (the standard wkNN refinement of the
    reference's unweighted ``Counter`` vote, Team11-Project.py:162): each
    neighbor contributes weight 1 / (1 + d), so a tight nearest neighbor
    outvotes two distant ones. Winner by (weight_sum DESC, best_rank ASC,
    label ASC).

    Determinism discipline: float weight sums are order-sensitive, so the
    per-label fold runs over the RANK-SORTED neighbor array (array_sort of
    a (rank, d) struct — rank is unique), never a groupBy float sum whose
    order Spark doesn't define. k is small, so the collected array is
    bounded; the DuckDB oracle folds the identical list(… ORDER BY rank).
    """
    g = neighbors.groupBy(key, label).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(rank).alias("r"), F.col(dist).alias("_d")))
        ).alias("_nb"),
        F.min(rank).alias("best_rank"),
    )
    wsum = F.aggregate(
        F.col("_nb"),
        F.lit(0.0),
        lambda a, x: a + F.lit(1.0) / (F.lit(1.0) + x["_d"]),
    )
    w = Window.partitionBy(key).orderBy(
        F.desc("_wsum"), F.asc("best_rank"), F.asc(label)
    )
    return (
        g.withColumn("_wsum", wsum)
        .withColumn("_vrk", F.row_number().over(w))
        .filter(F.col("_vrk") == 1)
        .select(F.col(key), F.col(label).alias(out_col), F.col("_wsum").alias("weight"))
    )


def knn_regress_predict(
    neighbors: DataFrame,
    key: str = "test_id",
    target: str = "train_target",
    rank: str = "rank",
    *,
    out_col: str = "prediction",
) -> DataFrame:
    """KNN regression: predict the mean of the k nearest neighbors' numeric
    targets (the regression twin of the majority vote). The mean folds over
    the RANK-SORTED neighbor array — deterministic float order, mirrored by
    the oracle's list(target ORDER BY rank) fold."""
    g = neighbors.groupBy(key).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(rank).alias("r"), F.col(target).alias("_t")))
        ).alias("_nb")
    )
    s = F.aggregate(F.col("_nb"), F.lit(0.0), lambda a, x: a + x["_t"])
    return g.select(
        F.col(key),
        (s / F.size("_nb").cast("double")).alias(out_col),
    )
