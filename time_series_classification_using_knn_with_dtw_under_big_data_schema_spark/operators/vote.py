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
