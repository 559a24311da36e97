"""Accuracy evaluation (SURVEY.md §2.4 A7, §2.3 J4-fixed).

Reference: join predictions to the labeled test set and compute
correct/total with two count() actions (Team11-Project.py:208-227, 573-577),
joining on equality of the whole 561-dim feature vector (a §4 hazard). Ours
joins on the row id and computes the ratio in ONE aggregate job:

    avg( (pred == label) as double )
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def accuracy(
    predictions: DataFrame,
    truth: DataFrame,
    *,
    key: str = "test_id",
    pred_col: str = "predicted_label",
    label_col: str = "label",
) -> DataFrame:
    """One-row DataFrame: (n_rows, n_correct, accuracy)."""
    joined = predictions.join(truth.select(key, label_col), key)
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col(pred_col) == F.col(label_col)).cast("long")).alias("n_correct"),
        F.avg((F.col(pred_col) == F.col(label_col)).cast("double")).alias("accuracy"),
    )
