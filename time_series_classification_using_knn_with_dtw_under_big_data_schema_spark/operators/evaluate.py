"""Accuracy evaluation (SURVEY.md §2.4 A7, §2.3 J4-fixed).

Reference: join predictions to the labeled test set and compute
correct/total with two count() actions (Team11-Project.py:208-227, 573-577),
joining on equality of the whole 561-dim feature vector (a §4 hazard). Ours
joins on the row id and computes the ratio in ONE aggregate job:

    avg( (pred == label) as double )
"""

from __future__ import annotations

from functools import reduce

from ..caching import register_cache
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


def k_sweep(
    test: DataFrame,
    train: DataFrame,
    *,
    ks: list[int],
    metric: str = "euclidean",
    strategy: str = "broadcast",
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
    band: "int | None" = None,
    fastdtw_radius: int = 1,
) -> DataFrame:
    """The reference's hyperparameter validation loop (Team11-Project.py:
    237-476: 'A manual for-loop is used for hyper-parameter fine-tuning',
    Report p.5 §IV.C) as ONE declarative query.

    The similarity join + max(ks) ranking runs ONCE; every k reuses the same
    neighbor table (the reference recomputed the full cross product per k —
    five ~20-minute cluster runs for five k values).

    Output: (k, n_rows, n_correct, accuracy), one row per k.
    """
    from .knn import knn_join
    from .vote import majority_vote

    neighbors = knn_join(
        test,
        train,
        metric=metric,
        k=max(ks),
        strategy=strategy,
        id_col=id_col,
        features_col=features_col,
        label_col=label_col,
        band=band,
        fastdtw_radius=fastdtw_radius,
    ).cache()
    register_cache(neighbors)
    truth = test.select(F.col(id_col).alias("test_id"), F.col(label_col))

    per_k = []
    for k in sorted(ks):
        pred = majority_vote(
            neighbors.filter(F.col("rank") <= k),
            key="test_id",
            label="train_label",
            rank="rank",
        )
        per_k.append(
            accuracy(pred, truth, key="test_id", label_col=label_col).select(
                F.lit(k).alias("k"), "n_rows", "n_correct", "accuracy"
            )
        )
    return reduce(DataFrame.unionByName, per_k)


def knn_cross_validate(
    series: DataFrame,
    *,
    folds: int = 4,
    k: int = 5,
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
    exclude_zero: bool = True,
) -> DataFrame:
    """k-fold cross-validation of the Euclidean KNN classifier in ONE plan
    — the fold analog of ``k_sweep``'s trick. The reference validates with
    a single held-out split (split_train_test); proper CV would re-run its
    full cross product per fold. Here EVERY row is a test row exactly once
    (its fold = id % folds) and its candidate neighbors are all rows of the
    OTHER folds — one cross join with a fold-inequality predicate scores
    all folds simultaneously.

    Output: (fold, n_test, n_correct, accuracy), one row per fold.

    Scale shape: identical pair volume to ONE train/test run over the whole
    corpus (the fold filter drops the 1/folds same-fold diagonal), vs
    ``folds`` separate cross products for loop-based CV; top-k is the same
    WindowGroupLimit window as q09, the vote/accuracy the same aggregates
    as q10/q12. ``exclude_zero`` carries the reference's dist != 0 quirk
    (Team11-Project.py:176-177) into every fold.
    """
    from ..functions.distance import sq_euclidean
    from .topk import topk_per_key
    from .vote import majority_vote

    if folds < 2:
        raise ValueError(f"folds must be >= 2, got {folds}")
    a = series.select(
        F.col(id_col).alias("test_id"),
        (F.col(id_col) % folds).alias("fold"),
        F.col(features_col).alias("_tf"),
        F.col(label_col).alias("actual"),
    )
    b = series.select(
        F.col(id_col).alias("train_id"),
        (F.col(id_col) % folds).alias("_bfold"),
        F.col(features_col).alias("_rf"),
        F.col(label_col).alias("train_label"),
    )
    pairs = a.join(b, F.col("_bfold") != F.col("fold")).withColumn(
        "_d", sq_euclidean(F.col("_tf"), F.col("_rf"))
    )
    if exclude_zero:
        pairs = pairs.filter(F.col("_d") != 0)
    topk = topk_per_key(
        pairs,
        "test_id",
        [F.asc("_d"), F.asc("train_label"), F.asc("train_id")],
        k,
    )
    pred = majority_vote(topk)
    joined = pred.join(
        a.select("test_id", "fold", "actual"), "test_id"
    )
    return joined.groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum(
            (F.col("predicted_label") == F.col("actual")).cast("long")
        ).alias("n_correct"),
        F.avg(
            (F.col("predicted_label") == F.col("actual")).cast("double")
        ).alias("accuracy"),
    )
