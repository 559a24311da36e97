"""Build engine-native series tables from the driver's relational testdata.

The reference's series come pre-shaped (561-point rows of UCI HAR,
Team11-Project.py:6). Our testdata is relational (`events`), so the engine
provides the bridge: per-key ordered value arrays via a single groupBy with
``array_sort(collect_list(struct(...)))`` — partial aggregation map-side, one
shuffle on the series key, deterministic order via the (ts, event_id) sort key.

Engine-native series schema (FIXTURES.md F2):
    series_id: long, features: array<double>, label: string
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def events_to_series(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str = "value",
    length: int | None = None,
    label_from: str | None = "event_type",
) -> DataFrame:
    """events(key, ts, value[, label_from]) -> (series_id, features[, label]).

    ``length``: keep only series with >= length points, truncated to exactly
    ``length`` (gives the fixed-width model the KNN operators assume; DTW
    itself accepts ragged series).
    ``label_from``: categorical column whose per-key mode becomes the label.
    Tie-break = lexicographically smallest among max-count values, so a SQL
    oracle can reproduce it exactly (same discipline as the vote operator,
    SURVEY.md §2.4 A5).
    """
    g = events.groupBy(key).agg(
        F.array_sort(
            F.collect_list(
                F.struct(F.col(ts).alias("t"), F.col(tiebreak).alias("tb"), F.col(value).alias("v"))
            )
        ).alias("_pts")
    )
    feats = F.transform(F.col("_pts"), lambda s: s["v"].cast("double"))
    if length is not None:
        g = g.filter(F.size("_pts") >= length)
        feats = F.slice(feats, 1, length)
    out = g.select(F.col(key).cast("long").alias("series_id"), feats.alias("features"))

    if label_from is not None:
        counts = events.groupBy(key, label_from).agg(F.count(F.lit(1)).alias("_n"))
        w = Window.partitionBy(key).orderBy(F.desc("_n"), F.asc(label_from))
        labels = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col(key).cast("long").alias("series_id"), F.col(label_from).alias("label"))
        )
        # one row per key — broadcast-sized relative to the events fact table
        out = out.join(labels, "series_id")
    return out


def split_train_test(series: DataFrame, *, modulus: int = 4, test_residue: int = 0):
    """Deterministic train/test split on the series id (oracle-reproducible)."""
    is_test = (F.col("series_id") % modulus) == test_residue
    return series.filter(~is_test), series.filter(is_test)
