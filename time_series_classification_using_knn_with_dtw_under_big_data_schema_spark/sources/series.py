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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_to_series(
    events: DataFrame,
    *,
    key: str = "user_id",
    ts: str = "ts",
    tiebreak: str = "event_id",
    value: str | list[str] = "value",
    length: int | None = None,
    label_from: str | None = "event_type",
) -> DataFrame:
    """events(key, ts, value[, label_from]) -> (series_id, features[, label]).

    ``value`` may be a LIST of numeric columns — then each timestep is the
    vector of those channels and ``features`` is array<array<double>>
    (multichannel series; the DTW kernels score them with the per-channel
    summed cost — one shared warp path across channels). Same single-scan /
    single-shuffle plan either way.

    ``length``: keep only series with >= length points, truncated to exactly
    ``length`` (gives the fixed-width model the KNN operators assume; DTW
    itself accepts ragged series).
    ``label_from``: categorical column whose per-key mode becomes the label.
    Tie-break = lexicographically smallest among max-count values, so a SQL
    oracle can reproduce it exactly (same discipline as the vote operator,
    SURVEY.md §2.4 A5).

    Scale shape: ONE scan of the fact table and ONE shuffle on the series
    key. The label mode is folded out of the SAME collected array (sort the
    labels, run-length-scan for the longest run — ascending sort + strict
    "longer-wins" keeps the lexicographically-smallest max-count value,
    bit-matching the old groupBy+window path). The previous implementation
    aggregated events a second time for labels and window-joined — two full
    passes over what is THE big table at 100 TB.
    """
    multichannel = not isinstance(value, str)
    if multichannel:
        vexpr = F.array(*[F.col(c).cast("double") for c in value]).alias("v")
    else:
        vexpr = F.col(value).alias("v")
    pt_fields = [
        F.col(ts).alias("t"),
        F.col(tiebreak).alias("tb"),
        vexpr,
    ]
    if label_from is not None:
        # extra struct fields never affect array_sort order: (t, tb) is unique
        pt_fields.append(F.col(label_from).alias("l"))
    g = events.groupBy(key).agg(
        F.array_sort(F.collect_list(F.struct(*pt_fields))).alias("_pts")
    )
    if multichannel:
        feats = F.transform(F.col("_pts"), lambda s: s["v"])
    else:
        feats = F.transform(F.col("_pts"), lambda s: s["v"].cast("double"))
    if length is not None:
        g = g.filter(F.size("_pts") >= length)
        feats = F.slice(feats, 1, length)
    cols = [F.col(key).cast("long").alias("series_id"), feats.alias("features")]
    if label_from is not None:
        # mode with lex-smallest tie-break, computed from ALL of the key's
        # events (the length slice applies to features only, as before)
        lbls = F.array_sort(F.transform(F.col("_pts"), lambda s: s["l"]))
        zero = F.struct(
            F.lit(None).cast("string").alias("cur"),
            F.lit(0).alias("clen"),
            F.lit(None).cast("string").alias("best"),
            F.lit(0).alias("blen"),
        )

        def step(acc, x):
            clen = F.when(x == acc["cur"], acc["clen"] + 1).otherwise(F.lit(1))
            better = clen > acc["blen"]
            return F.struct(
                x.alias("cur"),
                clen.alias("clen"),
                F.when(better, x).otherwise(acc["best"]).alias("best"),
                F.when(better, clen).otherwise(acc["blen"]).alias("blen"),
            )

        cols.append(F.aggregate(lbls, zero, step)["best"].alias("label"))
    return g.select(*cols)


def split_train_test(series: DataFrame, *, modulus: int = 4, test_residue: int = 0):
    """Deterministic train/test split on the series id (oracle-reproducible)."""
    is_test = (F.col("series_id") % modulus) == test_residue
    return series.filter(~is_test), series.filter(is_test)
