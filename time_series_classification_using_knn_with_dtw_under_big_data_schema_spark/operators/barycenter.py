"""DTW Barycenter Averaging (DBA — Petitjean, Ketterlin & Gançarski,
Pattern Recognition 2011): the warping-aware mean of a set of series.
k-medoids (cluster.py::ts_kmedoids) picks a representative FROM the
corpus; DBA refines it into a true average — each barycenter coordinate
becomes the mean of every member value its position aligns to under DTW.
Together they are DTW k-means: assign with ts_kmedoids, average with
dba_update.

Determinism for oracle parity (the engine's integer playbook, applied to
a warping PATH for the first time): costs are micro-quantized BEFORE the
dynamic program (|a-b| -> round(*1e6) int64), so the DP table is exact
integer arithmetic on any engine, and the backtrace tie rule is a fixed
preference order (diagonal, then up, then left, on <=). That makes the
whole alignment — not just the distance — bit-reproducible by a DuckDB
recursive-CTE twin: one recursion builds the integer DP table, a second
walks the path. Aligned values aggregate as micro-int64 sums (order-free
under distributed partial aggregation) with ONE final IEEE division.

Scale shape (100 TB): each member aligns against its cluster's tiny
barycenter (broadcast k rows); the per-pair DP is O(len^2) inside an
Arrow-batched kernel; the update is one (cluster, position) groupBy of
integer partial sums — never a member x member join. One DBA iteration =
one corpus scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["dba_classify", "dba_update", "dtw_kmeans_dba", "dtw_path_int"]

_SCALE = 1_000_000


def dtw_path_int(a_micro, b_micro) -> list:
    """Full-matrix integer DTW + deterministic backtrace.

    ``a_micro``/``b_micro`` are int sequences (micro-quantized values);
    cost(i, j) = |a[i] - b[j]| (already integer). Returns the warping
    path as a list of (i, j) 1-based pairs, (1,1) .. (n,m), in path
    order. Tie rule at each step back from (i, j): prefer diagonal, then
    up (i-1, j), then left (i, j-1), on <= comparisons — mirrored
    verbatim by the SQL twin."""
    a = [int(x) for x in a_micro]
    b = [int(x) for x in b_micro]
    n, m = len(a), len(b)
    INF = float("inf")
    D = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c = abs(a[i - 1] - b[j - 1])
            if i == 1 and j == 1:
                D[i][j] = c
            elif i == 1:
                D[i][j] = c + D[1][j - 1]
            elif j == 1:
                D[i][j] = c + D[i - 1][1]
            else:
                D[i][j] = c + min(D[i - 1][j - 1], D[i - 1][j], D[i][j - 1])
    path = []
    i, j = n, m
    while True:
        path.append((i, j))
        if i == 1 and j == 1:
            break
        if i == 1:
            j -= 1
        elif j == 1:
            i -= 1
        else:
            diag, up, left = D[i - 1][j - 1], D[i - 1][j], D[i][j - 1]
            if diag <= up and diag <= left:
                i, j = i - 1, j - 1
            elif up <= left:
                i -= 1
            else:
                j -= 1
    path.reverse()
    return path


def dba_update(
    members: DataFrame,
    barycenters: DataFrame,
    *,
    features_col: str = "features",
    bary_id_col: str = "bary_id",
    bary_features_col: str = "bary_features",
) -> DataFrame:
    """One DBA iteration: align every member series to its assigned
    barycenter (integer-quantized DTW path), then average the member
    values aligned to each barycenter position.

    ``members``: (features_col, bary_id_col[, anything else — ignored]) —
    each series with its cluster's barycenter id (e.g. ts_kmedoids output, medoid_id as
    bary_id). ``barycenters``: (bary_id_col, bary_features_col).

    Output: (bary_id_col, pos, n_aligned, bary) — pos 1-based over the
    barycenter length, n_aligned the number of (member, position) pairs
    aligned there, bary the updated coordinate = micro-int sum / (count *
    1e6) in ONE IEEE division. Feed back as the next iteration's
    barycenter (classic DBA fixed-point loop)."""
    b = barycenters.select(
        F.col(bary_id_col).alias("_bid"),
        F.col(bary_features_col).alias("_bf"),
    )
    m = members.select(
        F.col(bary_id_col).alias("_bid"),
        F.col(features_col).alias("_mf"),
    )
    paired = m.join(F.broadcast(b), "_bid")

    # micro-quantize both sides (the decision arithmetic); member RAW
    # micro values ride along for the averaged sum
    to_micro = lambda c: F.transform(c, lambda x: F.round(x * _SCALE).cast("long"))
    paired = paired.select(
        "_bid",
        to_micro(F.col("_mf")).alias("_mm"),
        to_micro(F.col("_bf")).alias("_bm"),
    )

    out_t = T.ArrayType(
        T.StructType(
            [
                T.StructField("pos", T.IntegerType()),
                T.StructField("val", T.LongType()),
            ]
        )
    )

    @F.pandas_udf(out_t)
    def align(bm: pd.Series, mm: pd.Series) -> pd.Series:
        res = []
        for bary, mem in zip(bm, mm):
            path = dtw_path_int(bary, mem)
            res.append([(int(i), int(mem[j - 1])) for i, j in path])
        return pd.Series(res)

    aligned = paired.select(
        "_bid", F.explode(align(F.col("_bm"), F.col("_mm"))).alias("_a")
    ).select("_bid", F.col("_a.pos").alias("pos"), F.col("_a.val").alias("_v"))
    return (
        aligned.groupBy("_bid", "pos")
        .agg(F.count(F.lit(1)).alias("n_aligned"), F.sum("_v").alias("_s"))
        .select(
            F.col("_bid").alias(bary_id_col),
            "pos",
            F.col("n_aligned").cast("int").alias("n_aligned"),
            (
                F.col("_s").cast("double")
                / (F.col("n_aligned") * F.lit(_SCALE)).cast("double")
            ).alias("bary"),
        )
    )


def dtw_kmeans_dba(
    series: DataFrame,
    *,
    k: int = 4,
    iters: int = 1,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """DTW k-means (Petitjean-style): k-medoids seeds the clusters
    (ts_kmedoids — deterministic, oracle-exact), then each iteration runs
    one DBA barycenter update followed by reassignment of every series to
    its nearest REFINED barycenter under exact DTW (micro-rounded before
    the argmin, (dist, cluster) total-order tie-break).

    This is the full warping-aware k-means loop the reference's
    classification-only surface never had: medoids give a robust integer-
    exact seed, DBA moves the centers off the corpus onto true warping
    averages, and the assignment stays a broadcast k-row cross join (one
    corpus scan per iteration — the Lloyd shape, with DTW instead of
    euclidean and DBA instead of the mean).

    Output: (id_col, cluster, dist_micro) — cluster is the seeding
    medoid's series id (stable across iterations), dist_micro the final
    micro-rounded DTW distance to the iteration's refined barycenter.

    Empty-cluster edge (iters >= 2, documented Lloyd behavior like
    ts_kmedoids' duplicate-seed note): if a reassignment pass empties a
    cluster, the next DBA update emits no rows for it and the effective
    k shrinks — exactly what Lloyd's k-means does with an empty cell."""
    from .cluster import ts_kmedoids
    from ..functions.distance import make_dtw_udf

    from ..caching import register_cache

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    dtw = make_dtw_udf(None)
    s = series.select(F.col(id_col).alias("_id"), F.col(features_col).alias("_f"))

    # BOUNDED (one (id, cluster) row per series) and consumed by two
    # branches (members + the medoid->barycenter seed join) — uncached,
    # the whole k-medoids DAG (kernel DTW stages included) re-executes
    # per branch. register_cache: LRU-evictable outside a cache_scope.
    asn = register_cache(
        ts_kmedoids(
            series, k=k, metric="dtw", id_col=id_col, features_col=features_col
        )
        .select(F.col(id_col).alias("_id"), F.col("medoid_id").alias("_bid"))
        .cache()
    )
    meds = asn.select(F.col("_bid")).distinct()
    barys = meds.join(s, meds["_bid"] == s["_id"]).select(
        F.col("_bid").alias("bary_id"), F.col("_f").alias("bary_features")
    )

    out = None
    for _ in range(iters):
        members = s.join(asn, "_id").select(
            F.col("_id").alias(id_col),
            F.col("_f").alias(features_col),
            F.col("_bid").alias("bary_id"),
        )
        upd = dba_update(members, barys, features_col=features_col)
        # k rows; feeds the broadcast scoring AND (next iter) the update.
        # LAZY localCheckpoint, not cache (r6, VERDICT r5 #4): cache()
        # leaves the full prior iteration nested in the logical plan, so
        # the plan grew linearly with iters (analysis cost + debug noise);
        # the checkpoint truncates to a flat LogicalRDD once the first
        # consumer materializes it — same dedup_components pattern.
        # Superseded generations are reclaimed by the ContextCleaner when
        # the loop rebinds the name.
        barys = _rebuild_barys(upd).localCheckpoint(eager=False)
        scored = s.crossJoin(
            F.broadcast(
                barys.select(
                    F.col("bary_id").alias("_bid"),
                    F.col("bary_features").alias("_bf"),
                )
            )
        ).withColumn(
            "_dm", F.round(dtw(F.col("_f"), F.col("_bf")) * _SCALE).cast("long")
        )
        out = (
            scored.groupBy("_id")
            .agg(
                F.min_by(
                    F.struct("_bid", "_dm"), F.struct("_dm", "_bid")
                ).alias("_m")
            )
            .select(
                "_id",
                F.col("_m._bid").alias("_bid"),
                F.col("_m._dm").alias("_dm"),
            )
        )
        # per-iteration assignment: lazy checkpoint bounds the NEXT
        # iteration's plan (never materialized on the last pass)
        asn = out.select("_id", "_bid").localCheckpoint(eager=False)
    return out.select(
        F.col("_id").alias(id_col),
        F.col("_bid").alias("cluster"),
        F.col("_dm").alias("dist_micro"),
    )


def _rebuild_barys(upd: DataFrame, bary_id_col: str = "bary_id") -> DataFrame:
    """(bary_id, bary_features) from a dba_update output: coordinates
    re-assembled position-ascending (the kmeans _refit array trick)."""
    return upd.groupBy(bary_id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "bary"))),
            lambda e: e["bary"],
        ).alias("bary_features")
    )


def dba_classify(
    test: DataFrame,
    train: DataFrame,
    *,
    iters: int = 1,
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """Nearest-DBA-prototype classification — the SCALE alternative to the
    reference's KNN for its own problem: train ONE barycenter per class
    (supervised DBA: members are grouped by their label, assignments never
    move), then label each test series by its nearest class prototype
    under exact DTW. Scoring cost drops from O(n_test * n_train) pair
    distances (the reference's cross join, Team11-Project.py:190/528) to
    O(n_test * n_classes) — at 100 TB the train corpus is touched once
    per DBA iteration and never joined against the test side at all.
    The classic nearest-centroid/prototype method (Petitjean et al. use
    exactly this as DBA's motivating application).

    Determinism: per-class seed = the member with the smallest portable
    spread hash (tie: id); DBA alignment/update integer-exact as in
    dba_update; final argmin on micro-rounded distances with
    (dist, label) total-order ties.

    Output: (test_id, predicted_label, dist_micro)."""
    from .cluster import _spread_hash
    from ..functions.distance import make_dtw_udf

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    dtw = make_dtw_udf(None)
    seeds = (
        train.withColumn("_h", _spread_hash(F.col(id_col)))
        .groupBy(F.col(label_col).alias("bary_id"))
        .agg(
            F.min_by(
                F.col(features_col), F.struct("_h", id_col)
            ).alias("bary_features")
        )
    )
    from ..caching import register_cache

    members = train.select(
        F.col(id_col),
        F.col(features_col),
        F.col(label_col).alias("bary_id"),
    )
    barys = seeds
    for _ in range(iters):
        upd = dba_update(members, barys, features_col=features_col)
        # k rows (one prototype per class) — broadcast into scoring
        barys = register_cache(_rebuild_barys(upd).cache())
    scored = (
        test.select(
            F.col(id_col).alias("test_id"), F.col(features_col).alias("_f")
        )
        .crossJoin(
            F.broadcast(
                barys.select(
                    F.col("bary_id").alias("_bid"),
                    F.col("bary_features").alias("_bf"),
                )
            )
        )
        .withColumn(
            "_dm", F.round(dtw(F.col("_f"), F.col("_bf")) * _SCALE).cast("long")
        )
    )
    return (
        scored.groupBy("test_id")
        .agg(
            F.min_by(F.struct("_bid", "_dm"), F.struct("_dm", "_bid")).alias("_m")
        )
        .select(
            "test_id",
            F.col("_m._bid").alias("predicted_label"),
            F.col("_m._dm").alias("dist_micro"),
        )
    )
