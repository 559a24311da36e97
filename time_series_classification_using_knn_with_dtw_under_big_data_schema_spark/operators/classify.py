"""Learned quality filtering: a distributed, integer-exact averaged
perceptron (engine extension; BASELINE.json north-star "training-data
pipeline" family).

The reference (Team11-Project.py) is a lazy KNN classifier — it never
*trains* parameters. Large-scale curation pipelines do: the CCNet /
fastText recipe labels documents with a cheap seed signal (wiki vs crawl
membership, a length heuristic, an existing filter's verdict) and distills
it into a linear text classifier that can then be applied to the other
99.9% of the corpus where the seed signal is unavailable. This module is
that recipe as a Spark-first operator, built so a DuckDB oracle can
hash-check the *trained weights* — the same trick operators/cluster.py
uses for Lloyd's k-means:

- features are INTEGER counts centered by FIXED spec constants (never
  data statistics), so every margin/gradient is an exact int64;
- the batch update sums ``y * x`` over misclassified rows — an
  order-free integer partial aggregate, bit-identical under any
  partitioning;
- the *averaged* perceptron (Freund & Schapire 1999) sums the per-epoch
  weight vectors — again integers — which kills the oscillation plain
  batch perceptron shows on non-separable data (measured on the sf0.01
  corpus: plain 0.53 accuracy, averaged 0.99 at 4 epochs).

Scale shape (the whole point): one pass over the corpus per epoch —
weights ride into every executor as LITERALS (codegen'd fold, no join,
no broadcast variable), the gradient is a (dim)-keyed partial aggregate
whose reduce side is ``dim`` rows, and the only driver traffic is those
``dim`` rows per epoch (same bounded-collect contract as bpe.py's 1-row
argmax; plans/audit.py sees epochs x dim rows). Nothing corpus-sized ever
leaves the executors, nothing is cached — at 100 TB this is ``epochs``
column-pruned parquet scans, embarrassingly parallel.

Overflow envelope (int64): |weight| grows by at most n_docs * max|x| per
epoch; margins are bounded by dim * max|x| * |weight|. With |x| <= 2^12
and 4 epochs, margins stay under 2^63 up to ~10^12 documents — beyond
100 TB of text. Spark runs ANSI-off here, so the guard is the documented
envelope, not a runtime trap; keep features centered counts (small) and
epochs in single digits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens

__all__ = [
    "doc_quality_features",
    "train_quality_perceptron",
    "score_with_weights",
    "conformal_knn",
    "conformal_set",
]

# Fixed featurization spec: centering constants are part of the FEATURE
# DEFINITION (roughly the corpus-typical magnitudes), not data statistics
# — so featurization stays a stateless per-row projection and the oracle
# can restate it as literals. Bias stays uncentered at 1.
QUALITY_FEATURE_CENTERS = (0, 53, 8, 30, 20)
QUALITY_FEATURE_DIM = len(QUALITY_FEATURE_CENTERS)
LONG_TOKEN_LEN = 5


def doc_quality_features(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer feature vector per document: (id_col, x array<bigint>) with

        x = [1,
             n_tokens          - 53,
             n_stopword_tokens -  8,
             n_distinct_tokens - 30,
             n_long_tokens     - 20]   (long = len >= 5)

    Pure Catalyst expressions over the portable whitespace tokenization
    (functions/text.py::tokens) — no UDF, no shuffle, scan-bound.
    """
    toks = tokens(F.col(text_col))
    c = QUALITY_FEATURE_CENTERS
    x = F.array(
        F.lit(1).cast("long"),
        (F.size(toks) - F.lit(c[1])).cast("long"),
        (
            F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) - F.lit(c[2])
        ).cast("long"),
        (F.size(F.array_distinct(toks)) - F.lit(c[3])).cast("long"),
        (
            F.size(F.filter(toks, lambda t: F.length(t) >= LONG_TOKEN_LEN))
            - F.lit(c[4])
        ).cast("long"),
    )
    return df.select(F.col(id_col), x.alias("x"))


def _guarded_label(y, x, dim: int):
    """Data-plane validation fused into the training scan: ragged feature
    arrays and labels outside {-1, +1} raise loudly. NULL handling is
    explicit — ``~y.isin(-1, 1)`` is NULL (not true) for a NULL label, so
    a join-miss label would otherwise be silently FILTERED out of every
    epoch instead of raising."""
    return (
        F.when(
            F.size(x) != dim,
            F.raise_error(
                F.concat(
                    F.lit(f"ragged feature arrays: expected size {dim}, got "),
                    F.size(x).cast("string"),
                )
            ),
        )
        .when(
            y.isNull() | ~y.isin(-1, 1),
            F.raise_error(
                F.concat(
                    F.lit("perceptron label must be -1 or +1, got "),
                    F.coalesce(y.cast("string"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(y)
    )


def _margin(x_col, weights: list[int]):
    """Exact int64 margin sum_j x[j] * w[j] with the weights embedded as
    literals — whole-stage-codegen'd, no join against a weight table."""
    wlit = F.array(*[F.lit(int(w)).cast("long") for w in weights])
    return F.aggregate(
        F.zip_with(x_col, wlit, lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def train_quality_perceptron(
    df: DataFrame,
    *,
    epochs: int = 4,
    id_col: str = "doc_id",
    features_col: str = "x",
    label_col: str = "y",
    averaged: bool = True,
) -> DataFrame:
    """Distributed batch (averaged) perceptron over integer features.

    Input rows: (features_col array<bigint>, label_col int in {-1, +1}).
    Per epoch t:   margin_i = x_i . w_t            (int64, exact)
                   w_{t+1}  = w_t + sum_{i: y_i * margin_i <= 0} y_i x_i
    Averaged output (default): sum_t w_t — the Freund-Schapire averaged
    perceptron restricted to integer arithmetic, so it is ENGINE-EXACT:
    any oracle replaying the same epochs reproduces the weights bit-
    for-bit regardless of row order or partitioning.

    Output: (dim int, weight bigint) — ``dim`` rows, the model.

    Plan shape per epoch: one column-pruned corpus scan -> codegen'd
    margin filter (weights are literals) -> posexplode -> dim-keyed
    partial-agg sum -> ``dim`` rows collected (the bpe.py bounded-collect
    contract). Labels outside {-1, +1} raise at the first epoch via a
    data-plane guard.
    """
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    y = F.col(label_col)
    x = F.col(features_col)
    # dim probe: ONE row (LIMIT-1 scan, not a corpus aggregate — at 100 TB
    # a full min/max pass just for validation would double the epoch cost);
    # ragged arrays and bad labels are data-plane guards that fire inside
    # the first epoch's scan instead
    probe = df.select(F.size(x).alias("_n")).first()
    if probe is None:
        raise ValueError("training set is empty")
    dim = probe["_n"]
    guard = _guarded_label(y, x, dim)

    w = [0] * dim
    acc = [0] * dim
    for t in range(epochs):
        mis = df.select(guard.alias("_y"), x.alias("_x")).filter(
            F.col("_y").cast("long") * _margin(F.col("_x"), w) <= 0
        )
        grad_rows = (
            mis.select(F.col("_y"), F.posexplode("_x").alias("_dim", "_v"))
            .groupBy("_dim")
            .agg(F.sum(F.col("_y").cast("long") * F.col("_v")).alias("_g"))
            .collect()  # bounded: <= dim rows (audit-pinned)
        )
        g = {r["_dim"]: r["_g"] for r in grad_rows}
        w = [w[j] + g.get(j, 0) for j in range(dim)]
        acc = [acc[j] + w[j] for j in range(dim)]
    final = acc if averaged else w
    spark = df.sparkSession
    return spark.createDataFrame(
        [(j, int(final[j])) for j in range(dim)], "dim int, weight bigint"
    )


def perceptron_epoch_sweep(
    df: DataFrame,
    *,
    epochs: int = 4,
    features_col: str = "x",
    label_col: str = "y",
) -> DataFrame:
    """Training-curve sweep: the epochs analog of the reference's k-sweep
    (Team11-Project.py:237-476 sweeps KNN's k and reports accuracy per
    value; this sweeps the perceptron's one capacity knob and reports
    train accuracy of the AVERAGED model after each epoch — the model
    you would actually deploy at that stopping point).

    Output: (epoch int, n_correct bigint, n_total bigint, accuracy
    double) for epoch = 1..epochs. ``correct`` means the deployed
    decision matches the label: score > 0 for y = +1, score <= 0 for
    y = -1 (score == 0 predicts 'drop', the same contract as
    score_with_weights' ``kept``). Counts are exact integers, so the
    whole sweep is oracle-replayable; accuracy is the one double
    division. Per epoch: the training gradient pass + one count — both
    corpus scans, both order-free."""
    if epochs < 1:
        raise ValueError(f"epochs must be >= 1, got {epochs}")
    y = F.col(label_col)
    x = F.col(features_col)
    probe = df.select(F.size(x).alias("_n")).first()
    if probe is None:
        raise ValueError("training set is empty")
    dim = probe["_n"]
    # every pass (gradient AND count) reads through the guard — a bad or
    # NULL label raises in whichever scan hits it first
    df = df.select(
        _guarded_label(y, x, dim).alias(label_col), x.alias(features_col)
    )
    n_total = df.count()
    w = [0] * dim
    acc = [0] * dim
    rows = []
    for t in range(1, epochs + 1):
        mis = df.select(y.alias("_y"), x.alias("_x")).filter(
            F.col("_y").cast("long") * _margin(F.col("_x"), w) <= 0
        )
        grad_rows = (
            mis.select(F.col("_y"), F.posexplode("_x").alias("_dim", "_v"))
            .groupBy("_dim")
            .agg(F.sum(F.col("_y").cast("long") * F.col("_v")).alias("_g"))
            .collect()  # bounded: <= dim rows
        )
        g = {r["_dim"]: r["_g"] for r in grad_rows}
        w = [w[j] + g.get(j, 0) for j in range(dim)]
        acc = [acc[j] + w[j] for j in range(dim)]
        score = _margin(x, acc)
        n_correct = df.filter(
            ((y > 0) & (score > 0)) | ((y < 0) & (score <= 0))
        ).count()
        rows.append((t, int(n_correct), int(n_total)))
    spark = df.sparkSession
    out = spark.createDataFrame(
        rows, "epoch int, n_correct bigint, n_total bigint"
    )
    return out.select(
        "epoch",
        "n_correct",
        "n_total",
        (
            F.col("n_correct").cast("double") / F.col("n_total").cast("double")
        ).alias("accuracy"),
    )


def train_stump(
    df: DataFrame,
    *,
    features_col: str = "x",
    label_col: str = "y",
) -> DataFrame:
    """Exact decision-stump induction — threshold-RULE learning for
    filters ("which n_tokens cutoff best agrees with the seed label?"),
    the interpretable sibling of the perceptron. Unlike the perceptron
    this is FULLY declarative: no epochs, no driver loop, no collect —
    one plan Catalyst owns end to end.

    Searches every (feature dim, threshold, polarity) rule of the form

        predict +1 if x[dim] <= threshold else -1      (polarity +1)
        predict -1 if x[dim] <= threshold else +1      (polarity -1)

    over all OBSERVED feature values as thresholds, and returns the
    single rule with the fewest training errors (exact integer counts;
    total-order tie-break n_errors asc, dim asc, threshold asc, polarity
    desc). The constant rules are included for free: at threshold =
    max(x[dim]) polarity +1 predicts all +1, polarity -1 all -1.

    Plan shape: posexplode to (dim, value, y) -> ONE groupBy (dim,
    value) shuffle of per-value label counts -> ONE dim-partitioned
    running-sum window over the (dims x distinct values) table (NOT the
    corpus — the window input is pre-aggregated) -> global top-1
    (TakeOrderedAndProject, map-side partial). At 100 TB the only
    corpus-sized stage is the explode feeding the partial aggregation.

    Output: 1 row — (dim int, threshold bigint, polarity int,
    n_errors bigint, n_total bigint).
    """
    from pyspark.sql import Window

    y = F.col(label_col)
    x = F.col(features_col)
    ex = df.select(
        F.when(
            y.isNull() | ~y.isin(-1, 1),
            F.raise_error(
                F.concat(
                    F.lit("stump label must be -1 or +1, got "),
                    F.coalesce(y.cast("string"), F.lit("NULL")),
                )
            ),
        )
        .otherwise(y)
        .alias("_y"),
        F.posexplode(x).alias("_dim", "_v"),
    )
    per_value = ex.groupBy("_dim", "_v").agg(
        F.sum(F.when(F.col("_y") > 0, 1).otherwise(0)).alias("_pos"),
        F.sum(F.when(F.col("_y") < 0, 1).otherwise(0)).alias("_neg"),
    )
    w = Window.partitionBy("_dim").orderBy("_v")
    tot = Window.partitionBy("_dim")
    cum = per_value.select(
        "_dim",
        "_v",
        F.sum("_pos").over(w).alias("_cpos"),
        F.sum("_neg").over(w).alias("_cneg"),
        F.sum("_pos").over(tot).alias("_P"),
        F.sum("_neg").over(tot).alias("_N"),
    )
    # polarity +1: errors = negatives at/below threshold + positives above
    # polarity -1: the mirror
    cand = cum.select(
        "_dim",
        "_v",
        (F.col("_cneg") + F.col("_P") - F.col("_cpos")).alias("_err_pos"),
        (F.col("_cpos") + F.col("_N") - F.col("_cneg")).alias("_err_neg"),
        (F.col("_P") + F.col("_N")).alias("_total"),
    )
    rules = cand.select(
        "_dim", "_v", F.lit(1).alias("_pol"), F.col("_err_pos").alias("_err"), "_total"
    ).unionByName(
        cand.select(
            "_dim", "_v", F.lit(-1).alias("_pol"), F.col("_err_neg").alias("_err"), "_total"
        )
    )
    best = rules.orderBy(
        F.asc("_err"), F.asc("_dim"), F.asc("_v"), F.desc("_pol")
    ).limit(1)
    return best.select(
        F.col("_dim").cast("int").alias("dim"),
        F.col("_v").cast("bigint").alias("threshold"),
        F.col("_pol").cast("int").alias("polarity"),
        F.col("_err").cast("bigint").alias("n_errors"),
        F.col("_total").cast("bigint").alias("n_total"),
    )


def score_stump(
    df: DataFrame,
    stump: DataFrame,
    *,
    id_col: str = "doc_id",
    features_col: str = "x",
) -> DataFrame:
    """Apply a trained stump rule: (id_col, predicted int, kept boolean)
    with predicted = polarity if x[dim] <= threshold else -polarity and
    kept = predicted > 0. The 1-row rule broadcasts into the corpus scan
    — zero corpus shuffles, the same serve contract as
    score_with_weights."""
    j = df.select(F.col(id_col), F.col(features_col).alias("_x")).crossJoin(
        F.broadcast(stump)
    )
    pred = F.when(
        F.element_at(F.col("_x"), F.col("dim") + 1) <= F.col("threshold"),
        F.col("polarity"),
    ).otherwise(-F.col("polarity"))
    return j.select(
        F.col(id_col),
        pred.alias("predicted"),
        (pred > 0).alias("kept"),
    )


def pack_weights(weights: DataFrame) -> DataFrame:
    """(dim, weight) -> ONE row with the weight array sorted by dim — the
    broadcastable serve-side form. Shared by score_with_weights and the
    streaming twin (streaming/scoring.py::score_stream_quality) so the
    packing order can never diverge between batch and stream."""
    return weights.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "weight"))),
            lambda s: s["weight"],
        ).alias("_w")
    )


def packed_score(x_col) -> "F.Column":
    """Exact int64 dot of a feature array against the packed ``_w`` array
    (pack_weights) — the single definition of model application; batch
    and streaming both read it."""
    return F.aggregate(
        F.zip_with(x_col, F.col("_w"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def score_with_weights(
    df: DataFrame,
    weights: DataFrame,
    *,
    id_col: str = "doc_id",
    features_col: str = "x",
) -> DataFrame:
    """Apply a trained linear model: (id_col, score bigint, kept boolean)
    with score = x . w (exact int64) and kept = score > 0.

    Fully declarative — the ``dim``-row weight table aggregates to ONE
    array row (pack_weights) and broadcast-cross-joins into the corpus
    scan; the dot product is the same codegen'd fold as training. No
    collect, no corpus shuffle: the filter runs wherever the corpus
    lives, which is the serve-side contract a 100 TB filter needs.
    """
    score = packed_score(F.col(features_col))
    return (
        df.crossJoin(F.broadcast(pack_weights(weights)))
        .select(
            F.col(id_col),
            score.alias("score"),
            (score > 0).alias("kept"),
        )
    )


# metrics the conformal kernel path can score with PROVEN bit-identity to
# the declarative plan: the point folds re-accumulate in index order (the
# exact IEEE op sequence of the SQL left fold — numpy's pairwise .sum()
# would NOT be bit-equal), dtw shares the declarative path's own batch
# kernel, and the edit family's batch DPs are pinned bitwise against the
# Catalyst fold expressions (test_expressions_match_kernels_bitwise).
# chebyshev/cosine/sbd and callable metrics stay declarative (chebyshev's
# array_max null-skipping gives ragged pairs different semantics than the
# null-propagating folds; sbd_batch is an FFT — not bit-equal to the HOF
# definition).
_CONFORMAL_POINT_KINDS = frozenset({"euclidean", "sq_euclidean", "manhattan"})
_CONFORMAL_ELASTIC_KINDS = frozenset({"dtw", "lcss", "edr", "erp", "twed", "msm"})


def _conformal_dist_fns(kind: str):
    """(batch_fn, dist_block) for a conformal-kernel metric. batch_fn is
    the elastic batch DP (None for the point metrics); dist_block maps
    (nc, Lr) x (ng, Lg) -> (nc, ng) distances with the exact op order of
    the declarative folds."""
    import numpy as np

    if kind in ("lcss", "edr", "erp", "twed", "msm"):
        from ..functions.edit_distance import (
            edr_batch, erp_batch, lcss_batch, msm_batch, twed_batch,
        )

        batch_fn = {"lcss": lcss_batch, "edr": edr_batch, "erp": erp_batch,
                    "twed": twed_batch, "msm": msm_batch}[kind]
    elif kind == "dtw":
        from ..functions.dtw_kernel import dtw_batch

        batch_fn = lambda A, B: dtw_batch(A, B, band=None)  # noqa: E731
    else:
        batch_fn = None

    def _dist_block(Tc: "np.ndarray", G: "np.ndarray", Gt: "np.ndarray") -> "np.ndarray":
        """Point metrics accumulate with a j-loop (index order = the SQL
        left fold's IEEE sequence — reassociating BLAS forms are NOT
        bit-equal) over a contiguous TRANSPOSED proper matrix, tiled so
        the accumulator stays cache-resident across the L passes (an
        untiled j-loop re-streams the whole (nc, ng) accumulator from
        DRAM L times)."""
        nc, ng = Tc.shape[0], G.shape[0]
        if batch_fn is not None:
            A = np.repeat(Tc, ng, axis=0)
            B = np.tile(G, (nc, 1))
            return batch_fn(A, B).reshape(nc, ng)
        L = Tc.shape[1]
        out = np.empty((nc, ng))
        tile = max(256, 131_072 // max(1, nc))  # ~1 MB accumulator
        for t0 in range(0, ng, tile):
            t1 = min(ng, t0 + tile)
            acc = np.zeros((nc, t1 - t0))
            for j in range(L):
                d = Tc[:, j][:, None] - Gt[j, t0:t1][None, :]
                if kind == "manhattan":
                    np.abs(d, out=d)
                    acc += d
                else:
                    acc += d * d
            out[:, t0:t1] = np.sqrt(acc) if kind == "euclidean" else acc
        return out

    return batch_fn, _dist_block


def _conformal_proper_groups(rows):
    """proper (features, label) rows -> per-length (L, matrix,
    [(label, col_idx)]) groups — label->column indices precomputed once so
    each scoring chunk only slices."""
    import numpy as np

    from ..functions.distance import _stack_series

    by_len: dict = {}
    for r in rows:
        by_len.setdefault(len(r[0]), []).append(r)
    groups = []
    for L in sorted(by_len):
        g = by_len[L]
        mat = _stack_series([r[0] for r in g])
        labs = [r[1] for r in g]
        idx: dict = {}
        for i, lab in enumerate(labs):
            idx.setdefault(lab, []).append(i)
        groups.append(
            (L, mat, [(lab, np.asarray(ix, dtype=np.int64)) for lab, ix in idx.items()])
        )
    return groups


def _conformal_score_rows(
    feats, kvals: dict, keys: list, grps, batch_fn, dist_block,
) -> dict:
    """Score one block of side rows against the proper groups: min
    distance per (side row, proper label) under the declarative ``_mins``
    semantics (d != 0 exclusion keeps NaN; MIN is NaN-greatest; no row
    when no pair survives; point-metric length mismatches drop). Shared
    verbatim by the broadcast kernel and the over-budget grid cells, so
    their bit-identity contract is enforced by construction."""
    import numpy as np

    from ..functions.distance import _stack_series

    max_g = max(g[1].shape[0] for g in grps)
    gts = [
        np.ascontiguousarray(G.T) if batch_fn is None else None
        for (_L, G, _li) in grps
    ]
    # batch-kernel pair target mirrors _score_block_rows (~1024-pair DP
    # calls); the point folds chunk rows so the tiled accumulator plus row
    # block stay cache-resident
    rows_per = max(1, 1024 // max_g) if batch_fn is not None else 128
    out: dict = {k: [] for k in keys}
    out["_plab"] = []
    out["_dmin"] = []
    row_by_len: dict = {}
    for i, f in enumerate(feats):
        row_by_len.setdefault(len(f), []).append(i)
    for Lr, idxs in row_by_len.items():
        T = _stack_series([feats[i] for i in idxs])
        for c0 in range(0, len(idxs), rows_per):
            chunk = idxs[c0 : c0 + rows_per]
            Tc = T[c0 : c0 + rows_per]
            # per label accumulators across proper groups:
            # (min over non-NaN, any pair survived, any non-NaN)
            acc: dict = {}
            for gi, (Lg, G, labidx) in enumerate(grps):
                if batch_fn is None and Lg != Lr:
                    continue  # declarative null-fold drop
                D = dist_block(Tc, G, gts[gi])
                mask = D != 0  # NaN != 0 is True — kept, like SQL
                for lab, cols in labidx:
                    sub = D[:, cols]
                    msub = mask[:, cols]
                    nn = msub & ~np.isnan(sub)
                    mn = np.where(nn, sub, np.inf).min(axis=1)
                    prev = acc.get(lab)
                    if prev is None:
                        acc[lab] = [mn, msub.any(axis=1), nn.any(axis=1)]
                    else:
                        prev[0] = np.minimum(prev[0], mn)
                        prev[1] |= msub.any(axis=1)
                        prev[2] |= nn.any(axis=1)
            for lab, (mn, anyv, nnv) in acc.items():
                for r in np.nonzero(anyv)[0]:
                    for k in keys:
                        out[k].append(kvals[k][chunk[r]])
                    out["_plab"].append(lab)
                    out["_dmin"].append(
                        float(mn[r]) if nnv[r] else float("nan")
                    )
    return out


def _conformal_min_grid(proper: DataFrame, kind: str, proper_stats):
    """Over-budget twin of ``_conformal_min_kernel`` (r10, VERDICT r9 #6):
    when the proper split exceeds ``max_broadcast_bytes``, the min-per-
    (row, label) pass rides the KNN core's chunked BLOCK GRID instead of
    falling back to the interpreted crossJoin fold — min-per-label is a
    per-cell aggregate exactly like top-k: each (side-block x
    proper-block) cell emits its own per-(row, label) min through the
    SHARED scoring core (_conformal_score_rows), and a global
    groupBy(keys, label).MIN reduces the cells exactly (MIN is
    associative; a cell whose surviving pairs are all NaN emits NaN ->
    Arrow NULL, which the global MIN ignores unless every cell did — then
    the coalesce restores NaN; a (row, label) with no surviving pair in
    any cell emits no row). Traffic: each side crosses the wire
    n_opposing_blocks times instead of once per pair."""
    import numpy as np
    import pandas as pd

    n_rows, max_len = proper_stats
    label_sql_type = proper.schema["_plab"].dataType.simpleString()
    batch_fn, dist_block = _conformal_dist_fns(kind)
    spark = proper.sparkSession
    par = spark.sparkContext.defaultParallelism

    def mins(side: DataFrame, fcol: str, keys: list) -> DataFrame:
        from .similarity import _grid_split

        key_types = dict(side.dtypes)
        n_s, len_s = side.agg(
            F.count(F.lit(1)), F.max(F.size(fcol))
        ).first()
        n_s, len_s = int(n_s or 0), int(len_s or 0)
        L = max(max_len, 1)
        per_pair = L * L if batch_fn is not None else L
        bt, br = _grid_split(
            n_s * len_s * 8,
            n_rows * max_len * 8,
            max(n_s, 1),
            max(n_rows, 1),
            n_s * n_rows * per_pair,
            64 << 20,
            par,
        )
        null_keys = [
            F.lit(None).cast(key_types[k]).alias(k) for k in keys
        ]
        s_side = side.select(
            F.pmod(F.hash(F.col(keys[0])), F.lit(bt)).alias("_tblk"),
            F.explode(F.sequence(F.lit(0), F.lit(br - 1))).alias("_rblk"),
            F.lit(True).alias("_ist"),
            *[F.col(k) for k in keys],
            F.col(fcol).alias("_gf"),
            F.lit(None).cast(label_sql_type).alias("_glab"),
        )
        p_side = proper.select(
            F.explode(F.sequence(F.lit(0), F.lit(bt - 1))).alias("_tblk"),
            F.pmod(F.hash(F.col("_pid")), F.lit(br)).alias("_rblk"),
            F.lit(False).alias("_ist"),
            *null_keys,
            F.col("_pf").alias("_gf"),
            F.col("_plab").alias("_glab"),
        )
        out_schema = ", ".join(
            [f"{k} {key_types[k]}" for k in keys]
            + [f"_plab {label_sql_type}", "_dmin double"]
        )

        def cell(pdf: pd.DataFrame) -> pd.DataFrame:
            tm = pdf["_ist"].to_numpy()
            sp, pp = pdf[tm], pdf[~tm]
            cols = {k: [] for k in keys}
            cols["_plab"] = []
            cols["_dmin"] = []
            if len(sp) and len(pp):
                grps = _conformal_proper_groups(
                    list(zip(pp["_gf"].tolist(), pp["_glab"].tolist()))
                )
                kvals = {k: sp[k].to_numpy() for k in keys}
                cols = _conformal_score_rows(
                    sp["_gf"].to_numpy(), kvals, keys, grps, batch_fn, dist_block
                )
            return pd.DataFrame({c: cols[c] for c in
                                 list(keys) + ["_plab", "_dmin"]})

        n_parts = min(bt * br, max(par, 1) * 32)
        blocked = (
            s_side.unionByName(p_side)
            .repartition(n_parts, "_tblk", "_rblk")
            .groupBy("_tblk", "_rblk")
            .applyInPandas(lambda _, pdf: cell(pdf), schema=out_schema)
        )
        from ..caching import register_cache

        reduced = (
            blocked.groupBy(*keys, "_plab")
            .agg(F.min("_dmin").alias("_dmin"))
            .select(
                *keys,
                "_plab",
                F.coalesce("_dmin", F.lit(float("nan"))).alias("_dmin"),
            )
        )
        out = register_cache(reduced.cache())
        out.count()
        return out

    return mins


def _conformal_min_kernel(
    proper: DataFrame,
    kind: str,
    max_broadcast_bytes: int,
    min_kernel_pairs: int,
    cal_mod: int,
):
    """Kernel twin of conformal_knn's ``_mins`` (r9 optimization round):
    min distance per (side row, proper label) computed by ONE mapInPandas
    pass over the side against the broadcast proper split, instead of a
    crossJoin whose per-pair distance is an interpreted higher-order-
    function fold (Spark never codegens HOFs — measured 55.6 s for the
    ~3e9-pair 10x conformal soak, the largest entry in the whole bench).

    Returns a ``mins(side, fcol, keys) -> DataFrame`` closure, or None when
    no kernel path applies (empty proper side, a ragged proper side under
    a point metric, or a calibration pair volume below
    ``min_kernel_pairs``). An OVER-BUDGET proper side no longer falls back
    to the interpreted fold: it returns the chunked block-grid closure
    (r10, VERDICT r9 #6 — ``_conformal_min_grid``). The closure's output
    is bit-identical to the declarative ``_mins`` by construction:

    - point folds accumulate dim-by-dim ascending (IEEE sequence of the
      left fold); elastic metrics ride the bitwise-pinned batch kernels;
    - the ``d != 0`` pair exclusion keeps NaN distances (NaN != 0 is true
      in both engines) and MIN is NaN-greatest (Spark aggregate NaN
      semantics): non-NaN min when one exists, NaN when only NaN pairs
      survive, NO row when no pair survives;
    - point-metric side rows whose length differs from the proper length
      emit nothing — exactly the declarative null-fold -> null-filter drop
      (zip_with pads the short side with nulls, the fold goes null, and
      ``null != 0`` filters the pair);
    - the result is cached (register_cache + eager count, the
      knn_join_lb phase-table pattern) so the kernel runs ONCE and every
      downstream branch (csame/cdiff, the tmin self-join) scans the
      bounded (rows x labels) table — a mapInPandas node is not
      deduplicated across plan branches, and per-branch filter pushdown
      defeats Exchange reuse (measured: 6 python nodes without the cache,
      0 behind InMemoryTableScan with it).
    """
    import numpy as np
    import pandas as pd

    stats = proper.agg(
        F.count(F.lit(1)),
        F.max(F.size("_pf")),
        F.countDistinct(F.size("_pf")),
    ).first()
    n_rows, max_len, n_lens = int(stats[0] or 0), int(stats[1] or 0), int(stats[2] or 0)
    if not n_rows:
        return None
    if kind in _CONFORMAL_POINT_KINDS and n_lens != 1:
        return None
    if n_rows * max_len * 8 > max_broadcast_bytes:
        # over-budget proper split (r10, VERDICT r9 #6): ride the chunked
        # block grid instead of the interpreted crossJoin fold — the one
        # previously remaining interpreted-HOF-at-scale conformal path
        return _conformal_min_grid(proper, kind, (n_rows, max_len))
    # pair-volume gate (routing only — both branches are exact): the kernel
    # path pays a handful of fixed driver jobs (proper collect, two cache
    # populations), which at toy pair volumes costs more than the
    # interpreted fold it replaces (measured ~1 us/pair-fold declarative vs
    # a ~2-4 s kernel floor -> breakeven ~2M calibration pairs). The
    # calibration count is ESTIMATED from the proper count and the split
    # ratio (n_cal ~ n_proper / (cal_mod - 1)) so routing adds no job.
    if n_rows * n_rows // max(1, cal_mod - 1) < min_kernel_pairs:
        return None

    rows = proper.select("_pf", "_plab").collect()
    # per proper length: (matrix, [(label, col_idx array)]) — label->column
    # indices precomputed once so each batch only slices
    groups = _conformal_proper_groups(rows)
    bvar = proper.sparkSession.sparkContext.broadcast(groups)
    label_sql_type = proper.schema["_plab"].dataType.simpleString()

    batch_fn, _dist_block = _conformal_dist_fns(kind)

    def mins(side: DataFrame, fcol: str, keys: list) -> DataFrame:
        key_types = dict(side.dtypes)
        schema = ", ".join(
            [f"{k} {key_types[k]}" for k in keys]
            + [f"_plab {label_sql_type}", "_dmin double"]
        )

        def op(batches):
            grps = bvar.value
            for pdf in batches:
                feats = pdf[fcol].to_numpy()
                kvals = {k: pdf[k].to_numpy() for k in keys}
                out = _conformal_score_rows(
                    feats, kvals, keys, grps, batch_fn, _dist_block
                )
                yield pd.DataFrame(out)

        from ..caching import register_cache

        projected = side.select(*keys, fcol)
        # Arrow's from_pandas turns a float NaN into NULL; the kernel never
        # emits a legitimate NULL _dmin (pairless rows are skipped), so
        # coalesce restores the NaN the declarative MIN would have produced
        # (the motif.py profile_d sentinel pattern)
        mapped = projected.mapInPandas(op, schema=schema).select(
            *keys,
            "_plab",
            F.coalesce("_dmin", F.lit(float("nan"))).alias("_dmin"),
        )
        out = register_cache(mapped.cache())
        # land the bounded (rows x labels) table before the main job: lazy
        # caches re-run the kernel per consuming branch (the knn_join_lb
        # phase-table lesson, knn.py:1905)
        out.count()
        return out

    return mins


def conformal_knn(
    test: DataFrame,
    train: DataFrame,
    *,
    metric="euclidean",
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
    cal_mod: int = 3,
    cal_rem: int = 1,
    max_broadcast_bytes: int = 512 << 20,
    min_kernel_pairs: int = 1_000_000,
) -> DataFrame:
    """Split-conformal KNN classification (r6; Vovk et al., *Algorithmic
    Learning in a Random World* — the inductive/split variant): per test
    point and CANDIDATE label y, a p-value with a finite-sample validity
    guarantee (P(p_true <= eps) <= eps under exchangeability):

        train -> proper / calibration split (id % cal_mod == cal_rem)
        alpha(x, y) = min d(x, proper with label y)
                      / min d(x, proper with label != y)      (1-NN ratio)
        alpha_i     = same score for each calibration point at its TRUE label
        p(x, y)     = (#{alpha_i >= alpha(x, y)} + 1) / (n_cal + 1)

    Everything is joins + MIN aggregates + INTEGER rank counts + one
    division — no float accumulation anywhere, so p-values are exact
    rationals and hash cross-engine bit-for-bit. d is euclidean with the
    engine's d != 0 exclusion (P7); calibration points whose label is
    absent from the proper split drop out (no same-label distance exists).

    Output: (test_id, label, alpha, p_value) — one row per test x
    candidate label (candidates = the proper split's label set). Predict
    by max p; the runner-up p is the classic confidence complement.

    Scale: two cross joins against the BROADCAST proper split (the KNN
    pair volume, pre-aggregated by MIN before anything wide), one
    broadcast of the bounded calibration-score table. Nothing corpus x
    corpus beyond the KNN itself.

    ``metric`` (r7): any named DISTANCES entry or a Column callable —
    euclidean (default, q169) or an elastic metric ('twed' etc., q192:
    phase-shifted conformity scoring). Edit-family metrics keep the
    exact-rational p-value contract (order-independent per-cell DPs, one
    MIN, one division); the alpha ratio itself is exact for ANY metric
    whose distance is engine-reproducible.
    """
    from ..functions.distance import DISTANCES

    dist_fn = DISTANCES[metric] if isinstance(metric, str) else metric

    pid = F.col(id_col)
    proper = train.filter(F.pmod(pid, F.lit(cal_mod)) != cal_rem).select(
        pid.alias("_pid"), F.col(features_col).alias("_pf"), F.col(label_col).alias("_plab")
    )
    cal = train.filter(F.pmod(pid, F.lit(cal_mod)) == cal_rem).select(
        pid.alias("_cid"), F.col(features_col).alias("_cf"), F.col(label_col).alias("_clab")
    )

    # r9 optimization: route the min-per-label scoring through the guarded
    # kernel twin when the metric has a bit-identical batch kernel and the
    # proper split fits the broadcast budget; the declarative crossJoin +
    # interpreted HOF fold stays as the exact fallback (and the only path
    # for callable metrics, chebyshev/cosine/sbd, multichannel series, or
    # an over-budget proper split)
    kernel_mins = None
    if isinstance(metric, str) and metric in _CONFORMAL_POINT_KINDS | _CONFORMAL_ELASTIC_KINDS:
        from pyspark.sql.types import ArrayType

        if not isinstance(train.schema[features_col].dataType.elementType, ArrayType):
            kernel_mins = _conformal_min_kernel(
                proper, metric, max_broadcast_bytes, min_kernel_pairs, cal_mod
            )

    def _mins(side: DataFrame, fcol: str, keys: list[str]) -> DataFrame:
        if kernel_mins is not None:
            return kernel_mins(side, fcol, keys)
        pairs = side.crossJoin(F.broadcast(proper)).withColumn(
            "_d", dist_fn(F.col(fcol), F.col("_pf"))
        ).filter(F.col("_d") != 0)
        return pairs.groupBy(*keys, "_plab").agg(F.min("_d").alias("_dmin"))

    # calibration scores at the TRUE label
    cmin = _mins(cal, "_cf", ["_cid", "_clab"])
    csame = cmin.filter(F.col("_plab") == F.col("_clab")).select(
        "_cid", F.col("_dmin").alias("_ds")
    )
    cdiff = cmin.filter(F.col("_plab") != F.col("_clab")).groupBy("_cid").agg(
        F.min("_dmin").alias("_dd")
    )
    alphas = csame.join(cdiff, "_cid").select(
        (F.col("_ds") / F.col("_dd")).alias("_ai")
    )
    n_cal = alphas.agg(F.count(F.lit(1)).alias("_ncal"))

    # test scores per candidate label
    tmin = _mins(
        test.select(F.col(id_col).alias("test_id"), F.col(features_col).alias("_tf")),
        "_tf",
        ["test_id"],
    )
    tdiff = (
        tmin.alias("a")
        .join(tmin.alias("b"), "test_id")
        .filter(F.col("a._plab") != F.col("b._plab"))
        .groupBy(F.col("test_id"), F.col("a._plab").alias("label"))
        .agg(F.min(F.col("b._dmin")).alias("_dd"))
    )
    axy = (
        tmin.select("test_id", F.col("_plab").alias("label"), F.col("_dmin").alias("_ds"))
        .join(tdiff, ["test_id", "label"])
        .select("test_id", "label", (F.col("_ds") / F.col("_dd")).alias("alpha"))
    )
    # LEFT join on the rank condition (not a cross join + conditional sum):
    # an EMPTY calibration table then still preserves every test row with
    # _ge = 0, giving the correct degenerate p = 1/(n_cal+1) = 1 instead of
    # silently returning zero rows (r6 review fix)
    counted = (
        axy.join(F.broadcast(alphas), F.col("_ai") >= F.col("alpha"), "left")
        .groupBy("test_id", "label", "alpha")
        .agg(F.count(F.col("_ai")).cast("long").alias("_ge"))
    )
    return counted.crossJoin(F.broadcast(n_cal)).select(
        "test_id",
        "label",
        "alpha",
        (
            (F.col("_ge") + 1).cast("double")
            / (F.col("_ncal") + 1).cast("double")
        ).alias("p_value"),
    )


def conformal_set(
    test: DataFrame,
    train: DataFrame,
    *,
    eps: float = 0.1,
    metric="euclidean",
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
    cal_mod: int = 3,
    cal_rem: int = 1,
    max_broadcast_bytes: int = 512 << 20,
    min_kernel_pairs: int = 1_000_000,
) -> DataFrame:
    """Conformal PREDICTION SET at miscoverage level ``eps`` (r7): the
    labels whose conformal p-value exceeds eps,

        C_eps(x) = { y : p(x, y) > eps },

    with the split-conformal finite-sample guarantee
    P(y_true in C_eps(x)) >= 1 - eps under exchangeability (Vovk et al.)
    — the calibrated-uncertainty API a point prediction can't give: an
    ambiguous series gets a LARGER set, not a silently wrong label. The
    empirical coverage property is fuzz-swept (tools/fuzz_sweep.py
    conformal mode); the p-values are ``conformal_knn``'s exact
    rationals, so membership p > eps is an exact comparison, never a
    float-boundary coin flip (eps itself is the caller's literal).

    Output: one row per RETAINED (test_id, label) — (test_id, label,
    alpha, p_value); a test point with an empty set emits no rows (the
    honest "calibration says nothing conforms" answer). Scale: a filter
    over conformal_knn — nothing new moves.
    """
    p = conformal_knn(
        test,
        train,
        metric=metric,
        id_col=id_col,
        features_col=features_col,
        label_col=label_col,
        cal_mod=cal_mod,
        cal_rem=cal_rem,
        max_broadcast_bytes=max_broadcast_bytes,
        min_kernel_pairs=min_kernel_pairs,
    )
    return p.filter(F.col("p_value") > F.lit(float(eps)))
