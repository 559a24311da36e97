"""Subsequence analytics: sliding windows, matrix profile, motifs/discords,
bag-of-patterns classification.

Engine extensions beyond the reference's whole-series KNN
(Team11-Project.py classifies complete 561-point vectors): the standard
subsequence toolkit for time-series mining —

* ``subsequence_windows``: slide length-``m`` windows over each series
  (per-row explode, zero shuffles).
* ``matrix_profile``: each window's nearest non-trivial neighbor WITHIN its
  series (Yeh et al. 2016, "Matrix Profile I") — the basis for motif
  (repeated pattern) and discord (anomaly) discovery.
* ``series_discords``: per-series argmax/argmin of the profile.
* ``motif_words`` / ``bop_histograms`` / ``bop_classify``: SAX-word
  bucketing of windows — corpus-scale motif counting and the
  Bag-of-Patterns classifier (Lin et al. 2012), whose histogram distance is
  INTEGER arithmetic (exact cross-engine, no float-order hazards).

Scale shape: window extraction is map-only; the matrix-profile self-join
shuffles once on series_id and is per-key quadratic in (length - m + 1) —
bounded by series length, never corpus size. SAX-word bucketing shuffles
windows once on the word (vocabulary <= alphabet^segments, bounded);
``bop_classify`` moves 2 ints per (test, train) pair plus a sparse
word-join dot product — the byte-frugal analog of the reference's
raw-vector cross join. Left-fold arithmetic only (NOTES invariant); the
DuckDB oracles mirror every fold.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.arrays import znorm
from ..functions.distance import sq_euclidean
from .sax import codes_to_word, sax_codes
from .topk import topk_per_key
from .vote import majority_vote


def subsequence_windows(
    series: DataFrame,
    m: int,
    *,
    features_col: str = "features",
    znormalize: bool = True,
    step: int = 1,
) -> DataFrame:
    """(series_id, features, ...) -> one row per sliding window:
    (series_id, ..., start (1-based), win array<double> of length m).

    ``znormalize`` z-normalizes EACH WINDOW (the matrix-profile convention:
    shape similarity, offset/amplitude invariant). Map-only explode — the
    fan-out factor is (length - m + 1) / step, independent of corpus size.
    """
    if m < 1 or step < 1:
        raise ValueError(f"m and step must be >= 1, got m={m} step={step}")
    arr = F.col(features_col)
    # sequence(a, b) DESCENDS when b < a (NOTES invariant) — guard short rows
    starts = F.when(
        F.size(arr) >= m,
        F.sequence(F.lit(1), F.size(arr) - m + 1, F.lit(step)),
    ).otherwise(F.array().cast("array<int>"))
    win = lambda s: F.slice(arr, s, m)  # noqa: E731
    if znormalize:
        make = lambda s: znorm(win(s))  # noqa: E731
    else:
        make = win
    keep = [c for c in series.columns if c != features_col]
    return series.select(
        *keep,
        F.explode(
            F.transform(starts, lambda s: F.struct(s.alias("start"), make(s).alias("win")))
        ).alias("_w"),
    ).select(*keep, F.col("_w.start").alias("start"), F.col("_w.win").alias("win"))


def _profile_kernel(
    series: DataFrame, m: int, exclusion: int, features_col: str
) -> DataFrame:
    """mapInPandas matrix-profile kernel (r9): each input ROW is a whole
    series, so the profile needs NO shuffle at all — one Arrow batch in,
    profile rows out. Per-length groups vectorize across series; the
    pairwise block loop bounds memory at ~32 MB per (rows x windows x
    window-block) tile, so million-point series stream in column blocks
    instead of materializing the full n_win^2 matrix.

    Bit-parity contract with the declarative plan (test-pinned): the
    z-normalization and squared-distance folds accumulate in the SAME
    left-fold order as functions/arrays.znorm + functions/distance
    .sq_euclidean (ordered column adds, init 0.0 — numpy elementwise ops
    are plain IEEE, no FMA/reassociation), the argmin tie-break is
    (d ASC, nn_start ASC) via first-hit argmin + strictly-less block
    updates, and windows with no admissible neighbor drop out. Rows whose
    values are not all finite take a scalar replay with Spark's double
    ordering (NaN sorts GREATEST). Null ELEMENTS (r10, VERDICT r9 #5):
    when the schema admits them, the projection ships a per-element null
    MASK alongside the values (Arrow alone folds null into NaN, losing
    the declarative semantics where a null-poisoned fold is SQL NULL and
    sorts FIRST under asc) and masked rows take a scalar replay with the
    full declarative ordering (NULL first, then values, NaN greatest; tie
    nn_start asc). NaN-vs-NULL survives the pandas->Arrow bridge through
    an explicit boolean flag column, so the output is exactly the
    declarative plan's — same rows, same NULL placement."""
    import numpy as np
    import pandas as pd

    sid_t = series.schema["series_id"].dataType.simpleString()
    f = F.col(features_col)
    elem_nullable = getattr(
        series.schema[features_col].dataType, "containsNull", True
    )
    sel = ["series_id", f.alias("_f")]
    if elem_nullable:
        sel.append(F.transform(f, lambda x: x.isNull()).alias("_nl"))
    src = series.select(*sel)
    has_mask = elem_nullable

    def op(batches):
        for pdf in batches:
            ids = pdf["series_id"].values
            feats = pdf["_f"].tolist()
            masks = pdf["_nl"].tolist() if has_mask else None
            by_len: dict[int, list[int]] = {}
            null_rows: list[int] = []
            for i, fv in enumerate(feats):
                if fv is None or len(fv) < m:
                    continue
                if masks is not None and masks[i] is not None and any(masks[i]):
                    null_rows.append(i)
                else:
                    by_len.setdefault(len(fv), []).append(i)
            out_id, out_s, out_nn, out_d, out_nan = [], [], [], [], []
            for i in null_rows:
                _profile_scalar_nulls(
                    feats[i], np.asarray(masks[i], dtype=bool), m, exclusion,
                    ids[i], out_id, out_s, out_nn, out_d, out_nan,
                )
            for L, idxs in sorted(by_len.items()):
                n_win = L - m + 1
                # chunk rows so the (rows x n_win x block) tile stays small
                rows_per = max(1, int(2_000_000 // max(1, n_win * min(n_win, 512))))
                for c0 in range(0, len(idxs), rows_per):
                    chunk = idxs[c0 : c0 + rows_per]
                    X = np.asarray([feats[i] for i in chunk], dtype=np.float64)
                    if not np.isfinite(X).all():
                        for i in chunk:
                            n0 = len(out_d)
                            _profile_scalar(
                                np.asarray(feats[i], dtype=np.float64),
                                m, exclusion, ids[i],
                                out_id, out_s, out_nn, out_d,
                            )
                            out_nan.extend(
                                isinstance(v, float) and math.isnan(v)
                                for v in out_d[n0:]
                            )
                        continue
                    B = len(chunk)
                    W = np.lib.stride_tricks.sliding_window_view(X, m, axis=1)
                    s1 = np.zeros((B, n_win))
                    s2 = np.zeros((B, n_win))
                    for j in range(m):
                        v = W[:, :, j]
                        s1 = s1 + v
                        s2 = s2 + v * v
                    mean = s1 / float(m)
                    std = np.sqrt(np.maximum(s2 / float(m) - mean * mean, 1e-300))
                    Wn = (W - mean[:, :, None]) / std[:, :, None]
                    best_d = np.full((B, n_win), np.inf)
                    best_nn = np.full((B, n_win), -1, dtype=np.int64)
                    kb = max(1, int(4_000_000 // max(1, B * n_win)))
                    ii = np.arange(n_win)[:, None]
                    for k0 in range(0, n_win, kb):
                        k1 = min(n_win, k0 + kb)
                        blk = np.zeros((B, n_win, k1 - k0))
                        for j in range(m):
                            t = Wn[:, :, None, j] - Wn[:, None, k0:k1, j]
                            blk = blk + t * t
                        band = np.abs(ii - np.arange(k0, k1)[None, :]) < exclusion
                        np.copyto(
                            blk, np.inf, where=np.broadcast_to(band, blk.shape)
                        )
                        idx = np.argmin(blk, axis=2)
                        val = np.take_along_axis(blk, idx[:, :, None], axis=2)[
                            :, :, 0
                        ]
                        upd = val < best_d  # strict: earliest block wins ties
                        best_nn = np.where(upd, idx + k0, best_nn)
                        best_d = np.where(upd, val, best_d)
                    keep = best_nn >= 0
                    for r in range(B):
                        krow = np.flatnonzero(keep[r])
                        if krow.size:
                            out_id.extend([ids[chunk[r]]] * krow.size)
                            out_s.extend((krow + 1).tolist())
                            out_nn.extend((best_nn[r, krow] + 1).tolist())
                            dv = best_d[r, krow]
                            out_d.extend(dv.tolist())
                            out_nan.extend(np.isnan(dv).tolist())
            if out_id:
                yield pd.DataFrame(
                    {
                        "series_id": pd.Series(out_id),
                        "start": pd.Series(out_s, dtype="int32"),
                        "nn_start": pd.Series(out_nn, dtype="int32"),
                        "profile_d": pd.Series(out_d, dtype="float64"),
                        "_nan_d": pd.Series(out_nan, dtype="bool"),
                    }
                )

    out = src.mapInPandas(
        op,
        schema=(
            f"series_id {sid_t}, start int, nn_start int, "
            "profile_d double, _nan_d boolean"
        ),
    )
    # the pandas->Arrow bridge reads BOTH float NaN and a true None as SQL
    # NULL; the _nan_d flag disambiguates — NaN-poisoned windows fold back
    # to NaN (the declarative value), null-poisoned windows stay SQL NULL
    return out.select(
        "series_id",
        "start",
        "nn_start",
        F.when(F.col("_nan_d"), F.lit(float("nan")))
        .otherwise(F.col("profile_d"))
        .alias("profile_d"),
    )


def _profile_scalar_nulls(
    fvals, mask, m, exclusion, sid, out_id, out_s, out_nn, out_d, out_nan
):
    """Null-element replay (r10, VERDICT r9 #5): the declarative plan's
    exact semantics for a series with SQL NULL elements — a window
    overlapping a null z-normalizes to an all-null array, every pair
    involving it folds to a NULL distance, and NULL sorts FIRST under the
    (d ASC, nn_start ASC) rank (then finite values, NaN greatest). Scalar
    loops, correctness over speed — hostile rows only."""
    import numpy as np

    x = np.where(mask, 0.0, np.asarray(fvals, dtype=np.float64))
    L = x.shape[0]
    n_win = L - m + 1
    winnull = np.array([bool(mask[s : s + m].any()) for s in range(n_win)])
    W = np.lib.stride_tricks.sliding_window_view(x, m)
    s1 = np.zeros(n_win)
    s2 = np.zeros(n_win)
    for j in range(m):
        v = W[:, j]
        s1 = s1 + v
        s2 = s2 + v * v
    mean = s1 / float(m)
    std = np.sqrt(np.maximum(s2 / float(m) - mean * mean, 1e-300))
    Wn = (W - mean[:, None]) / std[:, None]
    for i in range(n_win):
        best = None
        best_d = None
        for k in range(n_win):
            if abs(i - k) < exclusion:
                continue
            if winnull[i] or winnull[k]:
                key = (0, 0.0, 0.0, k)
                d = None
            else:
                acc = 0.0
                for j in range(m):
                    t = Wn[i, j] - Wn[k, j]
                    acc = acc + t * t
                nanv = math.isnan(acc)
                key = (1, 1.0 if nanv else 0.0, 0.0 if nanv else acc, k)
                d = acc
            if best is None or key < best:
                best = key
                best_d = d
        if best is not None:
            out_id.append(sid)
            out_s.append(i + 1)
            out_nn.append(best[3] + 1)
            out_d.append(best_d)
            out_nan.append(best_d is not None and math.isnan(best_d))


def _profile_scalar(x, m, exclusion, sid, out_id, out_s, out_nn, out_d):
    """Non-finite replay: same folds, Spark double ordering (NaN greatest,
    -inf least). One series, scalar loops — correctness over speed."""
    import numpy as np

    L = x.shape[0]
    n_win = L - m + 1
    W = np.lib.stride_tricks.sliding_window_view(x, m)
    s1 = np.zeros(n_win)
    s2 = np.zeros(n_win)
    for j in range(m):
        v = W[:, j]
        s1 = s1 + v
        s2 = s2 + v * v
    mean = s1 / float(m)
    std = np.sqrt(np.maximum(s2 / float(m) - mean * mean, 1e-300))
    Wn = (W - mean[:, None]) / std[:, None]
    for i in range(n_win):
        best = None
        for k in range(n_win):
            if abs(i - k) < exclusion:
                continue
            acc = 0.0
            for j in range(m):
                t = Wn[i, j] - Wn[k, j]
                acc = acc + t * t
            key = (math.isnan(acc), 0.0 if math.isnan(acc) else acc, k)
            if best is None or key < best:
                best = key
        if best is not None:
            out_id.append(sid)
            out_s.append(i + 1)
            out_nn.append(best[2] + 1)
            out_d.append(float("nan") if best[0] else best[1])


def matrix_profile(
    series: DataFrame,
    m: int,
    *,
    exclusion: int | None = None,
    features_col: str = "features",
    strategy: str = "auto",
) -> DataFrame:
    """Per-window nearest-neighbor profile within each series:
    (series_id, start, nn_start, profile_d) where profile_d is the
    z-normalized squared Euclidean distance to the nearest window of the
    SAME series at least ``exclusion`` starts away (default m // 2 — the
    standard trivial-match exclusion zone).

    ``strategy``:
    - ``"kernel"`` (and ``"auto"``) — the map-only Arrow kernel
      (``_profile_kernel``): each row already holds a whole series, so
      the per-series quadratic runs vectorized in numpy with ZERO
      shuffles and bounded tile memory. Bit-identical to the declarative
      plan (same fold order; test-pinned), ~10x faster and linear in
      series count.
    - ``"declarative"`` — one windows explode, ONE shuffle on series_id
      for the self-join, per-key quadratic in window count (bounded by
      series length), then a WindowGroupLimit min per window with
      (d, nn_start) total-order tie-break. The oracle-mirrorable plan
      (q134's DuckDB twin folds the same expressions), and the engine
      floor when Arrow/pandas is unavailable.

    Windows with no admissible neighbor (series shorter than
    m + exclusion) drop out on both paths.
    """
    if exclusion is None:
        exclusion = max(1, m // 2)
    if exclusion < 1:
        raise ValueError(f"exclusion must be >= 1, got {exclusion}")
    if strategy not in ("auto", "kernel", "declarative"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy != "declarative":
        return _profile_kernel(series, m, exclusion, features_col)
    w = subsequence_windows(series, m, features_col=features_col, znormalize=True)
    w = w.select("series_id", "start", "win")
    pairs = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.series_id") == F.col("b.series_id"))
            & (F.abs(F.col("a.start") - F.col("b.start")) >= exclusion),
        )
        .select(
            F.col("a.series_id").alias("series_id"),
            F.col("a.start").alias("start"),
            F.col("b.start").alias("nn_start"),
            sq_euclidean(F.col("a.win"), F.col("b.win")).alias("d"),
        )
    )
    rk = Window.partitionBy("series_id", "start").orderBy(
        F.asc("d"), F.asc("nn_start")
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(rk))
        .filter(F.col("_rk") == 1)
        .select("series_id", "start", "nn_start", F.col("d").alias("profile_d"))
    )


def series_discords(profile: DataFrame) -> DataFrame:
    """Matrix profile -> one row per series: the top discord (window whose
    nearest neighbor is FARTHEST — the series' anomaly) and the top motif
    seed (window whose nearest neighbor is CLOSEST — the repeated shape).

    (series_id, discord_start, discord_d, motif_start, motif_d). Both ranks
    share one partitioning (a single shuffle); ties break on start ASC.
    """
    wd = Window.partitionBy("series_id").orderBy(F.desc("profile_d"), F.asc("start"))
    wm = Window.partitionBy("series_id").orderBy(F.asc("profile_d"), F.asc("start"))
    p = profile.withColumn("_rd", F.row_number().over(wd)).withColumn(
        "_rm", F.row_number().over(wm)
    )
    discord = p.filter(F.col("_rd") == 1).select(
        "series_id",
        F.col("start").alias("discord_start"),
        F.col("profile_d").alias("discord_d"),
    )
    motif = p.filter(F.col("_rm") == 1).select(
        "series_id",
        F.col("start").alias("motif_start"),
        F.col("profile_d").alias("motif_d"),
    )
    return discord.join(motif, "series_id")


def subsequence_search(
    series: DataFrame,
    pattern: list[float],
    *,
    k: int = 10,
    features_col: str = "features",
    znormalize: bool = True,
) -> DataFrame:
    """Top-k closest windows to a GIVEN query pattern across the whole
    corpus (anchored subsequence search): every length-len(pattern) window
    of every series, ranked by (z-normalized) squared Euclidean distance
    to the pattern. Returns (series_id, start, d), the k best under the
    total order (d, series_id, start).

    Plan: map-only window explode -> codegen'd fold against the pattern
    LITERAL (shipped in the plan, no join) -> TakeOrderedAndProject (the
    sort-limit fuses into a per-partition top-k + driver merge of k rows —
    no global sort shuffle). The pattern is z-normalized driver-side with
    the same fold arithmetic the engine uses, so the oracle can embed the
    identical literal.
    """
    m = len(pattern)
    if m < 1:
        raise ValueError("pattern must be non-empty")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if znormalize:
        pattern = _py_znorm_fold(pattern)
    w = subsequence_windows(
        series, m, features_col=features_col, znormalize=znormalize
    )
    lit_pat = F.array(*[F.lit(float(v)) for v in pattern])
    return (
        w.select(
            "series_id",
            "start",
            sq_euclidean(F.col("win"), lit_pat).alias("d"),
        )
        .orderBy(F.asc("d"), F.asc("series_id"), F.asc("start"))
        .limit(k)
    )


def _py_znorm_fold(f: list[float]) -> list[float]:
    """Driver-side z-norm with the engine's exact fold order (sequential
    sums, var = s2/n - mu^2, sqrt(max(var, 1e-300)) guard) — used only to
    normalize a QUERY PATTERN literal, never data."""
    n = len(f)
    s1 = 0.0
    for v in f:
        s1 += v
    mu = s1 / n
    s2 = 0.0
    for v in f:
        s2 += v * v
    var = s2 / n - mu * mu
    std = math.sqrt(max(var, 1e-300))
    return [(v - mu) / std for v in f]


def _window_words(
    series: DataFrame,
    m: int,
    *,
    n_segments: int,
    alphabet_size: int,
    features_col: str = "features",
) -> DataFrame:
    """Per-series ordered array of window SAX words (start order):
    (series_id, ..., words array<string>). Each window is z-normalized by
    sax_codes itself (znorm -> PAA -> discretize) — the Bag-of-Patterns
    convention. Map-only."""
    arr = F.col(features_col)
    starts = F.when(
        F.size(arr) >= m,
        F.sequence(F.lit(1), F.size(arr) - m + 1),
    ).otherwise(F.array().cast("array<int>"))
    words = F.transform(
        starts,
        lambda s: codes_to_word(
            sax_codes(F.slice(arr, s, m), n_segments, alphabet_size, m)
        ),
    )
    keep = [c for c in series.columns if c != features_col]
    return series.select(*keep, words.alias("words"))


def _numerosity_reduce(words):
    """Drop consecutive duplicate words (BOP numerosity reduction) — a
    range-indexed filter both engines express identically (DuckDB mirror:
    list_filter(list_transform(range(...), CASE ...), NOT NULL))."""
    idx = F.when(
        F.size(words) >= 1, F.sequence(F.lit(1), F.size(words))
    ).otherwise(F.array().cast("array<int>"))
    kept = F.transform(
        idx,
        lambda i: F.when(
            (i == 1) | (F.element_at(words, i) != F.element_at(words, i - 1)),
            F.element_at(words, i),
        ),
    )
    return F.filter(kept, lambda x: x.isNotNull())


def motif_words(
    series: DataFrame,
    m: int,
    *,
    n_segments: int = 4,
    alphabet_size: int = 4,
    features_col: str = "features",
) -> DataFrame:
    """Corpus-scale motif counting: every window's SAX word, aggregated
    globally -> (word, n_windows, n_series). The word vocabulary is bounded
    by alphabet^segments, so the single shuffle is on a BOUNDED key space —
    this is how "what shapes recur across 100 TB of series" stays tractable
    when the matrix-profile self-join (quadratic per series, exact) is the
    wrong tool across series."""
    ww = _window_words(
        series, m, n_segments=n_segments, alphabet_size=alphabet_size,
        features_col=features_col,
    )
    exploded = ww.select(
        "series_id", F.explode("words").alias("word")
    )
    return exploded.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.countDistinct("series_id").alias("n_series"),
    )


def bop_histograms(
    series: DataFrame,
    m: int,
    *,
    n_segments: int = 4,
    alphabet_size: int = 4,
    numerosity_reduction: bool = True,
    features_col: str = "features",
) -> DataFrame:
    """Bag-of-Patterns histograms: (series_id[, label], word, cnt) — the
    sparse integer representation of each series (Lin et al. 2012).
    ``numerosity_reduction`` drops consecutive duplicate words (the BOP
    default: a flat stretch shouldn't dominate the histogram)."""
    ww = _window_words(
        series, m, n_segments=n_segments, alphabet_size=alphabet_size,
        features_col=features_col,
    )
    words = F.col("words")
    if numerosity_reduction:
        words = _numerosity_reduce(words)
    keep = [c for c in ww.columns if c != "words"]
    return (
        ww.select(*keep, F.explode(words).alias("word"))
        .groupBy(*keep, "word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def bop_classify(
    test_hist: DataFrame,
    train_hist: DataFrame,
    *,
    k: int = 1,
) -> DataFrame:
    """KNN over Bag-of-Patterns histograms with EXACT integer squared
    distance: d(a, b) = ||a||^2 + ||b||^2 - 2 <a, b>, where the dot product
    is a sparse equi-join on the word (only shared words produce join rows;
    absent pairs have dot = 0 via the left join). Inputs are
    ``bop_histograms`` outputs carrying a ``label`` on the train side.
    Returns (test_id, predicted_label).

    All arithmetic is int64 — bit-identical cross-engine, no float-order
    hazards. The norm cross join moves 2 ints per pair (vs the reference's
    full 561-double rows, Team11-Project.py:122); the dot join shuffles on
    the bounded word vocabulary.
    """
    t_norm = test_hist.groupBy("series_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("n2")
    )
    r_norm = train_hist.groupBy("series_id", "label").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("n2")
    )
    dots = (
        test_hist.alias("t")
        .join(train_hist.alias("r"), "word")
        .groupBy(
            F.col("t.series_id").alias("test_id"),
            F.col("r.series_id").alias("train_id"),
        )
        .agg(F.sum(F.col("t.cnt") * F.col("r.cnt")).cast("long").alias("dot"))
    )
    pairs = (
        t_norm.alias("tn")
        # train norms are 2 ints per series — broadcast hint (knn.py J3)
        .crossJoin(F.broadcast(r_norm.alias("rn")))
        .select(
            F.col("tn.series_id").alias("test_id"),
            F.col("rn.series_id").alias("train_id"),
            F.col("rn.label").alias("train_label"),
            (F.col("tn.n2") + F.col("rn.n2")).alias("_norms"),
        )
        .join(dots, ["test_id", "train_id"], "left")
        .select(
            "test_id",
            "train_id",
            "train_label",
            (F.col("_norms") - 2 * F.coalesce(F.col("dot"), F.lit(0))).alias("d"),
        )
    )
    topk = topk_per_key(
        pairs, "test_id", [F.asc("d"), F.asc("train_label"), F.asc("train_id")], k
    )
    return majority_vote(topk)


def fluss_segmentation(
    series: DataFrame,
    m: int,
    *,
    exclusion: int | None = None,
    exclude_zone: int | None = None,
    id_col: str = "series_id",
    features_col: str = "features",
    strategy: str = "auto",
) -> DataFrame:
    """FLUSS semantic segmentation (r6; Gharghabi et al., ICDM 2017) on
    top of the matrix profile: where does a series change BEHAVIOR?
    Each window's nearest-neighbor arc (start -> nn_start) stays inside a
    regime; few arcs cross a regime boundary. Per position p:

        arcs(p) = #{arcs with min < p < max}      (INTEGER, exact)
        iac(p)  = 2p(L-p)/L                       (ideal curve, one expr)
        cac(p)  = min(1, arcs(p) / iac(p))        (corrected arc curve)

    boundary = argmin cac over the interior zone (first match on exact
    ties; the first/last ``exclude_zone`` positions — default m — are
    excluded, the standard edge-artifact guard).

    Positions are CUTS: p separates window starts p and p+1 (starts are
    1-based), so an arc (a, b) crosses cut p iff a <= p < b and the cut
    domain is 1..L-1 (L = window count). Arc counting is a +1/-1 delta
    PREFIX SUM (one window cumsum per series), not a positions x arcs
    join — integer state end to end, so the curve and the boundary are
    engine-exact; cac's divisions are single IEEE ops. Output:
    (id_col, p, arcs, cac, is_boundary), one row per cut.
    """
    if exclude_zone is None:
        exclude_zone = m
    # matrix_profile keys on 'series_id' (r6 review fix: a custom id_col
    # previously hit an unresolved-column error inside the callee)
    src = (
        series.withColumnRenamed(id_col, "series_id")
        if id_col != "series_id"
        else series
    )
    prof = matrix_profile(
        src, m, exclusion=exclusion, features_col=features_col, strategy=strategy
    ).withColumnRenamed("series_id", id_col)
    lw = series.select(
        F.col(id_col).alias("_sid"),
        (F.size(features_col) - m + 1).alias("_L"),
    ).filter(F.col("_L") >= 2)
    arcs = prof.select(
        F.col(id_col).alias("_sid"),
        F.least("start", "nn_start").alias("p"),
        F.greatest("start", "nn_start").alias("_hi"),
    )
    deltas = arcs.select("_sid", "p", F.lit(1).alias("_dlt")).unionAll(
        arcs.select("_sid", F.col("_hi").alias("p"), F.lit(-1).alias("_dlt"))
    )
    dsum = deltas.groupBy("_sid", "p").agg(F.sum("_dlt").alias("_dl"))
    frame = lw.select(
        "_sid", "_L",
        F.explode(F.sequence(F.lit(1), F.col("_L") - 1)).alias("p"),
    )
    jj = frame.join(dsum, ["_sid", "p"], "left").select(
        "_sid", "_L", "p", F.coalesce(F.col("_dl"), F.lit(0)).alias("_dl")
    )
    cum = Window.partitionBy("_sid").orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ac = jj.withColumn("arcs", F.sum("_dl").over(cum).cast("bigint"))
    p_d = F.col("p").cast("double")
    iac = ((F.lit(2.0) * p_d) * (F.col("_L") - F.col("p")).cast("double")) / F.col(
        "_L"
    ).cast("double")
    zone = (F.col("p") >= exclude_zone) & (
        F.col("p") <= F.col("_L") - exclude_zone
    )
    cc = ac.select(
        F.col("_sid"),
        F.col("p"),
        F.col("arcs"),
        F.least(F.lit(1.0), F.col("arcs").cast("double") / iac).alias("cac"),
        zone.alias("_zone"),
    )
    rk = Window.partitionBy("_sid").orderBy(
        F.desc("_zone"), F.asc("cac"), F.asc("p")
    )
    return (
        cc.withColumn("_r", F.row_number().over(rk))
        .select(
            F.col("_sid").alias(id_col),
            F.col("p").cast("int").alias("p"),
            "arcs",
            "cac",
            (F.col("_zone") & (F.col("_r") == 1)).alias("is_boundary"),
        )
    )
