"""Array/series transforms used by the scale path (not in the reference —
engine extensions for 100 TB operation, SURVEY.md §4 'worth adding').

``paa`` (Piecewise Aggregate Approximation) powers the two-phase pruned KNN:
a cheap codegen'd lower-bound distance on PAA sketches prunes the cross
product before the exact (Python-kernel) DTW runs on survivors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def paa(arr: Column, n_segments: int, length: int) -> Column:
    """Piecewise Aggregate Approximation: mean of each of n_segments equal
    chunks of a fixed-``length`` array — pure SQL, codegen'd.
    """
    seg = length // n_segments
    segments = [
        F.aggregate(
            F.slice(arr, i * seg + 1, seg), F.lit(0.0), lambda acc, v: acc + v
        )
        / F.lit(float(seg))
        for i in range(n_segments)
    ]
    return F.array(*segments)


def znorm(arr: Column) -> Column:
    """Z-normalize a series (mean 0, std 1) — standard TS preprocessing."""
    n = F.size(arr).cast("double")
    mean = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v) / n
    var = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v * v) / n - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(1e-300)))
    return F.transform(arr, lambda v: (v - mean) / std)


def series_features(arr: Column) -> Column:
    """Per-series summary features (struct): n, mean, std (population),
    vmin, vmax, slope (least-squares trend over the positional index —
    SURVEY §1.2: time is the array offset, so the index IS the regressor).

    The classic cheap featurization preceding any TS classification: a
    561-point series becomes 6 numbers usable for blocking, filtering, or
    a first-pass classifier before the full DTW KNN.

    Every statistic is a left-fold (aggregate) or min/max over the array —
    the same IEEE op sequence DuckDB's list_reduce evaluates, so outputs
    hash-match cross-engine (NOTES invariant: left-fold arithmetic only).
    """
    n = F.size(arr).cast("double")
    s1 = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v)
    s2 = F.aggregate(arr, F.lit(0.0), lambda a, v: a + v * v)
    mean = s1 / n
    std = F.sqrt(F.greatest(s2 / n - mean * mean, F.lit(0.0)))
    sxy = F.aggregate(
        F.zip_with(arr, F.sequence(F.lit(0), F.size(arr) - 1), lambda x, i: x * i),
        F.lit(0.0),
        lambda a, v: a + v,
    )
    si = n * (n - 1) / F.lit(2.0)
    sii = n * (n - 1) * (2 * n - 1) / F.lit(6.0)
    slope = (n * sxy - si * s1) / (n * sii - si * si)
    return F.struct(
        F.size(arr).alias("n"),
        mean.alias("mean"),
        std.alias("std"),
        F.array_min(arr).alias("vmin"),
        F.array_max(arr).alias("vmax"),
        slope.alias("slope"),
    )


def resample_linear(arr: Column, out_len: int) -> Column:
    """Resample a series to ``out_len`` points by linear interpolation over
    the positional index — the length-normalization step that lets ragged
    series enter fixed-length pipelines (KNN strategies, PAA, the DTW batch
    kernel's rectangular stacking all want equal lengths).

    Output point t (0-based) samples source position t*(n-1)/(out_len-1):
    exact lerp a[lo]*(1-frac) + a[lo+1]*frac, endpoint-exact at both ends.
    Pure codegen expression; the op sequence is mirrored by the SQL oracle.
    Requires out_len >= 2 and size(arr) >= 1 (singleton series broadcast
    their value).
    """
    if out_len < 2:
        raise ValueError(f"out_len must be >= 2, got {out_len}")
    n = F.size(arr)

    def at(t: int) -> Column:
        pos = (
            F.lit(float(t))
            * (n - 1).cast("double")
            / F.lit(float(out_len - 1))
        )
        lo = F.floor(pos).cast("int")
        frac = pos - F.floor(pos)
        v_lo = F.element_at(arr, lo + 1)
        v_hi = F.element_at(arr, F.least(lo + 2, n))
        return v_lo * (F.lit(1.0) - frac) + v_hi * frac

    return F.array(*[at(t) for t in range(out_len)])


def series_to_columns(df, n: int, *, features_col: str = "features",
                      prefix: str = "feature_", start: int = 1):
    """Explode a fixed-length series column into ``n`` scalar columns
    ``{prefix}{start}..{prefix}{start+n-1}`` (keeping every other column).

    The reference's data model IS this wide layout — 561 scalar columns
    re-assembled per query (Team11-Project.py:68-74). The engine keeps
    series as native arrays (SURVEY.md §1.1: a 561-column schema defeats
    column pruning and bloats codegen), but offers the wide projection on
    explicit request for reference-schema interop/export. Each output column
    is ``features[i]`` — a codegen'd GetArrayItem, no UDF, no shuffle.
    """
    others = [c for c in df.columns if c != features_col]
    wide = [
        F.col(features_col).getItem(i).alias(f"{prefix}{start + i}")
        for i in range(n)
    ]
    return df.select(*others, *wide)


# published SAX breakpoint tables (Lin, Keogh, Lonardi & Chiu 2003 — the
# equiprobable standard-normal cut points as the paper rounds them);
# deterministic literals, so both engines compare against identical doubles
SAX_BREAKPOINTS: dict[int, list[float]] = {
    2: [0.0],
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
}

_SAX_LETTERS = "abcdefgh"


def sax_word(
    arr: Column, n_segments: int, length: int, alphabet: int = 4
) -> Column:
    """SAX symbolization (Lin et al. 2003): z-normalize, PAA to
    ``n_segments`` means, quantize each mean into ``alphabet`` letters at
    the published Gaussian breakpoints — a 16-point series becomes e.g.
    'dacb'. The classic symbolic index for series: equal words are a
    blocking key (iSAX-style candidate generation for DTW KNN — compose
    with knn_join_pruned the way PAA already is), and the word table is
    GROUP-BY-able like any text column. Pure codegen'd expression: fold
    znorm + fold PAA + a when-chain per segment; breakpoint comparisons
    are against identical double literals on every engine, and the inputs
    are bit-exact folds, so the word is cross-engine exact."""
    if alphabet not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet must be in {sorted(SAX_BREAKPOINTS)}, got {alphabet}"
        )
    bps = SAX_BREAKPOINTS[alphabet]

    def letter(v: Column) -> Column:
        expr = None
        for i, bp in enumerate(bps):
            c = v < F.lit(bp)
            expr = F.when(c, F.lit(_SAX_LETTERS[i])) if expr is None else expr.when(
                c, F.lit(_SAX_LETTERS[i])
            )
        return expr.otherwise(F.lit(_SAX_LETTERS[len(bps)]))

    p = paa(znorm(arr), n_segments, length)
    return F.concat_ws("", F.transform(p, letter))
