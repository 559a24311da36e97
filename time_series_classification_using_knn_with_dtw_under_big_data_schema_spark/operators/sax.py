"""SAX — Symbolic Aggregate approXimation (Lin, Keogh, Lonardi & Chiu 2003).

Engine extension to the reference's pairwise-distance paradigm
(Team11-Project.py computes Euclidean/FastDTW over raw 561-point vectors):
SAX compresses a z-normalized series to a short symbol word via PAA +
equiprobable Gaussian breakpoints, and MINDIST over words LOWER-BOUNDS the
Euclidean distance over the raw series — so symbol-space KNN is the
byte-frugal first phase the raw-vector cross join (knn.py J2/J3) cannot be
at 100 TB: a 561-point double series (4.5 KB) becomes an 8-char word.

Everything here is pure codegen'd SQL expressions (left-fold arithmetic
only, the NOTES oracle-parity invariant): no UDFs, no collects. The DuckDB
oracles in __spark_entry__.py mirror each fold bit-for-bit.

Scale shape: symbolization is a per-row projection (zero shuffles);
``sax_knn_classify`` cross-joins WORDS (w small ints per series, ~1/70th
of raw bytes at 561->8) and prunes per-test with one WindowGroupLimit
window — the same plan discipline as knn.py, on radically fewer bytes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import paa, znorm
from .topk import topk_per_key
from .vote import majority_vote

# Equiprobable N(0,1) breakpoints (Lin et al. 2003, Table 3) — FIXED literal
# constants so Spark and the DuckDB oracle discretize identically.
SAX_BREAKPOINTS: dict[int, list[float]] = {
    2: [0.0],
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
    9: [-1.22, -0.76, -0.43, -0.14, 0.14, 0.43, 0.76, 1.22],
    10: [-1.28, -0.84, -0.52, -0.25, 0.0, 0.25, 0.52, 0.84, 1.28],
}

SAX_ALPHABET = "abcdefghij"


def _check_alphabet(alphabet_size: int) -> list[float]:
    if alphabet_size not in SAX_BREAKPOINTS:
        raise ValueError(
            f"alphabet_size must be in {sorted(SAX_BREAKPOINTS)}, got {alphabet_size}"
        )
    return SAX_BREAKPOINTS[alphabet_size]


def sax_codes(
    arr: Column, n_segments: int, alphabet_size: int, length: int
) -> Column:
    """array<double> (fixed ``length``) -> array<int> of SAX symbol codes.

    znorm (whole series) -> PAA (n_segments means) -> discretize each mean
    as ``count of breakpoints <= mean`` (a left fold over the breakpoint
    literals, so ties-at-breakpoint resolve identically cross-engine).
    """
    betas = _check_alphabet(alphabet_size)
    p = paa(znorm(arr), n_segments, length)
    return F.transform(
        p,
        lambda v: F.aggregate(
            F.array(*[F.lit(b) for b in betas]),
            F.lit(0),
            lambda acc, b: acc + F.when(v >= b, F.lit(1)).otherwise(F.lit(0)),
        ),
    )


def codes_to_word(codes: Column) -> Column:
    """array<int> codes -> the SAX word string ('abca...')."""
    return F.aggregate(
        codes,
        F.lit(""),
        lambda acc, c: F.concat(acc, F.substr(F.lit(SAX_ALPHABET), c + 1, F.lit(1))),
    )


def sax_symbolize(
    series: DataFrame,
    *,
    n_segments: int = 8,
    alphabet_size: int = 4,
    length: int,
    features_col: str = "features",
) -> DataFrame:
    """(series_id, features[, label]) -> (series_id[, label], sax_codes,
    sax_word). Pure per-row projection — zero shuffles, codegen'd end to
    end; at 100 TB this is a map-only pass that shrinks each series to a
    word."""
    if length // n_segments < 1:
        raise ValueError(
            f"n_segments={n_segments} exceeds series length {length}"
        )
    codes = sax_codes(F.col(features_col), n_segments, alphabet_size, length)
    keep = [c for c in series.columns if c not in (features_col,)]
    return series.select(
        *keep,
        codes.alias("sax_codes"),
    ).withColumn("sax_word", codes_to_word(F.col("sax_codes")))


def sax_mindist_sq(
    a: Column, b: Column, *, alphabet_size: int, length: int, n_segments: int
) -> Column:
    """Scaled squared MINDIST between two SAX code arrays:

        (length / n_segments) * sum_i cell(a_i, b_i)^2
        cell(r, c) = 0                          if |r - c| <= 1
                     beta[max(r,c)-1] - beta[min(r,c)]   otherwise

    sqrt of this is the classic MINDIST, a LOWER BOUND on the Euclidean
    distance between the z-normalized originals (Lin et al. 2003, eq. 6);
    ranking on the square avoids a needless sqrt in the hot compare.
    """
    betas = _check_alphabet(alphabet_size)
    beta_arr = F.array(*[F.lit(x) for x in betas])
    cells = F.zip_with(
        a,
        b,
        lambda r, c: F.when(
            F.abs(r - c) <= 1, F.lit(0.0)
        ).otherwise(
            F.element_at(beta_arr, F.greatest(r, c))
            - F.element_at(beta_arr, F.least(r, c) + 1)
        ),
    )
    s = F.aggregate(cells, F.lit(0.0), lambda acc, v: acc + v * v)
    return F.lit(float(length) / float(n_segments)) * s


def sax_knn_classify(
    test_sax: DataFrame,
    train_sax: DataFrame,
    *,
    k: int = 5,
    alphabet_size: int = 4,
    length: int,
    n_segments: int = 8,
    codes_col: str = "sax_codes",
) -> DataFrame:
    """KNN classification in symbol space: cross join on WORDS (not raw
    series), rank per test by (MINDIST^2, train_label, train_id) — the
    reference's heapq tie order (Team11-Project.py:180) — then the
    Counter-parity majority vote. Returns (test_id, predicted_label).

    Scale: the join side carries n_segments small ints per row; with the
    default 8 segments a 561-point series moves ~1/280th of its raw bytes.
    WindowGroupLimit prunes map-side exactly like the raw-vector KNN.
    """
    d = sax_mindist_sq(
        F.col("t." + codes_col),
        F.col("r." + codes_col),
        alphabet_size=alphabet_size,
        length=length,
        n_segments=n_segments,
    )
    pairs = (
        test_sax.alias("t")
        # the train side is words (n_segments small ints/row) — broadcast is
        # a hint, never a driver collect (knn.py J3 discipline)
        .crossJoin(F.broadcast(train_sax.alias("r")))
        .select(
            F.col("t.series_id").alias("test_id"),
            F.col("r.series_id").alias("train_id"),
            F.col("r.label").alias("train_label"),
            d.alias("d"),
        )
    )
    topk = topk_per_key(
        pairs, "test_id", [F.asc("d"), F.asc("train_label"), F.asc("train_id")], k
    )
    return majority_vote(topk)


def sfa_words(
    series: DataFrame,
    *,
    length: int,
    n_coeffs: int = 4,
    id_col: str = "series_id",
    features_col: str = "features",
) -> DataFrame:
    """SFA — Symbolic Fourier Approximation words (r6; Schäfer & Högqvist,
    EDBT 2012 — the BOSS family's symbolization): where SAX bins the TIME
    domain (PAA means), SFA bins the FREQUENCY domain — the first
    ``n_coeffs`` Fourier coefficients (real+imag, via the q168 literal
    twiddle tables), each discretized into 4 symbols by Multiple
    Coefficient Binning: per-dimension CORPUS quartiles as the bin edges.

    Exactness chain: coefficients fold over literal twiddles ->
    micro-rounded BIGINT (the integer-percentile trick, q36/q69) ->
    Spark ``percentile`` == DuckDB ``quantile_cont`` on integer input ->
    symbol comparisons on exact doubles -> word = digits concatenated in
    dimension order. Two corpus passes (coefficients, then binning —
    edges are a 2*n_coeffs-row broadcast); rows whose length differs
    from ``length`` are filtered (twiddles are length-specific).

    Output: (id_col, sfa_word string) — the content-addressable series
    key for BOSS-style bag-of-words classification and grouping."""
    from .features import periodogram_twiddles, twiddle_fold

    tw = periodogram_twiddles(length, n_coeffs)
    f = F.col(features_col)
    base = series.filter(F.size(f) == length)

    def micro(col):
        return F.round(col * F.lit(1_000_000.0)).cast("bigint")

    entries = []
    for idx, (k, cs, sn) in enumerate(tw):
        entries.append(
            F.struct(
                F.lit(2 * idx).alias("dim"),
                micro(twiddle_fold(f, cs, length=length)).alias("cm"),
            )
        )
        entries.append(
            F.struct(
                F.lit(2 * idx + 1).alias("dim"),
                micro(twiddle_fold(f, sn, length=length)).alias("cm"),
            )
        )
    long = base.select(
        F.col(id_col), F.explode(F.array(*entries)).alias("_e")
    ).select(F.col(id_col), F.col("_e.dim").alias("dim"), F.col("_e.cm").alias("cm"))
    edges = long.groupBy("dim").agg(
        F.expr("percentile(cm, 0.25D)").alias("e1"),
        F.expr("percentile(cm, 0.5D)").alias("e2"),
        F.expr("percentile(cm, 0.75D)").alias("e3"),
    )
    sym = long.join(F.broadcast(edges), "dim").select(
        F.col(id_col),
        F.col("dim"),
        F.when(F.col("cm").cast("double") <= F.col("e1"), F.lit(0))
        .when(F.col("cm").cast("double") <= F.col("e2"), F.lit(1))
        .when(F.col("cm").cast("double") <= F.col("e3"), F.lit(2))
        .otherwise(F.lit(3))
        .alias("s"),
    )
    return sym.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim").alias("d"), F.col("s").alias("s")))
                ),
                lambda x: x["s"].cast("string"),
            ),
            "",
        ).alias("sfa_word")
    )


def boss_classify(
    test: DataFrame,
    train: DataFrame,
    *,
    m: int = 8,
    n_coeffs: int = 2,
    id_col: str = "series_id",
    features_col: str = "features",
    label_col: str = "label",
) -> DataFrame:
    """BOSS 1-NN classification (r6; Schäfer, DMKD 2015 — Bag-of-SFA-
    Symbols): every length-``m`` window becomes an SFA word (first
    ``n_coeffs`` Fourier coefficients by the literal-twiddle folds,
    quartile-binned per dimension with edges learned on the TRAIN
    windows), consecutive duplicates drop (numerosity reduction), series
    become sparse integer word histograms, and 1-NN runs under the
    ASYMMETRIC BOSS distance

        d(A, B) = sum over words w PRESENT IN THE TEST bag (a_w - b_w)^2

    = tn2 - 2*dot + b2|shared — three INTEGER aggregates over the sparse
    word join, so the whole classifier is engine-exact end to end (no
    floats anywhere past the twiddle folds, which micro-round before the
    binning decisions). Skipping the DC coefficient (k >= 1) gives offset
    invariance; histograms are bounded by 4^(2*n_coeffs) words, so the
    join key space is tiny at any corpus size.

    Output: (test_id, predicted_label, boss_distance bigint), ties by
    (distance, label, id)."""
    from pyspark.sql import Window as _W

    from .features import periodogram_twiddles, twiddle_fold
    from .motif import _numerosity_reduce

    tw = periodogram_twiddles(m, n_coeffs)
    tables = []
    for i, (_k, cs, sn) in enumerate(tw):
        tables.append((2 * i, cs))
        tables.append((2 * i + 1, sn))

    def coef_micro(arr, s, table):
        return F.round(
            twiddle_fold(arr, table, length=m, start=s) * F.lit(1_000_000.0)
        ).cast("bigint")

    def starts(arr):
        return F.when(
            F.size(arr) >= m, F.sequence(F.lit(1), F.size(arr) - m + 1)
        ).otherwise(F.array().cast("array<int>"))

    # MCB edge learning on TRAIN windows only
    tr = train.select(F.col(id_col).alias("_id"), F.col(features_col).alias("_f"))
    exploded = tr.select("_f", F.explode(starts(F.col("_f"))).alias("_s"))
    dims = exploded.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("dim"),
                        coef_micro(F.col("_f"), F.col("_s"), tab).alias("cm"),
                    )
                    for d, tab in tables
                ]
            )
        ).alias("_e")
    ).select(F.col("_e.dim").alias("dim"), F.col("_e.cm").alias("cm"))
    edges = dims.groupBy("dim").agg(
        F.expr("percentile(cm, 0.25D)").alias("e1"),
        F.expr("percentile(cm, 0.5D)").alias("e2"),
        F.expr("percentile(cm, 0.75D)").alias("e3"),
    )
    from ..caching import register_cache

    # r9 optimization: the one-row edge pivot is consumed by BOTH hists
    # sides, and the histograms each feed several downstream branches
    # (tn2/dots, dots/rl) — without caches every branch re-runs the whole
    # edges+words subtree (measured: full boss 7.4 s at sf0.1 while the
    # sum of its parts is ~3 s). The cached tables are bounded: epiv is
    # ONE row, a histogram is <= ids x 4^(2*n_coeffs) words.
    epiv = register_cache(
        edges.agg(
            *[
                F.max(F.when(F.col("dim") == d, F.col(q))).alias(f"_{q}_{d}")
                for d, _ in tables
                for q in ("e1", "e2", "e3")
            ]
        ).cache()
    )

    def word(arr, s):
        parts = []
        for d, tab in tables:
            cmd = coef_micro(arr, s, tab).cast("double")
            parts.append(
                F.when(cmd <= F.col(f"_e1_{d}"), F.lit("0"))
                .when(cmd <= F.col(f"_e2_{d}"), F.lit("1"))
                .when(cmd <= F.col(f"_e3_{d}"), F.lit("2"))
                .otherwise(F.lit("3"))
            )
        return F.concat(*parts)

    def hists(df, keep_label):
        sel = [F.col(id_col).alias("_id"), F.col(features_col).alias("_f")]
        if keep_label:
            sel.append(F.col(label_col).alias("_lbl"))
        side = df.select(*sel).crossJoin(F.broadcast(epiv))
        # evaluate-once binding (the _token_ngrams trick, NOTES r5/r6):
        # numerosity reduction indexes the word array per position, and an
        # inlined EXPRESSION would recompute all ~n_windows SFA words per
        # index — measured 48s -> ~4s at sf0.1. Wrapping the array as the
        # single element of an outer transform binds it to a lambda
        # VARIABLE: computed once, indexed cheaply.
        raw = F.transform(starts(F.col("_f")), lambda s: word(F.col("_f"), s))
        words = F.element_at(
            F.transform(F.array(raw), lambda ws: _numerosity_reduce(ws)), 1
        )
        keep = ["_id"] + (["_lbl"] if keep_label else [])
        return (
            side.select(*keep, F.explode(words).alias("word"))
            .groupBy(*keep, "word")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )

    # land the bounded histograms before the distance job (the knn_join_lb
    # phase-table lesson: lazy caches re-run the subtree per consuming
    # branch within one job)
    th = register_cache(hists(test, False).cache())
    rh = register_cache(hists(train, True).cache())
    th.count()
    rh.count()
    tn2 = th.groupBy("_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("_n2")
    ).select(F.col("_id").alias("test_id"), "_n2")
    dots = (
        th.select(F.col("_id").alias("test_id"), "word", F.col("cnt").alias("_a"))
        .join(
            rh.select(F.col("_id").alias("train_id"), "word", F.col("cnt").alias("_b")),
            "word",
        )
        .groupBy("test_id", "train_id")
        .agg(
            F.sum(F.col("_a") * F.col("_b")).cast("long").alias("_dot"),
            F.sum(F.col("_b") * F.col("_b")).cast("long").alias("_b2"),
        )
    )
    rl = rh.select(
        F.col("_id").alias("train_id"), F.col("_lbl").alias("train_label")
    ).distinct()
    pairs = (
        tn2.crossJoin(F.broadcast(rl))
        .join(dots, ["test_id", "train_id"], "left")
        .select(
            "test_id",
            "train_id",
            "train_label",
            (
                F.col("_n2")
                - 2 * F.coalesce(F.col("_dot"), F.lit(0))
                + F.coalesce(F.col("_b2"), F.lit(0))
            ).cast("bigint").alias("_d"),
        )
    )
    w = _W.partitionBy("test_id").orderBy(
        F.asc("_d"), F.asc("train_label"), F.asc("train_id")
    )
    return (
        pairs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select(
            "test_id",
            F.col("train_label").alias("predicted_label"),
            F.col("_d").alias("boss_distance"),
        )
    )
