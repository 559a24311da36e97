"""Deterministic sketch / sampling operators (engine extension; the
approximate-aggregate and sampling surface a training-data pipeline needs,
listed in SURVEY.md §2.4 as absent from the reference).

Spark ships approx_count_distinct (HLL++) and df.sample(), but both are
irreproducible across engines (HLL internals) or across runs (RNG seeds per
partition split). These operators instead build on the repo's portable hash
spec (functions/text.py), so:
- results are bit-reproducible on ANY engine — every query has an exact
  DuckDB oracle, the same property the rest of the engine holds itself to;
- sampling is CONSISTENT: the same key always samples the same way, so
  sampling orders and lineitem by orderkey yields referentially-intact
  subsets, and re-runs/backfills see the same sample.

Scale design (100 TB):
- kmv_distinct: one scan -> per-partition distinct+top-k merge
  (TakeOrderedAndProject keeps only k values per partition, then one tiny
  driver-side merge of k-length lists). No full distinct shuffle of the
  key space; memory is O(k).
- hash_sample: a pure filter — zero shuffle, pushed to the scan where the
  format allows; the fraction is enforced exactly on the hash space, not
  per-partition row counts.

Hash note: keys are reduced mod P BEFORE the affine multiply, so the
arithmetic stays inside int64 for arbitrarily large keys (P^2 ~ 1e18 <
2^63); string keys go through the same char-fold as the text operators.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.text import HASH_BASE, HASH_P, char_hash

__all__ = [
    "kmv_distinct",
    "hash_sample",
    "key_hash",
    "stratified_sample",
    "histogram",
    "bloom_semi_join",
    "mixture_sample",
    "mix32",
    "hll_registers",
    "hll_distinct",
    "leakage_safe_split",
]

AFFINE_A = 2654435761 % HASH_P
AFFINE_B = 40503


def _one_hash(col: Column, dtype: T.DataType, hash_mode: str) -> Column:
    if isinstance(dtype, T.StringType):
        if hash_mode == "xxhash64":
            # JVM-native, one call per row — the production path for string
            # keys at scale (the portable char fold is an interpreted
            # per-char lambda). Deterministic across runs/tables, just not
            # DuckDB-mirrorable.
            return F.pmod(F.xxhash64(col), F.lit(HASH_P))
        # affine-spread the char fold: a SHORT string's raw fold is
        # numerically small (< 31^len), which would bias every
        # threshold/interval consumer (hash_sample would keep ALL 2-char
        # keys at any fraction above ~1e-3) — the same failure caught by
        # the leakage_safe_split interval test
        return (char_hash(col) * AFFINE_A + AFFINE_B) % HASH_P
    return (F.pmod(col.cast("long"), F.lit(HASH_P)) * AFFINE_A + AFFINE_B) % HASH_P


def key_hash(df: DataFrame, keys: Sequence[str], *, hash_mode: str = "portable") -> Column:
    """[0, P) hash of one or more key columns (order-sensitive fold, same
    base/modulus as the text-hash spec). hash_mode='portable' (default) is
    DuckDB-oracle-reproducible; 'xxhash64' swaps the string-key char fold
    for the native hash — same determinism and sampling properties, ~100x
    cheaper on long strings, not cross-engine."""
    if hash_mode not in ("portable", "xxhash64"):
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    h = None
    for kc in keys:
        hk = _one_hash(F.col(kc), df.schema[kc].dataType, hash_mode)
        h = hk if h is None else (h * HASH_BASE + hk) % HASH_P
    return h


def kmv_distinct(
    df: DataFrame,
    *,
    key: Union[str, Sequence[str]],
    k: int = 256,
    hash_mode: str = "portable",
) -> DataFrame:
    """K-minimum-values distinct-count estimate over the key column(s).

    Returns ONE row: (k_used, kth_min, est_distinct). With the k smallest
    distinct hash values in [0, P), the estimator is (k-1) * P / kth_min;
    when fewer than k distinct hashes exist the count is exact. Standard
    error ~ 1/sqrt(k-2) (Beyer et al., SIGMOD'07). Deterministic: same
    input -> same sketch on any engine.
    """
    keys = [key] if isinstance(key, str) else list(key)
    hs = (
        df.select(key_hash(df, keys, hash_mode=hash_mode).alias("_h"))
        .filter(F.col("_h").isNotNull())
        .distinct()
        .orderBy("_h")
        .limit(k)
    )
    est = F.when(
        F.col("k_used") < k, F.col("k_used").cast("double")
    ).otherwise(F.lit(float(k - 1)) * float(HASH_P) / F.col("kth_min").cast("double"))
    return (
        hs.agg(
            F.count(F.lit(1)).alias("k_used"), F.max("_h").alias("kth_min")
        ).select("k_used", "kth_min", est.alias("est_distinct"))
    )


def hash_sample(
    df: DataFrame,
    *,
    key: Union[str, Sequence[str]],
    fraction: float,
    denom: int = 1_000_000,
    hash_mode: str = "portable",
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff
    ``key_hash(key) % denom < round(fraction * denom)``.

    No RNG, no shuffle — a pure filter with the sampling decision a
    function of the key alone, so identical keys sample together across
    tables, runs, and engines. ``denom`` sets the fraction granularity.
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    keys = [key] if isinstance(key, str) else list(key)
    thresh = int(round(fraction * denom))
    return df.filter(
        F.pmod(key_hash(df, keys, hash_mode=hash_mode), F.lit(denom)) < thresh
    )


def stratified_sample(
    df: DataFrame,
    *,
    strata: Union[str, Sequence[str]],
    key: Union[str, Sequence[str]],
    n: int,
    hash_mode: str = "portable",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic fixed-quota sample: exactly min(n, |stratum|) rows per
    stratum, chosen by hash rank — no RNG, reproducible across runs and
    engines, and stable under corpus growth for the retained prefix (a row's
    rank only changes when a smaller-hash row enters its stratum).

    The balanced-downsampling primitive for training mixes (e.g. equal doc
    counts per language/source). Rows rank within their stratum by
    (key_hash asc, key asc — a total order); rows ranked > n are dropped.
    Plan: one shuffle on the strata columns (window partition);
    WindowGroupLimit prunes to n rows per stratum map-side before the
    exchange, so the shuffle carries O(n * strata) rows, not the corpus.
    """
    from pyspark.sql import Window

    strata_cols = [strata] if isinstance(strata, str) else list(strata)
    keys = [key] if isinstance(key, str) else list(key)
    h = key_hash(df, keys, hash_mode=hash_mode)
    w = Window.partitionBy(*strata_cols).orderBy(
        h.asc(), *[F.col(kc).asc() for kc in keys]
    )
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n
    )


def histogram(
    df: "DataFrame",
    col: str,
    *,
    bins: int = 20,
    lo: float,
    hi: float,
) -> "DataFrame":
    """Fixed-width histogram of a numeric column: bucket i covers
    [lo + i*w, lo + (i+1)*w) with w = (hi-lo)/bins; values outside [lo, hi]
    clamp into the edge buckets and x == hi lands in the last bucket.

    Output: (bucket int, lo_edge double, hi_edge double, n long) — only
    non-empty buckets (pad driver-side if a dense vector is wanted).
    The bucket expression floor(((x-lo)/(hi-lo))*bins) is the same IEEE
    op sequence on any engine, so counts are exactly reproducible.

    Scale design: one scan + one tiny shuffle (≤ bins groups, map-side
    partial) — the profile/distribution primitive at any scale.
    """
    if bins <= 0:
        raise ValueError(f"bins must be positive, got {bins}")
    if not (hi > lo):
        raise ValueError(f"need hi > lo, got lo={lo} hi={hi}")
    x = F.col(col).cast("double")
    raw = F.floor(((x - F.lit(float(lo))) / F.lit(float(hi - lo))) * F.lit(bins))
    bucket = F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw)).cast("int")
    w = (hi - lo) / bins
    return (
        df.filter(x.isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(float(lo)) + F.col("bucket") * F.lit(w)).alias("lo_edge"),
            (F.lit(float(lo)) + (F.col("bucket") + 1) * F.lit(w)).alias("hi_edge"),
            "n",
        )
    )


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    m_bits: int = 1 << 16,
    k_hashes: int = 3,
) -> DataFrame:
    """Semi join with a Bloom-filter prefilter: build a bitmap over the dim
    keys, pre-filter the fact side with bit tests BEFORE its shuffle, then
    run the exact left-semi join on the survivors.

    Result set == ``fact.join(dim, key, "left_semi")`` exactly: Bloom false
    positives survive the prefilter but die in the exact join; negatives
    are never false. The payoff is at 100 TB: the fact-side shuffle (the
    scale bottleneck of any big semi/inner join) moves only rows whose key
    *might* match — for a selective dim that is a 10-1000x shuffle-volume
    cut, the same trick Spark's own runtime-filter rule
    (spark.sql.optimizer.runtimeFilter.bloomFilter.enabled) applies to
    equi-joins, here as an explicit composable operator.

    The bitmap is SKETCH-sized (m_bits/64 longs — 8 KiB at the default),
    never data-sized: building it aggregates bit-words distributed
    (groupBy word index, bit_or partial+final), and only those <=1024
    aggregated words are collected into a broadcast literal. k_hashes
    xxhash64 seeds set k bits per key.
    """
    if m_bits % 64 != 0:
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    n_words = m_bits // 64
    kc = F.col(key)

    def positions(c):
        return [F.pmod(F.xxhash64(c, F.lit(j)), F.lit(m_bits)) for j in range(k_hashes)]

    # the python shiftleft/shiftrightunsigned wrappers take only literal bit
    # counts; the SQL forms accept expressions, hence F.expr here
    words = (
        dim.select(F.explode(F.array(*positions(kc))).alias("_pos"))
        .select(
            F.expr("CAST(_pos DIV 64 AS INT)").alias("_w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(_pos, 64) AS INT))"
            ).alias("_bit"),
        )
        .groupBy("_w")
        .agg(F.bit_or("_bit").alias("_word"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["_w"]] = r["_word"]
    bm = F.array(*[F.lit(w).cast("long") for w in bitmap])

    might = fact
    for j, pos in enumerate(positions(kc)):
        might = (
            might.withColumn("_bpos", pos)
            .withColumn("_bword", F.element_at(bm, F.expr("CAST(_bpos DIV 64 AS INT)") + 1))
            .filter(
                F.expr(
                    "(shiftrightunsigned(_bword, CAST(pmod(_bpos, 64) AS INT)) & 1) = 1"
                )
            )
            .drop("_bpos", "_bword")
        )
    return might.join(dim.select(key).distinct(), key, "left_semi")


def mixture_sample(
    df: DataFrame,
    *,
    strata_col: str,
    weights: dict,
    key: Union[str, Sequence[str]],
    default: float = 0.0,
    denom: int = 1_000_000,
    hash_mode: str = "portable",
) -> DataFrame:
    """Deterministic mixture sampling: keep a row with per-stratum
    probability ``weights[stratum]`` (``default`` for unlisted strata) —
    the pre-training data-mix primitive (downweight one source/language,
    keep all of another) with hash_sample's guarantees: no RNG, no shuffle,
    the same key always samples the same way across tables/runs/engines.

    Implemented as ONE pure filter: the stratum's threshold is a chained
    conditional on ``strata_col`` compared against the key hash — pushdown-
    friendly, zero shuffle at any scale.
    """
    for s, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {s!r} must be in [0, 1], got {w}")
    if not 0.0 <= default <= 1.0:
        raise ValueError(f"default must be in [0, 1], got {default}")
    keys = [key] if isinstance(key, str) else list(key)
    thresh = F.lit(int(round(default * denom)))
    for s in sorted(weights):
        thresh = (
            F.when(F.col(strata_col) == s, F.lit(int(round(weights[s] * denom))))
            .otherwise(thresh)
        )
    return df.filter(
        F.pmod(key_hash(df, keys, hash_mode=hash_mode), F.lit(denom)) < thresh
    )


def count_min_topk(
    docs: DataFrame,
    *,
    text_col: str = "text",
    k: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min-sketch heavy-hitter estimation vs exact truth.

    Builds a depth x width CMS over the corpus token stream (row r hashes a
    token to bucket (char_hash * A_r + B_r) % P % width — the shared
    portable hash spec, so the sketch is deterministic and oracle-exact),
    then reports, for the EXACT top-``k`` tokens, the exact count next to
    the CMS estimate (min over the token's depth counters). CMS never
    underestimates: cms_n >= n always (test-pinned).

    Scale shape: the sketch build is ONE map-side-partial groupBy over
    (row, bucket) — depth*width counters total (a few KB) regardless of
    corpus size; estimation broadcasts that tiny counter table. This is
    the streaming-friendly bounded-memory answer to token frequency at
    100 TB, next to the exact q46 top-k.
    """
    from ..functions.text import HASH_P, MINHASH_A, MINHASH_B, char_hash, tokens
    from .skew import fan_out

    toks = fan_out(docs).select(F.explode(tokens(F.col(text_col))).alias("token"))
    h = char_hash(F.col("token"))
    bucket_of = lambda r: ((h * MINHASH_A[r] + MINHASH_B[r]) % HASH_P) % width

    entries = toks.select(
        "token",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), bucket_of(r).alias("bucket"))
                for r in range(depth)
            ])
        ).alias("_rb"),
    ).select("token", F.col("_rb.r").alias("r"), F.col("_rb.bucket").alias("bucket"))
    counters = entries.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("c"))

    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    top = (
        exact.orderBy(F.desc("n"), F.asc("token"))
        .limit(k)
        .select("token", "n", *[bucket_of(r).alias(f"_b{r}") for r in range(depth)])
    )
    est = top
    for r in range(depth):
        cr = counters.filter(F.col("r") == r).select(
            F.col("bucket").alias(f"_b{r}"), F.col("c").alias(f"_c{r}")
        )
        est = est.join(F.broadcast(cr), f"_b{r}")
    cms = F.least(*[F.col(f"_c{r}") for r in range(depth)])
    return est.select("token", "n", cms.alias("cms_n"))


# --- HyperLogLog (portable) -------------------------------------------------
# The affine/char-fold hashes above are fine for sampling and KMV (which
# use LOW-bit/order statistics), but HLL reads the GEOMETRIC distribution
# of leading zeros in the HIGH bits — affine maps on dense key ranges fail
# that badly (measured: 55% error at m=256 where theory says 6.5%). mix32
# is the murmur3 finalizer (public domain avalanche constants), expressed
# with every intermediate < 2^63 so Spark's ANSI bigint arithmetic never
# overflows: the mod-2^32 multiplies are split into 16-bit halves.

_MIX_C1 = 0x85EBCA6B
_MIX_C2 = 0xC2B2AE35
_M32 = 1 << 32


def _mul32(col: Column, c: int) -> Column:
    hi = F.floor(col / F.lit(65536)).cast("long")
    lo = col.bitwiseAND(F.lit(65535))
    return (lo * c + ((hi * c) % 65536) * 65536) % _M32


def mix32(col: Column) -> Column:
    """Portable murmur3 finalizer over a non-negative long (mod 2^32)."""
    h = F.pmod(col.cast("long"), F.lit(_M32))
    h = h.bitwiseXOR(F.shiftright(h, 16))
    h = _mul32(h, _MIX_C1)
    h = h.bitwiseXOR(F.shiftright(h, 13))
    h = _mul32(h, _MIX_C2)
    h = h.bitwiseXOR(F.shiftright(h, 16))
    return h


def hll_registers(
    df: DataFrame,
    col: str,
    *,
    p_bits: int = 8,
    w_bits: int = 24,
) -> DataFrame:
    """HyperLogLog register table (Flajolet et al. 2007): (b, m) with
    b = low p_bits of the mixed hash, m = max over values of
    (w_bits + 1 - bit_length(next w_bits)). MERGEABLE by construction —
    union of register tables + groupBy(b).max(m) equals the registers of
    the unioned data (test-pinned) — the property that lets 1000
    executors sketch 100 TB with one tiny final merge. One map-side
    partial groupBy; output is <= 2^p_bits rows."""
    c = F.col(col)
    dtype = df.schema[col].dataType
    base = char_hash(c) if isinstance(dtype, T.StringType) else c
    h = mix32(base)
    m = 1 << p_bits
    bucket = F.pmod(h, F.lit(m))
    w = F.pmod(F.floor(h / F.lit(m)).cast("long"), F.lit(1 << w_bits))
    bitlen = F.when(w > 0, F.length(F.conv(w.cast("string"), 10, 2))).otherwise(
        F.lit(0)
    )
    rho = F.lit(w_bits) + 1 - bitlen
    return (
        df.select(bucket.alias("b"), rho.alias("r"))
        .groupBy("b")
        .agg(F.max("r").alias("m"))
    )


def hll_distinct(
    df: DataFrame,
    col: str,
    *,
    p_bits: int = 8,
    w_bits: int = 24,
) -> DataFrame:
    """Approximate distinct count with a DETERMINISTIC, engine-portable
    HyperLogLog (vs Spark's approx_count_distinct whose HLL++ internals
    are not reproducible outside the JVM — the same portability argument
    as kmv_distinct, for the sketch every warehouse actually uses).

    Output: ONE row — (n_present, zero_regs, hll_raw, hll_estimate).
    hll_raw = alpha_m * m^2 / sum_j 2^-M_j folded in bucket order: every
    term is a power of two (exact in binary), the fold order is total, so
    hll_raw is bit-identical cross-engine and q107 grades it directly.
    hll_estimate applies the standard small-range linear-counting
    correction (m * ln(m/V) when raw <= 2.5m and V > 0) — it uses ln(),
    so it is NOT in the graded projection (the tfidf/ngram_lm ln rule);
    accuracy is asserted in tests against the exact count (expected
    relative error 1.04/sqrt(m) ~ 6.5% at the default m=256).

    Scale shape: one corpus scan -> map-side-partial register groupBy
    (<= m rows out), one single-row final fold. Nothing else."""
    if not 4 <= p_bits <= 16:
        raise ValueError(f"p_bits must be in [4, 16], got {p_bits}")
    m = 1 << p_bits
    regs = hll_registers(df, col, p_bits=p_bits, w_bits=w_bits)
    # the paper's alpha_m: fixed constants below m=128, the asymptotic
    # formula above (Flajolet et al. 2007 §4; review finding — the
    # asymptotic formula alone biases small-m estimates by ~0.4%)
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    agg = regs.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("b", "m"))),
            F.lit(0.0),
            lambda acc, s: acc + F.pow(F.lit(2.0), -s["m"].cast("double")),
        ).alias("_sp"),
        F.count(F.lit(1)).alias("n_present"),
    )
    zero = (F.lit(m) - F.col("n_present")).cast("int")
    raw = F.lit(alpha) * F.lit(float(m * m)) / (
        F.col("_sp") + (F.lit(m) - F.col("n_present")).cast("double")
    )
    corrected = F.when(
        (raw <= 2.5 * m) & (zero > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / zero.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("n_present").cast("int").alias("n_present"),
        zero.alias("zero_regs"),
        raw.alias("hll_raw"),
        corrected.alias("hll_estimate"),
    )


def leakage_safe_split(
    df: DataFrame,
    *,
    group: Union[str, Sequence[str]],
    fractions: dict[str, float],
    denom: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment with a GROUP-level leakage
    guard: every row of the same group (user, document source, session —
    whatever unit correlates examples) lands in the SAME split, because
    the assignment is a pure function of the group key's portable hash.
    Splitting i.i.d. by row leaks near-duplicate/correlated examples from
    one unit across train and eval — the classic contamination bug this
    operator makes structurally impossible (Kapoor & Narayanan 2023
    survey leakage as the dominant ML-pipeline failure).

    ``fractions``: split name -> fraction, summing to 1.0. Assignment:
    the hash maps to [0, denom); consecutive half-open intervals sized by
    the fractions (in the given dict order) pick the split. Deterministic
    across runs, engines, and tables sharing the group key — events and
    labels join-split CONSISTENTLY.

    Output: the input plus a ``split`` column. Scale: a pure per-row
    projection, no shuffle, no RNG; at 100 TB this costs one scan.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1.0, got {total}")
    if any(f < 0 for f in fractions.values()):
        raise ValueError("fractions must be non-negative")
    keys = [group] if isinstance(group, str) else list(group)
    # key_hash affine-spreads string keys (see _one_hash), so the raw
    # value is uniform enough for the interval map directly
    h = F.pmod(key_hash(df, keys), F.lit(denom))
    expr = None
    edge = 0
    names = list(fractions)
    for name in names[:-1]:
        edge += int(round(fractions[name] * denom))
        cond = h < edge
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    # a NULL group key must NOT silently land in the LAST split (the
    # when-chain's otherwise; review finding): surface it as a NULL split
    # so downstream either filters it or fails loudly on the unexpected
    # value — all NULL-keyed rows still travel together, so the leakage
    # guarantee is preserved whichever way the caller resolves them
    return df.withColumn("split", F.when(h.isNotNull(), expr))
