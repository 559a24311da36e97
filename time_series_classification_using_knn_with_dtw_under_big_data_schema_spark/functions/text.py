"""Text analysis for large-scale training-data pipelines (engine extension
beyond the reference surface — BASELINE.json north-star: dedup / text
analysis / fingerprinting as first-class operators).

Everything here is pure Catalyst expressions (no UDFs) built on a PORTABLE
hashing spec that DuckDB reproduces bit-for-bit, so every operator gets an
exact SQL oracle:

    char fold   h(s)      = fold over chars: h = (h*31 + codepoint) mod P
    minhash_j   m_j(x)    = (A_j * x + B_j) mod P
    simhash bit b_i(doc)  = [ sum_tokens (2*((h(tok)>>i)&1) - 1) > 0 ]

P = 1_000_000_007 keeps every intermediate < 2^63 (h < P, A_j*h < P^2 < 9.2e18).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_P = 1_000_000_007
HASH_BASE = 31
# fixed pseudo-random minhash coefficients (seeded, engine-version-stable)
MINHASH_A = [(2 * j + 1) * 2654435761 % HASH_P for j in range(64)]
MINHASH_B = [(j * 40503 * 65537 + 12345) % HASH_P for j in range(64)]

STOPWORDS = (
    "the a an and or of to in is are was for on with as by at it this that "
    "be from".split()
)

# tiny marker sets for the language-ID heuristic (real-language function
# words; deterministic, dictionary-free)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization of lowercased text (array<string>)."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return F.filter(toks, lambda x: x != F.lit(""))


def word_tokens(col: Column) -> Column:
    """BPE-ish word tokenization: runs of [a-z0-9] (portable regex)."""
    return F.regexp_extract_all(F.lower(col), F.lit("[a-z0-9]+"), 0)


# ASCII case fold: A-Z -> a-z via translate, NEVER the engine's Unicode
# `lower` — Python str.lower, Java String.toLowerCase, and DuckDB lower
# disagree on a handful of non-ASCII code points (U+0130, U+212A, final
# sigma, ...) and drift across Unicode versions; translate is a fixed
# 26-entry table all three engines implement identically, so operators
# built on it are reproducible by construction on ARBITRARY input text.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_word_tokens(col: Column) -> Column:
    """word_tokens with ASCII-translate case folding (see ASCII_UPPER
    note): runs of [a-z0-9] after A-Z -> a-z; non-ASCII characters are
    never case-mapped, they act as token separators in every engine."""
    return F.regexp_extract_all(
        F.translate(col, ASCII_UPPER, ASCII_LOWER), F.lit("[a-z0-9]+"), 0
    )


def char_hash(col: Column) -> Column:
    """Polynomial rolling hash of a string (the document fingerprint)."""
    return F.aggregate(
        F.split(col, ""),
        F.lit(0).cast("long"),
        lambda h, c: (h * HASH_BASE + F.ascii(c)) % HASH_P,
    )


def char_shingles(col: Column, n: int = 5) -> Column:
    """Distinct character n-grams (the shingle set for minhash/jaccard)."""
    L = F.length(col)
    seq = F.sequence(F.lit(1), L - (n - 1))
    grams = F.transform(seq, lambda i: col.substr(i, F.lit(n)))
    # sequence(1, x<1) would count DOWN in Spark; guard short strings
    return F.when(L >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def stopword_ratio(col: Column) -> Column:
    toks = tokens(col)
    stop = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return stop.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(col: Column) -> Column:
    n_punct = F.length(col) - F.length(F.regexp_replace(col, r"[^\w\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(col), F.lit(1)).cast("double")


def mean_word_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t))
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: Column) -> Column:
    """Heuristic document quality in [0, 1]: enough tokens, sane word length,
    some stopwords (natural-language-ness), low punctuation noise.

    Fixed left-to-right double arithmetic — oracle reproduces bitwise.
    """
    n_tok = token_count(col).cast("double")
    len_term = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    wl = mean_word_len(col)
    wl_term = F.when((wl >= 2.0) & (wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    stop_term = F.least(stopword_ratio(col) * F.lit(4.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(col) * F.lit(5.0), F.lit(1.0))
    return (
        len_term * F.lit(0.4)
        + wl_term * F.lit(0.2)
        + stop_term * F.lit(0.2)
        + punct_term * F.lit(0.2)
    )


def lang_id(col: Column) -> Column:
    """Marker-word language heuristic; 'und' (undetermined) when no marker
    set scores > 0. Deterministic tie-break: highest count, then language
    code ascending."""
    toks = tokens(col)
    counts = [
        (code, F.size(F.filter(toks, lambda t: t.isin(markers))))
        for code, markers in sorted(LANG_MARKERS.items())
    ]
    # CJK presence trumps marker words
    has_cjk = F.size(F.filter(F.split(col, ""), lambda c: F.ascii(c) >= 0x4E00)) > 0
    best = F.lit("und")
    best_n = F.lit(0)
    for code, n in counts:  # ascending codes + strict '>' => code asc wins ties
        take = n > best_n
        best = F.when(take, F.lit(code)).otherwise(best)
        best_n = F.when(take, n).otherwise(best_n)
    return F.when(has_cjk, F.lit("zh")).otherwise(best)


def normalize_text(col: Column) -> Column:
    """Canonical ASCII-level text normalization for dedup/fingerprint
    pipelines: lowercase, strip everything but [a-z0-9 ] (punctuation,
    digits-adjacent symbols, unicode), collapse whitespace runs to one
    space, trim. Deliberately NOT locale/unicode-normalizing (NFC/NFKC
    differs by ICU version — engine-portable behavior matters more here;
    plug a pandas_udf in front when real unicode folding is required).
    """
    s = F.lower(col)
    s = F.regexp_replace(s, "[^a-z0-9 ]", " ")
    s = F.regexp_replace(s, " +", " ")
    return F.trim(s)
