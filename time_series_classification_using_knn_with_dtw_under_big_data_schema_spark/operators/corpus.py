"""Corpus-level text statistics for training-data pipelines (engine
extension beyond the reference surface — BASELINE.json north-star: text
analysis as first-class operators; the reference `Team11-Project.py` has no
text surface at all).

- ``tfidf_topk``: per-document top-k terms by TF-IDF weight. The idf is the
  RAW-FREQUENCY variant idf = (N+1)/(df+1) — no logarithm, so the score is
  two IEEE double ops (one divide, one multiply) on exact integers and
  reproduces bit-for-bit on any engine (ln() implementations may differ in
  the last ulp across engines, which would break hash-match oracles).
- ``repetition_stats``: Gopher-style repetition quality signals per doc
  (Rae et al. 2021 §A1.1 use duplicate-n-gram fractions as quality
  filters): distinct-token ratio and the fraction of all bigrams taken by
  the single most-frequent bigram. All counts are integers; the two output
  ratios are one IEEE division each.

Scale design (100 TB):
- tfidf_topk: tf table = one shuffle on (doc, term) with map-side partial
  counts; the document-frequency table is VOCABULARY-sized (Zipf: ~sqrt of
  corpus tokens) and joins back broadcast; N is a 1-row broadcast cross
  join. The only corpus-sized shuffles are the tf groupBy and the final
  per-doc top-k window (WindowGroupLimit prunes map-side to k rows per doc
  per partition).
- repetition_stats: one shuffle on (doc, bigram) with map-side partial
  counts, then a per-doc agg on the grouped (already small) table. Carrying
  n_tokens/n_distinct as groupBy keys (constant per doc) avoids a second
  join against the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .skew import fan_out
from .topk import topk_per_key

__all__ = ["tfidf_topk", "repetition_stats"]


def tfidf_topk(
    docs: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k terms per document by TF-IDF weight.

    Output: (id_col, rank, term, tf, df, score) with
    score = tf * ((N+1)/(df+1)), ranked per doc by (score desc, term asc)
    — a total order, so ranks are deterministic and cross-engine stable.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency: tf rows are already distinct (doc, term) pairs
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.countDistinct(id_col).alias("_n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (
                (F.col("_n_docs") + F.lit(1)).cast("double")
                / (F.col("df") + F.lit(1)).cast("double")
            ),
        )
    )
    top = topk_per_key(scored, id_col, [F.desc("score"), F.asc("term")], k)
    return top.select(
        id_col, "rank", "term", "tf", "df", F.round("score", 6).alias("score")
    )


def repetition_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document repetition signals: (id_col, n_tokens, n_distinct,
    distinct_ratio, top_bigram_frac).

    distinct_ratio = n_distinct / n_tokens; top_bigram_frac = occurrences of
    the most frequent token bigram / (n_tokens - 1). Documents with fewer
    than 2 tokens (no bigrams) are excluded. High top_bigram_frac / low
    distinct_ratio flag boilerplate and degenerate repetition — the standard
    pre-training quality filters.
    """
    t = (
        fan_out(docs)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))
        .filter(F.size("_toks") >= 2)
    )
    base = t.select(
        id_col,
        F.size("_toks").alias("n_tokens"),
        F.size(F.array_distinct("_toks")).alias("n_distinct"),
        F.explode(
            F.expr(
                "zip_with(slice(_toks, 1, size(_toks) - 1),"
                " slice(_toks, 2, size(_toks) - 1),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("_bigram"),
    )
    counts = base.groupBy(id_col, "n_tokens", "n_distinct", "_bigram").agg(
        F.count(F.lit(1)).alias("_c")
    )
    agg = counts.groupBy(id_col, "n_tokens", "n_distinct").agg(
        F.max("_c").alias("_top")
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_distinct",
        (F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")).alias(
            "distinct_ratio"
        ),
        (
            F.col("_top").cast("double") / (F.col("n_tokens") - F.lit(1)).cast("double")
        ).alias("top_bigram_frac"),
    )
