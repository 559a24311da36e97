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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import char_hash, tokens
from .skew import fan_out
from .topk import topk_per_key

__all__ = [
    "tfidf_topk",
    "repetition_stats",
    "decontaminate",
    "decontaminate_fuzzy",
    "chunk_documents",
    "pack_sequences",
    "remove_common_spans",
    "hash_embed",
    "redact_pii",
    "ngram_lm_score",
    "duplicate_spans",
    "cap_per_source",
    "bm25_topk",
    "bm25_build",
    "bm25_search",
    "bm25_search_pruned",
    "rrf_fuse",
    "importance_resample",
]


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


def _token_ngrams(text: "F.Column", n: int) -> "F.Column":
    """Distinct word n-grams of a text column (array<string>).

    Caller must guarantee ``size(tokens) >= n`` (Spark's ``sequence`` would
    otherwise produce a DESCENDING range for an empty window and emit bogus
    grams).

    Evaluate-once binding: slicing the ``tokens(text)`` EXPRESSION inside
    the position lambda would re-run the whole tokenizer per gram (the
    O(len^2)-per-doc HOF trap measured on importance_resample, NOTES r5).
    Wrapping the token array as the single element of an outer
    ``transform`` binds it to a lambda VARIABLE — computed once, indexed
    cheaply by the inner gram lambda.
    """
    wrapped = F.transform(
        F.array(tokens(text)),
        lambda tk: F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - F.lit(n - 1)),
                lambda i: F.concat_ws(" ", F.slice(tk, i, n)),
            )
        ),
    )
    return F.element_at(wrapped, 1)


def decontaminate(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with an evaluation/benchmark set.

    The standard pre-training hygiene pass (GPT-3 Appendix C / PaLM / Llama
    use 8-13-gram overlap): any train document containing a verbatim n-gram
    from the eval set is 'contaminated' and should be dropped or audited
    before training. Output: one row per train document —
    (id_col, n_hits, contaminated) where n_hits = number of DISTINCT train-doc
    n-grams that appear anywhere in the eval set.

    Scale design (100 TB train, eval sets are benchmark-sized i.e. tiny):
    the eval n-gram SET is deduped (vocabulary of a few-MB benchmark) and
    broadcast; the train side ``explode_outer``s distinct per-doc n-grams
    (outer keeps sub-n-token docs as one null-gram row) and broadcast-LEFT-
    joins, so n_hits is a conditional count in the SAME per-doc groupBy —
    the ONLY corpus-sized shuffle is that map-side-partial doc_id groupBy.
    No train-vs-hits re-join (an earlier draft sort-merge-joined the corpus
    id list back against the hit table; explode_outer makes that node
    disappear). If the eval set ever outgrows broadcast range, swap the
    hint for a shuffle hash join on the gram — semantics unchanged.
    """
    ev = (
        fan_out(eval_docs)
        .filter(F.size(tokens(F.col(text_col))) >= n)
        .select(F.explode(_token_ngrams(F.col(text_col), n)).alias("_gram"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    grams_or_null = F.when(
        F.size(tokens(F.col(text_col))) >= n, _token_ngrams(F.col(text_col), n)
    )  # null for short docs -> explode_outer emits one null-gram row
    tr_grams = fan_out(train).select(
        F.col(id_col), F.explode_outer(grams_or_null).alias("_gram")
    )
    return (
        tr_grams.join(F.broadcast(ev), "_gram", "left")
        .groupBy(id_col)
        .agg(F.count("_hit").alias("n_hits"))
        .select(
            id_col,
            "n_hits",
            (F.col("n_hits") > 0).alias("contaminated"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    *,
    chunk_tokens: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into consecutive fixed-size token windows —
    the training-example chunking step of a pre-training pipeline.

    Output: (id_col, chunk_id int, n_tokens, chunk_text); the last chunk per
    doc may be short. Zero-token documents produce no chunks.

    Scale design: pure per-row fan-out (tokenize + sequence + explode) — NO
    shuffle at all; chunking 100 TB is embarrassingly parallel and this plan
    keeps it that way (one WholeStageCodegen span over the scan).
    """
    toks = tokens(F.col(text_col))
    t = fan_out(docs).select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") >= 1)
    n_chunks = F.ceil(F.col("_n") / F.lit(float(chunk_tokens))).cast("int")
    exploded = t.select(
        id_col,
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_id"),
        F.col("_toks"),
    )
    chunk = F.slice(F.col("_toks"), F.col("chunk_id") * chunk_tokens + 1, chunk_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        F.size(chunk).alias("n_tokens"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    *,
    capacity: int = 256,
    n_buckets: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming-concatenation sequence packing: concatenate documents (in
    deterministic id order) and cut the token stream at ``capacity``
    boundaries; a document's pack is the capacity-window its FIRST token
    lands in. This is the packing scheme GPT-style pre-training uses to fill
    fixed-length context windows without padding.

    A single global greedy pack is inherently sequential, so the distributed
    form shards the corpus into ``n_buckets`` independent streams
    (bucket = id mod n_buckets) and packs each independently — each bucket's
    result is identical to running the sequential packer on that bucket.
    Output: one row per pack — (bucket, pack_id, n_docs, total_tokens).

    Scale design: ONE shuffle (window partitionBy bucket); each bucket's
    running sum is a linear scan within its partition. n_buckets should be
    >= cluster parallelism at scale — buckets are independent, so more
    buckets = more parallelism with no cross-bucket coordination. The output
    agg reuses the same (bucket) partitioning, so AQE plans it shuffle-free.
    """
    from pyspark.sql import Window

    t = fan_out(docs).select(
        F.col(id_col),
        F.pmod(F.col(id_col), F.lit(n_buckets)).alias("bucket"),
        F.size(tokens(F.col(text_col))).alias("_ntok"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.select(
        "bucket",
        id_col,
        "_ntok",
        F.floor((F.sum("_ntok").over(w) - F.col("_ntok")) / F.lit(capacity)).alias(
            "pack_id"
        ),
    )
    return packed.groupBy("bucket", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_ntok").alias("total_tokens"),
    )


def token_rarity(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document corpus-frequency scoring — the integer-exact cousin of
    unigram log-probability (logs are transcendental, so their bits differ
    across engines; an exact integer frequency sum divided once at the end
    hash-matches anywhere).

    Output: (id, n_tokens, freq_sum, mean_token_freq) where freq_sum adds
    the corpus-wide occurrence count of every token occurrence in the doc.
    Low mean frequency = rare vocabulary (OOV-ish / gibberish candidates);
    high = boilerplate-common text. Standard corpus-quality signal next to
    repetition_stats and quality_score.

    Scale shape: explode -> map-side-partial groupBy(token) count (vocab
    table ~ distinct tokens, far smaller than the corpus) -> co-partitioned
    re-join on token -> groupBy(doc) sum. Two inherent shuffles; nothing
    quadratic, no driver materialization.
    """
    toks = fan_out(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    )
    vocab = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cnt"))
    per_doc = (
        toks.join(vocab, "_tok")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_cnt").alias("freq_sum"),
        )
    )
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("int").alias("n_tokens"),
            F.coalesce(F.col("freq_sum"), F.lit(0)).cast("long").alias("freq_sum"),
            F.when(
                F.col("n_tokens").isNotNull(),
                F.col("freq_sum").cast("double") / F.col("n_tokens"),
            ).alias("mean_token_freq"),
        )
    )


def remove_common_spans(
    docs: DataFrame,
    *,
    span_tokens: int = 8,
    min_docs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Boilerplate-span removal (the C4/RefinedWeb line-dedup shape, token
    form): cut each document into consecutive ``span_tokens``-token spans;
    a span whose exact text occurs in >= ``min_docs`` DISTINCT documents is
    boilerplate (headers, navigation, license blurbs) and is removed from
    every document that contains it. Web-corpus text has no reliable line
    structure after extraction, so fixed-token spans stand in for C4's
    "three-sentence" unit while keeping the semantics exact.

    Output: one row per input document —
    (id_col, n_spans, n_kept, cleaned_text) where cleaned_text is the
    surviving spans joined in order (empty string when everything was
    boilerplate).

    Scale shape: span fan-out is shuffle-free (sequence + explode over the
    scan, like chunk_documents); the only shuffles are the (span_text)
    count aggregate — map-side partial, key cardinality ~= corpus token
    count / span_tokens — and the per-doc rebuild groupBy. The common-span
    table (frequency >= min_docs) is a tiny fraction of spans and joins
    broadcast; at 100 TB swap the raw span_text key for its 64-bit hash to
    shrink the aggregate payload (identical plan shape).
    """
    toks = tokens(F.col(text_col))
    t = fan_out(docs).select(
        F.col(id_col).alias("_doc"), toks.alias("_toks"), F.size(toks).alias("_n")
    ).filter(F.col("_n") >= 1)
    n_spans = F.ceil(F.col("_n") / F.lit(float(span_tokens))).cast("int")
    spans = t.select(
        "_doc",
        F.explode(F.sequence(F.lit(0), n_spans - F.lit(1))).alias("_pos"),
        F.col("_toks"),
    ).select(
        "_doc",
        "_pos",
        F.concat_ws(
            " ", F.slice(F.col("_toks"), F.col("_pos") * span_tokens + 1, span_tokens)
        ).alias("_span"),
    )
    common = (
        spans.groupBy("_span")
        .agg(F.countDistinct("_doc").alias("_docs"))
        .filter(F.col("_docs") >= min_docs)
        .select("_span")
    )
    kept = spans.join(F.broadcast(common), "_span", "left_anti")
    rebuilt = kept.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_span"))),
                lambda s: s["_span"],
            ),
        ).alias("cleaned_text"),
    )
    totals = spans.groupBy("_doc").agg(F.count(F.lit(1)).alias("n_spans"))
    return (
        totals.join(rebuilt, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.col("n_spans").cast("int").alias("n_spans"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("int").alias("n_kept"),
            F.coalesce(F.col("cleaned_text"), F.lit("")).alias("cleaned_text"),
        )
    )


def decontaminate_fuzzy(
    train: DataFrame,
    eval_docs: DataFrame,
    *,
    n: int = 5,
    num_hashes: int = 16,
    min_agree: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FUZZY benchmark decontamination: flag training documents whose
    minhash signature agrees with some eval/benchmark document's signature
    on >= ``min_agree`` of ``num_hashes`` components — i.e. estimated
    shingle-Jaccard >= min_agree/num_hashes. Catches the near-verbatim
    leaks (reformatted, lightly edited, concatenated benchmark text) that
    the exact n-gram pass (``decontaminate``) misses; run both, like the
    Llama/PaLM contamination audits pair exact and fuzzy matching.

    Reuses the engine's portable minhash spec (functions/text.py MINHASH_A/
    B over char-``n``-gram shingle hashes — the same signatures
    dedup_minhash_lsh banks on), so results are deterministic and
    oracle-checkable.

    Output: one row per train document —
    (id_col, max_agree int, contaminated boolean).

    Scale shape: the eval side is benchmark-sized, so its exploded
    (component, value, eval_id) index broadcasts; the train side computes
    signatures in one Arrow-batched pass and joins component-wise — the
    only corpus-sized shuffles are the two map-side-partial groupBys
    ((train, eval) agreement count, then per-train max). Agreement
    counting touches only (train, eval) pairs that collide on at least one
    component — the minhash index IS the candidate filter.
    """
    from ..operators.dedup import make_shingle_minhash_udf

    kern = make_shingle_minhash_udf(n, num_hashes).asNondeterministic()

    def sigs(df: DataFrame, out_id: str) -> DataFrame:
        return (
            fan_out(df)
            .select(F.col(id_col).alias(out_id), kern(F.col(text_col)).alias("_k"))
            .filter(F.size("_k.hashes") >= 1)
            .select(out_id, F.posexplode("_k.sig").alias("_j", "_v"))
        )

    ev = sigs(eval_docs, "eval_id")
    tr = sigs(train, "train_id")
    agree = (
        tr.join(F.broadcast(ev), ["_j", "_v"])
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    mx = agree.groupBy("train_id").agg(F.max("_n").alias("_m"))
    base = train.select(F.col(id_col).alias("train_id"))
    return base.join(mx, "train_id", "left").select(
        F.col("train_id").alias(id_col),
        F.coalesce(F.col("_m"), F.lit(0)).cast("int").alias("max_agree"),
        (F.coalesce(F.col("_m"), F.lit(0)) >= min_agree).alias("contaminated"),
    )


def hash_embed(
    docs: DataFrame,
    *,
    dim: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "kernel",
) -> DataFrame:
    """Feature-hashing ("hashing trick") text embedder: word tokens ->
    signed hashed buckets -> L2-normalized ``array<double>`` of fixed
    ``dim``. Output: (id_col, embedding).

    Gives every text corpus a deterministic, model-free embedding column,
    so the engine's whole vector surface (ann_*_topk, dedup_embedding,
    semantic_dedup, kmeans, quantize_embeddings) composes onto raw
    documents with no external model. Spec (portable, oracle-checkable):

    - token = runs of [a-z0-9] over ASCII-case-folded text (functions/
      text.py::ascii_word_tokens — A-Z folded via a 26-entry translate,
      never the engine's Unicode ``lower``, so Spark / Python / DuckDB
      tokenize identically on ARBITRARY input, not just ASCII corpora);
    - h = polynomial char-fold hash of the token (char_hash, mod 1e9+7);
    - bucket = h mod dim; sign = -1 if (h mod 2*dim) >= dim else +1
      (the classic next-bit sign hash — Weinberger et al. 2009's signed
      feature hashing keeps the estimator unbiased);
    - v[bucket] += sign over all tokens (integer-exact), then v / ||v||_2
      with the norm accumulated by the engine-wide left fold (zero vector
      stays zero).

    ``strategy``: 'kernel' (default) computes the whole embedding in ONE
    Arrow-batched pandas_udf — a pure per-row map with ZERO shuffle (the
    engine's minhash/cosine-kernel pattern): Python re tokenization +
    integer char-fold hashing produce the exact same integers as the
    declarative spec, and the norm accumulates dim-ascending (elementwise
    the left fold's IEEE op order), so outputs are bit-identical
    (test-pinned, hypothesis-fuzzed over arbitrary Unicode) and the same
    DuckDB oracle applies. 'expr' is the declarative path — the oracle's
    literal mirror (explode + groupBy with ``dim`` conditional integer
    sums: one corpus-sized shuffle).

    Scale (100 TB): kernel = scan-bound map, no shuffle at all; expr = one
    shuffle; either way no vocabulary table, no model broadcast, output is
    dim x 8 bytes per doc. Empty/no-token docs produce the zero vector.
    """
    if strategy not in ("kernel", "expr"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "kernel":
        return _hash_embed_kernel(docs, dim=dim, id_col=id_col, text_col=text_col)
    from ..functions.text import ascii_word_tokens, char_hash

    toks = docs.select(
        F.col(id_col), F.explode(ascii_word_tokens(F.col(text_col))).alias("_tok")
    )
    h = char_hash(F.col("_tok"))
    signed = toks.select(
        id_col,
        (h % F.lit(dim)).alias("_b"),
        F.when((h % F.lit(2 * dim)) >= F.lit(dim), F.lit(-1))
        .otherwise(F.lit(1))
        .alias("_s"),
    )
    sums = signed.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("_b") == i, F.col("_s")).otherwise(F.lit(0))).alias(
                f"_c{i}"
            )
            for i in range(dim)
        ]
    )
    arr = F.array(
        *[F.coalesce(F.col(f"_c{i}"), F.lit(0)).cast("double") for i in range(dim)]
    )
    with_vec = (
        docs.select(id_col).join(sums, id_col, "left").select(id_col, arr.alias("_v"))
    )
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(F.col("_v"), F.col("_v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    emb = F.when(
        norm > 0, F.transform(F.col("_v"), lambda x: x / norm)
    ).otherwise(F.col("_v"))
    return with_vec.select(id_col, emb.alias("embedding"))


def _hash_embed_kernel(
    docs: DataFrame, *, dim: int, id_col: str, text_col: str
) -> DataFrame:
    """Arrow-batched hash_embed (see hash_embed docstring): bit-identical
    to the declarative spec on arbitrary text, zero shuffle."""
    import re as _re

    import numpy as np
    import pandas as pd

    from ..functions.text import ASCII_LOWER, ASCII_UPPER, HASH_BASE, HASH_P

    tok_re = _re.compile(r"[a-z0-9]+")
    # the same 26-entry ASCII fold as ascii_word_tokens / the oracle's
    # translate() — NOT str.lower(), whose Unicode mapping diverges from
    # the JVM's on a handful of code points
    fold = str.maketrans(ASCII_UPPER, ASCII_LOWER)

    # NOTE: no type annotations — `from __future__ import annotations`
    # turns them into unresolvable strings for pandas_udf's hint inference
    def embed_fn(texts):
        out = []
        for t in texts.to_numpy():
            v = np.zeros(dim, dtype=np.int64)
            if t is not None:
                for tok in tok_re.findall(str(t).translate(fold)):
                    h = 0
                    for ch in tok:
                        h = (h * HASH_BASE + ord(ch)) % HASH_P
                    v[h % dim] += -1 if (h % (2 * dim)) >= dim else 1
            fv = v.astype(np.float64)
            # norm via the left fold's op order: dim-ascending accumulate
            acc = 0.0
            for d in range(dim):
                acc += fv[d] * fv[d]
            if acc > 0:
                fv = fv / np.sqrt(acc)
            out.append(fv)
        return pd.Series(out)

    # asNondeterministic: the kernel is pure, but the flag stops Catalyst
    # inlining the UDF into downstream filters/projections and evaluating
    # it multiple times per row (same rationale as distance.py's kernels)
    embed = F.pandas_udf(embed_fn, "array<double>").asNondeterministic()
    return docs.select(
        F.col(id_col), embed(F.col(text_col)).alias("embedding")
    )


# portable PII patterns: the common subset of Java regex (Spark) and RE2
# (DuckDB) — no lookaround, no backrefs, greedy quantifiers only, so both
# engines produce identical matches and replacements
PII_PATTERNS = {
    "email": r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"[0-9]{3}-[0-9]{3}-[0-9]{4}",
}


def redact_pii(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """PII scrubbing for training corpora: replace emails / URLs / phone
    numbers with typed placeholder tokens and count each category.

    Output: (id_col, redacted, n_emails, n_urls, n_phones). Counts are
    measured per-category on the ORIGINAL text (overlaps count in every
    matching category); the redacted text applies replacements
    sequentially email -> url -> phone. Patterns live in ``PII_PATTERNS``
    and deliberately stay inside the Java-regex/RE2 common subset so the
    operator is exactly reproducible cross-engine (hash-graded by q100).

    Scale: a pure per-row projection — no shuffle, no UDF; regexp engines
    run inside codegen. At 100 TB this is scan-bound, exactly what a
    corpus-wide scrub pass should be.
    """
    t = F.col(text_col)
    red = t
    for kind, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return docs.select(
        F.col(id_col),
        red.alias("redacted"),
        *[
            F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0))).alias(
                f"n_{kind}s"
            )
            for kind, pat in PII_PATTERNS.items()
        ],
    )


def ngram_lm_score(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model fluency score per document —
    the CCNet-style perplexity-filter shape (Wenzek et al. 2020 rank web
    text by LM perplexity; Laurencon et al. 2022 use the same signal in
    BigScience ROOTS). Engine extension beyond the reference surface
    (``Team11-Project.py`` has no text analysis).

    Model: add-one-smoothed bigram probabilities trained on the corpus
    itself (self-scoring, the decontamination-free default):

        p(w2 | w1) = (c(w1 w2) + 1) / (c(w1 .) + V)

    with c(w1 .) the count of w1 as a bigram prefix and V the corpus
    vocabulary size. Score: ``avg_prob`` = mean in-document bigram
    probability, folded in POSITION order. Deliberately not a log score:
    +, / on integer-exact counts are correctly-rounded IEEE ops so the
    fold reproduces bit-for-bit on any engine, while ln() differs in the
    last ulp across libm implementations — the same reasoning as
    tfidf_topk's raw-frequency idf. (A log-space score over the identical
    probabilities is one ``F.log`` away for users who want perplexity
    proper; the graded projection keeps the exact form.)

    Output: one row per document — (id_col, n_bigrams, avg_prob), with
    n_bigrams = 0 and avg_prob = 0.0 for docs shorter than 2 tokens.

    Scale shape (100 TB): bigram fan-out is shuffle-free (transform +
    explode over the scan); the model tables are one map-side-partial
    groupBy each — the bigram table is vocabulary^2-bounded but Zipf-
    concentrated (far below corpus size), the prefix table is derived from
    the grouped bigram table (never re-reads the corpus), and V is a
    1-row broadcast. Scoring joins the corpus bigram stream against the
    model on (w1, w2) — AQE broadcasts it when it fits, shuffle-join
    otherwise — and the per-doc regroup is the only corpus-sized shuffle.
    """
    toks = tokens(F.col(text_col))
    t = fan_out(docs).select(F.col(id_col).alias("_doc"), toks.alias("_toks"))
    n = F.size("_toks")
    pairs = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.element_at(F.col("_toks"), i).alias("w1"),
                F.element_at(F.col("_toks"), i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<pos:int,w1:string,w2:string>>"))
    b = t.select("_doc", F.explode(pairs).alias("_p")).select(
        "_doc",
        F.col("_p.pos").alias("_pos"),
        F.col("_p.w1").alias("_w1"),
        F.col("_p.w2").alias("_w2"),
    )
    cb = b.groupBy("_w1", "_w2").agg(F.count(F.lit(1)).alias("_cb"))
    cu = cb.groupBy("_w1").agg(F.sum("_cb").alias("_cu"))
    v = t.select(F.explode("_toks").alias("_w")).agg(
        F.countDistinct("_w").alias("_v")
    )
    scored = (
        # no broadcast hints on the model tables: cb AND cu are
        # vocabulary-sized and can be multi-GB on a web corpus — AQE
        # decides broadcast-vs-shuffle from measured sizes (review
        # finding: a forced hint bypasses the size check and dies on the
        # broadcast limit exactly when the docstring promises scale)
        b.join(cb, ["_w1", "_w2"])
        .join(cu, "_w1")
        .crossJoin(F.broadcast(v))
        .withColumn(
            "_p",
            (F.col("_cb") + F.lit(1)).cast("double")
            / (F.col("_cu") + F.col("_v")).cast("double"),
        )
    )
    perdoc = scored.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("_pos", "_p"))),
            F.lit(0.0),
            lambda a, s: a + s["_p"],
        ).alias("_s"),
    )
    return (
        docs.select(F.col(id_col).alias("_doc"))
        .join(perdoc, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("int").alias("n_bigrams"),
            F.coalesce(
                F.col("_s") / F.col("n_bigrams").cast("double"), F.lit(0.0)
            ).alias("avg_prob"),
        )
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Maximal cross-document duplicated token regions — the ExactSubstr
    dedup shape (Lee et al. 2021, "Deduplicating Training Data Makes
    Language Models Better": remove substrings shared verbatim across
    documents) at fixed token granularity. Complements
    ``remove_common_spans`` (q89): that one cuts NON-overlapping fixed
    blocks and removes whole blocks; this one slides a STRIDE-1 window so
    duplicated regions are located exactly (start/end token positions,
    maximal extent), which is what a surgical span-removal pass needs.

    Method: hash every n-token window at every position (stride 1) with
    the portable char-fold spec; windows whose hash occurs in >=
    ``min_docs`` DISTINCT documents are duplicated; per document,
    overlapping/adjacent duplicated windows (gap <= n) merge into maximal
    islands via the lag + running-sum island trick. Hash collisions
    collapse identically on every engine (the oracle hashes the same
    spec), so the result is cross-engine exact; with a ~2^30-bounded
    polynomial hash a collision is a documented approximation, the same
    trade minhash/simhash make.

    Output: one row per island —
    (id_col, island, span_start, span_end, span_tokens, n_windows), token
    positions 1-based inclusive.

    Scale shape (100 TB): window fan-out is shuffle-free; the hash
    frequency table is one map-side-partial groupBy on a LONG key (never
    the window text — the shuffle moves 8 bytes per window, SURVEY §4's
    array-shuffle-key hazard avoided); the duplicated-hash set is a small
    fraction and joins back semi-join style; the island merge is one
    per-doc window over hit positions only (hits, not all windows).
    """
    toks = tokens(F.col(text_col))
    t = fan_out(docs).select(F.col(id_col).alias("_doc"), toks.alias("_toks"))
    npos = F.size("_toks") - (n - 1)
    grams = t.select(
        "_doc",
        F.explode(
            F.when(
                npos >= 1,
                F.transform(
                    F.sequence(F.lit(1), npos),
                    lambda i: F.struct(
                        i.alias("p"),
                        char_hash(F.concat_ws(" ", F.slice("_toks", i, n))).alias(
                            "g"
                        ),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<p:int,g:long>>"))
        ).alias("_s"),
    ).select("_doc", F.col("_s.p").alias("_p"), F.col("_s.g").alias("_g"))
    common = (
        grams.groupBy("_g")
        .agg(F.countDistinct("_doc").alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_g")
    )
    hits = grams.join(common, "_g").select("_doc", "_p")
    w = Window.partitionBy("_doc").orderBy("_p")
    isl = hits.withColumn(
        "_new",
        F.when(
            F.col("_p") - F.coalesce(F.lag("_p").over(w), F.lit(-(10**9))) <= n,
            F.lit(0),
        ).otherwise(F.lit(1)),
    ).withColumn("_isl", F.sum("_new").over(w))
    return (
        isl.groupBy("_doc", "_isl")
        .agg(
            F.min("_p").alias("_start"),
            (F.max("_p") + F.lit(n - 1)).alias("_end"),
            F.count(F.lit(1)).alias("_nw"),
        )
        .select(
            F.col("_doc").alias(id_col),
            F.col("_isl").cast("int").alias("island"),
            F.col("_start").cast("int").alias("span_start"),
            F.col("_end").cast("int").alias("span_end"),
            (F.col("_end") - F.col("_start") + 1).cast("int").alias("span_tokens"),
            F.col("_nw").cast("int").alias("n_windows"),
        )
    )


def cap_per_source(
    docs: DataFrame,
    *,
    cap: int = 20,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Domain-frequency capping (the RefinedWeb / C4 per-domain cap): keep
    at most ``cap`` documents per ``group_col``, preferring the
    highest-token-count documents (total order: n_tokens DESC, id ASC — a
    deterministic quality proxy any engine reproduces exactly).

    A single rank window partitioned by the group: Catalyst's
    WindowGroupLimit inserts the PARTIAL limit before the shuffle, so a
    mega-domain (the skew case this operator exists for — one host
    contributing millions of pages) ships at most ``cap`` rows per map
    partition instead of its whole slice; state after the shuffle is
    ``cap`` rows per domain. No collect, one shuffle on the group key.

    Output: (id_col, group_col, n_tokens, rank) for KEPT documents only.
    """
    from ..functions.text import token_count
    from .topk import topk_per_key

    t = docs.select(
        F.col(id_col),
        F.col(group_col),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    return topk_per_key(
        t, group_col, [F.desc("n_tokens"), F.asc(id_col)], cap
    ).select(id_col, group_col, "n_tokens", "rank")


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    max_postings: "int | None" = None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval (Robertson & Walker 1994) — the standard
    lexical ranking for retrieval-augmented pipelines. Engine extension
    beyond the reference surface (``Team11-Project.py`` has no text
    analysis).

    Score per (query, doc) = sum over DISTINCT query terms t present in d:

        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    with the RATIONAL idf = (N - df + 0.5) / (df + 0.5) + 1 — the argument
    of the textbook log-idf, unlogged, for the same reason as tfidf_topk's
    raw-frequency idf: +, *, / on exact integers/halves are correctly-
    rounded IEEE ops that reproduce bit-for-bit on any engine, while ln()
    differs in the last ulp across libm implementations (monotone in df
    either way, so ranking semantics are preserved; wrap ``F.log`` around
    it for the textbook value). The per-term contribution is rounded to
    integer micro-units (the cents trick) before summing, so the per-query
    sum is an integer aggregate — exact and ORDER-INDEPENDENT, immune to
    float-sum reassociation across partitions.

    Output: (qid_col, rank, id_col, score) — top ``k`` docs per query by
    (score desc, id asc), score in 1e-6 units as double. Docs sharing no
    term with the query never appear.

    Scale shape (100 TB): one corpus-sized shuffle (the (doc, term) tf
    groupBy, map-side partial; dl rides along as a constant-per-doc group
    key — no second corpus join). The df table is VOCABULARY-sized and
    joins tf broadcast-by-AQE; N/avgdl is a 1-row broadcast cross join.
    The query term list is workload-sized and broadcast by AQE from its
    measured size (shuffle-join fallback if a huge standing-query workload
    outgrows it), so matching normally never reshuffles the corpus; the per-(query, doc) sum and the
    final top-k window shuffle only MATCHED rows, and WindowGroupLimit
    prunes the window map-side to k rows per query per partition.

    ``max_postings`` (opt-in) is the hot-term skew guard: a stopword-ish
    query term matches EVERY document, so the matched-row shuffle for
    that term is corpus-sized. When set, each query term keeps only its
    ``max_postings`` highest-IMPACT matches (exact contribution order:
    micro-units desc, id asc — not a tf proxy) before the per-query sum;
    WindowGroupLimit bounds the kept rows map-side. This is classic
    impact-ordered posting truncation (the static index-pruning
    counterpart of WAND): top results dominated by high-impact postings
    are preserved, docs reachable only through tail postings of
    saturated terms may drop — the standard recall trade, deterministic
    and oracle-replayable here.
    """
    index = bm25_build(docs, id_col=id_col, text_col=text_col)
    return bm25_search(
        queries,
        index,
        k=k,
        k1=k1,
        b=b,
        id_col=id_col,
        qid_col=qid_col,
        qtext_col=qtext_col,
        max_postings=max_postings,
    )


def bm25_build(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "dict[str, DataFrame]":
    """Build the persistable BM25 index — the build-once/serve-many split
    of ``bm25_topk`` (r5, mirror of similarity.py's ivfpq_build/
    ivfpq_search): the corpus-sized work (tokenize + tf groupBy + df agg)
    runs ONCE, the product is three DataFrames a user parquets and every
    subsequent ``bm25_search`` call reads — search never touches the raw
    corpus again.

    Returns ``{"tf": (id_col, dl, term, tf), "df": (term, df),
    "stats": (n_docs, total_tokens) — exactly 1 row}``. Columns are
    PUBLIC (no underscore) because the index is a storage format;
    ``bm25_search`` validates the shape eagerly.

    Scale shape (100 TB): tf is the only corpus-sized table — one shuffle
    to build (map-side partial count; dl rides as a group key so there is
    no second corpus join). Persist it partitioned/bucketed BY TERM
    (e.g. ``df.repartition("term").write.bucketBy(n, "term")``): the
    search-side query-term join then prunes to the query vocabulary's
    buckets instead of scanning the full index. df is vocabulary-sized,
    stats is 1 row.
    """
    t = fan_out(docs).select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    )
    toks = t.select(
        id_col, F.size("_toks").alias("dl"), F.explode("_toks").alias("term")
    )
    tf = toks.groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = t.agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.sum(F.size("_toks")).alias("total_tokens"),
    )
    return {"tf": tf, "df": df_tbl, "stats": stats}


def bm25_search(
    queries: DataFrame,
    index: "dict[str, DataFrame]",
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    max_postings: "int | None" = None,
) -> DataFrame:
    """Serve BM25 top-k from a prebuilt ``bm25_build`` index (parquet
    round-trip safe — test-pinned identical to the composed ``bm25_topk``).
    Scoring semantics, tie order, micro-unit arithmetic and the
    ``max_postings`` hot-term guard are exactly ``bm25_topk``'s (it
    delegates here). Per-call cost is WORKLOAD-sized: the query-term join
    against tf (AQE-sized; term-bucketed index storage prunes it), the
    vocabulary-sized df join, the matched-row sum and the top-k window —
    no corpus scan, no tokenize, no tf shuffle.
    """
    contrib = _bm25_contrib(
        queries, index, k1=k1, b=b, id_col=id_col,
        qid_col=qid_col, qtext_col=qtext_col,
    )
    if max_postings is not None:
        contrib = topk_per_key(
            contrib,
            [qid_col, "term"],
            [F.desc("_c"), F.asc(id_col)],
            max_postings,
            rank_col="_prn",
        ).drop("_prn")
    scored = contrib.groupBy(qid_col, id_col).agg(
        F.sum("_c").alias("_score_micro")
    )
    top = topk_per_key(
        scored, qid_col, [F.desc("_score_micro"), F.asc(id_col)], k
    )
    return top.select(
        qid_col,
        "rank",
        id_col,
        (F.col("_score_micro").cast("double") / F.lit(1_000_000.0)).alias("score"),
    )


def _bm25_contrib(
    queries: DataFrame,
    index: "dict[str, DataFrame]",
    *,
    k1: float,
    b: float,
    id_col: str,
    qid_col: str,
    qtext_col: str,
) -> DataFrame:
    """Shared scoring core of bm25_search / bm25_search_pruned: validate the
    index shape, explode the query vocabulary, and emit one row per matched
    (query, doc, term) with the exact micro-unit contribution ``_c`` (plus
    the riding ``df``/``tf``/``dl`` columns)."""
    missing = {"tf", "df", "stats"} - set(index)
    if missing:
        raise ValueError(f"bm25 index missing tables: {sorted(missing)}")
    tf, df_tbl, stats = index["tf"], index["df"], index["stats"]
    for tbl, cols in (
        (tf, {id_col, "dl", "term", "tf"}),
        (df_tbl, {"term", "df"}),
        (stats, {"n_docs", "total_tokens"}),
    ):
        absent = cols - set(tbl.columns)
        if absent:
            raise ValueError(f"bm25 index table missing columns: {sorted(absent)}")
    qt = (
        queries.select(
            F.col(qid_col), F.explode(tokens(F.col(qtext_col))).alias("term")
        )
        .distinct()
    )
    idf = (
        (F.col("n_docs") - F.col("df")).cast("double") + F.lit(0.5)
    ) / (F.col("df").cast("double") + F.lit(0.5)) + F.lit(1.0)
    avgdl = F.col("total_tokens").cast("double") / F.col("n_docs").cast("double")
    norm = F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("dl").cast("double") / avgdl)
    )
    # (k1 + 1) as an ENGINE-side fold of the two decimal literals, never a
    # Python-computed constant: both engines parse k1 to the same nearest
    # double and add 1.0 with one correctly-rounded IEEE op, so the folded
    # constant is bit-identical; a host-language sum baked into the plan
    # could land on the other side of a rounding tie.
    sat = (F.col("tf").cast("double") * (F.lit(k1) + F.lit(1.0))) / (
        F.col("tf").cast("double") + norm
    )
    # no forced hint on the query-term table: a standing-query workload is
    # user-sized and can outgrow broadcast range (the ngram_lm review
    # finding) — AQE broadcasts it from measured size when it fits (the
    # normal case, keeping the corpus unshuffled for matching) and falls
    # back to a shuffle join when it genuinely doesn't
    contrib = (
        tf.join(qt, "term")
        .join(df_tbl, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_c", F.round(idf * sat * F.lit(1_000_000.0), 0).cast("long")
        )
    )
    return contrib


def bm25_search_pruned(
    queries: DataFrame,
    index: "dict[str, DataFrame]",
    *,
    k: int = 10,
    max_postings: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    qid_col: str = "query_id",
    qtext_col: str = "query_text",
    certificate: bool = False,
) -> DataFrame:
    """LOSSLESS dynamic-pruned BM25 top-k — the exact (WAND-flavored)
    sibling of ``max_postings`` static truncation, same filter-and-verify
    shape as knn.py's knn_join_lb: results are ALWAYS identical to the
    unpruned ``bm25_search`` (test- and oracle-pinned), the pruning only
    bounds how many posting rows the scoring shuffle moves.

    Two-pass plan:

    1. FILTER: keep each query term's ``max_postings`` highest-impact
       postings (exact micro-unit order; WindowGroupLimit bounds kept rows
       map-side — the q119 skew guard). The candidate set is every doc
       surviving in >= 1 kept posting. Per (query, term), every DROPPED
       posting's impact is <= the minimum KEPT impact (impact order), so
       ``tail(q, t) = min kept _c if df(t) > max_postings else 0`` upper-
       bounds any dropped posting; a NON-candidate doc's whole score is
       <= ``tail_sum(q) = sum_t tail(q, t)``. df(t) is exactly the
       (q, t) posting count, so no window-count (which would defeat
       WindowGroupLimit's map-side pruning) is needed.
    2. VERIFY: candidates are re-scored EXACTLY (semi-join back to the full
       contribution stream on (query, doc) — moves candidate rows only),
       top-k ranked, and theta(q) = the k-th exact candidate score. The
       top-k is PROVEN complete iff ``tail_sum == 0`` (nothing was dropped
       anywhere) or ``n_candidates >= k and tail_sum < theta`` (strict:
       integer micro-unit scores mean no unseen doc can even tie). Queries
       whose certificate fails — hot-term workloads where the static
       truncation (q119) genuinely loses recall — are ESCALATED to full
       unpruned scoring, restricted to just those queries, so the result
       is exact for every query while typical workloads never pay the
       full posting-list shuffle.

    ``certificate=True`` returns the proof table instead of results:
    (qid_col, n_candidates, theta_micro, tail_sum_micro, proven) — one row
    per query with >= 1 matched term.

    Scale shape (100 TB): pass-1 shuffle moves <= max_postings rows per
    (query, term) (WindowGroupLimit map-side); the verify semi-join keys
    are workload-sized (AQE broadcasts them); escalation re-runs only the
    failing queries' postings. The corpus-sized tf table is read twice
    (rank pass + verify pass) — cache or persist the index for serving.
    """
    from ..caching import register_cache

    if max_postings < 1:
        # max_postings >= 1 is what guarantees every matched query keeps
        # >= 1 candidate and therefore gets a certificate row; at 0 the
        # proven/escalated split would silently drop matched queries
        raise ValueError(f"max_postings must be >= 1, got {max_postings}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    contrib = _bm25_contrib(
        queries, index, k1=k1, b=b, id_col=id_col,
        qid_col=qid_col, qtext_col=qtext_col,
    )
    # kept / exact / cert are WORKLOAD-sized by construction (<= queries x
    # terms x max_postings rows) and each feeds several downstream branches
    # (tails + candidates; ranking + theta + n_cand; proven + escalation
    # gating). Cached, the corpus-sized contrib stream executes exactly
    # three times (rank pass, verify pass, escalation pass — the documented
    # shape); uncached, Spark re-derives it per branch (~8-10 corpus passes,
    # measured 30s vs ~5s at sf0.1). Caches register with caching.py's
    # scope stack; outside a cache_scope they are LRU-evictable and bounded.
    kept = register_cache(
        topk_per_key(
            contrib,
            [qid_col, "term"],
            [F.desc("_c"), F.asc(id_col)],
            max_postings,
            rank_col="_prn",
        ).cache()
    )
    # tail bound per (query, term): df == matched posting count, so
    # df > max_postings <=> something was dropped
    tails = kept.groupBy(qid_col, "term", "df").agg(
        F.min("_c").alias("_minkept")
    )
    tail_sum = tails.groupBy(qid_col).agg(
        F.sum(
            F.when(F.col("df") > max_postings, F.col("_minkept")).otherwise(
                F.lit(0)
            )
        ).alias("_tail_sum")
    )
    cand = kept.select(qid_col, id_col).distinct()
    exact = register_cache(
        contrib.join(cand, [qid_col, id_col], "left_semi")
        .groupBy(qid_col, id_col)
        .agg(F.sum("_c").alias("_score_micro"))
        .cache()
    )
    ranked = topk_per_key(
        exact, qid_col, [F.desc("_score_micro"), F.asc(id_col)], k
    )
    per_q = exact.groupBy(qid_col).agg(F.count(F.lit(1)).alias("_n_cand"))
    theta = ranked.groupBy(qid_col).agg(F.min("_score_micro").alias("_theta"))
    cert = register_cache(
        per_q.join(theta, qid_col)
        .join(tail_sum, qid_col)
        .withColumn(
            "_proven",
            (F.col("_tail_sum") == 0)
            | ((F.col("_n_cand") >= k) & (F.col("_tail_sum") < F.col("_theta"))),
        )
        .cache()
    )
    if certificate:
        return cert.select(
            qid_col,
            F.col("_n_cand").alias("n_candidates"),
            F.col("_theta").alias("theta_micro"),
            F.col("_tail_sum").alias("tail_sum_micro"),
            F.col("_proven").alias("proven"),
        )
    unproven = cert.filter(~F.col("_proven")).select(qid_col)
    proven_top = ranked.join(
        cert.filter(F.col("_proven")).select(qid_col), qid_col, "left_semi"
    )
    escalated = (
        contrib.join(F.broadcast(unproven), qid_col, "left_semi")
        .groupBy(qid_col, id_col)
        .agg(F.sum("_c").alias("_score_micro"))
    )
    escalated_top = topk_per_key(
        escalated, qid_col, [F.desc("_score_micro"), F.asc(id_col)], k
    )
    top = proven_top.unionByName(escalated_top)
    return top.select(
        qid_col,
        "rank",
        id_col,
        (F.col("_score_micro").cast("double") / F.lit(1_000_000.0)).alias("score"),
    )


def rrf_fuse(
    rankings: "list[DataFrame]",
    *,
    k: int = 10,
    c: int = 60,
    qid_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — the standard hybrid-
    retrieval combiner (lexical BM25 leg + semantic ANN leg in RAG
    pipelines): fused(d) = sum over legs ranking d of 1 / (c + rank_leg(d)),
    missing legs contribute 0. Engine extension beyond the reference
    surface.

    Each per-leg reciprocal is one correctly-rounded IEEE division, rounded
    to integer micro-units before the sum (the cents trick), so the
    per-(query, doc) aggregate is exact and order-independent — immune to
    union/partition reassociation — and any engine replays it bit-for-bit.

    Output: (qid_col, rank, id_col, rrf_score) — top ``k`` per query by
    (fused score desc, id asc), rrf_score in 1e-6 units as double.

    Scale shape (100 TB): the legs are already per-query top-k tables
    (workload x k rows, corpus-independent), so the union + groupBy + final
    WindowGroupLimit top-k all run on workload-sized data; the corpus is
    never touched.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    legs = [r.select(qid_col, id_col, rank_col) for r in rankings]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    contrib = u.withColumn(
        "_c",
        F.round(
            F.lit(1_000_000.0)
            / (F.lit(float(c)) + F.col(rank_col).cast("double")),
            0,
        ).cast("long"),
    )
    fused = contrib.groupBy(qid_col, id_col).agg(F.sum("_c").alias("_micro"))
    top = topk_per_key(fused, qid_col, [F.desc("_micro"), F.asc(id_col)], k)
    return top.select(
        qid_col,
        "rank",
        id_col,
        (F.col("_micro").cast("double") / F.lit(1_000_000.0)).alias("rrf_score"),
    )


def _hashed_ngram_features(docs: DataFrame, id_col: str, text_col: str,
                           n_buckets: int, hash_mode: str = "portable") -> DataFrame:
    """(id, bucket, c): hashed unigram+bigram counts per document — the
    DSIR feature space. hash_mode='portable': polynomial char-fold hash of
    the token (bigrams space-joined) mod n_buckets, DuckDB-reproducible
    but interpreted per char (a Spark HOF). hash_mode='xxhash64':
    JVM-native xxhash64 mod n_buckets — the production mode (dedup.py's
    convention; ~2.5x end-to-end at sf0.1: 4.9s -> 2.0s), same operator
    semantics, different bucket assignment so no cross-engine oracle. The
    bigram sequence is guarded (Spark sequence() DESCENDS when the doc has
    < 2 tokens)."""
    if hash_mode == "xxhash64":
        bucket = F.pmod(F.xxhash64(F.col("_g")), F.lit(n_buckets))
    elif hash_mode == "portable":
        bucket = char_hash(F.col("_g")) % n_buckets
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    # tokens materialize as a COLUMN first: a lambda that indexes the
    # tokens(text) EXPRESSION re-evaluates the whole tokenizer per element
    # (O(len^2) per doc — featurization measured 12s -> 4.5s portable / 1.2s xxhash64 at sf0.1); bigrams then pair
    # adjacent slices with zip_with, never element_at over an expression
    tk = docs.select(F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_tk"))
    n = F.size("_tk")
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("_tk", 1, n - 1),
            F.slice("_tk", 2, n - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        tk.select("_id", F.explode(F.concat(F.col("_tk"), bigrams)).alias("_g"))
        .select("_id", bucket.alias("bucket"))
        .groupBy("_id", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def importance_resample(
    docs: DataFrame,
    target: DataFrame,
    *,
    n_buckets: int = 256,
    keep_fraction: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_mode: str = "portable",
) -> DataFrame:
    """DSIR-shaped importance resampling (Xie et al., "Data Selection for
    Language Models via Importance Resampling", NeurIPS 2023): score every
    raw document by how much its hashed-n-gram profile looks like a small
    TARGET corpus (the distribution you want more of — curated text, a
    domain, a language), then keep the top ``keep_fraction``.

    Engine formulation (the q101/q51 no-ln() playbook): DSIR's log-
    likelihood ratio is replaced by the LINEAR-domain per-bucket ratio

        ratio_micro(b) = round(1e6 * ((t_b+1)*(R+B)) / ((r_b+1)*(T+B)))

    (add-one smoothed target/raw bucket probabilities; the numerator and
    denominator are exact BIGINT products, the quotient ONE correctly-
    rounded IEEE division) and a document's score is the exact integer
    count-weighted mean  round(sum_b c_b*ratio_micro(b) / n_feats)  —
    rank-equivalent to the first-order expansion of the log form,
    bit-reproducible by a DuckDB twin. Docs with no features score 0.
    Selection is the q73 percentile gate: keep score >= the exact
    (1-keep_fraction) percentile (ties keep slightly more than the
    fraction — deterministic, documented).

    Scale (100 TB): the feature table is one map-side-combinable
    (doc, bucket) groupBy; both distributions are B-row tables broadcast
    back onto it; the per-doc score is a second map-side agg. The exact
    percentile is the only width-sensitive step — swap in
    approx_percentile at extreme scale (q36 note).

    Output: (id_col, score_micro bigint, kept boolean) for EVERY input
    doc, so recall/selection audits don't need a second pass.
    """
    if not 0 < keep_fraction <= 1:
        raise ValueError(f"keep_fraction must be in (0, 1], got {keep_fraction}")
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    raw_f = _hashed_ngram_features(docs, id_col, text_col, n_buckets, hash_mode)
    tgt_f = _hashed_ngram_features(target, id_col, text_col, n_buckets, hash_mode)
    r_b = raw_f.groupBy("bucket").agg(F.sum("c").alias("r"))
    t_b = tgt_f.groupBy("bucket").agg(F.sum("c").alias("t"))
    # coalesce: an EMPTY target (or featureless corpus) sums to NULL, which
    # would null every ratio -> every score 0 -> kept=true for all docs
    # (self-review r5; the oracle always coalesced — this matches it)
    totals = (
        r_b.agg(F.coalesce(F.sum("r"), F.lit(0)).alias("r_total"))
        .crossJoin(t_b.agg(F.coalesce(F.sum("t"), F.lit(0)).alias("t_total")))
    )
    ratio = (
        r_b.join(t_b, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.round(
                (
                    (F.coalesce(F.col("t"), F.lit(0)) + 1)
                    * (F.col("r_total") + n_buckets)
                ).cast("double")
                / ((F.col("r") + 1) * (F.col("t_total") + n_buckets)).cast("double")
                * 1_000_000
            ).cast("long").alias("ratio_micro"),
        )
    )
    scored = (
        raw_f.join(F.broadcast(ratio), "bucket")
        .groupBy("_id")
        .agg(
            F.sum(F.col("c") * F.col("ratio_micro")).alias("_w"),
            F.sum("c").alias("_n"),
        )
        .select(
            "_id",
            F.round(
                F.col("_w").cast("double") / F.col("_n").cast("double")
            ).cast("long").alias("score_micro"),
        )
    )
    from ..caching import register_cache

    # alldocs is BOUNDED (one (id, int64) row per doc) and feeds two
    # branches (the percentile agg and the gated output); cached, the
    # tokenize+explode+groupBy feature tree executes once instead of twice
    # (with the zip_with fix: 4.9s portable end-to-end at sf0.1). Registers with caching.py's scope
    # stack — LRU-evictable outside a cache_scope.
    alldocs = register_cache(
        docs.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select("_id", F.coalesce("score_micro", F.lit(0)).alias("score_micro"))
        .cache()
    )
    thresh = alldocs.agg(
        F.expr(f"percentile(score_micro, {1 - keep_fraction!r}D)").alias("_t")
    )
    return (
        alldocs.crossJoin(F.broadcast(thresh))
        .select(
            F.col("_id").alias(id_col),
            "score_micro",
            (F.col("score_micro").cast("double") >= F.col("_t")).alias("kept"),
        )
    )
