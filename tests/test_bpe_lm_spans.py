"""Unit tests for the round-3 curation additions: distributed BPE
(train/encode vs a pure-Python golden implementation), bigram LM scoring
(hand-computed smoothed probabilities), and duplicate-span islands
(hand-built overlap geometry). Cross-engine parity is covered by
test_oracle_parity (q101-q104)."""

import math

import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    bpe_encode,
    duplicate_spans,
    ngram_lm_score,
    train_bpe,
)


# ---------------------------------------------------------------------------
# golden reference: BPE exactly as specified (pure Python, no Spark)
# ---------------------------------------------------------------------------


def _golden_apply(syms, a, b):
    out = []
    for s in syms:
        if out and out[-1] == a and s == b:
            out[-1] = a + b
        else:
            out.append(s)
    return out


def _golden_train(texts, num_merges):
    from collections import Counter

    freq = Counter(w for t in texts for w in t.lower().split())
    vocab = {w: list(w) for w in freq}
    merges = []
    for step in range(1, num_merges + 1):
        counts = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += freq[w]
        if not counts:
            break
        # total order: count desc, a asc, b asc
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((step, a, b, c))
        vocab = {w: _golden_apply(s, a, b) for w, s in vocab.items()}
    return merges, vocab


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "wide wider widest wide wide wide",
    "low newer wide lowest",
]


@pytest.fixture(scope="module")
def bpe_corpus(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def test_train_bpe_matches_golden(bpe_corpus):
    merges = train_bpe(bpe_corpus, num_merges=10)
    golden, _ = _golden_train(TEXTS, 10)
    assert merges == golden


def test_train_strategies_agree(bpe_corpus):
    d = train_bpe(bpe_corpus, num_merges=10, strategy="driver")
    x = train_bpe(bpe_corpus, num_merges=10, strategy="distributed")
    assert d == x


def test_train_driver_bound_enforced(bpe_corpus):
    with pytest.raises(ValueError, match="max_driver_vocab_bytes"):
        train_bpe(bpe_corpus, num_merges=2, strategy="driver", max_driver_vocab_bytes=1)
    # auto with a tiny bound silently falls back to the distributed loop
    out = train_bpe(bpe_corpus, num_merges=2, strategy="auto", max_driver_vocab_bytes=1)
    assert out == train_bpe(bpe_corpus, num_merges=2, strategy="driver")


def test_train_bpe_stops_when_pairs_exhausted(spark):
    docs = spark.createDataFrame([(0, "ab ab ab")], "doc_id long, text string")
    merges = train_bpe(docs, num_merges=50)
    # one word "ab": single merge (a,b) fully fuses it; then no pairs left
    assert merges == [(1, "a", "b", 3)]


def test_apply_merge_overlap_greedy(spark):
    # "aaa" under (a,a): greedy left-to-right -> [aa, a], never [a, aa]
    docs = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    merges = train_bpe(docs, num_merges=1)
    assert merges[0][1:3] == ("a", "a")
    enc = bpe_encode(docs, merges, with_fingerprint=False)
    row = enc.collect()[0]
    assert row.n_words == 2 and row.n_bpe_tokens == 4
    assert list(row.bpe_tokens) == ["aa", "a", "aa", "a"]


def test_bpe_encode_matches_golden_tokens(bpe_corpus):
    merges = train_bpe(bpe_corpus, num_merges=10)
    golden_merges, golden_vocab = _golden_train(TEXTS, 10)
    assert merges == golden_merges
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(bpe_corpus, merges, with_fingerprint=False).collect()
    }
    for i, t in enumerate(TEXTS):
        expected = [s for w in t.lower().split() for s in golden_vocab[w]]
        assert enc[i] == expected, f"doc {i}"


def test_bpe_encode_empty_doc(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab"), (1, "")], "doc_id long, text string"
    )
    merges = train_bpe(docs, num_merges=2)
    rows = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    assert rows[1].n_words == 0 and rows[1].n_bpe_tokens == 0
    assert rows[1].bpe_fingerprint == 0  # char-fold of ''


# ---------------------------------------------------------------------------
# bigram LM score
# ---------------------------------------------------------------------------


def test_ngram_lm_hand_computed(spark):
    # corpus: "a b a b" and "a b". bigrams: (a,b)x3, (b,a)x1
    # c(a,b)=3, c(b,a)=1; prefixes: c(a,.)=3, c(b,.)=1; V=2
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "x")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in ngram_lm_score(docs).collect()}
    # V counts ALL tokens incl. the bigram-less doc "x": {a, b, x} -> V=3
    p_ab = (3 + 1) / (3 + 3)
    p_ba = (1 + 1) / (1 + 3)
    assert out[0].n_bigrams == 3
    assert out[0].avg_prob == pytest.approx((p_ab + p_ba + p_ab) / 3, abs=0)
    assert out[1].n_bigrams == 1 and out[1].avg_prob == p_ab
    assert out[2].n_bigrams == 0 and out[2].avg_prob == 0.0


def test_ngram_lm_orders_fluency(spark):
    # a doc made of the corpus's dominant bigram scores higher than a doc
    # of one-off bigrams
    rows = [(i, "the cat sat on the mat") for i in range(8)]
    rows.append((100, "zebra quark flux node"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_prob for r in ngram_lm_score(docs).collect()}
    assert out[0] > out[100]


def test_ngram_lm_fold_is_position_ordered(spark):
    # permutation-equal token multisets give the same SUM mathematically,
    # but the contract is positional fold; just pin determinism across runs
    docs = spark.createDataFrame(
        [(0, "a b c a b"), (1, "b a c b a")], "doc_id long, text string"
    )
    r1 = sorted(map(tuple, ngram_lm_score(docs).collect()))
    r2 = sorted(map(tuple, ngram_lm_score(docs).collect()))
    assert r1 == r2


# ---------------------------------------------------------------------------
# duplicate spans
# ---------------------------------------------------------------------------


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_duplicate_spans_exact_geometry(spark):
    # 10-token shared prefix between docs 0 and 1; doc 2 disjoint.
    shared = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10"
    docs = _mkdocs(
        spark,
        [
            shared + " only0 a0 b0 c0",
            shared + " only1 a1 b1 c1",
            "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10 z11 z12",
        ],
    )
    out = duplicate_spans(docs, n=4, min_docs=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # windows 1..7 of the shared prefix are duplicated -> one island
    # spanning tokens 1..10 with 7 windows, in docs 0 and 1 only
    assert set(by_doc) == {0, 1}
    for d in (0, 1):
        (r,) = by_doc[d]
        assert (r.span_start, r.span_end, r.span_tokens, r.n_windows) == (1, 10, 10, 7)


def test_duplicate_spans_islands_split_on_gap(spark):
    # two shared regions separated by > n unique tokens -> two islands
    a = "s1 s2 s3 s4"
    b = "e1 e2 e3 e4"
    docs = _mkdocs(
        spark,
        [
            f"{a} u1 u2 u3 u4 u5 u6 u7 u8 u9 {b}",
            f"{a} v1 v2 v3 v4 v5 v6 v7 v8 v9 {b}",
        ],
    )
    out = duplicate_spans(docs, n=4, min_docs=2)
    rows = sorted(
        ((r.doc_id, r.span_start, r.span_end) for r in out.collect())
    )
    assert rows == [(0, 1, 4), (0, 14, 17), (1, 1, 4), (1, 14, 17)]


def test_duplicate_spans_none_when_unique(spark):
    docs = _mkdocs(spark, ["a b c d e f", "g h i j k l"])
    assert duplicate_spans(docs, n=3, min_docs=2).count() == 0


def test_bpe_seeded_random_corpus_sweep(spark):
    """Seeded randomized parity sweep (the DTW shape-sweep pattern): random
    tiny corpora with skewed token distributions through BOTH training
    strategies and the encoder, against the pure-Python golden. Covers
    repeated chars (overlap greedy), single-char words, high-frequency
    ties, and empty docs."""
    import random

    for seed in range(8):
        rng = random.Random(seed * 7919)
        alphabet = "abcde"
        words = [
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 10))
        ]
        texts = []
        for _ in range(rng.randint(2, 6)):
            k = rng.randint(0, 12)
            texts.append(" ".join(rng.choice(words) for _ in range(k)))
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        n_merges = rng.randint(1, 6)
        golden_merges, golden_vocab = _golden_train(texts, n_merges)
        got_driver = train_bpe(docs, num_merges=n_merges, strategy="driver")
        got_dist = train_bpe(docs, num_merges=n_merges, strategy="distributed")
        assert got_driver == golden_merges, f"seed {seed} (driver)"
        assert got_dist == golden_merges, f"seed {seed} (distributed)"
        enc = {
            r.doc_id: list(r.bpe_tokens)
            for r in bpe_encode(docs, golden_merges, with_fingerprint=False).collect()
        }
        for i, t in enumerate(texts):
            expected = [s for w in t.lower().split() for s in golden_vocab.get(w, list(w))]
            assert enc[i] == expected, f"seed {seed} doc {i}"


def test_bpe_encode_kernel_matches_expr(bpe_corpus):
    """The Arrow-kernel encoder is bit-identical to the fold-expression
    chain — the scale path (constant plan size for 30k-merge tables) must
    not change a single token."""
    merges = train_bpe(bpe_corpus, num_merges=10)
    e = sorted(map(tuple, bpe_encode(bpe_corpus, merges, mode="expr").collect()))
    k = sorted(map(tuple, bpe_encode(bpe_corpus, merges, mode="kernel").collect()))
    assert e == k


def test_bpe_encode_kernel_handles_many_merges(spark):
    """A merge table far past any sane expression-chain depth runs through
    the kernel (mode='auto' switches over) and matches the golden."""
    import random

    rng = random.Random(5)
    alphabet = "abcdefgh"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 10)))
        for _ in range(60)
    ]
    texts = [" ".join(rng.choice(words) for _ in range(30)) for _ in range(10)]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    golden_merges, golden_vocab = _golden_train(texts, 120)
    assert len(golden_merges) > 24  # deep enough to force the kernel
    enc = {
        r.doc_id: list(r.bpe_tokens)
        for r in bpe_encode(docs, golden_merges, with_fingerprint=False).collect()
    }
    for i, t in enumerate(texts):
        expected = [s for w in t.lower().split() for s in golden_vocab[w]]
        assert enc[i] == expected, f"doc {i}"


def test_bpe_kernel_illformed_table_keeps_list_order_semantics(spark):
    """An ill-formed merge list (rank 0 consumes rank 1's OUTPUT) must
    take the sequential path: list-order semantics say rank 0 no-ops on
    raw text; rank-priority would wrongly fuse the full word."""
    docs = spark.createDataFrame([(0, "abc abc")], "doc_id long, text string")
    merges = [("ab", "c"), ("a", "b")]
    out = bpe_encode(docs, merges, mode="kernel", with_fingerprint=False).collect()[0]
    assert list(out.bpe_tokens) == ["ab", "c", "ab", "c"]
    expr = bpe_encode(docs, merges, mode="expr", with_fingerprint=False).collect()[0]
    assert list(out.bpe_tokens) == list(expr.bpe_tokens)


def test_bpe_ids_contract(spark):
    """emit='ids': chars keep codepoints, merged tokens get 0x110000+rank,
    duplicate merge outputs take the earliest rank."""
    docs = spark.createDataFrame([(0, "ab ab c")], "doc_id long, text string")
    merges = [("a", "b")]
    row = bpe_encode(docs, merges, emit="ids").collect()[0]
    assert list(row.bpe_ids) == [0x110000, 0x110000, ord("c")]
    assert row.n_bpe_tokens == 3
    # checksum = position-ordered fold
    h = 0
    for i in [0x110000, 0x110000, ord("c")]:
        h = (h * 31 + i) % 1_000_000_007
    assert row.ids_checksum == h
    with pytest.raises(ValueError, match="emit"):
        bpe_encode(docs, merges, emit="bogus")

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow


def test_bpe_distributed_batched_deep_merge_agreement(spark):
    """r9 (VERDICT r8 #6): the distributed loop now applies BATCHES of
    provably-commuting merges per vocabulary scan. A 20-merge run on a
    chain-heavy corpus (merged tokens keep re-merging, so batches stay
    short and the stop-bound logic fires often) must stay merge-for-merge
    identical to the driver loop."""
    import random

    rng = random.Random(20240816)
    words = ["abcdef", "abcde", "abcd", "abc", "ab",
             "fedcba", "fedcb", "fedc", "xyz", "xyzz"]
    texts = [
        " ".join(rng.choice(words) for _ in range(rng.randint(4, 12)))
        for _ in range(8)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    want = train_bpe(docs, num_merges=20, strategy="driver")
    got = train_bpe(docs, num_merges=20, strategy="distributed")
    assert want and got == want
