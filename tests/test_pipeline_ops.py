"""Dedup / similarity / text / multimodal operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import (
    char_hash,
    lang_id,
    quality_score,
    token_count,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    ann_brute_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_pairwise_jaccard,
    decode_image_features,
    sample_frames,
    simhash,
    simhash_near_dups,
    synthetic_media,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away"
    rows = [
        (0, base, "en"),
        (1, base, "en"),  # exact dup of 0
        (2, base.replace("lazy", "sleepy"), "en"),  # near dup of 0
        (3, "completely different content about database engines and queries", "en"),
        (4, "el rapido zorro marron salta sobre el perro perezoso de la casa", "es"),
        (5, "der schnelle braune fuchs springt uber den faulen hund und das ist gut", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dedup_exact_groups(docs):
    got = {r.doc_id: r.n_dups for r in dedup_exact(docs).collect()}
    assert got[0] == 2  # doc 1 collapsed into 0 (min id kept)
    assert 1 not in got
    assert got[2] == 1


def test_pairwise_jaccard_finds_near_dup(docs):
    pairs = dedup_pairwise_jaccard(docs, threshold=0.5).collect()
    keys = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in keys  # exact dup -> jaccard 1.0
    assert (0, 2) in keys and (1, 2) in keys  # near dup
    assert all(r.jac >= 0.5 for r in pairs)
    exact = {r.id_a: r.jac for r in pairs if (r.id_a, r.id_b) == (0, 1)}
    assert exact[0] == 1.0


def test_minhash_lsh_matches_exhaustive(docs):
    lsh = {(r.id_a, r.id_b) for r in dedup_minhash_lsh(docs, threshold=0.5).collect()}
    ex = {(r.id_a, r.id_b) for r in dedup_pairwise_jaccard(docs, threshold=0.5).collect()}
    # LSH may miss pairs (probabilistic) but must never invent them; on
    # near-identical docs it should find everything
    assert lsh <= ex
    assert (0, 1) in lsh


def test_simhash_identical_and_near(docs):
    sh = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    assert sh[0] == sh[1]  # identical text -> identical simhash
    h02 = bin(sh[0] ^ sh[2]).count("1")
    h03 = bin(sh[0] ^ sh[3]).count("1")
    assert h02 < h03  # near-dup closer than unrelated
    nd = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dups(docs, max_hamming=0).collect()}
    assert nd == {(0, 1): 0}


def test_ann_brute_topk_ranks(spark):
    rng = np.random.default_rng(5)
    vecs = [(i, [float(x) for x in rng.normal(size=8)], 0) for i in range(30)]
    # plant: vec 29 = vec 0 scaled (cosine distance ~0)
    vecs[29] = (29, [2.0 * x for x in vecs[0][1]], 0)
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label int")
    q = df.filter("vec_id = 0")
    top = sorted(ann_brute_topk(q, df, k=3).collect(), key=lambda r: r.rank)
    assert top[0].neighbor_id == 29 and top[0].cos_dist == pytest.approx(0.0, abs=1e-9)
    assert [r.rank for r in top] == [1, 2, 3]
    # numpy cross-check of full ranking
    a = np.array(vecs[0][1])
    sims = {
        i: 1 - (a @ np.array(v)) / (np.linalg.norm(a) * np.linalg.norm(v))
        for i, v, _ in vecs
        if i != 0
    }
    expect = sorted(sims, key=lambda i: (sims[i], i))[:3]
    assert [r.neighbor_id for r in top] == expect


def test_ann_lsh_subset_of_brute_candidates(spark):
    rng = np.random.default_rng(9)
    vecs = [(i, [float(x) for x in rng.normal(size=16)], 0) for i in range(60)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label int")
    q = df.filter("vec_id < 5")
    brute = ann_brute_topk(q, df, k=3)
    lsh = ann_lsh_topk(q, df, k=3, dim=16)
    got = lsh.collect()
    assert all(r.rank <= 3 for r in got)
    # recall is probabilistic; require nonzero overlap on random data
    bk = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    lk = {(r.query_id, r.neighbor_id) for r in got}
    assert len(bk & lk) > 0


def test_portable_hashes_match_per_shingle_fold(spark, docs):
    """The codes-array fast path must produce exactly the hash SET of the
    spec the DuckDB oracle implements: fold h=(h*31+ascii)%P over each
    distinct shingle string."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import shingle_sets
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import HASH_BASE, HASH_P

    sh = shingle_sets(docs, n=5)
    spec = F.transform(
        F.col("shingles"),
        lambda s: F.aggregate(
            F.split(s, ""),
            F.lit(0).cast("long"),
            lambda h, c: (h * HASH_BASE + F.ascii(c)) % HASH_P,
        ),
    )
    rows = sh.select("doc_id", "hashes", F.array_distinct(spec).alias("ref")).collect()
    assert rows
    for r in rows:
        assert r.hashes == r.ref, r.doc_id


def test_simhash_kernel_matches_expr(spark, docs):
    expr = sorted(map(tuple, simhash(docs).collect()))
    kern = sorted(map(tuple, simhash(docs, mode="kernel").collect()))
    assert expr == kern and expr
    # empty/whitespace-only docs must vanish in both paths
    empt = docs.sparkSession.createDataFrame(
        [(10, "   ", "en"), (11, "real words here", "en")],
        "doc_id long, text string, lang string",
    )
    assert sorted(map(tuple, simhash(empt).collect())) == sorted(
        map(tuple, simhash(empt, mode="kernel").collect())
    )


def test_kernel_matches_expression_lsh(spark, docs):
    """hash_mode='kernel' must reproduce the portable expression path
    EXACTLY (pairs and jaccard values) — it is the same integer spec."""
    expr = sorted(map(tuple, dedup_minhash_lsh(docs, threshold=0.3).collect()))
    kern = sorted(map(tuple, dedup_minhash_lsh(docs, threshold=0.3, hash_mode="kernel").collect()))
    assert expr == kern
    assert expr  # non-vacuous: the near-dup fixture pair must surface


def test_dedup_components_keep_decisions(spark, docs):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dedup_components

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {r.doc_id: (r.component, r.keep) for r in dedup_components(docs, pairs).collect()}
    # every doc labeled; chain 0-1-2 collapses to component 0; isolated doc 3
    assert out[0] == (0, True) and out[1] == (0, False) and out[2] == (0, False)
    assert out[3] == (3, True)
    assert out[4] == (4, True) and out[5] == (4, False)
    # distributed Pregel path (local_threshold=0 forces it) must agree with
    # the driver union-find path exactly
    dist = {
        r.doc_id: (r.component, r.keep)
        for r in dedup_components(docs, pairs, local_threshold=0).collect()
    }
    assert dist == out
    # reliable-checkpoint cadence (belt-and-braces path for deep graphs on a
    # real cluster): same answers with a checkpoint dir set and every round
    # checkpointing reliably
    import tempfile

    sc = spark.sparkContext
    with tempfile.TemporaryDirectory() as d:
        sc.setCheckpointDir(d)
        try:
            ckpt = {
                r.doc_id: (r.component, r.keep)
                for r in dedup_components(
                    docs, pairs, local_threshold=0, checkpoint_interval=1
                ).collect()
            }
        finally:
            getattr(sc._jsc.sc(), "checkpointDir_$eq")(sc._jvm.scala.Option.empty())
    assert ckpt == out


def test_ann_kernel_matches_declarative(spark):
    rng = np.random.default_rng(21)
    vecs = [(i, [float(x) for x in rng.normal(size=16)], 0) for i in range(80)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label int")
    q = df.filter("vec_id % 10 = 0")
    decl = sorted(map(tuple, ann_brute_topk(q, df, k=4).collect()))
    kern = sorted(map(tuple, ann_brute_topk(q, df, k=4, strategy="kernel").collect()))
    assert decl == kern and decl


def test_ann_ivf_recall_and_plan(spark):
    rng = np.random.default_rng(13)
    # clustered data: 6 centers x 15 members — the regime IVF is built for
    centers = rng.normal(size=(6, 16)) * 4.0
    vecs = [
        (c * 15 + i, [float(x) for x in centers[c] + rng.normal(size=16) * 0.3], 0)
        for c in range(6)
        for i in range(15)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label int")
    q = df.filter("vec_id % 20 = 0")
    brute = ann_brute_topk(q, df, k=3)
    ivf = ann_ivf_topk(q, df, k=3, n_lists=8, n_probe=3)
    bk = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    ik = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    # neighbors within a cluster share the probed lists -> high recall here
    assert len(bk & ik) / len(bk) >= 0.8
    assert ik == {(r.query_id, r.neighbor_id) for r in ivf.collect()}  # deterministic
    # plan: centroid assignment + probes broadcast; no full cross join of
    # corpus x corpus survives (BroadcastNestedLoopJoin only against the
    # n_lists centroid side)
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_text_functions(docs):
    rows = docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n"),
        F.round(quality_score(F.col("text")), 4).alias("q"),
        lang_id(F.col("text")).alias("lp"),
        char_hash(F.col("text")).alias("fp"),
    ).collect()
    by = {r.doc_id: r for r in rows}
    assert by[0].n == 13
    assert by[0].fp == by[1].fp  # identical text -> identical fingerprint
    assert by[0].fp != by[2].fp
    assert by[0].lp == "en"
    assert by[4].lp == "es"
    assert by[5].lp == "de"
    assert 0.0 <= by[3].q <= 1.0


def test_lang_id_cjk(spark):
    df = spark.createDataFrame([(1, "这是 中文 文本",)], "id int, text string")
    assert df.select(lang_id(F.col("text"))).collect()[0][0] == "zh"


def test_multimodal_decode_and_frames(spark):
    media = synthetic_media(spark, n=12)
    feats = decode_image_features(media).collect()
    assert len(feats) == 12
    assert all(len(r.feature) == 8 for r in feats)
    assert all(0.0 <= r.mean_luma <= 1.0 for r in feats)
    # determinism: same payload -> same features across runs
    feats2 = decode_image_features(synthetic_media(spark, n=12)).collect()
    assert {r.media_id: tuple(r.feature) for r in feats} == {
        r.media_id: tuple(r.feature) for r in feats2
    }
    frames = sample_frames(media, every_n=7).collect()
    assert all(r.frame_index % 7 == 0 for r in frames)
    # only media with n_frames > 0 produce rows
    vids = {r[0] for r in media.select("media_id").filter("meta.n_frames > 0").collect()}
    assert {r.media_id for r in frames} == vids


def test_multimodal_real_decode_boundaries(spark):
    media = synthetic_media(spark, n=3)
    # fake=False now resolves to the builtin PNG codec when PIL is absent:
    # random-byte payloads are neither PNG nor JPEG and fail with a clear
    # sniffing error
    # (PIL-present containers fail similarly inside PIL)
    with pytest.raises(Exception, match="unrecognized image payload|cannot identify"):
        decode_image_features(media, fake=False).collect()
    # decoder='pil' demands PIL explicitly
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.multimodal import _try_pil

    if _try_pil() is None:
        with pytest.raises(NotImplementedError, match="imaging library"):
            decode_image_features(media, decoder="pil").collect()
    with pytest.raises(ValueError, match="decoder"):
        decode_image_features(media, decoder="bogus").collect()


def test_builtin_png_decode_real_pixels(spark):
    """The pure-stdlib PNG backend decodes REAL pixels: dims come from the
    IHDR, features/resize from the actual gradient — verified against the
    generative formula with no imaging library installed."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        resize_image,
        synthetic_png_media,
    )

    media = synthetic_png_media(spark, n=6)
    feats = {r.media_id: r for r in decode_image_features(media, decoder="builtin").collect()}
    res = {r.media_id: r for r in resize_image(media, decoder="builtin", out_w=3, out_h=3).collect()}
    for i in range(6):
        w, h = 8 + i % 5, 6 + i % 4
        grid = (np.add.outer(np.arange(h) * 7, np.arange(w) * 13) + 31 * i) % 256
        assert (feats[i].width, feats[i].height) == (w, h)
        assert feats[i].mean_luma == pytest.approx(grid.mean() / 255.0)
        expect = [
            float(grid[(oi * h) // 3, (oj * w) // 3])
            for oi in range(3)
            for oj in range(3)
        ]
        assert list(res[i].pixels) == expect


def test_png_codec_roundtrip_and_filters():
    """Stdlib codec: encode->decode roundtrip, every scanline filter type
    inverts, RGB collapses to integer luma."""
    import struct
    import zlib

    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.png import (
        _MAGIC,
        _chunk,
        decode_png_gray,
        encode_png_gray,
    )

    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    assert (decode_png_gray(encode_png_gray(a)) == a).all()

    def paeth(x, b, c):
        p = x + b - c
        pa, pb, pc = abs(p - x), abs(p - b), abs(p - c)
        return x if pa <= pb and pa <= pc else (b if pb <= pc else c)

    def filt(img, ftype):
        h, w = img.shape
        out = b""
        prev = np.zeros(w, dtype=int)
        for i in range(h):
            line = img[i].astype(int)
            f = bytearray([ftype])
            for j in range(w):
                left = line[j - 1] if j >= 1 else 0
                ul = int(prev[j - 1]) if j >= 1 else 0
                if ftype == 0:
                    v = line[j]
                elif ftype == 1:
                    v = line[j] - left
                elif ftype == 2:
                    v = line[j] - prev[j]
                elif ftype == 3:
                    v = line[j] - ((left + int(prev[j])) >> 1)
                else:
                    v = line[j] - paeth(left, int(prev[j]), ul)
                f.append(v & 0xFF)
            out += bytes(f)
            prev = line
        return out

    h, w = a.shape
    for ftype in range(5):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
        png = (
            _MAGIC
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(filt(a, ftype)))
            + _chunk(b"IEND", b"")
        )
        assert (decode_png_gray(png) == a).all(), f"filter {ftype}"

    rgb = rng.integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgb[i].tobytes() for i in range(5))
    ihdr = struct.pack(">IIBBBBB", 6, 5, 8, 2, 0, 0, 0)
    png = (
        _MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    expect = (
        rgb[:, :, 0].astype(int) * 299
        + rgb[:, :, 1].astype(int) * 587
        + rgb[:, :, 2].astype(int) * 114
    ) // 1000
    assert (decode_png_gray(png) == expect.astype(np.uint8)).all()


def test_profile_table_values(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import profile_table

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (2, "b", None)],
        "k long, s string, v double",
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["k"]["n_rows"] == 3 and out["k"]["n_nulls"] == 0
    assert out["k"]["n_distinct"] == 2
    assert (out["k"]["min_num"], out["k"]["max_num"]) == (1.0, 2.0)
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2
    # string column: no numeric min/max
    assert out["s"]["min_num"] is None and out["s"]["max_num"] is None
    assert out["v"]["null_frac"] == pytest.approx(1 / 3)


def test_profile_table_single_scan(spark):
    # the whole profile is ONE aggregate over ONE scan: no join/union nodes
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import profile_table

    df = spark.range(100).selectExpr("id", "cast(id % 7 as string) AS s")
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Union" not in plan
    assert plan.count("Scan") <= 1


def test_profile_table_approx_mode(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import profile_table

    df = spark.range(1000).selectExpr("id", "id % 10 AS m")
    out = {r["col_name"]: r for r in profile_table(df, distinct_mode="approx").collect()}
    # HLL estimate within 10% on a small exact cardinality
    assert abs(out["m"]["n_distinct"] - 10) <= 1
    # approx mode must not plan an Expand (the multi-distinct blowup)
    plan = profile_table(df, distinct_mode="approx")._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan


def test_profile_table_rejects_bad_args(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import profile_table

    df = spark.range(3)
    with pytest.raises(ValueError, match="not in DataFrame"):
        profile_table(df, columns=["nope"])
    with pytest.raises(ValueError, match="distinct_mode"):
        profile_table(df, distinct_mode="bogus")


def test_dedup_incremental(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "known text"), (2, "other text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [
            (10, "known text"),    # already in corpus -> rejected
            (11, "fresh one"),     # new -> admitted
            (12, "fresh one"),     # batch-dup of 11 -> rejected (min id wins)
            (13, "another new"),   # new -> admitted
        ],
        "doc_id long, text string",
    )
    got = sorted(r["doc_id"] for r in dedup_incremental(batch, corpus).collect())
    assert got == [11, 13]


def test_normalize_text_canonical_form(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.text import normalize_text

    df = spark.createDataFrame(
        [("  Hello,   WORLD!! 42 ", ), ("«fancy» – punct", ), ("", )],
        "text string",
    )
    got = [r["n"] for r in df.select(normalize_text(F.col("text")).alias("n")).collect()]
    assert got == ["hello world 42", "fancy punct", ""]


def test_dedup_embedding_lsh_subset_of_brute(spark):
    """LSH near-dup pairs are a subset of the brute-force pairs with
    identical distances (candidates differ, verification doesn't), and
    recall at this threshold/testdata is substantial."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dedup_embedding

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    brute = {
        (r.id_a, r.id_b): r.cos_dist
        for r in dedup_embedding(emb, threshold=0.65, strategy="brute").collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cos_dist
        for r in dedup_embedding(emb, threshold=0.65, strategy="lsh").collect()
    }
    assert set(lsh) <= set(brute)
    assert all(brute[k] == v for k, v in lsh.items())
    assert len(brute) > 0
    assert len(lsh) / len(brute) > 0.3  # multi-table recall floor on this data


def test_dedup_embedding_feeds_components(spark):
    """The pair output drops straight into dedup_components for survivor
    resolution — the full semantic-dedup chain."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        dedup_components,
        dedup_embedding,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = dedup_embedding(emb, threshold=0.65, strategy="lsh")
    resolved = dedup_components(
        emb.select(F.col("vec_id").alias("doc_id")), pairs
    )
    rows = resolved.collect()
    assert len(rows) == emb.count()
    kept = sum(1 for r in rows if r.keep)
    assert 0 < kept <= len(rows)


def test_dedup_embedding_rejects_bad_strategy(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dedup_embedding

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strategy"):
        dedup_embedding(emb, strategy="nope")


def test_dedup_embedding_bucket_cap(spark):
    """A synthetic hot cluster (many copies of one vector) must not explode
    the candidate set when max_bucket_size caps it: pairs within the capped
    bucket only involve the lowest-id members, and the uncapped run is a
    superset."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dedup_embedding

    base = [0.5] * 8
    rows = [(i, base) for i in range(40)] + [(100 + i, [float(i + 1)] * 8) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    capped = dedup_embedding(df, threshold=0.1, dim=8, max_bucket_size=10, strategy="lsh")
    uncapped = dedup_embedding(df, threshold=0.1, dim=8, strategy="lsh")
    cp = {(r.id_a, r.id_b) for r in capped.collect()}
    up = {(r.id_a, r.id_b) for r in uncapped.collect()}
    assert cp <= up
    # uncapped sees the full 40-clone clique; the cap keeps the low-id
    # quadratic core PLUS one linear star edge per truncated member (r3:
    # hub -> member, so the capped mega-cluster stays ONE component)
    assert len(up) >= 40 * 39 / 2
    assert len(cp) <= 10 * 9 / 2 + (40 - 10) + 25
    clone_pairs = {(a, b) for a, b in cp if a < 100 and b < 100}
    core = {(a, b) for a, b in clone_pairs if a < 10 and b < 10}
    star = clone_pairs - core
    # star edges all emanate from the bucket hub (lowest id) to truncated
    # members — never member-to-member (that would be quadratic again)
    assert all(a == 0 and b >= 10 for a, b in star)
    # every truncated clone stays connected to the cluster
    assert {b for _, b in star} == set(range(10, 40))


def test_resize_image_nearest_neighbor_math(spark):
    """The resize index map is the real nearest-neighbor formula: verify a
    row against a hand-computed sample from the sha256 pixel model, and the
    fake=False decode boundary raises."""
    import hashlib

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import resize_image, synthetic_media

    media = synthetic_media(spark, n=6).filter("meta.media_type = 'image'")
    got = {r.media_id: r for r in resize_image(media, out_w=4, out_h=4).collect()}
    src = {r.media_id: (bytes(r.payload), r.meta) for r in media.collect()}
    for mid, (payload, meta) in src.items():
        digest = hashlib.sha256(payload).digest()
        w, h = meta["width"], meta["height"]
        expect = [
            float(digest[(((oi * h) // 4) * w + ((oj * w) // 4)) % 32])
            for oi in range(4)
            for oj in range(4)
        ]
        assert list(got[mid].pixels) == expect
        assert got[mid].px_checksum == int(sum(expect))

    import pytest as _pytest

    # fake=False resolves to a REAL decoder (builtin PNG without PIL);
    # these payloads are not PNGs, so the decode itself rejects them
    with _pytest.raises(Exception, match="unrecognized image payload|cannot identify"):
        resize_image(media, fake=False).collect()


def test_ann_lsh_multi_probe_lifts_recall(spark):
    """Multi-probe LSH (flip lowest-|margin| bits) on WEAKLY clustered data:
    the regime where single-probe hyperplane LSH starves (cluster spread ~
    cluster separation) but neighbors still sit one hyperplane over. All
    deterministic (fixed hash-derived planes + fixed rng), so the recall
    numbers are exact, not flaky."""
    rng = np.random.default_rng(21)
    centers = rng.normal(size=(6, 16)) * 1.5
    vecs = [
        (c * 15 + i, [float(x) for x in centers[c] + rng.normal(size=16) * 1.0], 0)
        for c in range(6)
        for i in range(15)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label int")
    q = df.filter("vec_id % 20 = 0")
    brute = {(r.query_id, r.neighbor_id) for r in ann_brute_topk(q, df, k=3).collect()}

    def recall(probes):
        got = ann_lsh_topk(
            q, df, k=3, dim=16, planes=8, tables=2, probes=probes
        ).collect()
        hits = {(r.query_id, r.neighbor_id) for r in got}
        return len(brute & hits) / len(brute)

    single, multi = recall(0), recall(5)
    assert single < 0.3, f"fixture lost its teeth: single-probe recall {single}"
    assert multi >= 0.5, f"multi-probe recall {multi}"
    # probed candidates are a superset of single-probe candidates, so
    # multi-probe recall can never be worse
    assert multi >= single


def test_real_pil_decode_same_mapinpandas_path(spark):
    """When an imaging library IS installed, fake=False decodes real pixels
    through the SAME mapInPandas plumbing the stub uses (schema, batching,
    null handling). Skips in containers without PIL — the stub path and the
    NotImplementedError boundary stay covered either way."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _try_pil,
        decode_image_features,
        resize_image,
    )

    Image = _try_pil()
    if Image is None:
        pytest.skip("PIL not installed in this container")
    import io

    def png(w, h, base):
        img = Image.new("L", (w, h))
        img.putdata([(base + x + y * w) % 256 for y in range(h) for x in range(w)])
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue(), img

    rows, imgs = [], {}
    for i, (w, h) in enumerate([(8, 6), (5, 7)]):
        payload, img = png(w, h, base=i * 11)
        rows.append((i, bytearray(payload), ("image", w, h, 0)))
        imgs[i] = img
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r.media_id: r for r in decode_image_features(media, fake=False).collect()}
    for i, img in imgs.items():
        r = feats[i]
        assert (r.width, r.height) == img.size
        expect_luma = float(np.asarray(img, dtype=np.float64).mean() / 255.0)
        assert abs(r.mean_luma - expect_luma) < 1e-9
        assert len(r.feature) == 8

    res = {r.media_id: r for r in resize_image(media, fake=False, out_w=4, out_h=4).collect()}
    for i, img in imgs.items():
        expect = np.asarray(img.resize((4, 4), Image.NEAREST), dtype=np.float64)
        got = np.array(res[i].pixels).reshape(4, 4)
        assert np.array_equal(got, expect)
        assert res[i].px_checksum == int(expect.sum())


def test_wav_codec_and_audio_features(spark):
    """Stdlib WAV codec roundtrip (mono + stereo channel-0) and the
    decode_audio_features integer statistics on real PCM16 payloads."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.wav import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_audio_features,
        synthetic_wav_media,
    )

    rng = np.random.default_rng(2)
    s = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    dec, rate = decode_wav_pcm16(encode_wav_pcm16(s, 44100))
    assert (dec == s).all() and rate == 44100
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav_pcm16(b"JUNKJUNKJUNK")

    media = synthetic_wav_media(spark, n=4, n_samples=128)
    got = {r.media_id: r for r in decode_audio_features(media).collect()}
    for i in range(4):
        t = np.arange(128, dtype=np.int64)
        v = ((t * t * 7 + t * 13 + 31 * i) % 4096) - 2048
        r = got[i]
        assert r.sample_rate == 8000 + 100 * i
        assert r.n_samples == 128
        assert r.peak == int(np.abs(v).max())
        assert r.sum_sq == int((v * v).sum())
        pos = v >= 0
        assert r.zero_crossings == int((pos[1:] != pos[:-1]).sum())

    with pytest.raises(ValueError, match="decoder"):
        decode_audio_features(media, decoder="nope").collect()


def test_gif_codec_roundtrip_and_lzw():
    """Pure-stdlib GIF codec: exact multi-frame roundtrip (identity
    grayscale palette -> luma == index), multi-sub-block payloads, and a
    general-LZW decode of a stream with dictionary growth (the encoder's
    clear-every-200 keeps width at 9 bits; the decoder must also survive
    streams where codes reference just-created entries)."""
    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.gif import (
        _lzw_decode,
        _lzw_encode_literals,
        decode_gif_gray,
        encode_gif_gray,
    )

    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(11, 17), dtype=np.uint8) for _ in range(4)]
    back = decode_gif_gray(encode_gif_gray(frames))
    assert len(back) == 4
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))
    # big frame: >255-byte LZW payload forces multiple sub-blocks
    big = [rng.integers(0, 256, size=(40, 50), dtype=np.uint8)]
    assert np.array_equal(decode_gif_gray(encode_gif_gray(big))[0], big[0])
    # literal-stream invariant: decode(encode(x)) == x at the LZW layer too
    seq = rng.integers(0, 256, size=1000).astype(np.int64)
    assert _lzw_decode(8, _lzw_encode_literals(8, seq)) == list(seq)
    # KwKwK case (code == next_code): hand-built stream over a 2-symbol
    # alphabet — min_code_size 2: clear=4, end=5; codes 0,6 where 6 is the
    # entry being defined by that very code -> [0, 0, 0]
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.gif import _BitWriter

    w = _BitWriter()
    for code in (4, 0, 6, 5):
        w.write(code, 3)
    assert _lzw_decode(2, w.flush()) == [0, 0, 0]
    # non-GIF payload rejected
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_gif_gray(b"NOTAGIF0")


def test_decode_video_frames_contract(spark):
    """decode_video_frames: stride sampling matches sample_frames' range
    semantics, stats are integer-exact, stub mode stays byte-stable, and
    unknown decoders / bad strides fail fast."""
    import pytest as _pytest

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        decode_video_frames,
        synthetic_gif_media,
    )

    media = synthetic_gif_media(spark, n=3, w=4, h=3, n_frames=6)
    out = decode_video_frames(media, decoder="builtin", every=2).collect()
    # 3 media x frames {0, 2, 4}
    assert len(out) == 9
    by_key = {(r.media_id, r.frame_index): r for r in out}
    assert set(fi for _, fi in by_key) == {0, 2, 4}
    # checksum matches the closed-form formula
    exp = sum((x * 7 + y * 13 + 2 * 29 + 1 * 31) % 256 for x in range(4) for y in range(3))
    assert by_key[(1, 2)].px_checksum == exp
    assert by_key[(1, 2)].width == 4 and by_key[(1, 2)].height == 3
    stub = decode_video_frames(media, decoder="stub").collect()
    assert len(stub) == 12  # 4 sha256 pseudo-frames per payload
    with _pytest.raises(ValueError):
        decode_video_frames(media, decoder="mp4")
    with _pytest.raises(ValueError):
        decode_video_frames(media, every=0)


def test_png_codec_depths_palette_interlace():
    """Stdlib codec, extended IHDR coverage: sub-byte and 16-bit depths,
    palette color, and Adam7 interlace — every PNG built by an INDEPENDENT
    in-test packer (filter 0), so packer and decoder can't share a bug."""
    import struct
    import zlib

    import numpy as np

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.png import (
        _MAGIC,
        _chunk,
        decode_png_gray,
    )

    def mk(w, h, depth, ctype, raw, extra=b"", interlace=0):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        return (
            _MAGIC
            + _chunk(b"IHDR", ihdr)
            + extra
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )

    def pack_row(vals, depth):
        """MSB-first sub-byte packing of one row of samples."""
        bits = []
        for v in vals:
            bits.extend((int(v) >> (depth - 1 - b)) & 1 for b in range(depth))
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
        )

    rng = np.random.default_rng(7)

    # gray depths 1/2/4: exact scale to 8-bit via 255 // (2^d - 1)
    for depth in (1, 2, 4):
        img = rng.integers(0, 1 << depth, size=(9, 11))
        raw = b"".join(b"\x00" + pack_row(img[i], depth) for i in range(9))
        out = decode_png_gray(mk(11, 9, depth, 0, raw))
        assert (out == (img * (255 // ((1 << depth) - 1))).astype(np.uint8)).all()

    # gray 16-bit: high byte kept
    g16 = rng.integers(0, 1 << 16, size=(6, 5))
    raw = b"".join(
        b"\x00" + b"".join(struct.pack(">H", v) for v in g16[i]) for i in range(6)
    )
    assert (decode_png_gray(mk(5, 6, 16, 0, raw)) == (g16 >> 8).astype(np.uint8)).all()

    # RGB 16-bit: high bytes through integer luma
    rgb16 = rng.integers(0, 1 << 16, size=(4, 3, 3))
    raw = b"".join(
        b"\x00" + b"".join(struct.pack(">H", v) for v in rgb16[i].ravel())
        for i in range(4)
    )
    hi = rgb16 >> 8
    expect = (hi[:, :, 0] * 299 + hi[:, :, 1] * 587 + hi[:, :, 2] * 114) // 1000
    assert (decode_png_gray(mk(3, 4, 16, 2, raw)) == expect.astype(np.uint8)).all()

    # palette 8-bit and 4-bit
    plte = rng.integers(0, 256, size=(16, 3))
    plte_chunk = _chunk(b"PLTE", bytes(plte.astype(np.uint8).ravel()))
    luma = (plte[:, 0] * 299 + plte[:, 1] * 587 + plte[:, 2] * 114) // 1000
    idx = rng.integers(0, 16, size=(7, 10))
    raw8 = b"".join(b"\x00" + bytes(idx[i].astype(np.uint8)) for i in range(7))
    assert (
        decode_png_gray(mk(10, 7, 8, 3, raw8, extra=plte_chunk))
        == luma[idx].astype(np.uint8)
    ).all()
    raw4 = b"".join(b"\x00" + pack_row(idx[i], 4) for i in range(7))
    assert (
        decode_png_gray(mk(10, 7, 4, 3, raw4, extra=plte_chunk))
        == luma[idx].astype(np.uint8)
    ).all()

    # gray+alpha 8-bit: alpha dropped
    ga = rng.integers(0, 256, size=(5, 4, 2))
    raw = b"".join(b"\x00" + bytes(ga[i].astype(np.uint8).ravel()) for i in range(5))
    assert (decode_png_gray(mk(4, 5, 8, 4, raw)) == ga[:, :, 0].astype(np.uint8)).all()

    # Adam7 interlace: independent pass extraction in the test
    ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    # the table must reproduce the 8x8 pass-number matrix printed in the
    # PNG spec (W3C PNG §Interlaced data order) — transcribed by hand here
    # so codec and test can't share a wrong grid
    spec_grid = [
        [1, 6, 4, 6, 2, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [3, 6, 4, 6, 3, 6, 4, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
        [5, 6, 5, 6, 5, 6, 5, 6],
        [7, 7, 7, 7, 7, 7, 7, 7],
    ]
    grid = np.zeros((8, 8), dtype=int)
    for p, (x0, y0, dx, dy) in enumerate(ADAM7, start=1):
        grid[y0::dy, x0::dx] = p
    assert grid.tolist() == spec_grid

    def interlaced_raw(img, depth, pack):
        out = b""
        for x0, y0, dx, dy in ADAM7:
            sub = img[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for r in range(sub.shape[0]):
                out += b"\x00" + pack(sub[r], depth)
        return out

    # gray 8-bit interlaced, odd geometry exercising every pass
    img = rng.integers(0, 256, size=(13, 17))
    raw = interlaced_raw(img, 8, lambda row, d: bytes(row.astype(np.uint8)))
    assert (decode_png_gray(mk(17, 13, 8, 0, raw, interlace=1))
            == img.astype(np.uint8)).all()

    # palette 4-bit interlaced (sub-byte + PLTE + Adam7 together)
    raw = interlaced_raw(idx, 4, pack_row)
    assert (
        decode_png_gray(mk(10, 7, 4, 3, raw, extra=plte_chunk, interlace=1))
        == luma[idx].astype(np.uint8)
    ).all()

    # tiny images where most Adam7 passes are EMPTY (must consume 0 bytes)
    for hh, ww in [(1, 1), (1, 3), (2, 2), (3, 1), (4, 4), (5, 9), (8, 1)]:
        img = rng.integers(0, 256, size=(hh, ww))
        raw = interlaced_raw(img, 8, lambda row, d: bytes(row.astype(np.uint8)))
        assert (decode_png_gray(mk(ww, hh, 8, 0, raw, interlace=1))
                == img.astype(np.uint8)).all(), (hh, ww)

    # illegal depth/type combos fail loudly
    import pytest as _pytest

    with _pytest.raises(ValueError):
        decode_png_gray(mk(3, 3, 2, 2, b""))
    with _pytest.raises(ValueError):
        decode_png_gray(mk(3, 3, 16, 3, b""))


def test_simhash_kernel_expr_unicode_parity(spark):
    """simhash kernel == expr on NON-ASCII text: the kernel receives
    JVM-lowercased input, so Python's (different) Unicode lower() never
    runs — parity holds on the lower()-divergence edge cases and on a
    hypothesis sweep of arbitrary Unicode."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import simhash

    corpus = [
        "İstanbul NAİVE stop",
        "Kelvin K 273",
        "straße STRASSE ẞharp",
        "ΣΙΣΥΦΟΣ σίσυφος",
        "漢字テキスト 🎉 plain",
        "   leading and trailing   ",
        "",
    ]

    @settings(max_examples=40, deadline=None)
    @given(st.text(max_size=30))
    def collect(s):
        corpus.append(s)

    collect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id long, text string"
    )
    k = {r.doc_id: r.simhash for r in simhash(df, mode="kernel").collect()}
    e = {r.doc_id: r.simhash for r in simhash(df, mode="expr").collect()}
    assert k == e

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
