"""Adversarial-skew stress for the dedup family (VERDICT r2 #6).

One near-dup cluster holding 30% of the corpus is the worst case for
bucket-join candidate generation: every band/table bucket the cluster
touches goes quadratic. These tests measure candidate-pair counts with and
without the hot-bucket caps and pin the contract:

- uncapped: the mega-cluster alone produces OMEGA(cluster^2) candidates
  (the O(N^2) failure mode the caps exist for);
- capped: total candidates stay <= n_buckets * C(cap, 2) — O(cap^2) per
  bucket, never O(N^2) — while duplicate groups SMALLER than the cap are
  still found;
- the documented trade: pairs inside a bucket-dropped mega-cluster are NOT
  reported (their buckets vanish). The production recipe for corpora with
  mega-clusters is a cheap exact/fingerprint pass first (dedup_exact, q16)
  so near-identical floods collapse before LSH. Measured numbers in
  NOTES.md.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import (
    dedup_embedding,
    dedup_minhash_lsh,
    minhash_signature,
    shingle_sets,
)
from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.similarity import (
    make_lsh_buckets_udf,
)

CLUSTER, REST = 180, 420  # 30% mega-cluster
CAP = 32


def _skewed_docs(spark):
    """Deterministic corpus: 30% near-dup mega-cluster (shared base text,
    one-token mutation), a few small dup groups (size 3 < cap), diverse
    rest."""
    base = "the quick brown fox jumps over the lazy dog again and again in the yard "
    rows = []
    for i in range(CLUSTER):
        rows.append((i, base * 3 + f"variant token {i % 7}"))
    for g in range(10):  # ten small groups of 3 near-dups each
        gtext = f"group {g} shares this moderately long sentence body " * 4
        for m in range(3):
            rows.append((1000 + g * 10 + m, gtext + f"tail {m}"))
    rng = np.random.default_rng(7)
    words = [f"w{j}" for j in range(800)]
    for i in range(REST - 30):
        rows.append(
            (5000 + i, " ".join(rng.choice(words, size=40)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _band_candidate_count(spark, docs, max_bucket_size):
    """Sum of C(B,2) over minhash band buckets — the exact candidate count
    the bucket self-join generates, computed from the operator's own
    banding building blocks (portable spec)."""
    num_hashes, bands = 16, 4
    rows_per = num_hashes // bands
    ks = (
        shingle_sets(docs, text_col="text", id_col="doc_id", n=5)
        .select("doc_id", F.array_distinct("hashes").alias("hashes"))
        .withColumn("sig", minhash_signature(F.col("hashes"), num_hashes))
    )
    entries = ks.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "-",
                            *[
                                F.element_at("sig", b * rows_per + r + 1)
                                for r in range(rows_per)
                            ],
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")
    sizes = entries.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    if max_bucket_size is not None:
        sizes = sizes.filter(F.col("n") <= max_bucket_size)
    row = sizes.agg(
        F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("cands"),
        F.count(F.lit(1)).alias("buckets"),
    ).first()
    return int(row["cands"] or 0), int(row["buckets"] or 0)


def test_minhash_lsh_cap_bounds_candidates(spark):
    docs = _skewed_docs(spark).cache()
    uncapped, _ = _band_candidate_count(spark, docs, None)
    capped, n_buckets = _band_candidate_count(spark, docs, CAP)
    # uncapped: the mega-cluster floods the join quadratically (>= one band
    # bucket holding most of the cluster)
    assert uncapped >= (CLUSTER * 0.5) ** 2 / 2, uncapped
    # capped: bounded by buckets * C(cap,2), orders of magnitude below N^2
    assert capped <= n_buckets * CAP * (CAP - 1) / 2
    assert capped < uncapped / 10, (capped, uncapped)


def test_minhash_lsh_cap_preserves_small_groups(spark):
    docs = _skewed_docs(spark).cache()
    pairs = dedup_minhash_lsh(
        docs, n=5, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=CAP,
        cache_result=False,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # every small group's 3 pairs survive the cap
    for g in range(10):
        ids = [1000 + g * 10 + m for m in range(3)]
        for a in range(3):
            for b in range(a + 1, 3):
                assert (ids[a], ids[b]) in got, (g, ids[a], ids[b])
    # the documented trade: the mega-cluster's pair recall collapses (a few
    # split-bucket survivors remain — measured 325 of 16110 on this corpus)
    mega = sum(1 for a, b in got if a < CLUSTER and b < CLUSTER)
    full = CLUSTER * (CLUSTER - 1) // 2
    assert mega < full * 0.05, (mega, full)


def test_mega_cluster_recipe_exact_pass_first(spark):
    """The production recipe for mega-cluster corpora: collapse exact dups
    FIRST, then capped LSH on the representatives. The 180-doc cluster is 7
    exact-text groups; after the exact pass their 7 representatives fit any
    bucket, so capped LSH + components recovers the WHOLE cluster as one
    unit — compute stays bounded AND recall comes back."""
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import (
        dedup_components,
        dedup_exact,
    )

    docs = _skewed_docs(spark).cache()
    kept = dedup_exact(docs, text_col="text", id_col="doc_id").select("doc_id")
    reps = docs.join(kept, "doc_id")
    pairs = dedup_minhash_lsh(
        reps, n=5, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=CAP,
        cache_result=False,
    )
    comp = dedup_components(reps, pairs.select("id_a", "id_b"), id_col="doc_id")
    n_mega_components = (
        comp.filter(F.col("doc_id") < CLUSTER).select("component").distinct().count()
    )
    # 7 representatives -> one connected near-dup component
    assert n_mega_components == 1, n_mega_components
    # versus capped LSH on the RAW corpus, where the cluster shatters
    raw_pairs = dedup_minhash_lsh(
        docs, n=5, num_hashes=16, bands=4, threshold=0.5, max_bucket_size=CAP,
        cache_result=False,
    )
    raw_comp = dedup_components(docs, raw_pairs.select("id_a", "id_b"), id_col="doc_id")
    n_raw = raw_comp.filter(F.col("doc_id") < CLUSTER).select("component").distinct().count()
    assert n_raw > 50, n_raw  # measured 155 of 180 — the trade is real


def test_embedding_cap_bounds_candidates(spark):
    rng = np.random.default_rng(11)
    center = rng.normal(size=16)
    vecs = [
        (i, [float(x) for x in center + rng.normal(size=16) * 0.01], 0)
        for i in range(CLUSTER)
    ]
    vecs += [
        (1000 + i, [float(x) for x in rng.normal(size=16)], 0) for i in range(REST)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>, label int").cache()
    udf = make_lsh_buckets_udf(4, 8, 16)
    entries = df.withColumn("_bk", udf(F.col("embedding"))).select(
        "vec_id", F.posexplode("_bk").alias("table", "bucket")
    )
    sizes = entries.groupBy("table", "bucket").agg(F.count(F.lit(1)).alias("n"))
    unc = int(sizes.agg(F.sum(F.col("n") * (F.col("n") - 1) / 2)).first()[0])
    # dedup_embedding's cap: per-bucket candidates = C(min(B,cap),2)
    # quadratic core + max(0, B-cap) linear star edges to the hub
    capped_expr = F.least(F.col("n"), F.lit(CAP))
    cap_row = sizes.agg(
        F.sum(
            capped_expr * (capped_expr - 1) / 2
            + F.greatest(F.col("n") - CAP, F.lit(0))
        ).alias("c"),
        F.count(F.lit(1)).alias("b"),
    ).first()
    capped, n_buckets = int(cap_row["c"] or 0), int(cap_row["b"] or 0)
    # the near-identical cluster lands whole in one bucket per table
    assert unc >= 8 * CLUSTER * (CLUSTER - 1) / 2 * 0.9, unc
    assert capped <= n_buckets * (CAP * (CAP - 1) / 2 + CLUSTER + REST)
    # the savings are the mega-bucket's quadratic excess, per table
    mega_excess = 8 * (CLUSTER * (CLUSTER - 1) / 2 - CAP * (CAP - 1) / 2 - CLUSTER)
    assert unc - capped >= mega_excess * 0.9, (unc, capped)
    # operator end-to-end: surviving mega pairs bounded by tables*C(cap,2),
    # and the truncation keeps a LOW-ID HUB so the cluster still resolves
    # to ONE component — the docstring's chaining claim, pinned
    pairs = dedup_embedding(
        df, id_col="vec_id", vec_col="embedding", dim=16, threshold=0.3,
        max_bucket_size=CAP,
    )
    got = pairs.collect()
    mega = sum(1 for r in got if r.id_a < CLUSTER and r.id_b < CLUSTER)
    assert 0 < mega <= 8 * CAP * (CAP - 1) / 2, mega
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.dedup import (
        dedup_components,
    )

    comp = dedup_components(
        df.select(F.col("vec_id").alias("doc_id")),
        spark.createDataFrame(
            [(r.id_a, r.id_b) for r in got], "id_a long, id_b long"
        ),
        id_col="doc_id",
    )
    n_mega = comp.filter(F.col("doc_id") < CLUSTER).select("component").distinct().count()
    assert n_mega == 1, n_mega

# pre-artifact lane (r8, VERDICT r7 #8): integration-heavy module --
# runs in the per-round slow lane (full suite or `pytest -m slow`); the
# every-commit fast lane is `pytest -m "not slow"` (sf0.001 parity +
# unit kernels, ~12 min). Coverage is unchanged in the pre-artifact lane.
pytestmark = pytest.mark.slow
