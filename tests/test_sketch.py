"""KMV distinct sketch + deterministic hash sampling (operators/sketch.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    hash_sample,
    hll_distinct,
    hll_registers,
    kmv_distinct,
    leakage_safe_split,
)


def test_kmv_exact_below_k(spark):
    df = spark.range(100).toDF("id")
    row = kmv_distinct(df, key="id", k=256).collect()[0]
    assert row.k_used == 100
    assert row.est_distinct == 100.0  # exact when fewer than k distinct


def test_kmv_estimate_within_error(spark):
    n = 50_000
    df = spark.range(n).toDF("id")
    row = kmv_distinct(df, key="id", k=256).collect()[0]
    assert row.k_used == 256
    # SE ~ 1/sqrt(k-2) ~ 6.3%; allow 4 sigma
    assert abs(row.est_distinct - n) / n < 0.25


def test_kmv_duplicates_do_not_inflate(spark):
    df = spark.range(1000).toDF("id").withColumn("id", F.col("id") % 50)
    row = kmv_distinct(df, key="id", k=256).collect()[0]
    assert row.k_used == 50 and row.est_distinct == 50.0


def test_kmv_string_and_multi_key(spark):
    df = spark.createDataFrame(
        [(f"u{i % 20}", i % 7) for i in range(280)], "u string, g long"
    )
    assert kmv_distinct(df, key="u", k=64).collect()[0].est_distinct == 20.0
    # 20 and 7 coprime -> 140 distinct (u, g) pairs by CRT
    assert kmv_distinct(df, key=["u", "g"], k=256).collect()[0].k_used == 140


def test_hash_sample_deterministic_and_consistent(spark):
    df = spark.range(10_000).toDF("k")
    a = {r.k for r in hash_sample(df, key="k", fraction=0.2).collect()}
    b = {r.k for r in hash_sample(df, key="k", fraction=0.2).collect()}
    assert a == b  # no RNG: identical across runs
    # fraction is approximate per-key Bernoulli: binomial 4-sigma band
    assert abs(len(a) - 2000) < 4 * (10_000 * 0.2 * 0.8) ** 0.5
    # a "different table" sharing the key space samples the SAME keys
    other = df.withColumn("payload", F.col("k") * 2)
    c = {r.k for r in hash_sample(other, key="k", fraction=0.2).collect()}
    assert c == a
    # nested fractions: a 10% sample is a subset of the 20% sample
    d = {r.k for r in hash_sample(df, key="k", fraction=0.1).collect()}
    assert d <= a


def test_hash_sample_validates_fraction(spark):
    df = spark.range(10).toDF("k")
    with pytest.raises(ValueError, match="fraction"):
        hash_sample(df, key="k", fraction=1.5)


def test_hash_sample_plan_is_shuffle_free(spark):
    df = spark.range(100).toDF("k")
    plan = (
        hash_sample(df, key="k", fraction=0.5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_xxhash64_mode_same_properties(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(f"doc-{i}", i) for i in range(5000)], "u string, i long"
    )
    est = kmv_distinct(df, key="u", k=256, hash_mode="xxhash64").collect()[0]
    assert abs(est.est_distinct - 5000) / 5000 < 0.25
    a = {r.i for r in hash_sample(df, key="u", fraction=0.2, hash_mode="xxhash64").collect()}
    b = {r.i for r in hash_sample(df, key="u", fraction=0.2, hash_mode="xxhash64").collect()}
    assert a == b and abs(len(a) - 1000) < 4 * (5000 * 0.2 * 0.8) ** 0.5
    with _pt.raises(ValueError, match="hash_mode"):
        hash_sample(df, key="u", fraction=0.1, hash_mode="md5")


def test_histogram_edges_and_clamp(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (55.0,), (100.0,), (250.0,), (None,)],
        "x double",
    )
    out = {r["bucket"]: r for r in histogram(df, "x", bins=10, lo=0.0, hi=100.0).collect()}
    # -5 clamps into bucket 0; 0.0 and 9.9 in bucket 0
    assert out[0]["n"] == 3
    assert out[1]["n"] == 1          # 10.0 -> bucket 1 (left-closed)
    assert out[5]["n"] == 1          # 55.0
    # 100.0 (== hi) and 250 clamp into last bucket; None dropped
    assert out[9]["n"] == 2
    assert (out[0]["lo_edge"], out[0]["hi_edge"]) == (0.0, 10.0)
    assert (out[9]["lo_edge"], out[9]["hi_edge"]) == (90.0, 100.0)
    assert sum(r["n"] for r in out.values()) == 7


def test_histogram_rejects_bad_args(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import histogram

    df = spark.createDataFrame([(1.0,)], "x double")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bins"):
        histogram(df, "x", bins=0, lo=0.0, hi=1.0)
    with _pytest.raises(ValueError, match="hi > lo"):
        histogram(df, "x", bins=5, lo=1.0, hi=1.0)


def test_bloom_semi_join_equals_plain_semi_join(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import bloom_semi_join

    fact = spark.range(0, 500).selectExpr("id AS k", "id * 2 AS payload")
    dim = spark.range(0, 500, 7).selectExpr("id AS k")  # every 7th key
    got = sorted(r["k"] for r in bloom_semi_join(fact, dim, "k").collect())
    want = sorted(r["k"] for r in fact.join(dim, "k", "left_semi").collect())
    assert got == want and len(got) == len(range(0, 500, 7))


def test_bloom_semi_join_empty_dim(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import bloom_semi_join

    fact = spark.range(10).selectExpr("id AS k")
    dim = spark.range(0).selectExpr("id AS k")
    assert bloom_semi_join(fact, dim, "k").count() == 0


def test_bloom_semi_join_rejects_bad_m(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import bloom_semi_join

    df = spark.range(1).selectExpr("id AS k")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple of 64"):
        bloom_semi_join(df, df, "k", m_bits=100)


def test_mixture_sample_weights_and_consistency(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import hash_sample, mixture_sample

    df = spark.range(4000).selectExpr(
        "id", "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g"
    )
    out = mixture_sample(
        df, strata_col="g", weights={"a": 1.0, "b": 0.0}, key="id", default=0.5
    )
    got = out.groupBy("g").count().collect()
    counts = {r["g"]: r["count"] for r in got}
    assert counts.get("a") == 2000 and "b" not in counts  # 1.0 keeps all, 0.0 none

    # a stratum at weight w samples EXACTLY like hash_sample(fraction=w)
    mix = mixture_sample(df, strata_col="g", weights={"a": 0.3}, key="id", default=0.0)
    plain = hash_sample(df.filter("g = 'a'"), key="id", fraction=0.3)
    assert sorted(r.id for r in mix.collect()) == sorted(r.id for r in plain.collect())

    import pytest as _pytest

    with _pytest.raises(ValueError, match="weight"):
        mixture_sample(df, strata_col="g", weights={"a": 1.5}, key="id")


def test_count_min_never_underestimates(spark):
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators.sketch import count_min_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = count_min_topk(docs, k=20, depth=4, width=256).collect()
    assert len(rows) == 20
    assert all(r.cms_n >= r.n for r in rows)  # CMS overestimate guarantee
    # with 4x256 counters on a small corpus, the top tokens are near-exact
    assert sum(1 for r in rows if r.cms_n == r.n) >= 10


# --- HyperLogLog ------------------------------------------------------------


def test_hll_accuracy_within_theory(spark):
    # m=256 -> expected std error 1.04/sqrt(256) ~ 6.5%; allow 4 sigma
    n = 50_000
    df = spark.range(1, n + 1).selectExpr("id AS k")
    row = hll_distinct(df, "k").collect()[0]
    assert abs(row.hll_estimate - n) / n < 0.26
    assert row.zero_regs == 0  # far past the sparse regime


def test_hll_small_range_correction_kicks_in(spark):
    df = spark.range(1, 31).selectExpr("id AS k")  # 30 distinct
    row = hll_distinct(df, "k").collect()[0]
    assert row.zero_regs > 0
    assert row.hll_estimate != row.hll_raw  # linear counting applied
    assert abs(row.hll_estimate - 30) / 30 < 0.35


def test_hll_registers_merge_like_the_data(spark):
    """The mergeability proof: registers(A union B) == merge(registers(A),
    registers(B)) — what lets executors sketch independently."""
    a = spark.range(1, 5_001).selectExpr("id AS k")
    b = spark.range(3_000, 9_001).selectExpr("id AS k")
    whole = {
        (r.b, r.m) for r in hll_registers(a.union(b), "k").collect()
    }
    ra, rb = hll_registers(a, "k"), hll_registers(b, "k")
    merged = {
        (r.b, r.m)
        for r in ra.union(rb).groupBy("b").agg(F.max("m").alias("m")).collect()
    }
    assert whole == merged


def test_hll_string_column_uses_char_fold(spark):
    df = spark.createDataFrame(
        [(f"user-{i}",) for i in range(2_000)], "k string"
    )
    row = hll_distinct(df, "k").collect()[0]
    assert abs(row.hll_estimate - 2_000) / 2_000 < 0.26


def test_hll_duplicates_do_not_inflate(spark):
    df = spark.range(1, 1_001).selectExpr("(id % 100) AS k")  # 100 distinct
    row = hll_distinct(df, "k").collect()[0]
    assert abs(row.hll_estimate - 100) / 100 < 0.35


# --- leakage-safe split -----------------------------------------------------


def test_leakage_safe_split_no_group_spans_splits(spark):
    df = spark.range(0, 5_000).selectExpr("id", "cast(id % 137 AS string) AS grp")
    out = leakage_safe_split(
        df, group="grp", fractions={"train": 0.8, "val": 0.1, "test": 0.1}
    )
    spans = (
        out.groupBy("grp")
        .agg(F.countDistinct("split").alias("n"))
        .filter("n > 1")
        .count()
    )
    assert spans == 0
    # all three splits materialize and fractions are roughly respected
    sizes = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == {"train", "val", "test"}
    assert sizes["train"] > sizes["val"] and sizes["train"] > sizes["test"]


def test_leakage_safe_split_is_stable_across_tables(spark):
    """The same group key assigns identically in any table — labels and
    features split consistently."""
    a = spark.createDataFrame([(f"u{i}", i) for i in range(300)], "user string, x int")
    b = spark.createDataFrame([(f"u{i}", -i) for i in range(300)], "user string, y int")
    fr = {"train": 0.5, "test": 0.5}
    sa = {r.user: r.split for r in leakage_safe_split(a, group="user", fractions=fr).collect()}
    sb = {r.user: r.split for r in leakage_safe_split(b, group="user", fractions=fr).collect()}
    assert sa == sb


def test_leakage_safe_split_validates_fractions(spark):
    df = spark.range(3).selectExpr("id AS g")
    with pytest.raises(ValueError, match="sum to 1"):
        leakage_safe_split(df, group="g", fractions={"a": 0.5})


def test_hash_sample_unbiased_on_short_string_keys(spark):
    """The raw char fold of short strings is tiny; without the affine
    spread hash_sample would keep EVERY 2-char key at fraction 0.1."""
    df = spark.createDataFrame(
        [(f"{a}{b}",) for a in "abcdefghij" for b in "abcdefghij"], "k string"
    )  # 100 distinct 2-char keys
    kept = hash_sample(df, key="k", fraction=0.1).count()
    assert 2 <= kept <= 30  # ~10 expected; anything but "all 100"


def test_leakage_safe_split_null_group_is_visible(spark):
    """Review finding: NULL group keys must NOT silently land in the last
    split — they surface as a NULL split (still all together)."""
    df = spark.createDataFrame(
        [("a", 1), (None, 2), (None, 3)], "g string, x int"
    )
    rows = {r.x: r.split for r in leakage_safe_split(
        df, group="g", fractions={"train": 0.5, "test": 0.5}
    ).collect()}
    assert rows[2] is None and rows[3] is None
    assert rows[1] in ("train", "test")
