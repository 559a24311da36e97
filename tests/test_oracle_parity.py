"""Local twin of the driver's t2 gate: run every queries() entry on Spark and
its oracle_sql() twin on DuckDB over the same parquet tables, compare
row count + column names + order-insensitive values (sorted-rows equality,
which is strictly stronger than the driver's value hash)."""

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _normalize(rows):
    out = []
    for row in rows:
        norm = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    norm.append("NaN")
                else:
                    # driver-style float comparison tolerance: round to 9 sig
                    norm.append(float(f"{v:.9g}"))
            elif hasattr(v, "__float__") and type(v).__name__ == "Decimal":
                norm.append(float(f"{float(v):.9g}"))
            else:
                norm.append(v)
        out.append(tuple(norm))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    sql = entry_mod.oracle_sql().get(name)
    if sql is None:
        assert len(spark_rows) >= 0  # rows-only check per contract
        return
    rel = duck.sql(sql)
    duck_rows = rel.fetchall()
    duck_cols = rel.columns

    assert spark_cols == duck_cols, f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    assert _normalize(spark_rows) == _normalize(duck_rows), f"{name}: value mismatch"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_has_no_hugeint(duck, name):
    """DuckDB widens sum(BIGINT) to HUGEINT (int128) and float-literal
    arithmetic to DECIMAL, whose value reprs break the driver's cross-engine
    value hash even when the numbers are identical (round-1 verdict: 8
    hash-misses from exactly the HUGEINT case). Every oracle output column
    must be a type Spark produces too: integer -> CAST AS BIGINT/INT,
    decimal arithmetic -> CAST AS DOUBLE."""
    rel = duck.sql(entry_mod.oracle_sql()[name])
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t) or str(t).startswith("DECIMAL")
    ]
    assert not bad, f"{name}: repr-hazard columns {bad} — CAST to BIGINT/DOUBLE"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"test_id", "predicted_label"}


# ---------------------------------------------------------------------------
# sf0.1 parity subset (VERDICT r3 #8): the most expensive / most
# plan-sensitive queries re-verified at the driver's BENCH scale, so
# scale-dependent plan changes (AQE switching join strategies, broadcast
# thresholds crossed, skew splits) can't silently alter results. Marked
# slow — run once per round: `pytest -m slow tests/test_oracle_parity.py`.
# ---------------------------------------------------------------------------

SF01_DIR = "/root/testdata/sf0.1"

# the heavy tail: big joins/windows, LSH + components, ANN family, sketches,
# BPE chain, composed pipelines — the entries whose physical plans are most
# likely to change shape with input size
SLOW_SUBSET = [
    "q01_pricing_summary",
    "q04_topk_per_group",
    "q09_knn_pairs",
    "q12_knn_accuracy",
    "q16_dedup_exact",
    "q18_dedup_minhash_lsh",
    "q23_ann_cosine",
    "q24_ann_lsh",
    "q25_knn_pruned",
    "q34_ann_ivf",
    "q35_dedup_components",
    "q63_multiway_join",
    "q70_knn_dtw_exact",
    "q74_dedup_embedding",
    "q84_count_min",
    "q88_semantic_dedup",
    "q90_ann_quantized",
    "q93_ann_ivf_kmeans",
    "q103_bpe_encode",
    "q104_duplicate_spans",
    "q107_hll_distinct",
    "q109_tokenizer_pipeline",
    "q113_knn_dtw_multichannel",
    # PQ family (r5, VERDICT r4 #5): the most AQE-plan-sensitive chains in
    # the repo — previously verified at sf0.001 only
    "q115_ann_pq",
    "q116_ann_ivfpq",
    "q117_bm25",
    "q118_hybrid_retrieval",
    "q119_bm25_pruned",
    "q120_bm25_served",
    "q121_bm25_wand",
    "q122_bm25_wand_certificate",
    "q123_knn_chunked",
    "q124_ann_quantized_chunked",
    # learned quality filter (r5): 4 chained training epochs — the
    # weight hash is sensitive to every misclassified-set decision, so
    # verify at bench scale too
    "q125_quality_classifier",
    "q126_quality_filter",
    # declarative stump induction (r5): window + union + top-1 argmin
    "q130_stump_filter",
    # composed feature-space series classifier (r5): series build + feature
    # folds + quantization + 4 epochs under one hash
    "q131_series_classifier",
    # SAX / subsequence family (r5): the window self-join (q134) and the
    # BOP sparse-distance chain (q137) are the plan-shape-sensitive ones;
    # q133's MINDIST vote and q140's TakeOrdered top-k ride along
    "q133_sax_knn",
    "q134_matrix_profile",
    "q137_bop_classify",
    "q140_subsequence_search",
    # one-plan k-fold CV (r5): the biggest single cross join in the registry
    "q141_knn_cv",
    # shape-analytics family (r5 cont.): SBD's 2n-1-shift fold sweep over
    # the full cross join, DSIR's bucket-distribution chain, and the
    # ROCKET feature-space KNN (q143/q145's k-medoids oracles and the
    # q149/q150/q153 DBA-family oracles rebuild full pair matrices / DP
    # tables in recursive CTEs — exact but deliberately sf0.001/0.01-only;
    # the Spark side is staged-pairs/broadcast-prototypes and scales)
    "q142_sbd_knn",
    "q144_importance_resample",
    "q146_rocket_features",
    "q147_rocket_knn",
    "q148_seasonal_decompose",
    # r6 (VERDICT r5 #7): the rest of the r5 shape family whose oracles are
    # LINEAR in series count (per-series smoothing/CUSUM folds — measured
    # < 0.5s each at sf0.1); the pair-matrix/path-replay recursions
    # (q143/q145/q149/q150/q153) stay sf0.001/0.01-only — q149's oracle
    # alone ran > 10 min at sf0.1 (1500^2-pair DP rebuild), while their
    # Spark sides are broadcast-prototype plans verified here via the
    # family's cheap members plus q156's full-DP equality below
    "q151_holt_forecast",
    "q152_residual_anomalies",
    "q154_cusum_changepoint",
    "q155_holt_winters",
    # multichannel LB-pruned KNN vs the q113 brute-force DP oracle at bench
    # scale: the lossless-pruning claim re-proven where AQE actually
    # re-plans (q113 itself is already in this subset)
    "q156_knn_dtw_mc_pruned",
    # r6 additions: shapelet rule induction (candidate x series min-dist
    # scan + stump argmin — 1.3s oracle at sf0.1) and the AR(2) Cramer fit
    "q157_shapelet_rule",
    "q158_ar_forecast",
    "q160_mann_kendall",
    "q161_theil_sen",
    # q162-q165 + q185 (edit-distance KNN) are sf0.001/0.01-only like the other
    # pair-DP replays: both the q162 declarative fold and the recursive-CTE
    # oracles are O(pairs * n * m) interpreted DPs (measured ~2 min EACH at
    # sf0.1); the production kernel paths are benched separately
    # (bench.py knn_lcss/edr/erp/twed/msm_kernel) and 3-strategy equality is
    # pinned in test_edit_distance. q166 (LOF), q169 (conformal) and q173
    # (impute) also stay small-sf: their oracles fold the FULL pair matrix
    # in interpreted DuckDB lambdas.
    # r6 continuation: the linear-per-series / bounded-key additions run at
    # bench scale too
    "q167_acf_dominant_lag",
    "q168_periodogram",
    "q172_ljung_box",
    "q174_sfa_words",
    "q175_forecast_backtest",
    "q176_pacf",
    "q177_haar_features",
    "q178_decomposition_strength",
    "q179_permutation_patterns",
    "q180_boss_classify",
    "q181_complexity_features",
    "q182_label_leadlag",
    # r9 (VERDICT r8 #1): the r7/r8 families — LB pruning, sampled gates,
    # conformal, streaming twins — are exactly the plans whose ROUTING is
    # scale-dependent (gate probes, LB thresholds, byte-guards), so they
    # are re-proven at bench scale. Oracle costs measured one-by-one at
    # sf0.1 before inclusion (each a subprocess with a hard timeout):
    # q183 1s, q184/q186/q187 <1s, q190 141s, q192 87s, q194 92s,
    # q195 136s, q196 130s, q197 <1s, q199 91s, q200 50s. Excluded with
    # the same measured reasoning as q162-q165/q143/q149: q185 (pair-DP
    # MSM recursion), q188/q189/q198 (MULTICHANNEL pair-DP oracles — q188
    # measured >40 min at sf0.1; their Spark sides run in ~3s), q191/q193
    # (full NxN pair-matrix TWED folds, >200s). The q198-family lossless
    # claim is still re-proven at sf0.1 by the brute-equality test below
    # (test_mc_lb_pruned_matches_brute_sf01) — the pruning phases are the
    # scale-sensitive part; the TWED DP itself is scale-invariant kernel
    # code already oracle-proven at sf0.001/0.01.
    "q183_early_classification",
    "q184_drift_detect",
    "q186_sampen_counts",
    "q187_stream_drift_twin",
    "q190_stream_stateless_twin",
    "q192_conformal_twed",
    "q194_conformal_set",
    "q195_knn_twed_lb_pruned",
    "q196_knn_twed_lb_gated",
    "q197_vector_boundary_roundtrip",
    "q199_knn_dtw_lb_gated",
    "q200_knn_dtw_ragged",
    # r9 second pass: the chunked block grid at sf0.1 — cell counts and
    # the one-cell-per-task repartition are exactly the scale-dependent
    # plan pieces; the oracle is q200's (same ~50s brute DP, shared cost)
    "q201_knn_dtw_ragged_chunked",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF01_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.slow
@pytest.mark.parametrize("name", SLOW_SUBSET)
def test_query_matches_oracle_sf01(spark, duck01, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF01_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    sql = entry_mod.oracle_sql().get(name)
    assert sql is not None, f"{name}: slow subset entries must carry an oracle"
    rel = duck01.sql(sql)
    duck_rows = rel.fetchall()
    duck_cols = rel.columns

    assert spark_cols == duck_cols, f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    assert _normalize(spark_rows) == _normalize(duck_rows), f"{name}: value mismatch"


@pytest.mark.slow
def test_mc_lb_pruned_matches_brute_sf01(spark):
    """r9 (VERDICT r8 #1): the q198 family at BENCH scale. Its DuckDB
    oracle (q188's multichannel TWED pair-DP recursion) measured >40 min
    at sf0.1, so the sf0.1 proof is brute-force EQUALITY instead: the
    anchor-bound pruning phases (the scale-sensitive routing) must lose
    nothing against the kernel-strategy brute join on the same 2-channel
    input. The TWED DP itself is scale-invariant kernel code, oracle-
    proven at sf0.001/0.01 (q188/q198 in the driver-gate twin)."""
    from pyspark.sql import functions as F

    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
        knn_join,
        knn_join_lb_metric,
    )
    from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.sources import (
        events_to_series,
        split_train_test,
    )

    events = entry_mod._t(spark, SF01_DIR, "events").withColumn(
        "ch2", F.length("event_type").cast("double")
    )
    series = events_to_series(
        events, value=["value", "ch2"], length=entry_mod.SERIES_LEN
    )
    train, test = split_train_test(series)
    pruned = knn_join_lb_metric(test, train, metric="twed", k=3, channels=2)
    brute = knn_join(test, train, metric="twed", k=3, strategy="kernel")
    got = sorted(
        (r.test_id, r.rank, r.train_id, r.distance) for r in pruned.collect()
    )
    want = sorted(
        (r.test_id, r.rank, r.train_id, r.distance) for r in brute.collect()
    )
    assert got and got == want
