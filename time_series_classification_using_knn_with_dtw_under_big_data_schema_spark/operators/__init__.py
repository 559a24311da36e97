from .knn import knn_join, knn_join_pruned, knn_join_lb, knn_join_lb_metric, knn_classify, knn_predict_1nn, knn_lof, knn_impute  # noqa: F401
from .topk import topk_per_key  # noqa: F401
from .vote import majority_vote, weighted_vote, knn_regress_predict  # noqa: F401
from .evaluate import accuracy, k_sweep, knn_cross_validate  # noqa: F401
from .dedup import (  # noqa: F401
    dedup_components,
    dedup_exact,
    dedup_minhash_lsh,
    dedup_embedding,
    dedup_pairwise_jaccard,
    set_similarity_join,
    simhash,
    simhash_near_dups,
)
from .similarity import (  # noqa: F401
    ann_brute_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    ann_ivfpq_topk,
    ann_pq_topk,
    ivfpq_build,
    ivfpq_search,
    ann_quantized_topk,
    pq_encode,
    pq_train,
    quantize_embeddings,
    random_project,
)
from .classify import (  # noqa: F401
    conformal_knn,
    conformal_set,
    doc_quality_features,
    perceptron_epoch_sweep,
    score_stump,
    score_with_weights,
    train_quality_perceptron,
    train_stump,
)
from .barycenter import dba_classify, dba_update, dtw_kmeans_dba, dtw_path_int  # noqa: F401
from .shapelet import (  # noqa: F401
    shapelet_candidates,
    shapelet_features,
    shapelet_stump,
)
from .cluster import kmeans_assign, kmeans_centroids, semantic_dedup, ts_kmedoids  # noqa: F401
from .features import (  # noqa: F401
    acf_features,
    complexity_features,
    cusum_changepoint,
    decomposition_strength,
    haar_features,
    ljung_box,
    make_rocket_kernels,
    mann_kendall,
    pacf_features,
    periodogram,
    permutation_patterns,
    periodogram_twiddles,
    rocket_features,
    sampen_counts,
    seasonal_decompose,
    series_features,
    theil_sen,
    viterbi_regimes,
)
from .forecast import ar_forecast, forecast_backtest, holt_forecast, holt_winters_forecast  # noqa: F401
from .bpe import apply_merge, bpe_encode, train_bpe  # noqa: F401
from .corpus import (  # noqa: F401
    bm25_build,
    bm25_search,
    bm25_search_pruned,
    bm25_topk,
    cap_per_source,
    chunk_documents,
    decontaminate,
    decontaminate_fuzzy,
    duplicate_spans,
    hash_embed,
    importance_resample,
    ngram_lm_score,
    redact_pii,
    rrf_fuse,
    remove_common_spans,
    pack_sequences,
    repetition_stats,
    tfidf_topk,
    token_rarity,
)
from .multimodal import (  # noqa: F401
    decode_image_features,
    resize_image,
    sample_frames,
    synthetic_media,
    synthetic_png_media,
    synthetic_jpeg_media,
    synthetic_progressive_jpeg_media,
    decode_audio_features,
    synthetic_wav_media,
    decode_video_frames,
    synthetic_gif_media,
)
from .profile import profile_table  # noqa: F401
from .skew import salted_join  # noqa: F401
from .temporal import asof_join, interval_join, resample_ffill  # noqa: F401
from .sketch import (  # noqa: F401
    leakage_safe_split,
    hash_sample,
    hll_distinct,
    hll_registers,
    key_hash,
    kmv_distinct,
    mix32,
    stratified_sample,
)
from .sax import (  # noqa: F401
    SAX_BREAKPOINTS,
    boss_classify,
    codes_to_word,
    sax_codes,
    sax_knn_classify,
    sax_mindist_sq,
    sax_symbolize,
    sfa_words,
)
from .motif import (  # noqa: F401
    bop_classify,
    bop_histograms,
    fluss_segmentation,
    matrix_profile,
    motif_words,
    series_discords,
    subsequence_search,
    subsequence_windows,
)
