"""Oracle output-type audit: kill the representation-drift class.

Four rounds of driver reds (r6 wav_decode, r7 covariance_matrix, r8
ts_decompose + cumulative_gains) were never value bugs — they were
representation gaps between the local canonicalizer and the grading
driver's hasher, triggered by oracle output columns whose DuckDB type
does not canonicalize identically to the Spark type:

- HUGEINT (any un-cast ``sum(BIGINT)`` aggregate or window sum)
  converts to pandas object/float inconsistently;
- DECIMAL (bare float literals parse as DECIMAL(18,17)) hashes as
  ``decimal.Decimal`` while Spark emits float64;
- REAL/FLOAT truncates differently from DOUBLE.

This test DESCRIBEs every registered oracle through DuckDB (no
execution — DuckDB type-checks the full query plan) and fails on any
of those types. DOUBLE columns are allowed only when the (query,
column) pair is in the audited allowlist below: audited means the
expression is either verbatim-identical SQL in both engines or
quantized/rounded identically before emission, so both engines emit
the same float64 bit pattern. Adding a new double-emitting column
fails this test until the pair is audited and listed — preferred fix
is the 1e6 BIGINT grid (``CAST(round(x * 1e6) AS BIGINT)``, the
did_event_study ``gapq`` pattern).
"""

import duckdb
import pytest

from google_analytics_to_s3_spark.plans import driver_queries as dq

from .oracle import TABLES

_BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL", "REAL", "FLOAT")

# (query -> sorted double column names) audited as of round 9: every
# pair below was driver-green or judge-verified value-identical with
# verbatim-shared arithmetic at the time of audit. Keep sorted.
AUDITED_DOUBLE_COLUMNS = {
    'ab_cuped': ['mean_post', 'mean_post_adj', 'mean_pre', 'theta', 'var_reduction'],
    'ab_lift': ['rate_control', 'rate_treatment', 'rel_lift'],
    'ab_srm': ['chi2', 'chi2_term', 'n_exp'],
    'ab_ztest': ['mde_80', 'rate_c', 'rate_t', 'z'],
    'action_revenue': ['revenue'],
    'als_rank1': ['train_rmse', 'v_factor'],
    'attribution_models': ['credit_decay', 'credit_first', 'credit_last', 'credit_last_nd', 'credit_linear', 'credit_position'],
    'basket_rules': ['confidence', 'lift', 'support'],
    'benford_dq': ['chi2', 'expected_p'],
    'binary_auc': ['auc'],
    'bm25_search': ['score'],
    'boilerplate_fraction': ['boiler_frac'],
    'bootstrap_ci': ['boot_hi', 'boot_lo', 'point_est'],
    'bounce_exit': ['bounce_rate', 'exit_rate'],
    'brand_disjunction_revenue': ['revenue'],
    'burst_detection': ['baseline_mean'],
    'calibration_report': ['accuracy', 'confidence', 'ece'],
    'char_entropy': ['entropy_bits'],
    'community_modularity': ['contribution', 'modularity'],
    'conformal_intervals': ['coverage', 'q_hat'],
    'cosine_dup_pairs': ['score'],
    'covariance_matrix': ['corr', 'cov'],
    'customer_order_ranks': ['running_spend'],
    'daily_engagement': ['purchase_revenue'],
    'dataset_card': ['keep_rate'],
    'dau_wau_mau': ['stickiness'],
    'did_event_study': ['effect', 'gap'],
    'did_lift': ['did', 'mean_c0', 'mean_c1', 'mean_t0', 'mean_t1'],
    'dr_policy': ['dr_value', 'ips_value'],
    'dsir_weights': ['dsir_score'],
    'dup_spans': ['dup_frac'],
    'eb_smoothing': ['rate', 'smoothed'],
    'embedding_lsh_pairs': ['score'],
    'embedding_project': ['val'],
    'event_anomalies': ['mad', 'med'],
    'event_transitions': ['p'],
    'events_cube': ['total_value'],
    'events_grouping_sets': ['total_value'],
    'export_products': ['hits_product_productRevenue'],
    'export_sessions': ['session_revenue'],
    'fdr_screen': ['bh_crit', 'p_adj', 'p_value', 'z'],
    'feature_chi2': ['chi2', 'cramers_v', 'mi'],
    'forecast_backtest': ['mae', 'mape'],
    'forecast_revenue': ['revenue'],
    'fs_linkage': ['score'],
    'gap_fill_ffill': ['filled_value'],
    'geo_enrich': ['geo_latitude', 'geo_longitude'],
    'gif_frames': ['rgb_mean'],
    'gini_concentration': ['gini', 'top_value_share'],
    'good_turing': ['prob_mass', 'r_star'],
    'heavy_hitters': ['share'],
    'hll_rollup': ['hll_users'],
    'hll_users': ['hll_estimate'],
    'holt_forecast': ['predicted'],
    'holt_winters': ['predicted'],
    'hopping_distinct': ['est_users'],
    'hopping_window': ['total_value'],
    'hourly_seasonality': ['chi2', 'chi2_per_dof'],
    'incremental_rollup': ['avg_value'],
    'interval_join': ['purchase_revenue'],
    'isotonic_calibration': ['iso_rate', 'rate'],
    'item_similarity': ['cos'],
    # bmp/tiff mean_px: integer_sum / 273.0 (resp. / (77*spp)) —
    # denominators coprime to 2*10^6, so the 6th-decimal round can
    # never land on a tie; expression verbatim-identical both engines
    'bmp_decode': ['mean_px'],
    'tiff_decode': ['mean_px'],
    'tiff_decode_lzw': ['mean_px'],
    'tiff_decode_tiled': ['mean_px'],
    'jpeg_decode': ['mean_px'],
    'jpeg_decode_420': ['mean_px'],
    'jpeg_decode_progressive': ['mean_px'],
    'kmv_overlap': ['est_a', 'est_b', 'est_intersection', 'est_jaccard', 'est_union'],
    'knn_cosine': ['score'],
    'knn_ivf': ['score'],
    'knn_recall': ['recall'],
    'ks_drift': ['d_stat'],
    'l_diversity': ['entropy'],
    'label_centroids': ['centroid'],
    'langid_eval': ['accuracy'],
    'large_volume_customers': ['o_totalprice', 'total_qty'],
    'linear_count_users': ['lc_estimate'],
    'lm_backoff_score': ['backoff_rate', 'mean_log_score'],
    'lm_typicality': ['typicality'],
    'local_supplier_volume': ['revenue'],
    'logrank_test': ['chi2', 'e1', 'v'],
    'lsh_recall': ['prec', 'recall'],
    'mann_whitney': ['u1', 'z'],
    'market_share': ['mkt_share'],
    'markov_attribution': ['attributed_conv', 'removal_effect'],
    'merge_upsert': ['total'],
    'min_cost_supplier': ['unit_price'],
    'minhash_lsh_pairs': ['est_jaccard'],
    'moving_revenue': ['daily_rev', 'ma7_rev'],
    'msprt_monitor': ['lambda_sprt', 'lift', 'p_always_valid'],
    'ndcg_eval': ['dcg', 'idcg', 'ndcg'],
    'new_vs_returning': ['new_share'],
    'neyman_sample': ['stddev'],
    'ngram_jaccard_pairs': ['jaccard'],
    'ngram_jaccard_thresholded': ['jaccard'],
    'offline_policy': ['ips_value', 'snips_value'],
    'ols_regression': ['beta0', 'beta1', 'beta2', 'r2'],
    'order_lineitem_left_join': ['items_value'],
    'order_percentiles': ['max_price', 'min_price', 'p50', 'p90'],
    'order_rank_stats': ['cd', 'pr'],
    'part_pagerank': ['rank'],
    'png_decode': ['mean_px'],
    'ppm_decode': ['mean_px'],
    'pricing_summary': ['sum_base_price', 'sum_charge', 'sum_disc_price', 'sum_qty'],
    'promo_revenue': ['promo_pct', 'promo_revenue', 'total_revenue'],
    'pruning_stats': ['max_val', 'min_val'],
    'psi_drift': ['psi'],
    'quality_filter': ['alpha_frac', 'distinct_ratio', 'mean_word_len', 'top_word_frac'],
    'quantile_normalize': ['price_qnorm'],
    'quantile_sketch': ['est_lo'],
    'repetition_signals': ['dup2_frac', 'dup3_frac', 'top2_frac', 'top3_frac'],
    'returned_items': ['c_acctbal', 'revenue'],
    'revenue_acf': ['acf'],
    'robust_outliers': ['price_winsor'],
    'rrf_fusion': ['rrf_score'],
    'sales_opportunity': ['totacctbal'],
    'sales_rollup': ['total_spend'],
    'salted_event_totals': ['total_value'],
    'salted_join': ['weighted_value'],
    'scd2_asof_enrich': ['sum_qty'],
    'seasonal_anomalies': ['mad', 'med'],
    'session_revenue': ['purchase_revenue'],
    'shapley_attribution': ['shap'],
    'shipping_priority': ['revenue'],
    'skew_report': ['share', 'uniform_share'],
    'small_qty_revenue': ['avg_yearly'],
    'survival_curve': ['hazard', 'survival'],
    'table_profile': ['null_text_rate', 'sum_chars'],
    'target_encoding': ['c_mktsegment_enc'],
    'text_quality': ['avg_token_len', 'distinct_token_ratio', 'punct_ratio'],
    'text_stats': ['stopword_ratio'],
    'textrank_keywords': ['rank'],
    'tfidf_top_terms': ['tfidf'],
    'theil_sen': ['intercept', 'slope'],
    'time_to_conversion': ['median_hours', 'p25_hours', 'p75_hours'],
    'top_supplier': ['total_revenue'],
    'trimmed_stats': ['mean', 'trimmed_mean', 'winsor_mean'],
    'user_entropy': ['entropy_nats'],
    'vocab_oov': ['oov_rate'],
    'volume_shipping': ['revenue'],
    'wasserstein_drift': ['w1', 'w1_normalized'],
    'weighted_sample': ['sample_key', 'weight'],
    'winnow_dup_pairs': ['overlap'],
    'word_pmi': ['pmi'],
    'y4m_shots': ['y_mean'],
    'zipf_alpha': ['alpha', 'alpha_se', 'tail_token_share'],
}


@pytest.fixture(scope="module")
def describe_conn(sf_oracle):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_oracle}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(dq.ORACLES.keys()))
def test_oracle_output_types(describe_conn, name):
    desc = describe_conn.execute(f"DESCRIBE {dq.ORACLES[name]}").fetchall()
    banned = [
        (col, typ)
        for col, typ, *_ in desc
        if any(b in typ.upper() for b in _BANNED)
    ]
    assert not banned, (
        f"{name}: oracle emits driver-unsafe types {banned} — cast "
        "HUGEINT sums AS BIGINT, DECIMAL literals AS DOUBLE (the "
        "ts_decompose/cumulative_gains r8 red class)"
    )
    allowed = set(AUDITED_DOUBLE_COLUMNS.get(name, ()))
    unaudited = [
        col for col, typ, *_ in desc
        if typ.upper() == "DOUBLE" and col not in allowed
    ]
    assert not unaudited, (
        f"{name}: DOUBLE columns {unaudited} are not in the audited "
        "allowlist — either move them onto the 1e6 BIGINT grid "
        "(CAST(round(x * 1e6) AS BIGINT) in both engines) or audit "
        "that the expression is verbatim-identical in both engines "
        "and add the pair to AUDITED_DOUBLE_COLUMNS"
    )


def test_allowlist_has_no_stale_entries():
    stale = sorted(set(AUDITED_DOUBLE_COLUMNS) - set(dq.ORACLES))
    assert not stale, f"allowlist names unregistered queries: {stale}"
