"""Automated single-partition audit (SCALE.md §R, round-4 automation).

§R's classification of every `Exchange SinglePartition` occurrence used to
be hand-maintained prose; this test digests EVERY registered plan and
fails on any single-partition exchange not in the allowlist below — a new
unclassified global becomes a CI failure, not a doc drift.

The three benign classes (§R):
1. global-aggregate FINAL stages — 1 row after a distributed partial agg;
2. scalar-subquery broadcasts — a 1-row threshold/total feeding a
   broadcast join;
3. documented deliberate post-agg globals — calendar/vocab/month-bounded
   running windows and the n_partitions-row ranks-helper offset tables.

Every allowlisted key carries its class so the doc and the gate are the
same artifact. A key whose plan IMPROVES (drops its global) stays valid;
a key that ACQUIRES one fails until classified here.
"""

from __future__ import annotations

import pytest

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.plans import digest
from sap_cta_data_pipeline_spark.registry import QUERIES

#: key -> §R class (1 = 1-row global final, 2 = scalar broadcast,
#: 3 = documented post-agg bounded global / ranks offset table)
ALLOWED_SINGLE_PARTITION: dict[str, int] = {
    "agg_approx_topk": 1,  # k-bounded sketch state, global final
    "agg_global": 1,
    "agg_hll_intersection_eval": 1,
    "agg_heavy_hitters": 2,
    "agg_hll_mergeable": 1,
    "agg_percentile_bands": 2,
    "agg_quantile_mergeable": 1,
    "agg_winsorized_stats": 2,
    "agg_theil_decomposition": 2,  # 1-row global (mu, y) broadcast — sub_scalar_global class
    "corpus_mix_exact": 2,
    "corpus_shuffle_deterministic": 3,  # ranks-helper offset table (n_partitions rows)
    "customer_interpurchase_time": 1,
    "customer_rfm_segments": 3,
    "customer_survival_km": 3,  # calendar-bounded week-grain KM windows + 1-row total
    "customer_spend_gini": 3,
    "dedup_semantic_recall_eval": 1,
    "dq_benford_check": 2,  # 1-row digit-total broadcast
    "dq_expectations": 1,
    "dq_k_anonymity": 1,  # two 1-row per-level audit finals, 2-row union
    "dq_freshness_sla": 2,
    "dq_sequence_gaps": 1,  # three 1-row audit finals (stats/ends/firsts) cross-joined
    "dq_referential_integrity": 1,
    "emb_ivf_kmeans_ann": 2,  # k-row learned-centroid broadcast (sim_ann_ivf class)
    "emb_norm_audit": 2,
    "ml_bootstrap_poisson_ci": 1,  # 80 sufficient-stat aggs -> 1-row global final
    "emb_isotropy_score": 2,  # 64-row centroid + 1-row cnorm broadcasts, 1-row final
    "emb_outlier_mahalanobis": 2,  # 64-row dim-stats broadcast + top-20 limit window
    "events_ab_cuped": 2,  # 1-row theta/mean broadcast (sub_scalar_global class)
    "events_ab_ratio_delta_method": 3,  # 2-row arm-stat frame + cross-arm windows
    "events_ab_ttest": 1,
    "events_attribution_shapley": 1,  # ≤8-row coalition table → 1-row pivot final
    "events_ab_sequential_sprt": 3,  # day-grain cumulative window (O(days) rows)
    "events_ab_power_mde": 2,  # 1-row base-rate/traffic broadcast x 3-row grid
    "events_churn_flags": 2,
    "events_uplift_qini": 3,  # user-grain score rank (ml_auc_roc class) + 10-row decile windows
    "events_did_estimator": 1,  # 4-cell agg → 1-row DiD fold
    "events_eb_rate_shrinkage": 2,  # 1-row Beta moment-fit broadcast (sub_scalar_global class)
    "events_forecast_snaive": 2,  # 1-row horizon (max day) broadcast
    "events_conversion_latency": 1,
    "events_cumulative_users": 3,
    "events_funnel_steps": 1,
    "events_funnel_conversion_window": 1,  # three 1-row step-count finals
    "events_lateness_report": 3,
    "graph_bfs_layers": 1,  # 1-row seed (global min) + per-layer bounded frontiers
    "graph_hits_bipartite": 3,  # L2-norm windows over one-side score frames (long-session heap hygiene)
    "graph_triangle_count": 1,
    "ids_assign_global": 3,
    "json_shred_discover": 1,  # 3-row union of per-key global-agg profiles
    "lang_id_confusion_eval": 1,
    "lineitem_abc_pareto": 3,
    "ml_auc_delong_se": 3,  # value-grain rank windows (ml_auc_roc class) + 1-row final
    "ml_auc_roc": 3,
    "ml_ks_test": 3,
    "ml_isotonic_calibration": 3,  # 20-bin-grain cum windows + bounded minimax closure
    "ml_shap_linear_exact": 1,  # 1-row sufficient-stats fit broadcast (ml_ols class)
    "ml_kfold_assign": 2,  # 1-row grand-total broadcast (complement identity)
    "ml_lift_gains_table": 3,
    "ml_ols_two_feature": 1,  # sufficient-stats 1-row frames (normal equations)
    "ml_pr_auc": 3,  # value-grain running window, ml_auc_roc class
    "ml_threshold_optimal": 3,  # score-grain cumulative windows + 1-row argmax finals
    "ml_psi_drift": 2,
    "ml_wasserstein_drift": 3,  # value-grain CDF running window (ml_auc_roc class) + 1-row final
    "ml_woe_iv_binning": 3,  # bin-grain total windows over 10 rows (ml_psi_drift class)
    "ml_target_encoding": 2,
    "orders_association_rules": 2,
    "part_abc_xyz_matrix": 3,
    "orders_growth_mom_yoy": 3,
    "orders_panel_within_estimator": 3,  # panel-grain (nation×month) demean windows + 1-row final
    "orders_open_backlog_daily": 3,
    "orders_queue_backlog_lindley": 3,  # calendar-bounded day-grain cumsum/min windows
    "orders_seasonality_index": 3,
    "profile_histogram_auto": 2,
    "profile_join_key_skew": 1,
    "profile_shuffle_balance": 3,  # P-row (32) partition-load windows
    "profile_table": 1,
    "quantile_accuracy_eval": 1,
    "scan_parquet": 1,
    "source_json_malformed": 1,  # 1-row ingestion-audit global final
    "sim_ann_ivf": 2,
    "sim_ann_ivfpq": 2,  # k-row centroid/codebook builds (emb_ivf_kmeans_ann class)
    "sim_ann_ivfpq_rerank": 2,  # composes sim_ann_ivfpq — inherits its builds
    "sim_recall_eval": 2,  # composes sim_ann_ivf → inherits its centroid build
    "sink_parquet_bloomfilter": 1,
    "part_kmeans1d_exact": 3,  # 25-brand-grain rank/prefix windows + bounded split closure
    "part_skyline_pareto": 3,  # n_parts-row offsets table (with_global_running_max)
    "sort_multikey": 3,
    "stats_mutual_information": 2,  # 1-row grand-total broadcast over the joint frame
    "text_js_divergence_sources": 2,  # 1-row grand-total broadcast feeding both term branches
    "text_lm_kneser_ney_bigram": 2,  # 1-row bigram-type-count broadcast (KN denominator)
    "graph_assortativity": 1,  # 1-row corr/count final over the degree-pair frame
    "ts_fourier_seasonal_fit": 3,  # day-grain series windows + 1-row coef/r2 broadcasts
    "ts_haar_wavelet_energy": 3,  # day-grain index window + halving cascade + 1-row total
    "ts_stl_decompose_daily": 3,  # day-grain centered-MA windows + 7-row seasonal normalize
    "ts_seasonal_strength": 3,  # composes the STL day-grain windows + 1-row strength final
    "ts_bollinger_breach": 3,  # day-grain trailing-20 windows (O(days) rows)
    "ts_drawdown_max": 3,  # day-grain running cum/peak windows + 1-row final
    "stats_anova_oneway": 1,  # 1-row sufficient-stats total (k, N, grand mean)
    "stats_fdr_bh_adjust": 3,  # battery-grain BH rank/step-up windows (n_tests rows)
    "stats_chi2_independence": 3,  # grand-total window over ≤types×7 CELLS, then 1-row final
    "stats_kendall_tau": 1,  # 25-row grain self-join → 1-row concordance final
    "ml_mcc": 1,  # 1-row confusion final
    "ml_brier_decomposition": 1,  # 1-row brier + 1-row bin-total finals
    "ml_cohens_kappa": 1,  # 1-row marginals final
    "sort_nulls_explicit": 3,
    "sub_not_in_nulls": 1,
    "sub_scalar_global": 1,
    "text_bleu2_corpus_eval": 1,  # four 1-row corpus-sum finals (clip/len sufficient stats)
    "text_bm25_topk": 2,
    "text_collocations_pmi": 3,
    "text_tfidf_topk": 2,
    "text_vocab_coverage": 2,
    "text_vocab_growth_heaps": 2,
    "text_wordcount": 3,
    "tpch_q11_important_volume": 2,
    "txnlog_describe_history": 1,  # per-version 1-row live-count finals
    "tpch_q14_promo_revenue": 1,
    "tpch_q15_top_supplier": 2,
    "tpch_q17_small_quantity_revenue": 2,
    "tpch_q19_disjunctive_revenue": 1,
    "tpch_q22_dormant_customers": 2,
    "tpch_q6_forecast_revenue": 1,
    "ts_changepoint_cusum": 3,
    "win_ntile_pct": 3,
    "win_rolling_median": 3,
    "win_time_range_frame": 3,
}


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_no_unclassified_single_partition_exchange(key, spark, sf_dir):
    d = digest(QUERIES[key](spark, sf_dir))
    if d.n_single_partition and key not in ALLOWED_SINGLE_PARTITION:
        pytest.fail(
            f"{key}: {d.n_single_partition} Exchange SinglePartition stage(s) "
            "not classified in SCALE.md §R / ALLOWED_SINGLE_PARTITION — "
            "classify it (class 1/2/3) or fix the plan"
        )
