"""Automated single-partition audit (SCALE.md §R, round-4 automation;
class 3 TIGHTENED round 9 per the round-8 verdict).

§R's classification of every `Exchange SinglePartition` occurrence used to
be hand-maintained prose; this test digests EVERY registered plan and
fails on any single-partition exchange not in the allowlist below — a new
unclassified global becomes a CI failure, not a doc drift.

The three benign classes (§R):
1. global-aggregate FINAL stages — 1 row after a distributed partial agg;
2. scalar-subquery broadcasts — a 1-row threshold/total feeding a
   broadcast join;
3. documented deliberate post-agg globals whose frame is bounded **by
   construction** — calendar-grain, constant-k rows, n_partitions-row
   ranks offsets, ≤|types|² matrices — or measured-gated. Round-9
   tightening: a class-3 entry MUST name its bound family + detail (the
   tuple below), and the two families whose frames CAN grow with the
   corpus (`value-grain+route`, `semantic-global+route`) are admitted
   ONLY when the operator's docstring documents the at-scale route
   (pre-binning / range-partitioned ranks / per-partition merge) — the
   gate greps the docstring for the route. An entry like round 8's
   graph_hits_bipartite (corpus-growing node frames labeled "bounded")
   can no longer hide in class 3.

Every allowlisted key carries its class so the doc and the gate are the
same artifact. A key whose plan IMPROVES (drops its global) stays valid;
a key that ACQUIRES one fails until classified here.
"""

from __future__ import annotations

import pytest

import sap_cta_data_pipeline_spark.operators  # noqa: F401
from sap_cta_data_pipeline_spark.plans import digest
from sap_cta_data_pipeline_spark.registry import QUERIES

#: class-3 bound families accepted by the gate. The first four are
#: bounded BY CONSTRUCTION; `measured-gate` flips strategy on a counted
#: bound; the two `+route` families admit corpus-growing frames only
#: with a docstring-documented at-scale route (checked below).
_CLASS3_FAMILIES = {
    "calendar",  # day/week/month-grain frames — bounded by the time span
    "k-row",  # constant row count fixed by construction (bins, k, grid)
    "n_partitions",  # ranks-helper offset tables (P rows)
    "types2",  # ≤ |types|·|types| cell matrices
    "measured-gate",  # strategy flips on a measured cardinality gate
    "value-grain+route",  # distinct-value grain; docstring routes to
    #                       pre-binning at scale (the ml_auc_roc pattern)
    "semantic-global+route",  # the global order IS the contract;
    #                           docstring names the scale swap
}

#: docstring markers that count as a documented at-scale route for the
#: `+route` families (case-insensitive substring match).
_ROUTE_MARKERS = (
    "distinct-score",
    "distinct-value",
    "value grain",
    "value-grain",
    "score grain",
    "pre-bin",
    "pre-round",
    "binning",
    "range partition",
    "range-partition",
    "repartitionbyrange",
    "zipwithindex",
    "approx quantile",
    "per ingest partition",
    "ranks.py",
)

#: key -> §R class. Class 1/2 entries are ints (1 = 1-row global final,
#: 2 = scalar broadcast); class-3 entries are ("family", "bound detail")
#: tuples — the family names the construction bound, the detail says
#: which frame it is.
ALLOWED_SINGLE_PARTITION: dict[str, int | tuple[str, str]] = {
    "agg_approx_topk": 1,  # k-bounded sketch state, global final
    "agg_global": 1,
    "agg_hll_intersection_eval": 1,
    "agg_heavy_hitters": 2,
    "agg_hll_rolling_window_eval": (
        "calendar",
        "day-grain sketch-union RANGE window (composes the exact lane's "
        "day-grain expansion)",
    ),
    "agg_hll_mergeable": 1,
    "agg_percentile_bands": 2,
    "agg_quantile_mergeable": 1,
    "agg_winsorized_stats": 2,
    "agg_theil_decomposition": 2,  # 1-row global (mu, y) broadcast — sub_scalar_global class
    "corpus_mix_exact": 2,
    "corpus_shuffle_deterministic": ("n_partitions", "ranks-helper offset table"),
    "corpus_mix_temperature": (
        "k-row",
        "≤|langs| allocation rank + 1-row budget/weight-sum broadcasts",
    ),
    "customer_interpurchase_time": 1,
    "customer_rfm_segments": (
        "n_partitions",
        "3 rank passes × (offset + total window over ≤32-row summaries); "
        "data-path ranks are range-partitioned",
    ),
    "customer_survival_km": ("calendar", "week-grain KM table + 1-row total"),
    "customer_spend_gini": ("n_partitions", "ranks offset table + 1-row final"),
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
    "events_ab_ratio_delta_method": (
        "k-row",
        "2-row arm-stat frame + cross-arm windows",
    ),
    "events_ab_ttest": 1,
    "events_attribution_shapley": 1,  # ≤8-row coalition table → 1-row pivot final
    "events_ab_sequential_sprt": ("calendar", "day-grain cumulative window"),
    "events_ab_power_mde": 2,  # 1-row base-rate/traffic broadcast x 3-row grid
    "events_churn_flags": 2,
    "events_uplift_qini": (
        "value-grain+route",
        "user-grain score rank (docstring routes to score pre-binning) "
        "+ 10-row decile windows",
    ),
    "events_did_estimator": 1,  # 4-cell agg → 1-row DiD fold
    "events_eb_rate_shrinkage": 2,  # 1-row Beta moment-fit broadcast (sub_scalar_global class)
    "events_forecast_snaive": 2,  # 1-row horizon (max day) broadcast
    "events_conversion_latency": 1,
    "events_cumulative_users": ("calendar", "day-grain running window"),
    "events_funnel_steps": 1,
    "events_funnel_conversion_window": 1,  # three 1-row step-count finals
    "events_lateness_report": (
        "semantic-global+route",
        "arrival-order frontier replay — the audited quantity itself; "
        "docstring routes to per-ingest-partition merge at scale (S10)",
    ),
    "graph_bfs_layers": 1,  # 1-row seed (global min) + per-layer bounded frontiers
    "graph_hits_bipartite": 2,  # two 1-row final-norm scalar broadcasts (post-loop; round-9 fix)
    "graph_triangle_count": 1,
    "ids_assign_global": (
        "n_partitions",
        "ranks-helper offset table; data path repartitionByRange",
    ),
    "json_shred_discover": 1,  # 3-row union of per-key global-agg profiles
    "lang_id_confusion_eval": 1,
    "lineitem_abc_pareto": ("n_partitions", "ranks offset tables"),
    "ml_auc_delong_se": (
        "value-grain+route",
        "distinct-value-grain rank windows + 1-row final",
    ),
    "ml_auc_roc": ("value-grain+route", "distinct-score-grain windows"),
    "ml_ks_test": ("value-grain+route", "distinct-value-grain running CDFs"),
    "ml_isotonic_calibration": (
        "k-row",
        "20-bin-grain cum windows + bounded minimax closure",
    ),
    "ml_lift_gains_table": (
        "value-grain+route",
        "range-partitioned rank offsets + 10-row decile windows",
    ),
    "ml_shap_linear_exact": 1,  # 1-row sufficient-stats fit broadcast (ml_ols class)
    "ml_kfold_assign": 2,  # 1-row grand-total broadcast (complement identity)
    "ml_ols_two_feature": 1,  # sufficient-stats 1-row frames (normal equations)
    "ml_pr_auc": ("value-grain+route", "distinct-score running window"),
    "ml_threshold_optimal": (
        "value-grain+route",
        "score-grain cumulative windows + 1-row argmax finals",
    ),
    "ml_psi_drift": 2,
    "ml_wasserstein_drift": (
        "value-grain+route",
        "cent-grain CDF running window (already pre-rounded) + 1-row final",
    ),
    "ml_woe_iv_binning": ("k-row", "10-bin-grain total windows"),
    "ml_target_encoding": 2,
    "orders_association_rules": 2,
    "part_abc_xyz_matrix": ("n_partitions", "ranks offset tables"),
    "orders_growth_mom_yoy": ("calendar", "month-grain lag windows"),
    "orders_panel_within_estimator": (
        "calendar",
        "nation×month panel-grain demean windows + 1-row final",
    ),
    "orders_open_backlog_daily": ("calendar", "day-grain running window"),
    "orders_queue_backlog_lindley": (
        "calendar",
        "day-grain cumsum/min windows",
    ),
    "orders_seasonality_index": ("calendar", "month-grain windows"),
    # round-13 column-form sweeps: the grid rides as aggregate columns,
    # so the final avg-over-vectors is a 1-row global final stage (the
    # stack reshape runs on that one row)
    "pipe_benchmark_report": 1,
    "pipe_param_sweep": 1,
    "profile_histogram_auto": 2,
    "profile_join_key_skew": 1,
    "profile_shuffle_balance": ("n_partitions", "P-row (32) partition-load windows"),
    "profile_table": 1,
    "quantile_accuracy_eval": 1,
    "scan_parquet": 1,
    "source_json_malformed": 1,  # 1-row ingestion-audit global final
    "sim_ann_ivf": 2,
    "sim_ann_ivfpq": 2,  # k-row centroid/codebook builds (emb_ivf_kmeans_ann class)
    "sim_ann_ivfpq_rerank": 2,  # composes sim_ann_ivfpq — inherits its builds
    "sim_recall_eval": 2,  # composes sim_ann_ivf → inherits its centroid build
    "sink_bucketed_sized": 1,  # 1-row round-trip audit final over the bucketed table
    "sink_parquet_bloomfilter": 1,
    "part_kmeans1d_exact": (
        "k-row",
        "25-brand-grain rank/prefix windows + bounded split closure",
    ),
    "part_skyline_pareto": (
        "n_partitions",
        "offsets table (with_global_running_max)",
    ),
    "sort_multikey": (
        "semantic-global+route",
        "global sort IS the contract; docstring routes to "
        "zipWithIndex-style range partitioning",
    ),
    "sort_nulls_explicit": (
        "semantic-global+route",
        "global NULLS LAST row_number over dim-sized supplier; docstring "
        "routes to the range-partitioned rank helper",
    ),
    "stats_mutual_information": 2,  # 1-row grand-total broadcast over the joint frame
    "text_js_divergence_sources": 2,  # 1-row grand-total broadcast feeding both term branches
    "text_lm_kneser_ney_bigram": 2,  # 1-row bigram-type-count broadcast (KN denominator)
    "graph_assortativity": 1,  # 1-row corr/count final over the degree-pair frame
    "ts_fourier_seasonal_fit": (
        "calendar",
        "day-grain series windows + 1-row coef/r2 broadcasts",
    ),
    "ts_haar_wavelet_energy": (
        "calendar",
        "day-grain index window + halving cascade + 1-row total",
    ),
    "ts_stl_decompose_daily": (
        "calendar",
        "day-grain centered-MA windows + 7-row seasonal normalize",
    ),
    "ts_seasonal_strength": (
        "calendar",
        "composes the STL day-grain windows + 1-row strength final",
    ),
    "ts_bollinger_breach": ("calendar", "day-grain trailing-20 windows"),
    "ts_drawdown_max": (
        "calendar",
        "day-grain running cum/peak windows + 1-row final",
    ),
    "stats_anova_oneway": 1,  # 1-row sufficient-stats total (k, N, grand mean)
    "stats_fdr_bh_adjust": (
        "k-row",
        "battery-grain BH rank/step-up windows (n_tests rows)",
    ),
    "stats_chi2_independence": (
        "types2",
        "grand-total window over ≤|types|×7 cells, then 1-row final",
    ),
    "stats_cramers_v": (
        "types2",
        "≤5×3 priority×status cells (chi2 shape) + 1-row final",
    ),
    "stats_levene_brown_forsythe": 1,  # 5-group sufficient-stat combine → 1-row final
    "stats_cohens_d": 1,  # 2-row arm stats → 1-row fold
    "stats_jarque_bera": 1,  # 1-row power-sum global final
    "stats_friedman_test": 2,  # 1-row k broadcast + k-row type final
    "stats_proportion_ztest": 1,  # 2-row arm stats → 1-row fold
    "ts_forecast_backtest_naive_horizon": (
        "calendar",
        "1-row horizon broadcast + 7-row per-horizon finals (day grain)",
    ),
    "stats_kendall_tau": 1,  # 25-row grain self-join → 1-row concordance final
    "stats_kruskal_wallis": (
        "value-grain+route",
        "cent-quantized value-grain cumulative window (pre-binning IS "
        "the quantization) + 1-row tie broadcast + k-row final",
    ),
    "stats_wilcoxon_signed_rank": (
        "value-grain+route",
        "cent-quantized |d| value-grain cumulative window + 1-row tie "
        "broadcast + 1-row final",
    ),
    "stats_mcnemar": 1,  # 1-row discordant-count final
    "graph_modularity": 2,  # 1-row edge-total + |brands|-row community finals
    "match_fs_weights": 1,  # 1-row sufficient-stat final, 3-row unpivot
    "ts_durbin_watson": (
        "calendar",
        "day-grain lag window + 1-row integer-sum algebraic final",
    ),
    "ml_hbos_outlier_topk": 2,  # 1-row range broadcast + top-20 limit
    "part_demand_classification": 2,  # 1-row month-count broadcast + 4-row class fold
    "stats_spc_xbar_r": 1,  # 1-row grand-limits broadcast
    "stats_welch_anova": 2,  # 1-row weight-total broadcast + 1-row final
    "stats_tost_equivalence": 1,  # 2-row arm pivot -> 1-row final
    "stats_grubbs_max_dev": (
        "calendar",
        "day-grain arg-max rank + 1-row moment broadcast",
    ),
    "ts_ses_grid_backtest": (
        "calendar",
        "day-grain index window + calendar-bounded series collect + "
        "9-row grid rank",
    ),
    "stats_cochran_armitage": 1,  # 7-row year grain → 1-row trend final
    "ts_pacf_durbin_levinson": 2,  # 1-row stats broadcast + 1-row ACF pivot
    "ml_mcc": 1,  # 1-row confusion final
    "ml_brier_decomposition": 1,  # 1-row brier + 1-row bin-total finals
    "ml_cohens_kappa": 1,  # 1-row marginals final
    "sub_not_in_nulls": 1,
    "sub_scalar_global": 1,
    "text_bleu2_corpus_eval": 1,  # four 1-row corpus-sum finals (clip/len sufficient stats)
    "text_bm25_topk": 2,
    "text_collocations_pmi": 2,  # two 1-row total scalar crossJoins (vocab side measured-gated)
    "text_tfidf_topk": 2,
    "text_vocab_coverage": 2,
    "text_vocab_growth_heaps": 2,
    "text_wordcount": ("n_partitions", "ranks offset tables"),
    "tpch_q11_important_volume": 2,
    "txnlog_describe_history": 1,  # per-version 1-row live-count finals
    "tpch_q14_promo_revenue": 1,
    "tpch_q15_top_supplier": 2,
    "tpch_q17_small_quantity_revenue": 2,
    "tpch_q19_disjunctive_revenue": 1,
    "tpch_q22_dormant_customers": 2,
    "tpch_q6_forecast_revenue": 1,
    "ts_changepoint_cusum": ("calendar", "day-grain running CUSUM window"),
    "ts_ljung_box": (
        "calendar",
        "day-index windows + 7-lag ACF rows + 1-row stats broadcast",
    ),
    "ts_local_extrema": ("calendar", "day-grain neighbor window"),
    "ts_permutation_entropy": (
        "calendar",
        "day-grain triple window + 6-row pattern-ordered entropy fold "
        "+ 1-row total broadcast",
    ),
    "stats_runs_test": (
        "calendar",
        "day-grain sign lag + 1-row mean broadcast + 1-row final",
    ),
    "ts_theta_forecast": (
        "calendar",
        "day-grain index window + day-length in-row SES fold + 1-row "
        "OLS broadcast + 7-row horizon final",
    ),
    "ts_hurst_rs": (
        "calendar",
        "day-grain index window + 4-row size pivot + 1-row n_days "
        "broadcast (block windows partition by (size, block))",
    ),
    "ts_turning_points_test": (
        "calendar",
        "day-grain neighbor window + 1-row final",
    ),
    "win_ntile_pct": (
        "semantic-global+route",
        "global quartile IS the contract; docstring routes to "
        "approx quantiles",
    ),
    "win_rolling_median": ("calendar", "day-grain trailing-7 frames"),
    "win_time_range_frame": ("calendar", "day-grain 7-day RANGE frames"),
}


def test_class3_entries_are_construction_bounded_or_routed():
    """Round-9 §R tightening: every class-3 entry names a recognized
    bound family; families whose frames can grow with the corpus must
    have the at-scale route documented in the operator docstring."""
    for key, cls in sorted(ALLOWED_SINGLE_PARTITION.items()):
        assert key in QUERIES, f"{key}: allowlisted but not registered"
        if isinstance(cls, int):
            assert cls in (1, 2), f"{key}: class-3 entries must be tuples"
            continue
        family, detail = cls
        assert family in _CLASS3_FAMILIES, f"{key}: unknown bound family {family!r}"
        assert detail.strip(), f"{key}: class-3 entry must name its bound"
        if family.endswith("+route"):
            # collapse doc whitespace so markers match across line wraps
            doc = " ".join((QUERIES[key].__doc__ or "").lower().split())
            assert any(m in doc for m in _ROUTE_MARKERS), (
                f"{key}: class-3 family {family!r} requires the at-scale "
                "route documented in the docstring (pre-binning / "
                "range-partitioned ranks / per-partition merge)"
            )


@pytest.mark.parametrize("key", sorted(QUERIES))
def test_no_unclassified_single_partition_exchange(key, spark, sf_dir):
    d = digest(QUERIES[key](spark, sf_dir))
    if d.n_single_partition and key not in ALLOWED_SINGLE_PARTITION:
        pytest.fail(
            f"{key}: {d.n_single_partition} Exchange SinglePartition stage(s) "
            "not classified in SCALE.md §R / ALLOWED_SINGLE_PARTITION — "
            "classify it (class 1/2/3) or fix the plan"
        )
