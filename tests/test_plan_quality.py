"""Physical-plan quality gates — the engine's scale contract, asserted the
same way the reference asserts its pushdown plans
(TestSedonaIcebergExtension.scala:63-65,121-122: regex over the plan string).

What must hold for a 1000-executor / 100 TB deployment:
- relational and dedup plans stay fully JVM-side (no *EvalPython operators);
- dimension joins broadcast (no shuffle of the fact side against tiny dims);
- predicates reach the parquet scan (PushedFilters non-empty);
- the MinHash signature pipeline shuffles only signature-sized data.
"""

import re

import pytest

from sedona_iceberg_extension_spark.plans.queries import QUERIES


def _plan(spark, name, sf_dir):
    return QUERIES[name].fn(spark, sf_dir)._jdf.queryExecution() \
        .executedPlan().toString()


# every query family that must never cross into Python
_NATIVE_QUERIES = [
    "q1_pricing_summary", "q3_top_orders", "q5_region_revenue",
    "q6_forecast_revenue", "q7_volume_shipping", "q10_returned_items",
    "q14_promo_share", "q15_top_supplier", "q18_large_orders",
    "q19_disjunctive", "q22_idle_customers", "rollup_revenue",
    "top_parts_per_brand", "set_ops_nations", "window_running_spend",
    "events_hourly_rollup", "sessionize_events",
    "exact_dedup_groups", "minhash_signatures", "minhash_lsh_pairs",
    "ngram_jaccard_pairs", "simhash_values", "doc_token_stats",
    "doc_quality", "doc_lang_id", "doc_fingerprint", "doc_chunks",
    "doc_top_tokens", "doc_stratified_sample",
    "embedding_cosine_topk", "embedding_label_stats",
    "spatial_centroid_agg", "spatial_envelope_agg",
    "q2_min_cost_supplier", "q4_priority_exists", "q8_market_share",
    "q11_value_concentration", "q12_priority_class", "q13_order_distribution",
    "q16_supplier_counts", "q17_small_quantity_revenue",
    "q20_promo_suppliers", "q21_sole_fault_supplier", "window_breadth",
    "cube_revenue", "pivot_returnflag", "skew_count_distinct",
    "doc_tfidf_top_terms", "resample_ffill", "event_transitions",
    "value_histogram", "spatial_transform", "spatial_transform_laea",
    "doc_char_entropy", "doc_top_token_share", "source_mix_weights",
    "corpus_contamination", "hll_distinct_users",
    "spatial_transform_stateplane", "events_props_json", "doc_pii_scrub",
    "doc_length_quantiles", "simhash_pairs", "spatial_transform_swiss",
    "corpus_top_bigrams", "quality_filter_funnel", "token_len_histogram",
    "dedup_rate_by_source", "customer_rfm", "orders_monthly_growth",
    "events_anomaly_zscore", "spatial_grid_density",
    "embedding_norm_quantiles", "minhash_jaccard_est",
    "incremental_dedup_ingest", "ann_recall_eval", "doc_perplexity_proxy",
    "doc_langid_confusion", "corpus_vocab_stats",
    "substring_dup_windows", "knn_label_classify", "cdc_dedup_by_source",
    "customer_cohort_retention", "part_basket_lift",
    "embedding_label_outliers", "corpus_zipf_slope", "events_ewma",
    "bloom_ingest_gate", "brand_graph_triangles", "near_dup_rate_by_source",
    "spatial_kmeans", "events_autocorrelation", "weighted_sample_docs",
    "lsh_edit_distance_verify", "grouping_sets_revenue", "unpivot_part_metrics",
    "snapshot_changelog", "partition_pruned_scan",
    "source_lang_diversity", "customer_abc_pareto", "weekly_retention",
    "asof_forward_purchase", "simhash_clusters", "order_backlog_sweepline",
    "corpus_novelty_decay",
    "hll_users_by_type", "hll_click_view_overlap", "doc_hash_sample",
    "doc_ngram_repetition", "training_shard_packing", "pq_ann_topk",
    "bpe_pair_counts", "doc_bigram_lm_ppl", "minhash_calibration_curve",
    "cms_user_event_counts",
    "ivfpq_ann_recall", "doc_max_dup_ngram", "doc_template_mining",
    "dp_noisy_topk_brands", "events_cusum_drift", "token_pmi_pairs",
    "ngram_containment_pairs", "kmv_value_quantiles", "brand_pagerank",
    "ship_survival_km", "spatial_kde_heatmap", "source_minhash_similarity",
    "rrf_ann_fusion", "embedding_logreg_irls", "nb_lang_classifier",
    "spatial_areal_interp", "dq_profile_lineitem",
    # round 8
    "scd2_customer_history", "source_capped_sample", "order_interval_overlap",
    "attribution_last_touch", "events_psi_drift", "lineitem_robust_stats",
    "kmv_intersection_estimate", "part_bfs_distance",
    "dsir_importance_weights", "semdedup_prune", "embedding_pca_power",
    "value_equidepth_histogram", "join_cardinality_sketch",
    "partkey_skew_gini", "bpe_merge_rounds", "part_label_propagation",
    "orders_forecast_seasonal", "session_funnel_conversion",
    "jl_projection_distortion", "embedding_int8_quant_error",
    "doc_stitch_pairs", "colbert_maxsim_topk", "source_lang_kl",
    "snapshot_files_stats", "spatial_hexbin_density", "events_ks_test",
    "lineitem_group_ols", "part_also_bought_topk",
    "user_transition_entropy", "part_link_prediction", "ivm_orders_agg",
    "lineitem_discount_did", "events_rate_intervals",
    "doc_blocklist_rate", "events_changepoint_binseg",
    "embedding_matryoshka_recall", "part_kcore",
    "tfidf_cosine_pairs", "dataset_three_way_split",
    "spatial_box_overlay_matrix", "orders_weekday_anova",
    "lineitem_spearman", "lang_source_mutual_info", "price_benford",
    "part_degree_assortativity", "cohort_ltv_matrix",
    "part_graph_modularity", "customer_hhi_by_nation",
    "lineitem_welch_ttest", "events_runs_test", "spatial_getis_hotspot",
    "orders_bootstrap_ci", "priority_status_chisq", "events_skyline",
    "part_abc_xyz_matrix",
    # round-8 continuation (waves 16+)
    "lineitem_mann_whitney", "orders_kruskal_wallis", "nation_theil_index",
    "revenue_lorenz_deciles", "lineitem_cramers_v",
    "source_token_js_divergence", "daily_revenue_theil_sen",
    "orders_breusch_pagan", "events_durbin_watson", "doc_bm25_topk",
    "compaction_bin_packing", "spatial_zorder_stats",
    "customer_target_encoding", "feature_hashing_collisions",
    "part_hits_scores", "events_holt_forecast", "doc_keyword_rake",
    "langid_eval_metrics", "orders_hill_tail",
    "orders_emd_priority", "events_fano_burstiness",
    "lineitem_control_chart", "events_seasonal_decompose",
    "corpus_vocab_coverage",
    "doc_rm3_expansion", "embedding_triplet_mining",
    "customer_mahalanobis_outliers",
    "doc_readability_scores", "embedding_centroid_classifier",
    "brand_assoc_rules", "customer_winsorized_stats", "scan_pruning_stats",
    "part_name_autocomplete", "events_inter_arrival_stats",
    "customer_entity_blocking", "embedding_knn_graph_stats",
    "doc_sentence_dedup", "events_periodogram_dft",
    "customer_decile_migration", "orders_twoway_anova",
    "events_holt_winters",
    "orders_conformal_interval", "events_type_overlap_jaccard",
    "brand_eoq_reorder", "doc_tokenizer_fertility", "orders_pinball_loss",
    "lineitem_price_index", "ship_weibull_fit", "nation_eb_shrinkage",
    "events_uplift_by_segment", "customer_nb_overdispersion",
    "events_shapley_attribution", "orders_backtest_mase",
    "supplier_scorecard", "events_dau_wau_stickiness",
    "brand_newsvendor_stock", "embedding_label_silhouette",
    "events_ipw_ate", "events_purchase_brier", "events_gumbel_daily_max",
    "orders_interrupted_ts", "alsobought_ndcg_eval",
    "simhash_bit_balance", "events_caliper_match_att", "part_rich_club",
    "events_entropy_trend", "events_seasonality_strength",
    "lineitem_discount_rdd", "part_adamic_adar", "doc_lexical_richness",
    "customer_neyman_allocation", "orders_corr_matrix",
    "lineitem_bullwhip_ratio", "events_haar_energy",
    "brand_croston_forecast", "source_burrows_delta",
    "events_kalman_level", "brand_price_volume_mix",
    "events_otsu_threshold", "orders_littles_law",
    "events_pot_gpd_fit", "doc_heaps_law", "events_circular_hour_stats",
    "orders_stochastic_dominance",
    "lineitem_effect_size", "events_gains_chart",
    "minhash_threshold_pr_curve", "orders_fiscal_445_rollup",
    "events_cross_correlation", "events_session_gap_sensitivity",
    "customer_topk_jackknife", "orders_mann_kendall",
    "orders_rle_encoding_estimate", "doc_partition_skew_audit",
    "events_ewma_control_chart",
    # round-9 gate completion (VERDICT r8 item #4): the previously ungated
    # queries whose executed plans are EvalPython-free with a real
    # distributed (parquet-scanning) shape — verified by plan inspection
    "top_customers", "order_priority_count", "part_brand_stats",
    "q9_yearly_nation_revenue", "price_percentiles", "asof_click_view",
    "event_funnel_lag",
    "spatial_range_contains", "spatial_range_intersects",
    "spatial_distance", "spatial_measures",
    "spatial_join_contains", "spatial_join_sql", "spatial_join_sql_comma",
    "spatial_join_sql_dwithin", "spatial_join_sql_chain",
    "spatial_join_broadcast", "spatial_join_dwithin",
    # round 9: the outer-join row-id hash now skips the geometry column when
    # the join condition is geometry-free, so pruning drops the Python point
    # constructor and the LEFT JOIN plan is native like the inner variants
    "spatial_join_left",
    "spatial_knn", "spatial_knn_grid", "spatial_union_agg", "spatial_dbscan",
    "doc_dedup_pipeline", "embedding_dup_pairs",
    "lsh_ann_topk", "ivf_ann_topk",
    "snapshot_time_travel", "streaming_cdc_upsert",
    "snapshot_retention_expiry",
]

# Declared queries the EvalPython gate cannot honestly assert, each with the
# reason (VERDICT r8 item #4: every declared query appears in this file
# exactly once — in _NATIVE_QUERIES or here).  Three exemption classes:
#   geometry-UDF — the WKB geometry kernel IS the engine's Python surface
#     (the reference links GeoTools/Sedona jars; this engine implements the
#     function catalog as Python UDFs by design; the relational/join core of
#     those same plans stays JVM-side and is gated by the spatial join tests);
#   streaming — queries() materializes the stream through a memory-sink run,
#     so the batch plan this gate would see is just the sink scan; the
#     streaming plans are exercised in tests/test_streaming.py;
#   bounded-driver-fold / mapInPandas — the final DataFrame is
#     createDataFrame over an O(1)-size driver fold (greedy/iterative
#     algorithms with one-row collects) or an Arrow-batched mapInPandas
#     stage that IS the operator (multimodal decode), so a no-EvalPython
#     assert would be vacuous or false by design.
_EXEMPT_QUERIES = {
    "spatial_astext": "geometry-UDF: WKT rendering via the WKB kernel",
    "spatial_intersection_agg": "geometry-UDF: polygon-clip aggregate kernel",
    "spatial_affine_ops": "geometry-UDF: affine transforms via WKB kernel",
    "spatial_split_boxes": "geometry-UDF: ST_Split blade kernel",
    "spatial_buildarea_donuts": "geometry-UDF: ST_BuildArea ring assembly",
    "spatial_transform_towgs84": "geometry-UDF: datum-shift projection kernel",
    "spatial_tier2_metrics": "geometry-UDF: tier-2 measure functions",
    "streaming_user_totals": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_sessionize": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_dedup": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_enrich": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_click_view_join": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_ingest_gate": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_window_top_event": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_burst_detect": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_cms_cells": "streaming: memory-sink scan; gated in test_streaming",
    "streaming_outer_join_watermark": "streaming: memory-sink scan; gated in test_streaming",
    "multimodal_features": "mapInPandas decode stage is the operator",
    "multimodal_frame_sample": "mapInPandas decode stage is the operator",
    "multimodal_resize": "mapInPandas decode stage is the operator",
    "multimodal_audio_chunks": "mapInPandas decode stage is the operator",
    "multimodal_energy_segments": "mapInPandas decode stage is the operator",
    "multimodal_shot_boundaries": "mapInPandas decode stage is the operator",
    "embedding_mmr_topk": "bounded driver fold: greedy MMR over a 50-row pool",
    "events_markov_stationary": "bounded driver fold: |states|^2 power iteration",
    "supplier_set_cover": "bounded driver fold: 8 greedy one-row argmax collects",
    "dedup_components": "iterative label propagation via localCheckpoint rounds",
    "dedup_keep": "iterative label propagation via localCheckpoint rounds",
}


def test_gate_covers_every_declared_query():
    """Every declared query appears in this file exactly once: either the
    native no-Python gate or the exemption table with a written reason."""
    declared = set(QUERIES)
    native, exempt = set(_NATIVE_QUERIES), set(_EXEMPT_QUERIES)
    assert len(_NATIVE_QUERIES) == len(native), "duplicate in _NATIVE_QUERIES"
    assert not (native & exempt), f"in both lists: {sorted(native & exempt)}"
    assert not (native - declared), f"stale gate rows: {sorted(native - declared)}"
    assert not (exempt - declared), f"stale exemptions: {sorted(exempt - declared)}"
    missing = declared - native - exempt
    assert not missing, f"ungated queries: {sorted(missing)}"


@pytest.mark.parametrize("name", [
    "q2_min_cost_supplier", "q4_priority_exists", "q8_market_share",
    "q11_value_concentration", "q12_priority_class", "q13_order_distribution",
    "q16_supplier_counts", "q17_small_quantity_revenue",
    "q20_promo_suppliers", "q21_sole_fault_supplier",
])
def test_tpch2_no_cartesian(spark, sf_dir, name):
    """The correlated-subquery rewrites (q2 window-min, q17 avg re-join,
    q21 per-order cardinalities) must plan as hash joins, never a nested
    loop per outer row."""
    plan = _plan(spark, name, sf_dir)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian"


@pytest.mark.parametrize("name,expect_semi", [
    ("q4_priority_exists", "LeftSemi"), ("q20_promo_suppliers", "LeftSemi"),
    ("q16_supplier_counts", "LeftAnti"),
])
def test_tpch2_semi_anti_joins(spark, sf_dir, name, expect_semi):
    plan = _plan(spark, name, sf_dir)
    assert expect_semi in plan, f"{name}: expected a {expect_semi} join"


@pytest.mark.parametrize("name", _NATIVE_QUERIES)
def test_no_python_in_plan(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "EvalPython" not in plan, f"{name} plan crosses into Python"


@pytest.mark.parametrize("name", ["q5_region_revenue", "q7_volume_shipping",
                                  "q10_returned_items", "rollup_revenue"])
def test_dimension_joins_broadcast(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast join planned"


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q6_forecast_revenue",
                                  "q19_disjunctive"])
def test_filters_reach_scan(spark, sf_dir, name):
    plan = _plan(spark, name, sf_dir)
    assert re.search(r"PushedFilters: \[[^\]]", plan), \
        f"{name}: no predicate pushed to the parquet scan"


def test_minhash_shuffle_is_signature_sized(spark, sf_dir):
    """The wide-form MinHash plan: shuffles are (a) the optional small-input
    spread of raw docs and (b) the signature aggregation — never the
    ×num_hashes exploded corpus (no explode operator before the first
    aggregate)."""
    plan = _plan(spark, "minhash_signatures", sf_dir)
    n_exchanges = plan.count("Exchange")
    assert n_exchanges <= 4, f"minhash plans {n_exchanges} exchanges"
    # no generator (explode) anywhere between hashing and aggregation other
    # than the shingle-index explode itself
    assert plan.count("Generate") <= 2


def test_spatial_join_broadcast_plan(spark, sf_dir):
    """The broadcast strategy's contract: tiny build side broadcast (a
    conditioned BroadcastNestedLoopJoin — the reference's BroadcastIndexJoin
    analogue), fact side never shuffled, and the point/rect hints keep the
    whole predicate native."""
    plan = _plan(spark, "spatial_join_broadcast", sf_dir)
    assert "BroadcastExchange" in plan
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_spatial_join_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "spatial_join_contains", sf_dir)
    assert "CartesianProduct" not in plan


def test_spatial_join_sql_python_free(spark, sf_dir):
    """The SQL-text planned join must match the API join's plan quality:
    metadata shape hints make the envelope algebra exact — no refinement UDF,
    no nested-loop join (reference plan asserts, TestSedonaIcebergExtension
    .scala:121-122)."""
    plan = _plan(spark, "spatial_join_sql", sf_dir)
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_spatial_join_sql_dwithin_python_free(spark, sf_dir):
    plan = _plan(spark, "spatial_join_sql_dwithin", sf_dir)
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_spatial_join_sql_chain_python_free(spark, sf_dir):
    """Both joins of the chained statement must keep the planned shape —
    shape-hint metadata survives the pair-view struct round-trip, so neither
    join degrades to a nested loop or a refinement UDF."""
    plan = _plan(spark, "spatial_join_sql_chain", sf_dir)
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_spatial_join_sql_comma_python_free(spark, sf_dir):
    """The reference App's own spelling (``FROM a, b WHERE ST_Contains(...)
    AND ST_Contains(ST_PolygonFromEnvelope(...), l.geo)``, App.scala:62-64)
    must plan the join through the grid equi-join AND rewrite the residual
    range conjunct natively — no nested loop, no Python anywhere."""
    plan = _plan(spark, "spatial_join_sql_comma", sf_dir)
    assert "EvalPython" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_embedding_dup_pairs_no_cartesian(spark, sf_dir):
    """The near-dup pair search must stay banded-LSH: equi-joins only, never
    an all-pairs product (the O(n²) plan is a 100 TB scale-killer)."""
    plan = _plan(spark, "embedding_dup_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_knn_grid_no_cross_join(spark, sf_dir):
    """The large-query-side KNN must stay a cell equi-join per round —
    no cross/nested-loop join anywhere in the final plan."""
    plan = _plan(spark, "spatial_knn_grid", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash_pairs_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "simhash_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


@pytest.mark.parametrize("name", ["knn_label_classify",
                                  "embedding_label_outliers",
                                  "part_basket_lift", "spatial_kmeans",
                                  "pq_ann_topk"])
def test_small_side_broadcast(spark, sf_dir, name):
    """Queries whose design broadcasts the small side (query vectors,
    centroid tables, marginals) must actually plan a BroadcastExchange."""
    plan = _plan(spark, name, sf_dir)
    assert "BroadcastExchange" in plan, f"{name}: no broadcast planned"


# --- runtime stage-reuse gates (statusTracker task counts) ----------------
#
# The r7→r9 regression class, caught twice only by the driver bench: a
# pipeline whose shared exchange feeds MORE THAN ONE consumer silently
# re-executes its upstream stages when AQE's stage cache misses (e.g. a
# REPARTITION_BY_NUM below the exchange, or an interpreted final
# aggregation re-finalizing per consumer).  The static plan string cannot
# show this — AQE dedups at runtime — so these gates COUNT COMPLETED TASKS.
#
# Ceilings are measured green baselines at the conftest settings plus ~45%
# margin; the regression regime roughly DOUBLES the heavy stage (overlap
# core measured: shared 17, dropped-reuse 29; two-consumer toy 49 → 97).
# The counts are only meaningful at the calibrated parallelism, so the
# gates SKIP (loudly, not flake) under any other session conf — per the
# round-9 advice that an absolute task count calibrated to local[4]/
# shuffle=8 must not flake on a conf or Spark bump.

_STAGE_REUSE_BASELINES = {
    # query -> (measured green tasks, ceiling)
    "ngram_jaccard_pairs": (17, 25),       # shingle/membership exchange: 2 consumers
    "ngram_containment_pairs": (16, 24),   # same overlap core, both directions
    "minhash_jaccard_est": (9, 14),        # wide-signature agg: banding + 2 est joins
    "semdedup_prune": (8, 13),             # ivf_assign feeds both cell-join sides
    "tfidf_cosine_pairs": (11, 17),        # tf-idf posting relation: norms + pair join
    "dedup_components": (47, 70),          # edge frame re-read per propagation round
    "doc_dedup_pipeline": (57, 85),        # exact->minhash chain; est persisted, 2 consumers
    "near_dup_rate_by_source": (3, 6),     # banded pipeline under the rate rollup
}


def _completed_tasks(spark, name, sf_dir):
    # Deterministic cache state: merely CONSTRUCTING some declared queries
    # (e.g. minhash_calibration_curve's est.persist()) registers a
    # CacheManager entry, and Spark substitutes InMemoryRelation into any
    # LATER query whose analyzed subtree matches — minhash_jaccard_est
    # shares the estimate subtree, so its task profile depends on whether
    # other tests built plans first (measured: 9 tasks fresh, 23 after a
    # full `_plan` sweep).  The gates assert the cache-free shape.
    spark.catalog.clearCache()
    sc = spark.sparkContext
    sc.setJobGroup(f"reuse_gate_{name}", f"stage-reuse gate {name}")
    try:
        QUERIES[name].fn(spark, sf_dir).count()
        tracker = sc.statusTracker()
        total = 0
        for jid in tracker.getJobIdsForGroup(f"reuse_gate_{name}"):
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    total += si.numCompletedTasks
    finally:
        sc.setJobGroup(None, None)
    return total


@pytest.mark.parametrize("name", sorted(_STAGE_REUSE_BASELINES))
def test_stage_reuse(spark, sf_dir, name):
    if (spark.sparkContext.defaultParallelism != 4
            or spark.conf.get("spark.sql.shuffle.partitions") != "8"
            or not sf_dir.rstrip("/").endswith("sf0.001")):
        pytest.skip("stage-reuse baselines calibrated for local[4]/shuffle=8"
                    "/sf0.001 — recalibrate _STAGE_REUSE_BASELINES to gate"
                    " other settings")
    base, ceiling = _STAGE_REUSE_BASELINES[name]
    total = _completed_tasks(spark, name, sf_dir)
    assert 0 < total <= ceiling, (
        f"{name} executed {total} tasks — a shared pipeline is re-executing "
        f"per consumer (green baseline {base}, regression ~{2 * base})")


# ---------------------------------------------------------------------------
# round 15 optimization gates: the stmt-form dedup paths must tokenize ABOVE
# their repartition exchange (the exchange ships raw text, never the token
# array — guide §2.3/§2.5), and q10 must aggregate by the narrow key BELOW
# the customer/nation attribute joins (guide §2.3 "aggregate before you
# shuffle").


def _formatted(spark, name, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


@pytest.mark.parametrize("name", ["minhash_lsh_pairs", "ngram_jaccard_pairs"])
def test_dedup_tokenize_above_repartition_exchange(spark, sf_dir, name):
    """r15: the REPARTITION(doc_id) hint exists to escape the scan stage;
    Catalyst must not be allowed to pull split(lower(trim(text))) back
    below it.  Gate: every REPARTITION_BY_COL exchange keyed on the doc id
    carries the raw text column, never the _toks array, as its input."""
    plan = _formatted(spark, name, sf_dir)
    blocks = re.findall(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\n"
        r"Arguments: hashpartitioning\(doc_id[^\n]*REPARTITION_BY_COL",
        plan)
    assert blocks, f"{name}: no REPARTITION_BY_COL exchange on doc_id found"
    for inputs in blocks:
        assert "_toks" not in inputs, (
            f"{name}: tokenizer ran below the repartition exchange — the "
            f"exchange input carries the token array ({inputs})")


def test_q10_aggregates_before_attribute_joins(spark, sf_dir):
    """r15: q10 groups by o_custkey right after the orders join and attaches
    customer/nation attributes onto the aggregated rows.  Gate: at most one
    BroadcastHashJoin below the partial aggregate (orders), at least two
    above it — a revert to join-everything-then-group puts all three below."""
    plan = _plan(spark, "q10_returned_items", sf_dir)
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1
    above = plan[:first_agg].count("BroadcastHashJoin")
    below = plan[first_agg:].count("BroadcastHashJoin")
    assert above >= 2 and below <= 1, (
        f"q10 join/aggregate order regressed: {above} BroadcastHashJoin "
        f"above the first HashAggregate, {below} below (expected >=2 / <=1)")
