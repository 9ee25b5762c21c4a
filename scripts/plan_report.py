#!/usr/bin/env python
"""Generate PLANS.md: the physical plan evidence for the headline queries.

For each bench headline query at $SPARK_GRAFT_SF_DIR, records the
`.explain("formatted")` summary plus extracted plan facts: exchange count,
join strategies chosen, pushed filters and pruned read schemas on every
parquet scan. This is the artifact to eyeball for scale regressions — a
scan that stopped pruning or a join that went nested-loop shows up here
before it shows up in wall time.

Usage: python scripts/plan_report.py [out_path]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark_playground_spark import queries as Q
from pyspark_playground_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q19_style_disjunctive_revenue",
    "dv_hub_customer", "dv_link_orders_customer", "dv_multilink_lineitem",
    "dv_pit_events", "dedup_exact_documents", "chunk_dedup_documents",
    "asof_view_attribution_events", "asof_bucketed_view_attribution_events",
    "incremental_rollup_events", "declarative_pipeline_documents",
    "q8_style_market_share", "q13_style_customer_distribution",
    "q15_style_top_supplier", "q17_style_small_quantity_revenue",
    "standardize_embeddings", "knn_within_label_embeddings",
    "fuzzy_name_pairs_part", "bpe_pair_counts_documents",
    "pmi_collocations_documents", "embedding_contamination_embeddings",
    "pagerank_nation_trade", "doc_chunks_documents",
    "source_similarity_documents", "concurrent_sessions_events",
    "span_duplication_documents", "copurchase_part_pairs",
    "cohort_retention_events", "event_transitions_events",
    "join_key_skew_orders", "winsorize_doc_lengths",
    "heavy_hitter_langs_documents", "name_resolution_part",
    "grouped_sequence_packing_documents", "curriculum_rank_documents",
    "rebalance_lang_mixture_documents", "fuzzy_decontamination_documents",
    "time_weighted_value_events", "session_ids_events",
    "trailing_7d_active_users_events", "association_rules_parts",
    "pareto_revenue_nations", "copresence_view_click_events",
    # round-3 session-2 additions
    "bloom_decontamination_documents", "q21_style_waiting_suppliers",
    "unigram_logprob_documents", "deterministic_shuffle_documents",
    "hot_salted_join_user_events", "event_entropy_users",
    "weighted_order_sample_documents", "incremental_cluster_update_documents",
    "leakage_free_split_documents", "zipf_slope_sources",
    "cusum_drift_users", "embedding_gram_matrix",
    "rank_calibrated_length_documents", "join_size_report_orders_lineitem",
    "top_session_paths_events", "centroid_confusion_embeddings",
    "table_diff_orders_snapshot",
    # post-seal round-3 additions + round-4 entries
    "ks_drift_doc_lengths", "ks_drift_binned_event_values",
    "burstiness_fano_users", "seasonal_residuals_hourly_events",
    "weighted_median_price_lineitem",
    "order_price_deciles", "rfm_segments_customers",
    "dv_multilink_lineitem_xxh",
    # round-4 session-2 additions
    "q2_style_min_cost_supplier", "q9_style_product_profit",
    "q11_style_important_parts", "q16_style_supplier_count",
    "q20_style_excess_suppliers", "psi_drift_binned_event_values",
    "cvm_drift_doc_lengths", "ewma_user_values_events",
    "holt_user_values_events", "exact_order_stats_orders",
    "windowed_psi_events", "prefix_jaccard_pairs_documents",
    "windowed_ks_events", "grouped_order_stats_customers",
    "windowed_cvm_events", "cms_user_counts_events",
    # round-4 session-4 additions
    "duplicated_spans_documents", "attribution_interval_join_events",
    "bigram_logprob_documents", "ks_drift_by_source_documents",
    "dv_snapshot_at_events",
    # round-4 session-5 additions
    "remove_duplicated_spans_documents", "attribution_left_outer_events",
    "mutual_information_lang_source", "auc_length_predicts_en_documents",
    "calibration_length_vs_en_documents",
    "grouped_auc_length_by_source_documents",
    "spearman_nchars_tokens_documents",
    "windowed_auc_value_purchase_events", "windowed_binned_auc_events",
    "dataset_card_documents", "shard_plan_documents",
    "normalize_text_documents", "exact_dup_histogram_documents",
    "split_leakage_audit_documents", "ttr_documents",
    "grouped_dataset_card_documents", "embedding_norm_histogram_embeddings",
    "dup_rate_by_source_documents", "windowed_order_stats_events",
    "token_budget_selection_documents", "grouped_token_budget_documents",
    # round-4 session-6 additions
    "kappa_langid_agreement_documents", "jsd_source_matrix_documents",
    "kmeans_lloyd_embeddings", "ngram_novelty_sources_documents",
    "windowed_jsd_events",
    # round-4 session-7 additions
    "k_anonymity_customers", "k_anonymity_gate_customers",
    "l_diversity_orders", "lang_corpus_stats_documents",
    "vocab_growth_documents", "label_propagation_documents",
    "shard_source_diversity_documents", "interleave_sources_documents",
    "gini_doc_lengths", "uncertainty_coefficient_lang_source",
    "windowed_top_event_types", "kaplan_meier_user_survival",
    "readability_documents", "prefix_energy_embeddings",
    "functional_dependencies_orders",
    # round-4 session-8 additions
    "dsir_weights_documents", "dsir_select_documents",
    "bm25_scores_documents", "hybrid_rrf_documents",
    # round-4 session-9 additions
    "jl_project_embeddings", "grid_density_embeddings",
    "mutual_nn_pairs_embeddings", "hubness_census_embeddings",
    "link_prediction_documents", "boilerplate_chunks_documents",
    "degree_census_documents", "assortativity_documents",
    "textrank_keywords_documents", "cosine_pair_histogram_embeddings",
    "ppr_nation_trade", "k_core_documents", "modularity_documents",
    "lttb_events", "hits_nation_trade", "bfs_distances_documents",
    "isotonic_calibration_documents", "lagged_correlation_events",
    "hard_negatives_embeddings", "windowed_isotonic_events",
    "nelson_aalen_user_hazard", "mcnemar_langid_events",
    "good_turing_documents", "autocorrelation_events",
    "keyness_src0_documents", "kendall_tau_documents",
]


def facts(plan: str) -> list[str]:
    out = []
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    out.append(f"exchanges: {n_ex}")
    joins = sorted(set(re.findall(
        r"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", plan)))
    out.append("joins: " + (", ".join(joins) if joins else "none"))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    nontrivial = [p for p in pushed if p.strip()]
    out.append(f"scans with pushed filters: {len(nontrivial)}/{len(pushed)}")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    if schemas:
        widths = [len(s.split(",")) for s in schemas]
        out.append(f"scan column counts: {widths}")
    return out


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "PLANS.md"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plan-report")
    registry = Q.queries()
    lines = [
        "# PLANS — physical-plan evidence (auto-generated)\n",
        f"`python scripts/plan_report.py` at `{sf_dir}`. Per query: plan",
        "facts extracted from `.explain(\"formatted\")` (exchange count,",
        "join strategies, filter pushdown, scan column pruning). Regenerate",
        "after planner-affecting changes.\n",
    ]
    for name in HEADLINE:
        if name not in registry:
            continue
        df = registry[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        lines.append(f"## {name}\n")
        for f in facts(plan):
            lines.append(f"- {f}")
        lines.append("")
    with open(out_path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
