"""Regenerate PLANS.md: physical-plan evidence for the headline queries."""
import re
from oculus_data_pipeline_spark.session import get_spark
from oculus_data_pipeline_spark.queries import get_queries

SF = "/root/testdata/sf0.1"
NAMES = [
    "q01_pricing_summary", "q03_region_revenue", "q12_json_extraction",
    "q19_asof_join", "q31_ngram_jaccard_pairs", "q133_allpairs_jaccard_exact",
    "q32_minhash_lsh_pairs",
    "q38_lsh_ann_topk", "q50_cosine_topk", "q51_cosine_near_dup_pairs",
    "q47_ivf_ann", "q60_classify_terms", "q62_graph_edges",
    "q66_lsh_verified_near_dups", "q70_curation_pipeline", "q84_image_decode",
    "q136_video_decode",
    "q86_simhash_near_dups", "q87_cdc_apply", "q88_multires_rollup",
    "q89_blocked_edit_distance", "q90_sole_late_supplier",
    "q93_pagerank", "q94_tfidf_top_terms", "q96_containment_pairs",
    "q97_semantic_clusters", "q98_value_outliers", "q101_chunk_documents",
    "q103_decontamination", "q104_repetition_stats", "q106_triangle_counts",
    "q107_pii_redaction", "q108_salted_join", "q109_unigram_rarity",
    "q110_retention_cohorts", "q111_inverted_index", "q112_canonical_docs",
    "q113_int8_quantization", "q114_bucketed_range_join", "q115_source_reputation",
    "q116_bigram_merge_candidates", "q117_group_percentiles",
    # round-6 window-scaling sweep members not previously plan-audited
    "q36_rank_with_ties", "q57_stratified_sample",
    "q59_correlated_subquery", "q99_group_median",
    "q118_embedding_decontamination", "q119_lsh_recall_report",
    "q120_prepare_corpus", "q121_hybrid_near_dup_report", "q122_sequence_packing",
    "q123_sql_api", "q124_point_in_time_join", "q125_interevent_gap_stats",
    "q126_entity_resolution", "q127_part_cooccurrence", "q128_gap_sessionization",
    "q129_gap_fill_forward", "q130_incremental_agg_merge",
    "q131_nearest_event_join", "q132_revenue_share",
    "q138_pq_encode", "q139_segment_scrub", "q140_embedding_gram",
    "q141_source_mixture", "q142_pq_adc_topk", "q143_snapshot_diff",
    "q144_stratified_split", "q145_table_fingerprint",
    "q146_variant_extract", "q147_approx_percentile_bound",
    "q148_power_iteration", "q149_ivf_pq_topk", "q150_cms_heavy_hitters",
    "q151_winsorized_stats", "q152_count_sketch", "q153_bloom_membership",
    "q154_hard_negatives",
    "q155_ewma_smoothing",
    "q156_ab_test_stats",
    "q157_pq_lloyd_update",
    "q158_pareto_frontier",
    "q159_pps_sample",
    "q160_label_gini",
    "q161_chi_square",
    "q162_k_anonymity",
    "q163_column_profile",
    "q164_referential_integrity",
    "q165_group_mode",
    "q39_lsh_bucket_stats",
    "q166_dedup_weights",
    "q167_cluster_size_histogram",
    "q168_ivf_pq_trained",
    "q169_label_propagation",
    "q170_markov_transitions",
    "q171_minhash_accuracy",
    "q172_weighted_median",
    "q173_event_debounce",
    "q174_expectations_report",
    "q175_oov_rate",
    "q176_source_overlap_matrix",
    "q177_token_diversity",
    "q178_quality_calibration",
    "q179_group_aware_split",
    "q180_key_skew_profile",
    "q181_time_weighted_avg",
    "q182_mad_outliers",
    "q183_rolling_active_users",
    "q184_compression_ratio",
    "q185_collocations",
    "q186_near_dup_provenance",
    "q187_vocab_growth",
    "q188_dup_rate_by_source",
    "q189_embedding_norm_profile",
    "q190_pack_manifest",
    "q191_rrf_fusion",
    "q192_sequential_patterns",
    "q193_contrastive_triplets",
    "q194_burstiness",
    "q195_zorder_layout",
    "q196_padding_waste",
    "q197_sorted_neighborhood",
    "q198_interval_coverage",
    "q199_fd_audit",
    "q200_segment_dedup",
    "q201_cusum_changepoint",
    "q202_mutual_nn_margin",
    "q203_shuffle_shards",
    "q204_curriculum_schedule",
    "q205_apportionment",
    "q206_lag_xcorr",
    "q207_temporal_integrity",
    "q208_split_leakage",
    "q209_kmv_set_ops",
    "q210_drop_waterfall",
    "q211_bfs_distances",
    "q212_zone_map_report",
    "q213_gdpr_impact",
    "q214_benford_audit",
    "q215_kcore_peel",
    "q216_rank_agreement",
    "q217_lang_confusion",
    "q218_seasonality_profile",
    "q219_join_cardinality_forecast",
    "q220_watermark_lateness",
]

def summarize(plan: str) -> dict:
    return {
        "exchanges": plan.count("Exchange") - plan.count("ReusedExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "pushed_filters": sorted({p for p in re.findall(r"PushedFilters: \[([^\]]*)\]", plan) if p.strip()}),
        "read_schemas": sorted(set(re.findall(r"ReadSchema: (\S+)", plan))),
    }


def codegen_stats(df) -> dict:
    """Execute the query JVM-side (RDD count — no Python row transfer)
    so AQE finalizes, then read whole-stage-codegen coverage and the
    Python-stage census off the FINAL plan. ``rowwise`` counts
    BatchEvalPython operators — row-at-a-time Python UDFs, which this
    repo bans from the hot path; any nonzero here is a regression, and
    the generated PLANS.md makes it greppable per round."""
    qe = df._jdf.queryExecution()
    qe.executedPlan().execute().count()
    final = qe.executedPlan().toString().split("== Initial Plan ==")[0]
    return {
        "spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        "arrow": len(re.findall(
            r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas"
            r"|FlatMapGroupsWithStateInPandas|MapInArrow", final)),
        "rowwise": len(re.findall(r"BatchEvalPython", final)),
    }

def main():
    spark = get_spark("plansdoc")
    out = ["# PLANS — physical-plan evidence (sf0.1, generated by tools_make_plans_md.py)",
           "",
           "Per headline query: shuffle count (Exchanges, net of reuse), join",
           "strategies, whole-stage-codegen coverage of the AQE-FINAL executed",
           "plan (spans + Arrow-batched Python stages + row-at-a-time Python",
           "stages, where any nonzero `rowwise` is a banned-pattern regression),",
           "parquet pushdown and column pruning as Catalyst actually compiled",
           "them.", ""]
    qs = get_queries()
    rowwise_total = 0
    for name in NAMES:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        s = summarize(plan)
        cg = codegen_stats(df)
        rowwise_total += cg["rowwise"]
        out.append(f"## {name}")
        out.append(f"- exchanges: {s['exchanges']}, broadcast joins: {s['broadcast_joins']}, "
                   f"sort-merge joins: {s['sort_merge_joins']}")
        out.append(f"- codegen spans (final plan): {cg['spans']}, "
                   f"arrow python stages: {cg['arrow']}, "
                   f"rowwise python stages: {cg['rowwise']}")
        if s["pushed_filters"]:
            out.append("- pushed filters:")
            out.extend(f"  - `{p}`" for p in s["pushed_filters"])
        out.append("- read schemas (column pruning at the scan):")
        out.extend(f"  - `{r}`" for r in s["read_schemas"])
        out.append("")
    out.append(f"**rowwise python stages across all audited queries: "
               f"{rowwise_total}** (must stay 0 — Arrow batches are the "
               f"only sanctioned Python path)")
    out.append("")
    open("PLANS.md", "w").write("\n".join(out))
    print(f"PLANS.md written (rowwise_total={rowwise_total})")

if __name__ == "__main__":
    main()
